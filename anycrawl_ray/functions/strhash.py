"""Closed-form string hashing shared by the dedup/fingerprint family AND
their DuckDB SQL oracles.

The near-dup operators (minhash/simhash/ngram) historically hashed shingles
with polars' process-stable xxhash — fast, but impossible for an external
SQL oracle to reproduce, so the whole family could only be verified
rows-only. This module replaces it with a hash that has THREE pinned-equal
implementations:

- :func:`hash_strings` — numpy-vectorized across a batch (transposed
  char-position loop over a fixed-width codepoint matrix; every op is a
  whole-array uint64 kernel, no per-string Python loop),
- :func:`hash_string_py` — the pure-Python reference,
- :func:`sql_*` builders — DuckDB SQL expression text computing the exact
  same value (list_reduce over codepoints with HUGEINT mod-2^64 arithmetic),

so a DuckDB oracle can re-derive minhash signatures, LSH band buckets and
verified pairs bit-for-bit (see `oracle_sql()['minhash_dedup']`).

Scheme: FNV-1a (Fowler–Noll–Vo, public domain) over Unicode CODEPOINTS
(not UTF-8 bytes — SQL's string_split(s, '') yields codepoints), seed folded
into the offset basis via splitmix64 (Steele et al., public domain), and a
splitmix64 finalizer for avalanche on short inputs.

Contract: input strings must not contain NUL (U+0000) — the vectorized path
uses numpy's 0-padded UCS4 layout, so NUL is indistinguishable from
end-of-string. Whitespace-split tokens/shingles can never contain NUL.
"""

from __future__ import annotations

import numpy as np

from .sketch import splitmix64

_U = np.uint64
_MASK = (1 << 64) - 1
FNV_OFF = 0xCBF29CE484222325  # 14695981039346656037
FNV_P = 0x100000001B3  # 1099511628211
DEFAULT_SEED = 7777


def _h0(seed: int) -> int:
    """Seed-folded FNV offset basis (python int in [0, 2^64))."""
    sm = int(splitmix64(np.array([seed], dtype=np.uint64))[0])
    return sm ^ FNV_OFF


def _splitmix64_int(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def hash_string_py(s: str, seed: int = DEFAULT_SEED) -> int:
    """Pure-Python reference (property tests pin the other two to this)."""
    h = _h0(seed)
    for ch in s:
        h = ((h ^ ord(ch)) * FNV_P) & _MASK
    return _splitmix64_int(h)


def hash_strings(strs, seed: int = DEFAULT_SEED) -> np.ndarray:
    """uint64 hash per string, vectorized across the batch.

    numpy's 'U' dtype stores UCS4 codepoints 0-padded to the batch max
    length; viewing as uint32 gives an (n, maxlen) codepoint matrix, and the
    FNV fold runs as maxlen whole-column uint64 ops (hash state only advances
    while the string is still live at that position).
    """
    n = len(strs)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    arr = np.asarray(strs, dtype="U")
    maxlen = arr.dtype.itemsize // 4
    # one pathological long string inflates the whole batch's padded matrix
    # (n x maxlen x 4 bytes) — recurse on halves to keep the working set flat
    if n > 1 and n * maxlen * 4 > 128 * 1024 * 1024:
        mid = n // 2
        return np.concatenate(
            [hash_strings(strs[:mid], seed), hash_strings(strs[mid:], seed)]
        )
    h = np.full(n, _h0(seed), dtype=np.uint64)
    if maxlen:
        codes = arr.view(np.uint32).reshape(n, maxlen)
        with np.errstate(over="ignore"):
            for i in range(maxlen):
                c = codes[:, i].astype(np.uint64)
                live = c != 0
                if not live.any():
                    break
                h = np.where(live, (h ^ c) * _U(FNV_P), h)
    return splitmix64(h)


# ---------------------------------------------------------------------------
# DuckDB SQL expression builders — same values, computed by the oracle
# ---------------------------------------------------------------------------

_TWO64 = "18446744073709551616"


def sql_splitmix64(x_expr: str) -> str:
    """SQL text computing splitmix64 of ``x_expr`` (any integer expression in
    [0, 2^64)). Multiplications run in UHUGEINT (unsigned 128-bit — a 64x64
    product always fits) with explicit mod 2^64; xor/shift run on UBIGINT.
    NB: ``x_expr`` is textually duplicated 8x — pass a cheap expression
    (ideally a column name from a prior CTE)."""
    z1 = f"((({x_expr})::UHUGEINT + 11400714819323198485) % {_TWO64})"
    z2 = (
        f"((xor(({z1})::UBIGINT, ({z1})::UBIGINT >> 30)::UHUGEINT"
        f" * 13787848793156543929) % {_TWO64})"
    )
    z3 = (
        f"((xor(({z2})::UBIGINT, ({z2})::UBIGINT >> 27)::UHUGEINT"
        f" * 10723151780598845931) % {_TWO64})"
    )
    return f"(xor(({z3})::UBIGINT, ({z3})::UBIGINT >> 31))"


def sql_fnv_fold(s_expr: str, seed: int = DEFAULT_SEED) -> str:
    """SQL text for the FNV-1a codepoint fold of string expression
    ``s_expr`` (BEFORE the splitmix finalizer — apply :func:`sql_splitmix64`
    to the resulting column in an outer SELECT so the fold runs once)."""
    return (
        f"list_reduce(list_prepend({_h0(seed)}::UHUGEINT, "
        f"[unicode(c)::UHUGEINT FOR c IN string_split({s_expr}, '') IF c != '']), "
        f"(h, c) -> (xor(h::UBIGINT, c::UBIGINT)::UHUGEINT"
        f" * {FNV_P}) % {_TWO64})"
    )


def sql_hash_str(s_expr: str, seed: int = DEFAULT_SEED) -> str:
    """One-shot convenience: full hash of ``s_expr`` as a single expression.
    The FNV fold is duplicated 8x by the splitmix expansion — only use on
    small row counts; for bulk work put :func:`sql_fnv_fold` in a CTE column
    and finalize with ``sql_splitmix64('<col>')``."""
    return sql_splitmix64(sql_fnv_fold(s_expr, seed))
