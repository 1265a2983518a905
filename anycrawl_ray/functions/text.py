"""Text-analysis operators for training-data pipelines (SURVEY.md build brief).

All batch functions are Arrow-vectorized (pyarrow.compute kernels + numpy
segment sums over list offsets) — no per-row Python in the hot path — and are
designed to run inside ``ds.map_batches(..., batch_format="pyarrow")``.

Operators:
- token counting   (whitespace tokens; BPE-ish regex tokens)
- language ID      (stopword-profile scoring + CJK character ratio)
- quality scoring  (length/alpha/digit/stopword components)
- fingerprinting   (winnowing over rolling k-gram hashes; Schleimer et al.,
                    SIGMOD 2003 — public algorithm)

The scoring formulas are intentionally SQL-replicable so DuckDB oracles can
verify the Ray output value-for-value (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Small, real stopword profiles (public common-word lists).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "de": ("der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
}
LANG_ORDER = ("en", "es", "de", "fr")  # deterministic tie-break priority
CJK_THRESHOLD = 0.2


def _segment_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum ``values`` per list row given Arrow list offsets (handles empties)."""
    cum = np.concatenate([[0], np.cumsum(values, dtype=np.int64)])
    return cum[offsets[1:]] - cum[offsets[:-1]]


def _tokens(arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Whitespace tokens (lowercased flat array) + list offsets; empty tokens
    are counted out by the caller via utf8_length > 0."""
    toks = pc.utf8_split_whitespace(arr)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks, toks.offsets.to_numpy()


def token_counts(texts: pa.Array) -> np.ndarray:
    """Non-empty whitespace-token count per document."""
    toks, offsets = _tokens(texts)
    nonempty = (pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False) > 0).astype(np.int64)
    return _segment_sums(nonempty, offsets)


_BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_counts(texts: pa.Array) -> np.ndarray:
    """GPT-2-style pre-tokenizer regex match count (public pattern shape)."""
    hits = pc.extract_regex_span_all(texts, _BPE_PATTERN) if hasattr(pc, "extract_regex_span_all") else None
    if hits is not None:
        return pc.list_value_length(hits).to_numpy(zero_copy_only=False).astype(np.int64)
    import re

    rx = re.compile(_BPE_PATTERN)
    return np.array(
        [len(rx.findall(t)) for t in texts.to_pylist()], dtype=np.int64
    )


def _char_class_counts(texts: pa.Array, pattern_keep: str) -> np.ndarray:
    """Count characters matching a regex class, vectorized via replace+length."""
    stripped = pc.replace_substring_regex(texts, pattern_keep, "")
    return pc.utf8_length(stripped).to_numpy(zero_copy_only=False).astype(np.int64)


def stopword_hits(texts: pa.Array, lang: str) -> np.ndarray:
    toks, offsets = _tokens(texts)
    lower = pc.utf8_lower(toks.flatten())
    hit = pc.is_in(lower, value_set=pa.array(STOPWORDS[lang])).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    return _segment_sums(hit, offsets)


def text_features(texts: pa.Array) -> dict[str, np.ndarray]:
    """All per-doc features in one pass over the token arrays."""
    toks, offsets = _tokens(texts)
    flat = toks.flatten()
    flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    lower = pc.utf8_lower(flat)

    feats: dict[str, np.ndarray] = {}
    feats["n_chars"] = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    feats["n_tokens"] = _segment_sums((flat_len > 0).astype(np.int64), offsets)
    feats["alpha_chars"] = _char_class_counts(texts, "[^A-Za-z]")
    feats["digit_chars"] = _char_class_counts(texts, "[^0-9]")
    feats["cjk_chars"] = _char_class_counts(texts, "[^一-鿿]")
    for lang in LANG_ORDER:
        hit = pc.is_in(lower, value_set=pa.array(STOPWORDS[lang])).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        feats[f"stop_{lang}"] = _segment_sums(hit, offsets)
    return feats


def language_from_features(f: dict[str, np.ndarray]) -> list[str]:
    """CJK ratio -> zh; else argmax stopword hits (ties: LANG_ORDER priority);
    zero hits everywhere -> 'unknown'. Deterministic; SQL-replicable."""
    n = len(f["n_chars"])
    with np.errstate(invalid="ignore", divide="ignore"):
        cjk_ratio = np.where(f["n_chars"] > 0, f["cjk_chars"] / np.maximum(f["n_chars"], 1), 0.0)
    scores = np.stack([f[f"stop_{l}"] for l in LANG_ORDER])  # (4, n)
    best = scores.argmax(axis=0)  # first max wins = LANG_ORDER priority
    out = []
    for i in range(n):
        if cjk_ratio[i] > CJK_THRESHOLD:
            out.append("zh")
        elif scores[best[i], i] == 0:
            out.append("unknown")
        else:
            out.append(LANG_ORDER[best[i]])
    return out


def language_id(texts: pa.Array) -> list[str]:
    return language_from_features(text_features(texts))


def quality_from_features(f: dict[str, np.ndarray]) -> np.ndarray:
    """Composite quality score in [0,1]; formula mirrored in oracle SQL.

    score = 0.3*least(n_tokens/64, 1) + 0.3*alpha_ratio
          + 0.2*(1 - digit_ratio)     + 0.2*least(5*stop_ratio, 1)
    """
    n_chars = np.maximum(f["n_chars"], 1).astype(np.float64)
    n_tokens = f["n_tokens"].astype(np.float64)
    stop_all = sum(f[f"stop_{l}"] for l in LANG_ORDER).astype(np.float64)
    alpha_ratio = f["alpha_chars"] / n_chars
    digit_ratio = f["digit_chars"] / n_chars
    stop_ratio = np.where(n_tokens > 0, stop_all / np.maximum(n_tokens, 1), 0.0)
    return (
        0.3 * np.minimum(n_tokens / 64.0, 1.0)
        + 0.3 * alpha_ratio
        + 0.2 * (1.0 - digit_ratio)
        + 0.2 * np.minimum(5.0 * stop_ratio, 1.0)
    )


def quality_scores(texts: pa.Array) -> np.ndarray:
    return quality_from_features(text_features(texts))


# ---------------------------------------------------------------------------
# Fast in-pipeline metrics — byte-level numpy over the raw UTF-8 buffers.
# Used by the fetch/parse stage where metrics are advisory columns (no SQL
# oracle); ~50x cheaper than the exact kernels above on large documents.
# ---------------------------------------------------------------------------


def _flat_bytes(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes, per-row byte offsets) for a string array (offset-safe)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    raw = np.frombuffer(texts.buffers()[1], dtype=np.int32)
    offs = raw[texts.offset : texts.offset + len(texts) + 1].astype(np.int64)
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    return data, offs


def _seg(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-row sums of a byte-level mask — one reduceat pass, no cumsum alloc."""
    n = len(offs) - 1
    out = np.zeros(n, dtype=np.int64)
    nonempty = np.flatnonzero(offs[:-1] < offs[1:])
    if len(nonempty) == 0:
        return out
    starts = offs[:-1][nonempty]
    sums = np.add.reduceat(mask, starts, dtype=np.int64)
    # reduceat's last segment runs to the end of the buffer; trim it
    end = offs[1:][nonempty[-1]]
    if end < len(mask):
        sums[-1] -= mask[end:].sum(dtype=np.int64)
    out[nonempty] = sums
    return out


def fast_text_metrics(texts: pa.Array, langid_prefix: int = 512) -> dict:
    """n_tokens / quality / lang per row from one pass over the byte buffer.

    quality uses the same shape as :func:`quality_from_features` but with
    byte-length denominators and without the stopword term spread (stopwords
    are sampled from a prefix, like langid). Advisory metrics only.
    """
    data, offs = _flat_bytes(texts)
    n = len(offs) - 1
    ws = (data == 32) | (data == 9) | (data == 10) | (data == 13)
    nonws = ~ws
    alpha = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    digit = (data >= 48) & (data <= 57)
    # token starts: non-ws preceded by ws (or row start)
    prev_nonws = np.concatenate([[False], nonws[:-1]])
    starts = nonws & ~prev_nonws
    row_starts = offs[:-1][offs[:-1] < len(data)]
    starts[row_starts] = nonws[row_starts]

    n_bytes = (offs[1:] - offs[:-1]).astype(np.int64)
    n_tokens = _seg(starts, offs)
    alpha_c = _seg(alpha, offs)
    digit_c = _seg(digit, offs)

    denom = np.maximum(n_bytes, 1).astype(np.float64)
    quality = (
        0.3 * np.minimum(n_tokens / 64.0, 1.0)
        + 0.3 * (alpha_c / denom)
        + 0.2 * (1.0 - digit_c / denom)
        + 0.2 * np.minimum(n_tokens / np.maximum(n_bytes / 8.0, 1.0), 1.0)
    )

    # langid on a short prefix — stopword profiles converge fast
    prefix = pc.utf8_slice_codeunits(texts, 0, langid_prefix)
    lang = language_from_features(text_features(prefix))
    return {"n_tokens": n_tokens, "quality": np.round(quality, 6), "lang": lang}


# ---------------------------------------------------------------------------
# Document fingerprinting: winnowing over rolling k-gram hashes
# ---------------------------------------------------------------------------

_B = np.uint64(1_000_003)
_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rabin-Karp rolling hashes of all k-char grams (vectorized)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = 1
        for i in range(1, k):
            powers[i] = powers[i - 1] * _B
        # hash[i] = sum(data[i+j] * B^(k-1-j))
        windows = np.lib.stride_tricks.sliding_window_view(data, k)
        return (windows * powers[::-1]).sum(axis=1, dtype=np.uint64)


def winnow_from_hashes(h: np.ndarray, w: int = 4) -> np.ndarray:
    """Winnowing selection over precomputed k-gram hashes (callers that
    already hold the rolling hashes avoid recomputing them)."""
    if len(h) == 0:
        return h
    if len(h) <= w:
        return np.array([h.min()], dtype=np.uint64)
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum per window
    rev_argmin = w - 1 - np.argmin(wins[:, ::-1], axis=1)
    picks = np.arange(len(wins)) + rev_argmin
    sel = np.unique(picks)
    return h[sel]


def winnow_fingerprints(text: str, k: int = 8, w: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): min hash per sliding window of w
    k-gram hashes; rightmost-min rule; dedup consecutive selections."""
    return winnow_from_hashes(rolling_kgram_hashes(text, k), w)


def doc_fingerprint(text: str, k: int = 8, w: int = 4) -> int:
    """Single stable fingerprint: XOR of winnowed hash set (order-free)."""
    fps = winnow_fingerprints(text, k, w)
    out = np.uint64(0)
    for v in fps:
        out ^= v
    return int(out)
