"""Property tests pinning the three strhash implementations to each other.

The SQL oracles for the near-dup family are only sound if numpy, Python and
DuckDB compute the exact same hash for every string — these tests are the
contract.
"""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.functions import strhash as sh

# no NUL (documented contract), no surrogates (not valid UTF-8)
_CHARS = st.characters(
    min_codepoint=1, max_codepoint=0x2FFFF, blacklist_categories=("Cs",)
)


@given(st.lists(st.text(_CHARS, max_size=60), max_size=30), st.integers(0, 2**31))
@settings(max_examples=150, deadline=None)
def test_numpy_matches_python(strs, seed):
    got = sh.hash_strings(strs, seed=seed)
    want = [sh.hash_string_py(s, seed=seed) for s in strs]
    assert [int(x) for x in got] == want


@given(st.lists(st.text(_CHARS, max_size=40), min_size=1, max_size=12))
@settings(max_examples=25, deadline=None)
def test_duckdb_matches_python(strs):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(strs)))
        + ") v(i, s)",
        strs,
    )
    q = (
        f"SELECT i, {sh.sql_splitmix64('f')} AS h FROM "
        f"(SELECT i, {sh.sql_fnv_fold('s')} AS f FROM t) ORDER BY i"
    )
    got = [int(r[1]) for r in con.sql(q).fetchall()]
    assert got == [sh.hash_string_py(s) for s in strs]


def test_sql_splitmix_matches_numpy_on_ints():
    from anycrawl_ray.functions.sketch import splitmix64

    xs = [0, 1, 7777, 2**63, 2**64 - 1, 123456789012345678]
    want = [int(v) for v in splitmix64(np.array(xs, dtype=np.uint64))]
    con = duckdb.connect()
    got = [
        int(con.sql(f"SELECT {sh.sql_splitmix64(str(x))}").fetchone()[0]) for x in xs
    ]
    assert want == got


def test_seed_changes_hash():
    assert sh.hash_string_py("abc", 1) != sh.hash_string_py("abc", 2)
    assert int(sh.hash_strings(["abc"], 1)[0]) == sh.hash_string_py("abc", 1)


def test_long_string_batch_guard():
    # heterogeneous lengths exercise the padded-matrix path end to end
    strs = ["x" * n for n in (0, 1, 7, 300, 5000)]
    got = sh.hash_strings(strs)
    assert [int(x) for x in got] == [sh.hash_string_py(s) for s in strs]
