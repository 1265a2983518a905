"""Property-based invariants for core state structures (hypothesis)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.frontier import Frontier
from anycrawl_ray.functions.agents import TextChunker


# ---------------------------------------------------------------------------
# Frontier: spilling to parquet segments must NOT change the pop sequence
# ---------------------------------------------------------------------------

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("push"), st.integers(0, 30)),      # push batch of n urls
        st.tuples(st.just("pop"), st.integers(1, 40)),       # pop wave of n
    ),
    min_size=1, max_size=30,
)


@given(_OPS, st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_frontier_spill_invariant(ops, cap):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        plain = Frontier("a", spill_threshold=10**9)
        spilly = Frontier("b", spill_threshold=4, spill_dir=d, segment_rows=3)
        counter = 0
        for op, n in ops:
            if op == "push":
                urls = [f"http://h{(counter + i) % 5}.t/p/{counter + i}" for i in range(n)]
                plain.push_rows(urls, [0] * n)
                spilly.push_rows(urls, [0] * n)
                counter += n
            else:
                a = plain.pop_wave(n, per_host_cap=cap)
                b = spilly.pop_wave(n, per_host_cap=cap)
                assert a == b
            assert len(plain) == len(spilly)
        # drain fully — remaining order identical
        while len(plain):
            assert plain.pop_wave(7, per_host_cap=cap) == spilly.pop_wave(7, per_host_cap=cap)
        assert len(spilly) == 0


# ---------------------------------------------------------------------------
# TextChunker: token budget respected; full line coverage in order
# ---------------------------------------------------------------------------

# lines without edge whitespace so chunk.strip() round-trips exactly
_LINE = st.text(alphabet="abcdefgh", min_size=0, max_size=40).map(
    lambda x: x.strip()
)
_TEXT = st.lists(_LINE, min_size=0, max_size=30).map("\n".join)


@given(_TEXT, st.integers(8, 64), st.integers(0, 8))
@settings(max_examples=200, deadline=None)
def test_chunker_invariants(text, max_tokens, overlap):
    ch = TextChunker()
    chunks = ch.split_text_into_chunks(text, max_tokens, overlap)
    if not text.strip():
        assert chunks == []
        return
    # budget: the algorithm's own incremental accounting (sum of
    # counter(line+"\n") over the chunk's NEW lines) never exceeds
    # max_tokens unless the chunk is a single over-budget line. Only
    # checkable at overlap=0 where chunks contain no carried lines.
    if overlap == 0:
        for c in chunks:
            lines = [l for l in c.chunk.split("\n") if l]
            inc = sum(ch.token_counter(l + "\n") for l in lines)
            assert inc <= max_tokens or len(lines) == 1
    # concatenation (ignoring overlap repeats) covers every original
    # non-empty line IN ORDER
    remaining = [l for l in text.split("\n") if l]
    for c in chunks:
        for line in c.chunk.split("\n"):
            if remaining and line == remaining[0]:
                remaining.pop(0)
    assert remaining == []


# ---------------------------------------------------------------------------
# PathMatcher: compiled batch matcher == scalar matches_paths on random
# url/pattern combinations
# ---------------------------------------------------------------------------

from anycrawl_ray.pathmatch import PathMatcher, matches_paths

_PAT = st.sampled_from([
    "http://h*.t/p/*", "*/p/00*", "*[0-4]", "/p\\/\\d+/", "http://h0.t/*",
    "*sec*", "*", "p/??", "/x$/",
])
_URL = st.sampled_from([
    "http://h0.t/p/0001", "http://h1.t/p/0042#sec1", "http://h0.t/q/9",
    "http://other.test/p/003", "http://h2.t/", "http://h0.t/p/0001?x=1",
])


@given(st.lists(_PAT, max_size=3), st.lists(_PAT, max_size=3),
       st.lists(_URL, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_pathmatcher_batch_equals_scalar(include, exclude, urls):
    m = PathMatcher(include, exclude)
    assert list(m.match_many(urls)) == [
        matches_paths(u, include, exclude) for u in urls
    ]


# ---------------------------------------------------------------------------
# Seen shard: cuckoo -> bloom spill must never drop or duplicate URLs
# (first-occurrence-wins semantics identical to a plain Python set)
# ---------------------------------------------------------------------------

from anycrawl_ray.state.seen import SeenShardCore, stable_hash64


@given(st.lists(st.integers(0, 400), min_size=1, max_size=60),
       st.sampled_from([4, 16, 1 << 18]))
@settings(max_examples=100, deadline=None)
def test_seen_shard_matches_python_set(batches_seed, capacity):
    import numpy as np

    shard = SeenShardCore(0, capacity=capacity)  # tiny capacity forces spill
    ref: set[str] = set()
    # group the ints into batches of <=8 urls
    ints = batches_seed
    for i in range(0, len(ints), 8):
        urls = [f"http://h{v % 7}.t/p/{v}" for v in ints[i : i + 8]]
        mask = shard.check_and_add(urls, stable_hash64(urls))
        expect = []
        for u in urls:
            expect.append(u not in ref)
            ref.add(u)
        assert list(mask) == expect
    probe = [f"http://h{v % 7}.t/p/{v}" for v in range(0, 420, 13)]
    got = shard.contains(probe, stable_hash64(probe))
    assert list(got) == [u in ref for u in probe]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=6),
                       st.integers(min_value=1, max_value=10**9),
                       min_size=1, max_size=30),
       st.integers(min_value=0, max_value=10**6))
def test_largest_remainder_quota_laws(counts, n_target):
    from anycrawl_ray.queries import largest_remainder_quotas

    q = largest_remainder_quotas(counts, n_target)
    assert set(q) == set(counts)
    assert all(v >= 0 for v in q.values())
    import numpy as np
    w = {s: int(np.sqrt(n)) for s, n in counts.items()}
    tw = sum(w.values())
    if tw == 0:
        assert sum(q.values()) == 0
        return
    assert sum(q.values()) == n_target
    # each quota within 1 seat of its exact proportional share
    for s in counts:
        exact = n_target * w[s] / tw
        assert exact - 1 < q[s] < exact + 1 + 1e-9
    # determinism
    assert q == largest_remainder_quotas(dict(counts), n_target)


# ---------------------------------------------------------------------------
# _ragged_aranges: vectorized concatenate-of-aranges, incl. zero-length runs
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(0, 12), max_size=40))
@settings(max_examples=150, deadline=None)
def test_ragged_aranges_matches_loop(lens):
    import numpy as np
    from anycrawl_ray.queries import _ragged_aranges

    got = _ragged_aranges(np.asarray(lens, dtype=np.int64))
    want = (np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
            if lens and sum(lens) else np.zeros(0, dtype=np.int64))
    assert got.dtype == np.int64
    assert np.array_equal(got, want)
