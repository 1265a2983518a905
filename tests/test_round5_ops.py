"""Round-5 operators: star_join / regex_mentions / pca_project / bpe_train.

Correctness vs DuckDB for the two SQL entries lives in
test_queries_oracle.py (SQL_CHECKED); here we pin the non-SQL semantics:
the BPE merge table on a hand-computed fixture, PCA numpy parity on the
full embedding table, and the star join's integer micro-unit arithmetic.
"""

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anycrawl_ray.queries import (  # noqa: E402
    bpe_train_merges,
    q_bpe_train,
    q_pca_project,
    q_star_join,
)

SF_DIR = "/root/testdata/sf0.01"


class TestBpeMerges:
    def test_hand_computed_fixture(self):
        # vocab: low*3, lower*2, newest*6, widest*3  (classic BPE example)
        vocab = [("low", 3), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = bpe_train_merges(vocab, 4)
        # pair counts round 1: ('e','s') = 6+3 = 9 (newest+widest),
        # ('s','t') = 9, ('t','</w>') = 9, ('w','e') = 6 ... tie on 9 breaks
        # lexicographically: ('e','s') < ('s','t') < ('t','</w>')
        assert merges[0] == ("e", "s", 9)
        # after merging 'es': ('es','t')=9 and ('t','</w>')=9 tie ->
        # ('es','t') wins lexicographically ('e' < 't')
        assert merges[1] == ("es", "t", 9)
        # then ('est','</w>') = 9 is the unique max
        assert merges[2] == ("est", "</w>", 9)
        # round 4: in 'n e w est</w>' the pairs ('e','w'), ('n','e') and
        # ('w','est</w>') all have freq 6 (vs ('l','o')=5, ('o','w')=5);
        # the tie breaks lexicographically -> ('e','w')
        assert merges[3] == ("e", "w", 6)

    def test_merge_exhaustion_stops_early(self):
        merges = bpe_train_merges([("ab", 5)], 10)
        # 'a b </w>' has 2 pairs -> at most 2 merges possible
        assert len(merges) == 2
        assert merges[0] == ("a", "b", 5)
        assert merges[1] == ("ab", "</w>", 5)

    def test_deterministic_over_corpus(self, ray_session):
        a = q_bpe_train(SF_DIR)
        b = q_bpe_train(SF_DIR)
        assert a.equals(b)
        assert a.num_rows == 40
        # every merged symbol's frequency is non-increasing in rank only
        # within a merge "generation", but pair_freq must stay positive
        assert min(a.column("pair_freq").to_pylist()) > 0


class TestPcaProject:
    def test_numpy_parity_full_table(self, ray_session):
        t = q_pca_project(SF_DIR)
        emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
        x = np.asarray(emb.column("embedding").to_pylist(), np.float64)
        mu = x.mean(axis=0)
        cov = np.cov(x, rowvar=False, bias=True)
        w, v = np.linalg.eigh(cov)
        comp = v[:, np.argsort(w)[::-1][:4]]
        for j in range(4):
            if comp[np.argmax(np.abs(comp[:, j])), j] < 0:
                comp[:, j] = -comp[:, j]
        ref = (x - mu) @ comp
        order = np.argsort(emb.column("vec_id").to_numpy())
        got = np.stack(
            [t.column(f"pc{j + 1}").to_numpy() for j in range(4)], axis=1)
        # distributed partial sums reorder float adds; parity is ~1e-12
        assert np.max(np.abs(got - ref[order])) < 1e-9

    def test_pc1_captures_most_variance(self, ray_session):
        t = q_pca_project(SF_DIR)
        variances = [float(np.var(t.column(f"pc{j + 1}").to_numpy()))
                     for j in range(4)]
        assert variances == sorted(variances, reverse=True)
        assert variances[0] > 0


class TestStarJoin:
    def test_micro_unit_arithmetic_is_exact(self, ray_session):
        """The integer micro-unit sum must make the revenue double identical
        across runs (partial-sum order varies with scheduling)."""
        a = q_star_join(SF_DIR)
        b = q_star_join(SF_DIR)
        assert a.equals(b)
        assert a.num_rows == 5  # one row per nation in the region
        assert all(v > 0 for v in a.column("line_count").to_pylist())


class TestDDSketch:
    def test_error_bound_synthetic(self):
        """DDSketch quantiles are within relative error alpha of the exact
        nearest-rank quantiles on a heavy-tailed lognormal stream, merged
        from many independent partial bincounts (the map_batches shape)."""
        from anycrawl_ray.functions.sketch import (
            DD_ALPHA, dd_bucket_indices, dd_quantiles_from_buckets)

        rng = np.random.default_rng(42)
        vals = np.exp(rng.normal(1.0, 2.0, 200_000))
        # simulate 37 blocks merged by summed bincounts
        merged: dict[int, int] = {}
        for chunk in np.array_split(vals, 37):
            u, c = np.unique(dd_bucket_indices(chunk), return_counts=True)
            for b, n in zip(u, c):
                merged[int(b)] = merged.get(int(b), 0) + int(n)
        idx = np.array(sorted(merged), np.int64)
        cnt = np.array([merged[b] for b in sorted(merged)], np.int64)
        qs = [0.01, 0.1, 0.5, 0.9, 0.99]
        est = dd_quantiles_from_buckets(idx, cnt, qs)
        true = np.quantile(vals, qs, method="inverted_cdf")
        assert np.all(np.abs(est - true) / true <= DD_ALPHA)

    def test_query_error_gate(self, ray_session):
        import duckdb

        from anycrawl_ray.queries import _DD_QS, q_dd_quantiles

        t = q_dd_quantiles(SF_DIR).to_pandas()
        ev = duckdb.connect().execute(
            f"SELECT event_type, value FROM '{SF_DIR}/events.parquet'").df()
        for et, grp in ev.groupby("event_type"):
            v = np.sort(grp["value"].to_numpy())
            for q in _DD_QS:
                true = v[max(1, int(np.ceil(q * len(v)))) - 1]
                est = t[(t.event_type == et) & (t.q == q)]["estimate"].iloc[0]
                assert abs(est - true) / true <= 0.0101, (et, q, est, true)


class TestSaltedDistinct:
    def test_salting_partitions_users_disjointly(self, ray_session):
        """Per-salt distinct counts must add exactly — a user never lands
        in two salts, so the salted sum equals the unsalted distinct."""
        import duckdb

        from anycrawl_ray.queries import q_distinct_users_salted

        t = q_distinct_users_salted(SF_DIR).to_pandas()
        exact = duckdb.connect().execute(
            f"SELECT event_type, COUNT(DISTINCT user_id) AS n_users "
            f"FROM '{SF_DIR}/events.parquet' GROUP BY event_type").df()
        m = t.merge(exact, on="event_type", suffixes=("", "_exact"))
        assert (m["n_users"] == m["n_users_exact"]).all()


class TestEmbeddingQuantize:
    def test_error_bound_and_codes(self, ray_session):
        from anycrawl_ray.queries import q_embedding_quantize

        t = q_embedding_quantize(SF_DIR)
        emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
        x = np.asarray(emb.column("embedding").to_pylist(), np.float64)
        lo, hi = x.min(axis=0), x.max(axis=0)
        step = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
        # per-vector max reconstruction error <= half a step (+ fp slack)
        assert t.num_rows == len(x)
        max_err = np.array(t.column("max_err").to_pylist())
        assert np.all(max_err <= step.max() / 2 + 1e-12)
        # codes are d bytes each
        assert all(len(c) == x.shape[1] for c in t.column("code").to_pylist()[:10])

    def test_roundtrip_decodes_back(self, ray_session):
        from anycrawl_ray.queries import q_embedding_quantize

        t = q_embedding_quantize(SF_DIR)
        emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
        x = np.asarray(emb.column("embedding").to_pylist(), np.float64)
        order = np.argsort(emb.column("vec_id").to_numpy())
        x = x[order]
        lo, hi = x.min(axis=0), x.max(axis=0)
        step = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
        codes = np.frombuffer(
            b"".join(t.column("code").to_pylist()), np.uint8
        ).reshape(len(x), -1)
        recon = codes * step + lo
        assert np.abs(recon - x).max() <= step.max() / 2 + 1e-12


class TestBpeProperties:
    def test_parity_vs_naive_counter_reference(self):
        """Independent reimplementation with collections.Counter (different
        code path: re-tokenizes from the raw words each round) must produce
        the identical merge table on randomized vocabularies."""
        from collections import Counter
        import random

        def naive(vocab, n_merges):
            merges = []
            applied = []

            def segment(word):
                sym = list(word) + ["</w>"]
                for a, b in applied:
                    out, i = [], 0
                    while i < len(sym):
                        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(sym[i])
                            i += 1
                    sym = out
                return sym

            for _ in range(n_merges):
                pairs = Counter()
                for w, c in vocab:
                    sym = segment(w)
                    for i in range(len(sym) - 1):
                        pairs[(sym[i], sym[i + 1])] += c
                if not pairs:
                    break
                best = min(pairs, key=lambda p: (-pairs[p], p))
                merges.append((best[0], best[1], pairs[best]))
                applied.append(best)
            return merges

        rng = random.Random(1234)
        for trial in range(25):
            n_words = rng.randint(1, 12)
            vocab = []
            seen = set()
            for _ in range(n_words):
                w = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 6)))
                if w in seen:
                    continue
                seen.add(w)
                vocab.append((w, rng.randint(1, 9)))
            k = rng.randint(1, 8)
            assert bpe_train_merges(vocab, k) == naive(vocab, k), (trial, vocab, k)

    def test_max_pair_freq_non_increasing(self):
        """A merge's pair frequency can never exceed the previous merge's:
        every pair created by a merge occurs at most as often as the pair
        that was merged."""
        import random

        rng = random.Random(99)
        for _ in range(10):
            vocab = [("".join(rng.choice("abc") for _ in range(rng.randint(2, 8))),
                      rng.randint(1, 5)) for _ in range(8)]
            merges = bpe_train_merges(list(dict(vocab).items()), 12)
            freqs = [m[2] for m in merges]
            assert freqs == sorted(freqs, reverse=True), freqs
