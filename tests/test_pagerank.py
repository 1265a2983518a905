"""PageRank: sharded-actor parity vs dense numpy + edge-extraction checks."""

import numpy as np
import pyarrow as pa
import pytest

from anycrawl_ray.functions.pagerank import (
    link_edges,
    pagerank,
    pagerank_dense,
)


def _edges(pairs):
    a, b = zip(*pairs) if pairs else ((), ())
    return pa.table({"src": pa.array(list(a), pa.int64()),
                     "dst": pa.array(list(b), pa.int64())})


def test_pagerank_matches_dense_fixed_iters(ray_session):
    rng = np.random.RandomState(17)
    n = 120
    pairs = {(int(rng.randint(n)), int(rng.randint(n))) for _ in range(600)}
    e = _edges(sorted(pairs))
    got = pagerank(e, n, tol=0.0, max_iters=40, n_shards=4)
    want = pagerank_dense(e, n, tol=0.0, max_iters=40)
    assert got.column("node").to_pylist() == list(range(n))
    np.testing.assert_allclose(got.column("rank").to_numpy(), want,
                               rtol=0, atol=1e-9)
    # stochastic: total rank mass ~ 1 (dangling redistributed)
    assert abs(got.column("rank").to_numpy().sum() - 1.0) < 1e-9


def test_pagerank_hub_ranks_highest(ray_session):
    # star graph: everyone links to node 0
    n = 30
    e = _edges([(i, 0) for i in range(1, n)])
    got = pagerank(e, n, n_shards=2)
    r = got.column("rank").to_numpy()
    assert r[0] == r.max()
    np.testing.assert_allclose(r[1:], r[1], atol=1e-12)  # symmetry


def test_pagerank_all_dangling_uniform(ray_session):
    got = pagerank(_edges([]), 8, n_shards=2)
    np.testing.assert_allclose(got.column("rank").to_numpy(), 1.0 / 8,
                               atol=1e-12)


def test_link_edges_resolves_and_drops_dead(ray_session):
    from anycrawl_ray.corpus import CorpusConfig, CorpusIndex, generate_corpus

    corpus = generate_corpus("/root/testdata/sf0.001",
                             CorpusConfig(n_pages=120))
    e = link_edges(corpus)
    assert e.num_rows > 0
    src = e.column("src").to_numpy()
    dst = e.column("dst").to_numpy()
    assert src.min() >= 0 and dst.min() >= 0
    assert src.max() < 120 and dst.max() < 120  # dead links dropped
    # DISTINCT edges
    key = set(zip(src.tolist(), dst.tolist()))
    assert len(key) == e.num_rows
    # spot-check one page's links against a driver-side re-derivation
    from anycrawl_ray.urlnorm import canonicalize_links, strip_fragment

    idx = CorpusIndex(corpus)
    url = corpus.column("doc_id")[0].as_py()
    spans = corpus.column("spans")[0].as_py()
    hrefs = [s["media_ref"] for s in spans if s["kind"] == "link"]
    want = {
        int(d)
        for d in idx.lookup_batch(
            [strip_fragment(h) for h in canonicalize_links(hrefs, url)]
        )
        if d >= 0
    }
    so = int(idx.lookup_batch([strip_fragment(url)])[0])
    got0 = {int(d) for s, d in zip(src.tolist(), dst.tolist()) if s == so}
    assert got0 == want
