"""Headroom-table generator: schema parity with the base dir, exact row
scaling, deterministic output (same seed → byte-identical tables)."""

import pyarrow.parquet as pq

from anycrawl_ray.scalegen import BASE_SF, generate_scaled_dir

SCALED = ["documents", "events", "embeddings", "lineitem", "orders"]
PASSTHROUGH = ["region", "nation", "customer", "supplier", "part"]


def test_scaled_dir_shape_and_determinism(tmp_path):
    mult = 2
    d1 = generate_scaled_dir(str(tmp_path / "a"), mult=mult)
    d2 = generate_scaled_dir(str(tmp_path / "b"), mult=mult)
    for name in SCALED + PASSTHROUGH:
        base = pq.read_table(f"{BASE_SF}/{name}.parquet")
        t1 = pq.read_table(f"{d1}/{name}.parquet")
        # schema parity (ignore pandas metadata on the base files)
        assert [f.name for f in t1.schema] == [f.name for f in base.schema]
        assert [f.type for f in t1.schema] == [f.type for f in base.schema]
        want = base.num_rows * (mult if name in SCALED else 1)
        assert t1.num_rows == want, name
        # determinism: a second generation is identical
        t2 = pq.read_table(f"{d2}/{name}.parquet")
        assert t1.equals(t2), name

    # workload shape: exact duplicates exist for the dedup family,
    # and join fan-out (lineitems per order) is preserved
    docs = pq.read_table(f"{d1}/documents.parquet").column("text").to_pylist()
    assert len(docs) - len(set(docs)) >= mult * 8  # ~0.16% dup rate
    li = pq.read_table(f"{d1}/lineitem.parquet")
    orders = pq.read_table(f"{d1}/orders.parquet")
    assert round(li.num_rows / orders.num_rows) == 4

    # idempotence: _DONE short-circuits
    assert generate_scaled_dir(str(tmp_path / "a"), mult=mult) == d1


def test_corpus_index_take_spans_chunked():
    """take_spans must be O(batch) and correct on MULTI-chunk corpora
    (parquet reads >131072 rows come back chunked; ChunkedArray.take
    concatenates internally — the 10x headroom regression), including the
    all-miss empty gather."""
    import numpy as np
    import pyarrow as pa

    from anycrawl_ray.corpus import CorpusConfig, CorpusIndex, generate_corpus

    tab = generate_corpus("/root/testdata/sf0.001", CorpusConfig(n_pages=300))
    # force a 3-chunk spans column with identical rows
    spans = tab.column("spans")
    chunked = pa.chunked_array([spans.slice(0, 100).combine_chunks(),
                                spans.slice(100, 100).combine_chunks(),
                                spans.slice(200, 100).combine_chunks()])
    tab3 = tab.set_column(tab.schema.get_field_index("spans"), "spans", chunked)
    idx1, idx3 = CorpusIndex(tab), CorpusIndex(tab3)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 300, 64).astype(np.int64)
    a = idx1.take_spans(ids)
    b = idx3.take_spans(ids)
    assert a.equals(b)
    assert len(idx3.take_spans(np.array([], np.int64))) == 0
    # order preservation across chunk boundaries
    ids2 = np.array([250, 5, 150, 5, 299, 0], np.int64)
    assert idx3.take_spans(ids2).equals(idx1.take_spans(ids2))
