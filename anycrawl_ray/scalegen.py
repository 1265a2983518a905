"""Deterministic scale-up generator for the headroom benchmark.

Synthesizes an sf1-shaped directory (``mult``× the sf0.1 row counts) from
public knowledge of the test tables' generative shape — NO external data
(the graft mandate): word-salad documents over the same 30-word vocabulary,
uniform event streams over the same 30-day window, unit-norm embeddings,
and bootstrap-resampled lineitem/orders with re-keyed joins so join fan-out
(≈4 lineitems/order) and every column marginal are preserved at 10×.

Purpose (VERDICT r3 next #6): run the dedup family + the heaviest analytics
entries at sf0.1 AND at the 10× point and check per-row cost flatness —
the single-node stand-in for "would this still work at 100 TB". Everything
is seeded; two runs produce byte-identical tables, so the 10× numbers are
reproducible across bench sessions.

Generation itself is vectorized (numpy PCG64 + arrow take); the 6M-row
lineitem bootstrap is one ``take`` on the memory-mapped base table.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_SF = "/root/testdata/sf0.1"

# the 30-word vocabulary observed in the driver's documents tables (public
# synthetic data; uniform usage) — "dup" is reserved for duplicate markers
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def _documents(n: int, rng: np.random.Generator) -> pa.Table:
    """Word-salad docs: 10-100 words/doc uniform, ~0.16% exact-dup copies."""
    lens = rng.integers(10, 101, n)
    total = int(lens.sum())
    words = np.asarray(VOCAB, dtype=object)[rng.integers(0, len(VOCAB), total)]
    bounds = np.concatenate(([0], np.cumsum(lens)))
    texts = np.empty(n, dtype=object)
    for i in range(n):  # join is the only per-doc step; ~50 words each
        texts[i] = " ".join(words[bounds[i]:bounds[i + 1]])
    # exact duplicates: copy an earlier doc verbatim (dedup-family fodder)
    n_dup = max(1, int(n * 0.0016))
    dup_dst = rng.choice(np.arange(n // 2, n), n_dup, replace=False)
    dup_src = rng.integers(0, n // 2, n_dup)
    texts[dup_dst] = texts[dup_src]
    lang = np.asarray(LANGS, dtype=object)[
        rng.choice(len(LANGS), n, p=LANG_P)]
    source = np.asarray(
        [f"src{i}" for i in range(20)], dtype=object)[rng.integers(0, 20, n)]
    n_chars = np.asarray([len(t) for t in texts], dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array(n_chars),
    })


def _events(n: int, n_users: int, rng: np.random.Generator) -> pa.Table:
    start = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = start + np.sort(rng.integers(0, span_us, n)).astype("timedelta64[us]")
    value = np.round(rng.exponential(50.0, n), 2)
    k = rng.integers(0, 100, n)
    props = np.asarray([f'{{"k": {v}}}' for v in k], dtype=object)
    etype = np.asarray(EVENT_TYPES, dtype=object)[rng.integers(0, 5, n)]
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(value),
        "props": pa.array(props, pa.string()),
    })


def _embeddings(n: int, dim: int, rng: np.random.Generator) -> pa.Table:
    labels = rng.integers(0, 10, n).astype(np.int64)
    centroids = rng.normal(0, 0.08, (10, dim))
    m = rng.normal(0, 1.0, (n, dim)) + centroids[labels]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m = m.astype(np.float32)  # base table stores list<float>
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    })


def _bootstrap(base: pa.Table, n: int, rng: np.random.Generator) -> pa.Table:
    """Row-level bootstrap: one index draw reused across ALL columns keeps
    within-row correlations (price~quantity, status~date) exactly."""
    idx = rng.integers(0, base.num_rows, n)
    return base.take(pa.array(idx))


def generate_scaled_dir(out_dir: str, mult: int = 10,
                        base_dir: str = BASE_SF, seed: int = 714) -> str:
    """Write a complete scaled table directory (idempotent: skips existing).

    documents/events/embeddings are synthesized fresh (bootstrapping text
    would inflate exact-dup groups 10× and distort the dedup workload);
    lineitem/orders are bootstrapped with re-keyed joins; the five small
    dimension tables pass through unchanged (they are lookup-sized at every
    scale, exactly like TPC-H's region/nation)."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(seed))

    base_docs = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    pq.write_table(_documents(base_docs.num_rows * mult, rng),
                   os.path.join(out_dir, "documents.parquet"))

    base_events = pq.read_table(os.path.join(base_dir, "events.parquet"))
    n_users = 1500 * mult
    pq.write_table(_events(base_events.num_rows * mult, n_users, rng),
                   os.path.join(out_dir, "events.parquet"))

    base_emb = pq.read_table(os.path.join(base_dir, "embeddings.parquet"))
    dim = len(base_emb.column("embedding")[0])
    pq.write_table(_embeddings(base_emb.num_rows * mult, dim, rng),
                   os.path.join(out_dir, "embeddings.parquet"))

    orders = pq.read_table(os.path.join(base_dir, "orders.parquet"))
    n_orders = orders.num_rows * mult
    o = _bootstrap(orders, n_orders, rng)
    o = o.set_column(o.schema.get_field_index("o_orderkey"), "o_orderkey",
                     pa.array(np.arange(n_orders, dtype=np.int64)))
    pq.write_table(o, os.path.join(out_dir, "orders.parquet"))

    lineitem = pq.read_table(os.path.join(base_dir, "lineitem.parquet"))
    n_li = lineitem.num_rows * mult
    li = _bootstrap(lineitem, n_li, rng)
    li = li.set_column(
        li.schema.get_field_index("l_orderkey"), "l_orderkey",
        pa.array(rng.integers(0, n_orders, n_li).astype(np.int64)))
    pq.write_table(li, os.path.join(out_dir, "lineitem.parquet"))

    for name in ("region", "nation", "customer", "supplier", "part"):
        pq.write_table(pq.read_table(os.path.join(base_dir, f"{name}.parquet")),
                       os.path.join(out_dir, f"{name}.parquet"))

    with open(done, "w") as f:
        f.write(f"mult={mult} base={base_dir} seed={seed}\n")
    return out_dir
