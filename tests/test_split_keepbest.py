"""train/val/test split + dedup-with-representative-selection operators."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from anycrawl_ray import queries as q

SF = "/root/testdata/sf0.001"


def test_train_split_matches_oracle(ray_session):
    mine = q.q_train_split(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    ora = con.execute(q.build_oracle_sql()["train_split"]).fetch_arrow_table()
    assert mine.column("doc_id").to_pylist() == ora.column("doc_id").to_pylist()
    assert mine.column("bucket").to_pylist() == ora.column("bucket").to_pylist()
    assert mine.column("split").to_pylist() == ora.column("split").to_pylist()
    # sane proportions (hash split: roughly 80/10/10)
    splits = mine.column("split").to_pylist()
    n = len(splits)
    assert 0.6 < splits.count("train") / n < 0.95


def test_train_split_deterministic_across_runs(ray_session):
    a = q.q_train_split(SF)
    b = q.q_train_split(SF)
    assert a.equals(b)


def test_dedup_keep_best_matches_reference(ray_session):
    """Parity vs a straightforward single-process reference: same pair list
    -> same components -> same representative per cluster."""
    from anycrawl_ray.functions import text as tx

    out = q.q_dedup_keep_best(SF)
    pairs = q.q_minhash_dedup(SF)
    a = pairs.column("a_id").to_pylist()
    b = pairs.column("b_id").to_pylist()

    # reference: networkx-free BFS components over an adjacency dict
    adj: dict[int, set] = {}
    for x, y in zip(a, b):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    text_of = dict(zip(docs.column("doc_id").to_pylist(),
                       docs.column("text").to_pylist()))

    def score(d):
        import pyarrow as pa

        return q._round6_half_away(
            tx.quality_scores(pa.array([text_of[d]]))
        )[0]

    seen: set[int] = set()
    want = {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        scored = sorted(((score(d), -d) for d in comp), reverse=True)
        keep = -scored[0][1]
        want[min(comp)] = (keep, len(comp))

    got = {
        c: (k, n)
        for c, k, n in zip(out.column("cluster_id").to_pylist(),
                           out.column("keep_doc_id").to_pylist(),
                           out.column("n_members").to_pylist())
    }
    assert got == want
    assert len(got) > 0  # sf0.001 corpus has near-dup clusters


def test_dedup_keep_best_empty_pairs(ray_session, tmp_path):
    """No near-dups -> empty result with the right schema."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(
             ["alpha beta gamma delta epsilon zeta eta theta one two",
              "nine eight seven six five four three completely other words"],
             pa.string())}
    )
    pqw.write_table(t, str(tmp_path / "documents.parquet"))
    out = q.q_dedup_keep_best(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["cluster_id", "keep_doc_id", "n_members", "best_score"]


def test_doc_clusters_assignment_and_stability(ray_session):
    """Every vector lands in its argmax-cosine centroid; labels stable
    across runs; confidence column matches a brute-force recompute."""
    import numpy as np

    from anycrawl_ray import queries as q
    from anycrawl_ray.functions.ann import embedding_matrix, kmeans_lite
    from anycrawl_ray.functions.dedup import l2_normalize

    out1 = q.q_doc_clusters(SF)
    out2 = q.q_doc_clusters(SF)
    assert out1.equals(out2)  # deterministic

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    assert out1.num_rows == emb.num_rows
    k = len(set(out1.column("cluster").to_pylist()))
    assert 2 <= k <= 8

    # brute-force recompute of the winning cosine per vector
    sample = emb.slice(0, 2048)
    cents = l2_normalize(kmeans_lite(embedding_matrix(sample), n_cells=8))
    mat = l2_normalize(embedding_matrix(emb))
    sims = mat @ cents.T
    best = sims.max(axis=1)
    got = np.array(out1.column("cos").to_pylist())
    order = np.argsort(emb.column("vec_id").to_numpy())
    assert np.allclose(got, q._round6_half_away(best[order]), atol=1e-9)
