"""Sequence packing (distributed prefix-sum scan) + corpus funnel semantics.
Oracle parity at sf0.01 is covered by test_queries_oracle.py."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_sequence_pack_cross_partition_prefix_sum(ray_session, tmp_path):
    """Docs span multiple range partitions (doc_id // 1024) — the scan's
    per-part offsets must chain so cum_before is globally correct, and a
    doc landing mid-sequence gets the straddling sequence of its FIRST
    token."""
    from anycrawl_ray.queries import q_sequence_pack

    n_tok = 3000
    ids = [0, 1000, 2048, 3000, 5000]  # parts 0, 0, 2, 2, 4
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([" ".join(["w"] * n_tok)] * len(ids), pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_sequence_pack(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out["n_tokens"].tolist() == [n_tok] * 5
    # cum_before by doc_id order: 0, 3000, 6000, 9000, 12000
    assert out["seq_id"].tolist() == [0, 0, 0, 1, 1]
    assert out["seq_offset"].tolist() == [0, 3000, 6000, 9000 - 8192, 12000 - 8192]


def test_sequence_pack_empty_doc(ray_session, tmp_path):
    from anycrawl_ray.queries import q_sequence_pack

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c", "", "d e"], pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_sequence_pack(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out["n_tokens"].tolist() == [3, 0, 2]
    assert out["seq_offset"].tolist() == [0, 3, 3]


def test_inverted_index_df_vs_tf(ray_session, tmp_path):
    """df counts distinct docs, tf counts occurrences — a token repeated
    within one doc raises tf but not df."""
    from anycrawl_ray.queries import q_inverted_index

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x x y", "y z"], pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_inverted_index(str(tmp_path)).to_pandas().set_index("token")
    assert out.loc["x", "df"] == 1 and out.loc["x", "tf"] == 2
    assert out.loc["y", "df"] == 2 and out.loc["y", "tf"] == 2
    assert out.loc["z", "df"] == 1 and out.loc["z", "tf"] == 1


def test_tfidf_topk_ranking(ray_session, tmp_path):
    """Rarer tokens outscore common ones; ranks are 1..k per doc with
    token-order tie-break."""
    from anycrawl_ray.queries import q_tfidf_topk

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["common rare0 common", "common rare1", "common"], pa.string()
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_tfidf_topk(str(tmp_path)).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rank")
    # rare0 (df=1) beats common (df=3, score 0) despite tf('common')=2
    assert d0["token"].tolist() == ["rare0", "common"]
    d2 = out[out.doc_id == 2]
    assert d2["token"].tolist() == ["common"] and d2["score"].tolist() == [0.0]


def test_corpus_funnel_counts_are_cumulative(ray_session):
    from anycrawl_ray.queries import q_corpus_funnel

    out = q_corpus_funnel("/root/testdata/sf0.01").to_pandas().iloc[0]
    assert out["n_total"] >= out["n_lang"] >= out["n_quality"] >= out["n_lowrep"]
    assert out["n_lowrep"] > 0  # thresholds chosen to keep a real remainder
    assert out["n_total"] > out["n_lang"]  # ...and to drop docs at each stage
