"""Corpus-hygiene kernels (functions/hygiene.py): hand-computed cases for
the gram/span construction + the three operator semantics (repetition
stats, cross-doc span dedup, decontamination). Oracle parity at sf0.01 is
covered by test_queries_oracle.py's SQL_CHECKED matrix."""

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anycrawl_ray.functions import hygiene as hy


def _texts(*xs):
    return pa.array(list(xs), pa.string())


def test_nonempty_tokens_filters_and_offsets():
    flat, offsets = hy.nonempty_tokens(_texts("  a  b ", "", "c"))
    assert flat.tolist() == ["a", "b", "c"]
    assert offsets.tolist() == [0, 2, 2, 3]


def test_ngram_rows_respects_row_boundaries():
    flat, offsets = hy.nonempty_tokens(_texts("a b c", "d e"))
    grams, rows = hy.ngram_rows(flat, offsets, 2)
    assert grams.tolist() == ["a b", "b c", "d e"]
    assert rows.tolist() == [0, 0, 1]
    # trigrams: second row too short to contribute
    grams3, rows3 = hy.ngram_rows(flat, offsets, 3)
    assert grams3.tolist() == ["a b c"]
    assert rows3.tolist() == [0]


def test_ngram_rows_empty_and_short_inputs():
    flat, offsets = hy.nonempty_tokens(_texts("", "x"))
    grams, rows = hy.ngram_rows(flat, offsets, 2)
    assert len(grams) == 0 and len(rows) == 0


def test_chunk_spans_full_chunks_only_one_based_idx():
    flat, offsets = hy.nonempty_tokens(_texts("a b c d e f g h i", "j k l"))
    spans, rows, idx = hy.chunk_spans(flat, offsets, 4)
    # row 0: 9 tokens -> 2 full chunks; row 1: 3 tokens -> none
    assert spans.tolist() == ["a b c d", "e f g h"]
    assert rows.tolist() == [0, 0]
    assert idx.tolist() == [1, 2]


def test_repetition_stats_hand_case():
    # doc0: tokens a a a -> bigrams [aa, aa]: dup 0.5, top 1.0;
    #       trigrams [aaa]: dup 0.0
    # doc1: a b -> 1 bigram, no dup; no trigram -> 0.0
    # doc2: single token -> all zero
    n_bi, dup_bi, top_bi, dup_tri = hy.repetition_stats(
        _texts("a a a", "a b", "a")
    )
    assert n_bi.tolist() == [2, 1, 0]
    assert dup_bi.tolist() == [0.5, 0.0, 0.0]
    assert top_bi.tolist() == [1.0, 1.0, 0.0]
    assert dup_tri.tolist() == [0.0, 0.0, 0.0]


def test_span_dedup_semantics(ray_session, tmp_path):
    """Spans shared across >=2 docs are removed from every doc; a span
    repeated within ONE doc is kept (cross-doc criterion)."""
    import pyarrow.parquet as pq

    from anycrawl_ray.queries import q_span_dedup

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "c o m m o n s p a n x y z",   # span1 'c o m m' shared w/ doc1
                    "c o m m u n i q u e a b",     # shares 'c o m m'
                    "r e p e r e p e t a i l",     # 'r e p e' twice WITHIN one doc
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_span_dedup(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_spans"] == 3 and out.loc[0, "n_common"] == 1
    assert out.loc[1, "n_spans"] == 3 and out.loc[1, "n_common"] == 1
    # within-doc repeat is NOT removed
    assert out.loc[2, "n_common"] == 0
    kept2 = "\n".join(["r e p e", "r e p e", "t a i l"])
    assert out.loc[2, "kept_hash"] == hashlib.md5(kept2.encode()).hexdigest()
    kept0 = "\n".join(["o n s p", "a n x y"])
    assert out.loc[0, "kept_hash"] == hashlib.md5(kept0.encode()).hexdigest()


def test_decontaminate_semantics(ray_session, tmp_path):
    """Docs sharing a 3-gram with the benchmark slice (doc_id%97==0) are
    flagged; benchmark docs are excluded from the output."""
    import pyarrow.parquet as pq

    from anycrawl_ray.queries import q_decontaminate

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),  # 0 is benchmark
            "text": pa.array(
                [
                    "the quick brown fox",
                    "a quick brown fox runs",   # shares 'quick brown fox'
                    "totally different words here",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 0 not in out.index
    assert bool(out.loc[1, "contaminated"]) is True
    # doc1 grams: 'a quick brown','quick brown fox','brown fox runs'; bench
    # grams: 'the quick brown','quick brown fox' -> overlap = 1
    assert out.loc[1, "n_overlap"] == 1
    assert bool(out.loc[2, "contaminated"]) is False
    assert out.loc[2, "n_overlap"] == 0


def test_decontaminate_join_parity_with_broadcast(ray_session):
    """The reduce-side (co-partitioned gram shuffle) path must equal the
    broadcast path row-for-row on the sf0.01 corpus."""
    from anycrawl_ray.queries import q_decontaminate

    a = q_decontaminate("/root/testdata/sf0.01").to_pandas()
    b = q_decontaminate("/root/testdata/sf0.01", method="join").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)[a.columns.tolist()]
    assert a.equals(b)


def test_decontaminate_overlap_count(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from anycrawl_ray.queries import q_decontaminate

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["w1 w2 w3 w4", "w1 w2 w3 w4 w5"], pa.string()
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
    # doc1 grams: w1w2w3, w2w3w4, w3w4w5; bench (doc0): w1w2w3, w2w3w4
    assert out.loc[1, "n_grams"] == 3
    assert out.loc[1, "n_overlap"] == 2
