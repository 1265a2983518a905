"""Local mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() runs on sf0.01 and must match DuckDB row-for-row after
column-name sort + row sort (floats compared to 1e-9 after the query's own
rounding). Rows-only entries must at least return rows with stable schema."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_frames_match(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: column mismatch {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rowcount {len(ray_df)} vs {len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        a_float = np.issubdtype(a[c].dtype, np.floating)
        b_float = np.issubdtype(b[c].dtype, np.floating)
        # int-vs-float dtype drift would change the driver's value hash even
        # when values are numerically equal — treat it as a mismatch
        assert a_float == b_float, (
            f"{name}.{c}: dtype kind mismatch {a[c].dtype} vs {b[c].dtype}"
        )
        if a_float:
            # mirror the driver's float treatment: quantize to ~9 decimals
            # then compare EXACTLY. allclose's default rtol=1e-5 hid the
            # round-1 embedding_dedup float32 mismatch (7e-9 drift), while
            # last-bit pc.round-vs-SQL-ROUND noise (~5e-13) does pass the
            # driver — 9-decimal quantization separates the two.
            avf = np.round(av.astype(np.float64), 9)
            bvf = np.round(bv.astype(np.float64), 9)
            eq = (avf == bvf) | (np.isnan(avf) & np.isnan(bvf))
            assert eq.all(), (
                f"{name}.{c}: float values differ beyond 1e-9 at rows "
                f"{list(np.flatnonzero(~eq)[:5])}"
            )
        else:
            eq = pd.Series(av).astype(str).eq(pd.Series(bv).astype(str))
            assert eq.all(), (
                f"{name}.{c}: values differ at rows {list(np.flatnonzero(~eq.to_numpy())[:5])}"
            )


SQL_CHECKED = [
    "counters_by_type", "bandwidth_by_user", "source_stats", "distinct_langs",
    "dedup_exact", "map_merge", "cache_lookup", "join_fanout", "monitor_changes",
    "topk_docs", "pagination", "filter_strategy", "token_count", "language_id",
    "quality_score", "normalize_hash", "length_stats", "lineitem_pricing",
    "events_daily", "ann_cosine", "embedding_dedup", "supplier_geo",
    "part_type_stats", "html_markdown", "html_transform", "template_render",
    "session_pool",
    "sessionize",
    "topk_per_group",
    "daily_active_users", "webhook_events", "revenue_topk",
    "customers_no_orders", "events_value_stats", "scheduler_executions",
    "proxy_ladder",
    "repetition_stats",
    "span_dedup",
    "decontaminate",
    "sequence_pack",
    "corpus_funnel",
    "inverted_index",
    "tfidf_topk",
    "bm25_topk",
    "hybrid_search",
    "bigram_logprob",
    "weighted_sample",
    "quality_percentile",
    "pmi_pairs",
    "centroid_classify",
    "knn_classify",
    "unigram_logprob",
    "perplexity_buckets",
    "streaming_window",
    "doc_chunks",
    "value_outliers",
    "group_quantiles",
    "rolling_events",
    "stratified_sample",
    "resumable_write",
    "ngram_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "doc_fingerprint",
    "js_requirement",
    "approx_distinct",
    "dedup_keep_best",
    "graph_components",
    "heavy_hitters",
    "bloom_semijoin",
    "token_count_bpe",
    "minhash_incremental",
    "kmeans_embeddings",
    "semantic_dedup",
    "importance_sample",
    "bigjoin_priority",
    "mixture_sample",
    "global_quantiles",
    "corpus_build",
    "knn_join",
    "bpe_pair_counts",
    "cohort_retention",
    "event_funnel",
    "attribution_join",
    "rolling_active_users",
    "recrawl_priority",
    "vocab_build",
    "char_entropy",
    "containment_pairs",
    "pii_scrub",
    "credits_charges",
    "train_split",
    "star_join",
    "regex_mentions",
    "distinct_users_salted",
    "price_correlations",
    "events_rollup",
    "heavy_hitters_by_lang",
    "lang_confusion",
    "event_transitions",
    "curriculum_rank",
    "order_line_histogram",
    "user_overlap_matrix",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked(registry, duck, name):
    queries, oracles = registry
    assert name in queries and name in oracles
    ray_df = _to_pandas(queries[name](SF_DIR))
    sql_df = duck.execute(oracles[name]).df()
    assert_frames_match(ray_df, sql_df, name)


ROWS_ONLY = [
    "pagerank",
    "ann_indexed",
    "ann_pq",
    "doc_clusters",
    "crawl_bfs", "crawl_spans",
    "media_features", "serp_parse",
    "monitor_diff", "monitor_judged", "search_scrape", "ann_ivf",
    "embedding_dedup_lsh",
    "pca_project",
    "bpe_train",
    "dd_quantiles",
    "embedding_quantize",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(registry, name):
    queries, oracles = registry
    assert name in queries and name not in oracles
    df = _to_pandas(queries[name](SF_DIR))
    assert len(df.columns) > 0
    assert len(df) > 0, f"{name} returned no rows"


def test_mirror_lists_complete(registry):
    """Every registry entry must be gate-checked here: hash-checked via
    SQL_CHECKED when it has an oracle, rows-checked via ROWS_ONLY when it
    does not. An entry in neither list is a silent gate gap."""
    queries, oracles = registry
    assert set(SQL_CHECKED) == set(oracles), (
        set(SQL_CHECKED) ^ set(oracles))
    assert set(SQL_CHECKED) | set(ROWS_ONLY) == set(queries), (
        (set(SQL_CHECKED) | set(ROWS_ONLY)) ^ set(queries))


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    assert set(ds.schema().names) >= {"url", "spans", "ok"}
