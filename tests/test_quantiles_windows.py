"""Semantic tests for the round-3 profiling/window/sampling operators
(beyond the sf0.01 oracle parity in test_queries_oracle.py):

- group_quantiles' ceil(q*n) rank rule IS DuckDB quantile_disc's element
  (the oracle deliberately uses a window-rank formulation; this pins the
  equivalence the docstring claims).
- unigram_logprob boundary semantics on a synthetic corpus (empty doc → 0.0;
  rarer tokens score lower).
- stratified_sample determinism + per-stratum rate behavior.
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anycrawl_ray import queries as q  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_group_quantiles_matches_duckdb_quantile_disc(ray_session):
    mine = q.q_group_quantiles(SF).to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sel = ", ".join(
        f"CAST(quantile_disc(n_chars, {qq}) AS BIGINT) AS {name}"
        for name, qq in q._QUANTS
    )
    ora = con.execute(
        f"SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, {sel} "
        "FROM documents GROUP BY lang ORDER BY lang"
    ).df()
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], ora[sorted(ora.columns)], check_dtype=False
    )


def test_unigram_logprob_semantics(ray_session, tmp_path):
    # corpus: 'common' appears 9x, 'rare' 1x, one empty doc
    docs = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": pa.array(
             ["common common common common common common common common",
              "common rare", ""], pa.string()),
         "lang": pa.array(["en"] * 3, pa.string()),
         "source": pa.array(["s"] * 3, pa.string()),
         "n_chars": pa.array([10, 11, 0], pa.int64())}
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q.q_unigram_logprob(str(tmp_path)).to_pandas().set_index("doc_id")
    # empty doc scores exactly 0.0 by definition
    assert out.loc[2, "avg_logprob"] == 0.0
    # the doc containing the rare token averages lower than the all-common doc
    assert out.loc[1, "avg_logprob"] < out.loc[0, "avg_logprob"] < 0.0
    # closed form: ln(9/10) for doc 0; (ln(9/10)+ln(1/10))/2 for doc 1
    assert out.loc[0, "avg_logprob"] == pytest.approx(np.log(0.9), abs=1e-6)
    assert out.loc[1, "avg_logprob"] == pytest.approx(
        (np.log(0.9) + np.log(0.1)) / 2, abs=1e-6
    )


def test_stratified_sample_deterministic_and_rated(ray_session):
    a = q.q_stratified_sample(SF).to_pandas()
    b = q.q_stratified_sample(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # every kept row respects its stratum's bucket cap
    rates = a["lang"].map(q._STRATA_RATES).fillna(q._STRATA_DEFAULT)
    assert (a["bucket"] < rates).all()
    # strata with a 2x rate ratio keep roughly 2x the fraction (loose gate:
    # 500-permille en vs 100-permille zh on a 500-doc corpus)
    full = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    frac_en = (a["lang"] == "en").sum() / (full["lang"] == "en").sum()
    frac_zh = (a["lang"] == "zh").sum() / (full["lang"] == "zh").sum()
    assert frac_en > frac_zh


def test_global_quantiles_forced_refinement(ray_session):
    """Tiny cap forces multiple histogram-refinement rounds (sf0.01 fits
    under the default cap and would skip the loop entirely); result must
    equal the straight numpy order statistic."""
    import numpy as np
    import pyarrow.parquet as pq

    from anycrawl_ray.queries import q_global_quantiles

    sf = "/root/testdata/sf0.01"
    got = q_global_quantiles(sf, n_buckets=16, cap=50)
    vals = np.sort(pq.read_table(
        f"{sf}/events.parquet", columns=["value"]).column("value").to_numpy())
    n = len(vals)
    for row in got.to_pylist():
        k = int(np.ceil(row["q"] * n))
        assert row["k"] == k
        assert row["value"] == vals[k - 1], row


def test_global_quantiles_all_equal_values(ray_session):
    """Degenerate input: every value identical — the interval can never
    split, the max-rounds guard must fire and the collect pass still
    returns the (only possible) exact answer."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.queries import global_quantiles_dataset

    ds = rd.from_arrow(pa.table({"value": pa.array([7.5] * 3000)}))
    got = global_quantiles_dataset(ds, n_buckets=8, cap=100)
    for row in got.to_pylist():
        assert row["value"] == 7.5
        assert row["k"] == int(np.ceil(row["q"] * 3000))


def test_global_quantiles_duplicate_heavy(ray_session):
    """One value holds 60% of the mass (straddles the p50 rank); exactness
    must survive the stuck-bucket path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anycrawl_ray.queries import global_quantiles_dataset

    rng = np.random.RandomState(7)
    vals = np.concatenate([np.full(1800, 3.25), rng.uniform(0, 10, 1200)])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)}))
    got = global_quantiles_dataset(ds, n_buckets=16, cap=50)
    ref = np.sort(vals)
    for row in got.to_pylist():
        k = int(np.ceil(row["q"] * len(vals)))
        assert row["k"] == k
        assert row["value"] == ref[k - 1]
