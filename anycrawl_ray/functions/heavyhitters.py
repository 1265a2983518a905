"""Exact distributed top-k frequent items without a vocabulary shuffle.

The naive exact top-k tokens is `groupby(token).count()` — an all-to-all
shuffle of the ENTIRE vocabulary (billions of distinct tokens at 100 TB).
This module implements the two-pass sketch-then-verify pattern instead:

1. **Candidate pass** — a Misra-Gries summary (Misra & Gries 1982, public)
   as a mergeable Ray Data ``AggregateFn``: every accumulator is a bounded
   dict of at most ``m`` counters, blocks fold in their exact token counts,
   and summaries merge by counter addition + trim (Agarwal et al. 2013,
   "Mergeable Summaries", PODS — the trim error adds across merges and the
   final summary satisfies the same guarantee as a sequential MG run:
   every token with true count > err survives). Constant O(m) bytes flow
   through the aggregate tree — like the HLL sketch in functions/sketch.py,
   the shuffle cost is independent of vocabulary size.
2. **Exact recount pass** — the candidate set (<= m tokens) broadcasts via
   ``ray.put``; one streaming ``map_batches`` emits per-block counts for
   candidate tokens only (vectorized is_in + value_counts), and a
   candidate-sized ``groupby(token).sum`` yields EXACT counts.

The result is exact-and-deterministic, so it is DuckDB-oracle-checked
(`heavy_hitters` in queries.py) — unusual for a sketch-based operator. The
guarantee is CHECKED, not assumed: ``top_k_exact`` verifies that the k-th
exact count exceeds the summary's accumulated trim error (which proves every
true top-k token was a candidate) and raises otherwise, telling the caller
to raise ``m``.

Reference anchor: the reference has no heavy-hitter operator (closest is
the A1 counters family, packages/scrape/src/managers/Progress.ts); this is
part of the LLM-corpus toolkit (vocabulary heavy hitters / stopword mining).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
import ray.data as rd


def _block_token_counts(texts: list[str]) -> pl.DataFrame:
    """Exact (token, n) counts for a batch — ONE C-level split over the
    joined text (token counting does not care about doc boundaries)."""
    toks = " ".join(texts).split()
    if not toks:
        return pl.DataFrame({"token": pl.Series([], dtype=pl.String),
                             "n": pl.Series([], dtype=pl.Int64)})
    vc = pl.Series("token", toks).value_counts()
    return vc.rename({"count": "n"}).with_columns(pl.col("n").cast(pl.Int64))


def mg_merge_counts(acc: dict, tokens, counts, m: int) -> dict:
    """Fold exact (token, count) pairs into a Misra-Gries summary of size m.

    acc = {"c": {token: count}, "err": int, "n": int}. Trimming subtracts
    the (m+1)-th largest count from every counter and drops non-positives;
    the subtracted amount adds to ``err`` (the summary's one-sided error
    bound: stored <= true <= stored + err for survivors, true <= err for
    evicted tokens).
    """
    c = acc["c"]
    for t, n in zip(tokens, counts):
        c[t] = c.get(t, 0) + int(n)
    if len(c) > m:
        vals = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        # (m+1)-th largest = cutoff; subtract it everywhere
        cutoff = int(np.partition(vals, len(vals) - m - 1)[len(vals) - m - 1])
        acc["c"] = {t: n - cutoff for t, n in c.items() if n > cutoff}
        acc["err"] += cutoff
    return acc


def mg_aggregate(on: str = "text", m: int = 4096, name: str = "mg_summary"):
    """ray.data AggregateFn: global Misra-Gries candidate summary over a
    text column. Finalize emits (tokens, err, n_total)."""
    from ray.data.aggregate import AggregateFn

    def init(_key):
        return {"c": {}, "err": 0, "n": 0}

    def accumulate_block(acc: dict, block) -> dict:
        if isinstance(block, pa.Table):
            texts = block.column(on).to_pylist()
        else:
            texts = block[on].tolist()
        vc = _block_token_counts(texts)
        acc["n"] += int(vc["n"].sum() or 0)
        return mg_merge_counts(acc, vc["token"].to_list(), vc["n"].to_list(), m)

    def merge(a: dict, b: dict) -> dict:
        a["err"] += b["err"]
        a["n"] += b["n"]
        return mg_merge_counts(a, list(b["c"].keys()), list(b["c"].values()), m)

    def finalize(acc: dict) -> dict:
        return {"tokens": sorted(acc["c"].keys()), "err": acc["err"],
                "n": acc["n"]}

    return AggregateFn(init=init, merge=merge, name=name,
                       accumulate_block=accumulate_block, finalize=finalize)


def exact_recount(docs: rd.Dataset, candidates: list[str], *,
                  on: str = "text") -> pa.Table:
    """Streaming exact counts for the candidate tokens only: broadcast the
    candidate set once, emit per-block candidate counts, candidate-sized
    groupby-sum (never a vocabulary shuffle)."""
    cand_ref = ray.put(pl.Series("token", candidates))

    def f(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        vc = _block_token_counts(t.column(on).to_pylist())
        vc = vc.filter(pl.col("token").is_in(cands))
        return vc.to_arrow().cast(
            pa.schema([("token", pa.string()), ("n", pa.int64())])
        )

    out = (
        docs.map_batches(f, batch_format="pyarrow", batch_size=2048)
        .groupby("token")
        .sum("n")
    )
    from ..blocks import collect_tables

    # aggregate outputs include empty zero-schema blocks — collect block
    # refs directly (to_arrow_refs' schema probe would re-execute the plan
    # under a limit and can abort the driver; see blocks.py)
    parts = collect_tables(out)
    if not parts:
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts)
    return merged.rename_columns(["token", "n"])


def top_k_exact(docs: rd.Dataset, *, k: int = 100, m: int = 4096,
                on: str = "text") -> pa.Table:
    """Exact top-k (token, n), ties broken by token ascending.

    Raises RuntimeError if the MG guarantee cannot prove the candidate set
    covers the true top-k (k-th exact count must exceed the accumulated trim
    error) — raise ``m`` in that case rather than silently returning a
    possibly-wrong list.
    """
    summary = docs.aggregate(mg_aggregate(on=on, m=m))["mg_summary"]
    if not summary["tokens"]:
        if summary["err"] > 0:
            # trims happened and NOTHING survived: the corpus is flatter
            # than m can cover — returning empty would be silently wrong
            raise RuntimeError(
                f"MG guarantee not met: no candidates survived trim error "
                f"{summary['err']}; increase m (={m})"
            )
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    counts = exact_recount(docs, summary["tokens"], on=on)
    df = pl.from_arrow(counts).sort(["n", "token"], descending=[True, False])
    top = df.head(k)
    if summary["err"] > 0:
        # err == 0 means no counter was ever trimmed: the summary IS the
        # exact full vocabulary and the result is unconditionally right.
        kth = int(top["n"][-1]) if len(df) >= k else 0
        if kth <= summary["err"]:
            raise RuntimeError(
                f"MG guarantee not met: k-th count {kth} <= trim error "
                f"{summary['err']}; increase m (={m})"
            )
    return top.to_arrow().cast(
        pa.schema([("token", pa.string()), ("n", pa.int64())])
    )


def mg_aggregate_grouped(on: str = "text", m: int = 2048,
                         name: str = "mg_json"):
    """Grouped variant of :func:`mg_aggregate` for
    ``groupby(key).aggregate(...)``: same Misra-Gries math, but the
    accumulator is a JSON STRING at every protocol boundary. Grouped
    accumulators are stored in blocks between the map and reduce stages,
    and a Python dict stored in an Arrow block becomes a STRUCT whose
    fields are the UNION of every row's keys — other groups' tokens come
    back as None-valued entries, corrupting the counter map (observed as
    ``int(None)`` in merge). A string column round-trips exactly."""
    import json

    from ray.data.aggregate import AggregateFn

    def init(_key) -> str:
        return json.dumps({"c": {}, "err": 0, "n": 0})

    def accumulate_block(acc: str, block) -> str:
        a = json.loads(acc)
        if isinstance(block, pa.Table):
            texts = block.column(on).to_pylist()
        else:
            texts = block[on].tolist()
        vc = _block_token_counts(texts)
        a["n"] += int(vc["n"].sum() or 0)
        a = mg_merge_counts(a, vc["token"].to_list(), vc["n"].to_list(), m)
        return json.dumps(a)

    def merge(x: str, y: str) -> str:
        a, b = json.loads(x), json.loads(y)
        a["err"] += b["err"]
        a["n"] += b["n"]
        a = mg_merge_counts(a, list(b["c"].keys()), list(b["c"].values()), m)
        return json.dumps(a)

    def finalize(acc: str) -> str:
        a = json.loads(acc)
        return json.dumps({"tokens": sorted(a["c"].keys()),
                           "err": a["err"], "n": a["n"]})

    return AggregateFn(init=init, merge=merge, name=name,
                       accumulate_block=accumulate_block, finalize=finalize)


_KEY_SEP = "\x1f"  # tokens are whitespace-split, so never contain 0x1f


def top_k_exact_by_group(docs: rd.Dataset, *, group: str, k: int = 20,
                         m: int = 2048, on: str = "text") -> pa.Table:
    """Exact top-k tokens PER GROUP, ties by token ascending — the grouped
    composition of the Misra-Gries machinery: one
    ``groupby(group).aggregate(mg)`` pass ships O(m) summaries per group
    through the aggregate tree (never a vocabulary shuffle), the per-group
    candidate sets broadcast once, and a second streaming pass exact-counts
    candidates only into a candidate-sized groupby. The per-group MG
    coverage guarantee is checked, not assumed (same contract as
    :func:`top_k_exact`)."""
    import json

    from ..blocks import collect_tables

    summaries: dict[str, dict] = {}
    for t in collect_tables(docs.groupby(group).aggregate(
            mg_aggregate_grouped(on=on, m=m))):
        for g, s in zip(t.column(group).to_pylist(),
                        t.column("mg_json").to_pylist()):
            summaries[g] = json.loads(s)
    cand_ref = ray.put({g: pl.Series("token", s["tokens"])
                        for g, s in summaries.items()})

    def f(t: pa.Table) -> pa.Table:
        cmap = ray.get(cand_ref)
        groups = t.column(group).to_pylist()
        texts = t.column(on).to_pylist()
        per: dict[str, list[str]] = {}
        for g, tx in zip(groups, texts):
            per.setdefault(g, []).append(tx)
        keys: list[str] = []
        ns: list[int] = []
        for g, txs in per.items():
            vc = _block_token_counts(txs)
            vc = vc.filter(pl.col("token").is_in(cmap[g]))
            keys.extend(g + _KEY_SEP + tok for tok in vc["token"].to_list())
            ns.extend(vc["n"].to_list())
        return pa.table({"key": pa.array(keys, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    counts = collect_tables(
        docs.map_batches(f, batch_format="pyarrow", batch_size=2048)
        .groupby("key").sum("n"))
    by_group: dict[str, list[tuple[str, int]]] = {}
    for t in counts:
        for key, n in zip(t.column("key").to_pylist(),
                          t.column("sum(n)").to_pylist()):
            g, tok = key.split(_KEY_SEP, 1)
            by_group.setdefault(g, []).append((tok, int(n)))
    out_g, out_tok, out_n = [], [], []
    for g in sorted(by_group):
        rows = sorted(by_group[g], key=lambda r: (-r[1], r[0]))[:k]
        err = summaries[g]["err"]
        if err > 0:
            kth = rows[-1][1] if len(by_group[g]) >= k else 0
            if kth <= err:
                raise RuntimeError(
                    f"MG guarantee not met for group {g!r}: k-th count "
                    f"{kth} <= trim error {err}; increase m (={m})")
        out_g.extend(g for _ in rows)
        out_tok.extend(r[0] for r in rows)
        out_n.extend(r[1] for r in rows)
    return pa.table({group: pa.array(out_g, pa.string()),
                     "token": pa.array(out_tok, pa.string()),
                     "n": pa.array(out_n, pa.int64())})
