"""Corpus-hygiene operators for training-data pipelines (build brief).

Three operators a 100-TB text pipeline runs between crawl and training,
beyond the reference's own surface (AnyCrawl stops at scrape/markdown —
`packages/scrape/src/core/DataExtractor.ts` — and has no corpus-level
filters):

- repetition stats  (Gopher-style repetition signals: duplicate/top n-gram
                     fractions per document; Rae et al. 2021, public)
- span dedup        (C4-style removal of token spans that repeat across
                     documents; Raffel et al. 2020 remove repeated
                     three-sentence spans — here the unit is a fixed k-token
                     chunk so the DuckDB oracle is closed-form)
- decontamination   (flag documents sharing an n-gram with a benchmark/eval
                     set — the standard train/test-overlap check)

All kernels are numpy/pandas-vectorized over Arrow list offsets — no
per-row Python in the gram/span construction path. The scoring formulas
are intentionally SQL-replicable so DuckDB oracles verify value-for-value
(see __ray_entry__.oracle_sql).

Scale notes per operator live on the query functions in queries.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import text as tx


def nonempty_tokens(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens per row with empties removed: flat object array +
    list offsets. Matches the oracle's
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')."""
    toks, offsets = tx._tokens(texts)
    flat = toks.flatten()
    mask = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    counts = tx._segment_sums(mask.astype(np.int64), offsets)
    new_offsets = np.concatenate([[0], np.cumsum(counts, dtype=np.int64)])
    flat_np = flat.to_numpy(zero_copy_only=False)[mask]
    return flat_np, new_offsets


def _concat_grams(flat: np.ndarray, starts: np.ndarray, n: int, sep: str = " ") -> np.ndarray:
    """Join n consecutive tokens starting at each index in ``starts``.
    Object-dtype elementwise concat: the loop is over n (gram width), not
    over grams — each + is one C-level pass across all grams."""
    grams = flat[starts].astype(object)
    for j in range(1, n):
        grams = grams + sep
        grams = grams + flat[starts + j]
    return grams


def ngram_rows(flat: np.ndarray, offsets: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All within-row n-grams over the flat token array.

    Returns (grams, row_ids): gram j belongs to document row row_ids[j];
    grams never straddle a row boundary. Empty result for short inputs."""
    total = len(flat)
    n_rows = len(offsets) - 1
    if total < n:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    m = total - n + 1
    valid = row_ids[:m] == row_ids[n - 1:]
    starts = np.nonzero(valid)[0]
    return _concat_grams(flat, starts, n), row_ids[starts]


def chunk_spans(
    flat: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Non-overlapping k-token chunks per row (full chunks only; a row with
    fewer than k tokens emits none). Returns (spans, row_ids, idx) where
    idx is the 1-based chunk position within its row — mirrors the oracle's
    generate_series(1, len(toks)//k)."""
    counts = np.diff(offsets)
    spans_per_row = counts // k
    total = int(spans_per_row.sum())
    if total == 0:
        e = np.array([], dtype=np.int64)
        return np.array([], dtype=object), e, e
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), spans_per_row)
    span_starts_cum = np.concatenate([[0], np.cumsum(spans_per_row)])
    idx0 = np.arange(total, dtype=np.int64) - span_starts_cum[row_ids]
    starts = offsets[:-1][row_ids] + k * idx0
    return _concat_grams(flat, starts, k), row_ids, idx0 + 1


def repetition_stats(
    texts: pa.Array,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-document repetition signals over whitespace tokens:

    - n_bigrams:        number of adjacent token pairs
    - dup_bigram_frac:  1 - distinct_bigrams / n_bigrams          (0 if none)
    - top_bigram_frac:  occurrences of the modal bigram / n_bigrams (0 if none)
    - dup_trigram_frac: 1 - distinct_trigrams / n_trigrams        (0 if none)

    Gopher (Rae et al. 2021, table A1) filters on exactly these families of
    signals; fractions here are over n-gram occurrences, which keeps the
    DuckDB mirror closed-form. Vectorized: gram construction is numpy over
    list offsets; per-row distinct/mode counts are one pandas groupby.
    """
    flat, offsets = nonempty_tokens(texts)
    n_rows = len(offsets) - 1
    idx = pd.RangeIndex(n_rows)

    def per_row(n: int) -> tuple[pd.Series, pd.Series, pd.Series]:
        grams, rows = ngram_rows(flat, offsets, n)
        if len(grams) == 0:
            z = pd.Series(0, index=idx, dtype=np.int64)
            return z, z, z
        counts = (
            pd.DataFrame({"r": rows, "g": grams})
            .groupby(["r", "g"], sort=False)
            .size()
        )
        by_row = counts.groupby(level=0)
        total = by_row.sum().reindex(idx, fill_value=0)
        distinct = by_row.size().reindex(idx, fill_value=0)
        top = by_row.max().reindex(idx, fill_value=0)
        return total, distinct, top

    bi_total, bi_distinct, bi_top = per_row(2)
    tri_total, tri_distinct, _ = per_row(3)

    def frac(num: pd.Series, den: pd.Series) -> np.ndarray:
        den_f = den.to_numpy(dtype=np.float64)
        out = np.divide(
            num.to_numpy(dtype=np.float64),
            den_f,
            out=np.zeros(n_rows, dtype=np.float64),
            where=den_f > 0,
        )
        return out

    dup_bi = frac(bi_total - bi_distinct, bi_total)
    top_bi = frac(bi_top, bi_total)
    dup_tri = frac(tri_total - tri_distinct, tri_total)
    return bi_total.to_numpy(dtype=np.int64), dup_bi, top_bi, dup_tri
