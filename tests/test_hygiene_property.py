"""Property tests: the vectorized hygiene kernels (numpy over Arrow list
offsets) must agree with trivially-correct pure-Python references on
arbitrary whitespace-laced inputs. No Ray needed."""

import os
import sys
from collections import Counter

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anycrawl_ray.functions import hygiene as hy

# words + whitespace runs, including empty docs and pure-whitespace docs
_word = st.text(alphabet="abcxyz0#", min_size=1, max_size=4)
_ws = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
_doc = st.lists(st.tuples(_ws, _word), max_size=12).map(
    lambda parts: "".join(w + t for w, t in parts)
)
_docs = st.lists(_doc, min_size=1, max_size=8)


def _ref_tokens(text: str) -> list[str]:
    return text.split()


@settings(max_examples=200, deadline=None)
@given(_docs)
def test_nonempty_tokens_matches_str_split(docs):
    flat, offsets = hy.nonempty_tokens(pa.array(docs, pa.string()))
    for i, d in enumerate(docs):
        got = list(flat[offsets[i]:offsets[i + 1]])
        assert got == _ref_tokens(d), (d, got)


@settings(max_examples=200, deadline=None)
@given(_docs, st.integers(min_value=1, max_value=4))
def test_ngram_rows_matches_reference(docs, n):
    flat, offsets = hy.nonempty_tokens(pa.array(docs, pa.string()))
    grams, rows = hy.ngram_rows(flat, offsets, n)
    got = [(int(r), g) for r, g in zip(rows, grams)]
    want = []
    for i, d in enumerate(docs):
        toks = _ref_tokens(d)
        want.extend(
            (i, " ".join(toks[j:j + n])) for j in range(len(toks) - n + 1)
        )
    assert got == want


@settings(max_examples=200, deadline=None)
@given(_docs, st.integers(min_value=1, max_value=5))
def test_chunk_spans_matches_reference(docs, k):
    flat, offsets = hy.nonempty_tokens(pa.array(docs, pa.string()))
    spans, rows, idx = hy.chunk_spans(flat, offsets, k)
    got = [(int(r), int(i), s) for r, i, s in zip(rows, idx, spans)]
    want = []
    for r, d in enumerate(docs):
        toks = _ref_tokens(d)
        for j in range(len(toks) // k):
            want.append((r, j + 1, " ".join(toks[j * k:(j + 1) * k])))
    assert got == want


@settings(max_examples=150, deadline=None)
@given(_docs)
def test_repetition_stats_matches_reference(docs):
    n_bi, dup_bi, top_bi, dup_tri = hy.repetition_stats(
        pa.array(docs, pa.string())
    )
    for i, d in enumerate(docs):
        toks = _ref_tokens(d)
        bi = Counter(
            " ".join(toks[j:j + 2]) for j in range(max(len(toks) - 1, 0))
        )
        tri = Counter(
            " ".join(toks[j:j + 3]) for j in range(max(len(toks) - 2, 0))
        )
        nb = sum(bi.values())
        nt = sum(tri.values())
        assert n_bi[i] == nb
        assert abs(dup_bi[i] - ((nb - len(bi)) / nb if nb else 0.0)) < 1e-12
        assert abs(top_bi[i] - (max(bi.values()) / nb if nb else 0.0)) < 1e-12
        assert abs(dup_tri[i] - ((nt - len(tri)) / nt if nt else 0.0)) < 1e-12
