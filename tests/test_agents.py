"""TextChunker (T5), auto-engine heuristic (M14), LLM agent stubs."""

import pytest

from anycrawl_ray.functions.agents import (
    LLMAgentStub,
    TextChunker,
    analyze_html_for_js_requirement,
)


def counter(text: str) -> int:
    return len(text.split())  # 1 token per word, deterministic for tests


def test_chunker_single_chunk():
    c = TextChunker(counter)
    out = c.split_text_into_chunks("a b\nc d", max_tokens=100)
    assert len(out) == 1
    assert out[0].chunk == "a b\nc d"
    assert (out[0].start_index, out[0].end_index) == (0, 3 - 2)  # lines 0..1


def test_chunker_splits_on_budget():
    c = TextChunker(counter)
    text = "\n".join(f"w{i} w{i}" for i in range(10))  # 2 tokens/line
    out = c.split_text_into_chunks(text, max_tokens=4, overlap_tokens=0)
    assert len(out) == 5
    assert out[0].chunk == "w0 w0\nw1 w1"
    assert out[-1].chunk.endswith("w9 w9")


def test_chunker_overlap():
    c = TextChunker(counter)
    text = "\n".join(f"l{i}" for i in range(6))  # 1 token/line
    out = c.split_text_into_chunks(text, max_tokens=2, overlap_tokens=1)
    # each new chunk starts with the previous chunk's last line
    for prev, cur in zip(out, out[1:]):
        assert cur.chunk.split("\n")[0] == prev.chunk.split("\n")[-1]


def test_chunker_skips_empty_lines():
    c = TextChunker(counter)
    out = c.split_text_into_chunks("a\n\n\nb", max_tokens=100)
    assert out[0].chunk == "a\nb"


def test_chunker_multiple_texts():
    c = TextChunker(counter)
    out = c.split_multiple_texts(["a", "b"], max_tokens=10)
    assert [x.chunk for x in out] == ["a", "b"]


def test_js_requirement_spa_markers():
    html = '<html><body><div id="root"></div></body></html>' + "x" * 2500
    r = analyze_html_for_js_requirement(html)
    assert r["js_required"] and "empty-root-container" in r["reasons"]


def test_js_requirement_static_page():
    body = "<article>" + ("real words here " * 100) + "</article>"
    html = f"<html><body>{body}</body></html>"
    r = analyze_html_for_js_requirement(html)
    assert not r["js_required"]
    assert any(x.startswith("substantial-text") for x in r["reasons"])


def test_js_requirement_framework_markers():
    html = ('<html><body><div>"__NEXT_DATA__"</div><noscript>please enable '
            "javascript to view this site</noscript></body></html>" + "y" * 2500)
    r = analyze_html_for_js_requirement(html)
    assert r["js_required"]
    assert "framework:nextjs-data" in r["reasons"]
    assert "noscript-fallback" in r["reasons"]


def test_llm_stub_extract_merge_deterministic():
    a = LLMAgentStub(max_tokens=8, overlap_tokens=0)
    text = "\n".join(f"line {i} data" for i in range(20))
    r1 = a.extract(text, ["title", "price"])
    r2 = a.extract(text, ["title", "price"])
    assert r1 == r2
    assert set(r1) == {"title", "price"} and all(r1.values())


def test_llm_stub_summary_reduce():
    a = LLMAgentStub(max_tokens=4, overlap_tokens=0)
    long = "\n".join(f"l{i} w w w" for i in range(10))
    s = a.summary(long)
    assert s.startswith("summary-reduce:")
    short = a.summary("one line")
    assert short.startswith("summary:")


def test_llm_stub_ocr_dedup_order():
    a = LLMAgentStub()
    out = a.ocr(["img://a", "img://b", "img://a"])
    assert out[0] == out[2] != out[1]


def test_llm_stub_strict_raises():
    with pytest.raises(NotImplementedError):
        LLMAgentStub(mode="strict").summary("x")
