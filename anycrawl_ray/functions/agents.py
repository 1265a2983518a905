"""AI-agent stage stubs + the token-aware chunker + auto-engine classifier.

- TextChunker: faithful transcription of the line-based maxTokens/overlap
  chunker (reference packages/ai/src/agents/TextChunker.ts:21-99) — this is
  real logic (drives chunk->extract->merge), fully implemented and tested.
- analyze_html_for_js_requirement: the auto-engine HTML heuristic (M14,
  reference packages/scrape/src/utils/autoEngine.ts:7-87) — decides
  cheerio vs playwright; per-host result cached in the politeness actor
  (reference caches in Redis DomainCache, utils/DomainCache.ts:1-41).
- LLM extract/summary/OCR agents (T5, reference core/DataExtractor.ts:60-120,
  ai/src/agents/LLMExtract.ts): no model runtime exists in this container, so
  the agents are STUBS — ``deterministic`` mode derives stable fake outputs
  from content hashes (plumbing testable end-to-end), ``strict`` raises.
  The chunk->per-chunk-call->merge control flow is real.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass


def default_token_counter(text: str) -> int:
    """~4 chars/token heuristic (reference TextChunker.ts constructor default
    uses the model tokenizer; the chunker only needs monotone estimates)."""
    return max(1, len(text) // 4)


@dataclass
class ChunkResult:
    chunk: str
    start_index: int
    end_index: int
    tokens: int


class TextChunker:
    """Line-based chunker with token budget + overlap (TextChunker.ts:21-86)."""

    def __init__(self, token_counter=default_token_counter):
        self.token_counter = token_counter

    def split_text_into_chunks(
        self, text: str, max_tokens: int, overlap_tokens: int = 0
    ) -> list[ChunkResult]:
        chunks: list[ChunkResult] = []
        lines = text.split("\n")
        current_chunk = ""
        current_tokens = 0
        start_index = 0

        for i, line in enumerate(lines):
            if not line:
                continue  # TextChunker.ts:31 skips falsy lines
            line_tokens = self.token_counter(line + "\n")
            if current_tokens + line_tokens > max_tokens and len(current_chunk) > 0:
                chunks.append(
                    ChunkResult(current_chunk.strip(), start_index, i - 1, current_tokens)
                )
                overlap_lines = self._overlap_lines(lines, i, overlap_tokens)
                current_chunk = "\n".join(overlap_lines)
                current_tokens = self.token_counter(current_chunk) if current_chunk else 0
                start_index = max(0, i - len(overlap_lines) + 1)
                if current_chunk:
                    current_chunk += "\n" if not current_chunk.endswith("\n") else ""
            current_chunk += line + "\n"
            current_tokens += line_tokens

        if current_chunk.strip():
            chunks.append(
                ChunkResult(current_chunk.strip(), start_index, len(lines) - 1, current_tokens)
            )
        return chunks

    def _overlap_lines(
        self, lines: list[str], current_index: int, overlap_tokens: int
    ) -> list[str]:
        out: list[str] = []
        tokens = 0
        for i in range(current_index - 1, -1, -1):
            line = lines[i]
            if not line:
                continue
            lt = self.token_counter(line)
            if tokens + lt > overlap_tokens:
                break
            out.insert(0, line)
            tokens += lt
        return out

    def split_multiple_texts(self, texts, max_tokens, overlap_tokens=0):
        all_chunks: list[ChunkResult] = []
        for t in texts:
            all_chunks.extend(self.split_text_into_chunks(t, max_tokens, overlap_tokens))
        return all_chunks


# ---------------------------------------------------------------------------
# auto-engine heuristic (M14) — transcribed from autoEngine.ts:7-87
# ---------------------------------------------------------------------------

_FRAMEWORKS: list[tuple[re.Pattern, str, int]] = [
    (re.compile(r"[\"']__NEXT_DATA__[\"']"), "nextjs-data", 1),
    (re.compile(r"__NUXT__"), "nuxt-state", 1),
    (re.compile(r"window\.__INITIAL_STATE__"), "initial-state", 1),
    (re.compile(r"data-reactroot", re.I), "react-hydrated", 1),
    (re.compile(r"ng-app|ng-controller", re.I), "angular", 2),
    (re.compile(r"data-svelte", re.I), "svelte", 1),
]
_EMPTY_ROOT = re.compile(r"id=[\"'](?:root|app|__next|__nuxt)[\"'][^>]*>\s*</div>", re.I)
_BODY = re.compile(r"<body[^>]*>([\s\S]*?)</body>", re.I)
_TAGS = re.compile(r"<[^>]+>")
_SEMANTIC = re.compile(r"<(?:article|main)[^>]*>[\s\S]{200,}", re.I)


def analyze_html_for_js_requirement(raw_html: str) -> dict:
    reasons: list[str] = []
    score = 0
    body = _BODY.search(raw_html)
    body_html = body.group(1) if body else ""
    content_html = re.sub(r"<script[\s\S]*?</script>", "", body_html, flags=re.I)
    content_html = re.sub(r"<style[\s\S]*?</style>", "", content_html, flags=re.I)
    content_html = re.sub(r"<noscript[\s\S]*?</noscript>", "", content_html, flags=re.I).strip()
    visible_text = re.sub(r"\s+", " ", _TAGS.sub("", content_html)).strip()

    if _EMPTY_ROOT.search(raw_html):
        score += 3
        reasons.append("empty-root-container")
    if len(visible_text) < 100 and len(raw_html) > 2000:
        score += 3
        reasons.append(f"minimal-text:{len(visible_text)}")
    noscripts = re.findall(r"<noscript[^>]*>[\s\S]*?</noscript>", raw_html, flags=re.I)
    if noscripts:
        ns_text = _TAGS.sub("", "".join(noscripts)).strip()
        if len(ns_text) > 30:
            score += 3
            reasons.append("noscript-fallback")
    for pat, name, w in _FRAMEWORKS:
        if pat.search(raw_html):
            score += w
            reasons.append(f"framework:{name}")
    script_count = len(re.findall(r"<script", raw_html, flags=re.I))
    if script_count > 10 and len(visible_text) < 500:
        score += 2
        reasons.append(f"high-scripts:{script_count}")
    if len(visible_text) > 1000:
        score -= 3
        reasons.append(f"substantial-text:{len(visible_text)}")
    elif len(visible_text) > 500:
        score -= 1
        reasons.append(f"moderate-text:{len(visible_text)}")
    if _SEMANTIC.search(content_html):
        score -= 1
        reasons.append("has-semantic-content")
    return {"js_required": score >= 3, "score": score, "reasons": reasons}


# ---------------------------------------------------------------------------
# LLM agent stubs (T5) — chunk -> per-chunk call -> merge, stubbed model
# ---------------------------------------------------------------------------


class LLMAgentStub:
    """Stateful actor-pool stage: client would be cached per modelId
    (reference DataExtractor.ts:60-99); here the "model" is a deterministic
    digest so the chunking/merge plumbing is testable without a runtime."""

    def __init__(self, mode: str = "deterministic", max_tokens: int = 512,
                 overlap_tokens: int = 32):
        if mode not in ("deterministic", "strict"):
            raise ValueError(mode)
        self.mode = mode
        self.chunker = TextChunker()
        self.max_tokens = max_tokens
        self.overlap = overlap_tokens

    def _call_model(self, prompt: str, chunk: str) -> str:
        if self.mode == "strict":
            raise NotImplementedError("no LLM runtime in this container")
        digest = hashlib.sha256((prompt + "\x00" + chunk).encode()).hexdigest()[:12]
        return f"{prompt}:{digest}"

    def extract(self, text: str, schema_keys: list[str]) -> dict:
        """LLMExtract: chunk -> extract per chunk -> first-non-null merge
        (reference ai/src/agents/LLMExtract.ts:335-500 merge semantics)."""
        chunks = self.chunker.split_text_into_chunks(text, self.max_tokens, self.overlap)
        merged: dict[str, str | None] = {k: None for k in schema_keys}
        for c in chunks:
            for k in schema_keys:
                if merged[k] is None:
                    merged[k] = self._call_model(f"extract:{k}", c.chunk)
        return merged

    def summary(self, text: str) -> str:
        """LLMSummary: per-chunk summaries then a reduce summary."""
        chunks = self.chunker.split_text_into_chunks(text, self.max_tokens, self.overlap)
        partials = [self._call_model("summary", c.chunk) for c in chunks]
        if len(partials) == 1:
            return partials[0]
        return self._call_model("summary-reduce", "\n".join(partials))

    def ocr(self, image_refs: list[str]) -> list[str]:
        """LLMOCR: per unique image, bounded order-preserving results
        (reference DataExtractor.ts:166-209, concurrency 5 — here sync)."""
        seen: dict[str, str] = {}
        out = []
        for ref in image_refs:
            if ref not in seen:
                seen[ref] = self._call_model("ocr", ref)
            out.append(seen[ref])
        return out
