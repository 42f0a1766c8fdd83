"""Reranker service: prompt building, batch scoring, graceful fallback,
latency calibration.

Contract carried from the reference's RerankerService (reranker.rs:113-771):
  * prompt template loaded from PROMPTS_DIR/reranker.txt when present, else
    a built-in yes/no template with {query} {document} {page} {section}
    {text} placeholders (reranker.rs:174-212, build_prompt :446-466 — page 0
    renders as "unknown", empty section as "N/A");
  * per-candidate failure falls back to the candidate's initial embedding
    score (reranker.rs:288-313) — here failures are batch-granular since
    scoring is one device pass;
  * results sorted by relevance descending (reranker.rs:261-266);
  * calibrate_timeout: 2 warm-up passes then timed samples; nearest-rank
    p95/p99 with index round(p * (N-1)) (reranker.rs:605-699).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

from rust_local_rag_tpu.config import get_prompts_dir

logger = logging.getLogger(__name__)

DEFAULT_PROMPT_TEMPLATE = """Query: {query}
Document: {document}
Page: {page}

Chunk:
{text}

Judge relevance by meaning, not keyword overlap alone. Treat the chunk as
relevant when it answers the query directly, supplies definitions or context
the answer depends on, or contains information logically tied to the query.

Does this chunk contain relevant information for the query?
Answer:"""


@dataclass
class RerankerCandidate:
    """Mirror of reranker.rs:8-21."""

    chunk_id: str
    document: str
    text: str
    page_number: int
    section: Optional[str]
    initial_score: float


@dataclass
class RerankedResult:
    """Mirror of reranker.rs:27-39."""

    chunk_id: str
    relevance: float
    yes_logprob: Optional[float] = None
    no_logprob: Optional[float] = None


@dataclass
class CalibrationStats:
    """Mirror of reranker.rs:49-56."""

    mean_ms: float
    median_ms: float
    p95_ms: float
    p99_ms: float
    max_ms: float
    sample_size: int


def load_prompt_template() -> str:
    path = os.path.join(get_prompts_dir(), "reranker.txt")
    try:
        with open(path, "r", encoding="utf-8") as f:
            template = f.read()
        logger.info("Loaded reranker prompt from %s", path)
        return template
    except OSError:
        logger.info(
            "Using default reranker prompt (no external file at %s)", path
        )
        return DEFAULT_PROMPT_TEMPLATE


class RerankerService:
    def __init__(self, model, prompt_template: Optional[str] = None):
        """`model` provides .score_prompts(prompts) -> [(score, yes_lp,
        no_lp)] and .model_name (TransformerReranker or FakeReranker)."""
        self._model = model
        self._template = prompt_template or load_prompt_template()

    @property
    def model_name(self) -> str:
        return self._model.model_name

    def build_prompt(self, query: str, candidate: RerankerCandidate) -> str:
        page = (
            "unknown" if candidate.page_number == 0 else str(candidate.page_number)
        )
        section = (
            candidate.section.strip()
            if candidate.section and candidate.section.strip()
            else "N/A"
        )
        return (
            self._template.replace("{query}", query.strip())
            .replace("{document}", candidate.document)
            .replace("{page}", page)
            .replace("{section}", section)
            .replace("{text}", candidate.text.strip())
        )

    def score_prompts(self, prompts: Sequence[str]):
        """Batched raw scoring passthrough: [(score, yes_lp, no_lp)] —
        used by the engine to score many queries' candidates in one
        device forward."""
        return self._model.score_prompts(list(prompts))

    def dispatch_prompts(self, prompts: Sequence[str]):
        """Async half of score_prompts for the pipelined judge lane: the
        device forward is dispatched but not fetched. Models without a
        split interface score synchronously here (the handle is then the
        finished result)."""
        if hasattr(self._model, "dispatch_prompts"):
            return self._model.dispatch_prompts(list(prompts))
        return self._model.score_prompts(list(prompts))

    def fetch_prompts(self, handle):
        if hasattr(self._model, "fetch_prompts"):
            return self._model.fetch_prompts(handle)
        return handle

    def rerank(
        self, query: str, candidates: Sequence[RerankerCandidate]
    ) -> List[RerankedResult]:
        """Score ALL candidates in one batched device pass; fall back to
        initial scores if the pass fails; sort by relevance desc."""
        if not candidates:
            return []
        # Per-phase latency instrumentation (the reference times 5 phases of
        # its rerank loop, reranker.rs:321-441; here scoring is one batched
        # device pass so the phases are prompt-build / device-score / sort).
        t0 = time.perf_counter()
        prompts = [self.build_prompt(query, c) for c in candidates]
        t_build = time.perf_counter()
        try:
            scored = self._model.score_prompts(prompts)
            t_score = time.perf_counter()
            results = [
                RerankedResult(
                    chunk_id=c.chunk_id,
                    relevance=float(s),
                    yes_logprob=y,
                    no_logprob=n,
                )
                for c, (s, y, n) in zip(candidates, scored)
            ]
            logger.debug(
                "rerank phases: build_prompts=%.1fms score=%.1fms "
                "(%d candidates)",
                (t_build - t0) * 1000.0,
                (t_score - t_build) * 1000.0,
                len(candidates),
            )
        except Exception as e:  # noqa: BLE001
            logger.warning(
                "Reranker scoring failed, falling back to initial scores: %s", e
            )
            results = [
                RerankedResult(chunk_id=c.chunk_id, relevance=c.initial_score)
                for c in candidates
            ]
        results.sort(key=lambda r: -r.relevance)
        return results

    def calibrate_timeout(
        self,
        query: str,
        candidates: Sequence[RerankerCandidate],
        sample_size: int,
    ) -> CalibrationStats:
        """Measure scoring latency distribution (reranker.rs:605-699).

        On-device scoring is batch-granular; each sample times a single-
        candidate batch, mirroring the reference's per-candidate timing.
        """
        sample_size = min(sample_size, len(candidates))
        if sample_size == 0:
            raise ValueError("No candidates provided for calibration")

        warmup = min(2, len(candidates))
        for c in candidates[:warmup]:
            try:
                self._model.score_prompts([self.build_prompt(query, c)])
            except Exception:  # noqa: BLE001
                pass

        durations_ms: List[float] = []
        for c in candidates[:sample_size]:
            start = time.perf_counter()
            try:
                self._model.score_prompts([self.build_prompt(query, c)])
            except Exception as e:  # noqa: BLE001
                logger.warning("Calibration sample failed: %s", e)
            durations_ms.append((time.perf_counter() - start) * 1000.0)

        durations_ms.sort()
        n = len(durations_ms)
        mean_ms = sum(durations_ms) / n
        median_ms = durations_ms[n // 2]
        p95_idx = min(round(0.95 * (n - 1)), n - 1)
        p99_idx = min(round(0.99 * (n - 1)), n - 1)
        return CalibrationStats(
            mean_ms=mean_ms,
            median_ms=median_ms,
            p95_ms=durations_ms[p95_idx],
            p99_ms=durations_ms[p99_idx],
            max_ms=durations_ms[-1],
            sample_size=n,
        )


def build_default_reranker() -> Optional[RerankerService]:
    """Construct the configured reranker, or None when disabled (the
    reference treats reranker-init failure as non-fatal,
    rag_engine.rs:164-176)."""
    from rust_local_rag_tpu.config import get_rerank_model

    name = get_rerank_model()
    if not name:
        return None
    try:
        if os.environ.get("RAG_TPU_FAKE_RERANKER"):
            from rust_local_rag_tpu.models.reranker import FakeReranker

            return RerankerService(FakeReranker(model_name=name))
        from rust_local_rag_tpu.models.reranker import TransformerReranker

        return RerankerService(TransformerReranker(model_name=name))
    except Exception as e:  # noqa: BLE001
        logger.warning(
            "Reranker unavailable, falling back to embedding scores only: %s", e
        )
        return None
