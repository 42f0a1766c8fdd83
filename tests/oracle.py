"""NumPy oracle: an independent re-derivation of the reference's CPU
retrieval algorithms (rag_engine.rs), used to verify the device programs.

These are straight ports of the documented semantics — sequential loops, the
same epsilons and guard rails — kept deliberately naive so they can serve as
ground truth for the TPU implementations.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np


def normalize(v: np.ndarray) -> np.ndarray:
    """rag_engine.rs:1763-1771"""
    v = v.astype(np.float32)
    norm_sq = float(np.sum(v * v))
    if norm_sq > 1e-20:
        return v / np.float32(math.sqrt(norm_sq))
    return v


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """rag_engine.rs:1742-1759"""
    if a.shape != b.shape:
        return 0.0
    eps = 1e-10
    dot = float(np.dot(a.astype(np.float32), b.astype(np.float32)))
    norm_a = float(np.linalg.norm(a.astype(np.float32)))
    norm_b = float(np.linalg.norm(b.astype(np.float32)))
    if norm_a < eps or norm_b < eps:
        return 0.0
    return float(np.clip(dot / (norm_a * norm_b), -1.0, 1.0))


F32_EPSILON = np.float32(1.1920929e-07)


def brute_force_search(
    query: np.ndarray,
    corpus: np.ndarray,
    lexical: np.ndarray,
    w_embedding: float,
    w_lexical: float,
    initial_k: int,
) -> List[Tuple[int, float, float, float]]:
    """Reference first-stage scoring (rag_engine.rs:515-561) over all chunks.

    Returns [(index, combined, embedding_score, lexical_norm)] sorted by
    combined desc, truncated to initial_k.
    """
    max_lex = max(float(lexical.max()) if lexical.size else 0.0, float(F32_EPSILON))
    rows = []
    for i in range(corpus.shape[0]):
        emb = float(np.dot(query, corpus[i]))
        lex = float(lexical[i]) / max_lex
        combined = w_embedding * emb + w_lexical * lex
        rows.append((i, combined, emb, lex))
    rows.sort(key=lambda r: -r[1])
    return rows[:initial_k]


def mmr_diversify(
    embeddings: np.ndarray,
    relevance: np.ndarray,
    top_k: int,
    diversity_factor: float,
) -> List[int]:
    """Greedy MMR port of rag_engine.rs:767-839 (including swap_remove
    mechanics, the fold(0.0, max) similarity floor and NaN/Inf guards).
    Returns selected candidate indices in selection order.
    """
    remaining = list(range(embeddings.shape[0]))
    selected: List[int] = []
    if not remaining:
        return selected

    # swap_remove(0)
    first = remaining[0]
    remaining[0] = remaining[-1]
    remaining.pop()
    selected.append(first)

    while len(selected) < top_k and remaining:
        best_mmr = -math.inf
        best_pos = 0
        found = False
        for pos, cand in enumerate(remaining):
            rel = float(relevance[cand])
            if not math.isfinite(rel):
                continue
            max_sim = 0.0
            for s in selected:
                sim = float(np.dot(embeddings[cand], embeddings[s]))
                if math.isfinite(sim):
                    max_sim = max(max_sim, sim)
            mmr = (1.0 - diversity_factor) * rel - diversity_factor * max_sim
            if math.isfinite(mmr) and mmr > best_mmr:
                best_mmr = mmr
                best_pos = pos
                found = True
        if not found or best_mmr == -math.inf:
            break
        # swap_remove(best_pos)
        best = remaining[best_pos]
        remaining[best_pos] = remaining[-1]
        remaining.pop()
        selected.append(best)
    return selected


def rerank_blend(
    initial_scores: Sequence[float],
    reranker_scores: Sequence[float],
    w_reranker: float,
    w_initial: float,
) -> List[float]:
    """Second-stage blending (rag_engine.rs:602-627): per-query max
    normalization of both sides, then the weighted sum."""
    max_rr = max(max(reranker_scores, default=0.0), float(F32_EPSILON))
    max_init = max(max(initial_scores, default=0.0), float(F32_EPSILON))
    return [
        w_reranker * (rr / max_rr) + w_initial * (ini / max_init)
        for rr, ini in zip(reranker_scores, initial_scores)
    ]


def yes_no_softmax(yes_logprob: Optional[float], no_logprob: Optional[float]) -> float:
    """Reranker score formula (reranker.rs:519-588): missing side -> -10.0,
    score = e^yes / (e^yes + e^no)."""
    yes_lp = yes_logprob if yes_logprob is not None else -10.0
    no_lp = no_logprob if no_logprob is not None else -10.0
    ye = math.exp(yes_lp)
    ne = math.exp(no_lp)
    return ye / (ye + ne)
