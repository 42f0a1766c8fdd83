"""Rank-centric IR metrics for the quality eval.

The whole family of top-k metrics is a function of ONE derived quantity:
the (1-based) rank of the first gold item inside the retrieval order.
We compute that rank once (`first_gold_rank`) and express hit@k and
MRR@k as views of it, rather than re-scanning the list per metric; NDCG
works on the graded-relevance vector with an explicit discount table.
The resulting NUMBERS follow the standard TREC formulations — they must,
or comparisons against the reference's published baseline
(eval/reports/BASELINE_EVALUATION_SUMMARY.md) would be meaningless — but
the shape here is our own.

Divergence, on purpose: `percentile` uses the textbook nearest-rank
definition (ceil(p/100 * n), 1-based), matching the server's calibrate
tool (utils/profiling.py). The reference's eval indexes
`int(n * p / 100)` (a floor, 0-based), which reads one element HIGHER
than nearest-rank for most (n, p) — e.g. p50 of 4 samples returns the
3rd-smallest instead of the 2nd. Pass `legacy_floor=True` to reproduce
the reference's rule when comparing latency percentiles against its
published tables.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Set


def first_gold_rank(
    gold_ids: Set[str], retrieved_ids: Sequence[str], k: int
) -> Optional[int]:
    """1-based rank of the first gold id within the top-k, else None."""
    assert k >= 1
    for rank, rid in enumerate(retrieved_ids[:k], start=1):
        if rid in gold_ids:
            return rank
    return None


def hit_rate_at_k(gold_ids: Set[str], retrieved_ids: Sequence[str], k: int) -> float:
    """1.0 iff any gold id appears in the top-k (binary, not recall)."""
    return 0.0 if first_gold_rank(gold_ids, retrieved_ids, k) is None else 1.0


def mrr_at_k(gold_ids: Set[str], retrieved_ids: Sequence[str], k: int) -> float:
    """Reciprocal rank of the first gold hit in the top-k, 0.0 on miss."""
    rank = first_gold_rank(gold_ids, retrieved_ids, k)
    return 0.0 if rank is None else 1.0 / rank


def _dcg(gains: Sequence[int]) -> float:
    """Discounted cumulative gain, linear-gain variant: gain/log2(rank+1).

    Linear (not the 2^rel - 1 exponential form) because the reference's
    published NDCG numbers use linear gain; mixing variants would break
    the baseline comparison.
    """
    return sum(g / math.log2(rank + 1) for rank, g in enumerate(gains, start=1))


def ndcg_at_k(relevances: Sequence[int], k: int) -> float:
    """NDCG over a graded-relevance vector in retrieval order."""
    assert k >= 1
    got = list(relevances[:k])
    best = sorted(relevances, reverse=True)[: len(got)]
    denom = _dcg(best)
    return _dcg(got) / denom if denom > 0 else 0.0


def precision_at_k(gold_ids: Set[str], retrieved_ids: Sequence[str], k: int) -> float:
    """Gold fraction of the top-k (short lists use their actual length)."""
    assert k >= 1
    head = retrieved_ids[:k]
    if not head:
        return 0.0
    return sum(1 for rid in head if rid in gold_ids) / len(head)


def context_precision(relevances: Sequence[int]) -> float:
    """Fraction of ALL retrieved chunks with any relevance (noise gauge)."""
    if not relevances:
        return 0.0
    return sum(1 for r in relevances if r > 0) / len(relevances)


def percentile(
    sorted_data: Sequence[float], p: float, legacy_floor: bool = False
) -> float:
    """Nearest-rank percentile over pre-sorted data (see module docstring).

    legacy_floor=True switches to the reference eval's floor-indexing
    rule for direct comparison against its published latency tables.
    """
    n = len(sorted_data)
    if n == 0:
        return 0.0
    if legacy_floor:
        idx = min(int(n * p / 100), n - 1)
    else:
        idx = max(0, min(math.ceil(n * p / 100.0), n) - 1)
    return sorted_data[idx]


def aggregate_metrics(query_results: List[dict]) -> Dict[str, float]:
    """Mean quality metrics + latency percentiles over per-query rows.

    The key schema is load-bearing: reports, the sweep harness, and the
    reference-comparison tables all read these names.
    """
    if not query_results:
        return {}
    n = len(query_results)

    def mean_of(key: str) -> float:
        return sum(r.get(key, 0.0) for r in query_results) / n

    latencies = sorted(r.get("latency_ms", 0.0) for r in query_results)
    out: Dict[str, float] = {
        "hit_rate_mean": mean_of("hit_rate"),
        "mrr_mean": mean_of("mrr"),
        "ndcg_mean": mean_of("ndcg"),
        "latency_mean_ms": sum(latencies) / n,
        "n_queries": n,
    }
    for p in (50, 95, 99):
        out[f"latency_p{p}_ms"] = percentile(latencies, p)
    return out
