"""IR metrics — standard TREC formulations (cf. eval/metrics.py in the
reference; same math, stdlib only).

hit_rate@k: binary, 1 if any gold id in top-k.
mrr@k:      1 / rank of first gold hit.
ndcg@k:     linear-gain DCG (rel / log2(rank+1)) over ideal.
precision@k and context_precision for noise measurement.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Set


def hit_rate_at_k(gold_ids: Set[str], retrieved_ids: Sequence[str], k: int) -> float:
    assert k >= 1
    if not retrieved_ids:
        return 0.0
    return 1.0 if gold_ids & set(retrieved_ids[:k]) else 0.0


def mrr_at_k(gold_ids: Set[str], retrieved_ids: Sequence[str], k: int) -> float:
    assert k >= 1
    for i, rid in enumerate(retrieved_ids[:k]):
        if rid in gold_ids:
            return 1.0 / (i + 1)
    return 0.0


def ndcg_at_k(relevances: Sequence[int], k: int) -> float:
    assert k >= 1
    if not relevances:
        return 0.0
    actual_k = min(k, len(relevances))
    dcg = sum(rel / math.log2(i + 2) for i, rel in enumerate(relevances[:actual_k]))
    ideal = sorted(relevances, reverse=True)[:actual_k]
    idcg = sum(rel / math.log2(i + 2) for i, rel in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def precision_at_k(gold_ids: Set[str], retrieved_ids: Sequence[str], k: int) -> float:
    assert k >= 1
    if not retrieved_ids:
        return 0.0
    actual_k = min(k, len(retrieved_ids))
    return len(gold_ids & set(retrieved_ids[:actual_k])) / actual_k


def context_precision(relevances: Sequence[int]) -> float:
    if not relevances:
        return 0.0
    return sum(1 for r in relevances if r > 0) / len(relevances)


def percentile(sorted_data: Sequence[float], p: float) -> float:
    if not sorted_data:
        return 0.0
    idx = min(int(len(sorted_data) * p / 100), len(sorted_data) - 1)
    return sorted_data[idx]


def aggregate_metrics(query_results: List[dict]) -> Dict[str, float]:
    if not query_results:
        return {}
    n = len(query_results)
    latencies = sorted(r.get("latency_ms", 0.0) for r in query_results)
    return {
        "hit_rate_mean": sum(r.get("hit_rate", 0.0) for r in query_results) / n,
        "mrr_mean": sum(r.get("mrr", 0.0) for r in query_results) / n,
        "ndcg_mean": sum(r.get("ndcg", 0.0) for r in query_results) / n,
        "latency_mean_ms": sum(latencies) / n,
        "latency_p50_ms": percentile(latencies, 50),
        "latency_p95_ms": percentile(latencies, 95),
        "latency_p99_ms": percentile(latencies, 99),
        "n_queries": n,
    }
