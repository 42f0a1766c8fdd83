"""Query-level rejection floor sweep on the DEV split.

Sweeps (rejection_threshold x rejection_query_floor) — the per-candidate
judge floor against the round-4 QUERY-level floor (engine/rag_engine.py:
a query whose BEST judged yes-probability over the whole judged head
falls below the floor returns nothing; queries that pass keep their full
result list). The query floor decouples junk rejection from the
per-candidate gate's gold-kill: dropping individual low-confidence
results prunes true answers on paraphrase queries, while "is the best
candidate any good at all" only fires on whole-query junk.

DEV SPLIT ONLY (heldout/thirdparty must never drive this choice).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_qfloor.py
    python scripts/sweep_qfloor.py "0,0.06" "0,0.05,0.1,0.2,0.3"
"""

from __future__ import annotations

import json
import sys

from sweep_common import eval_server, run_points

THRESHOLDS = [0.0, 0.06]
Q_FLOORS = [0.0, 0.05, 0.10, 0.20, 0.30]


def main() -> int:
    thresholds = (
        [float(t) for t in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else THRESHOLDS
    )
    floors = (
        [float(t) for t in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else Q_FLOORS
    )
    points = [
        (
            f"thr{t:g}_qf{q:g}".replace(".", "p"),
            {"rejection_threshold": t, "rejection_query_floor": q},
        )
        for t in thresholds
        for q in floors
    ]
    with eval_server("sweep_qfloor_") as (base, gt, work):
        results = run_points(base, gt, work, points)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
