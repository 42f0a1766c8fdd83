"""Rejection-threshold sweep: boots one server with the current env
(point ENCODER_WEIGHTS/RERANKER_WEIGHTS at staged checkpoints to
calibrate a new asset) and evaluates the DEV-split baseline at several
rejection_threshold values.

The threshold is the engine-level confidence floor (judge absolute
yes-probability with reranking on); results below it are dropped, which
is both how rejection queries return nothing AND how the gate-judge
prunes noise from the retrieval pool — but a floor set too high drops
true results. DEV SPLIT ONLY: the held-out split must never drive this
choice (eval_harness/heldout_data.py contract).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_rejection.py
    python scripts/sweep_rejection.py "0.02,0.04,0.06"

SWEEP_KEEP=1 preserves per-query reports.
"""

from __future__ import annotations

import json
import sys

from sweep_common import eval_server, run_points

THRESHOLDS = [0.0, 0.03, 0.045, 0.06, 0.08, 0.10, 0.12]


def main() -> int:
    thresholds = (
        [float(t) for t in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else THRESHOLDS
    )
    points = [
        (f"rej_{t:g}".replace(".", "p"), {"rejection_threshold": t})
        for t in thresholds
    ]
    with eval_server("sweep_rej_") as (base, gt, work):
        results = run_points(base, gt, work, points)
    print(json.dumps({str(t): r for t, r in zip(thresholds, results.values())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
