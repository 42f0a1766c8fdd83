"""Unseen-term-gate sweep on the DEV split: (mass threshold x cosine
ceiling) grid, with the baseline judge gate kept at its committed
operating point (rejection_threshold from baseline.yaml).

The joint unseen gate (rag_engine.py __init__ note) is the third
rejection signal: junk whose informative terms the corpus never indexed
returns nothing when its best pool cosine is also unimpressive. The
offline dev frontier (scripts/exp_joint_ood.py) shows the 2-signal rule
alone trades rejection 0.8 for ~12% gold-kill, but HIGH-PRECISION
settings (mass >= ~0.6) kill no dev gold while catching exactly the junk
whose vocabulary the judge has no purchase on — the judge and the gate
cover different junk. Sweep dev-only; held-out stays report-only.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_unseen.py
    python scripts/sweep_unseen.py "0.5,0.6,0.7" "0.5,0.6"
    RERANKER_WEIGHTS=/path python scripts/sweep_unseen.py   # staged judge
"""

from __future__ import annotations

import json
import sys

from sweep_common import eval_server, run_points

MASSES = [0.0, 0.45, 0.55, 0.65, 0.75]
COS_CEILS = [0.5, 0.6]


def main() -> int:
    masses = (
        [float(t) for t in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else MASSES
    )
    ceils = (
        [float(t) for t in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else COS_CEILS
    )
    points = []
    for m in masses:
        for c in ceils if m > 0 else [1.0]:
            points.append(
                (
                    f"um{m:g}_c{c:g}".replace(".", "p"),
                    {
                        "rejection_unseen_mass": m,
                        "rejection_unseen_cos": c,
                    },
                )
            )
    with eval_server("sweep_um_") as (base, gt, work):
        results = run_points(base, gt, work, points)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
