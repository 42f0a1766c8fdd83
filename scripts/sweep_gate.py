"""Joint rejection-gate sweep: (judge yes-p floor x dense-cosine floor)
grid on the DEV split (held-out and third-party splits must never drive
this choice).

The judge's absolute calibration only generalizes to junk resembling its
training templates (VERDICT r2 missing #2: held-out rejection 0.6, OOD
probe leaks 18-29% above the 0.06 floor); genuinely novel junk usually
ALSO has a low best dense cosine. Requiring both signals covers each
one's blind spot without retraining. Both knobs ride the request body
(rejection_threshold / rejection_cosine_floor), so one server sweeps the
whole grid.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_gate.py
    python scripts/sweep_gate.py "0.0,0.06" "0.0,0.25,0.3,0.35"
"""

from __future__ import annotations

import json
import sys

from sweep_common import eval_server, run_points

THRESHOLDS = [0.0, 0.06]
COS_FLOORS = [0.0, 0.20, 0.25, 0.30, 0.35]


def main() -> int:
    thresholds = (
        [float(t) for t in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else THRESHOLDS
    )
    floors = (
        [float(t) for t in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else COS_FLOORS
    )
    points = [
        (
            f"thr{t:g}_cos{c:g}".replace(".", "p"),
            {"rejection_threshold": t, "rejection_cosine_floor": c},
        )
        for t in thresholds
        for c in floors
    ]
    with eval_server("sweep_gate_") as (base, gt, work):
        results = run_points(base, gt, work, points)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
