"""Blend sweep harness: boots one server with the current env (point
RERANKER_WEIGHTS at a staged checkpoint to validate a new judge) and
evaluates the listed rerank-blend points on the 50-query dev eval.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_blend.py
    # custom points: comma-separated reranker weights; "off" = reranker
    # disabled control; 0.0 = judge runs as the rejection gate only
    python scripts/sweep_blend.py "off,0.0,0.05,0.1"

SWEEP_KEEP=1 preserves per-query reports.
"""

from __future__ import annotations

import json
import sys

from sweep_common import eval_server, run_points


def main() -> int:
    if len(sys.argv) > 1:
        points = []
        for tok_w in sys.argv[1].split(","):
            if tok_w == "off":
                points.append(("rr_off", {"use_reranker": False}))
            else:
                w = float(tok_w)
                points.append((
                    f"rr_{tok_w}",
                    {"weights": {"reranker": w, "initial": 1.0 - w}},
                ))
    else:
        points = [
            ("rr_off", {"use_reranker": False}),
            ("rr_0.5", {"weights": {"reranker": 0.5, "initial": 0.5}}),
            ("rr_0.35", {"weights": {"reranker": 0.35, "initial": 0.65}}),
            ("rr_0.25", {"weights": {"reranker": 0.25, "initial": 0.75}}),
            ("rr_0.7", {"weights": {"reranker": 0.7, "initial": 0.3}}),
        ]
    with eval_server("sweep_blend_") as (base, gt, work):
        results = run_points(base, gt, work, points)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
