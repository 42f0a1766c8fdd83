"""Offline grid search of the FULL serving rejection gate on the dev
split: per-candidate judge threshold x query-level judge floor x joint
unseen-term gate (mass, cosine ceiling) — exact engine semantics, exact
eval contract, no server, no TPU.

Uses the cached dev retrieval heads (exp_judge_dev.py; top-15 per query
with initial/embedding scores + the engine's unseen-term mass) and one
judge forward over all (query, candidate) prompts. Then every gate
config is a few numpy masks:

  engine: query empty if (mass >= a AND best_emb <= b)
                      or (q_floor > 0 and max yes-p < q_floor);
          else drop candidates with yes-p < thr; return top-5 survivors.
  eval  : junk success  = no returned result with emb >= 0.3
          gold hit      = any returned result's doc matches a gold doc
                          (page tolerance 15 >= doc page span: doc-level)

Prints the Pareto set over (hit, rejection). DEV ONLY — held-out stays
report-only.

    RERANKER_WEIGHTS=... PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/exp_gate_grid.py
"""

from __future__ import annotations

import os
import pickle


def main() -> None:
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from exp_judge_dev import CACHE, _heads

    heads = _heads()
    nq = len(heads)
    K = max(len(h[3]) for h in heads)
    print(f"{nq} dev queries (cache: {os.path.basename(CACHE)})")

    from rust_local_rag_tpu.models.reranker_service import (
        RerankerCandidate,
        build_default_reranker,
    )

    os.environ.setdefault("RAG_TPU_RERANK_MODEL", "tpu-reranker")
    rr = build_default_reranker()
    assert rr is not None, "no reranker (set RERANKER_WEIGHTS)"

    prompts = []
    for query, is_rej, gold, head, um in heads:
        for text, doc, page, section, initial, emb in head:
            prompts.append(
                rr.build_prompt(
                    query,
                    RerankerCandidate(
                        chunk_id="", document=doc, text=text,
                        page_number=page, section=section,
                        initial_score=initial,
                    ),
                )
            )
    print(f"scoring {len(prompts)} prompts...", flush=True)
    scored = rr.score_prompts(prompts)

    yes = np.zeros((nq, K))
    emb = np.zeros((nq, K))
    valid = np.zeros((nq, K), dtype=bool)
    is_gold_doc = np.zeros((nq, K), dtype=bool)
    mass = np.zeros(nq)
    is_junk = np.zeros(nq, dtype=bool)
    k = 0
    for qi, (query, is_rej, gold, head, um) in enumerate(heads):
        mass[qi] = um
        is_junk[qi] = is_rej
        for r, (text, doc, page, section, initial, e) in enumerate(head):
            yes[qi, r] = scored[k][0]
            emb[qi, r] = e
            valid[qi, r] = True
            is_gold_doc[qi, r] = any(g["document"] == doc for g in gold)
            k += 1

    best_emb = np.max(np.where(valid, emb, -np.inf), axis=1)
    qmax_yes = np.max(np.where(valid, yes, -np.inf), axis=1)

    def run(thr, qf, a, b, c=0.0):
        killed = np.zeros(nq, dtype=bool)
        if a > 0:
            um_kill = (mass >= a) & (best_emb <= b)
            if c > 0:
                # 3-way rule: the unseen gate only fires when the judge
                # ALSO found no confident yes anywhere in the head —
                # paraphrase gold carries novel wording (high mass) and
                # middling cosine, but the judge still recognizes its
                # gold passage; junk fails all three signals at once
                um_kill &= qmax_yes <= c
            killed |= um_kill
        if qf > 0:
            killed |= qmax_yes < qf
        keep = valid & (yes >= thr) & ~killed[:, None]
        top5 = np.zeros((nq, K), dtype=bool)
        # survivors keep device order; take first 5 kept per row
        csum = np.cumsum(keep, axis=1)
        top5 = keep & (csum <= 5)
        hit = float(
            np.mean(np.any(top5 & is_gold_doc, axis=1)[~is_junk])
        )
        confident = top5 & (emb >= 0.3)
        rej = float(np.mean(~np.any(confident, axis=1)[is_junk]))
        return hit, rej

    grid = []
    for thr in (0.0, 0.02, 0.03, 0.045, 0.06):
        for qf in (0.0, 0.03, 0.045, 0.06, 0.08, 0.1, 0.15):
            for a in (
                0.0, 0.30, 0.33, 0.36, 0.38, 0.40, 0.42, 0.45, 0.50,
                0.55, 0.60, 0.70,
            ):
                for b in (0.50, 0.55, 0.60, 0.65) if a > 0 else (1.0,):
                    for c in (
                        (0.0, 0.06, 0.10, 0.15, 0.20, 0.30)
                        if a > 0
                        else (0.0,)
                    ):
                        hit, rej = run(thr, qf, a, b, c)
                        grid.append((hit, rej, thr, qf, a, b, c))

    passing = [g for g in grid if g[0] >= 0.80 and g[1] >= 0.80]
    print(f"\n{len(passing)} configs pass hit>=0.80 AND rejection>=0.80")
    for hit, rej, thr, qf, a, b, c in sorted(
        passing, key=lambda g: (-(g[0] + g[1]), -g[0])
    )[:20]:
        print(
            f"  hit {hit:.3f} rej {rej:.3f}  thr={thr:g} qf={qf:g} "
            f"unseen=({a:g},{b:g},judge<={c:g})"
        )
    print("\npareto frontier (all configs):")
    seen_best = -1.0
    for hit, rej, thr, qf, a, b, c in sorted(grid, key=lambda g: -g[0]):
        if rej > seen_best:
            seen_best = rej
            print(
                f"  hit {hit:.3f} rej {rej:.3f}  thr={thr:g} qf={qf:g} "
                f"unseen=({a:g},{b:g},judge<={c:g})"
            )


if __name__ == "__main__":
    main()
