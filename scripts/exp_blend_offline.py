"""Offline blend sweep on the cached dev heads: does ANY reranker blend
weight > 0 beat weight 0 on hit/MRR with the judge at RERANKER_WEIGHTS?

Replays _blend_and_fill exactly (per-query max normalization, blended =
w * rerank_norm + (1 - w) * initial_norm, descending sort, top-5) and
scores doc-level hit@5 / MRR@5 over the 153 dev retrieval queries — the
same question VERDICT r4 item 3 asks the live sweep, at CPU cost.

    RERANKER_WEIGHTS=.staging/reranker_v15.safetensors \
        PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/exp_blend_offline.py
"""

from __future__ import annotations

import os


def main() -> None:
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from exp_judge_dev import _heads

    heads = [h for h in _heads() if not h[1]]  # retrieval queries only
    nq = len(heads)
    K = max(len(h[3]) for h in heads)
    print(f"{nq} dev retrieval queries")

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

    yes = np.full((nq, K), -np.inf)
    init = np.full((nq, K), -np.inf)
    gold_doc = np.zeros((nq, K), dtype=bool)
    k = 0
    for qi, (query, is_rej, gold, head, um) in enumerate(heads):
        for r, (text, doc, page, section, initial, e) in enumerate(head):
            yes[qi, r] = scored[k][0]
            init[qi, r] = initial
            gold_doc[qi, r] = any(g["document"] == doc for g in gold)
            k += 1

    eps = 1.1920929e-07
    valid = np.isfinite(init)
    max_rr = np.maximum(np.max(np.where(valid, yes, 0.0), axis=1), eps)
    max_in = np.maximum(np.max(np.where(valid, init, 0.0), axis=1), eps)

    def metrics(w):
        blended = np.where(
            valid,
            w * (yes / max_rr[:, None])
            + (1.0 - w) * (init / max_in[:, None]),
            -np.inf,
        )
        order = np.argsort(-blended, axis=1, kind="stable")
        g5 = np.take_along_axis(gold_doc, order[:, :5], axis=1)
        hit = float(np.mean(np.any(g5, axis=1)))
        first = np.argmax(g5, axis=1)
        has = np.any(g5, axis=1)
        mrr = float(np.mean(np.where(has, 1.0 / (first + 1), 0.0)))
        return hit, mrr

    print("\n  w    hit@5   mrr@5")
    for w in (0.0, 0.05, 0.1, 0.15, 0.2, 0.25, 0.35, 0.5, 0.7, 1.0):
        hit, mrr = metrics(w)
        print(f"  {w:4.2f}  {hit:.3f}  {mrr:.3f}")


if __name__ == "__main__":
    main()
