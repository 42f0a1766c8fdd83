"""Offline judge evaluation on the dev split, CPU-only: predicts what the
live rejection/blend sweep will see without a server or the TPU.

Builds the engine over the authored eval corpus, fetches each dev query's
top-15 retrieval head ONCE (disk-cached — the CPU corpus embed costs ~13
min; re-scoring a new judge costs ~2), then scores every (query,
candidate) prompt with the judge at RERANKER_WEIGHTS and reports:

  * gold queries: distribution of the TOP-RANKED gold hit's yes-p and of
    the per-query MAX yes-p (what the gate must NOT fall under);
  * junk queries: per-query MAX yes-p (what the gate must stay above);
  * for candidate thresholds: predicted rejection rate and the fraction
    of gold queries whose whole head dies (hit upper-bound loss).

    RERANKER_WEIGHTS=.staging/reranker_v15.safetensors \
        PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_judge_dev.py
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import pickle
import tempfile


CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "rag_tpu_premine", "dev_heads2.pkl"
)


def _heads():
    """[(query, is_rejection, [(chunk_text, doc, page, section, initial,
    emb)])] for the dev split, disk-cached."""
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)

    work = tempfile.mkdtemp(prefix="judge_dev_")
    docs = os.path.join(work, "docs")
    os.makedirs(docs)
    from eval_harness.corpus import generate_corpus, generate_ground_truth

    generate_corpus(docs)
    gt_path = os.path.join(work, "q.jsonl")
    generate_ground_truth(gt_path)

    from rust_local_rag_tpu.engine.rag_engine import RagEngine
    from rust_local_rag_tpu.models.embedding_service import (
        build_default_service,
    )

    svc = build_default_service()
    svc.verify()
    eng = RagEngine(os.path.join(work, "data"), svc, reranker=None)
    for f in sorted(glob.glob(os.path.join(docs, "*.pdf"))):
        eng.add_document(os.path.basename(f), open(f, "rb").read())
    print("chunks:", len(eng.store), flush=True)

    queries = [json.loads(line) for line in open(gt_path)]
    out = []
    for i in range(0, len(queries), 32):
        batch = queries[i : i + 32]
        res = eng.search_batch(
            [q["query"] for q in batch], 15, use_reranker=False
        )
        for q, r in zip(batch, res):
            out.append(
                (
                    q["query"],
                    bool(q.get("is_rejection")),
                    q.get("gold_references") or [],
                    [
                        (
                            x.text,
                            x.document,
                            x.page_number,
                            x.section,
                            x.initial_score,
                            x.embedding_score,
                        )
                        for x in r
                    ],
                    # the engine lexical index's unseen-term mass — the
                    # joint gate's OOD signal at serving accuracy
                    eng.lexical_index.unseen_mass(q["query"]),
                )
            )
    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    with open(CACHE, "wb") as f:
        pickle.dump(out, f)
    return out


def main() -> None:
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    heads = _heads()
    print(f"{len(heads)} dev queries with cached heads")

    from rust_local_rag_tpu.models.reranker_service import (
        RerankerCandidate,
        build_default_reranker,
    )

    os.environ.setdefault("RAG_TPU_RERANK_MODEL", "tpu-reranker")
    rr = build_default_reranker()
    assert rr is not None, "no reranker (set RERANKER_WEIGHTS)"

    prompts, meta = [], []
    for qi, (query, is_rej, gold, head, _um) in enumerate(heads):
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
            meta.append(qi)
    print(f"scoring {len(prompts)} prompts...", flush=True)
    scored = rr.score_prompts(prompts)
    yes_p = np.asarray([s for s, _, _ in scored], dtype=np.float64)
    qid = np.asarray(meta)

    nq = len(heads)
    qmax = np.zeros(nq)
    np.maximum.at(qmax, qid, yes_p)
    # yes-p of each query's best GOLD candidate (page-tolerant doc match)
    gold_best = np.full(nq, -1.0)
    k = 0
    for qi, (query, is_rej, gold, head, _um) in enumerate(heads):
        for text, doc, page, section, initial, emb in head:
            if any(g["document"] == doc for g in gold):
                gold_best[qi] = max(gold_best[qi], yes_p[k])
            k += 1
    is_junk = np.asarray([h[1] for h in heads])

    g, j = qmax[~is_junk], qmax[is_junk]
    gb = gold_best[~is_junk]
    print("\nGOLD per-query MAX yes-p: p5 %.4f p25 %.4f med %.4f" %
          tuple(np.percentile(g, [5, 25, 50])))
    print("GOLD best-gold-candidate yes-p: p5 %.4f p25 %.4f med %.4f" %
          tuple(np.percentile(gb[gb >= 0], [5, 25, 50])))
    print("JUNK per-query MAX yes-p: med %.4f p75 %.4f p90 %.4f max %.4f" %
          (np.median(j), *np.percentile(j, [75, 90]), j.max()))
    print("\nthr: junk-rejected | gold-heads-dead | gold-best-gold-below")
    for thr in (0.02, 0.03, 0.045, 0.06, 0.08, 0.12, 0.2, 0.3):
        print(
            f"  {thr:5.3f}: {float(np.mean(j < thr)):.3f} | "
            f"{float(np.mean(g < thr)):.3f} | "
            f"{float(np.mean((gb >= 0) & (gb < thr))):.3f}"
        )


if __name__ == "__main__":
    main()
