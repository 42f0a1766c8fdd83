"""JOINT out-of-domain rule: IDF-weighted unseen-term mass x best dense cosine.

Round-5 measurement. Neither marginal separates the scaled dev split's junk
from gold (exp_query_cosine_floor.py: cosine overlaps; unseen mass alone
kills paraphrase gold). Hypothesis: the two signals fail on DIFFERENT
queries — paraphrase gold carries novel wording (high unseen mass) but the
trained encoder still places it near its passage (good cosine), while junk
has novel wording AND no passage to be near. Scan the joint rule
    reject if unseen_mass >= a AND best_cos <= b
over the dev split and print the (a, b) frontier.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_joint_ood.py
"""

from __future__ import annotations

import glob
import json
import math
import os
import tempfile


def main() -> None:
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    work = tempfile.mkdtemp(prefix="joint_ood_")
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
    from rust_local_rag_tpu.ops.bm25 import tokenize

    svc = build_default_service()
    svc.verify()
    eng = RagEngine(os.path.join(work, "data"), svc, reranker=None)
    for f in sorted(glob.glob(os.path.join(docs, "*.pdf"))):
        eng.add_document(os.path.basename(f), open(f, "rb").read())
    print("chunks:", len(eng.store), flush=True)

    # document frequency over the INDEXED chunks (what serving would see)
    import collections

    df: collections.Counter = collections.Counter()
    texts = [m.text for _, m in eng.store.iter_meta()]
    for t in texts:
        for tok in set(tokenize(t)):
            df[tok] += 1
    N = len(texts)
    idf_max = math.log((N + 0.5) / 0.5)

    def unseen_mass(q: str) -> float:
        num = den = 0.0
        for t in set(tokenize(q)):
            d = df.get(t, 0)
            idf = (
                max(math.log((N - d + 0.5) / (d + 0.5)), 0.0)
                if d
                else idf_max
            )
            den += idf
            if d == 0:
                num += idf
        return num / den if den else 0.0

    queries = [json.loads(line) for line in open(gt_path)]
    gold = [q for q in queries if not q.get("is_rejection")]
    junk = [q for q in queries if q.get("is_rejection")]

    def feats(qs):
        cos, mass = [], []
        for i in range(0, len(qs), 32):
            batch = [q["query"] for q in qs[i : i + 32]]
            res = eng.search_batch(batch, 15, use_reranker=False)
            for r in res:
                cos.append(
                    max((x.embedding_score or 0.0) for x in r) if r else 0.0
                )
        for q in qs:
            mass.append(unseen_mass(q["query"]))
        return np.array(mass), np.array(cos)

    gm, gc = feats(gold)
    jm, jc = feats(junk)

    print("\njoint frontier (reject if mass>=a AND cos<=b):")
    best = []
    for a in np.arange(0.10, 0.55, 0.025):
        for b in np.arange(0.30, 0.55, 0.01):
            jr = float(np.mean((jm >= a) & (jc <= b)))
            gk = float(np.mean((gm >= a) & (gc <= b)))
            if jr >= 0.8:
                best.append((gk, -jr, round(float(a), 3), round(float(b), 2)))
    for gk, njr, a, b in sorted(best)[:15]:
        print(f"  a={a} b={b}: junk-reject {-njr:.3f} gold-killed {gk:.3f}")
    if not best:
        print("  (no cell reaches junk-reject >= 0.8)")
    print("\nper-junk-query (mass, cos):")
    for q, m, c in zip(junk, jm, jc):
        print(f"  {m:.3f} {c:.3f} {q['query'][:60]}")
    print("gold in danger zone (mass>=0.25 and cos<=0.5):")
    for q, m, c in zip(gold, gm, gc):
        if m >= 0.25 and c <= 0.5:
            print(f"  {m:.3f} {c:.3f} {q['query'][:60]}")


if __name__ == "__main__":
    main()
