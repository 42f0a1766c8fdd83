"""Can ANY dense-cosine floor separate junk queries from gold queries?

Round-5 measurement behind a design decision. VERDICT r4 proposed enabling
the engine's cosine floors in baseline.yaml ("novel junk usually has a low
best cosine"). This script measures the actual distributions over the
scaled dev split with the committed v4 encoder, CPU-only (no server):

    GOLD best-cos: min 0.135  p5 0.239  p25 0.317  med 0.374
    JUNK best-cos: med 0.340  p75 0.400  p90 0.445  max 0.551
    floor 0.44: gold-pass 0.255  junk-reject 0.867
    floor 0.46: gold-pass 0.203  junk-reject 0.933

The distributions fully overlap — the junk MEDIAN (0.340) sits near the
gold median (0.374). No floor, per-candidate or query-level, reaches
rejection >= 0.8 without dropping gold hit below ~0.26 (the live sweep
scripts/sweep_gate.py confirmed the same through the server: hit 0.17 @
cos 0.44). The per-candidate floors stay in the engine as REQUEST-level
knobs, but the committed gate cannot ride cosine; junk separation must
come from the judge (training/train_reranker.py v11/v12 recipe: junk
queries paired with their own retrieved passages, ood-hard checkpoint
selection). embedding_only's "rejection 0.933" is an artifact of the
asymmetric eval contract (the confidence cut applies ONLY to rejection
queries), not evidence of an engine-usable signal — the reference's
contract is that the ENGINE returns nothing (eval_runner.py:227-233).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_query_cosine_floor.py
"""

from __future__ import annotations

import glob
import json
import os
import tempfile


def main() -> None:
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    work = tempfile.mkdtemp(prefix="qcos_")
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
    gold = [q for q in queries if not q.get("is_rejection")]
    junk = [q for q in queries if q.get("is_rejection")]

    def best_cos(qs):
        out = []
        for i in range(0, len(qs), 32):
            batch = [q["query"] for q in qs[i:i + 32]]
            res = eng.search_batch(batch, 15, use_reranker=False)
            for r in res:
                out.append(
                    max((x.embedding_score or 0.0) for x in r) if r else 0.0
                )
        return np.array(out)

    g, j = best_cos(gold), best_cos(junk)
    print("GOLD best-cos: min %.3f p5 %.3f p10 %.3f p25 %.3f med %.3f"
          % (g.min(), *np.percentile(g, [5, 10, 25, 50])))
    print("JUNK best-cos: med %.3f p75 %.3f p90 %.3f max %.3f"
          % (np.percentile(j, 50), np.percentile(j, 75),
             np.percentile(j, 90), j.max()))
    for f in (0.40, 0.42, 0.44, 0.46, 0.48, 0.50):
        print(f"floor {f}: gold-pass {(g >= f).mean():.3f} "
              f"junk-reject {(j < f).mean():.3f}")


if __name__ == "__main__":
    main()
