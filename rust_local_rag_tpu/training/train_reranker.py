"""Yes/no reranker training.

Teaches the causal decoder (models/reranker.py) to answer the serving
prompt (reranker_service.DEFAULT_PROMPT_TEMPLATE — same template at
training and serving) with "yes" for a (query, passage) pair mined from
the same paragraph and "no" for a mismatched one.

Two lessons are baked in from round-2 measurements:

* Negatives must match the serving pool. A v1 classifier trained on
  mostly-random negatives reached 0.85 held-out accuracy yet DROPPED
  end-to-end hit@5 from 0.73 to 0.31 — everything the first stage
  retrieves is "related", so a random-negative classifier saturates and
  its noise dominates the rerank blend. Negatives here are mined from a
  BM25 index over the corpus: the top lexical hits for the query that do
  NOT come from the source paragraph — the keyword-trap case the serving
  pool is full of.
* Dense-mined negatives did NOT transfer (v3 negative result): mixing
  neighbors mined by the committed dense encoder 50/50 with the BM25
  table lifted held-out pair accuracy (0.844 peak vs v2's 0.842 on
  HARDER pairs) yet lost end-to-end — best blend 0.800 hit / 0.643 mrr
  vs v2's 0.800 / 0.678, with the higher-confidence judge degrading
  fast above 0.25 blend weight (0.7 -> 0.467 hit). The dense neighbors
  are often near-duplicates of the source paragraph, so "no" supervision
  on them teaches the judge to reject passages that LOOK like serving
  positives. --dense-negatives stays available but defaults to off.
  Re-confirmed (v4 negative result): after the near-duplicate filter was
  added and the mining encoder upgraded to the v4 hard-negative asset, a
  6k-step --dense-negatives=on run still lost end-to-end — 0.778 hit /
  0.637 mrr vs the shipped v3b's 0.844 / 0.686 at the same 0.35 blend,
  despite 0.846 held-out pair accuracy. The filter (cosine > 0.9 cut) is
  not sufficient: paraphrase-level near-positives below the cut still
  dominate the mined set. BM25-only negatives remain the recipe.
  Re-re-confirmed (v5 negative result, RocketQA denoise): judging every
  mined neighbor with the committed cross-encoder and dropping confident
  "yes" verdicts (46.8% dropped) STILL lost end-to-end — best blend 0.25
  gave 0.822 hit / 0.637 mrr vs v3b's 0.844 / 0.686, with 0.35 down at
  0.800 / 0.620 — despite the best held-out pair acc yet (0.863 / 0.782
  cls). Held-out pair accuracy on mined pairs consistently fails to
  predict end-to-end value; dense-mined negatives are retired for the
  judge regardless of filtering.
* Ranking needs a pairwise objective. Each example scores the positive
  and the mined negative under the same query, and the loss combines
  binary CE on each yes/no margin (absolute calibration, same read-out as
  serving: logits[yes] vs logits[no]) with a pairwise logistic term on
  the margin DIFFERENCE (ordering).
* The CLEAN judge is a filter, not a blender (v7 lesson). Every pre-fix
  judge shipped with a scrambled lm_head (models/checkpoint.py
  non-contiguous save bug), so the historical 0.35/0.25 blend optima were
  measured on noise-calibrated scores. Judges saved through the fixed
  path (v7 = BM25 negatives + --ood-frac 0.15; v8 = 0.05) LOSE at every
  blend weight > 0 — trained on verbatim crop queries, they are
  confidently wrong on paraphrase queries — but WIN as the engine
  rejection floor over the retrieval_top_k pool: dev 0.889 hit / 0.740
  mrr / 1.0 rejection at threshold 0.06 with reranker weight 0.0, vs
  0.822 / 0.678 reranker-off. Rejection is robust across thresholds
  0.03-0.12 (junk yes-p ~0.000 on template junk); real-world junk
  transfers partially (held-out rejection 0.4 -> 0.6). A v9 run with the
  widened class-level banks (training/ood.py expansion) matched v7's dev
  hit at its own optimum (0.889 @ threshold 0.045) but with lower mrr
  (0.695 vs 0.740), so v7 stays committed; the wider banks remain the
  default data for future runs.
* Junk "no" pairs must be RETRIEVED pairs, not random ones (v10 → v11
  lesson, round 4). The serving rejection floor scores the junk query
  against its TOP-RETRIEVED chunks — the most attractive passages in the
  corpus — while the v7–v10 recipes paired junk with RANDOM passages. The
  v10 run (merged far+near banks, random pairing) probed perfectly in
  training (ood yes-p mean 0.017) yet on the dev rejection queries its
  yes-p on retrieved chunks reached 0.90 with median 0.578 — fully
  overlapping real queries. --junk-hard-frac pairs junk queries with
  their own BM25+dense-mined neighbors (mining.mine_junk_neighbors), and
  the ood-HARD probe (reserved junk templates x their retrieved held-out
  passages) joins checkpoint selection, because ranking and junk-leak
  trade off over training steps: the v11 run read ood-hard 0.000/0.002 at
  step 1600 but 0.125 mean / 1.0 max by step 4800, and the leaked
  checkpoint reproduced the overlap on dev (junk yes-p median 0.733).
* Junk must be UNMEMORIZABLE (v13 -> v14 lesson, round 5). The v13 run
  (junk-hard + paraphrase 0.5, template junk only) showed the leak-vs-
  steps trade is a DATA artifact: the template banks hold ~200 unique
  junk queries, the model memorizes them mid-run, and the held-template
  probe leak then GROWS (qmax mean 0.089 @1600 -> 0.296 @6000), forcing
  selection onto an undertrained step-1600 checkpoint whose gold
  calibration is too weak to gate with (dev sweep: hit 0.778 at every
  threshold vs v7's 0.876 — the gate prunes gold). --junk-doc-frac
  replaces half the junk pool with crop/paraphrase queries drawn from
  JUNK_HOLDOUT_PACKAGES prose (training/corpus.py): real technical
  questions the corpus cannot answer, in unlimited variety and in the
  SAME style as gold queries, so the only learnable separator is
  answerability itself. A doc-junk probe (reserved holdout paragraphs)
  joins selection; the WORST register's leak counts.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional, Tuple

import numpy as np

from rust_local_rag_tpu.training.mining import mine_dense_neighbors  # noqa: F401 (re-export; the function moved to mining.py)


def _default_out() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "reranker.safetensors",
    )


class PromptPairBatcher:
    """(positive prompt, mined-negative prompt) pair batches."""

    def __init__(
        self,
        paragraphs: List[str],
        tokenizer,
        template: str,
        seq_len: int = 192,
        seed: int = 0,
        index_size: int = 50000,
        random_negative_frac: float = 0.2,
        dense_neighbors: Optional[np.ndarray] = None,
        ood_frac: float = 0.0,
        junk_hard_frac: float = 0.5,
        paraphrase_frac: float = 0.0,
        junk_pool: Optional[List[str]] = None,
    ):
        self.rng = np.random.default_rng(seed)
        self.seq_len = seq_len
        self._doc_pool: List[str] = []
        self.tk = tokenizer._tok
        self.cls_id = self.tk.token_to_id("[CLS]")
        self.sep_id = self.tk.token_to_id("[SEP]")
        self.pad_id = self.tk.token_to_id("[PAD]")
        self.random_frac = random_negative_frac
        self.paragraphs = [p for p in paragraphs if len(p.split()) >= 16]
        self.template = template
        # BM25 index over a corpus sample for serving-pool-like negatives.
        # Live per-example scoring is far too slow (a Python BM25 query is
        # ~60 ms; 6k steps x 256 pairs would take >24 h of host time), so
        # neighbors are PRE-MINED here once: each paragraph gets the top
        # lexical hits for a canonical query crop drawn from the same
        # distribution the trainer samples live. The live crop differs from
        # the mining crop, but the neighbor is still the keyword-trap case —
        # crops share the paragraph's vocabulary.
        from rust_local_rag_tpu.ops.native_bm25 import make_lexical_index

        bm25 = make_lexical_index()
        sample = self.rng.permutation(len(self.paragraphs))[:index_size]
        self.indexed = [int(i) for i in sample]
        for i in self.indexed:
            bm25.add_chunk(str(i), self.paragraphs[i])
        self.neighbors = self._premine(bm25)
        # optional second neighbor table mined by the TRAINED dense
        # encoder (v3 recipe): dense near-misses are the failure mode the
        # hybrid first stage actually surfaces — semantically adjacent
        # paragraphs BM25 would rank low. Rows align with `paragraphs`
        # (filtered), -1 padded.
        self.dense_neighbors = dense_neighbors
        # far-out-of-domain junk queries as "no" supervision (training/
        # ood.py): calibrates the absolute yes-probability the engine's
        # rejection_threshold gates on
        self.ood_frac = ood_frac
        self.junk_hard_frac = junk_hard_frac
        self._junk: List[str] = []
        self._junk_neighbors = None
        if ood_frac > 0:
            if junk_pool is not None:
                # caller-assembled mix (template banks + document-derived
                # junk, --junk-doc-frac)
                self._junk = list(junk_pool)
            else:
                from rust_local_rag_tpu.training.ood import junk_queries

                self._junk = junk_queries(4096, seed=seed)
            if junk_hard_frac > 0:
                # v11 recipe: a junk "no" pair must look like what the
                # serving gate actually scores — the junk query's TOP
                # RETRIEVED passages, not a random one (mining.py
                # mine_junk_neighbors rationale). Mined over the same
                # indexed pool the BM25 negative premine uses.
                from rust_local_rag_tpu.training.mining import (
                    mine_junk_neighbors,
                )

                # Mine as WIDE as the serving exposure: the gate scores
                # the junk query against every candidate in the retrieved
                # head, and the v12 diagnostic showed the leak lives in
                # the mid-tail — training only on the top-4 neighbors left
                # ranks 5-15 unseen (per-query max yes-p over 15 mined
                # candidates read ~0.7 while the trained top pairs read
                # ~0.02). 7 BM25 + 8 dense ≈ one serving head.
                self._junk_neighbors = mine_junk_neighbors(
                    self._junk, self.paragraphs, pool=self.indexed,
                    n_bm25=7, n_dense=8,
                )
        # paraphrase the POSITIVE query with this probability so the judge
        # stops keying on verbatim overlap (VERDICT r2 missing #3: crop
        # queries != paraphrase serving queries; the v7/v8 judges lost at
        # every blend weight > 0 because of exactly this gap)
        self.paraphrase_frac = paraphrase_frac

    def _premine(self, bm25, n_neighbors: int = 4, threads: int = 8):
        """[P, n_neighbors] int32 neighbor table; -1 = no mined hit.

        Threaded: the native BM25 score path releases the GIL inside the
        C call and is read-only on the index (native/lexical.cpp
        score_tokens builds only kernel-local state).
        """
        import hashlib
        from concurrent.futures import ThreadPoolExecutor

        # ~25 min of single-core host time at 180k paragraphs: cache the
        # table on disk keyed by (corpus, params, rng position) — the rng
        # state at entry covers both the seed and the index-sample draw
        # (same recipe as training/pairs.py premine_hard_negatives)
        h = hashlib.sha256()
        h.update(f"rr|{n_neighbors}|".encode())
        h.update(str(self.rng.bit_generator.state).encode())
        for t in self.paragraphs:
            h.update(t.encode())
            h.update(b"\0")
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "rag_tpu_premine",
            h.hexdigest()[:24] + ".npy",
        )
        if os.path.exists(cache):
            self.rng.integers(2**31)  # keep the rng stream identical
            print(f"premine cache hit: {cache}")
            return np.load(cache)

        n = len(self.paragraphs)
        out = np.full((n, n_neighbors), -1, dtype=np.int32)
        crop_rng = np.random.default_rng(self.rng.integers(2**31))
        crops = []
        for p in self.paragraphs:
            words = p.split()
            qlen = int(crop_rng.integers(3, 13))
            start = int(crop_rng.integers(0, max(len(words) - qlen, 1)))
            crops.append(" ".join(words[start : start + qlen]))

        def mine(span):
            lo, hi = span
            for i in range(lo, hi):
                hits = bm25.score(crops[i], n_neighbors + 1)
                cands = [int(c) for c, _ in hits if int(c) != i]
                out[i, : len(cands[:n_neighbors])] = cands[:n_neighbors]

        step = (n + threads - 1) // threads
        spans = [(lo, min(lo + step, n)) for lo in range(0, n, step)]
        t0 = time.monotonic()
        with ThreadPoolExecutor(threads) as ex:
            list(ex.map(mine, spans))
        print(
            f"pre-mined {n} paragraphs x {n_neighbors} BM25 negatives "
            f"in {time.monotonic() - t0:.1f}s"
        )
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = cache + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, out)
        os.replace(tmp, cache)
        return out

    def _query_and_passage(self, para: str) -> Tuple[str, str]:
        words = para.split()
        qlen = int(self.rng.integers(3, 13))
        start = int(self.rng.integers(0, max(len(words) - qlen, 1)))
        q = " ".join(words[start : start + qlen])
        paraphrased = (
            self.paraphrase_frac > 0
            and self.rng.random() < self.paraphrase_frac
        )
        if paraphrased:
            from rust_local_rag_tpu.training.paraphrase import paraphrase

            q = paraphrase(q, self.rng)
        if paraphrased or self.rng.random() < 0.2:
            # paraphrased queries keep the FULL passage: span removal
            # exists to defeat copy-matching, which the rewrite already
            # breaks — and the serving passage always contains its answer
            passage = para
        else:
            passage = " ".join(words[:start] + words[start + qlen :])
        return q, passage

    def _mined_negative(self, query: str, avoid: int) -> str:
        """Pre-mined BM25 neighbor of the source paragraph — the
        lexically-attractive wrong answer the reranker must demote."""
        n = len(self.paragraphs)
        if self.rng.random() > self.random_frac:
            row = self.neighbors[avoid]
            if (
                self.dense_neighbors is not None
                and self.rng.random() < 0.5
            ):
                row = self.dense_neighbors[avoid]
            cands = row[(row >= 0) & (row != avoid)]
            if cands.size:
                return self.paragraphs[
                    int(cands[int(self.rng.integers(0, cands.size))])
                ]
        j = int(self.rng.integers(0, n))
        if j == avoid:
            j = (j + 1) % n
        return self.paragraphs[j]

    def _prompt(self, q: str, text: str) -> str:
        """Field-RANDOMIZED prompt: serving fills {document}/{page} with the
        real file name and page (reranker_service.build_prompt), and the r4
        diagnosis showed a judge trained on constant fields keys on the
        unfamiliar names — junk max yes-p on the dev corpus read mean 0.56
        with real fields vs 0.28 with the training constants. Randomizing
        the fields trains the judge to be invariant to them, so relevance
        comes from the query/text pair alone."""
        if not self._doc_pool:
            words = sorted(
                {
                    w
                    for p in self.paragraphs[:2000]
                    for w in p.lower().split()
                    if 4 <= len(w) <= 12 and w.isalpha()
                }
            )
            pool_rng = np.random.default_rng(12345)
            self._doc_pool = [
                f"{words[int(pool_rng.integers(0, len(words)))]}_"
                f"{words[int(pool_rng.integers(0, len(words)))]}.pdf"
                for _ in range(256)
            ] or ["corpus.pdf"]
        doc = self._doc_pool[int(self.rng.integers(0, len(self._doc_pool)))]
        # serving maps page_number 0 -> "unknown"; train on both forms
        page = (
            "unknown"
            if self.rng.random() < 0.1
            else str(int(self.rng.integers(1, 40)))
        )
        return self.template.format(
            query=q, document=doc, page=page, section="N/A", text=text
        )

    def _encode(self, prompts: List[str]):
        # keep the prompt TAIL when truncating: the yes/no question and
        # "Answer:" cue must stay at the end. Shared with the serving
        # encoder (models/tokenizer.headtail_pack) so train and serve can
        # never drift again — the r4 rejection leak was exactly that drift.
        from rust_local_rag_tpu.models.tokenizer import headtail_pack

        rows = [e.ids for e in self.tk.encode_batch(prompts)]
        return headtail_pack(rows, self.seq_len, self.pad_id)

    def batch(self, batch_size: int):
        """-> (pos_ids, pos_mask, neg_ids, neg_mask), each [B, L]: the SAME
        query against its source passage and a mined negative."""
        pos_prompts, neg_prompts = [], []
        n = len(self.paragraphs)
        for _ in range(batch_size):
            i = int(self.rng.integers(0, n))
            q, passage = self._query_and_passage(self.paragraphs[i])
            pos_prompts.append(self._prompt(q, passage))
            if self._junk and self.rng.random() < self.ood_frac:
                # junk query against ANY corpus passage is a "no": the
                # pairwise term still orders pos(q+) above it, and the BCE
                # term drives the absolute yes-probability toward 0 —
                # which is what the engine's rejection floor reads
                jqi = int(self.rng.integers(0, len(self._junk)))
                jq = self._junk[jqi]
                j = int(self.rng.integers(0, n))
                if (
                    self._junk_neighbors is not None
                    and self.rng.random() < self.junk_hard_frac
                ):
                    # HARD junk pair: the passage retrieval would surface
                    # for this junk query (BM25 + dense mined) — the pair
                    # the serving rejection floor actually scores
                    row = self._junk_neighbors[jqi]
                    cands = row[row >= 0]
                    if cands.size:
                        j = int(cands[int(self.rng.integers(0, cands.size))])
                neg_prompts.append(self._prompt(jq, self.paragraphs[j]))
            else:
                neg_prompts.append(
                    self._prompt(q, self._mined_negative(q, i))
                )
        pi, pm = self._encode(pos_prompts)
        ni, nm = self._encode(neg_prompts)
        return pi, pm, ni, nm

    def stacked(self, n_steps: int, batch_size: int):
        cols = [[], [], [], []]
        for _ in range(n_steps):
            for c, arr in zip(cols, self.batch(batch_size)):
                c.append(arr)
        return tuple(np.stack(c) for c in cols)


def _doc_junk_queries(pars: List[str], n: int, seed: int) -> List[str]:
    """Junk queries synthesized from junk-holdout package prose: the same
    crop distribution the positive queries use (3-13 word spans), half of
    them paraphrase/question-framed — so the ONLY difference between a
    junk query and a gold query is whether the corpus can answer it, not
    style. Style-distinguishable junk is what the template banks gave the
    judge, and the judge learned the style instead of the relation."""
    from rust_local_rag_tpu.training.paraphrase import paraphrase

    rng = np.random.default_rng(seed)
    out: List[str] = []
    while len(out) < n and pars:
        p = pars[int(rng.integers(0, len(pars)))]
        words = p.split()
        qlen = int(rng.integers(3, 13))
        start = int(rng.integers(0, max(len(words) - qlen, 1)))
        q = " ".join(words[start : start + qlen])
        if rng.random() < 0.5:
            q = paraphrase(q, rng)
        out.append(q)
    return out


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", help="pre-harvested paragraph file")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--seq-len", type=int, default=192)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--ffn", type=int, default=1024)
    ap.add_argument("--out", default=_default_out())
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--eval-every", type=int, default=1600)
    ap.add_argument("--no-exclude-eval", action="store_true")
    ap.add_argument(
        "--dense-negatives", choices=("auto", "on", "off"), default="off",
        help="mine negatives with the committed dense encoder too; "
        "auto = when the encoder asset exists. Off by default: the v3 "
        "run with dense negatives LOST end-to-end (see module lessons)",
    )
    ap.add_argument(
        "--no-denoise", action="store_true",
        help="skip the RocketQA reranker-denoise pass over dense-mined "
        "negatives (mining.cached_denoised_table). Denoising is the "
        "default because UNdenoised dense negatives lost end-to-end "
        "twice (v3, v4 — see module lessons): the mined set is "
        "dominated by paraphrase-level true answers that a cosine cut "
        "alone cannot remove",
    )
    ap.add_argument(
        "--dense-margin", type=float, default=0.0,
        help="yes/no logit margin above which the committed judge calls "
        "a mined neighbor a false negative and drops it",
    )
    ap.add_argument(
        "--ood-frac", type=float, default=0.0,
        help="fraction of negative prompts whose query is a synthesized "
        "far-out-of-domain factoid (training/ood.py) — calibrates the "
        "absolute yes-probability for the engine's rejection floor",
    )
    ap.add_argument(
        "--junk-hard-frac", type=float, default=0.5,
        help="within the --ood-frac junk draws, fraction paired with the "
        "junk query's own RETRIEVED passages (BM25+dense mined, "
        "mining.mine_junk_neighbors) instead of a random one — the pair "
        "the serving rejection gate actually scores (v11 recipe; 0 "
        "restores the v10-and-earlier random pairing)",
    )
    ap.add_argument(
        "--junk-doc-frac", type=float, default=0.5,
        help="within the --ood-frac junk pool, fraction of junk queries "
        "synthesized as crop/paraphrase queries from JUNK_HOLDOUT_PACKAGES "
        "prose (training/corpus.py) — real technical questions the corpus "
        "genuinely cannot answer, in unlimited variety. The v13 diagnosis: "
        "the ~200-unique template banks are memorized over a 6k-step run, "
        "so the held-template probe leak GROWS with steps; document-derived "
        "junk makes the junk class unmemorizable. 0 restores template-only",
    )
    ap.add_argument(
        "--readme-corpus", type=int, default=1,
        help="1 (default) mixes wheel-README prose (corpus.harvest_readmes) "
        "into the training corpus — the authored-manual register the "
        "docstring harvest lacks and the one serving corpora are written "
        "in; 0 restores the docstring-only corpus",
    )
    ap.add_argument(
        "--paraphrase-frac", type=float, default=0.0,
        help="fraction of positive queries rewritten by "
        "training/paraphrase.py (synonym substitution + question "
        "framing): closes the verbatim-crop vs paraphrase-serving gap "
        "behind the v7/v8 judges losing at every blend weight > 0",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from rust_local_rag_tpu.models.checkpoint import save_params
    from rust_local_rag_tpu.models.reranker import (
        RerankerConfig,
        init_reranker_params,
        reranker_forward_last_logits,
    )
    from rust_local_rag_tpu.models.reranker_service import (
        DEFAULT_PROMPT_TEMPLATE,
    )
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.training.corpus import harvest, load_paragraphs

    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(args.out), "tokenizer.json"
    )
    tokenizer = HfTokenizer(tok_path)

    exclude = None
    if not args.no_exclude_eval:
        try:
            from eval_harness.corpus import passage_hashes

            exclude = passage_hashes()
            print(f"holding out {len(exclude)} eval passages")
        except ImportError:
            pass
    if args.corpus:
        paragraphs = load_paragraphs(args.corpus)
        if exclude:
            from rust_local_rag_tpu.training.corpus import normalized_hash

            paragraphs = [
                p for p in paragraphs if normalized_hash(p) not in exclude
            ]
    else:
        paragraphs = harvest(exclude_hashes=exclude)
    if args.readme_corpus:
        from rust_local_rag_tpu.training.corpus import (
            harvest_readmes,
            normalized_hash,
        )

        readmes = harvest_readmes(
            exclude_hashes=exclude,
            already_seen={normalized_hash(p) for p in paragraphs},
        )
        print(f"+{len(readmes)} readme (authored-style) paragraphs")
        paragraphs = paragraphs + readmes
    print(f"{len(paragraphs)} paragraphs")

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(paragraphs))
    hold_n = min(2048, len(paragraphs) // 10)
    train_pars = [paragraphs[i] for i in order[:-hold_n]]
    held_pars = [paragraphs[i] for i in order[-hold_n:]]

    dense = None
    if args.dense_negatives != "off":
        filtered = [p for p in train_pars if len(p.split()) >= 16]
        if args.no_denoise:
            dense = mine_dense_neighbors(filtered)
        else:
            from rust_local_rag_tpu.training.mining import (
                cached_denoised_table,
            )

            try:
                dense, _ = cached_denoised_table(
                    filtered, margin=args.dense_margin
                )
            except RuntimeError as e:
                # auto mode degrades to BM25-only when assets are missing
                if args.dense_negatives == "on":
                    raise SystemExit(str(e))
                print(f"dense negatives unavailable: {e}")
        if dense is None and args.dense_negatives == "on":
            raise SystemExit("--dense-negatives=on but no encoder asset")

    junk_pool = None
    doc_junk_probe_pars: Optional[List[str]] = None
    if args.ood_frac > 0 and args.junk_doc_frac > 0:
        from rust_local_rag_tpu.training.corpus import (
            JUNK_HOLDOUT_PACKAGES,
            normalized_hash,
        )
        from rust_local_rag_tpu.training.ood import junk_queries

        jpars = harvest(
            packages=list(JUNK_HOLDOUT_PACKAGES),
            exclude_hashes=exclude,
            max_paragraphs=24000,
        )
        train_hashes = {normalized_hash(p) for p in paragraphs}
        jpars = [
            p
            for p in jpars
            if normalized_hash(p) not in train_hashes
            and len(p.split()) >= 16
        ]
        jrng = np.random.default_rng(args.seed + 777)
        jorder = jrng.permutation(len(jpars))
        probe_n = min(512, len(jpars) // 10)
        doc_junk_probe_pars = [jpars[i] for i in jorder[:probe_n]]
        doc_src = [jpars[i] for i in jorder[probe_n:]]
        n_doc = int(4096 * args.junk_doc_frac)
        doc_junk = _doc_junk_queries(doc_src, n_doc, args.seed + 778)
        junk_pool = junk_queries(4096 - n_doc, seed=args.seed) + doc_junk
        print(
            f"doc-junk: {len(doc_src)} holdout paragraphs -> {n_doc} "
            f"train junk queries + {probe_n} probe paragraphs "
            f"({4096 - n_doc} template junk)"
        )

    batcher = PromptPairBatcher(
        train_pars, tokenizer, DEFAULT_PROMPT_TEMPLATE,
        seq_len=args.seq_len, seed=args.seed, dense_neighbors=dense,
        ood_frac=args.ood_frac, junk_hard_frac=args.junk_hard_frac,
        paraphrase_frac=args.paraphrase_frac,
        junk_pool=junk_pool,
    )
    if dense is not None:
        # the dense table was mined over the SAME >=16-word filter the
        # batcher applies — rows must align 1:1
        assert len(batcher.paragraphs) == dense.shape[0], (
            len(batcher.paragraphs), dense.shape)
    held = PromptPairBatcher(
        held_pars, tokenizer, DEFAULT_PROMPT_TEMPLATE,
        seq_len=args.seq_len, seed=args.seed + 1, index_size=10000,
    )
    eval_pi, eval_pm, eval_ni, eval_nm = held.batch(512)
    # paraphrase probe: the SAME held paragraphs but with every positive
    # query rewritten (paraphrase.py) — the serving-register question the
    # verbatim pair-acc metric cannot see
    held_para = PromptPairBatcher(
        held_pars, tokenizer, DEFAULT_PROMPT_TEMPLATE,
        seq_len=args.seq_len, seed=args.seed + 2, index_size=10000,
        paraphrase_frac=1.0,
    )
    para_pi, para_pm, para_ni, para_nm = held_para.batch(512)
    # OOD rejection probe: junk from templates RESERVED out of training
    # (ood.py split="probe" — a seed reshuffle of the training grid would
    # measure memorization, not generalization) against held-out passages;
    # mean yes-probability is the engine rejection floor's operating signal
    ood_ids = ood_mask = None
    oodh_ids = oodh_mask = None
    if args.ood_frac > 0:
        from rust_local_rag_tpu.training.ood import junk_queries

        jrng = np.random.default_rng(999)
        jqs = junk_queries(256, seed=7, split="probe")
        ood_prompts = [
            held._prompt(jq, held.paragraphs[
                int(jrng.integers(0, len(held.paragraphs)))
            ])
            for jq in jqs
        ]
        ood_ids, ood_mask = held._encode(ood_prompts)
        # HARD variant: each probe junk query against its own top
        # RETRIEVED held passage — the serving gate's operating pair.
        # This is the number that predicted v10's dev-rejection failure
        # (random-pair probe read 0.017 while retrieved-pair yes-p on the
        # dev split reached 0.90), so it joins checkpoint selection below.
        from rust_local_rag_tpu.training.mining import mine_junk_neighbors

        jtab = mine_junk_neighbors(
            jqs, held.paragraphs, n_bm25=7, n_dense=8
        )
        oodh_prompts = []
        oodh_qid: List[int] = []
        for r, jq in enumerate(jqs):
            cands = jtab[r][jtab[r] >= 0]
            for j in cands:
                oodh_prompts.append(held._prompt(jq, held.paragraphs[int(j)]))
                oodh_qid.append(r)
        if oodh_prompts:
            oodh_ids, oodh_mask = held._encode(oodh_prompts)
            oodh_qid_arr = np.asarray(oodh_qid)

    # doc-junk HARD probe: crop queries from RESERVED junk-holdout
    # paragraphs (never trained on) against their retrieved held
    # passages — leak here means the judge learned the template banks'
    # style, not the answerability relation
    oodd_ids = oodd_mask = None
    if doc_junk_probe_pars:
        from rust_local_rag_tpu.training.mining import mine_junk_neighbors

        djq = _doc_junk_queries(doc_junk_probe_pars, 192, seed=9991)
        jtab2 = mine_junk_neighbors(
            djq, held.paragraphs, n_bm25=7, n_dense=8
        )
        oodd_prompts = []
        oodd_qid: List[int] = []
        for r, jq in enumerate(djq):
            cands = jtab2[r][jtab2[r] >= 0]
            for j in cands:
                oodd_prompts.append(
                    held._prompt(jq, held.paragraphs[int(j)])
                )
                oodd_qid.append(r)
        if oodd_prompts:
            oodd_ids, oodd_mask = held._encode(oodd_prompts)
            oodd_qid_arr = np.asarray(oodd_qid)

    cfg = RerankerConfig(
        vocab_size=tokenizer.vocab_size,
        dim=args.dim,
        depth=args.depth,
        heads=args.heads,
        ffn_dim=args.ffn,
    )
    params = init_reranker_params(jax.random.PRNGKey(args.seed), cfg)

    # yes/no target ids: first differing wordpiece (same rule as serving)
    def content(word):
        ids = tokenizer.tokenize(word)
        return [i for i in ids if i not in (batcher.cls_id, batcher.sep_id)]

    yes_id, no_id = content("yes")[0], content("no")[0]
    print(f"yes_id={yes_id} no_id={no_id}")

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(schedule, weight_decay=0.01)
    )
    opt_state = tx.init(params)

    def _margins(params, ids, mask):
        # differentiable XLA attention (the Pallas fused kernel has no VJP)
        logits = reranker_forward_last_logits(
            params, ids, mask, cfg, fused_attn=False
        )
        return logits[:, yes_id] - logits[:, no_id]

    def _yes_p_sliced(params, ids, mask, bs: int = 512) -> np.ndarray:
        """yes-probabilities for a large prompt set in fixed-shape slices
        (a single 3.8k x 192 forward would allocate a multi-GB attention
        tensor; fixed slices also keep the compile count at one)."""
        n = ids.shape[0]
        out = np.zeros(n, dtype=np.float32)
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            i = np.zeros((bs, ids.shape[1]), dtype=ids.dtype)
            m = np.zeros((bs, mask.shape[1]), dtype=mask.dtype)
            i[: hi - lo] = ids[lo:hi]
            m[: hi - lo] = mask[lo:hi]
            m[hi - lo :, 0] = 1  # keep padded rows finite
            yp = jax.nn.sigmoid(_margins(params, jnp.asarray(i), jnp.asarray(m)))
            out[lo:hi] = np.asarray(yp)[: hi - lo]
        return out

    def loss_fn(params, pi, pm, ni, nm):
        mp = _margins(params, pi, pm)
        mn = _margins(params, ni, nm)
        pairwise = -jax.nn.log_sigmoid(mp - mn)       # ordering
        cal = -jax.nn.log_sigmoid(mp) - jax.nn.log_sigmoid(-mn)  # calibration
        return jnp.mean(pairwise) + 0.5 * jnp.mean(cal)

    def one_step(carry, xs):
        params, opt_state = carry
        pi, pm, ni, nm = xs
        loss, grads = jax.value_and_grad(loss_fn)(params, pi, pm, ni, nm)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def scan_step(params, opt_state, pi, pm, ni, nm):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (pi, pm, ni, nm)
        )
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def eval_metrics(params, pi, pm, ni, nm):
        mp = _margins(params, pi, pm)
        mn = _margins(params, ni, nm)
        pair_acc = jnp.mean((mp > mn).astype(jnp.float32))
        cls_acc = 0.5 * (
            jnp.mean((mp > 0).astype(jnp.float32))
            + jnp.mean((mn < 0).astype(jnp.float32))
        )
        return pair_acc, cls_acc

    pa, ca = eval_metrics(params, eval_pi, eval_pm, eval_ni, eval_nm)
    ppa, pca = eval_metrics(params, para_pi, para_pm, para_ni, para_nm)
    print(
        f"step 0: held-out pair acc {float(pa):.3f} cls acc {float(ca):.3f} "
        f"| paraphrase pair acc {float(ppa):.3f} cls {float(pca):.3f}"
    )

    best_acc = -1.0
    best_params = None
    best_step = 0
    done = 0
    t0 = time.monotonic()
    while done < args.steps:
        s = min(args.scan, args.steps - done)
        pi, pm, ni, nm = batcher.stacked(s, args.batch)
        if s < args.scan:
            reps = args.scan - s
            pi, pm, ni, nm = (
                np.concatenate([x, x[-1:].repeat(reps, 0)])
                for x in (pi, pm, ni, nm)
            )
        params, opt_state, loss = scan_step(params, opt_state, pi, pm, ni, nm)
        done += args.scan
        if done % max(args.scan * 4, 64) == 0 or done >= args.steps:
            dt = time.monotonic() - t0
            print(
                f"step {done}/{args.steps} loss {float(loss):.4f} "
                f"({done / dt:.1f} steps/s)",
                flush=True,
            )
        if args.eval_every and (
            # fire on CROSSING each eval_every boundary: done advances in
            # --scan increments, so an exact-divisibility test silently
            # skips every intermediate eval (and with it checkpoint
            # selection) when eval_every is not a multiple of scan
            done // args.eval_every > (done - args.scan) // args.eval_every
            or done >= args.steps
        ):
            pa, ca = eval_metrics(params, eval_pi, eval_pm, eval_ni, eval_nm)
            ppa, pca = eval_metrics(
                params, para_pi, para_pm, para_ni, para_nm
            )
            ood_note = ""
            oodh_mean = None
            if ood_ids is not None:
                m = _margins(params, jnp.asarray(ood_ids), jnp.asarray(ood_mask))
                yes_p = jax.nn.sigmoid(m)
                ood_note = (
                    f" ood yes-p mean {float(jnp.mean(yes_p)):.3f} "
                    f"max {float(jnp.max(yes_p)):.3f}"
                )
            if oodh_ids is not None:
                yp = _yes_p_sliced(params, oodh_ids, oodh_mask)
                # serving-relevant statistic: the gate sees the MAX yes-p
                # over each junk query's retrieved head, so a probe mean
                # over pairs underpredicts the leak (v12 lesson: pair mean
                # 0.007 while per-query max median was ~0.7)
                qmax = np.zeros(int(oodh_qid_arr.max()) + 1, dtype=np.float32)
                np.maximum.at(qmax, oodh_qid_arr, yp)
                oodh_mean = float(qmax.mean())
                ood_note += (
                    f" ood-hard qmax mean {oodh_mean:.3f} "
                    f"med {float(np.median(qmax)):.3f} "
                    f"max {float(qmax.max()):.3f}"
                )
            oodd_mean = None
            if oodd_ids is not None:
                yp = _yes_p_sliced(params, oodd_ids, oodd_mask)
                qmax = np.zeros(
                    int(oodd_qid_arr.max()) + 1, dtype=np.float32
                )
                np.maximum.at(qmax, oodd_qid_arr, yp)
                oodd_mean = float(qmax.mean())
                ood_note += (
                    f" doc-junk qmax mean {oodd_mean:.3f} "
                    f"med {float(np.median(qmax)):.3f} "
                    f"max {float(qmax.max()):.3f}"
                )
            print(
                f"step {done}: held-out pair acc {float(pa):.3f} "
                f"cls acc {float(ca):.3f} | paraphrase pair "
                f"{float(ppa):.3f} cls {float(pca):.3f}{ood_note}",
                flush=True,
            )
            # keep the BEST held-out checkpoint, not the final step: the
            # v3 run peaked at 8000/12000 and drifted after. The selection
            # score now includes the paraphrase probe — the serving
            # register the verbatim metric is blind to — and (v11) the
            # HARD OOD probe, because the rejection gate reads the judge's
            # yes-p on retrieved junk pairs and a checkpoint that leaks
            # there is useless however well it orders.
            score = float(pa) + float(ppa) + 0.1 * float(ca)
            if oodh_mean is not None:
                # weight 1.5: measured on the round-4 v11 run, the probe's
                # leak tracks the dev rejection queries' leak superlinearly
                # (probe mean 0.125 at step 4800 -> dev junk yes-p median
                # 0.733; probe 0.000 at 1600 -> clean) and ranking gains
                # of +0.04 pair acc never pay for a dead rejection gate
                score += 1.5 * (1.0 - oodh_mean)
            if oodd_mean is not None:
                # half weight: the doc-junk register (same-style crop
                # queries) is near-unsolvable for this model size and its
                # probe value is NOISY (v14 run: 0.61 -> 0.74 bouncing
                # while the template leak fell 0.19 -> 0.08); at full
                # weight its noise dominates selection and picks an
                # undertrained checkpoint. Its training-data role
                # (unmemorizable junk keeping the template register
                # honest) does not require its probe to drive selection.
                score += 0.5 * (1.0 - oodd_mean)
            if score > best_acc:
                best_acc = score
                best_step = done
                best_params = jax.device_get(params)

    if best_params is None:
        best_params = jax.device_get(params)
        best_step = done
    print(f"saving best checkpoint from step {best_step}")
    save_params(
        best_params,
        args.out,
        metadata={
            "reranker_config": cfg.to_json(),
            "trained_steps": str(best_step),
            # serving reads this to encode judge prompts at the trained
            # length with the trained truncation (models/reranker.py)
            "train_seq_len": str(args.seq_len),
        },
        half=True,
    )
    print(f"wrote {args.out}")

    # post-save verification: reload the file and re-run the probes so a
    # save/load divergence can never ship silently
    from rust_local_rag_tpu.models.encoder import load_safetensors_params
    from rust_local_rag_tpu.models.checkpoint import flatten_params

    reloaded = load_safetensors_params(args.out)
    if os.environ.get("RAG_TPU_SAVE_DEBUG"):
        a = flatten_params(best_params)["lm_head"]
        from safetensors.numpy import load_file as _lf

        b = _lf(args.out)["lm_head"]
        print("DEBUG lm_head best:", a.dtype, a.shape, a.strides,
              a.flags["C_CONTIGUOUS"], np.asarray(a).ravel()[:4])
        print("DEBUG lm_head file:", b.dtype, b.shape,
              np.asarray(b, dtype=np.float32).ravel()[:4])
        np.save("/tmp/lm_head_best.npy", np.asarray(a))
    fa, fb = flatten_params(best_params), flatten_params(reloaded)
    worst = max(
        (float(np.max(np.abs(fa[k].astype(np.float32)
                             - fb[k].astype(np.float32)))), k)
        for k in fa
    )
    print(f"reload max |delta| {worst[0]:.6f} ({worst[1]})")
    pa2, ca2 = eval_metrics(reloaded, eval_pi, eval_pm, eval_ni, eval_nm)
    note2 = ""
    if ood_ids is not None:
        m2 = _margins(reloaded, jnp.asarray(ood_ids), jnp.asarray(ood_mask))
        yp2 = jax.nn.sigmoid(m2)
        note2 = (
            f" ood yes-p mean {float(jnp.mean(yp2)):.3f} "
            f"max {float(jnp.max(yp2)):.3f}"
        )
    if oodh_ids is not None:
        yp2 = _yes_p_sliced(reloaded, oodh_ids, oodh_mask)
        qmax2 = np.zeros(int(oodh_qid_arr.max()) + 1, dtype=np.float32)
        np.maximum.at(qmax2, oodh_qid_arr, yp2)
        note2 += (
            f" ood-hard qmax mean {float(qmax2.mean()):.3f} "
            f"med {float(np.median(qmax2)):.3f} max {float(qmax2.max()):.3f}"
        )
    if oodd_ids is not None:
        yp2 = _yes_p_sliced(reloaded, oodd_ids, oodd_mask)
        qmax2 = np.zeros(int(oodd_qid_arr.max()) + 1, dtype=np.float32)
        np.maximum.at(qmax2, oodd_qid_arr, yp2)
        note2 += (
            f" doc-junk qmax mean {float(qmax2.mean()):.3f} "
            f"med {float(np.median(qmax2)):.3f} max {float(qmax2.max()):.3f}"
        )
    print(
        f"reloaded checkpoint: pair acc {float(pa2):.3f} "
        f"cls acc {float(ca2):.3f}{note2}"
    )


if __name__ == "__main__":
    main()
