"""Contrastive encoder training driver.

Trains the retrieval encoder (models/encoder.py) from scratch on locally
harvested documentation prose (training/corpus.py) with the Contriever
recipe (training/pairs.py) and saves the committed serving checkpoint
`assets/encoder.safetensors` (f16 storage, architecture config embedded in
the safetensors metadata).

Run on the TPU chip:
    python -m rust_local_rag_tpu.training.train_encoder \
        --corpus .cache/train_corpus.txt --steps 8000

The quality eval's corpus passages are held out of training when
--exclude-eval is set (default): eval_harness.corpus exposes the passage
hashes and training/corpus.harvest drops matching paragraphs.

Encoder v5 negative result (reranker-denoised dense negatives, recorded
2026-08-17): warm-starting the committed v4 asset for 16k steps with
--dense-negatives (the committed judge dropped 53.9% of dense-mined
neighbors as false negatives — confirming the paraphrase-contamination
hypothesis behind the v3/v4 dense-negative failures) moved held-out crop
accuracy only 0.517 -> 0.520 and did NOT transfer as a quality win: dev
eval hit 0.911 (+0.067 over v4) but the held-out test split
(eval_harness/heldout_data.py) regressed to 0.844 hit / 0.721 mrr vs
v4's 0.867 / 0.781, and dev rejection fell 1.0 -> 0.8 (a rejection
query's top ABSOLUTE cosine crossed the eval-side 0.3 floor; the
engine-level reranker-confidence sweep 0.0-0.12 was flat —
scripts/sweep_rejection.py). Net across both 45-query splits the flip
count is +2 with worse mrr/ndcg tails: within-split selection variance
(1 query = 0.022) dominates the apparent dev gain. The v4 asset stays
committed; dense negatives remain off the encoder recipe too.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

import numpy as np


def _default_out() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "encoder.safetensors",
    )


def retrieval_accuracy(params, cfg, bank, batch=256) -> float:
    """Top-1 accuracy of crop-A retrieving crop-B among the bank."""
    import jax.numpy as jnp

    from rust_local_rag_tpu.models.encoder import _jit_forward

    q_ids, q_mask, p_ids, p_mask = bank

    def embed(ids, mask):
        outs = []
        for lo in range(0, ids.shape[0], batch):
            outs.append(
                np.asarray(
                    _jit_forward(
                        params,
                        jnp.asarray(ids[lo : lo + batch]),
                        jnp.asarray(mask[lo : lo + batch]),
                        cfg,
                    )
                )
            )
        return np.concatenate(outs)

    q = embed(q_ids, q_mask)
    p = embed(p_ids, p_mask)
    sims = q @ p.T
    return float((sims.argmax(axis=1) == np.arange(len(q))).mean())


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", help="pre-harvested paragraph file")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=16, help="steps per dispatch")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--weight-decay", type=float, default=0.01)
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--ffn", type=int, default=1408)
    ap.add_argument("--out-dim", type=int, default=768)
    ap.add_argument("--out", default=_default_out())
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument(
        "--objective",
        choices=("mixed", "ict", "symmetric"),
        default="mixed",
        help="mixed = ICT + lead-to-rest + crop pairs with dual task "
        "prefixes (default); ict = short query crop vs source passage; "
        "symmetric = Contriever-style crop pairs",
    )
    ap.add_argument(
        "--init",
        default=None,
        help="warm-start from an existing checkpoint (architecture args "
        "are ignored; the config embedded in the checkpoint wins)",
    )
    ap.add_argument(
        "--hard-negatives",
        action="store_true",
        help="DPR-style explicit hard negatives: each pair additionally "
        "carries a BM25-mined keyword-trap passage (premined once, "
        "train_reranker.py's proven recipe) in the InfoNCE denominator",
    )
    ap.add_argument(
        "--dense-negatives",
        action="store_true",
        help="v5 recipe: ALSO mine negatives with the committed dense "
        "encoder and denoise them with the committed reranker "
        "(training/mining.py); mined negatives then draw 50/50 from the "
        "BM25 and dense tables. Implies --hard-negatives.",
    )
    ap.add_argument(
        "--dense-margin",
        type=float,
        default=0.0,
        help="reranker yes/no logit-margin above which a dense-mined "
        "neighbor is judged a false negative and dropped",
    )
    ap.add_argument("--eval-every", type=int, default=1600)
    ap.add_argument("--eval-bank", type=int, default=1024)
    ap.add_argument("--holdout", type=int, default=2048,
                    help="paragraphs reserved for the eval bank")
    ap.add_argument(
        "--no-exclude-eval",
        action="store_true",
        help="do NOT hold the quality-eval corpus passages out of training",
    )
    args = ap.parse_args(argv)
    if args.dense_negatives:
        args.hard_negatives = True

    import jax
    from jax.sharding import Mesh

    import optax

    from rust_local_rag_tpu.models.checkpoint import save_params
    from rust_local_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
    from rust_local_rag_tpu.models.tokenizer import HfTokenizer
    from rust_local_rag_tpu.parallel.train import (
        make_optax_scan_step,
        shard_params,
    )
    from rust_local_rag_tpu.training.corpus import harvest, load_paragraphs
    from rust_local_rag_tpu.training.pairs import PairBatcher

    tok_path = args.tokenizer or os.path.join(
        os.path.dirname(args.out), "tokenizer.json"
    )
    tokenizer = HfTokenizer(tok_path)

    exclude = None
    if not args.no_exclude_eval:
        try:
            from eval_harness.corpus import passage_hashes

            exclude = passage_hashes()
            print(f"holding out {len(exclude)} eval passages from training")
        except ImportError:
            print("eval_harness passage hashes unavailable; no holdout")

    if args.corpus:
        paragraphs = load_paragraphs(args.corpus)
        if exclude:
            from rust_local_rag_tpu.training.corpus import normalized_hash

            before = len(paragraphs)
            paragraphs = [
                p for p in paragraphs if normalized_hash(p) not in exclude
            ]
            print(f"holdout dropped {before - len(paragraphs)} paragraphs")
    else:
        paragraphs = harvest(exclude_hashes=exclude)
    print(f"{len(paragraphs)} training paragraphs")

    # deterministic split: tail paragraphs are the held-out eval bank
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(paragraphs))
    hold_n = min(args.holdout, len(paragraphs) // 10)
    train_pars = [paragraphs[i] for i in order[:-hold_n]]
    held_pars = [paragraphs[i] for i in order[-hold_n:]]

    prefixes = {}
    if args.objective in ("mixed", "ict"):
        # dual task prefixes, nomic-embed-text-class; recorded in the
        # checkpoint metadata so the serving encoder applies them too
        prefixes = {
            "query_prefix": "search_query: ",
            "doc_prefix": "search_document: ",
        }
    batcher = PairBatcher(train_pars, tokenizer, seed=args.seed, **prefixes)
    held = PairBatcher(held_pars, tokenizer, seed=args.seed, **prefixes)
    if args.objective == "mixed":
        bank = held.ict_eval_bank(args.eval_bank)
        if args.hard_negatives:
            batcher.premine_hard_negatives()
            if args.dense_negatives:
                batcher.premine_dense_negatives(margin=args.dense_margin)
            make_batches = batcher.mixed_hn_stacked_batches
        else:
            make_batches = batcher.mixed_stacked_batches
    elif args.objective == "ict":
        bank = held.ict_eval_bank(args.eval_bank)
        make_batches = batcher.ict_stacked_batches
    else:
        bank = held.eval_bank(args.eval_bank)
        make_batches = batcher.stacked_batches
    print(
        f"{len(batcher.docs)} croppable train docs, bank {bank[0].shape[0]} "
        f"({args.objective})"
    )

    if args.init:
        from rust_local_rag_tpu.models.encoder import load_encoder_checkpoint_full

        params, cfg, init_meta = load_encoder_checkpoint_full(args.init)
        print(
            f"warm start from {args.init} "
            f"(steps={init_meta.get('trained_steps')}, cfg {cfg.depth}L x "
            f"{cfg.dim}d -> {cfg.out_dim})"
        )
    else:
        cfg = EncoderConfig(
            vocab_size=tokenizer.vocab_size,
            dim=args.dim,
            depth=args.depth,
            heads=args.heads,
            ffn_dim=args.ffn,
            out_dim=args.out_dim,
        )
        params = init_encoder_params(jax.random.PRNGKey(args.seed), cfg)

    devices = jax.devices()
    mesh = Mesh(np.array(devices).reshape(len(devices), 1), ("data", "model"))
    params = shard_params(params, mesh, cfg)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=args.weight_decay),
    )
    opt_state = tx.init(params)
    if args.hard_negatives:
        from rust_local_rag_tpu.parallel.train import make_optax_scan_step_hn

        step_fn = make_optax_scan_step_hn(mesh, cfg, tx, args.temperature)
    else:
        step_fn = make_optax_scan_step(mesh, cfg, tx, args.temperature)

    acc0 = retrieval_accuracy(params, cfg, bank)
    print(f"step 0: held-out retrieval acc {acc0:.3f} (chance "
          f"{1.0 / bank[0].shape[0]:.4f})")

    from rust_local_rag_tpu.training.pairs import P_LEN

    best_acc, best_params, best_step = acc0 if args.init else -1.0, None, 0
    done = 0
    dispatch = 0
    t0 = time.monotonic()
    while done < args.steps:
        s = min(args.scan, args.steps - done)
        if args.objective in ("mixed", "ict"):
            # every 4th dispatch trains the passage side at the serving
            # bucket (256) so rope/pooling see full-length chunks;
            # two compiled programs total
            p_len = 256 if dispatch % 4 == 3 else P_LEN
            batch = make_batches(s, args.batch, p_len)
        else:
            batch = make_batches(s, args.batch)
        dispatch += 1
        if s < args.scan:  # pad the scan axis to keep one compiled shape
            reps = args.scan - s
            batch = tuple(
                np.concatenate([a, a[-1:].repeat(reps, 0)]) for a in batch
            )
        params, opt_state, loss = step_fn(params, opt_state, *batch)
        done += args.scan
        if done % max(args.scan * 4, 64) == 0 or done >= args.steps:
            dt = time.monotonic() - t0
            print(
                f"step {done}/{args.steps} loss {float(loss):.4f} "
                f"({done / dt:.1f} steps/s, "
                f"{done * args.batch / dt:.0f} pairs/s)",
                flush=True,
            )
        if args.eval_every and (done % args.eval_every == 0 or done >= args.steps):
            acc = retrieval_accuracy(params, cfg, bank)
            print(f"step {done}: held-out retrieval acc {acc:.3f}", flush=True)
            if acc > best_acc:
                best_acc, best_step = acc, done
                best_params = jax.device_get(params)

    if best_params is None:
        if args.init and args.eval_every:
            # warm-start regression guard: no eval ever beat the
            # warm-start accuracy, so the final (drifted) params must NOT
            # replace the initial checkpoint (which may be the committed
            # serving asset)
            print(
                f"no eval beat the warm-start acc {best_acc:.3f}; "
                f"checkpoint NOT written (init: {args.init})"
            )
            return
        # cold start (or eval disabled): save final
        best_params, best_step = jax.device_get(params), done
    print(f"saving best checkpoint from step {best_step} (acc {best_acc:.3f})")
    save_params(
        best_params,
        args.out,
        metadata={
            "encoder_config": cfg.to_json(),
            "trained_steps": str(best_step),
            "train_paragraphs": str(len(train_pars)),
            "objective": args.objective,
            **(
                {
                    "query_prefix": prefixes["query_prefix"],
                    "document_prefix": prefixes["doc_prefix"],
                }
                if prefixes
                else {}
            ),
        },
        half=True,
    )
    print(f"wrote {args.out}")

    # post-save verification (the non-contiguous-save bug shipped
    # scrambled tensors once — models/checkpoint.py flatten_params):
    # reload and confirm the file matches what was trained, beyond f16
    # rounding, and that the eval-bank accuracy survives the roundtrip
    from rust_local_rag_tpu.models.checkpoint import flatten_params
    from rust_local_rag_tpu.models.encoder import load_encoder_checkpoint_full

    reloaded, rcfg, _ = load_encoder_checkpoint_full(args.out)
    fa, fb = flatten_params(best_params), flatten_params(reloaded)
    worst = max(
        (float(np.max(np.abs(fa[k].astype(np.float32)
                             - fb[k].astype(np.float32)))), k)
        for k in fa
    )
    print(f"reload max |delta| {worst[0]:.6f} ({worst[1]})")
    acc2 = retrieval_accuracy(reloaded, rcfg or cfg, bank)
    print(f"reloaded checkpoint: held-out retrieval acc {acc2:.3f}")


if __name__ == "__main__":
    main()
