"""Yes/no reranker training.

Teaches the causal decoder (models/reranker.py) to answer the serving
prompt (reranker_service.DEFAULT_PROMPT_TEMPLATE — same template at
training and serving) with "yes" for a (query, passage) pair mined from
the same paragraph and "no" for a mismatched pair. Negatives are 70%
random passages and 30% lexical hard negatives (a passage sharing a rare
token with the query — exactly the keyword-trap case the reranker must
learn to reject; the quality eval is built around such traps).

Loss is token cross-entropy on the first yes/no wordpiece at the last
prompt position — identical read-out to serving
(reranker.score_prompts -> logprobs[yes_id], logprobs[no_id]).
"""

from __future__ import annotations

import argparse
import os
import time
from collections import defaultdict
from typing import List, Optional, Tuple

import numpy as np


def _default_out() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "reranker.safetensors",
    )


class PromptPairBatcher:
    """(prompt tokens, yes/no label) batches from a paragraph corpus."""

    def __init__(
        self,
        paragraphs: List[str],
        tokenizer,
        template: str,
        seq_len: int = 192,
        seed: int = 0,
        hard_negative_frac: float = 0.3,
    ):
        self.rng = np.random.default_rng(seed)
        self.seq_len = seq_len
        self.tk = tokenizer._tok
        self.cls_id = self.tk.token_to_id("[CLS]")
        self.sep_id = self.tk.token_to_id("[SEP]")
        self.pad_id = self.tk.token_to_id("[PAD]")
        self.hard_frac = hard_negative_frac
        self.paragraphs = [p for p in paragraphs if len(p.split()) >= 16]
        # template split once around the placeholders; queries/passages are
        # plain text so prompts match serving byte-for-byte
        self.template = template
        # rare-token -> paragraph index, for lexical hard negatives
        self.tok_index = defaultdict(list)
        sample = self.rng.permutation(len(self.paragraphs))[:20000]
        for i in sample:
            words = set(self.paragraphs[i].lower().split())
            for w in words:
                if len(w) >= 7 and w.isalpha():
                    self.tok_index[w].append(i)

    def _query_and_passage(self, para: str) -> Tuple[str, str]:
        words = para.split()
        qlen = int(self.rng.integers(3, 13))
        start = int(self.rng.integers(0, max(len(words) - qlen, 1)))
        q = " ".join(words[start : start + qlen])
        if self.rng.random() < 0.2:
            passage = para
        else:
            passage = " ".join(words[:start] + words[start + qlen :])
        return q, passage

    def _hard_negative(self, query: str, avoid: int) -> Optional[str]:
        for w in sorted(query.lower().split(), key=len, reverse=True):
            cands = self.tok_index.get(w)
            if cands:
                j = cands[int(self.rng.integers(0, len(cands)))]
                if j != avoid:
                    return self.paragraphs[j]
        return None

    def batch(self, batch_size: int):
        """-> (ids [B, L], mask [B, L], labels [B] 1=yes/0=no)."""
        prompts: List[str] = []
        labels = np.zeros((batch_size,), dtype=np.int32)
        n = len(self.paragraphs)
        for b in range(batch_size):
            i = int(self.rng.integers(0, n))
            q, passage = self._query_and_passage(self.paragraphs[i])
            positive = self.rng.random() < 0.5
            if positive:
                text = passage
                labels[b] = 1
            else:
                text = None
                if self.rng.random() < self.hard_frac:
                    text = self._hard_negative(q, i)
                if text is None:
                    j = int(self.rng.integers(0, n))
                    if j == i:
                        j = (j + 1) % n
                    text = self.paragraphs[j]
            prompts.append(
                self.template.format(
                    query=q,
                    document="corpus.pdf",
                    page="1",
                    section="N/A",
                    text=text,
                )
            )
        encs = self.tk.encode_batch(prompts)
        ids = np.full((batch_size, self.seq_len), self.pad_id, dtype=np.int32)
        mask = np.zeros((batch_size, self.seq_len), dtype=np.int32)
        for b, e in enumerate(encs):
            row = e.ids[: self.seq_len]
            # keep the prompt TAIL when truncating: the yes/no question and
            # "Answer:" cue must stay at the end
            if len(e.ids) > self.seq_len:
                row = e.ids[: self.seq_len // 3] + e.ids[
                    -(self.seq_len - self.seq_len // 3) :
                ]
            ids[b, : len(row)] = row
            mask[b, : len(row)] = 1
        return ids, mask, labels

    def stacked(self, n_steps: int, batch_size: int):
        a, m, l = [], [], []
        for _ in range(n_steps):
            x, y, z = self.batch(batch_size)
            a.append(x)
            m.append(y)
            l.append(z)
        return np.stack(a), np.stack(m), np.stack(l)


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
    print(f"{len(paragraphs)} paragraphs")

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(paragraphs))
    hold_n = min(2048, len(paragraphs) // 10)
    train_pars = [paragraphs[i] for i in order[:-hold_n]]
    held_pars = [paragraphs[i] for i in order[-hold_n:]]

    batcher = PromptPairBatcher(
        train_pars, tokenizer, DEFAULT_PROMPT_TEMPLATE,
        seq_len=args.seq_len, seed=args.seed,
    )
    held = PromptPairBatcher(
        held_pars, tokenizer, DEFAULT_PROMPT_TEMPLATE,
        seq_len=args.seq_len, seed=args.seed + 1,
    )
    eval_ids, eval_mask, eval_labels = held.batch(512)

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

    def loss_fn(params, ids, mask, labels):
        logits = reranker_forward_last_logits(params, ids, mask, cfg)
        targets = jnp.where(labels == 1, yes_id, no_id)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
        return jnp.mean(nll)

    def one_step(carry, xs):
        params, opt_state = carry
        ids, mask, labels = xs
        loss, grads = jax.value_and_grad(loss_fn)(params, ids, mask, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def scan_step(params, opt_state, ids, mask, labels):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (ids, mask, labels)
        )
        return params, opt_state, jnp.mean(losses)

    @jax.jit
    def eval_acc(params, ids, mask, labels):
        logits = reranker_forward_last_logits(params, ids, mask, cfg)
        pred_yes = logits[:, yes_id] > logits[:, no_id]
        return jnp.mean((pred_yes == (labels == 1)).astype(jnp.float32))

    acc = float(eval_acc(params, eval_ids, eval_mask, eval_labels))
    print(f"step 0: held-out yes/no accuracy {acc:.3f}")

    done = 0
    t0 = time.monotonic()
    while done < args.steps:
        s = min(args.scan, args.steps - done)
        ids, mask, labels = batcher.stacked(s, args.batch)
        if s < args.scan:
            reps = args.scan - s
            ids = np.concatenate([ids, ids[-1:].repeat(reps, 0)])
            mask = np.concatenate([mask, mask[-1:].repeat(reps, 0)])
            labels = np.concatenate([labels, labels[-1:].repeat(reps, 0)])
        params, opt_state, loss = scan_step(params, opt_state, ids, mask, labels)
        done += args.scan
        if done % max(args.scan * 4, 64) == 0 or done >= args.steps:
            dt = time.monotonic() - t0
            print(
                f"step {done}/{args.steps} loss {float(loss):.4f} "
                f"({done / dt:.1f} steps/s)",
                flush=True,
            )
        if args.eval_every and (done % args.eval_every == 0 or done >= args.steps):
            acc = float(eval_acc(params, eval_ids, eval_mask, eval_labels))
            print(f"step {done}: held-out yes/no accuracy {acc:.3f}", flush=True)

    save_params(
        jax.device_get(params),
        args.out,
        metadata={
            "reranker_config": cfg.to_json(),
            "trained_steps": str(args.steps),
        },
        half=True,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
