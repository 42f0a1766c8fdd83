"""Contrastive pair construction: independent crops of one paragraph.

The Contriever recipe adapted to a local corpus: two random wordpiece
spans of the same paragraph form a positive pair; every other in-batch
example is a negative. Paragraphs are tokenized ONCE up front (host-side),
crops are cheap integer slices, and batches are fixed-shape [B, L] int32
arrays ready for the jitted train step.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

CROP_MIN = 12
CROP_MAX = 56
SEQ_LEN = 64


class PairBatcher:
    def __init__(
        self,
        paragraphs: Sequence[str],
        tokenizer,
        seq_len: int = SEQ_LEN,
        seed: int = 0,
    ):
        self.seq_len = seq_len
        self.rng = np.random.default_rng(seed)
        tk = tokenizer._tok  # HfTokenizer wraps a tokenizers.Tokenizer
        self.cls_id = tk.token_to_id("[CLS]")
        self.sep_id = tk.token_to_id("[SEP]")
        self.pad_id = tk.token_to_id("[PAD]")
        # tokenize once, strip specials, keep paragraphs long enough to crop
        self.docs: List[np.ndarray] = []
        encs = tk.encode_batch(list(paragraphs))
        for e in encs:
            ids = [i for i in e.ids if i not in (self.cls_id, self.sep_id)]
            if len(ids) >= CROP_MIN + 4:
                self.docs.append(np.asarray(ids, dtype=np.int32))
        if not self.docs:
            raise ValueError("no paragraphs long enough to crop")

    def _crop(self, ids: np.ndarray) -> np.ndarray:
        n = len(ids)
        ln = int(self.rng.integers(CROP_MIN, min(CROP_MAX, n) + 1))
        start = int(self.rng.integers(0, n - ln + 1))
        return ids[start : start + ln]

    def _pack(self, crops: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        B = len(crops)
        out = np.full((B, self.seq_len), self.pad_id, dtype=np.int32)
        mask = np.zeros((B, self.seq_len), dtype=np.int32)
        for i, c in enumerate(crops):
            c = c[: self.seq_len - 2]
            row = np.concatenate(
                ([self.cls_id], c, [self.sep_id])
            ).astype(np.int32)
            out[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return out, mask

    def batch(self, batch_size: int):
        """-> (q_ids, q_mask, p_ids, p_mask), each [B, L] int32."""
        idx = self.rng.integers(0, len(self.docs), size=batch_size)
        qs = [self._crop(self.docs[i]) for i in idx]
        ps = [self._crop(self.docs[i]) for i in idx]
        q_ids, q_mask = self._pack(qs)
        p_ids, p_mask = self._pack(ps)
        return q_ids, q_mask, p_ids, p_mask

    def stacked_batches(self, n_steps: int, batch_size: int):
        """[S, B, L] arrays for a lax.scan-driven multi-step dispatch (the
        TPU tunnel costs ~50 ms per dispatch; scanning several optimizer
        steps per dispatch amortizes it)."""
        qi, qm, pi, pm = [], [], [], []
        for _ in range(n_steps):
            a, b, c, d = self.batch(batch_size)
            qi.append(a)
            qm.append(b)
            pi.append(c)
            pm.append(d)
        return (
            np.stack(qi),
            np.stack(qm),
            np.stack(pi),
            np.stack(pm),
        )

    def eval_bank(self, n: int, start_frac: float = 0.0):
        """Deterministic (query-crop, positive-crop) bank from the first n
        suitable docs — retrieval accuracy over this bank is the held-out
        training metric (crop A must retrieve crop B among n candidates)."""
        rng = np.random.default_rng(12345)
        n = min(n, len(self.docs))
        qs, ps = [], []
        for i in range(n):
            ids = self.docs[i]
            m = len(ids)
            half = max(CROP_MIN, m // 2)
            qs.append(ids[: min(half, CROP_MAX)])
            ps.append(ids[m - min(half, CROP_MAX) :])
        q_ids, q_mask = self._pack(qs)
        p_ids, p_mask = self._pack(ps)
        return q_ids, q_mask, p_ids, p_mask
