"""WordPiece tokenizer training — fully local, no hub access.

Produces the `assets/tokenizer.json` the serving stack loads by default
(models/tokenizer.HfTokenizer). Vocabulary is small (8k) on purpose: the
encoder's embedding table is the single largest weight tensor, and the
domain (technical English) is narrow; 8k wordpieces keep unknown-token
rates <0.1% on the harvested corpus while keeping the committed
checkpoint small.
"""

from __future__ import annotations

import os
from typing import List, Sequence

VOCAB_SIZE = 8192
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def train_tokenizer(
    paragraphs: Sequence[str],
    out_path: str,
    vocab_size: int = VOCAB_SIZE,
) -> None:
    from tokenizers import Tokenizer, decoders, models, normalizers
    from tokenizers import pre_tokenizers, processors, trainers

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]", max_input_chars_per_word=64))
    tok.normalizer = normalizers.Sequence(
        [normalizers.NFD(), normalizers.Lowercase(), normalizers.StripAccents()]
    )
    tok.pre_tokenizer = pre_tokenizers.Sequence(
        [pre_tokenizers.WhitespaceSplit(), pre_tokenizers.Punctuation()]
    )
    tok.decoder = decoders.WordPiece(prefix="##")
    trainer = trainers.WordPieceTrainer(
        vocab_size=vocab_size,
        special_tokens=SPECIALS,
        continuing_subword_prefix="##",
    )
    tok.train_from_iterator(paragraphs, trainer, length=len(paragraphs))
    # [CLS] text [SEP] framing, matching the hash tokenizer's shape so the
    # reranker's decision-id logic sees the same structure either way
    cls_id = tok.token_to_id("[CLS]")
    sep_id = tok.token_to_id("[SEP]")
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    # the reranker reads yes/no token logits: both must be single pieces
    # (technical corpora rarely contain "yes", so force-add when split)
    for word in ("yes", "no"):
        ids = [
            i
            for i in tok.encode(word).ids
            if i not in (cls_id, sep_id)
        ]
        if len(ids) != 1:
            tok.add_tokens([word])
    for word in ("yes", "no"):
        ids = [i for i in tok.encode(word).ids if i not in (cls_id, sep_id)]
        assert len(ids) == 1, (word, ids)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tok.save(out_path)


def main(argv: List[str] | None = None) -> None:
    import argparse

    from rust_local_rag_tpu.training.corpus import harvest, load_paragraphs

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", help="pre-harvested paragraph file (one/line)")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            "tokenizer.json",
        ),
    )
    ap.add_argument("--vocab-size", type=int, default=VOCAB_SIZE)
    args = ap.parse_args(argv)

    paragraphs = (
        load_paragraphs(args.corpus) if args.corpus else harvest()
    )
    print(f"training WordPiece vocab={args.vocab_size} on {len(paragraphs)} paragraphs")
    train_tokenizer(paragraphs, args.out, args.vocab_size)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
