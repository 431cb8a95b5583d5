"""Vocabulary builder.

CLI re-implementation of the reference's ``dataset/vocabulary_dict.ipynb``
notebook (cell 1): collect whitespace tokens from the lowercased train+val
COCO captions, delete every ``.`` and ``,`` character (``str.translate`` —
note this differs from the runtime tokenizer, which only strips *trailing*
punctuation; we reproduce both behaviors faithfully in their places), keep
tokens occurring >= 3 times in first-seen order, then append the four special
tokens. Pickled as ``word_to_id.pkl`` / ``id_to_word.pkl``.

Run:  python -m depth_image_captioning_pub_tpu.data.vocab \
          --train-anno captions_train2014.json --val-anno captions_val2014.json \
          --out-dir dataset/coco2014
"""

from __future__ import annotations

import argparse
import json
import pickle
from collections import Counter
from typing import Dict, Iterable, List, Tuple

from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL

_PUNCT_TABLE = str.maketrans({".": "", ",": ""})


def _caption_tokens(captions: Iterable[str]) -> List[str]:
    tokens: List[str] = []
    for caption in captions:
        tokens.extend(t.translate(_PUNCT_TABLE) for t in caption.lower().split())
    return tokens


def build_vocab(train_captions: Iterable[str],
                val_captions: Iterable[str],
                min_count: int = 3) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Build word<->id tables exactly like the notebook (min count 3)."""
    tokens = _caption_tokens(train_captions) + _caption_tokens(val_captions)
    freq = Counter(tokens)
    # Counter preserves first-occurrence order; the notebook's sorted() call
    # discards its result, so insertion order is the real id assignment.
    vocab = [t for t, c in freq.items() if c >= min_count]
    vocab += [SPECIAL.start, SPECIAL.end, SPECIAL.unk, SPECIAL.null]
    word_to_id = {t: i for i, t in enumerate(vocab)}
    id_to_word = {i: t for i, t in enumerate(vocab)}
    return word_to_id, id_to_word


def captions_from_coco_json(path: str) -> List[str]:
    """Read caption strings from a COCO captions annotation file."""
    with open(path) as f:
        data = json.load(f)
    return [ann["caption"] for ann in data["annotations"]]


def save_vocab(word_to_id: Dict[str, int], id_to_word: Dict[int, str],
               word_to_id_path: str, id_to_word_path: str) -> None:
    with open(word_to_id_path, "wb") as f:
        pickle.dump(word_to_id, f)
    with open(id_to_word_path, "wb") as f:
        pickle.dump(id_to_word, f)


def load_vocab(word_to_id_path: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    with open(word_to_id_path, "rb") as f:
        word_to_id = pickle.load(f)
    return word_to_id, {i: w for w, i in word_to_id.items()}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-anno", required=True)
    p.add_argument("--val-anno", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--min-count", type=int, default=3)
    args = p.parse_args(argv)

    word_to_id, id_to_word = build_vocab(
        captions_from_coco_json(args.train_anno),
        captions_from_coco_json(args.val_anno),
        min_count=args.min_count,
    )
    import os
    os.makedirs(args.out_dir, exist_ok=True)
    save_vocab(word_to_id, id_to_word,
               os.path.join(args.out_dir, "word_to_id.pkl"),
               os.path.join(args.out_dir, "id_to_word.pkl"))
    print(f"vocab size: {len(word_to_id)}")


if __name__ == "__main__":
    main()
