"""Synthetic COCO-format fixtures for tests, smoke runs, and benchmarks.

The reference repo ships no test data (SURVEY.md §4: it has no tests at all);
this module generates a deterministic miniature COCO2014-shaped dataset —
JPEG images on disk plus a captions annotation JSON — so every train/eval CLI
can be exercised end-to-end without the real 13 GB download.
"""

from __future__ import annotations

import json
import os
import random
from typing import Tuple

import numpy as np
from PIL import Image

_WORDS = ("a the dog cat man woman red blue small large ball tree park "
          "street sitting standing running holding riding near on in with "
          "two three group plate table water sky grass snow beach bike").split()


def _caption(rng: random.Random) -> str:
    n = rng.randint(4, 9)
    words = [rng.choice(_WORDS) for _ in range(n)]
    return " ".join(words) + rng.choice([".", ""])


def make_synthetic_coco(out_dir: str, num_images: int = 8,
                        image_hw: Tuple[int, int] = (96, 128),
                        captions_per_image: int = 5,
                        seed: int = 0,
                        split: str = "train2014") -> Tuple[str, str]:
    """Write JPEGs + captions JSON; returns (img_dir, ann_file)."""
    rng = random.Random(seed)
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        image_id = 1000 + i
        file_name = f"COCO_{split}_{image_id:012d}.jpg"
        h, w = image_hw
        arr = np.asarray(
            np.random.default_rng(seed * 10007 + i).integers(0, 256, (h, w, 3)),
            dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, file_name), quality=90)
        images.append({"id": image_id, "file_name": file_name,
                       "height": h, "width": w})
        for _ in range(captions_per_image):
            annotations.append({"id": ann_id, "image_id": image_id,
                                "caption": _caption(rng)})
            ann_id += 1
    ann = {"info": {"description": "synthetic fixture"},
           "images": images, "annotations": annotations, "licenses": []}
    ann_file = os.path.join(out_dir, f"captions_{split}.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return img_dir, ann_file


def synthetic_image_batch(batch_size: int, hw: Tuple[int, int] = (224, 224),
                          seed: int = 0) -> np.ndarray:
    """Deterministic [B,H,W,3] float32 image batch in [0,1] (no disk IO)."""
    rng = np.random.default_rng(seed)
    return rng.random((batch_size, hw[0], hw[1], 3), dtype=np.float32)
