"""COCO-captions dataset reader (self-contained, no pycocotools).

Replaces the reference's ``torchvision.datasets.CocoCaptions`` usage
(reference: Base_caption_model/base_train.py:59-64). Index order matches
torchvision exactly: items are enumerated over image ids sorted ascending,
and each item's caption list preserves annotation-file order — this keeps the
frozen eval-subset index files (``data_index/np_val_index.npy``, loaded at
reference base_evaluation.py:86-91) pointing at the same images.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class CocoCaptions:
    """Minimal (image, captions) dataset over a COCO annotation file."""

    def __init__(self, root: str, ann_file: str,
                 image_size: Optional[Tuple[int, int]] = (224, 224)):
        self.root = root
        self.image_size = image_size
        with open(ann_file) as f:
            data = json.load(f)
        file_names: Dict[int, str] = {
            img["id"]: img["file_name"] for img in data["images"]}
        caps: Dict[int, List[str]] = {}
        for ann in data["annotations"]:  # file order == pycocotools imgToAnns order
            caps.setdefault(ann["image_id"], []).append(ann["caption"])
        # torchvision iterates sorted(self.coco.imgs.keys())
        self.ids: List[int] = sorted(file_names.keys())
        self._file_names = file_names
        self._caps = caps

    def __len__(self) -> int:
        return len(self.ids)

    def image_path(self, index: int) -> str:
        return os.path.join(self.root, self._file_names[self.ids[index]])

    def captions(self, index: int) -> List[str]:
        return self._caps.get(self.ids[index], [])

    def load_image(self, index: int) -> np.ndarray:
        """Decode + bilinear-resize one image -> uint8 HWC.

        Matches ``T.Resize((224,224)); T.ToTensor()`` (reference:
        base_train.py:47-53) except: layout is HWC (NHWC is XLA's TPU conv
        layout), and the /255 + normalize happen on-device
        (ops/image_ops.to_unit_float) — uint8 pixels cross PCIe with 4x
        less traffic and identical numerics.
        """
        img = Image.open(self.image_path(index)).convert("RGB")
        if self.image_size is not None:
            img = img.resize(self.image_size[::-1], Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)

    def load_images_batch(self, indices) -> np.ndarray:
        """Batched decode via the native loader (threaded libjpeg with
        DCT-domain scaling; PIL fallback) -> [N, H, W, 3] uint8."""
        from depth_image_captioning_pub_tpu.data.native_loader import (
            available, decode_batch)
        if self.image_size is None or not available():
            return np.stack([self.load_image(i) for i in indices])
        return decode_batch([self.image_path(i) for i in indices],
                            self.image_size)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, List[str]]:
        return self.load_image(index), self.captions(index)


class Subset:
    """Fixed-index subset (reference: nic.py:388-391 uses torch Subset)."""

    def __init__(self, dataset: CocoCaptions, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]

    def captions(self, i: int) -> List[str]:
        return self.dataset.captions(self.indices[i])

    def load_image(self, i: int) -> np.ndarray:
        return self.dataset.load_image(self.indices[i])

    def load_images_batch(self, idxs) -> np.ndarray:
        return self.dataset.load_images_batch([self.indices[i] for i in idxs])


def load_index_file(path: str) -> List[int]:
    """Load a frozen eval-subset .npy index array (data_index/*.npy)."""
    return np.load(path).tolist()
