"""Per-word attention-overlay visualization ("sample" mode).

Re-design of Base_sample / Cdepth_sample (reference: base_evaluation.py:
171-336, depth_evaluation.py:196-386): caption each image found in a
sample_pic directory, then render one PNG per generated word with the 14x14
attention map upsampled x16 and alpha-blended over the image, plus a
caption.txt.

The reference uses ``skimage.transform.pyramid_expand(upscale=16, sigma=8)``
(base_evaluation.py:302-323); scikit-image is not in this environment, so we
reproduce it with scipy (bilinear zoom x16 + Gaussian sigma=8) — visually
identical smoothing.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Dict, List

import numpy as np

from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL


def expand_alpha(alpha_14: np.ndarray, upscale: int = 16,
                 sigma: float = 8.0) -> np.ndarray:
    """14x14 attention weights -> smooth 224x224 heatmap."""
    from scipy.ndimage import gaussian_filter, zoom
    up = zoom(alpha_14, upscale, order=1)
    return gaussian_filter(up, sigma=sigma)


def render_attention_overlays(image_01: np.ndarray, words: List[str],
                              alphas: np.ndarray, out_dir: str,
                              grid: int = 14) -> List[str]:
    """Write one overlay PNG per word (reference: base_evaluation.py:302-323).

    image_01: [H, W, 3] float in [0,1]; alphas: [T, grid*grid].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for t, word in enumerate(words):
        heat = expand_alpha(alphas[t].reshape(grid, grid))
        fig, ax = plt.subplots(figsize=(4, 4))
        ax.imshow(image_01)
        ax.imshow(heat, alpha=0.6, cmap="jet",
                  extent=(0, image_01.shape[1], image_01.shape[0], 0))
        ax.set_title(word)
        ax.axis("off")
        path = os.path.join(out_dir, f"{t:02d}_{word}.png")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def sample_directory(sample_dir: str, out_dir: str,
                     caption_one: Callable[[np.ndarray], tuple],
                     id_to_word: Dict[int, str],
                     image_size=(224, 224)) -> Dict[str, str]:
    """Caption every *.jpg/*.png under sample_dir (reference globs both:
    base_evaluation.py:272-273); writes overlays + caption.txt.

    ``caption_one(image_01_hw3)`` -> (token_ids [T], alphas [T, K]).
    Returns {image_path: caption string}.
    """
    from PIL import Image

    files = sorted(glob.glob(os.path.join(sample_dir, "*.jpg"))
                   + glob.glob(os.path.join(sample_dir, "*.png")))
    captions: Dict[str, str] = {}
    lines = []
    for path in files:
        img = Image.open(path).convert("RGB").resize(image_size[::-1],
                                                     Image.BILINEAR)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        token_ids, alphas = caption_one(arr)
        words = []
        kept_alphas = []
        for i, tid in enumerate(np.asarray(token_ids).tolist()):
            w = id_to_word[int(tid)]
            if w == SPECIAL.end:
                break
            if w == SPECIAL.start:
                continue
            words.append(w)
            kept_alphas.append(np.asarray(alphas)[i])
        caption = " ".join(words)
        captions[path] = caption
        stem = os.path.splitext(os.path.basename(path))[0]
        img_out_dir = os.path.join(out_dir, stem)
        os.makedirs(img_out_dir, exist_ok=True)
        # input.png alongside the overlays (reference: base_evaluation.py:
        # 288-293 saves the resized input per image)
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(img_out_dir, "input.png"))
        if kept_alphas:
            render_attention_overlays(arr, words, np.stack(kept_alphas),
                                      img_out_dir)
        lines.append(f"{os.path.basename(path)}: {caption}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "caption.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return captions
