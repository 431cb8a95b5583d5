"""Fixed-shape batch pipeline.

TPU-first replacement for the reference's collate functions (reference:
Captioning_models/util.py:52-110) and DataLoader worker processes. Differences
by design, not omission:

* Batches are **fixed-shape**: captions padded with ``<null>`` to a constant
  ``max_caption_len`` and a ``lengths`` vector carried alongside, instead of
  sort-by-length + ``pack_padded_sequence``. Under cross-entropy that ignores
  ``<null>`` and masks by length, the loss is mathematically identical to the
  packed form (same numerator and token count), while giving XLA one static
  shape to compile.
* No length-descending sort: masking makes ordering irrelevant, and keeping
  dataset order lets eval outputs align with reference indices trivially.
* The last partial batch is padded up to ``batch_size`` with repeated samples
  plus a validity mask (`pad_mask`), so jit never sees a second batch shape.
* Images stay raw uint8 on host (4x less transfer); the /255 conversion
  and ImageNet / DPT normalization are fused on-device (ops/image_ops.py),
  replacing the host-side ``T.ToTensor``/``T.Normalize``
  (reference: util.py:13-17, base_train.py:50-52).
* A thread prefetcher plus the native C++ batch JPEG loader
  (data/native_loader.py) stand in for ``num_workers=4`` forked workers
  (reference: config.py:65).
"""

from __future__ import annotations

import random
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL, tokenize_caption


class Batch(NamedTuple):
    """One fixed-shape training batch (NHWC images, padded captions)."""

    images: np.ndarray        # [B, H, W, 3] uint8 (or float32 in [0,1])
    captions: np.ndarray      # [B, L] int32, <null>-padded
    lengths: np.ndarray       # [B] int32 (includes <start> and <end>)
    pad_mask: np.ndarray      # [B] bool, False for repeated padding samples
    indices: np.ndarray = None  # [B] int32 dataset indices (depth-cache key)


def pad_captions(token_lists: Sequence[Sequence[int]], null_id: int,
                 max_len: int) -> "tuple[np.ndarray, np.ndarray]":
    """<null>-pad variable-length token lists to [B, max_len] (util.py:67-72).

    Captions longer than ``max_len`` are truncated but keep their final
    ``<end>`` token so decode targets stay well-formed.
    """
    bsz = len(token_lists)
    out = np.full((bsz, max_len), null_id, dtype=np.int32)
    lengths = np.zeros((bsz,), dtype=np.int32)
    for i, toks in enumerate(token_lists):
        toks = list(toks)
        if len(toks) > max_len:
            toks = toks[: max_len - 1] + [toks[-1]]
        out[i, : len(toks)] = toks
        lengths[i] = len(toks)
    return out, lengths


def make_train_batch(images: Sequence[np.ndarray],
                     caption_sets: Sequence[Sequence[str]],
                     word_to_id: Dict[str, int],
                     max_len: int,
                     rng: random.Random,
                     batch_size: Optional[int] = None,
                     indices: Optional[Sequence[int]] = None) -> Batch:
    """Pick 1-of-5 captions, tokenize, pad — collate_func (util.py:52-73)."""
    tokens = [tokenize_caption(rng.choice(list(caps)), word_to_id)
              for caps in caption_sets]
    captions, lengths = pad_captions(tokens, word_to_id[SPECIAL.null], max_len)
    imgs = np.stack(images)  # uint8 from the dataset; device converts
    n = imgs.shape[0]
    target = batch_size or n
    idx = np.asarray(list(indices) if indices is not None else range(n),
                     dtype=np.int32)
    pad_mask = np.ones((target,), dtype=bool)
    if n < target:
        reps = [i % n for i in range(n, target)]
        imgs = np.concatenate([imgs, imgs[reps]], axis=0)
        captions = np.concatenate([captions, captions[reps]], axis=0)
        lengths = np.concatenate([lengths, lengths[reps]], axis=0)
        idx = np.concatenate([idx, idx[reps]], axis=0)
        pad_mask[n:] = False
    return Batch(imgs, captions, lengths, pad_mask, idx)


class EvalBatch(NamedTuple):
    images: np.ndarray            # [B, H, W, 3]
    references: List[List[str]]   # per-image cleaned reference captions
    pad_mask: np.ndarray          # [B] bool


def make_eval_batch(images: Sequence[np.ndarray],
                    caption_sets: Sequence[Sequence[str]],
                    word_to_id: Dict[str, int],
                    batch_size: Optional[int] = None) -> EvalBatch:
    """Images + cleaned raw reference strings — make_refs (util.py:174-195)."""
    from depth_image_captioning_pub_tpu.data.tokenizer import untokenize_caption
    refs = [[untokenize_caption(c, word_to_id) for c in caps]
            for caps in caption_sets]
    imgs = np.stack(images)  # uint8 from the dataset; device converts
    n = imgs.shape[0]
    target = batch_size or n
    pad_mask = np.ones((target,), dtype=bool)
    if n < target:
        reps = [i % n for i in range(n, target)]
        imgs = np.concatenate([imgs, imgs[reps]], axis=0)
        pad_mask[n:] = False
    return EvalBatch(imgs, refs, pad_mask)


def generate_subset(dataset, ratio: float, random_seed: int = 0):
    """Two disjoint shuffled index sets split at ratio (API parity with the
    reference's unused helper, util.py:30-44: same seed -> same split)."""
    size = int(len(dataset) * ratio)
    indices = list(range(len(dataset)))
    random.Random(random_seed).shuffle(indices)
    return indices[:size], indices[size:]


def batched_indices(n: int, batch_size: int, shuffle: bool,
                    rng: Optional[random.Random] = None) -> List[List[int]]:
    idx = list(range(n))
    if shuffle:
        (rng or random).shuffle(idx)
    return [idx[i: i + batch_size] for i in range(0, n, batch_size)]


def train_batches(dataset, word_to_id: Dict[str, int], batch_size: int,
                  max_len: int, shuffle: bool, seed: int,
                  epoch: int = 0,
                  pad_to: Optional[int] = None,
                  indices: Optional[Sequence[int]] = None) -> Iterator[Batch]:
    """Iterate fixed-shape train batches over a CocoCaptions-like dataset.

    ``pad_to`` rounds every batch up to a device-count multiple (sharded
    batches need a static per-device shape); repeated rows are flagged False
    in ``pad_mask`` and excluded from the loss.
    """
    rng = random.Random(seed * 100003 + epoch)
    order = list(indices) if indices is not None else list(range(len(dataset)))
    if shuffle:
        rng.shuffle(order)
    chunks = [order[i: i + batch_size] for i in range(0, len(order), batch_size)]
    for chunk in chunks:
        imgs = _load_chunk(dataset, chunk)
        caps = [dataset.captions(i) for i in chunk]
        yield make_train_batch(imgs, caps, word_to_id, max_len, rng,
                               batch_size=pad_to or batch_size,
                               indices=chunk)


def _load_chunk(dataset, chunk):
    """Batched decode when the dataset supports it (native loader path)."""
    if hasattr(dataset, "load_images_batch"):
        return list(dataset.load_images_batch(chunk))
    return [dataset.load_image(i) for i in chunk]


def eval_batches(dataset, word_to_id: Dict[str, int], batch_size: int,
                 pad_to: Optional[int] = None) -> Iterator[EvalBatch]:
    for chunk in batched_indices(len(dataset), batch_size, shuffle=False):
        imgs = _load_chunk(dataset, chunk)
        caps = [dataset.captions(i) for i in chunk]
        yield make_eval_batch(imgs, caps, word_to_id,
                              batch_size=pad_to or batch_size)


class Prefetcher:
    """Bounded background-thread prefetch over any batch iterator.

    Host-side stand-in for DataLoader worker processes: decodes the next
    batches on a thread while the TPU crunches the current one.
    """

    _DONE = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._cancel = threading.Event()

        def run():
            try:
                for item in iterator:
                    # bounded put so close() can unblock an abandoned
                    # producer (a consumer that returns mid-iteration —
                    # e.g. the train loop's preemption exit — would
                    # otherwise strand this thread on a full queue forever)
                    while not self._cancel.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue_mod.Full:
                            continue
                    if self._cancel.is_set():
                        return
            except BaseException as e:  # surface worker errors to consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def close(self, timeout: float = 5.0) -> None:
        """Stop the producer thread without draining the iterator; safe to
        call after abandoning iteration early."""
        self._cancel.set()
        try:  # make room in case the producer is mid-put
            while True:
                self._q.get_nowait()
        except queue_mod.Empty:
            pass
        self._thread.join(timeout=timeout)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
