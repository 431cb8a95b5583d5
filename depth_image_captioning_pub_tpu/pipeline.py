"""One-call inference API: image paths/arrays in, caption strings out.

The reference has no inference surface besides its eval scripts — captioning
a new image means editing ``Base_sample``'s globbed directories (reference:
base_evaluation.py:171-336). A framework intended for serving needs a
programmatic entry point; this wraps the existing jitted eval hot path
(engine/evaluate.make_caption_fn: normalize -> frozen encoder -> optional
DPT + depth encoder -> whole-sequence greedy/beam decode on device) behind
a stable-batch-shape, auto-padding caller:

    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    pipe = CaptionPipeline.from_experiment("base-soft")   # exp_result/ ckpts
    pipe("dog.jpg")                      # -> "a dog runs on the beach"
    pipe(["a.jpg", "b.jpg", arr_hw3])    # -> list of captions

Every call reuses ONE compiled program (inputs are padded to ``batch_size``
so jit never sees a second shape), and JPEG paths go through the native
batched decoder (data/native_loader.py) with PIL fallback.

``batch_buckets`` trades that single program for a small fixed set of them:
a request is padded to the smallest bucket that fits instead of always the
largest, which cuts both the device work and the host->device transfer for
small requests (on a serving deployment, single-image latency). Each bucket
compiles once on first use; captions are identical across bucket choices
(padding rows are discarded before detokenization).

``sample=True`` switches to stochastic decoding (temperature / top-k /
nucleus); repeated calls draw fresh captions, deterministic per ``seed``.
Caveat: the categorical draws depend on the padded batch shape, so under
``batch_buckets`` a sampled caption is reproducible only at a fixed bucket
(greedy/beam stay bucket-invariant).

On a multi-chip host the pipeline data-parallelizes automatically, the same
way the eval engine does (engine/evaluate.py:339-350): params are
replicated over a 1-D mesh of every visible device, batch buckets are
rounded up to device-divisible sizes, and each chunk is placed with its
batch dim sharded — GSPMD splits the caption program per chip with no
collectives (per-image work is independent). Captions are identical to the
single-device pipeline's. Pass ``devices=[...]`` to restrict the mesh (one
device = no sharding). ``use_pallas`` also data-parallelizes: pallas_call
does not partition under GSPMD, so the whole-sequence decode kernels
instead run per-device batch shards through their shard_map dispatch
(ops/pallas/decode_seq.shard_over_batch) on the same mesh.
"""

from __future__ import annotations


from typing import Dict, List, Sequence, Union

import numpy as np

ImageLike = Union[str, np.ndarray]


class CaptionPipeline:
    """Batched captioning over a loaded model configuration.

    Parameters mirror what the eval engine needs: the ``Captioner`` bundle,
    its (trainable, frozen, batch_stats) variable split, and the vocab maps.
    ``frozen`` must contain ``"dpt"`` variables for depth kinds (use
    ``from_experiment`` / ``cli.make_depth_fn`` to assemble them).
    """

    def __init__(self, cap, params, frozen, batch_stats,
                 word_to_id: Dict[str, int], id_to_word: Dict[int, str], *,
                 depth_fn=None, max_length: int = 30, beam_size: int = 1,
                 length_penalty: float = 0.0, batch_size: int = 64,
                 image_hw=(224, 224), use_pallas: bool = False,
                 batch_buckets=None, sample: bool = False,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 1.0, seed: int = 0, devices=None):
        import jax
        from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL
        from depth_image_captioning_pub_tpu.engine.evaluate import (
            make_caption_fn)

        if cap.spec.uses_depth and depth_fn is None:
            raise ValueError(f"{cap.spec.kind} needs depth_fn")
        self.cap = cap
        # decode/config facts the AOT exporter (export.py) records in meta
        self.kind = cap.spec.kind
        self.max_length = int(max_length)
        self.beam_size = int(beam_size)
        self.use_pallas = bool(use_pallas)
        self.params = params
        self.frozen = frozen
        self.batch_stats = batch_stats
        self.word_to_id = word_to_id
        self.id_to_word = id_to_word
        if batch_buckets:
            self.batch_buckets = tuple(sorted({int(b) for b in batch_buckets}))
            if self.batch_buckets[0] < 1:
                raise ValueError(f"bad batch_buckets {batch_buckets}")
            self.batch_size = self.batch_buckets[-1]
        else:
            self.batch_size = int(batch_size)
            self.batch_buckets = (self.batch_size,)
        # Data-parallel over every visible device (or the given subset),
        # mirroring the eval engine: replicated params, batch dim sharded,
        # buckets rounded up to device-divisible sizes. ``use_pallas``
        # shards too — the whole-sequence kernels run per-device batch
        # shards via their shard_map dispatch (pallas_mesh).
        self._sharding = None
        self._mesh = None
        self._experiment = None   # set by from_experiment (for reload)
        pallas_mesh = None
        devices = list(devices) if devices is not None else jax.devices()
        if len(devices) > 1:
            from depth_image_captioning_pub_tpu.parallel.mesh import (
                batch_sharding, make_mesh, pad_batch_to_devices, replicate)
            mesh = make_mesh(devices)
            self._mesh = mesh
            if use_pallas:
                pallas_mesh = mesh
            self._sharding = batch_sharding(mesh)
            self.frozen = replicate(mesh, self.frozen)
            self.params = replicate(mesh, self.params)
            self.batch_stats = replicate(mesh, self.batch_stats)
            self.batch_buckets = tuple(sorted(
                {pad_batch_to_devices(b, mesh.size)
                 for b in self.batch_buckets}))
            self.batch_size = self.batch_buckets[-1]
        self.image_hw = tuple(image_hw)
        # sample=True: stochastic decoding (temperature / top-k / nucleus).
        # Each caption_tokens call advances the key, so repeated calls draw
        # fresh captions; the sequence is deterministic per ``seed``.
        # Greedy (the default) ignores the key entirely.
        self.sample = bool(sample)
        self._rng = jax.random.PRNGKey(seed)
        self._fn = make_caption_fn(
            cap, start_id=word_to_id[SPECIAL.start], max_length=max_length,
            depth_fn=depth_fn, beam_size=beam_size,
            end_id=word_to_id.get(SPECIAL.end),
            length_penalty=length_penalty, use_pallas=use_pallas,
            pallas_mesh=pallas_mesh,
            sampling=({"temperature": temperature, "top_k": top_k,
                       "top_p": top_p} if sample else None))

    # ---- loading ----------------------------------------------------------
    @classmethod
    def from_experiment(cls, kind: str, use_data: str = "coco",
                        cfg=None, set_idx: int = 1, **kwargs
                        ) -> "CaptionPipeline":
        """Load the checkpoint set the eval CLIs would (exp_result/ layout,
        reference filename tables config.py:121-179; both our msgpack saves
        and bridged reference ``.pth`` files work). ``set_idx`` selects among
        the 3 experiment repeats (1-based, like the reference's checkpoint
        tables)."""
        from depth_image_captioning_pub_tpu import cli
        from depth_image_captioning_pub_tpu.config import ConfigEval
        from depth_image_captioning_pub_tpu.data.vocab import load_vocab
        from depth_image_captioning_pub_tpu.models.captioner import (
            build_captioner)

        cfg = cfg or ConfigEval()
        base, atten = (kind.split("-") + ["soft"])[:2]
        depth = base in ("depth", "mdepth")
        use_ori = use_data == "original"
        w2i_p = cfg.ori_word_to_id_file if use_ori else cfg.word_to_id_file
        word_to_id, id_to_word = load_vocab(w2i_p)
        cap = build_captioner(kind, len(word_to_id), cfg,
                              resnet_layers=cli.resnet_layers_from_env())
        if kind == "nic":
            save_dir, tables = cfg.save_directory_nic, cfg.nic_parameter_files
        else:
            save_dir, tables = cli.eval_tables(
                cfg, atten, use_ori, depth,
                encoder="mlp" if base == "mdepth" else "cnn")
        frozen_enc, params, stats = cli.load_eval_components(
            save_dir, tables[set_idx], cap)
        frozen = {"encoder": frozen_enc}
        depth_fn = None
        if cap.spec.uses_depth:
            depth_fn, dpt_vars = cli.make_depth_fn(cfg)
            frozen["dpt"] = dpt_vars
        pipe = cls(cap, params, frozen, stats, word_to_id, id_to_word,
                   depth_fn=depth_fn, max_length=cfg.max_length, **kwargs)
        pipe._experiment = (save_dir, tables[set_idx])
        return pipe

    # ---- hot reload -------------------------------------------------------
    def reload_weights(self, params=None, frozen_enc=None,
                       batch_stats=None) -> None:
        """Swap weights in place — shapes are unchanged, so every compiled
        program (all batch buckets, beam/pallas variants) is reused with
        zero recompilation. On a mesh the new trees are replicated like the
        originals. NOT synchronized with concurrent ``__call__``s — callers
        that serve traffic must serialize the swap with inference
        (serve.CaptionService does this on its device-owning worker thread
        via ``CaptionService.reload``)."""
        new = {"params": params, "batch_stats": batch_stats,
               "frozen": (dict(self.frozen, encoder=frozen_enc)
                          if frozen_enc is not None else None)}
        if self._mesh is not None:
            from depth_image_captioning_pub_tpu.parallel.mesh import (
                replicate)
            new = {k: replicate(self._mesh, v) if v is not None else None
                   for k, v in new.items()}
        if new["params"] is not None:
            self.params = new["params"]
        if new["frozen"] is not None:
            self.frozen = new["frozen"]
        if new["batch_stats"] is not None:
            self.batch_stats = new["batch_stats"]

    def reload_from_experiment(self) -> None:
        """Re-read the SAME checkpoint files this pipeline was loaded from
        (after a training run refreshed them) and swap the weights — the
        hot-reload path behind ``POST /reload`` on ``dcap-serve``. The
        frozen DPT is kept (it never trains); the frozen RGB encoder,
        trainable params, and batch stats are re-read."""
        if self._experiment is None:
            raise RuntimeError("pipeline was not built by from_experiment; "
                               "use reload_weights(...) directly")
        from depth_image_captioning_pub_tpu import cli
        save_dir, files = self._experiment
        frozen_enc, params, stats = cli.load_eval_components(
            save_dir, files, self.cap)
        self.reload_weights(params=params, frozen_enc=frozen_enc,
                            batch_stats=stats)

    # ---- inference --------------------------------------------------------
    def _to_arrays(self, images: Sequence[ImageLike]) -> np.ndarray:
        from depth_image_captioning_pub_tpu.data.native_loader import (
            decode_batch)
        h, w = self.image_hw
        out = np.zeros((len(images), h, w, 3), np.uint8)
        paths = [(i, im) for i, im in enumerate(images) if isinstance(im, str)]
        if paths:
            decoded = decode_batch([p for _, p in paths], self.image_hw)
            for (i, _), arr in zip(paths, decoded):
                out[i] = arr
        for i, im in enumerate(images):
            if isinstance(im, str):
                continue
            arr = np.asarray(im)
            if arr.shape[:2] != (h, w):
                from PIL import Image
                if arr.dtype != np.uint8:
                    arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr,
                                  0, 255).astype(np.uint8)
                arr = np.asarray(Image.fromarray(arr).resize(
                    (w, h), Image.BILINEAR))
            if arr.dtype != np.uint8:
                arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr,
                              0, 255).astype(np.uint8)
            out[i] = arr
        return out

    def caption_tokens(self, arrays: np.ndarray) -> np.ndarray:
        """[N,H,W,3] uint8 -> [N, max_length] int32 token IDs; pads each
        chunk to the smallest ``batch_buckets`` entry that fits (a single
        bucket — the default — means every call hits one executable).

        Multi-chunk calls are pipelined: ``jax.device_put`` and jit
        dispatch are async, so chunk i+1's host->device transfer and
        dispatch start before blocking on chunk i's tokens (same pattern
        as engine/evaluate.generate_captions — on the bench rig this
        overlap recovered a ~3x e2e loss, STATUS round-3 item 5)."""
        import jax
        n = arrays.shape[0]
        pending = []          # (dispatched tokens, valid) one chunk ahead
        rows = []
        for lo in range(0, n, self.batch_size):
            chunk = arrays[lo:lo + self.batch_size]
            valid = chunk.shape[0]
            bucket = next(b for b in self.batch_buckets if b >= valid)
            if valid < bucket:
                reps = np.zeros((bucket - valid,), np.int64)
                chunk = np.concatenate([chunk, chunk[reps]], axis=0)
            key = self._rng
            if self.sample:  # fresh draws per call, deterministic per seed
                self._rng, key = jax.random.split(self._rng)
            dev_chunk = (jax.device_put(np.ascontiguousarray(chunk),
                                        self._sharding)
                         if self._sharding is not None
                         else jax.device_put(chunk))
            pending.append((self._fn(self.frozen, self.params,
                                     self.batch_stats, dev_chunk, key),
                            valid))
            if len(pending) > 1:
                toks, v = pending.pop(0)
                rows.append(np.asarray(toks)[:v])
        for toks, v in pending:
            rows.append(np.asarray(toks)[:v])
        return np.concatenate(rows, axis=0)

    def __call__(self, images: Union[ImageLike, Sequence[ImageLike]]
                 ) -> Union[str, List[str]]:
        from depth_image_captioning_pub_tpu.data.tokenizer import (
            ids_to_caption)
        single = isinstance(images, (str, np.ndarray)) and (
            not isinstance(images, np.ndarray) or images.ndim == 3)
        batch: List[ImageLike] = [images] if single else list(images)
        toks = self.caption_tokens(self._to_arrays(batch))
        caps = [ids_to_caption(row, self.id_to_word) for row in toks]
        return caps[0] if single else caps
