"""Evaluation: batched caption generation + metric scoring.

Re-design of the reference's eval loops (Base_evaluation
base_evaluation.py:23-168, Cdepth_evaluation depth_evaluation.py:26-194,
evaluation_nic nic.py:360-455): load the frozen val-subset indices, generate
a caption per image with greedy decode, detokenize, score with
BLEU/METEOR/ROUGE-L/CIDEr over 3 checkpoint sets, pickle the score lists.

The hot path is one jitted function per model: normalize -> frozen encoder ->
(depth encoder) -> 30-step ``lax.scan`` greedy decode, entirely on-device.
The reference instead synced argmax IDs to host *every step of every batch*
(base_caption_models.py:243-244) — eliminating those 30 round-trips per
batch is the main single-chip speedup lever (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.data.pipeline import Prefetcher, eval_batches
from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL, ids_to_caption
from depth_image_captioning_pub_tpu.metrics import load_textfiles, score
from depth_image_captioning_pub_tpu.models.captioner import Captioner

METRIC_KEYS = ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L",
               "CIDEr")


def make_caption_fn(cap: Captioner, start_id: int, max_length: int = 30,
                    depth_fn: Optional[Callable] = None,
                    beam_size: int = 1, end_id: Optional[int] = None,
                    length_penalty: float = 0.0,
                    use_pallas: bool = False,
                    sampling: Optional[Dict] = None,
                    pallas_mesh=None) -> Callable:
    """Build the jitted end-to-end caption function for one model config.

    Returns fn(frozen, trainable_params, batch_stats, images, rng) ->
    tokens [B, max_length] int32, where ``frozen`` is the frozen-variables
    dict: {"encoder": ..., "dpt": ...}. ``depth_fn(dpt_vars, images)`` is a
    PURE function producing standardized [B,224,224,1] depth maps; DPT
    variables ride in ``frozen["dpt"]`` as runtime arguments (closing 123M
    params into the jit graph overflows the remote compiler with HTTP 413
    and would bake weights into the executable).

    ``beam_size=1`` is the reference's greedy decode (token-ID parity path);
    ``beam_size>1`` switches to batched beam search (requires ``end_id``).

    ``sampling`` (beam_size 1, no pallas): a dict of
    {"temperature", "top_k", "top_p"} switches the scan to stochastic
    decoding (AttentionDecoder.stochastic_sample /
    NICDecoder.stochastic_sample) — deterministic per the ``rng``
    argument; temperature -> 0 or top_k=1 reproduces greedy.

    ``pallas_mesh`` (with ``use_pallas`` on a multi-chip host): the 1-axis
    mesh the caller shards batches over — the whole-sequence kernels run
    per-device batch shards via shard_map (pallas_call does not partition
    under GSPMD). Callers must place images/params on the same mesh.
    """
    from depth_image_captioning_pub_tpu.models.decoder import AttentionDecoder
    from depth_image_captioning_pub_tpu.models.nic import NICDecoder
    from depth_image_captioning_pub_tpu.ops.image_ops import (
        imagenet_normalize, to_unit_float)

    if beam_size > 1 and end_id is None:
        raise ValueError("beam search needs end_id (<end> token)")
    if sampling is not None and (beam_size > 1 or use_pallas):
        raise ValueError("stochastic sampling is a greedy-scan variant "
                         "(no beam/pallas)")
    encoder_apply = cap.encoder_apply()
    sample_apply = cap.sample_apply()
    depth_encoder_apply = cap.depth_encoder_apply()

    if cap.spec.is_nic:
        from depth_image_captioning_pub_tpu.ops.pooling import global_avg_pool

        @partial(jax.jit, static_argnames=("return_cache",))
        def caption_fn(frozen, params, batch_stats, images, rng,
                       pooled=None, return_cache=False):
            # ``pooled`` short-circuits the frozen backbone with its cached
            # [B,2048] pooled output (the eval set cache); the trainable
            # enc_linear projection still runs per checkpoint set. Same math
            # as Captioner.encoder_apply, split at the frozen boundary.
            if pooled is None:
                x = imagenet_normalize(to_unit_float(images))
                pooled = global_avg_pool(
                    cap.backbone.apply(frozen["encoder"], x))
            feats = cap.projection.apply({"params": params["enc_linear"]},
                                         pooled)
            if beam_size > 1:
                tokens, _ = cap.decoder.apply(
                    {"params": params["decoder"]}, feats, end_id,
                    beam_size=beam_size, max_length=max_length,
                    length_penalty=length_penalty, early_exit=True,
                    method=NICDecoder.beam_sample)
            elif sampling is not None:
                tokens = cap.decoder.apply(
                    {"params": params["decoder"]}, feats, rng,
                    max_length=max_length,
                    temperature=sampling.get("temperature", 1.0),
                    top_k=sampling.get("top_k", 0),
                    top_p=sampling.get("top_p", 1.0),
                    method=NICDecoder.stochastic_sample)
            else:
                tokens = sample_apply(params["decoder"], feats,
                                      max_length=max_length,
                                      use_pallas=use_pallas,
                                      pallas_mesh=pallas_mesh)
            return (tokens, {"pooled": pooled}) if return_cache else tokens
        return caption_fn

    @partial(jax.jit, static_argnames=("return_depth", "return_cache"))
    def caption_fn(frozen, params, batch_stats, images, rng,
                   depth_maps=None, return_depth=False, feats=None,
                   return_cache=False):
        # ``depth_maps``/``feats`` short-circuit the frozen stages with
        # precomputed values (the eval set cache: DPT and the attention
        # encoder are frozen, so values captured on checkpoint set 1 are
        # bit-identical to a recompute). ``return_depth=True`` returns the
        # maps alone; ``return_cache=True`` returns the full cache entry.
        if feats is None:
            images = to_unit_float(images)
            feats = encoder_apply(frozen["encoder"],
                                  imagenet_normalize(images))
        elif depth_encoder_apply is not None and depth_maps is None:
            raise ValueError("cached feats for a depth model need cached "
                             "depth maps too (images are not re-read)")
        dep = None
        if depth_encoder_apply is not None:
            if depth_maps is None:
                depth_maps = depth_fn(frozen["dpt"], images)
            dep, _ = depth_encoder_apply(params["depth_encoder"],
                                         batch_stats, depth_maps,
                                         train=False)
        if beam_size > 1:
            # use_pallas routes the whole search through one VMEM-resident
            # kernel (ops/pallas/beam_seq.py; soft attention only)
            # early_exit stops the search once every beam has emitted <end>
            # (exact — ops/decode.beam_search); mirrors the greedy path's
            # end_id-driven early exit below.
            tokens, _ = cap.decoder.apply(
                {"params": params["decoder"]}, feats, start_id, end_id, dep,
                beam_size=beam_size, max_length=max_length,
                length_penalty=length_penalty, rng=rng,
                use_pallas=use_pallas, early_exit=not use_pallas,
                pallas_mesh=pallas_mesh,
                method=AttentionDecoder.beam_sample)
            if return_cache:
                return tokens, {"feats": feats, "depth_maps": depth_maps}
            return (tokens, depth_maps) if return_depth else tokens
        # end_id (when known) turns on early-exit greedy decode: the scan
        # stops once every caption in the batch has emitted <end>.
        # use_pallas instead routes the whole sequence through one fused
        # kernel (1.9x decode speed; near-tie argmax steps may flip).
        if sampling is not None:
            tokens, _ = cap.decoder.apply(
                {"params": params["decoder"]}, feats, start_id, rng, dep,
                max_length=max_length,
                temperature=sampling.get("temperature", 1.0),
                top_k=sampling.get("top_k", 0),
                top_p=sampling.get("top_p", 1.0),
                method=AttentionDecoder.stochastic_sample)
        else:
            tokens, _ = sample_apply(params["decoder"], feats, start_id, dep,
                                     max_length=max_length, rng=rng,
                                     end_id=end_id, use_pallas=use_pallas,
                                     pallas_mesh=pallas_mesh)
        if return_cache:
            return tokens, {"feats": feats, "depth_maps": depth_maps}
        return (tokens, depth_maps) if return_depth else tokens
    return caption_fn


def generate_captions(caption_fn: Callable, frozen, params, batch_stats,
                      dataset, word_to_id: Dict[str, int],
                      id_to_word: Dict[int, str], batch_size: int,
                      rng: Optional[jax.Array] = None,
                      max_length: int = 30,
                      prefetch: int = 3,
                      sharding=None,
                      depth_cache: Optional[List] = None,
                      depth_cache_mode: Optional[str] = None,
                      set_cache: Optional[Dict] = None,
                      set_cache_mode: Optional[str] = None
                      ) -> Tuple[List[str], List[List[str]]]:
    """Caption every image in ``dataset``; returns (hypotheses, references).

    Host detokenization overlaps the next batch's decode: we only block on a
    device array one batch behind.

    ``sharding`` (a batch-dim NamedSharding) data-parallelizes decode over
    the mesh: each batch is padded up to a device-divisible size and placed
    sharded; GSPMD splits the whole caption program per device with no
    cross-device collectives (per-image computation is independent).
    Callers must pass params/frozen already replicated on the same mesh.

    ``depth_cache``/``depth_cache_mode`` implement the exact multi-set depth
    cache: mode "fill" captures each batch's DPT depth maps (device arrays,
    appended to ``depth_cache``), mode "use" feeds ``depth_cache[i]`` back
    so the compiled program skips the DPT forward entirely. Batching is
    deterministic (eval_batches), so batch ``i`` covers the same images on
    every pass; DPT is frozen, so cached maps are bit-identical to a
    recompute and captions cannot change.

    ``set_cache``/``set_cache_mode`` generalize that to EVERY frozen eval
    stage: mode "fill" captures per-batch cache entries (attention models:
    encoder features + depth maps; NIC: the pooled backbone output) plus
    the reference lists; mode "use" replays them — no dataset pass, no
    host JPEG decode, no image transfer, and the compiled program runs
    only the per-set trainable stages (projection/depth encoder/decoder).
    Callers must guarantee the frozen encoder params are identical to the
    fill pass's (evaluate() checks this across checkpoint sets).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    pad_to = batch_size
    if sharding is not None:
        from depth_image_captioning_pub_tpu.parallel.mesh import (
            pad_batch_to_devices)
        pad_to = pad_batch_to_devices(batch_size, sharding.mesh.size)
    hypos: List[str] = []
    refs: List[List[str]] = []
    pending: List[Tuple[jax.Array, int]] = []

    def drain(entry):
        tokens, n_valid = entry
        toks = np.asarray(tokens)[:n_valid]
        for row in toks:
            hypos.append(ids_to_caption(row, id_to_word))

    if set_cache_mode == "use":
        # replay the cached frozen-stage outputs: device-only work, no
        # dataset iteration (references were captured on the fill pass)
        for aux, n_valid in set_cache["entries"]:
            rng, key = jax.random.split(rng)
            tokens = caption_fn({}, params, batch_stats, None, key, **aux)
            pending.append((tokens, n_valid))
            if len(pending) > 1:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)
        return hypos, [list(r) for r in set_cache["refs"]]

    def staged(batches):
        """Start the host->device image transfer from the prefetch thread:
        jax.device_put is async, so the PCIe/tunnel copy overlaps the
        previous batch's decode instead of serializing in the timed loop
        (measured on the bench rig: e2e 36.7 -> see BENCH_r03 after)."""
        for b in batches:
            if sharding is not None:
                yield b, jax.device_put(np.ascontiguousarray(b.images),
                                        sharding)
            else:
                yield b, jax.device_put(b.images)

    it = Prefetcher(staged(eval_batches(dataset, word_to_id, batch_size,
                                        pad_to=pad_to)), depth=prefetch)
    for i, (batch, dev_images) in enumerate(it):
        refs.extend(batch.references)
        rng, key = jax.random.split(rng)
        n_valid = int(batch.pad_mask.sum())
        if set_cache_mode == "fill":
            tokens, aux = caption_fn(frozen, params, batch_stats,
                                     dev_images, key, return_cache=True)
            set_cache["entries"].append((aux, n_valid))
        elif depth_cache_mode == "fill":
            tokens, dmaps = caption_fn(frozen, params, batch_stats,
                                       dev_images, key, return_depth=True)
            depth_cache.append(dmaps)
        elif depth_cache_mode == "use":
            tokens = caption_fn(frozen, params, batch_stats, dev_images,
                                key, depth_cache[i])
        else:
            tokens = caption_fn(frozen, params, batch_stats, dev_images, key)
        pending.append((tokens, n_valid))
        if len(pending) > 1:
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)
    if set_cache_mode == "fill":
        set_cache["refs"] = [list(r) for r in refs]
    return hypos, refs


def _trees_equal(ref, other) -> bool:
    """Exact equality of two pytrees (structure + every array value).

    Guards the frozen-feature cache: reusing set 1's encoder features for
    set k is only valid if set k's encoder params are identical. Loader
    output is host numpy (msgpack), so this is a cheap memcmp-style pass."""
    la, sa = jax.tree_util.tree_flatten(ref)
    lb, sb = jax.tree_util.tree_flatten(other)
    if sa != sb or len(la) != len(lb):
        return False
    return all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(la, lb))


def _projected_cache_bytes(cap: Captioner, cfg, n_images: int,
                           uses_depth: bool) -> int:
    """Upper-bound estimate of the frozen-stage cache's device footprint:
    attention models cache [B, regions, dim_encoder] features (+ depth
    maps), NIC caches the [B, dim_encoder] pooled backbone output."""
    itemsize = jnp.dtype(cap.encoder_dtype).itemsize
    regions = 1 if cap.spec.is_nic else int(cfg.enc_img_size) ** 2
    per_img = regions * int(cfg.dim_encoder) * itemsize
    if uses_depth:
        per_img += 224 * 224 * 4  # standardized maps, f32 worst case
    return per_img * n_images


def evaluate(kind: str, use_data: str, cap: Captioner,
             checkpoint_loader: Callable[[int], Tuple],
             dataset, word_to_id: Dict[str, int], id_to_word: Dict[int, str],
             cfg: Optional[ConfigEval] = None,
             depth_fn: Optional[Callable] = None,
             dpt_variables=None,
             num_sets: int = 3,
             scores_pickle: Optional[str] = None,
             beam_size: int = 1,
             use_pallas: bool = False,
             depth_eval_cache: bool = True,
             eval_cache_dir: Optional[str] = None,
             quiet: bool = False) -> Dict[str, List[float]]:
    """Score ``num_sets`` checkpoint sets (reference: base_evaluation.py:
    123-166 accumulates per-metric lists over 3 sets and pickles them).

    ``checkpoint_loader(set_index)`` -> (frozen_enc, params, batch_stats).

    ``depth_eval_cache`` (num_sets > 1): every frozen eval stage depends
    only on the images, yet the reference recomputes all of it for every
    checkpoint set (depth_evaluation.py:154-158). Set 1 captures each
    batch's frozen-stage outputs as device arrays (attention models:
    encoder features + DPT depth maps; NIC: the pooled backbone output)
    plus the reference lists; sets 2+ replay them — no dataset pass, no
    host JPEG decode, no image transfer, and the compiled program runs
    only the per-set trainable stages. Bit-identical scores, guarded by an
    exact equality check of each set's frozen encoder params against set
    1's (on mismatch, depth models still replay the shared-DPT depth
    maps). Device memory is bounded by $DCAP_EVAL_CACHE_GB (default 8;
    the COCO-val-4000 subset needs ~3.2 GB in bf16 + 0.8 GB of maps) —
    over the bound it degrades to the depth-only cache.
    ``--no-eval-cache`` / ``--no-depth-eval-cache`` opt out entirely.

    ``eval_cache_dir`` additionally persists the captured frozen-stage
    outputs to disk (engine/eval_cache_store.py), keyed by digests of the
    dataset (paths/sizes/mtimes/captions/batching) and the frozen params +
    knobs: later INVOCATIONS replay them bit-exactly — no JPEG decode, no
    ResNet/DPT forward — including ``--num-sets 1`` runs. Any key mismatch
    silently refills.
    """
    cfg = cfg or ConfigEval()
    start_id = word_to_id[SPECIAL.start]
    # Data-parallel over every visible device, mirroring the train engine
    # (engine/train.py builds its mesh unconditionally): params replicated,
    # batch dim sharded, no flag needed. The reference is single-device
    # (config.py:68); this is the framework's own scaling capability.
    # Pallas kernels don't partition under GSPMD; with --pallas-decode the
    # whole-sequence kernels instead run per-device batch shards through
    # their shard_map dispatch (pallas_mesh -> decode_seq.shard_over_batch,
    # same mesh, no collectives), so multi-chip eval covers both paths.
    sharding = None
    pallas_mesh = None
    if jax.device_count() > 1:
        from depth_image_captioning_pub_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicate)
        mesh = make_mesh()
        sharding = batch_sharding(mesh)
        if use_pallas:
            pallas_mesh = mesh
    caption_fn = make_caption_fn(cap, start_id, cfg.max_length, depth_fn,
                                 beam_size=beam_size,
                                 end_id=word_to_id[SPECIAL.end],
                                 use_pallas=use_pallas,
                                 pallas_mesh=pallas_mesh)
    scores: Dict[str, List[float]] = {k: [] for k in METRIC_KEYS}
    # the disk cache makes even --num-sets 1 runs cacheable across
    # invocations, so it turns the machinery on by itself
    cache_on = depth_eval_cache and (num_sets > 1
                                     or eval_cache_dir is not None)
    uses_depth = dpt_variables is not None
    set_cache: Optional[Dict] = None
    if cache_on:
        projected = _projected_cache_bytes(cap, cfg, len(dataset),
                                           uses_depth)
        limit = float(os.environ.get("DCAP_EVAL_CACHE_GB", "8")) * 2**30
        if projected <= limit:
            set_cache = {"entries": [], "refs": None}
        elif not quiet:
            print(f"eval set cache would need ~{projected / 2**30:.1f} GB "
                  f"(> DCAP_EVAL_CACHE_GB={limit / 2**30:.0f}); caching "
                  f"{'depth maps only' if uses_depth else 'nothing'}")
    # depth-only fallback: the DPT variables are shared across sets by
    # construction, so depth maps need no equality guard
    depth_cache: Optional[List] = [] if (
        cache_on and uses_depth and set_cache is None) else None
    # disk persistence (eval_cache_store): key the dataset+batching once;
    # the model key needs set 1's frozen params, so it's computed in-loop
    store = dkey = mkey = None
    if set_cache is not None and eval_cache_dir:
        from depth_image_captioning_pub_tpu.engine import eval_cache_store
        pad_to = cfg.batch_size
        if sharding is not None:
            from depth_image_captioning_pub_tpu.parallel.mesh import (
                pad_batch_to_devices)
            pad_to = pad_batch_to_devices(cfg.batch_size, mesh.size)
        dkey = eval_cache_store.data_key(dataset, cfg.batch_size, pad_to)
        if dkey is None:
            if not quiet:
                print("eval cache dir: dataset has no fingerprintable "
                      "image paths; disk persistence off")
        else:
            store = eval_cache_store
    if num_sets == 1 and store is None:
        # a single set with no usable disk store has nothing to replay a
        # filled cache into — don't hold gigabytes of frozen-stage outputs
        # on device for a pass that never reuses them
        set_cache = None
        depth_cache = None
    enc_ref = None
    for set_idx in range(1, num_sets + 1):
        frozen_enc, params, batch_stats = checkpoint_loader(set_idx)
        set_mode = depth_mode = None
        if set_idx == 1:
            if set_cache is not None:
                enc_ref = jax.tree_util.tree_map(np.asarray, frozen_enc)
                set_mode = "fill"
                if store is not None:
                    mkey = store.model_key(frozen_enc, dpt_variables,
                                           cap.encoder_dtype, cfg, kind)
                    loaded = store.load(eval_cache_dir, dkey, mkey,
                                        sharding=sharding, quiet=quiet)
                    if loaded is not None:
                        set_cache.update(loaded)
                        set_mode = "use"
            elif depth_cache is not None:
                depth_mode = "fill"
        elif set_cache is not None:
            if _trees_equal(enc_ref, frozen_enc):
                set_mode = "use"
            else:
                # per-set encoder params genuinely differ (the reference's
                # frozen encoders never do): frozen features are invalid,
                # but the shared-DPT depth maps still replay exactly
                if not quiet:
                    print(f"set {set_idx}: encoder params differ from set "
                          f"1; frozen-feature cache skipped")
                if uses_depth:
                    depth_mode = "use"
                    depth_cache = [aux["depth_maps"]
                                   for aux, _ in set_cache["entries"]]
        elif depth_cache is not None:
            depth_mode = "use"

        if set_mode == "use":
            frozen = {}  # replay runs only per-set trainable stages
        else:
            frozen = {"encoder": frozen_enc}
            if uses_depth and depth_mode != "use":
                # depth-replay sets run a DPT-free program: skip shipping
                # (and, under a mesh, re-replicating) the 123M DPT params
                frozen["dpt"] = dpt_variables
        if sharding is not None:
            frozen = replicate(mesh, frozen)
            params = replicate(mesh, params)
            batch_stats = replicate(mesh, batch_stats)
        hypos, refs = generate_captions(
            caption_fn, frozen, params, batch_stats, dataset,
            word_to_id, id_to_word, cfg.batch_size,
            rng=jax.random.PRNGKey(set_idx), max_length=cfg.max_length,
            sharding=sharding, depth_cache=depth_cache,
            depth_cache_mode=depth_mode, set_cache=set_cache,
            set_cache_mode=set_mode)
        if set_idx == 1 and set_mode == "fill" and store is not None:
            store.save(eval_cache_dir, dkey, mkey, set_cache, quiet=quiet)
        ref, hypo = load_textfiles(refs, hypos)
        result = score(ref, hypo)
        if not quiet:
            print(result)
        for k, v in result.items():
            scores[k].append(v)
    if scores_pickle:
        with open(scores_pickle, "wb") as f:
            pickle.dump(scores, f)
    return scores
