"""Full training loop.

One parameterized loop replaces the reference's five near-identical epoch
loops (train_base_soft base_train.py:24, train_base_hard :248, train_nic
nic.py:178, train_Cdepth_soft depth_train.py:27, train_Cdepth_hard :338).
Shared skeleton there: CocoCaptions + collate DataLoader, AdamW on the
trainable subset, 150 epochs of train/val, per-epoch CSV loss rows, and
best-val-loss per-component checkpointing with fixed filenames.

TPU-native changes:
* one jitted train step per config (engine/steps.py), batches sharded over a
  1-D data mesh (parallel/mesh.py) — the reference is single-device;
* the frozen backbone runs inside the step; for depth models, DPT depth maps
  come from a precomputed per-image cache (engine/depth_cache.py) rather
  than the reference's epoch-0 dict keyed by caption text, fixing its
  key-collision and last-batch-size bugs (SURVEY.md §4.1) while preserving
  semantics;
* full-state orbax checkpoints allow resume (the reference cannot).
"""

from __future__ import annotations

import math
import os
import signal
import threading
import time
from itertools import islice
from typing import Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
from depth_image_captioning_pub_tpu.data.pipeline import Prefetcher, train_batches
from depth_image_captioning_pub_tpu.data.vocab import load_vocab
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_eval_step, make_attention_train_step,
    make_nic_eval_step, make_nic_train_step, make_optimizer)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner
from depth_image_captioning_pub_tpu.parallel.mesh import (
    make_mesh, pad_batch_to_devices, shard_batch, replicate)
from depth_image_captioning_pub_tpu.utils.checkpoint import save_component
from depth_image_captioning_pub_tpu.utils.logging import (
    CsvLossLog, JsonlLog, ProgressMeter)

_KIND_PREFIX = {"base-soft": "base_soft", "base-hard": "base_hard",
                "depth-soft": "depth_soft", "depth-hard": "depth_hard",
                "mdepth-soft": "mdepth_soft", "mdepth-hard": "mdepth_hard",
                "nic": "nic"}


def gumbel_temperature(epoch: int, temp_sch: int = 10) -> float:
    """Hard-attention temperature schedule: updated every ``temp_sch``
    epochs to max(cos(pi*epoch/360), 0.5), starting at 1.0
    (reference: base_train.py:239-246, :360, :371-373)."""
    if epoch < temp_sch:
        return 1.0
    e = (epoch // temp_sch) * temp_sch
    return float(max(math.cos(math.pi * e / 360.0), 0.5))


def _save_dir_kind(kind: str) -> str:
    return {"base-soft": "soft", "base-hard": "hard",
            "depth-soft": "depth_soft", "depth-hard": "depth_hard",
            "mdepth-soft": "depth_soft", "mdepth-hard": "depth_hard",
            "nic": "nic"}[kind]


def train(kind: str, ext: int, use_data: str = "coco",
          cfg: Optional[ConfigTrain] = None,
          depth_provider: Optional[Callable] = None,
          val_depth_provider: Optional[Callable] = None,
          datasets=None, word_to_id=None,
          num_epochs: Optional[int] = None,
          resnet_variables=None,
          quiet: bool = False,
          resnet_layers=None,
          resume: bool = False,
          checkpoint_every: int = 0,
          preempt_save: bool = True,
          preempt_event: Optional[threading.Event] = None,
          feature_cache: bool = False
          ) -> Dict[str, float]:
    """Train one configuration; returns summary metrics.

    kind: one of models.captioner.KINDS; ext: run index (0..2, the reference
    trains each config 3x — base_main.py:17); use_data: "coco" | "original".
    ``depth_provider(images_01_224)`` -> [B,224,224,1] standardized depth
    maps, required for depth kinds; ``datasets=(train_ds, val_ds)`` and
    ``word_to_id`` override file loading (used by tests/fixtures).
    ``resnet_variables`` injects bridged pretrained backbone weights.

    Preemption tolerance (checkpointing enabled, i.e. ``checkpoint_every``
    or ``resume``): SIGTERM — what a TPU-pod maintenance event or a
    preemptible-VM shutdown delivers — finishes the in-flight step, writes
    a MID-EPOCH full-state checkpoint (params, optimizer, rng position,
    partial loss sum), and returns cleanly. ``resume=True`` re-enters the
    same epoch at the next batch with the per-epoch rng re-derived and the
    already-consumed splits replayed, so a preempted-and-resumed run walks
    the identical state trajectory as an uninterrupted one. The reference
    loses the whole run on any interruption (SURVEY.md §5).
    ``preempt_event`` is a test hook equivalent to receiving SIGTERM.

    Multi-host (``jax.distributed`` via parallel/multihost.py): the loop is
    SPMD-safe as written — the mesh spans the global device set, every host
    feeds the same global batches (``shard_batch`` slices each host's
    addressable shards), and only process 0 writes artifacts (CSV/JSONL,
    best-component files, full-state checkpoints). For host-sharded input
    feeding use ``multihost.global_batch`` (tested two-process in
    tests/test_multihost.py).

    ``feature_cache=True`` materializes the frozen encoder's outputs once
    per image (train AND val splits) into digest-keyed disk memmaps under
    the save directory, then trains every epoch from cached features — the
    frozen conv stack never runs inside the step (engine/feature_cache.py;
    the reference re-runs its frozen ResNet-152 every epoch for 150
    epochs). Features are stored in the encoder's own dtype — the cached
    trajectory is bit-deterministic and matches the online one to FP
    tolerance (low bf16 bits reorder between the standalone encode and the
    GSPMD-fused step; tests/test_feature_cache.py).
    """
    cfg = cfg or ConfigTrain()
    use_ori = use_data == "original"
    if word_to_id is None:
        path = cfg.ori_word_to_id_file if use_ori else cfg.word_to_id_file
        word_to_id, _ = load_vocab(path)
    vocab_size = len(word_to_id)

    if datasets is None:
        train_anno = cfg.ori_train_anno_file if use_ori else cfg.train_anno_file
        val_anno = cfg.ori_val_anno_file if use_ori else cfg.val_anno_file
        train_ds = CocoCaptions(cfg.train_img_directory, train_anno)
        val_ds = CocoCaptions(cfg.val_img_directory, val_anno)
    else:
        train_ds, val_ds = datasets

    save_directory = cfg.save_dir(_save_dir_kind(kind), use_ori)
    os.makedirs(save_directory, exist_ok=True)
    prefix = _KIND_PREFIX[kind]
    suffix = f"{use_data}{ext}" if kind != "nic" else f"{ext}"
    sep = "_" if kind != "nic" else ""
    # Multi-host (jax.distributed): every process runs the same SPMD loop,
    # but only process 0 writes artifacts — duplicate CSV/checkpoint writes
    # from N hosts onto a shared filesystem would race/corrupt. Single
    # process => process_index()==0, so this is a no-op locally.
    lead = jax.process_index() == 0
    train_csv = CsvLossLog(f"{save_directory}/{prefix}_train_loss{sep}{suffix}.csv") \
        if lead else None
    val_csv = CsvLossLog(f"{save_directory}/{prefix}_val_loss{sep}{suffix}.csv") \
        if lead else None
    jsonl = JsonlLog(f"{save_directory}/{prefix}_metrics_{suffix}.jsonl") \
        if (cfg.log_jsonl and lead) else None

    cap = build_captioner(kind, vocab_size, cfg, resnet_layers=resnet_layers,
                          decoder_dtype=jnp.dtype(cfg.decoder_dtype).type)
    params, frozen, stats = cap.init(jax.random.PRNGKey(cfg.seed + ext))
    if resnet_variables is not None:
        frozen = dict(frozen, encoder=resnet_variables)

    # frozen-feature cache: one encoder pass per image total, every epoch
    # trains from the memmaps (digest-keyed per frozen params, so each
    # ext's random init — or a bridged checkpoint — gets its own files)
    feature_provider = val_feature_provider = None
    if feature_cache:
        from depth_image_captioning_pub_tpu.engine import feature_cache as fc
        encode_fn = cap.cache_encode_fn()
        probe = jnp.asarray(np.stack([train_ds.load_image(0)]))
        sd = jax.eval_shape(encode_fn, frozen["encoder"], probe)
        fdir = f"{save_directory}/feat_cache"
        feature_provider = fc.build_or_open(
            fdir, "train", train_ds, encode_fn, frozen["encoder"],
            sd.shape[1:], sd.dtype, batch_size=cfg.batch_size, quiet=quiet)
        val_feature_provider = fc.build_or_open(
            fdir, "val", val_ds, encode_fn, frozen["encoder"],
            sd.shape[1:], sd.dtype, batch_size=cfg.batch_size, quiet=quiet)

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    # with grad accumulation each microbatch must still split over devices
    pad_to = pad_batch_to_devices(cfg.batch_size, n_dev * cfg.grad_accum)

    opt = make_optimizer(cfg.lr)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    state = replicate(mesh, state)

    is_hard = "hard" in kind
    alpha_reg = cfg.alpha_reg if (not is_hard and kind != "nic") else 0.0
    enc_apply = cap.encoder_apply(features_input=feature_cache)
    if kind == "nic":
        step_fn = make_nic_train_step(enc_apply, cap.decoder_apply(),
                                      opt, accum_steps=cfg.grad_accum,
                                      features_input=feature_cache)
        val_fn = make_nic_eval_step(enc_apply, cap.decoder_apply(),
                                    features_input=feature_cache)
    else:
        step_fn = make_attention_train_step(
            enc_apply, cap.decoder_apply(), opt,
            alpha_reg=alpha_reg,
            depth_encoder_apply=cap.depth_encoder_apply(),
            accum_steps=cfg.grad_accum,
            features_input=feature_cache)
        val_fn = make_attention_eval_step(
            enc_apply, cap.decoder_apply(), alpha_reg=alpha_reg,
            depth_encoder_apply=cap.depth_encoder_apply(),
            hard_eval_sampling=is_hard,
            features_input=feature_cache)

    uses_depth = cap.spec.uses_depth
    if uses_depth and depth_provider is None:
        raise ValueError(f"{kind} needs a depth_provider")
    # an index-keyed (cached) train provider cannot serve the val set —
    # val indices address a different dataset
    val_provider = val_depth_provider or depth_provider

    def to_device(batch, provider=depth_provider, fprov=None):
        arrays = {"captions": batch.captions,
                  "lengths": batch.lengths, "pad_mask": batch.pad_mask}
        if fprov is not None:
            # cached frozen features replace pixels on the device path;
            # the depth provider below still sees host pixels when online
            arrays["features"] = fprov(batch.indices)
        else:
            arrays["images"] = batch.images
        if uses_depth:
            arrays["depth"] = provider(batch.images, batch.indices)
        return shard_batch(mesh, arrays)

    base_rng = jax.random.PRNGKey(cfg.seed * 7919 + ext)
    best_val = float("inf")
    epochs = num_epochs if num_epochs is not None else cfg.num_epochs
    summary: Dict[str, float] = {}

    # crash-safe resume (new capability; the reference loses the run on any
    # crash, SURVEY.md §5). The frozen backbone is rebuilt deterministically
    # above, so the checkpoint carries only the mutable state.
    start_epoch = 0
    resume_skip = 0        # batches already consumed in a mid-epoch resume
    resume_loss_sum = 0.0  # their on-device f32 loss sum (exact round trip)
    ckptr = None

    def ckpt_payload(epoch_, mid_epoch=0, batches_done=0, loss_sum_=0.0):
        # device arrays go straight in: the async save's snapshot copy
        # (np.array) is also the device fetch — one host copy, not two
        return {"params": state.params,
                "opt_state": state.opt_state,
                "batch_stats": state.batch_stats,
                "step": np.int32(int(state.step)),
                "epoch": epoch_, "best_val": best_val,
                "mid_epoch": np.int32(mid_epoch),
                "batches_done": np.int32(batches_done),
                "loss_sum": float(loss_sum_)}

    if checkpoint_every or resume:
        from depth_image_captioning_pub_tpu.utils.checkpoint import TrainCheckpointer
        ckptr = TrainCheckpointer(
            f"{save_directory}/full_state_{prefix}_{suffix}",
            async_save=True,  # overlap the orbax write with training
            keep=getattr(cfg, "checkpoint_keep", 0))
        if resume and (last := ckptr.latest_step()) is not None:
            template = {"params": state.params,
                        "opt_state": state.opt_state,
                        "batch_stats": state.batch_stats,
                        "step": np.int32(0), "epoch": 0,
                        "best_val": 0.0, "mid_epoch": np.int32(0),
                        "batches_done": np.int32(0), "loss_sum": 0.0}
            restored = ckptr.restore(last, template)
            state = TrainState(restored["params"], restored["opt_state"],
                               state.frozen, restored["batch_stats"],
                               jnp.asarray(restored["step"]))
            state = replicate(mesh, state)
            best_val = float(restored["best_val"])
            if int(restored["mid_epoch"]):
                # preemption checkpoint: re-enter the SAME epoch at the
                # next batch (rng replay + batch skip happen in the loop)
                start_epoch = int(restored["epoch"])
                resume_skip = int(restored["batches_done"])
                resume_loss_sum = float(restored["loss_sum"])
                if not quiet:
                    print(f"resumed mid-epoch {start_epoch} "
                          f"at batch {resume_skip}")
            else:
                start_epoch = int(restored["epoch"]) + 1
                if not quiet:
                    print(f"resumed from epoch {start_epoch - 1}")

    # Preemption trap: SIGTERM sets a flag; the loop below finishes the
    # in-flight step, saves a mid-epoch checkpoint, and returns cleanly.
    # Installed only when a checkpointer exists (otherwise there is nothing
    # durable to save into) and only from the main thread (signal rules).
    preempt = {"flag": False}

    def preempted() -> bool:
        return preempt["flag"] or (preempt_event is not None
                                   and preempt_event.is_set())

    prev_handler = None
    trap = (ckptr is not None and preempt_save
            and threading.current_thread() is threading.main_thread())
    if trap:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda s, f: preempt.update(flag=True))

    def finish_preempted(epoch_, mid_epoch, batches_done, loss_sum_):
        if lead:
            ckptr.save(epoch_, ckpt_payload(epoch_, mid_epoch=mid_epoch,
                                            batches_done=batches_done,
                                            loss_sum_=loss_sum_))
            ckptr.wait()
        if not quiet:
            where = f"batch {batches_done} of epoch {epoch_}" if mid_epoch \
                else f"end of epoch {epoch_}"
            print(f"preempted: checkpoint saved at {where}")
        summary["preempted"] = 1.0
        summary["best_val_loss"] = best_val
        summary["final_train_loss"] = train_loss
        return summary

    train_loss = float("nan")
    profiling = {"on": False}  # trace left open if profile_stop > total steps
    try:
      for epoch in range(start_epoch, epochs):
        # per-epoch rng derivation keeps resumed runs identical to
        # uninterrupted ones (sequential splitting would desync on resume)
        rng = jax.random.fold_in(base_rng, epoch)
        skip = resume_skip if epoch == start_epoch else 0
        for _ in range(skip):  # replay consumed splits (mid-epoch resume)
            rng, _ = jax.random.split(rng)
        temp = jnp.float32(gumbel_temperature(epoch, cfg.temp_sch))
        meter = ProgressMeter(cfg.moving_avg, desc=f"[epoch {epoch + 1}]",
                              quiet=quiet)
        t0 = time.time()
        # losses stay ON DEVICE during the epoch (the reference synced
        # loss.item() every step, base_train.py:170); one fetch per epoch
        loss_sum = jnp.float32(resume_loss_sum) if skip else None
        n_steps = skip
        host_step = int(state.step)
        batches = train_batches(
            train_ds, word_to_id, cfg.batch_size, cfg.max_caption_len,
            shuffle=True, seed=cfg.seed + ext, epoch=epoch, pad_to=pad_to)
        if skip:  # islice re-decodes the skipped batches; once, on resume
            batches = islice(batches, skip, None)
        it = Prefetcher(batches)
        for batch in it:
            rng, step_rng = jax.random.split(rng)
            dev_batch = to_device(batch, fprov=feature_provider)
            if cfg.profile_dir and host_step == cfg.profile_start:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling["on"] = True
            if kind == "nic":
                state, metrics = step_fn(state, dev_batch, step_rng)
            else:
                state, metrics = step_fn(state, dev_batch, step_rng, temp)
            host_step += 1
            if cfg.profile_dir and host_step == cfg.profile_stop:
                jax.profiler.stop_trace()
                profiling["on"] = False
            loss_dev = metrics["loss"]
            loss_sum = loss_dev if loss_sum is None else loss_sum + loss_dev
            n_steps += 1
            meter.update_lazy(lambda ld=loss_dev: ld)
            if preempted() and ckptr is not None:
                meter.close()
                it.close()  # unblock the prefetch thread we're abandoning
                return finish_preempted(epoch, 1, n_steps, float(loss_sum))
        meter.close()
        train_loss = (float(loss_sum) / n_steps) if n_steps else float("nan")
        if train_csv:
            train_csv.append(epoch, train_loss)
        if not quiet:
            print(f"[epoch:{epoch}] train loss: {train_loss}")

        # validation (device-accumulated, one fetch)
        val_sum = None
        n_val = 0
        itv = Prefetcher(train_batches(
            val_ds, word_to_id, cfg.batch_size, cfg.max_caption_len,
            shuffle=False, seed=cfg.seed, epoch=epoch, pad_to=pad_to))
        for batch in itv:
            rng, vrng = jax.random.split(rng)
            dev_batch = to_device(batch, provider=val_provider,
                                  fprov=val_feature_provider)
            if kind == "nic":
                metrics = val_fn(state, dev_batch)
            else:
                metrics = val_fn(state, dev_batch, vrng)
            val_sum = metrics["loss"] if val_sum is None \
                else val_sum + metrics["loss"]
            n_val += 1
        val_loss = (float(val_sum) / n_val) if n_val else float("nan")
        if val_csv:
            val_csv.append(epoch, val_loss)
        if not quiet:
            print(f"[epoch:{epoch}] Validation loss: {val_loss}")
        if jsonl:
            jsonl.append({"epoch": epoch, "train_loss": train_loss,
                          "val_loss": val_loss,
                          "epoch_seconds": time.time() - t0,
                          "temp": float(temp)})

        if val_loss < best_val:
            best_val = val_loss  # tracked on every host (control flow)
            if lead:
                _save_best(save_directory, prefix, suffix, sep, kind, state)
            if not quiet:
                print("best model parameters are changed")

        if preempted() and ckptr is not None:
            # flag raised during validation / logging: the epoch completed
            # normally, so save an ordinary end-of-epoch checkpoint
            return finish_preempted(epoch, 0, 0, 0.0)

        if ckptr is not None and checkpoint_every and lead \
                and (epoch + 1) % checkpoint_every == 0:
            ckptr.save(epoch, ckpt_payload(epoch))
    finally:
        if profiling["on"]:
            # profile window outran the run (or a preempt landed inside it):
            # close the trace so the tool dir is still usable
            jax.profiler.stop_trace()
        if trap:
            signal.signal(signal.SIGTERM, prev_handler)
        if ckptr is not None:
            ckptr.wait()  # drain any in-flight async write before returning
    summary["best_val_loss"] = best_val
    summary["final_train_loss"] = train_loss
    return summary


def _save_best(save_directory: str, prefix: str, suffix: str, sep: str,
               kind: str, state: TrainState) -> None:
    """Per-component best-val files with the reference's basenames
    (reference: base_train.py:227-234, depth_train.py:310-322)."""
    enc_name = f"{save_directory}/{prefix}_encoder_best{sep}{suffix}.pth"
    dec_name = f"{save_directory}/{prefix}_decoder_best{sep}{suffix}.pth"
    save_component(enc_name, jax.device_get(state.frozen["encoder"]))
    save_component(dec_name, jax.device_get(state.params["decoder"]))
    if "enc_linear" in state.params:
        save_component(f"{save_directory}/{prefix}_enc_linear_best{sep}{suffix}.pth",
                       jax.device_get(state.params["enc_linear"]))
    if "depth_encoder" in state.params:
        save_component(f"{save_directory}/{prefix}_D_encoder_best{sep}{suffix}.pth",
                       jax.device_get({"params": state.params["depth_encoder"],
                                       "batch_stats": state.batch_stats}))
