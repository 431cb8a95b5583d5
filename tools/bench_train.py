#!/usr/bin/env python
"""Training-step throughput sweep on the real chip.

Measures images/sec of the jitted train step (the exact program
``engine/train.py`` runs per batch: on-device uint8->float normalize,
frozen bf16 ResNet-152 forward under stop_gradient, decoder teacher-forced
scan fwd+bwd, AdamW update with donated state) for the three training
families. depth-soft is measured in its steady-state (epochs >= 1) shape:
depth maps arrive as inputs from the index-keyed cache, so DPT is NOT in
the step (reference: depth_train.py:196-202 rebuilds from cache the same
way).

Staged inputs + fetch-clocked like bench.py (block_until_ready does not
block on this backend; the accumulated on-device loss fetch is the clock).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train.py
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_train_step, make_nic_train_step,
    make_optimizer)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

VOCAB = 9956
HW = (224, 224)


def make_batch(batch: int, uses_depth: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    caps = rng.integers(4, VOCAB - 4, (batch, 30), dtype=np.int64)
    caps = caps.astype(np.int32)
    lengths = rng.integers(8, 22, (batch,)).astype(np.int32)
    arrays = {
        "images": rng.integers(0, 255, (batch, *HW, 3), dtype=np.uint8),
        "captions": caps,
        "lengths": lengths,
        "pad_mask": np.ones((batch,), bool),
    }
    if uses_depth:
        arrays["depth"] = rng.random((batch, *HW, 1), dtype=np.float32)
    return {k: jax.device_put(v) for k, v in arrays.items()}


def bench_kind(kind: str, batch: int, steps: int = 30,
               decoder_dtype=jnp.float32, accum: int = 1,
               features: bool = False, mfu_out: dict = None) -> float:
    from depth_image_captioning_pub_tpu.cli import resnet_layers_from_env
    cfg = ConfigTrain()
    cap = build_captioner(kind, VOCAB, cfg,
                          decoder_dtype=decoder_dtype,
                          resnet_layers=resnet_layers_from_env())
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg.lr)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))
    enc_apply = cap.encoder_apply(features_input=features)
    if kind == "nic":
        fn = make_nic_train_step(enc_apply, cap.decoder_apply(),
                                 opt, accum_steps=accum,
                                 features_input=features)
    else:
        alpha_reg = cfg.alpha_reg if "soft" in kind else 0.0
        fn = make_attention_train_step(
            enc_apply, cap.decoder_apply(), opt,
            alpha_reg=alpha_reg,
            depth_encoder_apply=cap.depth_encoder_apply(),
            accum_steps=accum,
            features_input=features)
    dev_batch = make_batch(batch, cap.spec.uses_depth)
    if features:
        # --feature-cache steady state: the step consumes precomputed
        # frozen features (bf16 grid / NIC pooled) instead of pixels.
        # Computed on device from the staged images — no extra H2D.
        feats = jax.jit(cap.cache_encode_fn())(frozen["encoder"],
                                               dev_batch["images"])
        dev_batch = {k: v for k, v in dev_batch.items() if k != "images"}
        dev_batch["features"] = feats
    temp = jnp.float32(1.0)
    key = jax.random.PRNGKey(0)

    if mfu_out is not None:
        # FLOPs per step via compiled-HLO cost analysis (bench.py turns it
        # into an MFU key). MUST run before the first real call: the step
        # donates its TrainState, and lowering from donated-deleted arrays
        # raises. lower/compile here is the same executable the warmup
        # compiles — one cache entry, no extra compile.
        try:
            a = (state, dev_batch, key) if kind == "nic" \
                else (state, dev_batch, key, temp)
            ca = fn.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            mfu_out["flops_per_step"] = float(ca["flops"])
        except Exception as e:
            print(f"train cost analysis unavailable: {e}", file=sys.stderr)

    def one(state, i):
        rng = jax.random.fold_in(key, i)
        if kind == "nic":
            return fn(state, dev_batch, rng)
        return fn(state, dev_batch, rng, temp)

    for i in range(3):  # compile + force the staged H2D before timing
        state, metrics = one(state, i)
        np.asarray(metrics["loss"])

    def run_window():
        nonlocal state
        loss_sum = None
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = one(state, 100 + i)
            loss_sum = metrics["loss"] if loss_sum is None \
                else loss_sum + metrics["loss"]
        final = float(np.asarray(loss_sum))  # the only host sync = the clock
        dt = time.perf_counter() - t0
        assert np.isfinite(final), final
        return steps * batch / dt

    # best-of windows: the rig can lose the host/tunnel to a co-tenant
    # mid-bench (bench.stable_rate has the measured incident table)
    try:
        from bench import stable_rate
    except ImportError:  # standalone use outside the repo root
        return run_window()
    return stable_rate(run_window, f"train-{kind}")


def main():
    args = list(sys.argv[1:])
    decoder_dtype, accum = jnp.float32, 1
    features_ab = False
    if "--features" in args:        # --feature-cache steady-state A/B
        args.remove("--features")
        features_ab = True
    if "--bf16" in args:            # mixed-precision decoder A/B
        args.remove("--bf16")
        decoder_dtype = jnp.bfloat16
    if "--accum" in args:
        i = args.index("--accum")
        if i + 1 >= len(args) or not args[i + 1].isdigit():
            sys.exit("usage: bench_train.py [--bf16] [--accum K] "
                     "[kind:batch,...]")
        accum = int(args[i + 1])
        del args[i:i + 2]
    plan = [("base-soft", b) for b in (128, 256, 512)]
    plan += [("depth-soft", b) for b in (64, 128, 256)]
    plan += [("base-hard", 256), ("nic", 256)]
    if args:  # e.g. "base-soft:256,nic:128"
        plan = [(k, int(b)) for k, b in
                (item.split(":") for item in args[0].split(","))]
    tag = ("bf16 " if decoder_dtype == jnp.bfloat16 else "") + \
        (f"accum={accum} " if accum > 1 else "")
    for kind, batch in plan:
        rate = bench_kind(kind, batch, decoder_dtype=decoder_dtype,
                          accum=accum)
        print(f"TRAIN {kind:<11s} batch {batch:<4d} {tag}{rate:9.1f} imgs/s",
              flush=True)
        if features_ab:  # same process, one change, back-to-back warm
            frate = bench_kind(kind, batch, decoder_dtype=decoder_dtype,
                               accum=accum, features=True)
            print(f"TRAIN {kind:<11s} batch {batch:<4d} {tag}"
                  f"{frate:9.1f} imgs/s [feature-cache, "
                  f"{frate / rate:.2f}x]", flush=True)


if __name__ == "__main__":
    main()
