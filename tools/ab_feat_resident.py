#!/usr/bin/env python
"""A/B: bf16-RESIDENT feature tensor through the f32 decode/train scans
(models/decoder.FEATURES_RESIDENT) vs the historical f32 materialized copy.

Motivation (round-5 train-step roofline, tools/ab_train_roofline.py): the
decoder fwd/bwd stages are bandwidth-bound on the per-step re-reads of the
[B,196,2048] feature tensor (~73% of HBM roofline at f32). The tensor's
VALUES are exactly bf16 (they come from the bf16 encoder), so storing it
f32 doubles the bytes for zero information. Keeping it bf16 and upcasting
inside the attention einsums is bit-exact f32 math — IF XLA fuses the
upcast into the einsum instead of hoisting a materialized f32 convert out
of the scan (loop-invariant code motion would erase the win).

This measures, in ONE process with interleaved warm windows:
  1. train step (batch 512): resident OFF vs ON — loss must be EXACTLY
     equal; report imgs/s both ways.
  2. cached greedy decode (decoder-only program, batch 500): tokens must
     be EXACTLY equal; report caps/s both ways.
  3. full eval pipeline (encoder + decode): tokens exact; caps/s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_feat_resident.py
"""

import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

import depth_image_captioning_pub_tpu.models.decoder as decoder_mod
from depth_image_captioning_pub_tpu.config import ConfigEval, ConfigTrain
from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_train_step, make_optimizer)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

VOCAB = 9956
HW = (224, 224)
MAX_LEN = 30
REPS = int(os.environ.get("AB_REPS", "3"))


def window_rate(fn, n_items, steps):
    t0 = time.perf_counter()
    fn(steps)
    return n_items * steps / (time.perf_counter() - t0)


def ab_train(batch=512, steps=15):
    from depth_image_captioning_pub_tpu.cli import resnet_layers_from_env
    cfg = ConfigTrain()
    cap = build_captioner("base-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32,
                          resnet_layers=resnet_layers_from_env())
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg.lr)
    rng = np.random.default_rng(0)
    dev = {k: jax.device_put(v) for k, v in {
        "images": rng.integers(0, 255, (batch, *HW, 3), dtype=np.uint8),
        "captions": rng.integers(4, VOCAB - 4, (batch, 30)).astype(np.int32),
        "lengths": rng.integers(8, 22, (batch,)).astype(np.int32),
        "pad_mask": np.ones((batch,), bool)}.items()}
    key = jax.random.PRNGKey(0)
    temp = jnp.float32(1.0)
    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))

    steps_by_flag = {}
    losses = {}
    for flag in (False, True):
        decoder_mod.FEATURES_RESIDENT = flag
        step = make_attention_train_step(cap.encoder_apply(),
                                         cap.decoder_apply(), opt,
                                         alpha_reg=cfg.alpha_reg,
                                         donate=False)
        s1, m1 = step(state, dev, key, temp)     # traces under `flag`
        losses[flag] = float(np.asarray(m1["loss"]))
        steps_by_flag[flag] = step
    dl = abs(losses[False] - losses[True])
    print(f"TRAIN loss off={losses[False]:.9f} on={losses[True]:.9f} "
          f"|diff|={dl:.3e} {'EXACT' if dl == 0.0 else 'DIFFERS'}",
          flush=True)

    def runner(step):
        def run(n):
            s, acc = state, None
            for i in range(n):
                s, m = step(s, dev, jax.random.fold_in(key, i), temp)
                acc = m["loss"] if acc is None else acc + m["loss"]
            assert np.isfinite(float(np.asarray(acc)))
        return run

    best = {False: 0.0, True: 0.0}
    for _ in range(REPS):
        for flag in (False, True):
            r = window_rate(runner(steps_by_flag[flag]), batch, steps)
            best[flag] = max(best[flag], r)
    print(f"TRAIN imgs/s off={best[False]:.1f} on={best[True]:.1f} "
          f"ratio={best[True] / best[False]:.3f}x", flush=True)
    return dl == 0.0


def ab_eval(batch=500, n_batches=4):
    from depth_image_captioning_pub_tpu.cli import resnet_layers_from_env
    cfg = ConfigEval()
    cap = build_captioner("base-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32,
                          resnet_layers=resnet_layers_from_env())
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    staged = [jax.device_put(rng.random((batch, *HW, 3), dtype=np.float32))
              for _ in range(2)]
    key = jax.random.PRNGKey(0)

    fns, toks, feats = {}, {}, None
    for flag in (False, True):
        decoder_mod.FEATURES_RESIDENT = flag
        fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN)
        out = [np.asarray(fn(frozen, params, stats, s, key))
               for s in staged]  # compile + warm under `flag`
        if feats is None:
            feats = [fn(frozen, params, stats, s, key,
                        return_cache=True)[1]["feats"] for s in staged]
        for f in feats:  # warm the cached program under `flag` too
            np.asarray(fn({}, params, stats, None, key, feats=f))
        fns[flag], toks[flag] = fn, out
    eq_full = all(np.array_equal(a, b)
                  for a, b in zip(toks[False], toks[True]))
    toks_c = {flag: [np.asarray(fns[flag]({}, params, stats, None, key,
                                          feats=f)) for f in feats]
              for flag in (False, True)}
    eq_cached = all(np.array_equal(a, b)
                    for a, b in zip(toks_c[False], toks_c[True]))
    print(f"EVAL tokens full={'EXACT' if eq_full else 'DIFFER'} "
          f"cached={'EXACT' if eq_cached else 'DIFFER'}", flush=True)

    def cached_runner(fn):
        def run(n):
            outs = [fn({}, params, stats, None, key,
                       feats=feats[i % 2]) for i in range(n)]
            np.asarray(jnp.concatenate(outs, axis=0))
        return run

    def full_runner(fn):
        def run(n):
            outs = [fn(frozen, params, stats, staged[i % 2], key)
                    for i in range(n)]
            np.asarray(jnp.concatenate(outs, axis=0))
        return run

    for label, mk in (("cached", cached_runner), ("full", full_runner)):
        best = {False: 0.0, True: 0.0}
        for _ in range(REPS):
            for flag in (False, True):
                r = window_rate(mk(fns[flag]), batch, n_batches)
                best[flag] = max(best[flag], r)
        print(f"EVAL {label} caps/s off={best[False]:.1f} "
              f"on={best[True]:.1f} ratio={best[True] / best[False]:.3f}x",
              flush=True)
    return eq_full and eq_cached


def main():
    small = os.environ.get("AB_SMALL")
    if small:
        ok_t = ab_train(batch=8, steps=2)
        ok_e = ab_eval(batch=8, n_batches=2)
    else:
        ok_t = ab_train()
        ok_e = ab_eval()
    print(f"RESIDENT-AB {'ALL-EXACT' if (ok_t and ok_e) else 'NOT-EXACT'}",
          flush=True)


if __name__ == "__main__":
    main()
