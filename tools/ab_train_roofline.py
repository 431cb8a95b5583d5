#!/usr/bin/env python
"""Train-step roofline ablation (VERDICT r4 weak #4): where do the
base-soft train step's milliseconds go, and is MFU 0.33 a software gap or
the shapes' ceiling?

Five programs, all compiled in ONE process and timed as interleaved warm
windows (the only trustworthy comparison on this remote backend — see
STATUS.md on standalone-jitted timings), batch 512, the exact stage
decomposition of ``engine/steps.make_attention_train_step``:

  A full      pixels -> normalize + frozen bf16 ResNet-152 fwd +
              decoder scan fwd/bwd + AdamW       (the headline program)
  B features  the --feature-cache steady state: same step minus
              normalize+encoder (batch carries precomputed features)
  C fwd       loss_fn only on features            (decoder fwd)
  D fwd+bwd   jax.grad(loss_fn) on features       (no optimizer update)
  E encoder   normalize + encoder fwd only        (cross-checks A-B)

Stage costs by differencing:  encoder = A-B (checked vs E),
bwd = D-C, AdamW+state = B-D.  Each program also gets compiled-HLO
cost-analysis FLOPs (and bytes when the backend reports them), so every
stage prints achieved TFLOP/s vs the $BENCH_PEAK_TFLOPS bf16 peak and
the derived arithmetic intensity. The PERF.md "train-step frontier"
section is written from this table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_train_roofline.py
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.steps import (
    TrainState, make_attention_train_step, make_optimizer)
from depth_image_captioning_pub_tpu.models.captioner import build_captioner
from depth_image_captioning_pub_tpu.ops.image_ops import (
    imagenet_normalize, to_unit_float)

VOCAB = 9956
HW = (224, 224)
BATCH = int(os.environ.get("AB_TRAIN_BATCH", "512"))
STEPS = int(os.environ.get("AB_TRAIN_STEPS", "20"))
REPS = int(os.environ.get("AB_TRAIN_REPS", "3"))
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197.0"))


def cost(jitted, *args):
    """(flops, bytes) of one call from compiled-HLO cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan"))), \
            float(ca.get("bytes accessed", float("nan")))
    except Exception as e:
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
        return float("nan"), float("nan")


def main():
    from depth_image_captioning_pub_tpu.cli import resnet_layers_from_env
    cfg = ConfigTrain()
    cap = build_captioner("base-soft", VOCAB, cfg,
                          resnet_layers=resnet_layers_from_env())
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    opt = make_optimizer(cfg.lr)

    rng = np.random.default_rng(0)
    batch_np = {
        "images": rng.integers(0, 255, (BATCH, *HW, 3), dtype=np.uint8),
        "captions": rng.integers(4, VOCAB - 4, (BATCH, 30)).astype(np.int32),
        "lengths": rng.integers(8, 22, (BATCH,)).astype(np.int32),
        "pad_mask": np.ones((BATCH,), bool),
    }
    dev = {k: jax.device_put(v) for k, v in batch_np.items()}
    feats = jax.jit(cap.cache_encode_fn())(frozen["encoder"], dev["images"])
    dev_feat = {k: v for k, v in dev.items() if k != "images"}
    dev_feat["features"] = feats
    key = jax.random.PRNGKey(0)
    temp = jnp.float32(1.0)

    # --- the five programs (no donation: each window reuses its state) ---
    enc_px = cap.encoder_apply()
    enc_ft = cap.encoder_apply(features_input=True)
    dec = cap.decoder_apply()

    step_full = make_attention_train_step(enc_px, dec, opt,
                                          alpha_reg=cfg.alpha_reg,
                                          donate=False)
    step_feat = make_attention_train_step(enc_ft, dec, opt,
                                          alpha_reg=cfg.alpha_reg,
                                          donate=False, features_input=True)

    from depth_image_captioning_pub_tpu.engine.losses import caption_loss

    def loss_fn(p, batch, r):
        features = jax.lax.stop_gradient(enc_ft(frozen["encoder"],
                                                batch["features"]))
        logits, alphas = dec(p["decoder"], features, batch["captions"],
                             None, train=True, temp=temp, rng=r)
        loss, _m = caption_loss(logits, batch["captions"], batch["lengths"],
                                alphas, batch.get("pad_mask"), cfg.alpha_reg)
        return loss

    fwd_only = jax.jit(loss_fn)
    fwd_bwd = jax.jit(lambda p, b, r: jax.value_and_grad(loss_fn)(p, b, r))

    def enc_only_fn(fz, images):
        f = enc_px(fz["encoder"], imagenet_normalize(to_unit_float(images)))
        return f.sum(dtype=jnp.float32)   # scalar fetch = the clock

    enc_only = jax.jit(enc_only_fn)

    state = TrainState(params, opt.init(params), frozen, stats, jnp.int32(0))

    # --- window runners: every program chains a scalar so the fetch at the
    # end of the window forces the whole window's device work ---
    def w_full():
        s, acc = state, None
        t0 = time.perf_counter()
        for i in range(STEPS):
            s, m = step_full(s, dev, jax.random.fold_in(key, i), temp)
            acc = m["loss"] if acc is None else acc + m["loss"]
        assert np.isfinite(float(np.asarray(acc)))
        return time.perf_counter() - t0

    def w_feat():
        s, acc = state, None
        t0 = time.perf_counter()
        for i in range(STEPS):
            s, m = step_feat(s, dev_feat, jax.random.fold_in(key, i), temp)
            acc = m["loss"] if acc is None else acc + m["loss"]
        assert np.isfinite(float(np.asarray(acc)))
        return time.perf_counter() - t0

    def w_fwd():
        acc = None
        t0 = time.perf_counter()
        for i in range(STEPS):
            l = fwd_only(params, dev_feat, jax.random.fold_in(key, i))
            acc = l if acc is None else acc + l
        assert np.isfinite(float(np.asarray(acc)))
        return time.perf_counter() - t0

    def w_fwdbwd():
        acc = None
        t0 = time.perf_counter()
        for i in range(STEPS):
            l, _g = fwd_bwd(params, dev_feat, jax.random.fold_in(key, i))
            acc = l if acc is None else acc + l
        assert np.isfinite(float(np.asarray(acc)))
        return time.perf_counter() - t0

    def w_enc():
        acc = None
        t0 = time.perf_counter()
        for _ in range(STEPS):
            v = enc_only(frozen, dev["images"])
            acc = v if acc is None else acc + v
        assert np.isfinite(float(np.asarray(acc)))
        return time.perf_counter() - t0

    progs = [("A full", w_full), ("B features", w_feat), ("C fwd", w_fwd),
             ("D fwd+bwd", w_fwdbwd), ("E encoder", w_enc)]

    # FLOPs/bytes per call (before any donation could bite; none here)
    fb = {
        "A full": cost(step_full, state, dev, key, temp),
        "B features": cost(step_feat, state, dev_feat, key, temp),
        "C fwd": cost(fwd_only, params, dev_feat, key),
        "D fwd+bwd": cost(fwd_bwd, params, dev_feat, key),
        "E encoder": cost(enc_only, frozen, dev["images"]),
    }

    for name, w in progs:   # compile + warm every program first
        w()

    best = {name: float("inf") for name, _ in progs}
    for rep in range(REPS):   # interleaved: co-tenant dips hit all equally
        for name, w in progs:
            best[name] = min(best[name], w() / STEPS)
        print(f"rep {rep}: " + "  ".join(
            f"{n}={best[n] * 1e3:.1f}ms" for n, _ in progs), flush=True)

    def row(name, ms, fl, by):
        # `ms` is actually seconds-per-step; the *1e3 below renders ms
        tf = fl / ms / 1e12 if np.isfinite(fl) else float("nan")
        gbs = by / ms / 1e9 if np.isfinite(by) else float("nan")
        print(f"{name:<22s} {ms * 1e3:7.2f} ms  "
              f"{BATCH / ms:8.0f} imgs/s  "
              f"{fl / 1e12:6.2f} TF  {tf:6.1f} TF/s "
              f"({tf / PEAK_TFLOPS * 100:4.1f}% peak)  {gbs:7.1f} GB/s",
              flush=True)

    print(f"\n=== base-soft train-step roofline, batch {BATCH}, "
          f"best-of-{REPS} interleaved windows ===")
    for name, _ in progs:
        row(name, best[name], *fb[name])

    print("\n--- derived stages (by differencing) ---")
    d_enc = best["A full"] - best["B features"]
    d_bwd = best["D fwd+bwd"] - best["C fwd"]
    d_opt = best["B features"] - best["D fwd+bwd"]
    fl = {k: v[0] for k, v in fb.items()}
    by = {k: v[1] for k, v in fb.items()}
    row("encoder fwd (A-B)", d_enc, fl["A full"] - fl["B features"],
        by["A full"] - by["B features"])
    row("  (cross-check E)", best["E encoder"], *fb["E encoder"])
    row("decoder fwd (C)", best["C fwd"], *fb["C fwd"])
    row("decoder bwd (D-C)", d_bwd, fl["D fwd+bwd"] - fl["C fwd"],
        by["D fwd+bwd"] - by["C fwd"])
    row("AdamW+state (B-D)", d_opt, fl["B features"] - fl["D fwd+bwd"],
        by["B features"] - by["D fwd+bwd"])


if __name__ == "__main__":
    main()
