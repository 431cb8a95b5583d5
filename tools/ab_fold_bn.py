"""In-pipeline A/B: frozen-BN folding in the base-soft ResNet-152 encoder.

Measures the full caption program (normalize + encoder + 30-step greedy
scan) with the stock conv+BN backbone vs the fold_bn=True backbone fed by
fold_batchnorm()-folded params, back-to-back warm in one process (the only
measurement the rig trusts — STATUS.md). Also reports greedy token
agreement between the two paths (bf16 rounding placement differs).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_fold_bn.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

VOCAB = 9956
BATCH = 500
N_IMAGES = 4000
HW = (224, 224)


def main():
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.models.resnet import (
        AttentionGridEncoder, fold_batchnorm)

    cfg = ConfigEval()
    cap = build_captioner("base-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    fn_plain = make_caption_fn(cap, start_id=VOCAB - 4, max_length=30)

    cap_f = build_captioner("base-soft", VOCAB, cfg,
                            encoder_dtype=jnp.bfloat16,
                            decoder_dtype=jnp.float32)
    cap_f.encoder = AttentionGridEncoder(
        enc_img_size=cfg.enc_img_size, dtype=jnp.bfloat16, fold_bn=True)
    frozen_f = {"encoder": jax.device_put(
        fold_batchnorm(jax.tree_util.tree_map(np.asarray,
                                              frozen["encoder"])))}
    fn_fold = make_caption_fn(cap_f, start_id=VOCAB - 4, max_length=30)

    rng = np.random.default_rng(0)
    n_stage = 2
    staged = [jax.device_put(rng.random((BATCH, *HW, 3), dtype=np.float32))
              for _ in range(n_stage)]
    key = jax.random.PRNGKey(0)

    # warm both + force every staged H2D (bench.py's staging lesson)
    toks_p = [np.asarray(fn_plain(frozen, params, stats, s, key))
              for s in staged]
    toks_f = [np.asarray(fn_fold(frozen_f, params, stats, s, key))
              for s in staged]
    agree = np.mean([np.mean(a == b) for a, b in zip(toks_p, toks_f)])
    print(f"token agreement plain vs folded: {agree:.4%}")

    def run(fn, fz):
        n_batches = N_IMAGES // BATCH
        t0 = time.perf_counter()
        outs = [fn(fz, params, stats, staged[i % n_stage], key)
                for i in range(n_batches)]
        tokens = np.asarray(jnp.concatenate(outs, axis=0))
        dt = time.perf_counter() - t0
        assert tokens.shape[0] == N_IMAGES
        return N_IMAGES / dt

    # interleave A/B/A/B to cancel drift
    for rep in range(2):
        a = run(fn_plain, frozen)
        b = run(fn_fold, frozen_f)
        print(f"rep{rep}: plain {a:.1f} caps/s   folded {b:.1f} caps/s   "
              f"ratio {b / a:.3f}x")


if __name__ == "__main__":
    main()
