"""In-pipeline A/B: two-tap x2 upsample vs interp-matmul form (depth-soft).

Measures the full flagship caption program (DPT-hybrid 384^2 depth + frozen
ResNet-152 + depth CNN + 30-step greedy scan) with
``dpt.UPSAMPLE2X_TWO_TAP`` on vs off, back-to-back warm in one process (the
only measurement this rig trusts — STATUS.md). The knob is read at trace
time, so each caption fn is built and warmed under its flag value. Also
reports greedy token agreement (bf16 rounding placement differs: the
matmul form rounds through MXU bf16 passes, the two-tap form through
elementwise FMAs).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_two_tap_resize.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

VOCAB = 9956
BATCH = 64
N_IMAGES = 512
HW = (224, 224)
MAX_LEN = 30


def main():
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.models import dpt
    from depth_image_captioning_pub_tpu.models.dpt import DPTDepthEstimator

    cfg = ConfigEval()
    cap = build_captioner("depth-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    est = DPTDepthEstimator(dtype=jnp.bfloat16)
    frozen = dict(frozen, dpt=est.init(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(0)
    n_stage = 2
    staged = [jax.device_put(rng.random((BATCH, *HW, 3), dtype=np.float32))
              for _ in range(n_stage)]
    key = jax.random.PRNGKey(0)

    fns = {}
    toks = {}
    for name, flag in (("matmul", False), ("two_tap", True)):
        dpt.UPSAMPLE2X_TWO_TAP = flag
        fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                             depth_fn=est.depth_fn())
        # warm (traces under the current flag) + force staged H2D
        toks[name] = [np.asarray(fn(frozen, params, stats, s, key))
                      for s in staged]
        fns[name] = fn

    agree = np.mean([np.mean(a == b) for a, b in
                     zip(toks["matmul"], toks["two_tap"])])
    print(f"token agreement matmul vs two_tap: {agree:.4%}")

    def run(fn):
        n_batches = N_IMAGES // BATCH
        t0 = time.perf_counter()
        outs = [fn(frozen, params, stats, staged[i % n_stage], key)
                for i in range(n_batches)]
        tokens = np.asarray(jnp.concatenate(outs, axis=0))
        dt = time.perf_counter() - t0
        assert tokens.shape[0] == N_IMAGES
        return N_IMAGES / dt

    # interleave A/B/A/B to cancel drift
    for rep in range(3):
        a = run(fns["matmul"])
        b = run(fns["two_tap"])
        print(f"rep{rep}: matmul {a:.1f} caps/s   two_tap {b:.1f} caps/s   "
              f"ratio {b / a:.3f}x")


if __name__ == "__main__":
    main()
