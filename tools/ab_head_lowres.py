"""In-pipeline A/B: low-resolution monocular head vs the reference order.

``dpt.HEAD_LOW_RES`` (--dpt-head lowres) runs head_conv2/conv3 BEFORE the
head's align-corners x2 upsample, so the 3x3 convs see 1/4 the pixels and
the interp moves from 128 channels to the final single channel. The r3
head ablation priced the full-res tail at ~15.65 ms (conv2+relu+conv3+relu
at 384^2, 22% MXU) plus ~18 ms for head_conv1+resize of the 213.7 ms
depth-soft call — this measures how much of that the reorder actually
recovers end to end, back-to-back warm in one process (the only
measurement this rig trusts — STATUS.md).

NOT exact (convs don't commute with resize): also reports greedy token
agreement so the deviation is documented next to the speedup, like the
--gelu tanh knob.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_head_lowres.py
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

    fns, toks = {}, {}
    for name, flag in (("full", False), ("lowres", True)):
        dpt.HEAD_LOW_RES = flag
        try:
            fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                                 depth_fn=est.depth_fn())
            # warm (traces under the current flag) + force staged H2D
            toks[name] = [np.asarray(fn(frozen, params, stats, s, key))
                          for s in staged]
            fns[name] = fn
        finally:
            dpt.HEAD_LOW_RES = False

    agree = np.mean([np.mean(a == b) for a, b in
                     zip(toks["full"], toks["lowres"])])
    print(f"token agreement full vs lowres head: {agree:.4%}")

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
        a = run(fns["full"])
        b = run(fns["lowres"])
        print(f"rep{rep}: full {a:.1f} caps/s   lowres {b:.1f} caps/s   "
              f"ratio {b / a:.3f}x")


if __name__ == "__main__":
    main()
