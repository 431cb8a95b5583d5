"""In-pipeline A/B ablation of the DPT head tail (run on the real chip).

Measures the full depth-soft caption pipeline (batch 64, 512 images,
staged+warm, fetch-clocked) under three dpt.ABLATE settings in one
process: full, head_tail (stop after head_conv1+x2 resize), head_all
(skip the whole head). Deltas isolate head_conv2/3-at-384^2 and the whole
head's cost. Params are jit ARGUMENTS (HTTP 413 rule).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from depth_image_captioning_pub_tpu.config import ConfigEval
from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
from depth_image_captioning_pub_tpu.models.captioner import build_captioner
from depth_image_captioning_pub_tpu.models import dpt
from depth_image_captioning_pub_tpu.models.dpt import DPTDepthEstimator

VOCAB, MAX_LEN, HW = 9956, 30, (224, 224)
BATCH, N_IMAGES = 64, 512


def run_variant(ablate: str) -> float:
    dpt.ABLATE = ablate
    cfg = ConfigEval()
    cap = build_captioner("depth-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    est = DPTDepthEstimator(dtype=jnp.bfloat16)
    frozen = dict(frozen, dpt=est.init(jax.random.PRNGKey(1)))
    fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                         depth_fn=est.depth_fn())
    rng = np.random.default_rng(0)
    staged = [jax.device_put(rng.random((BATCH, *HW, 3), dtype=np.float32))
              for _ in range(2)]
    key = jax.random.PRNGKey(0)
    for s in staged:
        np.asarray(fn(frozen, params, stats, s, key))
    n_batches = N_IMAGES // BATCH
    t0 = time.perf_counter()
    outs = [fn(frozen, params, stats, staged[i % 2], key)
            for i in range(n_batches)]
    np.asarray(jnp.concatenate(outs, axis=0))
    dt = time.perf_counter() - t0
    rate = N_IMAGES / dt
    ms = 1000.0 * dt / n_batches
    print(f"ABLATE={ablate or 'full':10s}  {rate:8.1f} caps/s   "
          f"{ms:7.2f} ms/batch", flush=True)
    return ms


full = run_variant("")
tail = run_variant("head_tail")
allh = run_variant("head_all")
full2 = run_variant("")        # repeat baseline to bound drift
print(f"head conv2+relu+conv3+relu at 384^2 : {full - tail:6.2f} ms")
print(f"whole head (conv1+resize+tail)      : {full - allh:6.2f} ms")
print(f"baseline drift                      : {full - full2:6.2f} ms")
