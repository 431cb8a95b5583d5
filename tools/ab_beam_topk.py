"""In-pipeline A/B: beam-kernel top-k strategies vs the XLA beam search.

Measures the full base-soft caption program (frozen ResNet-152 bf16 +
30-step beam search, batch 250 beam 5 — the shapes of the round-3
0.86x negative) three ways, back-to-back warm in one process:

  xla     ops/decode.beam_search (lax.scan + lax.top_k)
  iter    whole-sequence kernel, W passes of (max, argmax, mask)
  stream  whole-sequence kernel, streaming sorted-register top-W
          (ONE sheet pass; see beam_seq.py)

iter and stream run identical model math and copy (not recompute) the
selected scores — bit-identical in interpret mode (test-pinned). On real
Mosaic the selection code changes how the model matmuls are scheduled
(layout-driven accumulation order), so even at the SAME block size the
variants flip ~0.01% of near-tie argmax tokens (measured 1/7500); the
tool reports agreement and asserts it stays above 99.9%.

MEASURED (2026-08-20, v5e, 3 interleaved reps): XLA 2866-2892, iter
blk16 2492-2499, iter blk8 2526-2542, stream blk8 2454-2475 caps/s —
stream is a recorded negative; see ops/pallas/beam_seq.py docstring.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_beam_topk.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

VOCAB = 9956
BATCH = 250
N_IMAGES = 2000
HW = (224, 224)
MAX_LEN = 30
BEAM = 5


def main():
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.ops.pallas import beam_seq

    cfg = ConfigEval()
    cap = build_captioner("base-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    n_stage = 2
    staged = [jax.device_put(rng.random((BATCH, *HW, 3), dtype=np.float32))
              for _ in range(n_stage)]
    key = jax.random.PRNGKey(0)

    fns, toks = {}, {}
    # iter picks blk=16 at these shapes, stream blk=8 (_pick_block's
    # calibrated VMEM estimate); iter8 forces iter to blk=8 so the
    # iter-vs-stream bitwise check compares identical matmul tiling —
    # across blocks, near-tie argmax tokens can flip (measured 1/7500).
    variants = (("xla", False, None, None), ("iter", True, "iter", None),
                ("iter8", True, "iter", 8), ("stream", True, "stream", None))
    for name, use_pallas, topk, blk in variants:
        if topk is not None:
            beam_seq.TOPK_DEFAULT = topk
        beam_seq.BLOCK_OVERRIDE = blk
        fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                             beam_size=BEAM, end_id=VOCAB - 3,
                             use_pallas=use_pallas)
        toks[name] = [np.asarray(fn(frozen, params, stats, s, key))
                      for s in staged]   # warm + force staged H2D
        fns[name] = fn
    beam_seq.BLOCK_OVERRIDE = None

    for a, b in (("xla", "iter"), ("xla", "stream"), ("iter", "stream")):
        agree = np.mean([np.mean(x == y)
                         for x, y in zip(toks[a], toks[b])])
        print(f"token agreement {a} vs {b}: {agree:.4%}")

    def run(fn):
        n_batches = N_IMAGES // BATCH
        t0 = time.perf_counter()
        outs = [fn(frozen, params, stats, staged[i % n_stage], key)
                for i in range(n_batches)]
        tokens = np.asarray(jnp.concatenate(outs, axis=0))
        dt = time.perf_counter() - t0
        assert tokens.shape[0] == N_IMAGES
        return N_IMAGES / dt

    # interleave to cancel drift
    for rep in range(3):
        line = []
        for name in ("xla", "iter", "iter8", "stream"):
            line.append(f"{name} {run(fns[name]):.1f}")
        print(f"rep{rep}: " + "   ".join(line) + " caps/s")

    # Same-block cross-strategy check LAST (after the timings print).
    # Bitwise equality holds in interpret mode (test-pinned) but NOT on
    # real Mosaic: the selection code changes how the SAME model matmuls
    # get scheduled (layout-driven accumulation order), measured ~1/7500
    # near-tie argmax flips at batch 250. Assert near-equality.
    agree = np.mean([np.mean(x == y)
                     for x, y in zip(toks["iter8"], toks["stream"])])
    print(f"iter8 vs stream (same blk): {agree:.4%} token agreement")
    assert agree > 0.999, agree


if __name__ == "__main__":
    main()
