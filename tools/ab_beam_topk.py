"""In-pipeline A/B: beam-kernel top-k strategies vs the XLA beam search.

Measures the full base-soft caption program (frozen ResNet-152 bf16 +
30-step beam search, batch 250 beam 5 — the shapes of the round-3
0.86x negative) three ways, back-to-back warm in one process:

  xla     ops/decode.beam_search (lax.scan + lax.top_k)
  iter    whole-sequence kernel, W passes of (max, argmax, mask)
  stream  whole-sequence kernel, streaming sorted-register top-W
          (ONE sheet pass; see beam_seq.py)

iter and stream run identical model math and copy (not recompute) the
selected scores, so their tokens AND scores must be bit-identical on
chip; vs XLA only FP accumulation order differs (agreement reported).

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
    variants = (("xla", False, None), ("iter", True, "iter"),
                ("stream", True, "stream"))
    for name, use_pallas, topk in variants:
        if topk is not None:
            beam_seq.TOPK_DEFAULT = topk
        fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                             beam_size=BEAM, end_id=VOCAB - 3,
                             use_pallas=use_pallas)
        toks[name] = [np.asarray(fn(frozen, params, stats, s, key))
                      for s in staged]   # warm + force staged H2D
        fns[name] = fn

    for a, b in (("xla", "iter"), ("xla", "stream")):
        agree = np.mean([np.mean(x == y)
                         for x, y in zip(toks[a], toks[b])])
        print(f"token agreement {a} vs {b}: {agree:.4%}")
    for x, y in zip(toks["iter"], toks["stream"]):
        np.testing.assert_array_equal(x, y)  # bitwise: same model math
    print("iter == stream tokens: BITWISE OK")

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
        for name in ("xla", "iter", "stream"):
            line.append(f"{name} {run(fns[name]):.1f}")
        print(f"rep{rep}: " + "   ".join(line) + " caps/s")


if __name__ == "__main__":
    main()
