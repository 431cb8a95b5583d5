"""Do the throughput knobs COMPOSE? Three on-chip A/Bs in one process.

1. Eval set cache x --pallas-decode: checkpoint sets 2-3 of
   base_evaluation.py run a decoder-only program fed cached frozen
   features (engine/evaluate.py) — there the 30-step decode IS the
   workload, so the whole-sequence Pallas kernel's 1.9x decode-segment
   win (a measured end-to-end TIE on the full encoder-dominated
   pipeline, PERF.md) should finally surface end to end. Token agreement
   reported (near-tie argmax flips are the documented kernel caveat).
2. --gelu tanh x --dpt-head lowres on the full depth-soft pipeline:
   the two approximation knobs touch disjoint stages (ViT MLPs vs the
   monocular head), so their A/B wins (1.054x, 1.14x) should stack
   multiplicatively (~1.20x).
3. (via tools/bench_train.py --features --bf16, run separately): the
   feature-cache step is decoder-dominated, so the bf16-decoder win
   should exceed its full-pipeline 1.27x there.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_knob_compose.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

VOCAB = 9956
HW = (224, 224)
MAX_LEN = 30


def ab_cached_pallas(batch=500, n_images=4000):
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.engine.evaluate import make_caption_fn
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner

    cfg = ConfigEval()
    cap = build_captioner("base-soft", VOCAB, cfg,
                          encoder_dtype=jnp.bfloat16,
                          decoder_dtype=jnp.float32)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n_stage = 4
    staged = [jax.device_put(rng.random((batch, *HW, 3), dtype=np.float32))
              for _ in range(n_stage)]
    key = jax.random.PRNGKey(0)

    fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN)
    fn_p = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                           use_pallas=True)
    feats = [fn(frozen, params, stats, s, key, return_cache=True)[1]["feats"]
             for s in staged]
    toks = {}
    for name, f in (("xla", fn), ("pallas", fn_p)):   # compile + warm
        toks[name] = [np.asarray(f({}, params, stats, None, key,
                                   feats=ft)) for ft in feats]
    agree = np.mean([np.mean(a == b)
                     for a, b in zip(toks["xla"], toks["pallas"])])
    print(f"cached-feats decode, token agreement xla vs pallas: "
          f"{agree:.4%}")

    def run(f):
        n_batches = n_images // batch
        t0 = time.perf_counter()
        outs = [f({}, params, stats, None, key, feats=feats[i % n_stage])
                for i in range(n_batches)]
        out = np.asarray(jnp.concatenate(outs, axis=0))
        dt = time.perf_counter() - t0
        assert out.shape[0] == n_images
        return n_images / dt

    for rep in range(3):
        a = run(fn)
        b = run(fn_p)
        print(f"cached rep{rep}: xla {a:.0f} caps/s   pallas {b:.0f} "
              f"caps/s   ratio {b / a:.3f}x")


def ab_depth_composed(batch=64, n_images=512):
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
    staged = [jax.device_put(rng.random((batch, *HW, 3), dtype=np.float32))
              for _ in range(n_stage)]
    key = jax.random.PRNGKey(0)

    fns, toks = {}, {}
    for name, (g, h) in (("base", (False, False)),
                         ("tanh+lowres", (True, True))):
        dpt.GELU_APPROXIMATE, dpt.HEAD_LOW_RES = g, h
        try:
            est_k = DPTDepthEstimator(dtype=jnp.bfloat16)
            fn = make_caption_fn(cap, start_id=VOCAB - 4, max_length=MAX_LEN,
                                 depth_fn=est_k.depth_fn())
            toks[name] = [np.asarray(fn(frozen, params, stats, s, key))
                          for s in staged]
            fns[name] = fn
        finally:
            dpt.GELU_APPROXIMATE = dpt.HEAD_LOW_RES = False
    agree = np.mean([np.mean(a == b) for a, b in
                     zip(toks["base"], toks["tanh+lowres"])])
    print(f"depth-soft, token agreement base vs tanh+lowres: {agree:.4%}")

    def run(fn):
        n_batches = n_images // batch
        t0 = time.perf_counter()
        outs = [fn(frozen, params, stats, staged[i % n_stage], key)
                for i in range(n_batches)]
        out = np.asarray(jnp.concatenate(outs, axis=0))
        dt = time.perf_counter() - t0
        return n_images / dt

    for rep in range(3):
        a = run(fns["base"])
        b = run(fns["tanh+lowres"])
        print(f"depth rep{rep}: base {a:.1f} caps/s   tanh+lowres "
              f"{b:.1f} caps/s   ratio {b / a:.3f}x")


if __name__ == "__main__":
    ab_cached_pallas()
    ab_depth_composed()
