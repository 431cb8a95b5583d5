#!/usr/bin/env python
"""Evaluate the depth-augmented caption models.

Grammar identical to the reference CLI (reference: depth_evaluation.py:
391-416, README.md:94-99):

    python depth_evaluation.py {soft|hard} score {coco|rem_coco|rem_original}
    python depth_evaluation.py {soft|hard} sample <pic_name> {coco|original}

Same flow as base_evaluation plus the frozen DPT depth estimator feeding the
trained depth CNN encoder; depth maps are computed per batch on-device inside
the same jitted caption function (the reference recomputes them per batch on
a separate module call, depth_evaluation.py:154-158), so DPT, both encoders,
and the 30-step greedy scan are one XLA program. Across the 3 checkpoint
sets the maps are CACHED: DPT is frozen and the image subset is fixed, so
sets 2-3 reuse set 1's maps bit-exactly instead of re-running the DPT
(--no-depth-eval-cache restores the reference's recompute-per-set behavior).

Extra flags (new): --dpt-weights PATH (replaces the reference's hardcoded
/home/shirota/... path, DPT_model.py:23); --no-depth-eval-cache;
--eval-cache-dir DIR (persist the frozen-stage outputs: later invocations
replay ResNet features + DPT maps bit-exactly, engine/eval_cache_store.py);
--gelu {erf,tanh} (tanh-approximate DPT GELU: +5.4% throughput, PERF.md);
--dpt-head {full,lowres} (head convs before the x2 upsample, PERF.md);
--mlp
(evaluate the MLP-depth mdepth_* checkpoints depth_main's mlp mode trains —
the reference has no working MLP eval, SURVEY §4.1).
"""

import sys

from depth_image_captioning_pub_tpu.cli import make_depth_fn, seed_everything
from depth_image_captioning_pub_tpu.config import ConfigEval

import base_evaluation as base_cli


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    cfg = ConfigEval()
    rest = []
    import os
    num_sets = 3
    beam_size = 1
    use_pallas = False
    depth_eval_cache = True
    eval_cache_dir = os.environ.get("DCAP_EVAL_CACHE_DIR") or None
    stochastic = False
    temperature, top_k, top_p, seed = 1.0, 0, 1.0, 0
    encoder = "cnn"
    it = iter(args)
    for a in it:
        if a == "--mlp":
            # evaluate the MLP-depth (mdepth_*) checkpoints depth_main's
            # mlp mode trains — additive: the reference has no working MLP
            # eval (its import crashes, SURVEY §4.1)
            encoder = "mlp"
        elif a == "--dpt-weights":
            cfg.dpt_weights = next(it)
        elif a == "--dpt-size":
            cfg.dpt_image_size = int(next(it))
        elif a == "--gelu":
            # "tanh" swaps the DPT ViT MLPs' exact-erf GELU for the tanh
            # approximation: measured +5.4% depth-soft throughput (PERF.md)
            # at ~1e-3 relative activation error; "erf" (default) is parity
            cfg.dpt_gelu = next(it)
        elif a == "--dpt-head":
            # "lowres": head convs before the x2 upsample (throughput knob,
            # PERF.md); "full" (default) is the reference head order
            cfg.dpt_head = next(it)
        elif a == "--num-sets":
            num_sets = int(next(it))
        elif a == "--beam":
            beam_size = int(next(it))
        elif a == "--pallas-decode":
            use_pallas = True
        elif a == "--eval-cache-dir":
            # persist frozen-stage outputs (ResNet features + DPT maps) to
            # DIR; later invocations replay them bit-exactly
            # (engine/eval_cache_store.py; also $DCAP_EVAL_CACHE_DIR)
            eval_cache_dir = next(it)
        elif a in ("--no-eval-cache", "--no-depth-eval-cache"):
            # recompute every frozen stage (encoder features, DPT maps) per
            # checkpoint set, as the reference does
            # (depth_evaluation.py:154-158); the cache is exact, so this
            # exists for memory-constrained runs, not for parity
            depth_eval_cache = False
        elif a == "--stochastic":
            stochastic = True  # sample mode only: draw instead of argmax
        elif a == "--temperature":
            temperature = float(next(it))
        elif a == "--top-k":
            top_k = int(next(it))
        elif a == "--top-p":
            top_p = float(next(it))
        elif a == "--seed":
            seed = int(next(it))
        else:
            rest.append(a)
    args = rest
    sampling = ({"temperature": temperature, "top_k": top_k, "top_p": top_p}
                if stochastic else None)
    seed_everything(cfg.seed)
    evaluation_datas = ("coco", "rem_coco", "rem_original")
    sample_datas = ("coco", "original")
    if len(args) == 3 and args[1] == "score":
        if args[2] not in evaluation_datas:
            print("input coco or rem_coco or rem_original")
            return 1
        depth_fn, dpt_vars = make_depth_fn(cfg)
        return base_cli.score_mode(args[0], args[2], cfg, depth=True,
                                   depth_fn=depth_fn, dpt_variables=dpt_vars,
                                   num_sets=num_sets, beam_size=beam_size,
                                   use_pallas=use_pallas,
                                   depth_eval_cache=depth_eval_cache,
                                   eval_cache_dir=eval_cache_dir,
                                   encoder=encoder)
    if len(args) == 4 and args[1] == "sample":
        if args[3] not in sample_datas:
            print("input coco or original")
            return 1
        depth_fn, dpt_vars = make_depth_fn(cfg)
        return base_cli.sample_mode(args[0], args[2], args[3], cfg,
                                    depth=True, depth_fn=depth_fn,
                                    dpt_variables=dpt_vars,
                                    sampling=sampling, seed=seed,
                                    encoder=encoder)
    print("depth_evaluation.py {soft/hard} {score/sample sample_pic} {useData}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
