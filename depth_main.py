#!/usr/bin/env python
"""Train the depth-augmented caption models (TPU-native).

Grammar identical to the reference CLI (reference: depth_main.py:14-35,
README.md:68-79) with its crash bugs fixed — the reference imports train fns
that don't exist, calls with wrong arity, and leaves the mlp paths as
``pass`` (SURVEY.md §4.1); here both encoders actually train:

    python depth_main.py {soft|hard} {cnn|mlp} {coco|original}

Optional flags (new): --epochs N  --exp-time N  --resnet-weights PATH
--grad-accum K  --decoder-dtype {float32|bfloat16}
--dpt-weights PATH  --no-depth-cache  --dpt-head {full,lowres}
--gelu {erf,tanh} (tanh-approximate
DPT GELU throughput knob, PERF.md)
--checkpoint-every N  --resume  --checkpoint-keep K (full-state
checkpoints + SIGTERM preemption tolerance with exact mid-epoch resume;
see base_main.py)  --profile DIR [--profile-start N --profile-stop N]
--feature-cache (train from precomputed frozen RGB-encoder features; the
depth-map cache already covers the frozen DPT — see base_main.py)
"""

import sys

from depth_image_captioning_pub_tpu.cli import (
    EXP_TIME, load_resnet_variables, make_depth_fn, resnet_layers_from_env,
    seed_everything)
from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.depth_cache import (
    DepthMapCache, cached_depth_provider, online_depth_provider)
from depth_image_captioning_pub_tpu.engine.train import train

DATAS = ("coco", "original")


def _parse_flags(args):
    flags = {"epochs": None, "exp_time": EXP_TIME, "cache": True,
             "checkpoint_every": 0, "resume": False, "feature_cache": False}
    cfg = ConfigTrain()
    rest = []
    it = iter(args)
    for a in it:
        if a == "--epochs":
            flags["epochs"] = int(next(it))
        elif a == "--exp-time":
            flags["exp_time"] = int(next(it))
        elif a == "--resnet-weights":
            cfg.resnet_weights = next(it)
        elif a == "--dpt-weights":
            cfg.dpt_weights = next(it)
        elif a == "--no-depth-cache":
            flags["cache"] = False
        elif a == "--dpt-size":
            cfg.dpt_image_size = int(next(it))
        elif a == "--gelu":
            # tanh-approximate DPT GELU (throughput knob, see PERF.md);
            # affects only the frozen DPT's depth maps, not the trained model
            cfg.dpt_gelu = next(it)
        elif a == "--dpt-head":
            # "lowres": head convs before the x2 upsample (throughput knob)
            cfg.dpt_head = next(it)
        elif a == "--grad-accum":
            cfg.grad_accum = int(next(it))
        elif a == "--decoder-dtype":
            cfg.decoder_dtype = next(it)
        elif a == "--checkpoint-every":
            flags["checkpoint_every"] = int(next(it))
        elif a == "--checkpoint-keep":
            cfg.checkpoint_keep = int(next(it))
        elif a == "--resume":
            flags["resume"] = True
        elif a == "--feature-cache":
            # train from precomputed frozen RGB-encoder features (exact);
            # complements the depth-map cache, which covers the frozen DPT
            flags["feature_cache"] = True
        elif a == "--profile":
            # jax.profiler trace of train steps [profile-start, profile-stop)
            cfg.profile_dir = next(it)
        elif a == "--profile-start":
            cfg.profile_start = int(next(it))
        elif a == "--profile-stop":
            cfg.profile_stop = int(next(it))
        else:
            rest.append(a)
    return rest, flags, cfg


def main(argv=None):
    args, flags, cfg = _parse_flags(list(sys.argv[1:] if argv is None
                                         else argv))
    seed_everything(cfg.seed)
    if len(args) < 3 or args[0] not in ("soft", "hard") \
            or args[1] not in ("cnn", "mlp") or args[2] not in DATAS:
        print("input {soft/hard} {cnn/mlp} {coco/original}")
        return 1
    atten, enc_kind, use_data = args
    kind = f"depth-{atten}" if enc_kind == "cnn" else f"mdepth-{atten}"

    depth_fn, dpt_vars = make_depth_fn(cfg)
    if flags["cache"]:
        # materialize depth maps once for the train set (replaces the
        # reference's epoch-0 caption-keyed dict, depth_train.py:184-202)
        from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
        use_ori = use_data == "original"
        anno = cfg.ori_train_anno_file if use_ori else cfg.train_anno_file
        train_ds = CocoCaptions(cfg.train_img_directory, anno)
        cache = DepthMapCache(f"{cfg.save_dir('depth_' + atten, use_ori)}"
                              f"/depth_cache_{use_data}.npy", len(train_ds))
        if not cache.exists():
            cache.build(train_ds, depth_fn, dpt_vars)
        provider = cached_depth_provider(cache)
        val_provider = online_depth_provider(depth_fn, dpt_vars)
    else:
        provider = online_depth_provider(depth_fn, dpt_vars)
        val_provider = provider

    resnet = load_resnet_variables(cfg)
    for i in range(flags["exp_time"]):
        out = train(kind, ext=i, use_data=use_data, cfg=cfg,
                    depth_provider=provider, val_depth_provider=val_provider,
                    num_epochs=flags["epochs"], resnet_variables=resnet,
                    resnet_layers=resnet_layers_from_env(),
                    checkpoint_every=flags["checkpoint_every"],
                    resume=flags["resume"],
                    feature_cache=flags["feature_cache"])
        if out.get("preempted"):  # stop cleanly; --resume continues
            return 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
