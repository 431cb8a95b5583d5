#!/usr/bin/env python
"""Train the base caption models (TPU-native).

Grammar identical to the reference CLI (reference: base_main.py:15-42,
README.md:52-66), bugs fixed (its hard path crashed on ``useData == args[2]``
— a comparison where an assignment was meant):

    python base_main.py soft {coco|original}
    python base_main.py hard {coco|original}
    python base_main.py nic

Each configuration trains 3x (exp_time, reference: base_main.py:17).
Optional flags (new): --epochs N  --exp-time N  --resnet-weights PATH
--grad-accum K (accumulate gradients over K microbatches per step)
--decoder-dtype {float32|bfloat16} (bf16 = mixed-precision training:
bf16 activations, f32 params/optimizer; eval stays f32 for parity)
--checkpoint-every N (full-state orbax checkpoint every N epochs; also
arms SIGTERM preemption tolerance — a preempt saves mid-epoch and exits
cleanly)  --resume (continue from the latest full-state checkpoint,
including a mid-epoch preemption save, on the identical rng trajectory)
--checkpoint-keep K (retain only the newest K full-state checkpoints)
--profile DIR [--profile-start N --profile-stop N] (jax.profiler trace of
train steps [start, stop) into DIR; view with tensorboard/xprof)
--feature-cache (materialize the frozen encoder's features once per image
into disk memmaps, then train every epoch from the cache — the frozen
conv stack never runs in the step; bit-deterministic, online-equivalent
to FP tolerance, see engine/feature_cache.py. Disk cost: ~66 GB for
COCO-train grid features in bf16, ~0.3 GB for NIC)
"""

import sys

from depth_image_captioning_pub_tpu.cli import (
    EXP_TIME, load_resnet_variables, resnet_layers_from_env, seed_everything)
from depth_image_captioning_pub_tpu.config import ConfigTrain
from depth_image_captioning_pub_tpu.engine.train import train

DATAS = ("coco", "original")


def _parse_flags(args):
    flags = {"epochs": None, "exp_time": EXP_TIME,
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
            # train from precomputed frozen-encoder features (exact; the
            # reference re-runs its frozen ResNet every epoch)
            flags["feature_cache"] = True
        elif a == "--profile":
            # jax.profiler trace of train steps [profile-start, profile-stop)
            # into DIR (view with tensorboard/xprof); reference had no
            # profiling at all (SURVEY.md §5)
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
    if not args:
        print("input {soft/hard} {coco/original} or only nic")
        return 1
    mode = args[0]
    if mode in ("soft", "hard"):
        if len(args) < 2 or args[1] not in DATAS:
            print("input coco or original")
            return 1
        use_data = args[1]
        resnet = load_resnet_variables(cfg)
        for i in range(flags["exp_time"]):
            out = train(f"base-{mode}", ext=i, use_data=use_data, cfg=cfg,
                        num_epochs=flags["epochs"], resnet_variables=resnet,
                        resnet_layers=resnet_layers_from_env(),
                        checkpoint_every=flags["checkpoint_every"],
                        resume=flags["resume"],
                        feature_cache=flags["feature_cache"])
            if out.get("preempted"):  # stop cleanly; --resume continues
                return 0
        return 0
    if mode == "nic":
        resnet = load_resnet_variables(cfg)
        backbone = None
        if resnet is not None:
            backbone = {"params": resnet["params"]["backbone"],
                        "batch_stats": resnet["batch_stats"]["backbone"]}
        for i in range(flags["exp_time"]):
            out = train("nic", ext=i, use_data="coco", cfg=cfg,
                        num_epochs=flags["epochs"], resnet_variables=backbone,
                        resnet_layers=resnet_layers_from_env(),
                        checkpoint_every=flags["checkpoint_every"],
                        resume=flags["resume"],
                        feature_cache=flags["feature_cache"])
            if out.get("preempted"):
                return 0
        return 0
    print("input {soft/hard} {coco/original} or only nic")
    return 1


if __name__ == "__main__":
    sys.exit(main())
