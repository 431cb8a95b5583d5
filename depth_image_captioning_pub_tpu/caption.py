"""One-shot captioning CLI: caption image files/directories from a trained
experiment, no HTTP server and no Python required.

The reference's only inference surfaces are the eval CLIs' ``sample`` mode
(fixed sample_pic layout + attention overlays, base_evaluation.py:171-336)
and hand-written scripts; this is the missing "just caption these images"
entry point, a thin shell over ``pipeline.CaptionPipeline`` (so it shares
the jitted programs, batch bucketing, beam/stochastic decoding, and the
multi-chip data parallelism of the serving path).

    dcap-caption img.jpg photos/ --kind depth-soft --beam 3
    dcap-caption *.png --kind base-soft --sample --temperature 0.8 --json

Output: one ``path\tcaption`` line per image (or a JSON object array with
--json), in argument order; directories expand to their image files
sorted by name.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def expand_paths(args: List[str]) -> List[str]:
    """Files pass through (any extension — the decoder decides); directories
    contribute their image-suffixed files sorted by name."""
    out: List[str] = []
    for a in args:
        if os.path.isdir(a):
            out.extend(sorted(
                os.path.join(a, f) for f in os.listdir(a)
                if f.lower().endswith(IMAGE_EXTS)))
        else:
            out.append(a)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dcap-caption",
        description="Caption images with a trained experiment "
                    "(exp_result/ layout).")
    p.add_argument("paths", nargs="+", help="image files and/or directories")
    p.add_argument("--kind", default="base-soft",
                   help="model configuration (nic, base-soft, base-hard, "
                        "depth-soft, depth-hard, mdepth-soft, mdepth-hard)")
    p.add_argument("--use-data", default="coco", choices=("coco", "original"))
    p.add_argument("--set-idx", type=int, default=1,
                   help="checkpoint set 1-3 (the reference trains each "
                        "config 3x)")
    p.add_argument("--beam", type=int, default=1,
                   help="beam width (1 = greedy, the reference's decode)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--sample", action="store_true",
                   help="stochastic decoding instead of greedy/beam")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gelu", default="erf", choices=("erf", "tanh"),
                   help="DPT GELU flavor (depth kinds; tanh = throughput "
                        "knob, PERF.md)")
    p.add_argument("--dpt-head", default="full", choices=("full", "lowres"),
                   help="monocular-head flavor (depth kinds; lowres = "
                        "throughput knob like --gelu, PERF.md)")
    p.add_argument("--export-dir", default=None,
                   help="caption from a dcap-export AOT artifact instead of "
                        "exp_result/ checkpoints (decode settings are baked "
                        "into the artifact; model flags are ignored)")
    p.add_argument("--json", action="store_true",
                   help='emit [{"path": ..., "caption": ...}, ...]')
    p.add_argument("--output", default=None,
                   help="write results to this file instead of stdout")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    paths = expand_paths(args.paths)
    if not paths:
        print("no images found", file=sys.stderr)
        return 1
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        print(f"not found: {', '.join(missing)}", file=sys.stderr)
        return 1

    if args.export_dir:
        from depth_image_captioning_pub_tpu.export import ExportedPipeline
        pipe = ExportedPipeline.load(args.export_dir, seed=args.seed)
    else:
        from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline
        cfg = None
        if args.gelu != "erf" or args.dpt_head != "full":
            from depth_image_captioning_pub_tpu.config import ConfigEval
            cfg = ConfigEval()
            cfg.dpt_gelu = args.gelu
            cfg.dpt_head = args.dpt_head
        pipe = CaptionPipeline.from_experiment(
            args.kind, args.use_data, cfg=cfg, set_idx=args.set_idx,
            beam_size=args.beam, batch_size=args.batch_size,
            sample=args.sample, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p, seed=args.seed)
    # Tolerant batch decode: one truncated file must not kill a directory
    # run. Failed rows are reported (stderr + "<decode failed>" caption) and
    # the rest are captioned; same decoder + size as the pipeline's own path
    # decode, so captions are identical to passing paths straight through.
    from depth_image_captioning_pub_tpu.data.native_loader import decode_batch
    failed: List[int] = []
    arrays = decode_batch(paths, pipe.image_hw, on_error="zero",
                          failed=failed)
    bad = set(failed)
    good_idx = [i for i in range(len(paths)) if i not in bad]
    for i in sorted(bad):
        print(f"decode failed: {paths[i]}", file=sys.stderr)
    if not good_idx:
        print("no decodable images", file=sys.stderr)
        return 1
    good_caps = pipe([arrays[i] for i in good_idx])
    captions = ["<decode failed>"] * len(paths)
    for i, c in zip(good_idx, good_caps):
        captions[i] = c

    if args.json:
        text = json.dumps([{"path": p, "caption": c}
                           for p, c in zip(paths, captions)], indent=2)
    else:
        text = "\n".join(f"{p}\t{c}" for p, c in zip(paths, captions))
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
