"""AOT model export: serialize the jitted caption program to a portable,
self-contained artifact (``jax.export`` / StableHLO) and reload it for
inference without re-tracing the model code.

The reference has no deployment story at all — inference means importing
its model classes and loading ``state_dict``s in the right order
(base_evaluation.py:102-121). A TPU-native framework can do better: the
whole caption step (uint8 -> normalize -> frozen encoder -> optional DPT +
depth encoder -> whole-sequence greedy/beam/stochastic decode) is already
ONE jitted function (engine/evaluate.make_caption_fn), so ``jax.export``
can lower it once to version-stable StableHLO and serialize it. The
artifact is a directory:

    meta.json           buckets, image size, vocab (id -> word), versions
    variables.msgpack   {"frozen", "params", "batch_stats"} pytree
    program_b{B}.bin    one serialized Exported per batch bucket

Properties worth having in production:

- **Frozen math.** The StableHLO pins the exact program; model-code changes
  (or a different flax/framework version on the serving host) cannot drift
  the captions. Loading needs jax + this module's thin loader, not the
  model zoo.
- **Multi-platform.** ``platforms=("cpu", "tpu")`` lowers one artifact for
  both: CI smoke-tests the very bytes that serve on TPU.
- **Bucketed batches.** One program per batch bucket, same contract as
  ``CaptionPipeline(batch_buckets=...)`` — the loader pads a request to the
  smallest bucket that fits.

Out of scope by design: Pallas programs (a serialized custom-call is not
portable across platforms) and multi-chip GSPMD exports (serve-side data
parallelism re-shards around the loaded program instead).

CLI:

    dcap-export out_dir --kind base-soft --batch-buckets 1,4,16
    dcap-caption img.jpg --export-dir out_dir
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, Optional, Sequence

import numpy as np

from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

META_NAME = "meta.json"
VARS_NAME = "variables.msgpack"
FORMAT_VERSION = 1


def _program_name(bucket: int) -> str:
    return f"program_b{int(bucket)}.bin"


def _specs(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)


def export_pipeline(pipe: CaptionPipeline, out_dir: str,
                    platforms: Optional[Sequence[str]] = None) -> Dict:
    """Export ``pipe``'s caption program(s) + weights + vocab to ``out_dir``.

    ``platforms``: lowering targets (e.g. ``("cpu", "tpu")``); ``None``
    exports for the default backend only. Returns the written meta dict.
    """
    import jax
    from flax import serialization
    from jax import export as jexport

    if pipe._sharding is not None:
        raise ValueError(
            "export a single-device pipeline (pass devices=[jax.devices()"
            "[0]]); serve-side data parallelism re-shards around the "
            "loaded program")
    if getattr(pipe, "use_pallas", False):
        raise ValueError("Pallas programs serialize as non-portable "
                         "custom-calls; export the XLA path instead")
    os.makedirs(out_dir, exist_ok=True)

    key_spec = _specs(jax.random.PRNGKey(0))
    var_specs = (_specs(pipe.frozen), _specs(pipe.params),
                 _specs(pipe.batch_stats))
    h, w = pipe.image_hw
    fn = pipe._fn

    def caller(frozen, params, stats, images, rng):
        return fn(frozen, params, stats, images, rng)

    programs = {}
    for bucket in pipe.batch_buckets:
        img_spec = jax.ShapeDtypeStruct((bucket, h, w, 3), np.uint8)
        exported = jexport.export(
            jax.jit(caller),
            platforms=list(platforms) if platforms else None,
        )(*var_specs, img_spec, key_spec)
        path = os.path.join(out_dir, _program_name(bucket))
        with open(path, "wb") as f:
            f.write(exported.serialize())
        programs[int(bucket)] = _program_name(bucket)

    with open(os.path.join(out_dir, VARS_NAME), "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"frozen": jax.tree_util.tree_map(np.asarray, pipe.frozen),
             "params": jax.tree_util.tree_map(np.asarray, pipe.params),
             "batch_stats": jax.tree_util.tree_map(np.asarray,
                                                   pipe.batch_stats)}))

    meta = {
        "format_version": FORMAT_VERSION,
        "kind": getattr(pipe, "kind", None),
        "buckets": [int(b) for b in pipe.batch_buckets],
        "programs": programs,
        "image_hw": [int(h), int(w)],
        "max_length": int(getattr(pipe, "max_length", 30)),
        "beam_size": int(getattr(pipe, "beam_size", 1)),
        "sample": bool(pipe.sample),
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
        "id_to_word": {str(i): wd for i, wd in pipe.id_to_word.items()},
    }
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)
    return meta


class ExportedPipeline(CaptionPipeline):
    """A ``CaptionPipeline`` whose device program comes from a serialized
    export instead of tracing model code. Inherits the host-side machinery
    (JPEG decode, bucket padding, async chunk pipelining, detokenize);
    ``_fn`` dispatches to the deserialized program for the padded bucket."""

    def __init__(self, calls, variables, id_to_word: Dict[int, str],
                 image_hw, buckets, sample: bool = False, seed: int = 0,
                 meta: Optional[Dict] = None):
        import jax

        self._calls = dict(calls)
        self.frozen = variables["frozen"]
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.id_to_word = dict(id_to_word)
        self.image_hw = tuple(image_hw)
        self.batch_buckets = tuple(sorted(int(b) for b in buckets))
        self.batch_size = self.batch_buckets[-1]
        self.sample = bool(sample)
        self._rng = jax.random.PRNGKey(seed)
        self._sharding = None
        self.meta = meta or {}

    def _fn(self, frozen, params, stats, images, rng):
        return self._calls[int(images.shape[0])](
            frozen, params, stats, images, rng)

    @classmethod
    def load(cls, export_dir: str, seed: int = 0) -> "ExportedPipeline":
        import jax
        from flax import serialization
        from jax import export as jexport

        with open(os.path.join(export_dir, META_NAME)) as f:
            meta = json.load(f)
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {meta['format_version']} is newer than "
                f"this loader ({FORMAT_VERSION})")
        with open(os.path.join(export_dir, VARS_NAME), "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        calls = {}
        for bucket, name in meta["programs"].items():
            with open(os.path.join(export_dir, name), "rb") as f:
                exported = jexport.deserialize(f.read())
            calls[int(bucket)] = jax.jit(exported.call)
        id_to_word = {int(i): w for i, w in meta["id_to_word"].items()}
        return cls(calls, variables, id_to_word, meta["image_hw"],
                   meta["buckets"], sample=meta.get("sample", False),
                   seed=seed, meta=meta)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dcap-export",
        description="Export a trained experiment's caption program to a "
                    "portable AOT artifact (StableHLO + weights + vocab).")
    p.add_argument("out_dir", help="artifact directory to write")
    p.add_argument("--kind", default="base-soft",
                   help="model configuration (nic, base-soft, base-hard, "
                        "depth-soft, depth-hard, mdepth-soft, mdepth-hard)")
    p.add_argument("--use-data", default="coco", choices=("coco", "original"))
    p.add_argument("--set-idx", type=int, default=1)
    p.add_argument("--beam", type=int, default=1,
                   help="beam width baked into the program (1 = greedy)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--batch-buckets", default=None,
                   help="comma list, e.g. 1,4,16 — one program per bucket")
    p.add_argument("--sample", action="store_true",
                   help="export the stochastic-decoding program")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--gelu", default="erf", choices=("erf", "tanh"))
    p.add_argument("--platforms", default=None,
                   help="comma list of lowering targets (e.g. cpu,tpu); "
                        "default: the current backend only")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    cfg = None
    if args.gelu != "erf":
        from depth_image_captioning_pub_tpu.config import ConfigEval
        cfg = ConfigEval()
        cfg.dpt_gelu = args.gelu
    buckets = (tuple(int(b) for b in args.batch_buckets.split(","))
               if args.batch_buckets else None)
    pipe = CaptionPipeline.from_experiment(
        args.kind, args.use_data, cfg=cfg, set_idx=args.set_idx,
        beam_size=args.beam, batch_size=args.batch_size,
        batch_buckets=buckets, sample=args.sample,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        devices=[jax.devices()[0]])
    platforms = args.platforms.split(",") if args.platforms else None
    meta = export_pipeline(pipe, args.out_dir, platforms=platforms)
    total = sum(os.path.getsize(os.path.join(args.out_dir, f))
                for f in os.listdir(args.out_dir))
    print(f"exported {args.kind} (buckets {meta['buckets']}, "
          f"platforms {meta['platforms'] or 'default'}) to {args.out_dir} "
          f"({total / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
