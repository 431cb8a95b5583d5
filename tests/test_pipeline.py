"""CaptionPipeline: the programmatic one-call inference API.

Covers direct construction (arrays + file paths, padding to the fixed batch
shape, single-vs-list returns) and ``from_experiment`` loading of the
checkpoints the train CLI writes (reference exp_result/ layout)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_cli import coco_tree  # noqa: F401  (module-scoped fixture)


@pytest.fixture(autouse=True)
def tiny_env(monkeypatch, coco_tree):  # noqa: F811
    monkeypatch.setenv("DCAP_RESNET_LAYERS", "1,1,1,1")
    monkeypatch.setenv("DCAP_TINY_DPT", "1")
    monkeypatch.chdir(coco_tree)


def _tiny_pipeline(batch_size=4, **kw):
    import jax
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    w2i = {f"w{i}": i for i in range(16)}
    w2i.update({"<start>": 16, "<end>": 17, "<unk>": 18, "<null>": 19})
    i2w = {i: w for w, i in w2i.items()}
    cap = build_captioner("base-soft", len(w2i), ConfigEval(),
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    return CaptionPipeline(cap, params, {"encoder": frozen["encoder"]},
                           stats, w2i, i2w, batch_size=batch_size, **kw)


def test_arrays_padding_and_single(coco_tree):  # noqa: F811
    pipe = _tiny_pipeline(batch_size=4)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (5, 224, 224, 3), dtype=np.uint8)

    caps = pipe(list(imgs))           # 5 images through a batch-4 program
    assert len(caps) == 5
    assert all(isinstance(c, str) for c in caps)

    # padding must not change results: same image alone == in the batch
    assert pipe(imgs[0]) == caps[0]
    # non-224 arrays and float arrays are resized/converted
    small = rng.random((100, 120, 3)).astype(np.float32)
    assert isinstance(pipe(small), str)


def test_sampling_pipeline(coco_tree):  # noqa: F811
    """sample=True: top_k=1 reproduces greedy exactly; a fixed seed gives a
    reproducible sequence of draws; each call advances the key."""
    import numpy as np
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (3, 224, 224, 3), dtype=np.uint8)

    greedy = _tiny_pipeline(batch_size=4)(list(imgs))
    topk1 = _tiny_pipeline(batch_size=4, sample=True, top_k=1)(list(imgs))
    assert topk1 == greedy

    a = _tiny_pipeline(batch_size=4, sample=True, temperature=1.5, seed=7)
    b = _tiny_pipeline(batch_size=4, sample=True, temperature=1.5, seed=7)
    first_a = a(list(imgs))
    assert first_a == b(list(imgs))      # same seed, same draws
    k0 = np.asarray(a._rng).copy()
    a(list(imgs))
    assert not np.array_equal(np.asarray(a._rng), k0)  # key advanced


def test_path_and_array_mix(coco_tree):  # noqa: F811
    pipe = _tiny_pipeline(batch_size=2)
    val = coco_tree / "dataset" / "coco2014" / "val2014"
    path = str(next(val.iterdir()))
    arr = np.zeros((224, 224, 3), np.uint8)
    caps = pipe([path, arr, path])
    assert len(caps) == 3
    assert caps[0] == caps[2]  # same file -> same caption


def test_from_experiment_roundtrip(coco_tree):  # noqa: F811
    import base_main
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    d = coco_tree / "exp_result" / "base_soft"
    if not (d / "base_soft_decoder_best_coco0.pth.msgpack").exists():
        assert base_main.main(["soft", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0
    pipe = CaptionPipeline.from_experiment("base-soft", batch_size=2)
    val = coco_tree / "dataset" / "coco2014" / "val2014"
    paths = sorted(str(p) for p in val.iterdir())[:3]
    caps = pipe(paths)
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)

    # beam pipeline loads and runs through the same entry
    pipe_beam = CaptionPipeline.from_experiment("base-soft", batch_size=2,
                                                beam_size=2)
    caps_beam = pipe_beam(paths)
    assert len(caps_beam) == 3


def test_mdepth_from_experiment(coco_tree):  # noqa: F811
    """mdepth-soft loads through from_experiment (mlp eval tables) and
    captions — the programmatic side of the `--mlp` eval path."""
    import depth_main
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    d = coco_tree / "exp_result" / "CNN_depth_soft"
    if not (d / "mdepth_soft_decoder_best_coco0.pth.msgpack").exists():
        assert depth_main.main(["soft", "mlp", "coco", "--epochs", "1",
                                "--exp-time", "1", "--no-depth-cache"]) == 0
    pipe = CaptionPipeline.from_experiment("mdepth-soft", batch_size=2)
    caps = pipe(np.zeros((2, 224, 224, 3), np.uint8))
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_depth_pipeline_direct(coco_tree):  # noqa: F811
    """depth-soft through the pipeline: DPT -> depth CNN -> add-fusion."""
    import jax
    from depth_image_captioning_pub_tpu import cli
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    w2i = {f"w{i}": i for i in range(16)}
    w2i.update({"<start>": 16, "<end>": 17, "<unk>": 18, "<null>": 19})
    i2w = {i: w for w, i in w2i.items()}
    cfg = ConfigEval()
    cap = build_captioner("depth-soft", len(w2i), cfg,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    depth_fn, dpt_vars = cli.make_depth_fn(cfg)   # tiny via $DCAP_TINY_DPT
    pipe = CaptionPipeline(
        cap, params, {"encoder": frozen["encoder"], "dpt": dpt_vars}, stats,
        w2i, i2w, depth_fn=depth_fn, batch_size=2)
    caps = pipe(np.zeros((3, 224, 224, 3), np.uint8))
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)
    # missing depth_fn for a depth kind must be a loud error
    with pytest.raises(ValueError):
        CaptionPipeline(cap, params, {"encoder": frozen["encoder"]}, stats,
                        w2i, i2w)


@pytest.mark.multidevice
def test_pipeline_sharded_equals_single(coco_tree):  # noqa: F811
    """On a multi-device host the pipeline auto-shards the batch dim over
    the mesh (replicated params, GSPMD split); captions must equal the
    single-device pipeline's, and buckets round up to device-divisible
    sizes."""
    import jax
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 255, (5, 224, 224, 3), dtype=np.uint8)
    single = _tiny_pipeline(batch_size=4, devices=jax.devices()[:1])
    sharded = _tiny_pipeline(batch_size=4)          # all devices
    assert single._sharding is None
    assert sharded._sharding is not None
    assert sharded.batch_size % jax.device_count() == 0
    assert sharded(list(imgs)) == single(list(imgs))


def test_batch_buckets(coco_tree):  # noqa: F811
    """Bucketed padding: same captions, smallest-fitting compiled shape.
    Pinned to one device — on a mesh the buckets are rounded up to
    device-divisible sizes (test_pipeline_sharded_equals_single)."""
    import jax
    one = jax.devices()[:1]
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (5, 224, 224, 3), dtype=np.uint8)
    flat = _tiny_pipeline(batch_size=4, devices=one)
    bucketed = _tiny_pipeline(batch_buckets=(1, 2, 4), devices=one)
    assert bucketed.batch_size == 4

    seen = []
    real_fn = bucketed._fn

    def spy(frozen, params, stats, chunk, rng_):
        seen.append(int(chunk.shape[0]))
        return real_fn(frozen, params, stats, chunk, rng_)

    bucketed._fn = spy
    assert bucketed(list(imgs)) == flat(list(imgs))
    assert seen == [4, 1]          # 5 images -> full bucket + 1-bucket tail
    seen.clear()
    assert bucketed(imgs[0]) == flat([imgs[0]])[0]
    assert seen == [1]             # a lone request is not padded to 4

    with pytest.raises(ValueError):
        _tiny_pipeline(batch_buckets=(0, 2), devices=one)


def test_hot_reload_from_experiment(coco_tree):  # noqa: F811
    """Hot reload: after the checkpoint files change on disk,
    ``reload_from_experiment`` swaps the weights into the SAME pipeline
    (compiled programs reused — shapes unchanged) and captions match a
    freshly-built pipeline reading the same files. The original files are
    restored afterwards (the fixture is module-scoped)."""
    import base_main
    import jax
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline
    from depth_image_captioning_pub_tpu.utils.checkpoint import (
        load_component, save_component)

    d = coco_tree / "exp_result" / "base_soft"
    f = d / "base_soft_decoder_best_coco0.pth.msgpack"
    if not f.exists():
        assert base_main.main(["soft", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0
    pipe = CaptionPipeline.from_experiment("base-soft", batch_size=2)
    val = coco_tree / "dataset" / "coco2014" / "val2014"
    paths = sorted(str(p) for p in val.iterdir())[:3]
    caps0 = pipe(paths)

    original = f.read_bytes()
    try:
        dec = load_component(str(f), pipe.params["decoder"])
        dec2 = jax.tree_util.tree_map(lambda x: x * 1.5 + 0.25, dec)
        save_component(str(d / "base_soft_decoder_best_coco0.pth"), dec2)
        pipe.reload_from_experiment()
        caps1 = pipe(paths)
        fresh = CaptionPipeline.from_experiment("base-soft", batch_size=2)
        assert caps1 == fresh(paths)   # swapped weights == fresh load
        assert caps1 != caps0          # the swap actually took effect
    finally:
        f.write_bytes(original)

    pipe.reload_from_experiment()      # restore in-memory too
    assert pipe(paths) == caps0


def test_reload_requires_experiment(tiny_env):
    """A pipeline not built by from_experiment refuses
    reload_from_experiment loudly (reload_weights remains available)."""
    pipe = _tiny_pipeline(batch_size=2)
    with pytest.raises(RuntimeError, match="from_experiment"):
        pipe.reload_from_experiment()
