"""AOT export (depth_image_captioning_pub_tpu/export.py).

Pinned: export -> load roundtrip captions equal the live pipeline's (greedy,
beam, stochastic with the same seed, and depth-soft incl. the DPT stage in
the program), artifact layout/meta contents, refusal of non-portable
configurations, and the dcap-export -> dcap-caption --export-dir CLI path
against a trained tiny experiment."""

import json
import os
import sys

import numpy as np
import pytest

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_cli import coco_tree  # noqa: F401  (module-scoped fixture)


@pytest.fixture(autouse=True)
def tiny_env(monkeypatch, coco_tree):  # noqa: F811
    monkeypatch.setenv("DCAP_RESNET_LAYERS", "1,1,1,1")
    monkeypatch.setenv("DCAP_TINY_DPT", "1")
    monkeypatch.chdir(coco_tree)


def _vocab():
    w2i = {f"w{i}": i for i in range(16)}
    w2i.update({"<start>": 16, "<end>": 17, "<unk>": 18, "<null>": 19})
    return w2i, {i: w for w, i in w2i.items()}


def _tiny_pipeline(**kw):
    import jax
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    w2i, i2w = _vocab()
    cap = build_captioner("base-soft", len(w2i), ConfigEval(),
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    kw.setdefault("devices", [jax.devices()[0]])
    return CaptionPipeline(cap, params, {"encoder": frozen["encoder"]},
                           stats, w2i, i2w, **kw)


def _imgs(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8)


def test_export_roundtrip_greedy(tmp_path):
    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)

    pipe = _tiny_pipeline(batch_buckets=(2, 4))
    imgs = _imgs(3)
    want = pipe(list(imgs))

    out = tmp_path / "art"
    meta = export_pipeline(pipe, str(out))
    assert sorted(meta["buckets"]) == [2, 4]
    assert (out / "meta.json").exists() and (out / "variables.msgpack").exists()
    assert (out / "program_b2.bin").exists() and (out / "program_b4.bin").exists()
    on_disk = json.loads((out / "meta.json").read_text())
    assert on_disk["kind"] == "base-soft" and on_disk["beam_size"] == 1

    loaded = ExportedPipeline.load(str(out))
    assert loaded.batch_buckets == (2, 4)
    assert loaded(list(imgs)) == want
    # single image pads to the small bucket, same caption
    assert loaded(imgs[0]) == want[0]


def test_export_beam(tmp_path):
    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)

    pipe = _tiny_pipeline(batch_size=4, beam_size=2)
    imgs = _imgs(3, seed=1)
    want = pipe(list(imgs))
    export_pipeline(pipe, str(tmp_path / "a"))
    loaded = ExportedPipeline.load(str(tmp_path / "a"))
    assert loaded.meta["beam_size"] == 2
    assert loaded(list(imgs)) == want


def test_export_sampling_same_seed(tmp_path):
    """The rng rides as a program argument: an exported stochastic program
    reproduces the live pipeline's draws for the same seed, and the loader's
    key advances per call like the pipeline's."""
    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)

    imgs = _imgs(3, seed=2)
    pipe = _tiny_pipeline(batch_size=4, sample=True, temperature=1.5, seed=7)
    export_pipeline(pipe, str(tmp_path / "a"))
    want_first = pipe(list(imgs))

    loaded = ExportedPipeline.load(str(tmp_path / "a"), seed=7)
    assert loaded.sample is True
    assert loaded(list(imgs)) == want_first
    k0 = np.asarray(loaded._rng).copy()
    loaded(list(imgs))
    assert not np.array_equal(np.asarray(loaded._rng), k0)


def test_export_depth(tmp_path):
    """depth-soft: the exported program contains the whole DPT -> depth-CNN
    -> fused decode chain; DPT variables ride in the artifact."""
    import jax
    from depth_image_captioning_pub_tpu import cli
    from depth_image_captioning_pub_tpu.config import ConfigEval
    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)
    from depth_image_captioning_pub_tpu.models.captioner import build_captioner
    from depth_image_captioning_pub_tpu.pipeline import CaptionPipeline

    w2i, i2w = _vocab()
    cfg = ConfigEval()
    cap = build_captioner("depth-soft", len(w2i), cfg,
                          resnet_layers=(1, 1, 1, 1))
    params, frozen, stats = cap.init(jax.random.PRNGKey(0))
    depth_fn, dpt_vars = cli.make_depth_fn(cfg)   # tiny via $DCAP_TINY_DPT
    pipe = CaptionPipeline(
        cap, params, {"encoder": frozen["encoder"], "dpt": dpt_vars}, stats,
        w2i, i2w, depth_fn=depth_fn, batch_size=2,
        devices=[jax.devices()[0]])
    imgs = _imgs(2, seed=3)
    want = pipe(list(imgs))
    export_pipeline(pipe, str(tmp_path / "a"))
    loaded = ExportedPipeline.load(str(tmp_path / "a"))
    assert "dpt" in loaded.frozen
    assert loaded(list(imgs)) == want


def test_export_multi_platform(tmp_path):
    """platforms=("cpu","tpu"): ONE artifact lowered for both — the CI host
    can smoke-test the very bytes that serve on TPU. Pinned here by loading
    and running the dual-platform artifact on CPU (captions == live)."""
    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)

    pipe = _tiny_pipeline(batch_size=2)
    imgs = _imgs(2, seed=4)
    want = pipe(list(imgs))
    meta = export_pipeline(pipe, str(tmp_path / "a"),
                           platforms=("cpu", "tpu"))
    assert meta["platforms"] == ["cpu", "tpu"]
    loaded = ExportedPipeline.load(str(tmp_path / "a"))
    assert loaded.meta["platforms"] == ["cpu", "tpu"]
    assert loaded(list(imgs)) == want


def test_export_serve_http(tmp_path):
    """dcap-serve over an exported artifact: a real HTTP round trip through
    ExportedPipeline (micro-batching worker included) captions identically
    to calling the loaded pipeline directly."""
    import io
    import json as json_mod
    import threading
    import urllib.request

    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)
    from depth_image_captioning_pub_tpu.serve import serve
    from PIL import Image

    pipe = _tiny_pipeline(batch_size=2)
    export_pipeline(pipe, str(tmp_path / "a"))
    loaded = ExportedPipeline.load(str(tmp_path / "a"))

    httpd = serve(loaded, host="127.0.0.1", port=0, batch_window_ms=50.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        img = _imgs(1, seed=5)[0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG")
        payload = buf.getvalue()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            got = json_mod.loads(r.read())["caption"]
        # compare on the same lossy round-tripped bytes the server decoded
        arr = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        assert got == loaded(arr)
    finally:
        httpd.shutdown()
        httpd.service.stop()


def test_export_refusals(tmp_path):
    from depth_image_captioning_pub_tpu.export import export_pipeline

    pipe = _tiny_pipeline(batch_size=2)
    pipe.use_pallas = True
    with pytest.raises(ValueError, match="[Pp]allas"):
        export_pipeline(pipe, str(tmp_path / "a"))
    pipe.use_pallas = False
    pipe._sharding = object()
    with pytest.raises(ValueError, match="single-device"):
        export_pipeline(pipe, str(tmp_path / "a"))


def test_export_format_version_guard(tmp_path):
    from depth_image_captioning_pub_tpu.export import (
        ExportedPipeline, export_pipeline)

    pipe = _tiny_pipeline(batch_size=2)
    export_pipeline(pipe, str(tmp_path / "a"))
    meta_path = tmp_path / "a" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["format_version"] = 99
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="newer"):
        ExportedPipeline.load(str(tmp_path / "a"))


def test_export_cli_e2e(coco_tree, capsys):  # noqa: F811
    """dcap-export on a trained experiment, then dcap-caption --export-dir:
    captions equal the live from_experiment path's."""
    import base_main
    from depth_image_captioning_pub_tpu import caption as caption_cli
    from depth_image_captioning_pub_tpu import export as export_cli

    d = coco_tree / "exp_result" / "base_soft"
    if not (d / "base_soft_decoder_best_coco0.pth.msgpack").exists():
        assert base_main.main(["soft", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0
    art = coco_tree / "artifact"
    assert export_cli.main([str(art), "--kind", "base-soft",
                            "--batch-buckets", "1,2"]) == 0
    assert "exported base-soft" in capsys.readouterr().out

    val = coco_tree / "dataset" / "coco2014" / "val2014"
    imgs = sorted(str(p) for p in val.iterdir())[:2]
    assert caption_cli.main(imgs + ["--kind", "base-soft"]) == 0
    live = [ln.split("\t")[1] for ln in
            capsys.readouterr().out.strip().splitlines()]
    assert caption_cli.main(imgs + ["--export-dir", str(art)]) == 0
    exported = [ln.split("\t")[1] for ln in
                capsys.readouterr().out.strip().splitlines()]
    assert exported == live
