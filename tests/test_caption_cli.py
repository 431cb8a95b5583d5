"""One-shot captioning CLI (depth_image_captioning_pub_tpu/caption.py).

Pinned: path expansion (files/dirs/missing), flag threading into
CaptionPipeline.from_experiment, and a real end-to-end run against a
trained tiny experiment (captions written for every input, --json and
--output shapes, beam=1 == the eval CLI's greedy captions)."""

import json
import os
import sys

import numpy as np
import pytest

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depth_image_captioning_pub_tpu import caption as caption_cli


def test_expand_paths(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for name in ("b.jpg", "a.png", "notes.txt", "c.jpeg"):
        (d / name).write_bytes(b"x")
    single = tmp_path / "top.jpg"
    single.write_bytes(b"x")
    got = caption_cli.expand_paths([str(single), str(d)])
    assert got == [str(single), str(d / "a.png"), str(d / "b.jpg"),
                   str(d / "c.jpeg")]


def test_missing_path_errors(tmp_path, capsys):
    assert caption_cli.main([str(tmp_path / "nope.jpg")]) == 1
    assert "not found" in capsys.readouterr().err


def test_flags_thread_to_pipeline(monkeypatch, tmp_path):
    from PIL import Image
    img = tmp_path / "x.jpg"
    Image.fromarray(np.full((32, 32, 3), 100, np.uint8)).save(str(img))
    seen = {}

    class FakePipe:
        image_hw = (224, 224)

        def __call__(self, images):
            return ["a cat"] * len(images)

    def fake_from_experiment(kind, use_data, **kw):
        seen.update(kind=kind, use_data=use_data, **kw)
        return FakePipe()

    monkeypatch.setattr(
        "depth_image_captioning_pub_tpu.pipeline.CaptionPipeline."
        "from_experiment", staticmethod(fake_from_experiment))
    rc = caption_cli.main([str(img), "--kind", "depth-soft", "--beam", "3",
                           "--set-idx", "2", "--sample",
                           "--temperature", "0.8", "--top-k", "5",
                           "--seed", "7", "--gelu", "tanh",
                           "--batch-size", "4"])
    assert rc == 0
    assert seen["kind"] == "depth-soft" and seen["beam_size"] == 3
    assert seen["set_idx"] == 2 and seen["sample"] is True
    assert seen["temperature"] == 0.8 and seen["top_k"] == 5
    assert seen["seed"] == 7 and seen["batch_size"] == 4
    assert seen["cfg"] is not None and seen["cfg"].dpt_gelu == "tanh"


@pytest.fixture(scope="module")
def trained_cwd(tmp_path_factory, request):
    """A cwd with a 1-epoch tiny base-soft experiment trained in it."""
    from depth_image_captioning_pub_tpu.data.synthetic import (
        make_synthetic_coco)
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json, save_vocab)
    import base_main

    root = tmp_path_factory.mktemp("capcwd")
    ddir = root / "dataset" / "coco2014"
    ddir.mkdir(parents=True)
    timg, tann = make_synthetic_coco(str(ddir), num_images=6, seed=11,
                                     split="train2014")
    vimg, vann = make_synthetic_coco(str(ddir), num_images=4, seed=12,
                                     split="val2014")
    os.rename(tann, ddir / "captions_train2014.json")
    os.rename(vann, ddir / "captions_val2014.json")
    w2i, i2w = build_vocab(
        captions_from_coco_json(str(ddir / "captions_train2014.json")),
        captions_from_coco_json(str(ddir / "captions_val2014.json")),
        min_count=1)
    save_vocab(w2i, i2w, str(ddir / "word_to_id.pkl"),
               str(ddir / "id_to_word.pkl"))
    os.environ["DCAP_RESNET_LAYERS"] = "1,1,1,1"
    old = os.getcwd()
    os.chdir(root)
    try:
        assert base_main.main(["soft", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0
    finally:
        os.chdir(old)
    request.addfinalizer(lambda: os.environ.pop("DCAP_RESNET_LAYERS", None))
    return root


def test_end_to_end_captions(trained_cwd, monkeypatch, capsys):
    monkeypatch.setenv("DCAP_RESNET_LAYERS", "1,1,1,1")
    monkeypatch.chdir(trained_cwd)
    val_dir = trained_cwd / "dataset" / "coco2014" / "val2014"
    imgs = sorted(str(p) for p in val_dir.iterdir())[:3]

    rc = caption_cli.main(imgs + ["--kind", "base-soft"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    for path, line in zip(imgs, lines):
        got_path, cap = line.split("\t")
        assert got_path == path and isinstance(cap, str)

    out = trained_cwd / "caps.json"
    rc = caption_cli.main([str(val_dir), "--kind", "base-soft", "--json",
                           "--output", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert len(data) == 4 and all({"path", "caption"} <= set(d) for d in data)
    # the directory run covers the files of the single-file run: captions
    # must agree (same greedy program, batch-invariant padding)
    by_path = {d["path"]: d["caption"] for d in data}
    for path, line in zip(imgs, lines):
        assert by_path[path] == line.split("\t")[1]


def test_corrupt_file_does_not_kill_the_batch(trained_cwd, monkeypatch,
                                              capsys, tmp_path):
    """One truncated JPEG in a directory run: warned on stderr, captioned as
    '<decode failed>', and the OTHER files' captions are unchanged vs a
    clean run (tolerant decode_batch(on_error='zero') path)."""
    import shutil

    monkeypatch.setenv("DCAP_RESNET_LAYERS", "1,1,1,1")
    monkeypatch.chdir(trained_cwd)
    val_dir = trained_cwd / "dataset" / "coco2014" / "val2014"
    good = sorted(str(p) for p in val_dir.iterdir())[:2]

    rc = caption_cli.main(good + ["--kind", "base-soft"])
    assert rc == 0
    clean = dict(ln.split("\t") for ln in
                 capsys.readouterr().out.strip().splitlines())

    d = tmp_path / "mixed"
    d.mkdir()
    for p in good:
        shutil.copy(p, d / os.path.basename(p))
    bad = d / "a_truncated.jpg"   # sorts first; JPEG magic, then garbage
    bad.write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 64)

    rc = caption_cli.main([str(d), "--kind", "base-soft"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "decode failed" in captured.err and "a_truncated.jpg" in captured.err
    got = dict(ln.split("\t") for ln in captured.out.strip().splitlines())
    assert got[str(bad)] == "<decode failed>"
    for p in good:
        assert got[str(d / os.path.basename(p))] == clean[p]

    # all-corrupt input: clean error, rc 1
    d2 = tmp_path / "allbad"
    d2.mkdir()
    (d2 / "x.jpg").write_bytes(b"\xff\xd8\xff\xe0junk")
    rc = caption_cli.main([str(d2), "--kind", "base-soft"])
    assert rc == 1
    assert "no decodable images" in capsys.readouterr().err
