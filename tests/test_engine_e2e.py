"""End-to-end engine tests on the synthetic COCO fixture: train() writes the
reference's artifacts (CSV losses, best-val component checkpoints) and
evaluate() produces scores, all on tiny models/CPU."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

from depth_image_captioning_pub_tpu.config import ConfigEval, ConfigTrain
from depth_image_captioning_pub_tpu.data.coco import CocoCaptions
from depth_image_captioning_pub_tpu.data.vocab import (
    build_vocab, captions_from_coco_json)
from depth_image_captioning_pub_tpu.engine.evaluate import (
    evaluate, generate_captions, make_caption_fn)
from depth_image_captioning_pub_tpu.engine.train import gumbel_temperature, train
from depth_image_captioning_pub_tpu.models.captioner import build_captioner

TINY = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    from depth_image_captioning_pub_tpu.data.synthetic import make_synthetic_coco
    out = tmp_path_factory.mktemp("cocofix")
    img_dir, ann_file = make_synthetic_coco(str(out), num_images=6,
                                            image_hw=(64, 64), seed=1)
    caps = captions_from_coco_json(ann_file)
    w2i, i2w = build_vocab(caps, [], min_count=1)
    ds = CocoCaptions(img_dir, ann_file, image_size=(64, 64))
    return ds, w2i, i2w, str(out)


def _cfg(tmp, train=True):
    cfg = ConfigTrain() if train else ConfigEval()
    cfg.batch_size = 4
    cfg.max_caption_len = 14
    cfg.save_directory_soft = os.path.join(tmp, "exp_result/base_soft")
    cfg.save_directory_nic = os.path.join(tmp, "exp_result/NIC")
    cfg.moving_avg = 10
    return cfg


def test_gumbel_temperature_schedule():
    import math
    assert gumbel_temperature(0) == 1.0
    assert gumbel_temperature(9) == 1.0
    assert gumbel_temperature(10) == pytest.approx(math.cos(math.pi * 10 / 360))
    assert gumbel_temperature(15) == pytest.approx(math.cos(math.pi * 10 / 360))
    assert gumbel_temperature(350) == 0.5  # floor (base_train.py:241-242)


def test_train_base_soft_writes_artifacts(fixture_env, tmp_path):
    ds, w2i, _, _ = fixture_env
    cfg = _cfg(str(tmp_path))
    summary = train("base-soft", ext=0, use_data="coco", cfg=cfg,
                    datasets=(ds, ds), word_to_id=w2i, num_epochs=2,
                    quiet=True, resnet_layers=TINY)
    assert np.isfinite(summary["best_val_loss"])
    d = cfg.save_directory_soft
    assert os.path.exists(f"{d}/base_soft_train_loss_coco0.csv")
    assert os.path.exists(f"{d}/base_soft_val_loss_coco0.csv")
    with open(f"{d}/base_soft_train_loss_coco0.csv") as f:
        rows = f.read().strip().splitlines()
    assert len(rows) == 2 and rows[0].startswith("0,")
    assert glob.glob(f"{d}/base_soft_encoder_best_coco0.pth.msgpack")
    assert glob.glob(f"{d}/base_soft_decoder_best_coco0.pth.msgpack")


def test_non_lead_process_writes_no_artifacts(fixture_env, tmp_path,
                                              monkeypatch):
    """Multi-host: a non-zero jax.process_index runs the identical SPMD
    loop but writes NO artifacts (CSV/JSONL/best-component files are
    process 0's job — N hosts double-writing a shared filesystem would
    race). Single-process runs are unaffected (process_index()==0)."""
    ds, w2i, _, _ = fixture_env
    cfg = _cfg(str(tmp_path))
    monkeypatch.setattr(jax, "process_index", lambda backend=None: 1)
    summary = train("base-soft", ext=0, use_data="coco", cfg=cfg,
                    datasets=(ds, ds), word_to_id=w2i, num_epochs=1,
                    quiet=True, resnet_layers=TINY)
    assert np.isfinite(summary["best_val_loss"])
    written = [f for f in glob.glob(f"{cfg.save_directory_soft}/**",
                                    recursive=True) if os.path.isfile(f)]
    assert written == []


def test_train_nic_runs(fixture_env, tmp_path):
    ds, w2i, _, _ = fixture_env
    cfg = _cfg(str(tmp_path))
    summary = train("nic", ext=1, use_data="coco", cfg=cfg,
                    datasets=(ds, ds), word_to_id=w2i, num_epochs=1,
                    quiet=True, resnet_layers=TINY)
    assert np.isfinite(summary["best_val_loss"])
    assert glob.glob(f"{cfg.save_directory_nic}/nic_decoder_best1.pth.msgpack")


def test_generate_and_evaluate(fixture_env, tmp_path):
    ds, w2i, i2w, _ = fixture_env
    cfg = _cfg(str(tmp_path), train=False)
    cap = build_captioner("base-soft", len(w2i), cfg,
                          encoder_dtype=jnp.float32, resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL
    fn = make_caption_fn(cap, w2i[SPECIAL.start], max_length=8)
    hypos, refs = generate_captions(fn, frozen, params, stats,
                                    ds, w2i, i2w, batch_size=4)
    assert len(hypos) == len(ds) and len(refs) == len(ds)
    assert all(isinstance(h, str) for h in hypos)
    assert all(len(r) == 5 for r in refs)

    scores = evaluate("base-soft", "coco", cap,
                      checkpoint_loader=lambda i: (frozen["encoder"], params,
                                                   stats),
                      dataset=ds, word_to_id=w2i, id_to_word=i2w, cfg=cfg,
                      num_sets=2, quiet=True,
                      scores_pickle=str(tmp_path / "coco_scores.pkl"))
    for key in ("Bleu_1", "CIDEr", "ROUGE_L", "METEOR"):
        assert len(scores[key]) == 2
    assert os.path.exists(tmp_path / "coco_scores.pkl")


def test_visualize_sample_dir(fixture_env, tmp_path):
    ds, w2i, i2w, root = fixture_env
    from depth_image_captioning_pub_tpu.engine.visualize import sample_directory
    cap = build_captioner("base-soft", len(w2i), _cfg(str(tmp_path)),
                          encoder_dtype=jnp.float32, resnet_layers=TINY)
    params, frozen, stats = cap.init(jax.random.PRNGKey(0),
                                     image_hw=(64, 64))
    enc_apply = cap.encoder_apply()
    samp = cap.sample_apply()
    from depth_image_captioning_pub_tpu.data.tokenizer import SPECIAL

    def caption_one(img):
        feats = enc_apply(frozen["encoder"], jnp.asarray(img)[None])
        toks, alphas = samp(params["decoder"], feats, w2i[SPECIAL.start],
                            max_length=4)
        return np.asarray(toks)[0], np.asarray(alphas)[0]

    # use one fixture image dir as the "sample_pic" source
    src = os.path.join(root, "train2014")
    out = str(tmp_path / "viz")
    caps = sample_directory(src, out, caption_one, i2w, image_size=(64, 64))
    assert len(caps) == len(ds)
    assert os.path.exists(os.path.join(out, "caption.txt"))
    pngs = glob.glob(os.path.join(out, "*", "*.png"))
    assert pngs  # at least one overlay rendered
