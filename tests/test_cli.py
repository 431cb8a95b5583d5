"""CLI end-to-end tests: the four entry points run the reference's grammar
against a synthetic COCO tree (train -> checkpoints -> score -> sample),
with the backbone shrunk via $DCAP_RESNET_LAYERS."""

import os
import pickle
import shutil
import sys

import numpy as np
import pytest

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """A cwd-shaped fixture: dataset/coco2014/{train2014,val2014,jsons,
    vocab pickles}, data_index/np_val_index.npy, sample_pic/dog."""
    from depth_image_captioning_pub_tpu.data.synthetic import make_synthetic_coco
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json, save_vocab)
    root = tmp_path_factory.mktemp("cwd")
    ddir = root / "dataset" / "coco2014"
    ddir.mkdir(parents=True)
    timg, tann = make_synthetic_coco(str(ddir), num_images=6, seed=3,
                                     split="train2014")
    vimg, vann = make_synthetic_coco(str(ddir), num_images=5, seed=4,
                                     split="val2014")
    os.rename(tann, ddir / "captions_train2014.json")
    os.rename(vann, ddir / "captions_val2014.json")
    w2i, i2w = build_vocab(
        captions_from_coco_json(str(ddir / "captions_train2014.json")),
        captions_from_coco_json(str(ddir / "captions_val2014.json")),
        min_count=1)
    save_vocab(w2i, i2w, str(ddir / "word_to_id.pkl"),
               str(ddir / "id_to_word.pkl"))
    (root / "data_index").mkdir()
    np.save(root / "data_index" / "np_val_index.npy",
            np.array([0, 2, 4], dtype=np.int64))
    sp = root / "sample_pic" / "dog"
    sp.mkdir(parents=True)
    src = next((root / "dataset/coco2014/val2014").iterdir())
    shutil.copy(src, sp / "dog.jpg")
    return root


@pytest.fixture(autouse=True)
def tiny_env(monkeypatch, coco_tree):
    monkeypatch.setenv("DCAP_RESNET_LAYERS", "1,1,1,1")
    monkeypatch.setenv("DCAP_TINY_DPT", "1")
    monkeypatch.chdir(coco_tree)


def test_base_main_soft_then_score_then_sample(coco_tree, capsys):
    import base_main
    import base_evaluation
    assert base_main.main(["soft", "coco", "--epochs", "1",
                           "--exp-time", "1"]) == 0
    d = coco_tree / "exp_result" / "base_soft"
    assert (d / "base_soft_decoder_best_coco0.pth.msgpack").exists()
    assert (d / "base_soft_train_loss_coco0.csv").exists()

    assert base_evaluation.main(["soft", "score", "coco",
                                 "--num-sets", "1"]) == 0
    with open(d / "coco_scores.pkl", "rb") as f:
        scores = pickle.load(f)
    assert len(scores["CIDEr"]) == 1

    assert base_evaluation.main(["soft", "sample", "dog", "coco"]) == 0
    out_dir = coco_tree / "sample_pic" / "dog" / "base_soft"
    assert (out_dir / "caption.txt").exists()


def test_base_main_rejects_bad_args(capsys):
    import base_main
    assert base_main.main([]) == 1
    assert base_main.main(["soft", "imagenet"]) == 1
    assert base_main.main(["warp"]) == 1


def test_base_main_nic_and_eval(coco_tree):
    import base_main
    import base_evaluation
    assert base_main.main(["nic", "--epochs", "1", "--exp-time", "1"]) == 0
    d = coco_tree / "exp_result" / "NIC"
    assert (d / "nic_decoder_best0.pth.msgpack").exists()
    assert base_evaluation.main(["nic", "--num-sets", "1"]) == 0
    assert (d / "nic_scores.pkl").exists()


def test_depth_main_and_eval(coco_tree):
    import depth_main
    import depth_evaluation
    # random-init DPT (no weights available in this environment)
    assert depth_main.main(["soft", "cnn", "coco", "--epochs", "1",
                            "--exp-time", "1", "--no-depth-cache"]) == 0
    d = coco_tree / "exp_result" / "CNN_depth_soft"
    assert (d / "depth_soft_decoder_best_coco0.pth.msgpack").exists()
    assert (d / "depth_soft_D_encoder_best_coco0.pth.msgpack").exists()
    assert depth_evaluation.main(["soft", "score", "coco",
                                  "--num-sets", "1"]) == 0
    assert (d / "coco_scores.pkl").exists()


def test_base_main_hard_and_eval(coco_tree):
    """The hard-attention CLI path — the exact route where the reference
    crashes (base_main.py:32 NameError) and mis-saves into the soft dirs
    (base_train.py:253); ours must save under exp_result/base_hard and
    score from there."""
    import base_main
    import base_evaluation
    assert base_main.main(["hard", "coco", "--epochs", "1",
                           "--exp-time", "1"]) == 0
    d = coco_tree / "exp_result" / "base_hard"
    assert (d / "base_hard_decoder_best_coco0.pth.msgpack").exists()
    assert (d / "base_hard_train_loss_coco0.csv").exists()
    assert base_evaluation.main(["hard", "score", "coco",
                                 "--num-sets", "1"]) == 0
    assert (d / "coco_scores.pkl").exists()


def test_depth_main_mlp_path(coco_tree):
    """The MLP-depth CLI path (reference: crashes at import,
    depth_main.py:4; SURVEY §4.1): trains the mdepth-soft config, writes
    mdepth_* component checkpoints, and — closing the loop the reference
    never could — evaluates them via `depth_evaluation --mlp` (scores
    pickle with the mdepth_ prefix, no clobber of the CNN-depth scores
    sharing the dir)."""
    import depth_main
    import depth_evaluation
    assert depth_main.main(["soft", "mlp", "coco", "--epochs", "1",
                            "--exp-time", "1", "--no-depth-cache"]) == 0
    d = coco_tree / "exp_result" / "CNN_depth_soft"
    assert (d / "mdepth_soft_decoder_best_coco0.pth.msgpack").exists()
    assert (d / "mdepth_soft_D_encoder_best_coco0.pth.msgpack").exists()

    assert depth_evaluation.main(["soft", "score", "coco", "--mlp",
                                  "--num-sets", "1"]) == 0
    with open(d / "mdepth_coco_scores.pkl", "rb") as f:
        scores = pickle.load(f)
    assert len(scores["CIDEr"]) == 1


def test_depth_sample_mode(coco_tree):
    """Depth sample mode end to end: the frozen DPT feeds the trained
    depth CNN inside sample_mode's per-image jit, overlays land under
    depth_soft/ (reference: depth_evaluation.py:196-386)."""
    import depth_main
    import depth_evaluation
    d = coco_tree / "exp_result" / "CNN_depth_soft"
    if not (d / "depth_soft_decoder_best_coco0.pth.msgpack").exists():
        assert depth_main.main(["soft", "cnn", "coco", "--epochs", "1",
                                "--exp-time", "1", "--no-depth-cache"]) == 0
    assert depth_evaluation.main(["soft", "sample", "dog", "coco"]) == 0
    out = coco_tree / "sample_pic" / "dog" / "depth_soft"
    assert (out / "caption.txt").exists()
    # per-word overlays land in a per-image subdir (visualize.py:55)
    assert any(p.suffix == ".png" for p in out.rglob("*.png"))


def test_depth_main_hard_and_eval(coco_tree):
    """The depth-HARD CLI path: Gumbel-softmax training + Gumbel-max eval
    through depth_main/depth_evaluation (reference: depth_train.py:338,
    depth_evaluation.py:26 — the one depth config test_cli didn't drive
    end to end)."""
    import depth_main
    import depth_evaluation
    assert depth_main.main(["hard", "cnn", "coco", "--epochs", "1",
                            "--exp-time", "1", "--no-depth-cache"]) == 0
    d = coco_tree / "exp_result" / "CNN_depth_hard"
    assert (d / "depth_hard_decoder_best_coco0.pth.msgpack").exists()
    assert (d / "depth_hard_D_encoder_best_coco0.pth.msgpack").exists()
    assert depth_evaluation.main(["hard", "score", "coco",
                                  "--num-sets", "1"]) == 0
    assert (d / "coco_scores.pkl").exists()


def test_base_hard_sample_mode(coco_tree):
    """Hard-attention sample mode: Gumbel-max one-hot alphas drive the
    per-word overlays (reference: base_evaluation.py:171-336 with
    Hard_sample); the run must produce caption.txt + overlays under
    base_hard/ and be reproducible run to run (fixed PRNG key)."""
    import base_main
    import base_evaluation
    d = coco_tree / "exp_result" / "base_hard"
    if not (d / "base_hard_decoder_best_coco0.pth.msgpack").exists():
        assert base_main.main(["hard", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0
    assert base_evaluation.main(["hard", "sample", "dog", "coco"]) == 0
    out = coco_tree / "sample_pic" / "dog" / "base_hard"
    assert (out / "caption.txt").exists()
    first = (out / "caption.txt").read_text()
    assert base_evaluation.main(["hard", "sample", "dog", "coco"]) == 0
    assert (out / "caption.txt").read_text() == first  # fixed-key draws


def test_depth_main_rejects_bad_args():
    import depth_main
    assert depth_main.main(["soft", "cnn", "imagenet"]) == 1
    assert depth_main.main(["soft"]) == 1


def test_beam_and_pallas_decode_cli_flags(coco_tree):
    """--beam and --pallas-decode driven through the base_evaluation CLI —
    the flag-parsing/threading layer (VERDICT r2 weak #5). Op-level behavior
    is pinned separately (tests/test_beam_search.py, test_pallas_decode.py);
    here beam=1 and --pallas-decode must reproduce the greedy CLI scores
    exactly (identical captions -> identical score pickle), and a wider
    beam must run end-to-end and write a well-formed pickle."""
    import base_main
    import base_evaluation
    d = coco_tree / "exp_result" / "base_soft"
    if not (d / "base_soft_decoder_best_coco0.pth.msgpack").exists():
        assert base_main.main(["soft", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0

    def scores_after(extra):
        argv = ["soft", "score", "coco", "--num-sets", "1"] + extra
        assert base_evaluation.main(argv) == 0
        with open(d / "coco_scores.pkl", "rb") as f:
            return pickle.load(f)

    greedy = scores_after([])
    beam1 = scores_after(["--beam", "1"])
    assert beam1 == greedy
    pallas = scores_after(["--pallas-decode"])
    # CPU interpret-mode kernel is bit-identical to the XLA scan
    # (models/decoder.py:322), so the CLI scores must match exactly
    assert pallas == greedy
    beam2 = scores_after(["--beam", "2"])
    assert set(beam2) == set(greedy)
    assert all(len(v) == 1 and np.isfinite(v[0]) for v in beam2.values())
    # combined flags: the whole-search beam kernel (bit-identical to the
    # XLA search in CPU interpret mode) must reproduce beam2's scores
    beam2_kernel = scores_after(["--beam", "2", "--pallas-decode"])
    assert beam2_kernel == beam2


def test_sample_stochastic_cli(coco_tree):
    """--stochastic driven through base_evaluation's sample mode (the
    flag-threading layer; decoder-level sampling behavior is pinned in
    tests/test_sampling_decode.py). top_k=1 must reproduce the greedy
    caption exactly; a fixed seed must be reproducible across runs."""
    import base_main
    import base_evaluation
    d = coco_tree / "exp_result" / "base_soft"
    if not (d / "base_soft_decoder_best_coco0.pth.msgpack").exists():
        assert base_main.main(["soft", "coco", "--epochs", "1",
                               "--exp-time", "1"]) == 0
    cap_txt = coco_tree / "sample_pic" / "dog" / "base_soft" / "caption.txt"

    def caption_after(extra):
        argv = ["soft", "sample", "dog", "coco"] + extra
        assert base_evaluation.main(argv) == 0
        return cap_txt.read_text()

    greedy = caption_after([])
    assert caption_after(["--stochastic", "--top-k", "1"]) == greedy
    draw1 = caption_after(["--stochastic", "--temperature", "2.0",
                           "--seed", "5"])
    draw2 = caption_after(["--stochastic", "--temperature", "2.0",
                           "--seed", "5"])
    assert draw1 == draw2  # same seed -> same draws


def test_depth_evaluation_threads_sampling_flags(monkeypatch):
    """depth_evaluation must pass the parsed sampling flags through to
    sample_mode (regression: the flags were parsed but dropped)."""
    import depth_evaluation

    seen = {}

    def fake_sample_mode(atten, pic, use_data, cfg, **kw):
        seen.update(atten=atten, pic=pic, use_data=use_data, **kw)
        return 0

    monkeypatch.setattr(depth_evaluation, "make_depth_fn",
                        lambda cfg: ("depth_fn", "dpt_vars"))
    monkeypatch.setattr(depth_evaluation.base_cli, "sample_mode",
                        fake_sample_mode)
    rc = depth_evaluation.main(["soft", "sample", "dog", "coco",
                                "--stochastic", "--temperature", "1.3",
                                "--top-k", "7", "--top-p", "0.9",
                                "--seed", "11"])
    assert rc == 0
    assert seen["sampling"] == {"temperature": 1.3, "top_k": 7,
                                "top_p": 0.9}
    assert seen["seed"] == 11 and seen["depth"] is True


def test_depth_evaluation_threads_gelu_flag(monkeypatch):
    """--gelu tanh must reach make_depth_fn via cfg.dpt_gelu (the knob is
    applied inside make_depth_fn, so cfg threading is the contract)."""
    import depth_evaluation

    seen = {}

    def fake_make_depth_fn(cfg):
        seen["gelu"] = cfg.dpt_gelu
        return ("depth_fn", "dpt_vars")

    monkeypatch.setattr(depth_evaluation, "make_depth_fn",
                        fake_make_depth_fn)
    monkeypatch.setattr(depth_evaluation.base_cli, "sample_mode",
                        lambda *a, **kw: 0)
    rc = depth_evaluation.main(["soft", "sample", "dog", "coco",
                                "--gelu", "tanh"])
    assert rc == 0 and seen["gelu"] == "tanh"


def test_depth_main_threads_gelu_flag():
    """depth_main's --gelu lands on cfg.dpt_gelu (the depth-cache build and
    train-time DPT read it through make_depth_fn)."""
    import depth_main

    rest, flags, cfg = depth_main._parse_flags(
        ["soft", "cnn", "coco", "--gelu", "tanh"])
    assert rest == ["soft", "cnn", "coco"] and cfg.dpt_gelu == "tanh"


def _ensure_original_fixtures(coco_tree):
    """Idempotently build the 'original' dataset tree: annos reusing the
    synthetic coco images, ori vocab pickles, remCOCO anno + 500-index
    (reference: config.py:110-111)."""
    from depth_image_captioning_pub_tpu.data.vocab import (
        build_vocab, captions_from_coco_json, save_vocab)
    odir = coco_tree / "dataset" / "original_dataset"
    odir.mkdir(parents=True, exist_ok=True)
    # original train/val annos reuse the synthetic coco images
    shutil.copy(coco_tree / "dataset/coco2014/captions_train2014.json",
                odir / "original_dataset.json")
    shutil.copy(coco_tree / "dataset/coco2014/captions_val2014.json",
                odir / "original_val_dataset.json")
    # the reference's "original" annos point at images that live under the
    # train/val image roots; ours already do
    w2i, i2w = build_vocab(
        captions_from_coco_json(str(odir / "original_dataset.json")),
        captions_from_coco_json(str(odir / "original_val_dataset.json")),
        min_count=1)
    save_vocab(w2i, i2w, str(odir / "ori_word_to_id.pkl"),
               str(odir / "ori_id_to_word.pkl"))
    # rem_coco eval: remCOCO anno over val2014 images + 500-index file;
    # rem_original eval: its own anno, no index subset
    shutil.copy(coco_tree / "dataset/coco2014/captions_val2014.json",
                odir / "remCOCO_original_val_dataset.json")
    shutil.copy(coco_tree / "dataset/coco2014/captions_val2014.json",
                odir / "rem_original_val_dataset.json")
    np.save(coco_tree / "data_index" / "remCOCO_500_ori.npy",
            np.array([0, 2], dtype=np.int64))


def test_original_dataset_train_and_rem_coco_eval(coco_tree):
    """The 'original' dataset paths: train with use_data=original, then
    score with useData=rem_coco (ori vocab + remCOCO anno + 500-index
    subset; reference: base_evaluation.py:35-47, config.py:110-111)."""
    import base_main
    import base_evaluation
    _ensure_original_fixtures(coco_tree)

    # NOTE: the original-train image root is train2014 in ConfigTrain; our
    # original anno reuses those images, so this exercises the real path.
    assert base_main.main(["soft", "original", "--epochs", "1",
                           "--exp-time", "1"]) == 0
    d = coco_tree / "exp_result" / "base_soft_ori"
    assert (d / "base_soft_decoder_best_original0.pth.msgpack").exists()

    assert base_evaluation.main(["soft", "score", "rem_coco",
                                 "--num-sets", "1"]) == 0
    assert (d / "rem_coco_scores.pkl").exists()


def test_depth_original_train_and_rem_original_eval(coco_tree):
    """The depth x original combination (the last dataset x model pairing
    without CLI coverage): depth_main with use_data=original writes into
    the Cdep ori save dir, and depth_evaluation scores useData=
    rem_original (ori vocab, rem anno, NO index subset — reference:
    depth_evaluation.py:88-95, config.py:110-111)."""
    import depth_main
    import depth_evaluation
    _ensure_original_fixtures(coco_tree)

    assert depth_main.main(["soft", "cnn", "original", "--epochs", "1",
                            "--exp-time", "1", "--no-depth-cache"]) == 0
    d = coco_tree / "exp_result" / "CNN_depth_soft_ori"
    assert (d / "depth_soft_decoder_best_original0.pth.msgpack").exists()
    assert (d / "depth_soft_D_encoder_best_original0.pth.msgpack").exists()

    assert depth_evaluation.main(["soft", "score", "rem_original",
                                  "--num-sets", "1"]) == 0
    assert (d / "rem_original_scores.pkl").exists()


def test_base_main_profile_trace(coco_tree, tmp_path):
    """--profile writes a jax.profiler trace of the chosen step window —
    observability the reference never had (SURVEY.md §5). profile-stop
    beyond the run's step count must still close the trace (finally guard)."""
    import base_main

    trace = tmp_path / "trace"
    assert base_main.main(["soft", "coco", "--epochs", "1",
                           "--exp-time", "1",
                           "--profile", str(trace),
                           "--profile-start", "0",
                           "--profile-stop", "999"]) == 0
    produced = [f for f in trace.rglob("*") if f.is_file()]
    assert produced, "profiler trace directory is empty"


def test_base_main_feature_cache_e2e(coco_tree):
    """--feature-cache end-to-end: the cache files materialize under the
    save dir, training completes, and the cached CSV losses match an
    online run of the same config to FP tolerance (the feature-cache
    contract, tests/test_feature_cache.py)."""
    import base_main

    assert base_main.main(["soft", "coco", "--epochs", "1",
                           "--exp-time", "1"]) == 0
    d = coco_tree / "exp_result" / "base_soft"
    csv = d / "base_soft_train_loss_coco0.csv"
    online = float(csv.read_text().strip().splitlines()[-1].split(",")[1])

    assert base_main.main(["soft", "coco", "--epochs", "1",
                           "--exp-time", "1", "--feature-cache"]) == 0
    fdir = d / "feat_cache"
    bins = list(fdir.glob("feat_train_*.bin"))
    assert bins and list(fdir.glob("feat_val_*.bin"))
    assert (bins[0].parent / (bins[0].name + ".json")).exists()
    # the log appends across runs; the cached run's row is the last one
    cached = float(csv.read_text().strip().splitlines()[-1].split(",")[1])
    np.testing.assert_allclose(online, cached, rtol=1e-4)
