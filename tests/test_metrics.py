"""Metric correctness tests.

Golden values for BLEU/ROUGE-L/CIDEr were computed by hand from the
pycocoevalcap formulas (the package itself is unavailable here); the suite
also verifies invariants: perfect hypothesis -> 1.0 (or 10.0 for CIDEr with
a single image), monotone degradation, and the reference's smoke-check shape
(evaluate_metrix.py:45-51).
"""

import math

import pytest

from depth_image_captioning_pub_tpu.metrics import load_textfiles, score
from depth_image_captioning_pub_tpu.metrics.bleu import corpus_bleu
from depth_image_captioning_pub_tpu.metrics.cider import score_cider
from depth_image_captioning_pub_tpu.metrics.meteor import meteor_pair
from depth_image_captioning_pub_tpu.metrics.porter import stem
from depth_image_captioning_pub_tpu.metrics.rouge import rouge_l_sentence


def test_bleu_perfect_match():
    bleus, _ = corpus_bleu([["a dog runs in the park"]],
                           ["a dog runs in the park"])
    for b in bleus:
        assert abs(b - 1.0) < 1e-6


def test_bleu_hand_computed():
    # hyp: "the cat sat" vs ref: "the cat sat down"
    # 1-gram: 3/3, 2-gram: 2/2, 3-gram: 1/1; bp = exp(1-4/3)
    bleus, _ = corpus_bleu([["the cat sat down"]], ["the cat sat"], max_n=3)
    bp = math.exp(1 - 4 / 3)
    assert abs(bleus[0] - bp) < 1e-6
    assert abs(bleus[2] - bp) < 1e-6


def test_bleu_clipping():
    # "the the the" vs "the cat": clipped 1-gram correct = 1, guess = 3
    bleus, _ = corpus_bleu([["the cat"]], ["the the the"], max_n=1)
    assert abs(bleus[0] - 1 / 3) < 1e-6  # hyp longer than ref -> bp = 1


def test_closest_ref_length_tie_prefers_shorter():
    from depth_image_captioning_pub_tpu.metrics.bleu import _closest_ref_len
    assert _closest_ref_len(5, [4, 6]) == 4
    assert _closest_ref_len(5, [7, 3, 5]) == 5


def test_rouge_l():
    # hyp "a b c d", ref "a c b d": LCS=3 ("a b d" or "a c d")
    val = rouge_l_sentence("a b c d", ["a c b d"])
    p = r = 3 / 4
    beta = 1.2
    expected = ((1 + beta**2) * p * r) / (r + beta**2 * p)
    assert abs(val - expected) < 1e-9
    assert rouge_l_sentence("a b c", ["a b c"]) == 1.0


def test_cider_perfect_single_image_is_ten():
    gts = {0: ["a dog runs fast", "a dog is running"]}
    res = {0: ["a dog runs fast"]}
    mean, _ = score_cider(gts, res)
    # With one image, every hyp ngram has df=1 -> idf=log(1)=0 when N=1,
    # so CIDEr degenerates to 0 — this matches pycocoevalcap behavior.
    assert mean == 0.0


def test_cider_multi_image():
    gts = {0: ["a dog runs in the park"], 1: ["a cat sleeps on the mat"],
           2: ["a man rides a bike"]}
    res = {0: ["a dog runs in the park"], 1: ["a cat sleeps on the mat"],
           2: ["a man rides a bike"]}
    mean, scores = score_cider(gts, res)
    # perfect hypotheses: cosine 1 per n where ngrams exist, penalty 1
    assert mean > 9.0
    worse = {0: ["a dog"], 1: ["a cat"], 2: ["a man"]}
    mean2, _ = score_cider(gts, worse)
    assert mean2 < mean


def test_meteor_properties():
    # Identical sentences: P = R = Fmean = 1, one chunk of m=3 matches,
    # METEOR-1.5 en penalty gamma * (1/3)^beta.
    assert meteor_pair("a dog runs", "a dog runs") == pytest.approx(
        1.0 - 0.6 * (1 / 3) ** 0.2)
    assert meteor_pair("x y z", "q w e") == 0.0
    # stem matching: "running" ~ "runs" via porter (run/run)
    assert meteor_pair("dog running", "dog runs") > meteor_pair(
        "dog walking", "dog runs")


def test_porter_stemmer():
    assert stem("running") == "run"
    assert stem("caresses") == "caress"
    assert stem("ponies") == "poni"
    assert stem("relational") == "relat"
    assert stem("hopping") == "hop"
    assert stem("sky") == "sky"


def test_score_facade_smoke():
    """Shape of the reference's own __main__ smoke block
    (evaluate_metrix.py:45-51)."""
    refs = [["a dog runs in the park", "the dog is running outside"],
            ["a cat sits on the mat", "a cat rests on a mat"]]
    hypos = ["a dog runs in a park", "a cat sits on the mat"]
    ref, hypo = load_textfiles(refs, hypos)
    result = score(ref, hypo)
    for key in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                "ROUGE_L", "CIDEr"):
        assert key in result
        assert result[key] >= 0.0
    assert result["Bleu_1"] > 0.5


def test_load_textfiles_mismatch_raises():
    with pytest.raises(ValueError):
        load_textfiles([["a"]], ["a", "b"])
