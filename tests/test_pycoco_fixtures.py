"""Frozen pycocoevalcap fixtures (VERDICT r1 item 6).

Each case pins (refs, hypos) -> {Bleu_1..4, ROUGE_L, CIDEr} values derived
by hand-tracing the pycocoevalcap sources (bleu/bleu_scorer.py,
rouge/rouge.py, cider/cider_scorer.py — the package itself is not
installable offline). The arithmetic for every expected literal is written
out in the comments so it can be re-audited without the package. This
enforces the "pycocoevalcap semantics" claims in metrics/bleu.py:1-8,
metrics/cider.py and metrics/rouge.py rather than merely asserting them.

pycocoevalcap semantics being pinned:
* BLEU: corpus-accumulated clipped n-gram counts; effective reference
  length per sentence by the 'closest' rule (ties -> shorter ref); corpus
  brevity penalty exp(1 - reflen/testlen) when testlen < reflen; division
  fudge constants tiny=1e-15 (numerator) / small=1e-9 (denominator).
* ROUGE_L: per-image max over references of the LCS F-measure with
  beta=1.2, mean over images.
* CIDEr: tf-idf n-gram vectors n=1..4 with weight tf*(log N - log max(1,
  df)), df counted over the evaluation references themselves; clipped
  cosine per n; Gaussian length penalty exp(-(lh-lr)^2/(2*6^2)); average
  over n and references, x10, mean over images.
"""

import math

import pytest

from depth_image_captioning_pub_tpu.metrics.bleu import score_bleu
from depth_image_captioning_pub_tpu.metrics.cider import score_cider
from depth_image_captioning_pub_tpu.metrics.rouge import score_rouge


def test_fixture_multi_image_multi_ref_bleu_rouge():
    gts = {
        0: ["the cat sat on the mat", "a cat is sitting on the mat"],
        1: ["a dog runs in the park", "the dog is running outside"],
    }
    res = {0: ["the cat sat on the mat"], 1: ["a dog runs in the grass"]}
    # Hand trace: image 0 is a verbatim ref (6 tokens, closest reflen 6),
    # clipped correct/guess: 6/6, 5/5, 4/4, 3/3. Image 1 (6 tokens,
    # closest reflen 6): "grass" unmatched -> 5/6, 4/5, 3/4, 2/5-grams?
    # no: 4-grams are "a dog runs in","dog runs in the","runs in the
    # grass" -> 2/3. Corpus totals: 11/12, 9/10, 7/8, 5/6; testlen =
    # reflen = 12 -> brevity penalty 1 (up to the 1e-9 fudge).
    bleu = score_bleu(gts, res)
    assert bleu["Bleu_1"] == pytest.approx(11 / 12, rel=1e-6)
    assert bleu["Bleu_2"] == pytest.approx(math.sqrt(11 / 12 * 9 / 10),
                                           rel=1e-6)
    assert bleu["Bleu_3"] == pytest.approx(
        (11 / 12 * 9 / 10 * 7 / 8) ** (1 / 3), rel=1e-6)
    assert bleu["Bleu_4"] == pytest.approx(
        (11 / 12 * 9 / 10 * 7 / 8 * 5 / 6) ** (1 / 4), rel=1e-6)
    # Literals of the above (audit trail):
    assert bleu["Bleu_1"] == pytest.approx(0.9166667, abs=1e-6)
    assert bleu["Bleu_2"] == pytest.approx(0.9082951, abs=1e-6)
    assert bleu["Bleu_3"] == pytest.approx(0.8970583, abs=1e-6)
    assert bleu["Bleu_4"] == pytest.approx(0.8806842, abs=1e-6)
    # ROUGE_L: image 0 -> 1.0 (identity); image 1 vs ref1: LCS "a dog
    # runs in the" = 5, p = r = 5/6, beta=1.2 F = 5/6 (p == r); vs ref2:
    # LCS "dog" = 1, F = 2.44*(1/6)*(1/5)/((1/5)+1.44*(1/6)) = 0.1848 ->
    # max 5/6. Mean = (1 + 5/6)/2 = 11/12.
    assert score_rouge(gts, res) == pytest.approx(11 / 12, rel=1e-6)


def test_fixture_brevity_penalty():
    gts = {0: ["the quick brown fox jumps over the lazy dog"]}
    res = {0: ["the quick brown fox"]}
    # All clipped precisions are 1 (4/4, 3/3, 2/2, 1/1); testlen 4,
    # reflen 9 -> BP = exp(1 - 9/4) = exp(-1.25) for every Bleu_n.
    bleu = score_bleu(gts, res)
    for n in range(1, 5):
        assert bleu[f"Bleu_{n}"] == pytest.approx(math.exp(-1.25), rel=1e-6)
    assert bleu["Bleu_4"] == pytest.approx(0.2865048, abs=1e-6)


def test_fixture_closest_tie_prefers_shorter_ref():
    # testlen 5; ref lengths 4 and 6 are equidistant -> 'closest' picks
    # the SHORTER (bleu_scorer.py: min over (abs(l-testlen), l) tuples),
    # so reflen 4 < testlen -> BP = 1 and every precision is 1 -> 1.0.
    # An implementation picking reflen 6 would emit exp(1-6/5) = 0.8187.
    gts = {0: ["a b c d", "a b c d e f"]}
    res = {0: ["a b c d e"]}
    bleu = score_bleu(gts, res)
    assert bleu["Bleu_1"] == pytest.approx(1.0, rel=1e-6)
    assert bleu["Bleu_4"] == pytest.approx(1.0, rel=1e-6)


def test_fixture_zero_ngram_smoothing_constants():
    # 4-gram correct count is 0: pycocoevalcap still emits a tiny positive
    # Bleu_4 via (0 + 1e-15)/(1 + 1e-9). Corpus counts: 4/4, 2/3, 1/2,
    # 0/1 -> Bleu_4 = (1 * 2/3 * 1/2 * 1e-15)^(1/4) ~ 1.3512e-4.
    gts = {0: ["the quick brown fox", "the quick brown fox jumps over the lazy dog"]}
    res = {0: ["the quick brown dog"]}
    bleu = score_bleu(gts, res)
    assert bleu["Bleu_3"] == pytest.approx((2 / 3 * 1 / 2) ** (1 / 3),
                                           rel=1e-6)
    assert bleu["Bleu_4"] == pytest.approx(1.3512e-4, rel=1e-3)


def test_fixture_cider_tfidf_and_clipping():
    # Two single-ref images; every n-gram in the refs has df=1 -> weight
    # tf*(log 2 - log 1) = log 2 on both sides; unseen hyp n-grams ("x",
    # "y", ...) get df clipped to 1 -> weight log 2 too (they inflate the
    # hyp norm; cider_scorer.py counts2vec).
    # Image 0 (identity): cosine 1 for n=1..4, penalty 1 -> 10.0.
    # Image 1 "e f x y" vs "e f g h":
    #   n=1: num = 2w^2, norms 2w & 2w -> 0.5
    #   n=2: shared "e f" -> w^2/(sqrt3 w * sqrt3 w) = 1/3
    #   n=3, n=4: no overlap -> 0.      score = 10*mean(0.5,1/3,0,0)
    # CIDEr = (10 + 10*(0.5+1/3)/4)/2 = (10 + 2.0833333)/2 = 6.0416667.
    gts = {0: ["a b c d"], 1: ["e f g h"]}
    res = {0: ["a b c d"], 1: ["e f x y"]}
    mean, scores = score_cider(gts, res)
    assert scores[0] == pytest.approx(10.0, rel=1e-6)
    assert scores[1] == pytest.approx(10 * (0.5 + 1 / 3) / 4, rel=1e-6)
    assert mean == pytest.approx(6.0416667, abs=1e-6)


def test_fixture_cider_length_penalty():
    # Image 0: hyp "a b c d" vs ref "a b c d e f" — length delta 2 ->
    # Gaussian penalty exp(-4/72). Image 1 is an identity pair on disjoint
    # tokens (CIDEr needs N >= 2: with one image log N = 0 zeroes every
    # tf-idf weight). All df=1 -> every weight is log 2 on both sides.
    # Image 0 cosines:
    #   n=1: shared a,b,c,d -> 4w^2/(2w * sqrt6 w) = 4/(2*sqrt6)
    #   n=2: shared "a b","b c","c d" -> 3/(sqrt3*sqrt5)
    #   n=3: shared 2, norms sqrt2/sqrt4 -> 2/sqrt8
    #   n=4: shared 1, norms 1/sqrt3 -> 1/sqrt3
    # score_0 = 10 * exp(-4/72) * mean(cosines); image 1 -> 10.0.
    gts = {0: ["a b c d e f"], 1: ["p q r s"]}
    res = {0: ["a b c d"], 1: ["p q r s"]}
    mean, scores = score_cider(gts, res)
    expected0 = 10 * math.exp(-4 / 72) * (
        4 / (2 * math.sqrt(6)) + 3 / math.sqrt(15)
        + 2 / math.sqrt(8) + 1 / math.sqrt(3)) / 4
    assert scores[0] == pytest.approx(expected0, rel=1e-6)
    assert scores[1] == pytest.approx(10.0, rel=1e-6)
    assert mean == pytest.approx((expected0 + 10.0) / 2, rel=1e-6)
