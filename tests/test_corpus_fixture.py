"""Scale-up metric cross-validation (VERDICT r2 item 5).

The pycocoevalcap fixtures (tests/test_pycoco_fixtures.py) pin 1-2-image
cases; a corpus-accumulation bug (df counting, reflen accumulation,
aggregated METEOR stats) would only manifest at scale. This fixture freezes
a deterministic 32-image x 5-reference synthetic corpus and pins the
production scorers to literals computed by tests/naive_scorer.py — an
independently-written restatement of the published algorithms that shares
no code with metrics/ (except the Porter stemmer, a standard algorithm
pinned by its own fixtures).

Reference behavior being pinned: the corpus-accumulating score() path,
/root/reference/Captioning_models/evaluate_metrix.py:21-42.
"""

import pytest

from naive_scorer import (make_corpus, naive_bleu, naive_cider,
                          naive_meteor, naive_rouge)
from depth_image_captioning_pub_tpu.metrics.scorer import score

# Committed literals: produced once by the naive scorer on the frozen
# corpus (seed 1234, 32 images, 5 refs). Any change to either scorer that
# alters corpus accumulation breaks one side of the three-way equality.
EXPECTED = {
    "Bleu_1": 0.7542898928382923,
    "Bleu_2": 0.6992490064725427,
    "Bleu_3": 0.6202029392326758,
    "Bleu_4": 0.5403051513868038,
    "METEOR": 0.39373434947243474,
    "ROUGE_L": 0.781542472473179,
    "CIDEr": 3.3415528169233304,
}


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n_images=32, n_refs=5, seed=1234)


def test_corpus_is_frozen(corpus):
    """Regeneration determinism: the fixture must reproduce byte-identical
    text across runs/platforms (pure numpy RandomState)."""
    gts, res = corpus
    assert len(gts) == 32 and all(len(v) == 5 for v in gts.values())
    assert res[0] == ["a white house eats in the yard with a boat"]
    assert gts[0][0] == "a white woman eats in the kitchen with a boat"


def test_production_scorers_match_literals(corpus):
    gts, res = corpus
    got = score(gts, res)
    for key, want in EXPECTED.items():
        assert got[key] == pytest.approx(want, abs=1e-12), key


def test_naive_scorer_matches_literals(corpus):
    """The independent implementation reproduces the same literals — the
    other leg of the three-way equality (catches silent co-drift)."""
    gts, res = corpus
    nb = naive_bleu(gts, res)
    for i in range(4):
        assert nb[i] == pytest.approx(EXPECTED[f"Bleu_{i+1}"], abs=1e-12)
    assert naive_rouge(gts, res) == pytest.approx(EXPECTED["ROUGE_L"],
                                                  abs=1e-12)
    assert naive_cider(gts, res) == pytest.approx(EXPECTED["CIDEr"],
                                                  abs=1e-12)
    assert naive_meteor(gts, res) == pytest.approx(EXPECTED["METEOR"],
                                                   abs=1e-12)


def test_accumulation_is_not_mean_of_segments(corpus):
    """Guards the jar/pycocoevalcap corpus semantics explicitly: corpus
    BLEU-4 and METEOR come from aggregated totals, which differ from the
    mean of per-segment scores on this corpus."""
    gts, res = corpus
    from depth_image_captioning_pub_tpu.metrics.bleu import corpus_bleu
    from depth_image_captioning_pub_tpu.metrics.meteor import meteor_sentence

    keys = sorted(gts)
    seg_bleu4 = []
    for k in keys:
        b, _ = corpus_bleu([gts[k]], [res[k][0]])
        seg_bleu4.append(b[3])
    mean_seg = sum(seg_bleu4) / len(seg_bleu4)
    assert abs(mean_seg - EXPECTED["Bleu_4"]) > 1e-6

    seg_meteor = [meteor_sentence(res[k][0], gts[k]) for k in keys]
    mean_meteor = sum(seg_meteor) / len(seg_meteor)
    assert abs(mean_meteor - EXPECTED["METEOR"]) > 1e-6
