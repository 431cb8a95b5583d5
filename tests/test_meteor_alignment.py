"""METEOR-1.5 alignment optimality tests (VERDICT r1 item 3).

The jar's aligner picks, among maximum-cardinality one-to-one alignments,
the one minimizing chunk count (then total distance). These adversarial
cases are chosen so a greedy closest-position aligner returns MORE chunks
than the optimum; the tests pin the optimal-chunk property.
"""

import time

import pytest

from depth_image_captioning_pub_tpu.metrics.meteor import (
    MeteorStats, align, meteor_pair, score_from_stats, score_meteor,
    segment_stats)


def chunks_of(pairs):
    if not pairs:
        return 0
    c = 1
    for (h0, r0, _), (h1, r1, _) in zip(pairs, pairs[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            c += 1
    return c


def test_duplicate_words_chunk_minimized():
    # hyp "a b a" vs ref "a a b": greedy closest-position picks
    # (0,0) (1,2) (2,1) -> 3 chunks; optimal picks (0,1) (1,2) (2,0)
    # -> the (0,1)(1,2) run is contiguous -> 2 chunks.
    pairs = align("a b a".split(), "a a b".split())
    assert len(pairs) == 3
    assert chunks_of(pairs) == 2


def test_crossing_block_chunk_minimized():
    # hyp "x a b" vs ref "a b x": max cardinality 3; keeping "a b"
    # contiguous yields 2 chunks; any aligner that breaks the block gets 3.
    pairs = align("x a b".split(), "a b x".split())
    assert len(pairs) == 3
    assert chunks_of(pairs) == 2


def test_max_cardinality_first():
    # Matching fewer words could give 1 chunk, but cardinality dominates.
    pairs = align("a b c d".split(), "c d a b".split())
    assert len(pairs) == 4
    assert chunks_of(pairs) == 2


def test_duplicates_prefer_monotone_distance():
    # Two interchangeable 'a's: distance tie-break selects the identity.
    pairs = align("a a".split(), "a a".split())
    assert pairs == [(0, 0, 0), (1, 1, 0)]
    assert chunks_of(pairs) == 1


def test_exact_preferred_over_stem_at_equal_distance():
    # hyp word at i=1 can match ref "run" (stem, j=0) or ref "runs"
    # (exact, j=2), both at distance 1 with one chunk either way; the
    # module-weight tie-break must pick the exact match.
    pairs = align("q runs".split(), "run x runs".split())
    assert len(pairs) == 1
    assert pairs[0] == (1, 2, 0)


def test_distance_breaks_ties_before_module_weight():
    # Closer stem match beats a farther exact match (jar ordering:
    # cardinality > chunks > distance > module weight).
    pairs = align("runs".split(), "run runs".split())
    assert pairs == [(0, 0, 1)]


def test_pathological_repeats_fast_and_aligned():
    # 25 identical tokens: 25! complete alignments exist; the greedy-first
    # ordering + dominance pruning must land the identity in milliseconds.
    words = ["a"] * 25
    t0 = time.time()
    pairs = align(words, words)
    assert time.time() - t0 < 2.0
    assert len(pairs) == 25
    assert chunks_of(pairs) == 1


def test_corpus_score_is_aggregate_not_mean():
    # jar semantics: the corpus score comes from summed stats, which is NOT
    # the mean of segment scores in general.
    gts = {0: ["a dog runs"], 1: ["the cat sat on the mat quietly"]}
    res = {0: ["a dog runs"], 1: ["elephants fly"]}
    st0 = segment_stats(res[0][0].split(), gts[0][0].split())
    st1 = segment_stats(res[1][0].split(), gts[1][0].split())
    total = MeteorStats()
    total.add(st0)
    total.add(st1)
    expected = score_from_stats(total)
    got = score_meteor(gts, res)
    assert got == pytest.approx(expected)
    mean = (score_from_stats(st0) + score_from_stats(st1)) / 2
    assert abs(got - mean) > 1e-6


def test_alignment_optimal_vs_brute_force():
    """Randomized cross-check: for tiny sentences, enumerate EVERY one-to-
    one alignment and verify the DFS result is optimal under the jar's
    objective (max matches, then min chunks, then min total distance)."""
    import itertools
    import random

    from depth_image_captioning_pub_tpu.metrics.meteor import _candidates

    def brute_best(hyp, ref):
        cands = _candidates(hyp, ref)
        best = None
        # choice per hyp word: one of its candidate ref slots, or skip
        options = [row + [None] for row in cands]
        for combo in itertools.product(*options):
            used = set()
            pairs = []
            ok = True
            for i, pick in enumerate(combo):
                if pick is None:
                    continue
                j, stage = pick
                if j in used:
                    ok = False
                    break
                used.add(j)
                pairs.append((i, j, stage))
            if not ok:
                continue
            key = (-len(pairs), chunks_of(pairs),
                   sum(abs(h - r) for h, r, _ in pairs))
            if best is None or key < best:
                best = key
        return best

    words = ["a", "b", "c", "a", "b"]
    rnd = random.Random(0)
    for _ in range(40):
        hyp = [rnd.choice(words) for _ in range(rnd.randint(1, 5))]
        ref = [rnd.choice(words) for _ in range(rnd.randint(1, 5))]
        got = align(hyp, ref)
        got_key = (-len(got), chunks_of(got),
                   sum(abs(h - r) for h, r, _ in got))
        expected = brute_best(hyp, ref)
        if expected is None:
            assert got == []
        else:
            # DFS must match brute force on (matches, chunks, distance)
            assert got_key == expected, (hyp, ref, got_key, expected)


def test_meteor_score_drops_with_fragmentation():
    # Same matched words, more fragmentation -> lower score.
    contiguous = meteor_pair("a dog runs fast", "a dog runs fast")
    fragmented = meteor_pair("dog a fast runs", "a dog runs fast")
    assert fragmented < contiguous


def test_node_budget_exhaustion_falls_back_to_greedy(monkeypatch):
    """With the search budget forced to ~zero, align() must still return a
    VALID one-to-one alignment (the greedy seed), never crash or return
    None — the production guarantee for pathological inputs."""
    import depth_image_captioning_pub_tpu.metrics.meteor as m

    monkeypatch.setattr(m, "_NODE_BUDGET", 1)
    hyp = ["a", "b", "a", "b", "a"]
    ref = ["b", "a", "b", "a", "b"]
    pairs = m.align(hyp, ref)
    assert pairs, "fallback must produce a non-empty alignment"
    hs = [h for h, _, _ in pairs]
    rs = [r for _, r, _ in pairs]
    assert len(set(hs)) == len(hs) and len(set(rs)) == len(rs)  # one-to-one
    for h, r, stage in pairs:
        assert hyp[h] == ref[r] and stage == 0  # every pair a real match
    # scoring still works through the public API
    assert 0.0 < m.meteor_pair(" ".join(hyp), " ".join(ref)) <= 1.0


def test_phrase_alignment_optimal_vs_brute_force():
    """Randomized cross-check of the PHRASE-BLOCK aligner: with a small
    multi-word paraphrase table installed, enumerate EVERY valid set of
    non-overlapping matches (word-level + phrase spans) and verify
    align_phrases is optimal under the jar objective (max total covered
    words, then min chunks, then min total start distance)."""
    import itertools
    import random

    import depth_image_captioning_pub_tpu.metrics.meteor as m

    m.set_meteor_data(m.MeteorData(paraphrases=frozenset({
        frozenset(("b c", "x")), frozenset(("a", "y z")),
        frozenset(("c", "w")),
    })))
    try:
        def all_matches(hyp, ref):
            cands = m._phrase_candidates(hyp, ref)
            return [(i, hl, rj, rl, s)
                    for i, row in enumerate(cands)
                    for (hl, rj, rl, s) in row]

        def chunks_of(sel):
            sel = sorted(sel)
            if not sel:
                return 0
            c = 1
            for (h0, hl0, r0, rl0, _), (h1, _, r1, _, _) in zip(sel, sel[1:]):
                if not (h1 == h0 + hl0 and r1 == r0 + rl0):
                    c += 1
            return c

        def key_of(sel):
            cov = sum(hl + rl for _, hl, _, rl, _ in sel)
            dist = sum(abs(i - rj) for i, _, rj, _, _ in sel)
            return (-cov, chunks_of(sel), dist)

        def valid(sel, n_h, n_r):
            used_h, used_r = set(), set()
            for i, hl, rj, rl, _ in sel:
                hs, rs = set(range(i, i + hl)), set(range(rj, rj + rl))
                if used_h & hs or used_r & rs:
                    return False
                used_h |= hs
                used_r |= rs
            return True

        def brute_best(hyp, ref):
            ms = all_matches(hyp, ref)
            best = None
            for r in range(len(ms) + 1):
                for combo in itertools.combinations(ms, r):
                    if not valid(combo, len(hyp), len(ref)):
                        continue
                    k = key_of(list(combo))
                    if best is None or k < best:
                        best = k
            return best

        words = ["a", "b", "c", "w", "x", "y", "z"]
        rnd = random.Random(1)
        for _ in range(30):
            hyp = [rnd.choice(words) for _ in range(rnd.randint(1, 4))]
            ref = [rnd.choice(words) for _ in range(rnd.randint(1, 4))]
            got = m.align_phrases(hyp, ref)
            got_key = key_of(got)
            expected = brute_best(hyp, ref)
            if expected is None or expected == (0, 0, 0):
                assert got == [] or got_key == expected, (hyp, ref)
            else:
                assert got_key == expected, (hyp, ref, got_key, expected)
    finally:
        m.set_meteor_data(None)


def test_phrase_greedy_seed_under_budget_exhaustion(monkeypatch):
    """Budget forced to ~zero with phrase candidates present: align_phrases
    must still return a VALID non-overlapping alignment (the phrase-aware
    greedy seed), never crash."""
    import depth_image_captioning_pub_tpu.metrics.meteor as m

    m.set_meteor_data(m.MeteorData(paraphrases=frozenset({
        frozenset(("b c", "x"))})))
    monkeypatch.setattr(m, "_NODE_BUDGET", 1)
    try:
        pairs = m.align_phrases("a b c a b c".split(), "a x a x".split())
        assert pairs
        used_h, used_r = set(), set()
        for i, hl, rj, rl, _ in pairs:
            hs, rs = set(range(i, i + hl)), set(range(rj, rj + rl))
            assert not (used_h & hs) and not (used_r & rs)
            used_h |= hs
            used_r |= rs
    finally:
        m.set_meteor_data(None)
