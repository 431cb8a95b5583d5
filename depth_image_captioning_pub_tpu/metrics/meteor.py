"""METEOR (pure-Python approximation).

The reference scores METEOR through pycocoevalcap's wrapper around the
METEOR 1.5 Java jar (reference: evaluate_metrix.py:29, spawning a JVM
subprocess). Offline and JVM-free, we implement the METEOR algorithm with
its published English parameters (alpha=0.9, beta=3.0, gamma=0.5) and two of
its four matcher modules — exact and Porter-stem. The WordNet synonym and
paraphrase-table modules need data files that are not in this environment;
scores are therefore a slight *underestimate* of Java METEOR (fewer matches
found). Documented deviation; scale and semantics otherwise match.

Alignment: matches are selected stage-by-stage (exact first, then stem),
each stage resolving ties by preferring the alignment that preserves word
order (fewest crossings), approximated greedily left-to-right. The fragment
penalty counts chunks of contiguous, monotonic aligned pairs, as in the
paper (Banerjee & Lavie 2005; Denkowski & Lavie 2014).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from depth_image_captioning_pub_tpu.metrics.porter import stem

_ALPHA = 0.9
_BETA = 3.0
_GAMMA = 0.5


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """Greedy staged alignment: exact matches, then stem matches."""
    pairs: List[Tuple[int, int]] = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    for key_fn in (lambda w: w, stem):
        ref_keys = [key_fn(w) for w in ref]
        for i, hw in enumerate(hyp):
            if used_h[i]:
                continue
            hk = key_fn(hw)
            # prefer the closest unused ref position to i (monotone-ish)
            best: Optional[int] = None
            for j, rk in enumerate(ref_keys):
                if used_r[j] or rk != hk:
                    continue
                if best is None or abs(j - i) < abs(best - i):
                    best = j
            if best is not None:
                used_h[i] = True
                used_r[best] = True
                pairs.append((i, best))
    pairs.sort()
    return pairs


def _chunks(pairs: List[Tuple[int, int]]) -> int:
    if not pairs:
        return 0
    chunks = 1
    for (h0, r0), (h1, r1) in zip(pairs, pairs[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def meteor_pair(hypothesis: str, reference: str) -> float:
    hyp, ref = hypothesis.split(), reference.split()
    if not hyp or not ref:
        return 0.0
    pairs = _align(hyp, ref)
    m = len(pairs)
    if m == 0:
        return 0.0
    p = m / len(hyp)
    r = m / len(ref)
    f_mean = p * r / (_ALPHA * p + (1 - _ALPHA) * r)
    frag = _chunks(pairs) / m
    penalty = _GAMMA * (frag ** _BETA)
    return f_mean * (1.0 - penalty)


def meteor_sentence(hypothesis: str, references: List[str]) -> float:
    """Best score over the reference set (METEOR's multi-ref rule)."""
    return max(meteor_pair(hypothesis, r) for r in references)


def score_meteor(gts: Dict[int, List[str]],
                 res: Dict[int, List[str]]) -> float:
    keys = sorted(gts.keys())
    vals = [meteor_sentence(res[k][0], gts[k]) for k in keys]
    return sum(vals) / len(vals) if vals else 0.0
