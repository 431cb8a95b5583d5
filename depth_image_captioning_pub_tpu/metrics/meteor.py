"""METEOR 1.5 (pure-Python, offline).

The reference scores METEOR through pycocoevalcap's wrapper around the
METEOR 1.5 Java jar (reference: evaluate_metrix.py:29, spawning
``java -jar meteor-1.5.jar - - -stdio -l en -norm``). Offline and JVM-free,
this module implements the METEOR 1.5 algorithm (Denkowski & Lavie 2014)
with its published English parameters:

    alpha=0.85, beta=0.2, gamma=0.6, delta=0.75
    module weights: exact=1.0, stem=0.6 (syn=0.8, par=0.6 unavailable)

and two of its four matcher modules — exact and Porter-stem. Remaining
deviations from the jar, documented:

* The WordNet synonym and paraphrase-table modules need data files that are
  not in this environment; with fewer matches found, scores are a slight
  *underestimate* of Java METEOR.
* METEOR's English function-word list is derived from corpus frequencies
  (relative frequency > 1e-3); ``_FUNCTION_WORDS`` below is a curated
  high-frequency English function-word list standing in for it.

Alignment is the jar's objective, solved exactly: among one-to-one word
alignments of **maximum cardinality**, pick the one with the **fewest
chunks**, breaking remaining ties by the **smallest total |i-j| distance**
(monotonicity), then by the largest total module weight. The search is a
depth-first branch-and-bound over hypothesis positions with greedy-first
ordering and a node budget; within the budget (always, at caption lengths
<=30 with realistic vocabularies) the result is optimal, and on budget
exhaustion the best alignment found so far is returned (never worse than
the greedy one, which is explored first).

Corpus scoring follows the jar: per segment the best-scoring reference's
match statistics are accumulated, and the final score is computed once from
the aggregated totals (NOT the mean of segment scores).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

from depth_image_captioning_pub_tpu.metrics.porter import stem

# METEOR 1.5 English task parameters (Denkowski & Lavie 2014, table of
# language defaults; the pycocoevalcap jar runs `-l en` with these).
ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
DELTA = 0.75
STAGE_WEIGHTS = (1.0, 0.6)  # exact, stem

# Stand-in for METEOR's corpus-frequency English function-word list
# (see module docstring). Words here get weight (1-delta), content words
# get delta, on each side of the alignment.
_FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no all both either
neither i you he she it we they me him her us them my your his its our
their mine yours hers ours theirs myself yourself himself herself itself
ourselves yourselves themselves who whom whose which what when where why
how there here
am is are was were be been being do does did doing have has had having
will would shall should can could may might must ought need dare
and or but nor so yet if then else because although though while whereas
unless until since as than whether once
of in on at by for with about against between into through during before
after above below to from up down out off over under again further near
across behind beside besides beyond except inside outside toward towards
upon within without along amid among around atop underneath via per
not only just also too very s t don now d ll m o re ve y ain aren couldn
didn doesn hadn hasn haven isn ma mightn mustn needn shan shouldn wasn
weren won wouldn
. , ; : ! ? ' " ` -
""".split())

_NODE_BUDGET = 200_000


def _is_function(word: str) -> bool:
    return word in _FUNCTION_WORDS


def _candidates(hyp: Sequence[str], ref: Sequence[str]
                ) -> List[List[Tuple[int, int]]]:
    """Per hyp position: [(ref position, stage)] — stage 0 exact, 1 stem.

    A pair matchable by both modules is exact only (the jar assigns each
    match to the earliest module that finds it).
    """
    ref_stems = [stem(w) for w in ref]
    out: List[List[Tuple[int, int]]] = []
    for i, hw in enumerate(hyp):
        hs = stem(hw)
        row = []
        for j, rw in enumerate(ref):
            if hw == rw:
                row.append((j, 0))
            elif hs == ref_stems[j]:
                row.append((j, 1))
        # Greedy-first ordering: closest ref position first so the first
        # DFS leaf reproduces (at least) the monotone greedy alignment.
        row.sort(key=lambda jt: (abs(jt[0] - i), jt[0]))
        out.append(row)
    return out


def _max_cardinality(cands: List[List[Tuple[int, int]]], n_ref: int) -> int:
    """Max bipartite matching size (augmenting paths; graphs are tiny)."""
    match_r: List[int] = [-1] * n_ref

    def try_kuhn(i: int, seen: List[bool]) -> bool:
        for j, _ in cands[i]:
            if not seen[j]:
                seen[j] = True
                if match_r[j] < 0 or try_kuhn(match_r[j], seen):
                    match_r[j] = i
                    return True
        return False

    size = 0
    for i in range(len(cands)):
        if cands[i] and try_kuhn(i, [False] * n_ref):
            size += 1
    return size


def align(hyp: Sequence[str], ref: Sequence[str]
          ) -> List[Tuple[int, int, int]]:
    """Optimal METEOR alignment: list of (hyp_idx, ref_idx, stage).

    Maximum cardinality, then fewest chunks, then least total distance,
    then largest total module weight (exact preferred over stem).
    """
    cands = _candidates(hyp, ref)
    target = _max_cardinality(cands, len(ref))
    if target == 0:
        return []

    # hyp positions that have any candidate, in order.
    live = [i for i in range(len(hyp)) if cands[i]]

    def greedy_seed() -> List[Tuple[int, int, int]]:
        """Closest-position greedy alignment: guarantees a non-None result
        even if the node budget exhausts before the DFS reaches its first
        max-cardinality leaf (pathological repeated-word inputs)."""
        used = [False] * len(ref)
        pairs = []
        for i in live:
            for j, stage in cands[i]:
                if not used[j]:
                    used[j] = True
                    pairs.append((i, j, stage))
                    break
        return pairs
    # suffix_live[k] = how many live positions remain at/after live[k]
    # (upper bound on additional matches — used for cardinality pruning).
    seed = greedy_seed()
    best: List[Optional[List[Tuple[int, int, int]]]] = [seed]
    best_key = [(float("inf"), float("inf"), float("-inf"))]
    # The seed's key only becomes the pruning bar if it is max-cardinality
    # (otherwise its (chunks, dist) would wrongly prune better alignments).
    used_r = [False] * len(ref)
    nodes = [0]

    def leaf_key(pairs: List[Tuple[int, int, int]]
                 ) -> Tuple[float, float, float]:
        chunks = 1
        for (h0, r0, _), (h1, r1, _) in zip(pairs, pairs[1:]):
            if not (h1 == h0 + 1 and r1 == r0 + 1):
                chunks += 1
        dist = sum(abs(h - r) for h, r, _ in pairs)
        weight = sum(STAGE_WEIGHTS[s] for _, _, s in pairs)
        return (chunks, dist, -weight)

    def dfs(k: int, matched: int, pairs: List[Tuple[int, int, int]],
            chunks: int, dist: int) -> None:
        if nodes[0] > _NODE_BUDGET:
            return
        nodes[0] += 1
        # Dominance prune: chunks and distance only grow as pairs append.
        bk = best_key[0]
        if chunks > bk[0] or (chunks == bk[0] and dist > bk[1]):
            return
        if matched + (len(live) - k) < target:
            return  # cannot reach max cardinality anymore
        if k == len(live):
            if matched == target:
                key = leaf_key(pairs)
                if key < best_key[0]:
                    best_key[0] = key
                    best[0] = list(pairs)
            return
        i = live[k]
        for j, stage in cands[i]:
            if used_r[j]:
                continue
            if pairs:
                h0, r0, _ = pairs[-1]
                nchunks = chunks + (0 if (i == h0 + 1 and j == r0 + 1)
                                    else 1)
            else:
                nchunks = 1
            used_r[j] = True
            pairs.append((i, j, stage))
            dfs(k + 1, matched + 1, pairs, nchunks, dist + abs(i - j))
            pairs.pop()
            used_r[j] = False
        # Skipping i is only useful when it still permits max cardinality.
        dfs(k + 1, matched, pairs, chunks, dist)

    dfs(0, 0, [], 0, 0)
    assert best[0] is not None  # target >= 1 guarantees some leaf
    return best[0]


@dataclasses.dataclass
class MeteorStats:
    """Per-segment match statistics, summable for corpus scoring."""
    h_len_c: int = 0
    h_len_f: int = 0
    r_len_c: int = 0
    r_len_f: int = 0
    h_match_c: float = 0.0   # module-weighted matched content words (hyp)
    h_match_f: float = 0.0
    r_match_c: float = 0.0
    r_match_f: float = 0.0
    matches: int = 0         # alignment cardinality
    chunks: int = 0

    def add(self, o: "MeteorStats") -> None:
        for f in dataclasses.fields(self):
            setattr(self, f.name, getattr(self, f.name) + getattr(o, f.name))


def _chunk_count(pairs: List[Tuple[int, int, int]]) -> int:
    if not pairs:
        return 0
    chunks = 1
    for (h0, r0, _), (h1, r1, _) in zip(pairs, pairs[1:]):
        if not (h1 == h0 + 1 and r1 == r0 + 1):
            chunks += 1
    return chunks


def segment_stats(hyp: Sequence[str], ref: Sequence[str]) -> MeteorStats:
    st = MeteorStats()
    for w in hyp:
        if _is_function(w):
            st.h_len_f += 1
        else:
            st.h_len_c += 1
    for w in ref:
        if _is_function(w):
            st.r_len_f += 1
        else:
            st.r_len_c += 1
    pairs = align(hyp, ref)
    st.matches = len(pairs)
    st.chunks = _chunk_count(pairs)
    for i, j, stage in pairs:
        w = STAGE_WEIGHTS[stage]
        if _is_function(hyp[i]):
            st.h_match_f += w
        else:
            st.h_match_c += w
        if _is_function(ref[j]):
            st.r_match_f += w
        else:
            st.r_match_c += w
    return st


def score_from_stats(st: MeteorStats) -> float:
    p_den = DELTA * st.h_len_c + (1 - DELTA) * st.h_len_f
    r_den = DELTA * st.r_len_c + (1 - DELTA) * st.r_len_f
    if st.matches == 0 or p_den == 0 or r_den == 0:
        return 0.0
    p = (DELTA * st.h_match_c + (1 - DELTA) * st.h_match_f) / p_den
    r = (DELTA * st.r_match_c + (1 - DELTA) * st.r_match_f) / r_den
    if p == 0.0 or r == 0.0:
        return 0.0
    f_mean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    frag = st.chunks / st.matches
    return f_mean * (1.0 - GAMMA * frag ** BETA)


def meteor_pair(hypothesis: str, reference: str) -> float:
    """Segment-level METEOR of one hypothesis vs one reference."""
    hyp, ref = hypothesis.split(), reference.split()
    if not hyp or not ref:
        return 0.0
    return score_from_stats(segment_stats(hyp, ref))


def meteor_sentence(hypothesis: str, references: List[str]) -> float:
    """Best segment score over the reference set (METEOR's multi-ref rule)."""
    return max(meteor_pair(hypothesis, r) for r in references)


def score_meteor(gts: Dict[int, List[str]],
                 res: Dict[int, List[str]]) -> float:
    """Corpus METEOR, jar semantics: per segment keep the best-scoring
    reference's stats, sum stats over segments, score the totals once."""
    total = MeteorStats()
    any_seg = False
    for k in sorted(gts.keys()):
        hyp = res[k][0].split()
        best_st: Optional[MeteorStats] = None
        best_score = -1.0
        for r in gts[k]:
            ref = r.split()
            if not hyp or not ref:
                st = MeteorStats(
                    h_len_c=sum(not _is_function(w) for w in hyp),
                    h_len_f=sum(_is_function(w) for w in hyp),
                    r_len_c=sum(not _is_function(w) for w in ref),
                    r_len_f=sum(_is_function(w) for w in ref))
            else:
                st = segment_stats(hyp, ref)
            s = score_from_stats(st)
            if s > best_score:
                best_score, best_st = s, st
        if best_st is not None:
            total.add(best_st)
            any_seg = True
    if not any_seg:
        return 0.0
    return score_from_stats(total)
