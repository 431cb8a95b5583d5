"""METEOR 1.5 (pure-Python, offline).

The reference scores METEOR through pycocoevalcap's wrapper around the
METEOR 1.5 Java jar (reference: evaluate_metrix.py:29, spawning
``java -jar meteor-1.5.jar - - -stdio -l en -norm``). Offline and JVM-free,
this module implements the METEOR 1.5 algorithm (Denkowski & Lavie 2014)
with its published English parameters:

    alpha=0.85, beta=0.2, gamma=0.6, delta=0.75
    module weights: exact=1.0, stem=0.6 (syn=0.8, par=0.6 unavailable)

and all four matcher modules — exact and Porter-stem always, WordNet-synonym
and paraphrase when their data files are supplied (the data itself is not
redistributable in this environment, so the offline default runs
exact+stem only). External data hooks, each a path in an environment
variable (or set programmatically via :func:`set_meteor_data`):

* ``METEOR_FUNCTION_WORDS`` — one word per line (#-comments allowed); the
  jar's ``function.words.english`` resource is exactly this format.
* ``METEOR_SYNONYMS`` — one synset per line, whitespace-separated members
  (exportable from WordNet in two lines of nltk); two words match on the
  synonym stage iff they share a synset, the jar's rule.
* ``METEOR_PARAPHRASES`` — lines ``phrase1 ||| phrase2`` (an optional third
  ``||| prob`` field is ignored), ``.gz`` transparent — the layout of the
  jar's ``paraphrase-en.gz``. Only single-word<->single-word entries are
  usable by the one-to-one word aligner below; multi-word phrase entries
  are skipped (a residual, documented underestimate vs the jar, which
  aligns phrase blocks).

``tools/export_meteor_data.py`` builds all three files: WordNet synsets via
nltk (``python -m nltk.downloader wordnet`` once, on a connected machine),
a single-word filter for the jar's paraphrase table, and a function-word
normalizer. File-to-score coverage: tests/test_meteor_fixture.py pins a
worked example through the env hooks against the hand-evaluated METEOR 1.5
formula chain.

Remaining deviations from the jar when no data files are given:

* Fewer matcher stages find fewer matches, so scores are a slight
  *underestimate* of Java METEOR.
* METEOR's English function-word list is derived from corpus frequencies
  (relative frequency > 1e-3); ``_FUNCTION_WORDS`` below is a curated
  high-frequency English function-word list standing in for it (the rule
  is published but the corpus is not, so the exact list cannot be
  reconstructed offline — supply the jar's own list via
  ``METEOR_FUNCTION_WORDS`` for exactness).

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
# Module weights for the full en pipeline: exact, stem, synonym, paraphrase
# (Denkowski & Lavie 2014). Stages 2/3 only produce candidates when their
# data files are loaded (see module docstring), so the offline default
# behaves exactly like the previous exact+stem implementation.
STAGE_WEIGHTS = (1.0, 0.6, 0.8, 0.6)

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


@dataclasses.dataclass(frozen=True)
class MeteorData:
    """External METEOR-1.5 data (module docstring documents the formats).

    ``synsets`` maps word -> frozenset of synset ids; ``paraphrases`` holds
    unordered single-word pairs as frozensets (the jar's table lists both
    directions; storing unordered pairs makes lookup direction-free).
    """
    function_words: frozenset = frozenset()
    synsets: Optional[Dict[str, frozenset]] = None
    paraphrases: Optional[frozenset] = None


def _read_lines(path: str) -> List[str]:
    import gzip
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        return [ln.strip() for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")]


def load_function_words(path: str) -> frozenset:
    return frozenset(w for ln in _read_lines(path) for w in ln.split())


def load_synsets(path: str) -> Dict[str, frozenset]:
    by_word: Dict[str, set] = {}
    for sid, ln in enumerate(_read_lines(path)):
        for w in ln.split():
            by_word.setdefault(w.lower(), set()).add(sid)
    return {w: frozenset(s) for w, s in by_word.items()}


def load_paraphrases(path: str) -> frozenset:
    pairs = set()
    skipped = 0
    for ln in _read_lines(path):
        fields = [f.strip() for f in ln.split("|||")]
        if len(fields) < 2:
            continue
        a, b = fields[0], fields[1]
        if len(a.split()) == 1 and len(b.split()) == 1 and a != b:
            pairs.add(frozenset((a.lower(), b.lower())))
        else:
            skipped += 1
    if skipped:
        import sys
        print(f"meteor: skipped {skipped} multi-word paraphrase entries "
              f"(one-to-one word aligner; see metrics/meteor.py docstring)",
              file=sys.stderr)
    return frozenset(pairs)


_data: Optional[MeteorData] = None


def set_meteor_data(data: Optional[MeteorData]) -> None:
    """Install external METEOR data (None -> re-read env at next use)."""
    global _data
    _data = data


def _active_data() -> MeteorData:
    """Lazily build the active data from the METEOR_* env hooks."""
    global _data
    if _data is None:
        import os
        fw_path = os.environ.get("METEOR_FUNCTION_WORDS")
        syn_path = os.environ.get("METEOR_SYNONYMS")
        par_path = os.environ.get("METEOR_PARAPHRASES")
        _data = MeteorData(
            function_words=(load_function_words(fw_path) if fw_path
                            else _FUNCTION_WORDS),
            synsets=load_synsets(syn_path) if syn_path else None,
            paraphrases=load_paraphrases(par_path) if par_path else None)
    return _data


def _is_function(word: str) -> bool:
    return word in _active_data().function_words


def _candidates(hyp: Sequence[str], ref: Sequence[str]
                ) -> List[List[Tuple[int, int]]]:
    """Per hyp position: [(ref position, stage)] — stage 0 exact, 1 stem,
    2 synonym (shared synset), 3 paraphrase (single-word table pair).

    A pair matchable by several modules gets the earliest one (the jar
    assigns each match to the first module that finds it).
    """
    data = _active_data()
    ref_stems = [stem(w) for w in ref]
    empty: frozenset = frozenset()
    out: List[List[Tuple[int, int]]] = []
    for i, hw in enumerate(hyp):
        hs = stem(hw)
        h_syn = data.synsets.get(hw, empty) if data.synsets else empty
        row = []
        for j, rw in enumerate(ref):
            if hw == rw:
                row.append((j, 0))
            elif hs == ref_stems[j]:
                row.append((j, 1))
            elif h_syn and h_syn & data.synsets.get(rw, empty):
                row.append((j, 2))
            elif (data.paraphrases
                  and frozenset((hw, rw)) in data.paraphrases):
                row.append((j, 3))
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
