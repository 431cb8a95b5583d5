"""Independent naive reference scorer for the scale-up corpus fixture.

Deliberately shares NO code with ``depth_image_captioning_pub_tpu/metrics/``
(the one exception: the Porter stemmer is imported, since it is a standard
published algorithm pinned by its own fixtures — reimplementing it here
would only test Porter against Porter). Everything else — n-gram counting,
corpus accumulation, document frequencies, alignment search — is written
from the published algorithm descriptions (Papineni et al. 2002 + the
pycocoevalcap accumulation semantics; Lin 2004; Vedantam et al. 2015;
Denkowski & Lavie 2014) in a different style, so a corpus-accumulation bug
in the production scorers (df counting, reflen totals, aggregated METEOR
stats) cannot cancel out here.

Used by tests/test_corpus_fixture.py, which freezes a 32-image x 5-ref
synthetic corpus and pins both scorers to committed literals.
"""

from __future__ import annotations

import math
from itertools import product

from depth_image_captioning_pub_tpu.metrics.porter import stem as _porter


# ---------------------------------------------------------------------------
# corpus generation (deterministic, no external data)
# ---------------------------------------------------------------------------

_NOUNS = ["dog", "cat", "man", "woman", "child", "horse", "bird", "car",
          "boat", "table", "ball", "tree", "house", "plate", "train"]
_VERBS = ["runs", "jumps", "sits", "stands", "walks", "sleeps", "eats",
          "plays", "rides", "holds"]
_ADJS = ["small", "large", "red", "young", "old", "happy", "brown", "white"]
_PLACES = ["park", "street", "beach", "field", "room", "kitchen", "yard"]


def make_corpus(n_images: int = 32, n_refs: int = 5, seed: int = 1234):
    """Returns (gts, res): {idx: [refs]} / {idx: [hypo]} like the eval path
    (reference load_textfiles: evaluate_metrix.py:6-18)."""
    import numpy as np
    rng = np.random.RandomState(seed)

    def sentence():
        a = _ADJS[rng.randint(len(_ADJS))]
        n = _NOUNS[rng.randint(len(_NOUNS))]
        v = _VERBS[rng.randint(len(_VERBS))]
        p = _PLACES[rng.randint(len(_PLACES))]
        words = ["a", a, n, v, "in", "the", p]
        if rng.rand() < 0.5:
            words += ["with", "a", _NOUNS[rng.randint(len(_NOUNS))]]
        return words

    gts, res = {}, {}
    for i in range(n_images):
        base = sentence()
        refs = []
        for _ in range(n_refs):
            r = list(base)
            # light per-ref variation: swap one content word
            if rng.rand() < 0.7:
                r[1] = _ADJS[rng.randint(len(_ADJS))]
            if rng.rand() < 0.4:
                r[3] = _VERBS[rng.randint(len(_VERBS))]
            refs.append(" ".join(r))
        hyp = list(base)
        # hypothesis quality varies per image: perfect / perturbed / short
        roll = rng.rand()
        if roll < 0.25:
            pass                                    # exact match of base
        elif roll < 0.7:
            hyp[2] = _NOUNS[rng.randint(len(_NOUNS))]
            if rng.rand() < 0.5:
                hyp[6] = _PLACES[rng.randint(len(_PLACES))]
        else:
            hyp = hyp[:4]                           # truncated caption
        gts[i] = refs
        res[i] = [" ".join(hyp)]
    return gts, res


# ---------------------------------------------------------------------------
# BLEU (corpus accumulation, closest-ref brevity, pycocoevalcap constants)
# ---------------------------------------------------------------------------

def naive_bleu(gts, res, max_n=4):
    correct = {n: 0 for n in range(1, max_n + 1)}
    guess = {n: 0 for n in range(1, max_n + 1)}
    hyp_total, ref_total = 0, 0
    for k in sorted(gts):
        hyp = res[k][0].split()
        refs = [r.split() for r in gts[k]]
        hyp_total += len(hyp)
        # closest reference length; ties broken toward the SHORTER ref
        best = None
        for r in refs:
            cand = (abs(len(r) - len(hyp)), len(r))
            if best is None or cand < best:
                best = cand
        ref_total += best[1]
        for n in range(1, max_n + 1):
            grams = {}
            for i in range(len(hyp) - n + 1):
                g = tuple(hyp[i:i + n])
                grams[g] = grams.get(g, 0) + 1
            for g, c in grams.items():
                cap = 0
                for r in refs:
                    rc = sum(1 for i in range(len(r) - n + 1)
                             if tuple(r[i:i + n]) == g)
                    cap = max(cap, rc)
                correct[n] += min(c, cap)
            guess[n] += max(0, len(hyp) - n + 1)
    ratio = hyp_total / (ref_total + 1e-9)
    bp = 1.0 if ratio >= 1.0 else math.exp(1.0 - 1.0 / ratio)
    out = []
    acc = 0.0
    for n in range(1, max_n + 1):
        acc += math.log((correct[n] + 1e-15) / (guess[n] + 1e-9))
        out.append(math.exp(acc / n) * bp)
    return out


# ---------------------------------------------------------------------------
# ROUGE-L (recursive LCS, beta=1.2, max-P/max-R over refs, corpus mean)
# ---------------------------------------------------------------------------

def _lcs(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def go(i, j):
        if i == 0 or j == 0:
            return 0
        if a[i - 1] == b[j - 1]:
            return go(i - 1, j - 1) + 1
        return max(go(i - 1, j), go(i, j - 1))

    out = go(len(a), len(b))
    go.cache_clear()
    return out


def naive_rouge(gts, res, beta=1.2):
    vals = []
    for k in sorted(gts):
        hyp = tuple(res[k][0].split())
        ps, rs = [], []
        for r in gts[k]:
            rt = tuple(r.split())
            l = _lcs(hyp, rt)
            ps.append(l / len(hyp) if hyp else 0.0)
            rs.append(l / len(rt) if rt else 0.0)
        p, r = max(ps), max(rs)
        vals.append(0.0 if p == 0 or r == 0
                    else (1 + beta * beta) * p * r / (r + beta * beta * p))
    return sum(vals) / len(vals)


# ---------------------------------------------------------------------------
# CIDEr-D (df over ref sets, tf-idf, clipped cosine, sigma=6 penalty, x10)
# ---------------------------------------------------------------------------

def _grams_upto(words, n=4):
    out = {}
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            g = tuple(words[i:i + k])
            out[g] = out.get(g, 0) + 1
    return out


def naive_cider(gts, res, n=4, sigma=6.0):
    keys = sorted(gts)
    df = {}
    for k in keys:
        present = set()
        for r in gts[k]:
            present |= set(_grams_upto(r.split(), n))
        for g in present:
            df[g] = df.get(g, 0) + 1
    log_corpus = math.log(max(1, len(keys)))

    def tfidf(words):
        cnt = _grams_upto(words, n)
        vec = {}
        norms = [0.0] * n
        for g, tf in cnt.items():
            w = tf * (log_corpus - math.log(max(1.0, df.get(g, 0))))
            vec[g] = w
            norms[len(g) - 1] += w * w
        return vec, [math.sqrt(x) for x in norms], len(words)

    scores = []
    for k in keys:
        hv, hn, hl = tfidf(res[k][0].split())
        total = 0.0
        for r in gts[k]:
            rv, rn, rl = tfidf(r.split())
            per_n = [0.0] * n
            # iterate over REF ngrams (production iterates hyp ngrams):
            # min(h, r) * r is zero when the hyp weight is zero, so the two
            # loops cover the same terms
            for g, rw in rv.items():
                hw = hv.get(g, 0.0)
                per_n[len(g) - 1] += min(hw, rw) * rw
            for i in range(n):
                if hn[i] > 0 and rn[i] > 0:
                    per_n[i] /= hn[i] * rn[i]
            penalty = math.exp(-((hl - rl) ** 2) / (2 * sigma * sigma))
            total += sum(x * penalty for x in per_n) / n
        scores.append(total / len(gts[k]) * 10.0)
    return sum(scores) / len(scores)


# ---------------------------------------------------------------------------
# METEOR 1.5 (exact+stem offline pipeline, exhaustive optimal alignment)
# ---------------------------------------------------------------------------

_M_ALPHA, _M_BETA, _M_GAMMA, _M_DELTA = 0.85, 0.2, 0.6, 0.75
_M_WEIGHTS = (1.0, 0.6)

# The production module's curated stand-in function-word list, restated as
# data (a data table, not code).
_FN_WORDS = set("""
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


def _meteor_align_exhaustive(hyp, ref):
    """All-maximal-matching search: max cardinality, then fewest chunks,
    then least total |i-j|, then largest module weight. Exponential but
    exact; fine at caption lengths."""
    cands = []
    ref_stems = [_porter(w) for w in ref]
    for i, hw in enumerate(hyp):
        hs = _porter(hw)
        row = []
        for j, rw in enumerate(ref):
            if hw == rw:
                row.append((j, 0))
            elif hs == ref_stems[j]:
                row.append((j, 1))
        cands.append(row)

    best = {"key": None, "pairs": []}

    def evaluate(pairs):
        if not pairs:
            return (0, 0, 0, 0.0)
        chunks = 1
        for (h0, r0, _), (h1, r1, _) in zip(pairs, pairs[1:]):
            if h1 != h0 + 1 or r1 != r0 + 1:
                chunks += 1
        dist = sum(abs(h - r) for h, r, _ in pairs)
        wt = sum(_M_WEIGHTS[s] for _, _, s in pairs)
        return (-len(pairs), chunks, dist, -wt)

    used = set()

    def walk(i, pairs):
        if i == len(hyp):
            key = evaluate(pairs)
            # safe prune partner: only keep strictly better leaves
            if best["key"] is None or key < best["key"]:
                best["key"] = key
                best["pairs"] = list(pairs)
            return
        # cardinality bound: even matching every remaining word cannot
        # beat the best found -> prune (exactness-preserving)
        if best["key"] is not None:
            if -(len(pairs) + (len(hyp) - i)) > best["key"][0]:
                return
        for j, s in cands[i]:
            if j not in used:
                used.add(j)
                pairs.append((i, j, s))
                walk(i + 1, pairs)
                pairs.pop()
                used.remove(j)
        walk(i + 1, pairs)

    walk(0, [])
    return best["pairs"]


def _meteor_pair_stats(hyp, ref):
    pairs = _meteor_align_exhaustive(hyp, ref)
    chunks = 0
    if pairs:
        chunks = 1
        for (h0, r0, _), (h1, r1, _) in zip(pairs, pairs[1:]):
            if h1 != h0 + 1 or r1 != r0 + 1:
                chunks += 1
    st = {
        "hc": sum(1 for w in hyp if w not in _FN_WORDS),
        "hf": sum(1 for w in hyp if w in _FN_WORDS),
        "rc": sum(1 for w in ref if w not in _FN_WORDS),
        "rf": sum(1 for w in ref if w in _FN_WORDS),
        "mhc": 0.0, "mhf": 0.0, "mrc": 0.0, "mrf": 0.0,
        "m": len(pairs), "ch": chunks,
    }
    for i, j, s in pairs:
        w = _M_WEIGHTS[s]
        st["mhf" if hyp[i] in _FN_WORDS else "mhc"] += w
        st["mrf" if ref[j] in _FN_WORDS else "mrc"] += w
    return st


def _meteor_score(st):
    pd = _M_DELTA * st["hc"] + (1 - _M_DELTA) * st["hf"]
    rd = _M_DELTA * st["rc"] + (1 - _M_DELTA) * st["rf"]
    if st["m"] == 0 or pd == 0 or rd == 0:
        return 0.0
    p = (_M_DELTA * st["mhc"] + (1 - _M_DELTA) * st["mhf"]) / pd
    r = (_M_DELTA * st["mrc"] + (1 - _M_DELTA) * st["mrf"]) / rd
    if p == 0 or r == 0:
        return 0.0
    f = p * r / (_M_ALPHA * p + (1 - _M_ALPHA) * r)
    return f * (1 - _M_GAMMA * (st["ch"] / st["m"]) ** _M_BETA)


def naive_meteor(gts, res):
    totals = None
    for k in sorted(gts):
        hyp = res[k][0].split()
        best_st, best_s = None, -1.0
        for r in gts[k]:
            st = _meteor_pair_stats(hyp, r.split())
            s = _meteor_score(st)
            if s > best_s:
                best_s, best_st = s, st
        if totals is None:
            totals = dict(best_st)
        else:
            for key in totals:
                totals[key] += best_st[key]
    return _meteor_score(totals) if totals else 0.0
