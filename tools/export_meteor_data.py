#!/usr/bin/env python
"""Export the external data files that activate METEOR 1.5's synonym /
paraphrase / function-word matcher stages (metrics/meteor.py).

The reference scores METEOR through the METEOR-1.5 Java jar
(reference: evaluate_metrix.py:29), whose language pack bundles WordNet
synonym sets, a paraphrase table, and a corpus-derived function-word list.
None of that data is redistributable inside this repo, so the offline
default runs exact+stem only (a documented underestimate). This tool
builds the three files from sources the USER has, after which

    export METEOR_SYNONYMS=synonyms.en
    export METEOR_PARAPHRASES=paraphrase.en
    export METEOR_FUNCTION_WORDS=function.words.en

activates the full four-stage pipeline (file formats documented in
metrics/meteor.py; stage semantics pinned by tests/test_meteor_data.py and
the worked-example fixture in tests/test_meteor_fixture.py).

Subcommands:
  synonyms [out]            WordNet -> one synset per line (needs the nltk
                            wordnet corpus: ``python -m nltk.downloader
                            wordnet`` on a connected machine). NOTE: the
                            build environment has no WordNet corpus and no
                            network, so this branch is exercised in tests
                            only against a stub WordNet
                            (tests/test_meteor_fixture.py) — run it once
                            on a connected machine to validate locally.
  paraphrases in.gz [out]   Normalize the jar's paraphrase-en.gz (lines
                            ``p1 ||| p2 [||| prob]``): lowercase, dedupe
                            directions, drop prob fields. Multi-word
                            entries are KEPT — the aligner matches phrase
                            blocks like the jar.
  function-words in [out]   Normalize a function-word list (e.g. the jar's
                            ``function.words.english`` resource): lowercase,
                            dedupe, sorted, #-comments stripped.
"""

from __future__ import annotations

import sys


def export_synonyms(out_path: str) -> int:
    """WordNet -> synonym file: one synset per line, members separated by
    spaces. Two words then match on METEOR's synonym stage iff they share
    a line (meteor.load_synsets builds word->synset-id sets from this)."""
    try:
        from nltk.corpus import wordnet as wn
        all_synsets = list(wn.all_synsets())
    except LookupError:
        print("The nltk wordnet corpus is not installed. On a machine with "
              "network access run:\n    python -m nltk.downloader wordnet\n"
              "then re-run this command (no network is needed afterwards).",
              file=sys.stderr)
        return 1
    except ImportError:
        print("nltk is not installed (pip install nltk).", file=sys.stderr)
        return 1
    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for syn in all_synsets:
            # single-word lemmas only: the aligner matches word<->word;
            # multi-word lemmas use '_' in WordNet and can never appear in
            # whitespace-tokenized captions
            words = sorted({l.name().lower() for l in syn.lemmas()
                            if "_" not in l.name()})
            if len(words) >= 2:
                f.write(" ".join(words) + "\n")
                n += 1
    print(f"wrote {n} synsets to {out_path}")
    return 0


def export_paraphrases(in_path: str, out_path: str) -> int:
    """Normalize a METEOR paraphrase table (single- AND multi-word).

    The aligner matches phrase blocks like the jar (metrics/meteor.py
    align_phrases), so every entry is kept; this pass lowercases,
    collapses whitespace, drops probability fields and self-pairs, and
    dedupes the two directions the jar's table lists — roughly halving
    the file and removing per-run normalization cost."""
    import gzip
    opener = gzip.open if in_path.endswith(".gz") else open
    pairs = set()
    with opener(in_path, "rt", encoding="utf-8") as f:
        for ln in f:
            fields = [x.strip() for x in ln.split("|||")]
            if len(fields) < 2:
                continue
            a = " ".join(fields[0].lower().split())
            b = " ".join(fields[1].lower().split())
            if a and b and a != b:
                pairs.add((min(a, b), max(a, b)))
    with open(out_path, "w", encoding="utf-8") as f:
        for a, b in sorted(pairs):
            f.write(f"{a} ||| {b}\n")
    print(f"wrote {len(pairs)} paraphrase pairs to {out_path}")
    return 0


def export_function_words(in_path: str, out_path: str) -> int:
    """Normalize a function-word list into the one-word-per-line format."""
    words = set()
    with open(in_path, "rt", encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            words.update(w.lower() for w in ln.split())
    with open(out_path, "w", encoding="utf-8") as f:
        for w in sorted(words):
            f.write(w + "\n")
    print(f"wrote {len(words)} function words to {out_path}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    cmd, args = argv[0], argv[1:]
    if cmd == "synonyms":
        return export_synonyms(args[0] if args else "synonyms.en")
    if cmd == "paraphrases" and args:
        return export_paraphrases(args[0], args[1] if len(args) > 1
                                  else "paraphrase.en")
    if cmd == "function-words" and args:
        return export_function_words(args[0], args[1] if len(args) > 1
                                     else "function.words.en")
    print(__doc__, file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
