"""Caption tokenizer / detokenizer.

Behavior-identical re-implementation of the reference's caption text handling
(reference: Captioning_models/util.py:118-166): lowercase, whitespace split,
drop bare ``.``/``,`` tokens, strip trailing periods then trailing commas,
wrap in ``<start>``/``<end>``, map OOV to ``<unk>``.

Unlike the reference (which returns a float ``torch.Tensor`` of ids —
util.py:143 builds ``torch.Tensor`` not ``LongTensor``), we return a plain
``list[int]``; the batch pipeline owns array construction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    start: str = "<start>"
    end: str = "<end>"
    unk: str = "<unk>"
    null: str = "<null>"


SPECIAL = SpecialTokens()


def clean_tokens(caption: str) -> List[str]:
    """Lowercase/split/strip exactly as the reference tokenizer does.

    Reference: util.py:119-132 — tokens equal to ``.`` or ``,`` are dropped;
    otherwise trailing ``.`` chars are stripped, then trailing ``,`` chars.
    """
    out = []
    for token in caption.lower().split():
        if token == "." or token == ",":
            continue
        token = token.rstrip(".").rstrip(",")
        out.append(token)
    return out


def tokenize_caption(caption: str, word_to_id: Dict[str, int]) -> List[int]:
    """Caption string -> token-id list with <start>/<end> (util.py:118-143)."""
    tokens = [SPECIAL.start] + clean_tokens(caption) + [SPECIAL.end]
    unk = word_to_id[SPECIAL.unk]
    return [word_to_id.get(t, unk) for t in tokens]


def untokenize_caption(caption: str, word_to_id: Dict[str, int]) -> str:
    """Normalize a raw reference caption for scoring (util.py:145-166).

    Cleans the same way and replaces OOV words with the literal ``<unk>``
    string, then re-joins with single spaces.
    """
    words = [w if w in word_to_id else SPECIAL.unk
             for w in clean_tokens(caption)]
    return " ".join(words)


def ids_to_caption(ids: Sequence[int], id_to_word: Dict[int, str]) -> str:
    """Token ids -> caption string: stop at <end>, skip <start>.

    Matches the detokenization used in every eval loop (reference:
    base_evaluation.py:146-153, nic.py:433-440).
    """
    words = []
    for i in ids:
        w = id_to_word[int(i)]
        if w == SPECIAL.end:
            break
        if w != SPECIAL.start:
            words.append(w)
    return " ".join(words)
