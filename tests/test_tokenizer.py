"""Tokenizer / vocabulary golden tests.

The expectations encode the exact behavior of the reference tokenizer
(reference: util.py:118-166) and vocabulary notebook (dataset/
vocabulary_dict.ipynb cell 1), including their quirks.
"""

from depth_image_captioning_pub_tpu.data.tokenizer import (
    SPECIAL, clean_tokens, ids_to_caption, tokenize_caption,
    untokenize_caption)
from depth_image_captioning_pub_tpu.data.vocab import build_vocab


def test_clean_tokens_strips_trailing_punct():
    assert clean_tokens("A dog runs.") == ["a", "dog", "runs"]
    assert clean_tokens("hello, world ,") == ["hello", "world"]
    # bare '.' and ',' tokens are dropped entirely
    assert clean_tokens("a . b , c") == ["a", "b", "c"]
    # only TRAILING punctuation is stripped; interior stays (rstrip semantics)
    assert clean_tokens("u.s.a. e,g,") == ["u.s.a", "e,g"]
    # rstrip('.') runs before rstrip(',') — "a.," -> "a." ; "a,." -> "a"
    assert clean_tokens("a,.") == ["a"]
    assert clean_tokens("a.,") == ["a."]


def test_tokenize_caption(tiny_vocab):
    ids = tokenize_caption("A dog runs.", tiny_vocab)
    assert ids == [tiny_vocab["<start>"], tiny_vocab["a"], tiny_vocab["dog"],
                   tiny_vocab["runs"], tiny_vocab["<end>"]]


def test_tokenize_oov_maps_to_unk(tiny_vocab):
    ids = tokenize_caption("a zebra runs", tiny_vocab)
    assert ids[2] == tiny_vocab["<unk>"]


def test_untokenize_caption(tiny_vocab):
    assert untokenize_caption("A dog RUNS.", tiny_vocab) == "a dog runs"
    assert untokenize_caption("a zebra runs", tiny_vocab) == "a <unk> runs"


def test_ids_to_caption_stops_at_end(tiny_vocab):
    id_to_word = {i: w for w, i in tiny_vocab.items()}
    ids = [tiny_vocab["<start>"], tiny_vocab["a"], tiny_vocab["dog"],
           tiny_vocab["<end>"], tiny_vocab["cat"]]
    assert ids_to_caption(ids, id_to_word) == "a dog"


def test_build_vocab_notebook_semantics():
    train = ["A dog runs.", "a dog sits", "a dog naps"]
    val = ["a cat runs, fast"]
    w2i, i2w = build_vocab(train, val, min_count=3)
    # 'a' (4x) and 'dog' (3x) survive; notebook translate strips ALL . and ,
    assert "a" in w2i and "dog" in w2i
    assert "runs" not in w2i        # 2 occurrences
    # id order = first occurrence order, specials appended last
    assert w2i["a"] == 0 and w2i["dog"] == 1
    assert list(w2i)[-4:] == ["<start>", "<end>", "<unk>", "<null>"]
    assert i2w[w2i["<null>"]] == "<null>"
