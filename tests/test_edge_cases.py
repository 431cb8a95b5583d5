"""Edge-case hardening tests: empty hypotheses in every metric, prefetcher
error propagation, degenerate batches, config path tables."""

import numpy as np
import pytest

from depth_image_captioning_pub_tpu.data.pipeline import (
    Prefetcher, generate_subset, pad_captions)
from depth_image_captioning_pub_tpu.metrics import load_textfiles, score


def test_metrics_tolerate_empty_hypothesis():
    refs = [["a dog runs"], ["a cat sits"]]
    hypos = ["", "a cat sits"]
    ref, hypo = load_textfiles(refs, hypos)
    result = score(ref, hypo)
    for k, v in result.items():
        assert np.isfinite(v) and v >= 0.0, (k, v)


def test_metrics_tolerate_single_word():
    ref, hypo = load_textfiles([["a"]], ["a"])
    result = score(ref, hypo)
    assert result["Bleu_1"] > 0.99
    # 2..4-gram counts are zero on a 1-token corpus; tiny/small fudge keeps
    # the geometric mean finite (pycocoevalcap behaves the same way)
    assert np.isfinite(result["Bleu_4"])


def test_prefetcher_propagates_worker_errors():
    def boom():
        yield 1
        raise RuntimeError("worker exploded")

    it = Prefetcher(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="worker exploded"):
        for _ in it:
            pass


def test_prefetcher_drains_fully():
    assert list(Prefetcher(iter(range(7)), depth=2)) == list(range(7))


def test_prefetcher_close_unblocks_abandoned_producer():
    """close(): a consumer that abandons iteration early (the train loop's
    preemption exit) must not strand the producer thread on a full queue
    (regression: put() used to block forever)."""
    import itertools
    it = Prefetcher(itertools.count(), depth=2)  # infinite producer
    assert next(it) == 0
    it.close()
    assert not it._thread.is_alive()


def test_pad_captions_truncates_keeping_end():
    toks = [[1, 2, 3, 4, 5, 6, 99]]
    out, lengths = pad_captions(toks, null_id=0, max_len=5)
    assert out.shape == (1, 5)
    assert out[0, -1] == 99          # final <end> survives truncation
    assert lengths[0] == 5


def test_generate_subset_matches_reference_semantics():
    class FakeDS:
        def __len__(self):
            return 10

    a1, b1 = generate_subset(FakeDS(), 0.3, random_seed=0)
    a2, b2 = generate_subset(FakeDS(), 0.3, random_seed=0)
    assert a1 == a2 and b1 == b2        # deterministic per seed
    assert len(a1) == 3 and len(b1) == 7
    assert sorted(a1 + b1) == list(range(10))  # disjoint, exhaustive


def test_config_save_dir_table():
    from depth_image_captioning_pub_tpu.config import ConfigTrain
    cfg = ConfigTrain()
    assert cfg.save_dir("soft", False).endswith("exp_result/base_soft")
    assert cfg.save_dir("hard", True).endswith("exp_result/base_hard_ori")
    assert cfg.save_dir("depth_soft", False).endswith("CNN_depth_soft")
    assert cfg.save_dir("nic", False).endswith("exp_result/NIC")


def test_beam_search_all_finish_immediately():
    """If <end> is the argmax everywhere at step 0, beams stay finished and
    scores stay finite."""
    import jax
    import jax.numpy as jnp
    from depth_image_captioning_pub_tpu.ops.decode import beam_search

    V, END = 7, 3

    def step_fn(state, prev, t):
        logits = jnp.zeros((prev.shape[0], V)).at[:, END].set(5.0)
        return state, jax.nn.log_softmax(logits, -1)

    tokens, scores = beam_search(step_fn, {"z": jnp.zeros((6, 1))}, 2,
                                 start_id=0, end_id=END, beam_size=3,
                                 max_length=5)
    t = np.asarray(tokens)
    assert np.all(t == END)
    assert np.all(np.isfinite(np.asarray(scores)))
