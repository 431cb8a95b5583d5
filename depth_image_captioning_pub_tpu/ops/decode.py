"""Batched sequence decoding: greedy scan helpers and beam search.

The reference has NO beam search — every decode is greedy argmax
(reference: base_caption_models.py:165-250; SURVEY.md §0) — but the driver's
headline metric names batched beam search (BASELINE.json), so the framework
provides it as a first-class TPU-native op: the whole search is ONE
``lax.scan`` over fixed [batch*beam] shapes; beam reordering is a gather;
finished beams persist by forcing <end> with zero cost. No host syncs.

Generic over models via ``step_fn(state, tokens, t) -> (state, logprobs)``
where every leaf of ``state`` and ``tokens``/``logprobs`` carry a leading
[B*W] dim and ``t`` is the scalar step index (for per-step rng folding).
Used by AttentionDecoder.beam_sample and NICDecoder.beam_sample.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def filtered_logits(logits: jax.Array, *, temperature: float = 1.0,
                    top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """Temperature + top-k + nucleus filtering for stochastic decoding.

    ``logits`` [..., V] -> f32 logits with everything outside the kept set
    at -inf, ready for ``jax.random.categorical``. Order matches the common
    convention: temperature first, then top-k, then top-p on the tempered
    distribution. Static shapes: one descending sort serves both filters.
    Ties at the k-th value / nucleus boundary keep ALL tied tokens (a
    threshold comparison, not a positional cut) — deterministic and
    shape-static. top_k=0 / top_p=1.0 disable their filters.
    """
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / jnp.maximum(jnp.float32(temperature), 1e-6)
    v = logits.shape[-1]
    if not ((top_k and top_k < v) or top_p < 1.0):
        return logits
    desc = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    if top_k and top_k < v:
        kth = jax.lax.slice_in_dim(desc, top_k - 1, top_k, axis=-1)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        probs = jax.nn.softmax(desc, axis=-1)
        cum_excl = jnp.cumsum(probs, axis=-1) - probs
        keep = cum_excl < top_p          # always keeps the argmax
        min_kept = jnp.min(jnp.where(keep, desc, jnp.inf), axis=-1,
                           keepdims=True)
        logits = jnp.where(logits < min_kept, -jnp.inf, logits)
    return logits


def _gather_beams(tree: Any, parent: jax.Array, batch: int,
                  beam: int) -> Any:
    """Reorder [B*W, ...] leaves by per-batch parent indices [B, W]."""
    flat_idx = (jnp.arange(batch)[:, None] * beam + parent).reshape(-1)
    return jax.tree_util.tree_map(lambda x: x[flat_idx], tree)


def beam_search(step_fn: Callable, init_state: Any, batch: int,
                start_id: int, end_id: int, *, beam_size: int = 5,
                max_length: int = 30, length_penalty: float = 0.0,
                early_exit: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens [B, max_length] of the best beam, scores [B]).

    ``init_state`` leaves must already be tiled to [B*W, ...] (tile each
    per-image tensor ``beam_size`` times along dim 0). ``length_penalty``
    alpha applies GNMT-style normalization score/len^alpha at selection
    time; 0 reproduces pure log-prob ranking.

    ``early_exit`` stops the search once every beam of every image has
    emitted <end> (a ``lax.while_loop`` instead of the fixed scan). This is
    EXACT, not approximate: a step where all beams are finished only offers
    each beam its own <end> continuation at unchanged score, and
    ``lax.top_k``'s descending order with ties broken by lower flat index
    reproduces the already-sorted scores with an identity parent mapping —
    so skipped steps change neither histories nor scores. With trained
    models (captions average ~12 tokens) this skips over half of the
    ``max_length`` steps; the fixed scan remains the default because XLA
    can schedule it slightly better when sequences run full length.
    """
    if early_exit:
        return _beam_search_early_exit(
            step_fn, init_state, batch, start_id, end_id,
            beam_size=beam_size, max_length=max_length,
            length_penalty=length_penalty)
    carry0 = _beam_init(init_state, batch, start_id, end_id,
                        beam_size, max_length)
    step = _make_beam_step(step_fn, batch, beam_size, end_id)

    def scan_step(carry, t):
        return step(carry, t), None

    (state, _, scores, history, finished), _ = jax.lax.scan(
        scan_step, carry0, jnp.arange(max_length))
    return _select_best(scores, history, end_id, length_penalty, max_length)


def _beam_init(init_state: Any, batch: int, start_id: int, end_id: int,
               beam_size: int, max_length: int):
    bw = batch * beam_size
    scores0 = jnp.full((batch, beam_size), NEG_INF, jnp.float32)
    scores0 = scores0.at[:, 0].set(0.0)  # only beam 0 live at step 0
    tokens0 = jnp.full((bw,), start_id, jnp.int32)
    history0 = jnp.full((batch, beam_size, max_length), end_id, jnp.int32)
    finished0 = jnp.zeros((batch, beam_size), bool)
    return (init_state, tokens0, scores0, history0, finished0)


def _make_beam_step(step_fn: Callable, batch: int, beam_size: int,
                    end_id: int) -> Callable:
    def step(carry, t):
        state, prev, scores, history, finished = carry
        state, logprobs = step_fn(state, prev, t)        # [B*W, V]
        v = logprobs.shape[-1]
        logprobs = logprobs.reshape(batch, beam_size, v).astype(jnp.float32)
        # finished beams: only <end> continues, for free
        fin_row = jnp.full((v,), NEG_INF).at[end_id].set(0.0)
        logprobs = jnp.where(finished[..., None], fin_row, logprobs)
        total = scores[..., None] + logprobs             # [B, W, V]
        flat = total.reshape(batch, beam_size * v)
        new_scores, flat_idx = jax.lax.top_k(flat, beam_size)
        parent = flat_idx // v                           # [B, W]
        token = (flat_idx % v).astype(jnp.int32)         # [B, W]
        state = _gather_beams(state, parent, batch, beam_size)
        history = jnp.take_along_axis(history, parent[..., None], axis=1)
        history = history.at[:, :, t].set(token)
        finished = jnp.take_along_axis(finished, parent, axis=1) \
            | (token == end_id)
        return (state, token.reshape(-1), new_scores, history, finished)
    return step


def _select_best(scores: jax.Array, history: jax.Array, end_id: int,
                 length_penalty: float, max_length: int
                 ) -> Tuple[jax.Array, jax.Array]:
    if length_penalty > 0.0:
        lengths = jnp.minimum(
            jnp.argmax(history == end_id, axis=-1) + 1, max_length)
        norm = scores / (lengths.astype(jnp.float32) ** length_penalty)
    else:
        norm = scores
    best = jnp.argmax(norm, axis=1)                      # [B]
    tokens = jnp.take_along_axis(
        history, best[:, None, None], axis=1)[:, 0]      # [B, max_length]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return tokens, best_scores


def _beam_search_early_exit(step_fn: Callable, init_state: Any, batch: int,
                            start_id: int, end_id: int, *, beam_size: int,
                            max_length: int, length_penalty: float
                            ) -> Tuple[jax.Array, jax.Array]:
    """The same search in a while_loop that stops when every beam is done."""
    carry0 = _beam_init(init_state, batch, start_id, end_id,
                        beam_size, max_length)
    step = _make_beam_step(step_fn, batch, beam_size, end_id)

    def cond(loop):
        carry, t = loop
        finished = carry[4]
        return jnp.logical_and(t < max_length, ~jnp.all(finished))

    def body(loop):
        carry, t = loop
        return step(carry, t), t + 1

    (_, _, scores, history, _), _ = jax.lax.while_loop(
        cond, body, (carry0, jnp.int32(0)))
    return _select_best(scores, history, end_id, length_penalty, max_length)


def tile_for_beams(tree: Any, beam_size: int) -> Any:
    """[B, ...] -> [B*W, ...] by repeating each row beam_size times."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree)
