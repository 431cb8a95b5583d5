"""LSTM cells with torch-compatible parameterization.

The decode step of every caption model is an ``nn.LSTMCell`` (reference:
base_caption_models.py:75-76) and NIC uses a 2-layer ``nn.LSTM`` (reference:
nic.py:78-79). We keep torch's weight layout — per-gate blocks stacked in
(i, f, g, o) order inside ``w_ih``/``w_hh`` — so the torch-checkpoint bridge
is a pure transpose, and compute each step as two MXU matmuls + fused VPU
gate math (XLA fuses the elementwise tail into the matmul epilogue).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LSTMCellParams(NamedTuple):
    w_ih: jax.Array  # [input_dim, 4H] — torch weight_ih^T, gate order i,f,g,o
    w_hh: jax.Array  # [H, 4H]
    b_ih: jax.Array  # [4H]
    b_hh: jax.Array  # [4H]


def lstm_cell(p: LSTMCellParams, x: jax.Array, h: jax.Array,
              c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """One LSTMCell step: returns (h', c'). Matches torch gate semantics."""
    gates = (jnp.dot(x, p.w_ih, preferred_element_type=jnp.float32)
             + jnp.dot(h, p.w_hh, preferred_element_type=jnp.float32)
             + (p.b_ih + p.b_hh).astype(jnp.float32))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c32 = c.astype(jnp.float32)
    c_new = jax.nn.sigmoid(f) * c32 + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new.astype(h.dtype), c_new.astype(c.dtype)


class StackedLSTMParams(NamedTuple):
    """Multi-layer LSTM (reference NIC: nn.LSTM(num_layers=2), nic.py:78)."""

    layers: Tuple[LSTMCellParams, ...]


def stacked_lstm_step(p: StackedLSTMParams, x: jax.Array, hs: jax.Array,
                      cs: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One time step through all layers.

    hs, cs: [num_layers, B, H]. Returns (top-layer h, new hs, new cs).
    """
    new_h, new_c = [], []
    inp = x
    for li, lp in enumerate(p.layers):
        h, c = lstm_cell(lp, inp, hs[li], cs[li])
        new_h.append(h)
        new_c.append(c)
        inp = h
    return inp, jnp.stack(new_h), jnp.stack(new_c)


def stacked_lstm(p: StackedLSTMParams, xs: jax.Array,
                 h0: jax.Array, c0: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run a full sequence [B, T, D] through the stack with one lax.scan.

    Replaces torch's cuDNN-backed ``nn.LSTM`` over packed sequences; padding
    is handled by the caller's loss mask, so scanning the full rectangle is
    both correct and XLA-friendly (static shapes).
    """

    def step(carry, x_t):
        hs, cs = carry
        out, hs, cs = stacked_lstm_step(p, x_t, hs, cs)
        return (hs, cs), out

    (hs, cs), outs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(outs, 0, 1), hs, cs
