"""Masked GRU over the pinyin-character axis.

The reference runs a torch ``nn.GRU`` over per-token pinyin character
sequences via ``pack_padded_sequence`` and keeps the final hidden state per
sequence (reference: src/models.py:661-669,818-826). The TPU rendition is a
``lax.scan`` over a *fixed* pinyin axis with per-step length masking:

    h_t = t < len ? GRUCell(h_{t-1}, x_t) : h_{t-1}

which yields exactly the last *valid* hidden state (pack_padded semantics)
while keeping shapes static. The (B, S) token grid is folded into one batch
axis of B·S independent sequences, so the three gate matmuls are large and
MXU-friendly.

Gate math follows the torch GRU cell definition (r/z/n gate order and the
``r * (W_hn h + b_hn)`` placement), so torch checkpoints map directly onto
``w_ih (H, 3H) / w_hh (H, 3H) / b_ih / b_hh`` after transposition.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from realise_tpu.ops.layers import trunc_normal_init


def init_gru(key, input_dim: int, hidden_dim: int, stddev: float = 0.02):
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": trunc_normal_init(k1, (input_dim, 3 * hidden_dim), stddev),
        "w_hh": trunc_normal_init(k2, (hidden_dim, 3 * hidden_dim), stddev),
        "b_ih": jnp.zeros((3 * hidden_dim,), jnp.float32),
        "b_hh": jnp.zeros((3 * hidden_dim,), jnp.float32),
    }


def gru_cell(params, h: jax.Array, x: jax.Array) -> jax.Array:
    """One torch-compatible GRU step. h: (N, H), x: (N, D) → (N, H)."""
    dtype = x.dtype
    gi = jnp.matmul(x, params["w_ih"].astype(dtype),
                    preferred_element_type=dtype) + params["b_ih"].astype(dtype)
    gh = jnp.matmul(h, params["w_hh"].astype(dtype),
                    preferred_element_type=dtype) + params["b_hh"].astype(dtype)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_last_hidden(
    params,
    inputs: jax.Array,
    lengths: jax.Array,
) -> jax.Array:
    """Run the GRU and return the last valid hidden state per sequence.

    inputs: (N, P, D) padded sequences; lengths: (N,) valid step counts.
    Returns (N, H). Sequences with length 0 return the zero state.

    Stays jnp: the recurrence is a <=8-step lax.scan whose input projections
    are hoisted into one big matmul; a Pallas version was measured slower
    and failed to compile at the (B*S, P, H) production shape (round 2).
    """
    n, p, _ = inputs.shape
    hidden_dim = params["w_hh"].shape[0]
    dtype = inputs.dtype
    h0 = jnp.zeros((n, hidden_dim), dtype)

    # Hoist the input projections out of the scan: one (N·P, D)×(D, 3H)
    # matmul instead of P small ones — the sequential part is only the
    # recurrent (N, H)×(H, 3H) product, so the MXU sees two large matmul
    # shapes instead of 2·P small ones.
    gi_all = jnp.matmul(inputs.reshape(n * p, -1),
                        params["w_ih"].astype(dtype),
                        preferred_element_type=dtype)
    gi_all = (gi_all + params["b_ih"].astype(dtype)).reshape(n, p, -1)

    w_hh = params["w_hh"].astype(dtype)
    b_hh = params["b_hh"].astype(dtype)

    def step(h, xs):
        gi_t, t = xs
        gh = jnp.matmul(h, w_hh, preferred_element_type=dtype) + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        cand = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * cand + z * h
        valid = (t < lengths)[:, None]
        return jnp.where(valid, h_new, h), None

    xs = (jnp.moveaxis(gi_all, 1, 0), jnp.arange(p, dtype=lengths.dtype))
    h_final, _ = jax.lax.scan(step, h0, xs)
    return h_final


def gru_last_hidden_factored(params, emb_table: jax.Array, idx: jax.Array,
                             lengths: jax.Array) -> jax.Array:
    """GRU over EMBEDDED ids with the input projection pre-folded.

    Computes exactly ``gru_last_hidden(params, emb_table[idx], lengths)``
    but exploits associativity: with a tiny embedding alphabet (A=33 pinyin
    symbols), ``emb[idx] @ W_ih == onehot(idx) @ (emb_table @ W_ih)``, so
    the per-step input projection collapses from a (N, D)x(D, 3H) matmul
    (plus an (N, P, 3H) HBM stash for backward — ~0.8 GB at the factorized
    vocab shape) to a (N, A)x(A, 3H) one-hot matmul from a VMEM-resident
    (A, 3H) table. Gradients flow through the same associativity: d_table
    and d_W_ih come from the (A, 3H) product's transposes — identical
    values to the unfolded path up to bf16 rounding order.

    emb_table: (A, D) activation-dtype embedding table; idx: (N, P) int32;
    lengths: (N,). Returns (N, H). Used by the vocabulary-factorized
    streams (models/realise.py _factorized_gru) where N = V ≈ 21k.
    """
    n, p = idx.shape
    a = emb_table.shape[0]
    hidden_dim = params["w_hh"].shape[0]
    dtype = emb_table.dtype
    # (A, 3H): the whole input projection, computed once.
    tw = jnp.matmul(emb_table, params["w_ih"].astype(dtype),
                    preferred_element_type=dtype)
    tw = tw + params["b_ih"].astype(dtype)
    w_hh = params["w_hh"].astype(dtype)
    b_hh = params["b_hh"].astype(dtype)
    h0 = jnp.zeros((n, hidden_dim), dtype)

    def step(h, xs):
        ids_t, t = xs
        # One-hot matmul, not a gather: its transpose is a matmul too, so
        # the backward never emits XLA:TPU's slow-to-compile scatter.
        onehot = jax.nn.one_hot(ids_t, a, dtype=dtype)
        gi_t = jnp.matmul(onehot, tw, preferred_element_type=dtype)
        gh = jnp.matmul(h, w_hh, preferred_element_type=dtype) + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        cand = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * cand + z * h
        valid = (t < lengths)[:, None]
        return jnp.where(valid, h_new, h), None

    xs = (jnp.moveaxis(idx, 1, 0), jnp.arange(p, dtype=lengths.dtype))
    h_final, _ = jax.lax.scan(step, h0, xs)
    return h_final
