"""Fused GRU-scan kernel over the pinyin axis (forward path).

Runs the whole masked GRU for a tile of sequences inside one kernel: the
input projections of all P steps in one MXU matmul, then the P-step
recurrence entirely in VMEM — hidden states, gate activations and projections
never touch HBM. P is small and static (8), so the time loop is unrolled.

Used on forward-only paths (serving, per-vocab table precompute —
realise_tpu.models.realise.precompute_inference_tables); the jnp scan in
ops/gru.py remains the differentiable training path and the parity reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256


def _gru_kernel(x_ref, len_ref, wih_ref, whh_ref, bih_ref, bhh_ref, out_ref,
                *, p_steps: int, hidden: int):
    t_rows = x_ref.shape[0]
    x = x_ref[:]                                     # (T, P, D)
    d = x.shape[-1]
    wih = wih_ref[:]
    gi = jnp.dot(x.reshape(t_rows * p_steps, d), wih,
                 preferred_element_type=jnp.float32)
    gi = (gi + bih_ref[:].astype(jnp.float32)).reshape(t_rows, p_steps, -1)

    whh = whh_ref[:]
    bhh = bhh_ref[:].astype(jnp.float32)
    lengths = len_ref[:]

    h = jnp.zeros((t_rows, hidden), jnp.float32)
    for t in range(p_steps):                         # static unroll, P ≤ 8
        gh = jnp.dot(h.astype(whh.dtype), whh,
                     preferred_element_type=jnp.float32) + bhh
        i_r = gi[:, t, :hidden]
        i_z = gi[:, t, hidden : 2 * hidden]
        i_n = gi[:, t, 2 * hidden :]
        h_r = gh[:, :hidden]
        h_z = gh[:, hidden : 2 * hidden]
        h_n = gh[:, 2 * hidden :]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        cand = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * cand + z * h
        valid = (lengths > t)[:, None]
        h = jnp.where(valid, h_new, h)
    out_ref[:] = h.astype(out_ref.dtype)


def fused_gru_last_hidden(params, inputs: jax.Array, lengths: jax.Array,
                          interpret: bool | None = None) -> jax.Array:
    """inputs: (N, P, D) padded pinyin embeddings; lengths: (N,) → (N, H)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, p, d = inputs.shape
    hidden = params["w_hh"].shape[0]
    dtype = inputs.dtype

    tile = min(_TILE, n)
    pad = (-n) % tile
    if pad:
        inputs = jnp.pad(inputs, ((0, pad), (0, 0), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    n_padded = n + pad

    out = pl.pallas_call(
        lambda *refs: _gru_kernel(*refs, p_steps=p, hidden=hidden),
        grid=(n_padded // tile,),
        in_specs=[
            pl.BlockSpec((tile, p, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_ih (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b_hh
        ],
        out_specs=pl.BlockSpec((tile, hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, hidden), dtype),
        interpret=interpret,
    )(inputs, lengths,
      params["w_ih"].astype(dtype), params["w_hh"].astype(dtype),
      params["b_ih"], params["b_hh"])
    return out[:n]
