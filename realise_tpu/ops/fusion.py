"""Selective-modality fusion.

The published ReaLiSe fusion (reference: src/models.py:689,840-850): for each
token, a gate network reads concat(sem, pho, res, mean-pooled-sem) → 3 logits;
each stream is scaled by its own sigmoid gate and the gated streams are
summed. Arch4 replaces the independent sigmoids with a softmax over the three
logits (src/models.py:1144-1148). The ablation model also supports a plain
sum (src/models_abla.py:246-279), and the earlier architectures use
concat+linear integration (src/models.py:228-233) — all provided here.

The mean-pool respects the padding mask (src/models.py:840-841).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from realise_tpu.ops.layers import dense, init_dense


def masked_mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """(B, S, H), (B, S) → (B, H): mean over valid positions, f32 accumulate."""
    m = mask.astype(jnp.float32)[..., None]
    total = (hidden.astype(jnp.float32) * m).sum(axis=1)
    count = m.sum(axis=1)
    return (total / jnp.maximum(count, 1.0)).astype(hidden.dtype)


def init_gate_fusion(key, hidden_size: int, num_streams: int = 3, stddev: float = 0.02):
    """gate_net: Linear((num_streams+1)·H → num_streams) (src/models.py:689;
    the ablation model sizes it dynamically, src/models_abla.py)."""
    return {"gate_net": init_dense(key, (num_streams + 1) * hidden_size, num_streams, stddev)}


def gate_fusion(
    params,
    streams: List[jax.Array],
    attention_mask: jax.Array,
    softmax_gate: bool = False,
    return_gates: bool = False,
):
    """Fuse N streams with per-token gates conditioned on all streams +
    the mean-pooled semantic stream (streams[0]).

    Stays jnp: the split-matmul formulation below already avoids the
    (B, S, (N+1)*H) concat in HBM, and a Pallas version measured slower
    (1.28 vs 1.06 ms at B=256 on v5e — round 2), so it was retired.
    """
    sem = streams[0]
    pooled = masked_mean_pool(sem, attention_mask)
    pooled = jnp.broadcast_to(pooled[:, None, :], sem.shape)
    # Split the gate matmul per stream instead of materializing the
    # (B, S, (N+1)·H) concat — same math as Linear(concat(...)) with the
    # weight rows partitioned, but the concat buffer never exists in HBM.
    h = sem.shape[-1]
    w = params["gate_net"]["kernel"]
    pieces = streams + [pooled]
    logits = params["gate_net"]["bias"].astype(sem.dtype)
    for i, piece in enumerate(pieces):
        w_i = w[i * h : (i + 1) * h].astype(piece.dtype)
        logits = logits + jnp.matmul(piece, w_i,
                                     preferred_element_type=piece.dtype)
    if softmax_gate:
        gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(sem.dtype)
    else:
        gates = jax.nn.sigmoid(logits)
    fused = sum(gates[..., i : i + 1] * s for i, s in enumerate(streams))
    if return_gates:
        return fused, gates
    return fused


def init_concat_fusion(key, hidden_size: int, num_streams: int, stddev: float = 0.02):
    """Concat+linear integration (src/models.py:228-233 'integrate',
    arch2's 3-way concat src/models.py:513-649)."""
    return {"integrate": init_dense(key, num_streams * hidden_size, hidden_size, stddev)}


def concat_fusion(params, streams: List[jax.Array]) -> jax.Array:
    return dense(params["integrate"], jnp.concatenate(streams, axis=-1))


def sum_fusion(streams: List[jax.Array]) -> jax.Array:
    out = streams[0]
    for s in streams[1:]:
        out = out + s
    return out
