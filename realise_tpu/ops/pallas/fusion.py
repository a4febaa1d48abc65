"""Fused selective-gate kernel.

One pass over the three modality streams in VMEM: per-stream gate matmuls
(the split-weight form of Linear(concat(...)), see ops/fusion.py), sigmoid /
softmax gating, and the gated sum — the concat buffer and the per-stream
gate intermediates never reach HBM. Grid is over the batch axis.

Forward-only (serving); the jnp path in ops/fusion.py is the differentiable
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_kernel(s0_ref, s1_ref, s2_ref, pooled_ref, w_ref, b_ref, out_ref,
                 *, softmax_gate: bool, hidden: int):
    s0 = s0_ref[0]                       # (S, H)
    s1 = s1_ref[0]
    s2 = s2_ref[0]
    pooled = pooled_ref[0][0:1, :].astype(s0.dtype)  # (1, H) from the tile
    w = w_ref[:]                         # (4H, 3)

    logits = (
        jnp.dot(s0, w[:hidden], preferred_element_type=jnp.float32)
        + jnp.dot(s1, w[hidden : 2 * hidden], preferred_element_type=jnp.float32)
        + jnp.dot(s2, w[2 * hidden : 3 * hidden], preferred_element_type=jnp.float32)
        + jnp.dot(pooled, w[3 * hidden :], preferred_element_type=jnp.float32)
        + b_ref[:].astype(jnp.float32)
    )                                    # (S, 3)
    if softmax_gate:
        gates = jax.nn.softmax(logits, axis=-1)
    else:
        gates = jax.nn.sigmoid(logits)
    gates = gates.astype(s0.dtype)
    out_ref[0] = (gates[:, 0:1] * s0 + gates[:, 1:2] * s1
                  + gates[:, 2:3] * s2)


def fused_gate_fusion(params, streams, attention_mask, softmax_gate=False,
                      interpret: bool | None = None):
    """streams: [sem, pho, res] each (B, S, H); → fused (B, S, H)."""
    from realise_tpu.ops.fusion import masked_mean_pool

    if len(streams) != 3:
        # The kernel is specialized to the 3-stream flagship; fall back.
        from realise_tpu.ops.fusion import gate_fusion

        return gate_fusion(params, streams, attention_mask,
                           softmax_gate=softmax_gate, use_pallas=False)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    sem, pho, res = streams
    b, s, h = sem.shape
    # (B, 8, H) f32: replicate across a sublane tile (Mosaic rejects
    # singleton sublane slices on packed dtypes).
    pooled = masked_mean_pool(sem, attention_mask).astype(jnp.float32)
    pooled = jnp.broadcast_to(pooled[:, None, :], (b, 8, h))

    stream_spec = pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        lambda *refs: _gate_kernel(*refs, softmax_gate=softmax_gate, hidden=h),
        grid=(b,),
        in_specs=[
            stream_spec, stream_spec, stream_spec,
            pl.BlockSpec((1, 8, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # gate weight
            pl.BlockSpec(memory_space=pltpu.VMEM),     # gate bias
        ],
        out_specs=stream_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, h), sem.dtype),
        interpret=interpret,
    )(sem, pho, res, pooled,
      params["gate_net"]["kernel"].astype(sem.dtype),
      params["gate_net"]["bias"])
    return out
