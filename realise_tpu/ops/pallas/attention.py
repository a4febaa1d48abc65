"""Fused self-attention kernel for the S=128 BERT blocks.

The jnp path materializes the (B, H, S, S) score/prob tensors in HBM —
at B=256, 12 heads, S=128 that is ~200 MB of f32 traffic per layer. This
kernel keeps the whole attention computation for one (batch, head) pair in
VMEM: scores = q·kᵀ/√d + bias → f32 softmax → ·v, with nothing but q/k/v in
and the context out. At S=128, d=64 the working set is ~0.2 MB — far under
the ~16 MB VMEM budget — so no flash-style tiling is needed; the win is
purely eliminating HBM round-trips for the S×S intermediates.

Equivalent to the jnp path in ops/bert.py only when attention-probs dropout
is inactive; callers gate on that (ops/bert.py applies the kernel only when
``use_pallas`` and dropout is off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    # Blocks: q/k/v (S, D) for one (batch, head); bias (8, S) — the per-key
    # bias row replicated to a full f32 sublane tile (Mosaic rejects
    # singleton sublane slices on packed dtypes).
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (S, S)
    scores = scores * scale + bias_ref[:][0:1, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)  # (S, D)
    out_ref[:] = out.astype(out_ref.dtype)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: jax.Array, interpret: bool | None = None) -> jax.Array:
    """q/k/v: (B, S, H, D); bias: (B, 1, 1, S) additive mask → (B, S, H, D).

    Grid is (B, H); each program handles one head of one example entirely in
    VMEM. ``interpret`` defaults to True off-TPU so tests run anywhere.
    """
    b, s, h, d = q.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    scale = 1.0 / (d ** 0.5)

    # Mosaic wants the lane (last) dim 128-aligned; BERT's head dim is 64.
    # Zero-pad D → 128: zeros add nothing to q·kᵀ, and the padded output
    # columns are sliced off below.
    d_pad = (-d) % 128
    if d_pad:
        pad = [(0, 0)] * 3 + [(0, d_pad)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    dp = d + d_pad

    # (B, S, H, D) → (B, H, S, D) so a (batch, head) block is contiguous.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # (B, 8, S) f32: replicate the per-key bias row across a full sublane
    # tile so every block dim is tile-aligned.
    bias2 = jnp.broadcast_to(bias.reshape(b, 1, s).astype(jnp.float32),
                             (b, 8, s))

    qkv_spec = pl.BlockSpec((1, 1, s, dp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 8, s), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        _attention_kernel(
            q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0], b_ref.at[0],
            o_ref.at[0, 0], scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=pl.BlockSpec((1, 1, s, dp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s, dp), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, bias2)
    return out.transpose(0, 2, 1, 3)[..., :d]
