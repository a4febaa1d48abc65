"""Fused BERT-block Pallas kernels: attention block + FFN block.

These replace the whole attention sub-block (q/k/v projections → per-head
softmax attention → output projection → residual LayerNorm) and the whole
FFN sub-block (intermediate → exact gelu → output → residual LayerNorm)
with ONE kernel each, gridded over the batch. Measured on v5e at B=256,
S=128, H=768 (bf16): attention block 2.17 ms vs 2.96 ms XLA (1.37×), FFN
block 2.89 ms vs 3.67 ms XLA (1.27×).

Why they win where a bare attention kernel loses: XLA materializes q, k, v,
ctx, the FFN intermediate and every LN input in HBM between its fusions —
~2 GB/layer of traffic at this shape. Fusing at block granularity keeps all
of it in VMEM: HBM sees the (B, S, H) hidden in, the weights once (their
BlockSpec index maps are grid-invariant, so Mosaic keeps them resident
across grid steps instead of re-fetching), and the hidden out. A bare
attention kernel (round 1) had to pad head_dim 64→128 and transpose to
(B, H, S, D) in HBM first, spending more bandwidth than it saved; the block
kernels consume the natural (B, S, H·D) dense-layer layout directly and
slice heads as static 64-lane windows in VMEM.

Numerics match the jnp path's mixed-precision rules (ops/layers.py): matmul
outputs round to the activation dtype, softmax/LN run in f32. The exact
erf-gelu is an Abramowitz–Stegun 7.1.26 polynomial (|err| ≤ 1.5e-7 — far
below bf16 resolution) because Mosaic has no erf lowering.

Forward-only (no custom VJP): the training path keeps the jnp
implementation, exactly as ops/bert.py gates it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    # Abramowitz–Stegun 7.1.26 polynomial erf, |err| <= 1.5e-7 in f32.
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _ln(h32, g_row, b_row, eps):
    mu = h32.mean(axis=-1, keepdims=True)
    var = ((h32 - mu) ** 2).mean(axis=-1, keepdims=True)
    return (h32 - mu) * jax.lax.rsqrt(var + eps) * g_row + b_row


def _row(p, dtype=jnp.float32):
    return p.reshape(1, -1).astype(dtype)


def _default_interpret():
    return jax.default_backend() != "tpu"


def attention_block(x: jax.Array, attn_params, bias: jax.Array,
                    num_heads: int, eps: float = 1e-12,
                    block_b: int | None = None,
                    interpret: bool | None = None) -> jax.Array:
    """Fused q/k/v proj → attention → out proj → residual LN.

    x: (B, S, H); attn_params: the layer's ``attention`` dict
    (query/key/value/output dense params + layer_norm); bias: (B, 1, 1, S)
    additive mask. Equals ops/bert.py:_self_attention with dropout inactive.

    ``block_b`` examples are folded into each grid step: the q/k/v/out
    projections run as (block_b·S, H) matmuls (better MXU shapes, fewer
    grid steps — bit-identical output; auto: the largest of {4, 2, 1}
    dividing B that keeps the working set inside VMEM).
    """
    b, s, hdim = x.shape
    hd = hdim // num_heads
    scale = 1.0 / (hd ** 0.5)
    if interpret is None:
        interpret = _default_interpret()
    if block_b is None:
        itemsize = jnp.dtype(x.dtype).itemsize  # f32 activations need 2x
        for cand in (4, 2, 1):
            # qkv+ctx+scores working set ≈ cand·(5 bufs · S·H·isz + S²·4B)
            if (b % cand == 0
                    and cand * (5 * s * hdim * itemsize + s * s * 4) < 6e6):
                block_b = cand
                break
        else:
            block_b = 1
    dtype = x.dtype
    wcast = lambda p: p["kernel"].astype(dtype)
    bias2 = jnp.broadcast_to(bias.reshape(b, 1, s).astype(jnp.float32),
                             (b, 8, s))

    def kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wo_ref, bo_ref, g_ref, be_ref, bias_ref, o_ref):
        xf = x_ref[:].reshape(block_b * s, hdim)
        # Match the jnp dense rule: the MXU accumulates f32 and rounds the
        # output to the activation dtype, bias adds in that dtype
        # (ops/layers.py:37-45). Mosaic requires the f32 accumulator to be
        # explicit (bf16 preferred_element_type is rejected in-kernel).
        proj = lambda w_ref, b_ref: (
            jnp.dot(xf, w_ref[:],
                    preferred_element_type=jnp.float32).astype(dtype)
            + b_ref[:].astype(dtype))
        q = proj(wq_ref, bq_ref)
        k = proj(wk_ref, bk_ref)
        v = proj(wv_ref, bv_ref)
        ctxs = []
        for bi in range(block_b):
            rows = slice(bi * s, (bi + 1) * s)
            brow = bias_ref[bi][0:1, :]
            outs = []
            for h in range(num_heads):
                sl = slice(h * hd, (h + 1) * hd)
                scores = jax.lax.dot_general(
                    q[rows, sl], k[rows, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                probs = jax.nn.softmax(scores * scale + brow, axis=-1)
                outs.append(jnp.dot(
                    probs.astype(dtype), v[rows, sl],
                    preferred_element_type=jnp.float32).astype(dtype))
            ctxs.append(jnp.concatenate(outs, axis=-1))
        ctx = jnp.concatenate(ctxs, axis=0)
        attn = (jnp.dot(ctx, wo_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
                + bo_ref[:].astype(dtype))
        h32 = xf.astype(jnp.float32) + attn.astype(jnp.float32)
        y = _ln(h32, g_ref[:], be_ref[:], eps)
        o_ref[:] = y.reshape(block_b, s, hdim).astype(o_ref.dtype)

    xspec = pl.BlockSpec((block_b, s, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((hdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((block_b, 8, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ln = attn_params["layer_norm"]
    return pl.pallas_call(
        kernel, grid=(b // block_b,),
        in_specs=[xspec, wspec, rspec, wspec, rspec, wspec, rspec,
                  wspec, rspec, rspec, rspec, bspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, s, hdim), dtype),
        interpret=interpret,
    )(x,
      wcast(attn_params["query"]), _row(attn_params["query"]["bias"]),
      wcast(attn_params["key"]), _row(attn_params["key"]["bias"]),
      wcast(attn_params["value"]), _row(attn_params["value"]["bias"]),
      wcast(attn_params["output"]), _row(attn_params["output"]["bias"]),
      _row(ln["scale"]), _row(ln["bias"]), bias2)


def ffn_block(x: jax.Array, ffn_params, eps: float = 1e-12,
              n_splits: int | None = None,
              interpret: bool | None = None) -> jax.Array:
    """Fused intermediate → exact gelu → output → residual LN.

    ``n_splits`` partitions the intermediate dim across a second grid axis
    with f32 output accumulation in scratch — needed when the two weight
    matrices exceed the VMEM budget (auto: 1 for 2-byte activations whose
    cast weights fit, else 2).
    """
    b, s, hdim = x.shape
    isz_total = ffn_params["intermediate"]["kernel"].shape[1]
    if interpret is None:
        interpret = _default_interpret()
    dtype = x.dtype
    if n_splits is None:
        n_splits = 1 if jnp.dtype(dtype).itemsize <= 2 else 2
        if isz_total % n_splits:
            n_splits = 1
    if isz_total % n_splits:
        # The (b, n_splits) grid would silently drop the last
        # isz_total % n_splits intermediate columns from the FFN.
        raise ValueError(
            f"n_splits={n_splits} does not divide "
            f"intermediate_size={isz_total}")
    isz = isz_total // n_splits
    w1 = ffn_params["intermediate"]["kernel"].astype(dtype)
    w2 = ffn_params["output"]["kernel"].astype(dtype)
    ln = ffn_params["layer_norm"]

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
               o_ref, acc_ref):
        j = pl.program_id(1)
        x2 = x_ref[0]
        inter = (jnp.dot(x2, w1_ref[:],
                         preferred_element_type=jnp.float32).astype(x2.dtype)
                 + b1_ref[:].astype(x2.dtype))
        inter = _gelu_exact(inter.astype(jnp.float32)).astype(x2.dtype)
        part = jnp.dot(inter, w2_ref[:], preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = (x2.astype(jnp.float32)
                          + b2_ref[:].astype(jnp.float32))

        acc_ref[:] += part

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            o_ref[0] = _ln(acc_ref[:], g_ref[:], be_ref[:],
                           eps).astype(o_ref.dtype)

    xspec = pl.BlockSpec((1, s, hdim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    w1spec = pl.BlockSpec((hdim, isz), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    b1spec = pl.BlockSpec((1, isz), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((isz, hdim), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, hdim), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(b, n_splits),
        in_specs=[xspec, w1spec, b1spec, w2spec, rspec, rspec, rspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, s, hdim), dtype),
        scratch_shapes=[pltpu.VMEM((s, hdim), jnp.float32)],
        interpret=interpret,
    )(x, w1, _row(ffn_params["intermediate"]["bias"]), w2,
      _row(ffn_params["output"]["bias"]), _row(ln["scale"]),
      _row(ln["bias"]))
