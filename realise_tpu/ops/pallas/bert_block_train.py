"""Differentiable fused BERT-block Pallas kernels (training path).

The serving kernels (ops/pallas/bert_block.py) are forward-only; this module
makes the same block-granularity fusion differentiable so ``--use_pallas``
accelerates *training*:

* **Forward** kernels compute the identical math plus the two semantics the
  training path needs — in-kernel dropout and the pre-LN residual ``z``
  saved for backward (reference dropout sites: attention probs and hidden
  outputs, transformers/modeling_bert.py:239-263,346-369).
* **Backward** kernels fuse the whole sub-block VJP: LayerNorm backward,
  dropout-mask replay, in-VMEM recompute of q/k/v/probs (attention) or the
  FFN intermediate, and all weight/bias gradients. Weight grads accumulate
  across the batch grid in grid-invariant f32 output blocks (initialized at
  step 0, ``+=`` after — the TPU grid is sequential).

Why this beats ``jax.checkpoint`` + XLA backward: remat re-runs the whole
forward a second time and still spills every intermediate (q/k/v, probs,
the FFN intermediate, LN inputs) to HBM between XLA fusions in both the
re-forward and the backward. Here the residuals are just the block input
``x`` (attention) or ``(x, z)`` (FFN, whose split-intermediate backward
needs the pre-LN sum) — remat-level memory — and the backward recompute
never leaves VMEM, with fewer matmul FLOPs than remat (no LN re-forward,
no second out-projection for the FFN).

**Dropout masks** come from a counter-based hash (murmur3 finalizer over
the element index), not the hardware PRNG: the same (seed, site, example,
element) always yields the same bit, so the backward replays the forward's
masks exactly, on any backend (compiled TPU and CPU interpret mode agree
bit-for-bit — ``pltpu.prng_*`` has no interpret-mode lowering). Masks never
touch HBM. The stream differs from ``jax.random.bernoulli``'s, which is
fine: dropout only needs the right marginal rate and independence, not a
particular stream (the reference's torch masks differ from jax's too).

Numerics elsewhere match the jnp path's mixed-precision rules: matmuls
accumulate f32 and round to the activation dtype, softmax/LN/mask-scale run
in f32, weight grads accumulate f32 (params are f32).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realise_tpu.ops.pallas.bert_block import (
    _default_interpret,
    _erf,
    _gelu_exact,
    _ln,
    _row,
)

_INV_SQRT2PI = 0.3989422804014327

# The backward kernels' working set (weights + f32 weight-grad accumulators
# + activations) slightly exceeds XLA's default 16 MB scoped-VMEM cap at
# H=768. The cap is a compiler default, not the physical VMEM size — raise
# it for these kernels; inputs stream at ~1 MB/step so double-buffering
# headroom is unaffected.
_TRAIN_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _train_block_b(b: int, per_ex_bytes: int, budget: int = 24 * 2**20,
                   cap: int = 4) -> int:
    """Examples folded into one grid step (the serving kernels' block_b,
    bert_block.py:78-93): the projections and FFN matmuls then run at
    (block_b·S, H) instead of (S, H). Swept on v5e at the production
    shape (B=256, S=128, H=768): the round-4 sweep picked cap=2 (attn
    f+b 4.88 ms at 2 vs 5.76 at an earlier 4-cap build); re-swept round 5
    after the conv stream shrank, cap=4 wins end-to-end — train 798.1 →
    804.9 sent/s with REALISE_TPU_DROPOUT_SAMPLES=2 (bit-exact per
    example either way: masks and row contractions are block_b-
    independent). Largest power of two dividing ``b`` whose per-example
    working set fits the budget. REALISE_TPU_TRAIN_BB_CAP overrides the
    cap for on-device sweeps (tools/bench_kernels.py)."""
    cap = int(os.environ.get("REALISE_TPU_TRAIN_BB_CAP", cap))
    for cand in (cap, cap // 2, cap // 4, 4, 2, 1):
        if cand >= 1 and b % cand == 0 and cand * per_ex_bytes <= budget:
            return cand
    return 1


def _gelu_grad(t32):
    # d/dt [t * Phi(t)] = Phi(t) + t * phi(t), exact-erf convention.
    phi = _INV_SQRT2PI * jnp.exp(-0.5 * t32 * t32)
    cdf = 0.5 * (1.0 + _erf(t32 * 0.7071067811865476))
    return cdf + t32 * phi


# --------------------------------------------------------------------------
# Counter-based dropout masks (identical forward and backward)
# --------------------------------------------------------------------------
def _mix(h):
    """murmur3 fmix32: bijective avalanche over uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _site_base(seed, site: int, example, head: int = 0):
    """uint32 stream id for one (seed, dropout site, example, head)."""
    s = seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    s = s + jnp.uint32(site) * jnp.uint32(0x85EBCA6B)
    s = s + example.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    s = s + jnp.uint32(head) * jnp.uint32(0x27D4EB2F)
    return _mix(s)


# Bernoulli samples drawn per 32-bit hash. '1': 24-bit threshold, one
# sample per hash — the round-2 stream. '2' (default since round 5): two
# independent 16-bit samples per hash (left column half = low bits, right
# = high), halving the mask-hash VPU work where cols % 256 == 0 (the
# production hidden/FFN sites; S=128 probs masks stay on the '1' path).
# Keep-probability granularity 2^-16 (|realized − requested| ≤ 2e-5 at
# keep=0.9). Both streams replay bit-identically forward/backward. The
# round-3 measurement was a wash (678.3 vs 675.9 sent/s — conv-dominated
# step); re-measured round 5 after the conv stream shrank it wins with
# the cap-4 block_b: 798.1 → 804.9 sent/s combined, reproduced twice.
# The committed golden trajectories run tiny widths (cols % 256 != 0
# everywhere), so they pin the SAME masks under either default.
def _samples_per_hash() -> int:
    return int(os.environ.get("REALISE_TPU_DROPOUT_SAMPLES", "2"))


def _keep_mask(base, rows: int, cols: int, keep: float):
    """(rows, cols) f32 mask of {0, 1/keep} — dropout multiplier.

    Stream id (``base``) and element index mix in separate rounds
    (``_mix(base ^ _mix(idx))``): with the earlier single-round
    ``_mix(base + idx)``, two sites whose bases differed by less than
    rows·cols shared a shifted run of identical bits; scrambling the
    index first leaves only pointwise birthday collisions."""
    if _samples_per_hash() == 2 and cols % 256 == 0:
        # cols % 256: each half is a whole number of 128-lane vregs, so the
        # lane-concat is pure vreg placement. Concat f32 masks, not bools —
        # Mosaic cannot bitcast i1 vregs (measured: 'Invalid vector register
        # cast' on vector<8x128xi1>).
        half = cols // 2
        r = jax.lax.broadcasted_iota(jnp.uint32, (rows, half), 0)
        c = jax.lax.broadcasted_iota(jnp.uint32, (rows, half), 1)
        bits = _mix(base ^ _mix(r * jnp.uint32(half) + c))
        thresh = jnp.uint32(min(int(keep * (1 << 16)), (1 << 16)))
        scale = jnp.float32(1.0 / keep)
        return jnp.concatenate(
            [((bits & jnp.uint32(0xFFFF)) < thresh).astype(jnp.float32),
             ((bits >> 16) < thresh).astype(jnp.float32)], axis=1) * scale
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, (rows, cols), 1)
    bits = _mix(base ^ _mix(r * jnp.uint32(cols) + c))
    thresh = jnp.uint32(min(int(keep * (1 << 24)), (1 << 24)))
    return ((bits >> 8) < thresh).astype(jnp.float32) * (1.0 / keep)


# --------------------------------------------------------------------------
# Attention block (train): forward with dropout + saved z, fused backward
# --------------------------------------------------------------------------
# Dropout site ids (arbitrary but stable; must differ across sites).
_SITE_PROBS = 1
_SITE_ATTN_OUT = 2
_SITE_FFN_OUT = 3


def _attn_heads_fwd(q, k, v, brow, num_heads, scale, seed, ex, p_rate):
    """Per-head probs (+dropout) and context for ONE example.

    q/k/v: (S, H) activation dtype. Returns ctx (S, H).
    """
    s, hdim = q.shape
    hd = hdim // num_heads
    dtype = q.dtype
    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * scale + brow, axis=-1)
        if p_rate > 0.0:
            base = _site_base(seed, _SITE_PROBS, ex, head=h)
            probs = probs * _keep_mask(base, s, s, 1.0 - p_rate)
        outs.append(jnp.dot(probs.astype(dtype), v[:, sl],
                            preferred_element_type=jnp.float32).astype(dtype))
    return jnp.concatenate(outs, axis=-1)


def _block_keep_mask(seed, site: int, i, block_b: int, s: int, cols: int,
                     keep: float):
    """(block_b·s, cols) dropout multiplier, one per-example stream each —
    the same masks whether the kernel processes 1 or block_b examples per
    grid step, so forward and backward replay exactly at any block_b."""
    rows = [
        _keep_mask(_site_base(seed, site, i * block_b + bi), s, cols, keep)
        for bi in range(block_b)
    ]
    return rows[0] if block_b == 1 else jnp.concatenate(rows, axis=0)


# Stream q/k/v out of the training forward (3 extra (B, S, H) bf16 writes
# per layer ≈ 151 MB at the bench shape) so the backward reads them instead
# of recomputing the three input projections (≈ 232 GFLOP/layer at B=256).
# Bit-exact either way — the recompute is the same deterministic matmul.
# Measured via bench.py before flipping the default (cf. FFN_SAVE_T1, which
# lost: its stash is 4x bigger per saved matmul).
def _save_qkv() -> bool:
    return os.environ.get("REALISE_TPU_ATTN_SAVE_QKV", "0") == "1"


# Compute q/k/v as ONE (rows, H)×(H, 3H) matmul against the concatenated
# [Wq|Wk|Wv] (and dx/dW as single (rows,3H)-wide matmuls in the backward)
# instead of three H-wide dots: same contraction per output column — the
# f32 accumulation order over k is unchanged — but a 3× wider MXU N dim
# and 6 fewer matmul dispatches per layer f+b. Opt-in for A/B sweeps.
def _fused_qkv() -> bool:
    return os.environ.get("REALISE_TPU_ATTN_FUSED_QKV", "0") == "1"


def _attn_fwd_impl(x, attn_params, bias, seed, num_heads, eps,
                   p_rate, h_rate, interpret, save_qkv=False):
    """Training forward: returns (y, qkv_or_None). Unlike the FFN block, no
    pre-LN residual is saved — the backward recomputes z from x (it has
    ctx in hand anyway, so z costs one extra out-projection matmul and
    saves a (B, S, H) residual per layer in HBM). With ``save_qkv`` the
    q/k/v projections stream out as residuals for the backward."""
    b, s, hdim = x.shape
    hd = hdim // num_heads
    scale = 1.0 / (hd ** 0.5)
    dtype = x.dtype
    fused = _fused_qkv()
    # qkv/ctx/z32 working set per example ≈ 5·S·H·2B + S·H·4B + heads' S².
    bb = _train_block_b(b, 5 * s * hdim * 2 + s * hdim * 4 + s * s * 4)
    wcast = lambda p: p["kernel"].astype(dtype)
    bias2 = jnp.broadcast_to(bias.reshape(b, 1, s).astype(jnp.float32),
                             (b, 8, s))
    ln = attn_params["layer_norm"]

    def kernel(seed_ref, x_ref, *refs):
        if fused:
            # One [Wq|Wk|Wv] / [bq|bk|bv] operand pair instead of three.
            (w3_ref, b3_ref, wo_ref, bo_ref, g_ref, be_ref,
             bias_ref), refs = refs[:7], refs[7:]
        else:
            (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
             bo_ref, g_ref, be_ref, bias_ref), refs = refs[:11], refs[11:]
        o_ref, qkv_refs = refs[0], refs[1:]
        i = pl.program_id(0)
        seed_s = seed_ref[0]
        xf = x_ref[:].reshape(bb * s, hdim)
        if fused:
            qkv3 = (jnp.dot(xf, w3_ref[:],
                            preferred_element_type=jnp.float32).astype(dtype)
                    + b3_ref[:].astype(dtype))
            q = qkv3[:, :hdim]
            k = qkv3[:, hdim:2 * hdim]
            v = qkv3[:, 2 * hdim:]
        else:
            proj = lambda w_ref, b_ref: (
                jnp.dot(xf, w_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
                + b_ref[:].astype(dtype))
            q = proj(wq_ref, bq_ref)
            k = proj(wk_ref, bk_ref)
            v = proj(wv_ref, bv_ref)
        if save_qkv:
            qkv_refs[0][:] = q.reshape(bb, s, hdim)
            qkv_refs[1][:] = k.reshape(bb, s, hdim)
            qkv_refs[2][:] = v.reshape(bb, s, hdim)
        ctxs = []
        for bi in range(bb):
            rows = slice(bi * s, (bi + 1) * s)
            ctxs.append(_attn_heads_fwd(
                q[rows], k[rows], v[rows], bias_ref[bi][0:1, :], num_heads,
                scale, seed_s, i * bb + bi, p_rate))
        ctx = ctxs[0] if bb == 1 else jnp.concatenate(ctxs, axis=0)
        # Round the out-projection (and the dropout scaling) to the
        # activation dtype before the residual — the module contract, and
        # what the jnp path and the serving kernel (bert_block.py) compute.
        attn = (jnp.dot(ctx, wo_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
                + bo_ref[:].astype(dtype))
        if h_rate > 0.0:
            keep_h = _block_keep_mask(seed_s, _SITE_ATTN_OUT, i, bb, s,
                                      hdim, 1.0 - h_rate)
            attn = (attn.astype(jnp.float32) * keep_h).astype(dtype)
        z32 = xf.astype(jnp.float32) + attn.astype(jnp.float32)
        o_ref[:] = _ln(z32, g_ref[:], be_ref[:],
                       eps).astype(o_ref.dtype).reshape(bb, s, hdim)

    xspec = pl.BlockSpec((bb, s, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((hdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w3spec = pl.BlockSpec((hdim, 3 * hdim), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    r3spec = pl.BlockSpec((1, 3 * hdim), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((bb, 8, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if fused:
        # Concatenated OUTSIDE the kernel — one XLA concat per call, not
        # one VMEM copy per grid step.
        weight_specs = [w3spec, r3spec]
        weight_ops = [
            jnp.concatenate([wcast(attn_params[n]) for n in
                             ("query", "key", "value")], axis=1),
            jnp.concatenate([_row(attn_params[n]["bias"]) for n in
                             ("query", "key", "value")], axis=1),
        ]
    else:
        weight_specs = [wspec, rspec, wspec, rspec, wspec, rspec]
        weight_ops = [
            wcast(attn_params["query"]), _row(attn_params["query"]["bias"]),
            wcast(attn_params["key"]), _row(attn_params["key"]["bias"]),
            wcast(attn_params["value"]), _row(attn_params["value"]["bias"]),
        ]
    n_out = 4 if save_qkv else 1
    out = pl.pallas_call(
        kernel, grid=(b // bb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), xspec]
                 + weight_specs + [wspec, rspec, rspec, rspec, bspec],
        out_specs=(xspec,) * n_out,
        out_shape=(jax.ShapeDtypeStruct((b, s, hdim), dtype),) * n_out,
        interpret=interpret,
        compiler_params=_TRAIN_VMEM_LIMIT,
    )(seed, x, *weight_ops,
      wcast(attn_params["output"]), _row(attn_params["output"]["bias"]),
      _row(ln["scale"]), _row(ln["bias"]), bias2)
    if save_qkv:
        return out[0], out[1:]
    return out[0], None


def _ln_bwd(z32, dy32, g_row, eps):
    """LayerNorm backward. Returns (dz, dgamma_rowsum, dbeta_rowsum)."""
    mu = z32.mean(axis=-1, keepdims=True)
    var = ((z32 - mu) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    norm = (z32 - mu) * rstd
    g = dy32 * g_row
    dz = rstd * (g - g.mean(axis=-1, keepdims=True)
                 - norm * (g * norm).mean(axis=-1, keepdims=True))
    dgamma = jnp.sum(dy32 * norm, axis=0, keepdims=True)
    dbeta = jnp.sum(dy32, axis=0, keepdims=True)
    return dz, dgamma, dbeta


def _attn_bwd_impl(x, attn_params, bias, seed, dy, num_heads, eps,
                   p_rate, h_rate, interpret, qkv=None):
    b, s, hdim = x.shape
    hd = hdim // num_heads
    scale = 1.0 / (hd ** 0.5)
    dtype = x.dtype
    with_qkv = qkv is not None
    fused = _fused_qkv()
    # x/dy/q/k/v/ctx/dctx/dq/dk/dv ≈ 10 bf16 bufs + z32/dz f32 + the
    # per-head probs/keep stash (12 heads × (S, S) f32 × 2).
    bb = _train_block_b(b, 10 * s * hdim * 2 + 2 * s * hdim * 4
                        + num_heads * s * s * (8 if p_rate > 0.0 else 4),
                        cap=4)
    wcast = lambda p: p["kernel"].astype(dtype)
    bias2 = jnp.broadcast_to(bias.reshape(b, 1, s).astype(jnp.float32),
                             (b, 8, s))
    ln = attn_params["layer_norm"]

    def kernel(seed_ref, x_ref, dy_ref, *refs):
        if fused:
            (w3_ref, b3_ref, wo_ref, bo_ref, g_ref,
             bias_ref), refs = refs[:6], refs[6:]
        else:
            (wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
             bo_ref, g_ref, bias_ref), refs = refs[:10], refs[10:]
        if with_qkv:
            (q_ref, k_ref, v_ref), refs = refs[:3], refs[3:]
        if fused:
            (dx_ref, ctx_ref, dattn_ref, dw3_ref, db3_ref, dg_ref,
             dbe_ref) = refs
            grad_refs = (dw3_ref, db3_ref, dg_ref, dbe_ref)
        else:
            (dx_ref, ctx_ref, dattn_ref, dwq_ref, dbq_ref, dwk_ref,
             dbk_ref, dwv_ref, dbv_ref, dg_ref, dbe_ref) = refs
            grad_refs = (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref,
                         dbv_ref, dg_ref, dbe_ref)
        i = pl.program_id(0)
        seed_s = seed_ref[0]

        @pl.when(i == 0)
        def _():
            for ref in grad_refs:
                ref[:] = jnp.zeros_like(ref)

        xf = x_ref[:].reshape(bb * s, hdim)
        # q/k/v: read the forward's streamed projections when available,
        # else recompute (bit-identical — same deterministic matmul).
        if with_qkv:
            q = q_ref[:].reshape(bb * s, hdim)
            k = k_ref[:].reshape(bb * s, hdim)
            v = v_ref[:].reshape(bb * s, hdim)
        elif fused:
            qkv3 = (jnp.dot(xf, w3_ref[:],
                            preferred_element_type=jnp.float32).astype(dtype)
                    + b3_ref[:].astype(dtype))
            q = qkv3[:, :hdim]
            k = qkv3[:, hdim:2 * hdim]
            v = qkv3[:, 2 * hdim:]
        else:
            proj = lambda w_ref, b_ref: (
                jnp.dot(xf, w_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
                + b_ref[:].astype(dtype))
            q = proj(wq_ref, bq_ref)
            k = proj(wk_ref, bk_ref)
            v = proj(wv_ref, bv_ref)
        # ONE scores/softmax/dropout-hash pass per (example, head): the f32
        # probs and keep masks are stashed in VMEM and reused by the grad
        # loop below — the values are bit-identical to a recompute, and the
        # hash + exp are the kernel's dominant VPU cost (measured 0.8
        # ms/layer f+b at rate 0.1 vs 0.0, tools/bench_kernels.py).
        probs_all, keep_all, ctxs = [], [], []
        for bi in range(bb):
            rows = slice(bi * s, (bi + 1) * s)
            brow = bias_ref[bi][0:1, :]
            outs = []
            for h in range(num_heads):
                sl = slice(h * hd, (h + 1) * hd)
                scores = jax.lax.dot_general(
                    q[rows, sl], k[rows, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                probs = jax.nn.softmax(scores * scale + brow, axis=-1)
                if p_rate > 0.0:
                    base = _site_base(seed_s, _SITE_PROBS, i * bb + bi,
                                      head=h)
                    keep = _keep_mask(base, s, s, 1.0 - p_rate)
                    probs_d = probs * keep
                else:
                    keep = None
                    probs_d = probs
                probs_all.append(probs)
                keep_all.append(keep)
                outs.append(jnp.dot(
                    probs_d.astype(dtype), v[rows, sl],
                    preferred_element_type=jnp.float32).astype(dtype))
            ctxs.append(jnp.concatenate(outs, axis=-1))
        ctx = ctxs[0] if bb == 1 else jnp.concatenate(ctxs, axis=0)
        ctx_ref[:] = ctx.reshape(bb, s, hdim)
        # Same rounding as the forward (activation dtype at the out-proj
        # and after dropout) so the recomputed z32 is bit-identical.
        attn = (jnp.dot(ctx, wo_ref[:],
                        preferred_element_type=jnp.float32).astype(dtype)
                + bo_ref[:].astype(dtype))
        if h_rate > 0.0:
            keep_h = _block_keep_mask(seed_s, _SITE_ATTN_OUT, i, bb, s,
                                      hdim, 1.0 - h_rate)
            attn = (attn.astype(jnp.float32) * keep_h).astype(dtype)
        z32 = xf.astype(jnp.float32) + attn.astype(jnp.float32)

        dy32 = dy_ref[:].reshape(bb * s, hdim).astype(jnp.float32)
        dz, dgamma, dbeta = _ln_bwd(z32, dy32, g_ref[:], eps)
        dg_ref[:] += dgamma
        dbe_ref[:] += dbeta

        dattn = dz
        if h_rate > 0.0:
            dattn = dattn * keep_h
        dattn_lo = dattn.astype(dtype)
        # ctx and dattn stream out; dWo = ctxᵀ·dattn and dbo = Σdattn run as
        # ONE batched XLA matmul/reduce outside — an f32 (H, H) dWo
        # accumulator plus Wo's grad buffer in here would tip the kernel
        # over the scoped-VMEM budget at H=768.
        dattn_ref[:] = dattn_lo.reshape(bb, s, hdim)

        # dattn · Woᵀ without materializing the transpose in VMEM.
        dctx = jax.lax.dot_general(
            dattn_lo, wo_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

        dq_parts, dk_parts, dv_parts = [], [], []
        for bi in range(bb):
            rows = slice(bi * s, (bi + 1) * s)
            for h in range(num_heads):
                sl = slice(h * hd, (h + 1) * hd)
                probs = probs_all[bi * num_heads + h]
                keep = keep_all[bi * num_heads + h]
                probs_d = probs * keep if keep is not None else probs
                # dv = P_dropᵀ · dctx
                dv_parts.append(jax.lax.dot_general(
                    probs_d.astype(dtype), dctx[rows, sl],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype))
                # dP_drop = dctx · vᵀ ; replay dropout; softmax backward
                dpd = jax.lax.dot_general(
                    dctx[rows, sl], v[rows, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = dpd * keep if keep is not None else dpd
                ds = probs * (dp - jnp.sum(dp * probs, axis=-1,
                                           keepdims=True))
                ds = (ds * scale).astype(dtype)
                dq_parts.append(jnp.dot(
                    ds, k[rows, sl],
                    preferred_element_type=jnp.float32).astype(dtype))
                dk_parts.append(jax.lax.dot_general(
                    ds, q[rows, sl], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype))

        def cat(parts):
            # parts: bb × num_heads of (s, hd) → (bb·s, hdim).
            per_ex = [jnp.concatenate(parts[bi * num_heads:
                                            (bi + 1) * num_heads], axis=-1)
                      for bi in range(bb)]
            return per_ex[0] if bb == 1 else jnp.concatenate(per_ex, axis=0)

        dq = cat(dq_parts)
        dk = cat(dk_parts)
        dv = cat(dv_parts)

        gw = lambda dout: jax.lax.dot_general(
            xf, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dproj = lambda d, w_ref: jax.lax.dot_general(
            d, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if fused:
            dqkv = jnp.concatenate([dq, dk, dv], axis=1)
            dw3_ref[:] += gw(dqkv)
            db3_ref[:] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                  keepdims=True)
            dx = dz + dproj(dqkv, w3_ref)
        else:
            dwq_ref[:] += gw(dq)
            dwk_ref[:] += gw(dk)
            dwv_ref[:] += gw(dv)
            dbq_ref[:] += jnp.sum(dq.astype(jnp.float32), axis=0,
                                  keepdims=True)
            dbk_ref[:] += jnp.sum(dk.astype(jnp.float32), axis=0,
                                  keepdims=True)
            dbv_ref[:] += jnp.sum(dv.astype(jnp.float32), axis=0,
                                  keepdims=True)
            dx = (dz + dproj(dq, wq_ref) + dproj(dk, wk_ref)
                  + dproj(dv, wv_ref))
        dx_ref[:] = dx.astype(dx_ref.dtype).reshape(bb, s, hdim)

    xspec = pl.BlockSpec((bb, s, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((hdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w3spec = pl.BlockSpec((hdim, 3 * hdim), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    r3spec = pl.BlockSpec((1, 3 * hdim), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((bb, 8, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    if fused:
        weight_specs = [w3spec, r3spec]
        weight_ops = [
            jnp.concatenate([wcast(attn_params[n]) for n in
                             ("query", "key", "value")], axis=1),
            jnp.concatenate([_row(attn_params[n]["bias"]) for n in
                             ("query", "key", "value")], axis=1),
        ]
        grad_specs = (w3spec, r3spec)
        grad_shapes = (jax.ShapeDtypeStruct((hdim, 3 * hdim), f32),
                       jax.ShapeDtypeStruct((1, 3 * hdim), f32))
    else:
        weight_specs = [wspec, rspec, wspec, rspec, wspec, rspec]
        weight_ops = [
            wcast(attn_params["query"]), _row(attn_params["query"]["bias"]),
            wcast(attn_params["key"]), _row(attn_params["key"]["bias"]),
            wcast(attn_params["value"]), _row(attn_params["value"]["bias"]),
        ]
        grad_specs = (wspec, rspec, wspec, rspec, wspec, rspec)
        grad_shapes = (jax.ShapeDtypeStruct((hdim, hdim), f32),
                       jax.ShapeDtypeStruct((1, hdim), f32)) * 3
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), xspec, xspec] \
        + weight_specs + [wspec, rspec, rspec, bspec]
    operands = [seed, x, dy] + weight_ops + [
        wcast(attn_params["output"]), _row(attn_params["output"]["bias"]),
        _row(ln["scale"]), bias2]
    if with_qkv:
        in_specs += [xspec, xspec, xspec]
        operands += list(qkv)
    out = pl.pallas_call(
        kernel, grid=(b // bb,),
        in_specs=in_specs,
        out_specs=(xspec, xspec, xspec) + grad_specs + (rspec, rspec),
        out_shape=(jax.ShapeDtypeStruct((b, s, hdim), dtype),
                   jax.ShapeDtypeStruct((b, s, hdim), dtype),
                   jax.ShapeDtypeStruct((b, s, hdim), dtype))
                  + grad_shapes
                  + (jax.ShapeDtypeStruct((1, hdim), f32),
                     jax.ShapeDtypeStruct((1, hdim), f32)),
        interpret=interpret,
        compiler_params=_TRAIN_VMEM_LIMIT,
    )(*operands)
    if fused:
        (dx, ctx, dattn, dw3, db3, dg, dbe) = out
        dwq, dwk, dwv = (dw3[:, :hdim], dw3[:, hdim:2 * hdim],
                         dw3[:, 2 * hdim:])
        dbq, dbk, dbv = (db3[:, :hdim], db3[:, hdim:2 * hdim],
                         db3[:, 2 * hdim:])
    else:
        (dx, ctx, dattn, dwq, dbq, dwk, dbk, dwv, dbv, dg, dbe) = out
    # The out-projection grads from the streamed ctx/dattn — one batched
    # XLA matmul, exactly the math the kernel would have accumulated.
    dwo = jax.lax.dot_general(
        ctx.reshape(b * s, hdim), dattn.reshape(b * s, hdim),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    dbo = jnp.sum(dattn.astype(f32), axis=(0, 1))[None, :]
    pd = jnp.dtype(attn_params["query"]["kernel"].dtype)
    dparams = {
        "query": {"kernel": dwq.astype(pd), "bias": dbq[0].astype(pd)},
        "key": {"kernel": dwk.astype(pd), "bias": dbk[0].astype(pd)},
        "value": {"kernel": dwv.astype(pd), "bias": dbv[0].astype(pd)},
        "output": {"kernel": dwo.astype(pd), "bias": dbo[0].astype(pd)},
        "layer_norm": {"scale": dg[0].astype(pd), "bias": dbe[0].astype(pd)},
    }
    return dx, dparams


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def attention_block_train(x, attn_params, bias, seed, num_heads,
                          eps=1e-12, p_rate=0.0, h_rate=0.0,
                          interpret=None):
    """Differentiable fused attention sub-block with in-kernel dropout.

    x: (B, S, H); seed: (1,) int32 controlling the dropout streams
    (p_rate = attention-probs rate, h_rate = hidden/output rate). Matches
    ops/bert.py:_self_attention up to the dropout bit-stream. ``bias`` is
    treated as non-differentiable attention-mask data — its cotangent is
    defined as zero (do not feed a *learned* bias through it).
    """
    if interpret is None:
        interpret = _default_interpret()
    y, _ = _attn_fwd_impl(x, attn_params, bias, seed, num_heads, eps,
                          p_rate, h_rate, interpret)
    return y


def _attn_train_fwd(x, attn_params, bias, seed, num_heads, eps, p_rate,
                    h_rate, interpret):
    if interpret is None:
        interpret = _default_interpret()
    y, qkv = _attn_fwd_impl(x, attn_params, bias, seed, num_heads, eps,
                            p_rate, h_rate, interpret,
                            save_qkv=_save_qkv())
    return y, (x, attn_params, bias, seed, qkv)


def _attn_train_bwd(num_heads, eps, p_rate, h_rate, interpret, res, dy):
    x, attn_params, bias, seed, qkv = res
    if interpret is None:
        interpret = _default_interpret()
    dx, dparams = _attn_bwd_impl(x, attn_params, bias, seed, dy,
                                 num_heads, eps, p_rate, h_rate, interpret,
                                 qkv=qkv)
    # Cotangent dtype must equal the primal's (bf16 bias → bf16 zeros);
    # jax's custom_vjp dtype check only tolerates f32-for-bf16 via a
    # deprecated escape hatch.
    dbias = jnp.zeros_like(bias) \
        if jnp.issubdtype(bias.dtype, jnp.floating) \
        else np.zeros(bias.shape, dtype=jax.dtypes.float0)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dx, dparams, dbias, dseed


attention_block_train.defvjp(_attn_train_fwd, _attn_train_bwd)


# --------------------------------------------------------------------------
# FFN block (train)
# --------------------------------------------------------------------------
def _ffn_splits(hdim: int, isz: int, itemsize: int) -> int:
    """Smallest split count keeping one split's weights + f32 weight-grads
    within the scoped-vmem budget. The binding constraint is NOT the Mosaic
    kernel (whose vmem_limit is raised to 48 MB) but XLA's *own* scoped-vmem
    cap on the fusion wrapping the pallas_call: the f32 dw1/dw2 outputs
    count against it. The default cap (~16 MB) forced n=3 splits that
    re-read x/z/dy from HBM per split (~0.9 GB/step extra, measured ~42%
    train MFU); the Trainer now raises the cap per-compile via
    jax.jit(compiler_options={"xla_tpu_scoped_vmem_limit_kib": ...})
    (ops/pallas.tpu_compiler_options — XLA_FLAGS rejects the flag
    client-side, but PJRT compile options accept it), so H=768/I=3072
    fits n=1: ONE kernel per layer backward, x/z/dy read once."""
    per_col_bytes = 2 * hdim * (itemsize + 4)  # w1_j+w2_j, dw1_j+dw2_j
    budget = 44 * 1024 * 1024
    best = None
    for n in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        if isz % n == 0:
            best = n
            if per_col_bytes * (isz // n) <= budget:
                return n
    if best is None:
        raise ValueError(
            f"intermediate_size {isz} has no split count in 1..32 that "
            f"divides it — the fused FFN train kernels require one")
    # The largest available divisor still busts the budget: the kernel
    # would fail to compile ("exceeded scoped vmem limit") mid-training.
    # Refuse up front so callers (Trainer falls back to jnp) see a clear
    # signal instead of a Mosaic compile error.
    raise ValueError(
        f"fused FFN train kernel cannot fit hidden={hdim}/"
        f"intermediate={isz}: best split n={best} needs "
        f"{per_col_bytes * (isz // best) / 2**20:.1f} MB of scoped vmem "
        f"(budget 12 MB); use the jnp path for this config")


def _ffn_fwd_splits(hdim: int, isz: int, itemsize: int) -> int:
    """Forward-only split count: no f32 weight-grad accumulators exist in
    the forward kernel, so the budget is the two weight matrices alone
    (ffn_block's rule) — at H=768/I=3072 bf16 this is n=1, keeping W1/W2
    VMEM-resident across the batch grid instead of re-streaming ~9.4 MB
    per example (measured: the fwd kernel was bandwidth-bound on weight
    re-fetch when it reused the backward's 3-way split)."""
    for n in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        if isz % n == 0 and 2 * hdim * itemsize * (isz // n) <= 12 * 2**20:
            return n
    return _ffn_splits(hdim, isz, itemsize)


# Save the pre-gelu FFN intermediate t1 (bf16, (B, S, I) per layer) in the
# forward and skip its recompute matmul in the backward. Trades ~200 MB of
# HBM per layer at the bench shape for one (rows, H)x(H, I) matmul per
# layer-backward; measured via bench.py before enabling by default.
def _save_t1() -> bool:
    return os.environ.get("REALISE_TPU_FFN_SAVE_T1", "0") == "1"


def _ffn_fwd_impl(x, ffn_params, seed, eps, h_rate, interpret):
    b, s, hdim = x.shape
    isz_total = ffn_params["intermediate"]["kernel"].shape[1]
    dtype = x.dtype
    n_splits = _ffn_fwd_splits(hdim, isz_total, jnp.dtype(dtype).itemsize)
    isz = isz_total // n_splits
    # x/z/y bufs + f32 acc + the (rows, isz) intermediate (f32 + bf16).
    bb = _train_block_b(b, 3 * s * hdim * 2 + s * hdim * 4
                        + s * isz * (4 + 2) // n_splits)
    w1 = ffn_params["intermediate"]["kernel"].astype(dtype)
    w2 = ffn_params["output"]["kernel"].astype(dtype)
    ln = ffn_params["layer_norm"]

    save_t1 = _save_t1()

    def kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
               be_ref, o_ref, z_ref, *t1_refs):
        i = pl.program_id(0)
        j = pl.program_id(1)
        acc_ref = t1_refs[-1]
        x2 = x_ref[:].reshape(bb * s, hdim)
        t1 = (jnp.dot(x2, w1_ref[:],
                      preferred_element_type=jnp.float32).astype(dtype)
              + b1_ref[:].astype(dtype))
        if save_t1:
            t1_refs[0][:] = t1.reshape(bb, s, isz)
        inter = _gelu_exact(t1.astype(jnp.float32)).astype(dtype)
        part = jnp.dot(inter, w2_ref[:], preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = part

        @pl.when(j > 0)
        def _():
            acc_ref[:] += part

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out = acc_ref[:] + b2_ref[:].astype(jnp.float32)
            if h_rate > 0.0:
                out = out * _block_keep_mask(seed_ref[0], _SITE_FFN_OUT, i,
                                             bb, s, hdim, 1.0 - h_rate)
            z32 = x2.astype(jnp.float32) + out
            z_ref[:] = z32.astype(z_ref.dtype).reshape(bb, s, hdim)
            o_ref[:] = _ln(z32, g_ref[:], be_ref[:],
                           eps).astype(o_ref.dtype).reshape(bb, s, hdim)

    xspec = pl.BlockSpec((bb, s, hdim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    w1spec = pl.BlockSpec((hdim, isz), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    b1spec = pl.BlockSpec((1, isz), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((isz, hdim), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, hdim), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [xspec, xspec]
    out_shape = [jax.ShapeDtypeStruct((b, s, hdim), dtype),
                 jax.ShapeDtypeStruct((b, s, hdim), dtype)]
    if save_t1:
        out_specs.append(pl.BlockSpec((bb, s, isz), lambda i, j: (i, 0, j),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, s, isz_total), dtype))
    out = pl.pallas_call(
        kernel, grid=(b // bb, n_splits),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  xspec, w1spec, b1spec, w2spec, rspec, rspec, rspec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((bb * s, hdim), jnp.float32)],
        interpret=interpret,
        compiler_params=_TRAIN_VMEM_LIMIT,
    )(seed, x, w1, _row(ffn_params["intermediate"]["bias"]), w2,
      _row(ffn_params["output"]["bias"]), _row(ln["scale"]),
      _row(ln["bias"]))
    if save_t1:
        y, z, t1 = out
        return y, z, t1
    y, z = out
    return y, z, None


def _ffn_bwd_impl(x, ffn_params, seed, z, dy, eps, h_rate, interpret,
                  t1_saved=None):
    """Backward as ``n_splits`` sequential kernels over intermediate slices.

    Each call owns one column slice of W1 / row slice of W2 so its f32
    weight-grad accumulators fit VMEM; LN backward is recomputed per call
    (cheap VPU work), the residual/db2/dγ/dβ terms are emitted by the j==0
    call only, and dx is the sum of the per-slice partials. With
    ``t1_saved`` (the forward's pre-gelu intermediate) the x·W1 recompute
    matmul is skipped entirely.
    """
    b, s, hdim = x.shape
    isz_total = ffn_params["intermediate"]["kernel"].shape[1]
    dtype = x.dtype
    n_splits = _ffn_splits(hdim, isz_total, jnp.dtype(dtype).itemsize)
    isz = isz_total // n_splits
    # x/z/dy/dx + the (rows, isz) t1/inter/dinter transients (f32-heavy;
    # isz here is already the per-split width).
    bb = _train_block_b(b, 4 * s * hdim * 2 + s * hdim * 4
                        + s * isz * 12, cap=4)
    ln = ffn_params["layer_norm"]
    w1 = ffn_params["intermediate"]["kernel"].astype(dtype)
    w2 = ffn_params["output"]["kernel"].astype(dtype)
    b1 = _row(ffn_params["intermediate"]["bias"])
    f32 = jnp.float32

    with_t1 = t1_saved is not None

    def make_kernel(first: bool):
        def kernel(seed_ref, x_ref, z_ref, dy_ref, w1_ref, b1_ref, w2_ref,
                   g_ref, *refs):
            if with_t1:
                t1_ref, refs = refs[0], refs[1:]
            if first:
                (dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
                 dbe_ref) = refs
            else:
                dx_ref, dw1_ref, db1_ref, dw2_ref = refs
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                grad_refs = (dw1_ref, db1_ref, dw2_ref)
                if first:
                    grad_refs += (db2_ref, dg_ref, dbe_ref)
                for ref in grad_refs:
                    ref[:] = jnp.zeros_like(ref)

            xf = x_ref[:].reshape(bb * s, hdim)
            z32 = z_ref[:].reshape(bb * s, hdim).astype(f32)
            dy32 = dy_ref[:].reshape(bb * s, hdim).astype(f32)
            dz, dgamma, dbeta = _ln_bwd(z32, dy32, g_ref[:], eps)
            dout = dz
            if h_rate > 0.0:
                dout = dout * _block_keep_mask(seed_ref[0], _SITE_FFN_OUT,
                                               i, bb, s, hdim, 1.0 - h_rate)
            if first:
                dg_ref[:] += dgamma
                dbe_ref[:] += dbeta
                db2_ref[:] += jnp.sum(dout, axis=0, keepdims=True)
            dout_lo = dout.astype(dtype)

            if with_t1:
                t1 = t1_ref[:].reshape(bb * s, isz)
            else:
                t1 = (jnp.dot(xf, w1_ref[:],
                              preferred_element_type=f32).astype(dtype)
                      + b1_ref[:].astype(dtype))
            t1_32 = t1.astype(f32)
            # gelu and its grad share Phi(t): erf over (rows, I) is the
            # kernel's priciest VPU pass — compute it once (bit-identical
            # to _gelu_exact/_gelu_grad, which use this exact expression).
            cdf = 0.5 * (1.0 + _erf(t1_32 * 0.7071067811865476))
            inter = (t1_32 * cdf).astype(dtype)
            dw2_ref[:] += jax.lax.dot_general(
                inter, dout_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dinter = jax.lax.dot_general(
                dout_lo, w2_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            phi = _INV_SQRT2PI * jnp.exp(-0.5 * t1_32 * t1_32)
            dt1 = (dinter * (cdf + t1_32 * phi)).astype(dtype)
            dw1_ref[:] += jax.lax.dot_general(
                xf, dt1, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            db1_ref[:] += jnp.sum(dt1.astype(f32), axis=0, keepdims=True)
            dx = jax.lax.dot_general(
                dt1, w1_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            if first:
                dx = dx + dz
            dx_ref[:] = dx.astype(dx_ref.dtype).reshape(bb, s, hdim)

        return kernel

    xspec = pl.BlockSpec((bb, s, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    w1spec = pl.BlockSpec((hdim, isz), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    b1spec = pl.BlockSpec((1, isz), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    w2spec = pl.BlockSpec((isz, hdim), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM)

    dx_total = None
    dw1_parts, db1_parts, dw2_parts = [], [], []
    db2 = dg = dbe = None
    for j in range(n_splits):
        first = j == 0
        out_specs = [xspec, w1spec, b1spec, w2spec]
        out_shape = [jax.ShapeDtypeStruct((b, s, hdim), dtype),
                     jax.ShapeDtypeStruct((hdim, isz), f32),
                     jax.ShapeDtypeStruct((1, isz), f32),
                     jax.ShapeDtypeStruct((isz, hdim), f32)]
        if first:
            out_specs += [rspec, rspec, rspec]
            out_shape += [jax.ShapeDtypeStruct((1, hdim), f32)] * 3
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    xspec, xspec, xspec, w1spec, b1spec, w2spec, rspec]
        operands = [seed, x, z, dy, w1[:, j * isz:(j + 1) * isz],
                    b1[:, j * isz:(j + 1) * isz],
                    w2[j * isz:(j + 1) * isz, :], _row(ln["scale"])]
        if with_t1:
            in_specs.append(pl.BlockSpec((bb, s, isz), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(t1_saved[:, :, j * isz:(j + 1) * isz])
        out = pl.pallas_call(
            make_kernel(first), grid=(b // bb,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            interpret=interpret,
            compiler_params=_TRAIN_VMEM_LIMIT,
        )(*operands)
        if first:
            dx_j, dw1_j, db1_j, dw2_j, db2, dg, dbe = out
        else:
            dx_j, dw1_j, db1_j, dw2_j = out
        dx_total = dx_j if dx_total is None else dx_total + dx_j
        dw1_parts.append(dw1_j)
        db1_parts.append(db1_j)
        dw2_parts.append(dw2_j)

    pd = jnp.dtype(ffn_params["intermediate"]["kernel"].dtype)
    dparams = {
        "intermediate": {
            "kernel": jnp.concatenate(dw1_parts, axis=1).astype(pd),
            "bias": jnp.concatenate(db1_parts, axis=1)[0].astype(pd),
        },
        "output": {
            "kernel": jnp.concatenate(dw2_parts, axis=0).astype(pd),
            "bias": db2[0].astype(pd),
        },
        "layer_norm": {"scale": dg[0].astype(pd), "bias": dbe[0].astype(pd)},
    }
    return dx_total, dparams


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ffn_block_train(x, ffn_params, seed, eps=1e-12, h_rate=0.0,
                    interpret=None):
    """Differentiable fused FFN sub-block with in-kernel output dropout."""
    if interpret is None:
        interpret = _default_interpret()
    y, _, _ = _ffn_fwd_impl(x, ffn_params, seed, eps, h_rate, interpret)
    return y


def _ffn_train_fwd(x, ffn_params, seed, eps, h_rate, interpret):
    if interpret is None:
        interpret = _default_interpret()
    y, z, t1 = _ffn_fwd_impl(x, ffn_params, seed, eps, h_rate, interpret)
    return y, (x, ffn_params, seed, z, t1)


def _ffn_train_bwd(eps, h_rate, interpret, res, dy):
    x, ffn_params, seed, z, t1 = res
    if interpret is None:
        interpret = _default_interpret()
    dx, dparams = _ffn_bwd_impl(x, ffn_params, seed, z, dy, eps, h_rate,
                                interpret, t1_saved=t1)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dx, dparams, dseed


ffn_block_train.defvjp(_ffn_train_fwd, _ffn_train_bwd)
