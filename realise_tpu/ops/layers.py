"""Primitive layers as pure functions over parameter pytrees.

No module framework: a "layer" is an ``init_*`` function returning a dict of
arrays plus an apply function. This keeps the whole model a transparent
pytree — trivial to shard with NamedSharding, to scan over, and to map
torch checkpoints onto.

Numerics policy: parameters live in ``param_dtype`` (f32 by default);
activations are computed in ``dtype`` (bf16 on TPU) with layer norm, softmax
and losses accumulated in f32 — the standard TPU mixed-precision recipe (no
loss scaling needed, unlike the reference's apex AMP path, run.py:155-161).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import os

import jax
import jax.numpy as jnp
import numpy as np


def host_normal(key, shape, stddev: float, dtype=jnp.float32):
    """Normal draw on the HOST, seeded from a jax PRNG key.

    Initialization is a one-shot host-side job, but drawing through
    jax.random costs one XLA threefry compile per call site (~0.3 s each,
    ~80 sites ≈ 25 s per fresh model even at test sizes). numpy's Philox
    is platform-stable and keyed from the jax key's bits, so inits stay
    deterministic per seed with zero compiles. Falls back to the traced
    path when ``key`` is a tracer (init under jit)."""
    if isinstance(key, jax.core.Tracer):
        return stddev * jax.random.normal(key, shape, dtype=dtype)
    kd = np.asarray(jax.random.key_data(key)).ravel()
    seed = (np.uint64(kd[-2]) << np.uint64(32)) | np.uint64(kd[-1])
    gen = np.random.Generator(np.random.Philox(key=seed))
    draw = stddev * gen.standard_normal(shape, dtype=np.float32)
    return jnp.asarray(draw, dtype=dtype)


def trunc_normal_init(key, shape, stddev: float = 0.02, dtype=jnp.float32):
    """BERT-style initializer (reference: modeling_bert.py:487-506 uses
    normal(0, initializer_range); we use the same)."""
    return host_normal(key, shape, stddev, dtype=dtype)


# ------------------------------------------------------------------ dense
def init_dense(key, in_dim: int, out_dim: int, stddev: float = 0.02, dtype=jnp.float32):
    return {
        "kernel": trunc_normal_init(key, (in_dim, out_dim), stddev, dtype),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def dense(params, x: jax.Array, dtype=None) -> jax.Array:
    """Mixed-precision rule: compute in the activation dtype — params are
    stored f32 but cast down at the matmul (otherwise jnp promotion would
    silently upcast every bf16 activation back to f32)."""
    if dtype is not None:
        x = x.astype(dtype)
    kernel = params["kernel"].astype(x.dtype)
    bias = params["bias"].astype(x.dtype)
    return jnp.matmul(x, kernel, preferred_element_type=x.dtype) + bias


# -------------------------------------------------------------- layer norm
def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """LayerNorm computed in f32 regardless of activation dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# -------------------------------------------------------------- embedding
def init_embedding(key, num: int, dim: int, stddev: float = 0.02, dtype=jnp.float32):
    return {"embedding": trunc_normal_init(key, (num, dim), stddev, dtype)}


def embed(params, ids: jax.Array, dtype=None) -> jax.Array:
    table = params["embedding"]
    if dtype is not None:
        table = table.astype(dtype)
    return jnp.take(table, ids, axis=0)


# ------------------------------------------- gather with matmul transpose
_GATHER_BWD_CHUNK = 4096

# Backward algorithm for table_gather. 'auto' (default) picks per table:
#  * 'onehot' — chunked one-hot matmul-transpose, 2·N·V·H MXU FLOPs. Wins
#    for SMALL tables (the FLOPs are trivial and it skips the sort), e.g.
#    the factorized-GRU gather at U≈1.3k: 0.65 ms vs sort's 2.3 ms.
#  * 'sort_segment' — argsort the ids + segment_sum with sorted indices,
#    O(N·H log N) bandwidth instead of MXU TFLOPs. Wins for LARGE tables:
#    at (N=32768, V=21128, H=768) it measures 2.30 ms vs onehot's 6.48 ms
#    on v5e (tools/probe_gather.py) — the glyph-stream gather.
# The crossover on v5e sits near V≈8k (onehot ms ≈ 2NVH/100TF; sort ≈
# const 2.3 ms from permuting the (N,H) cotangent). Env forces one:
# REALISE_TPU_GATHER_BWD=onehot|sort_segment|auto.
TABLE_GATHER_BWD = os.environ.get("REALISE_TPU_GATHER_BWD", "auto")
if TABLE_GATHER_BWD not in ("auto", "onehot", "sort_segment"):
    # A typo'd override would otherwise silently fall through to onehot —
    # a measured 3x backward regression on large tables with no signal.
    raise ValueError(
        f"REALISE_TPU_GATHER_BWD={TABLE_GATHER_BWD!r}: expected "
        f"'auto', 'onehot' or 'sort_segment'")
_GATHER_AUTO_SORT_MIN_V = 8192


def table_gather(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``jnp.take(table, ids, axis=0)`` with a matmul-transpose backward.

    The standard transpose of a gather is a scatter-add, and XLA's TPU
    scatter emitter takes *minutes* to compile at (V≈21k, H) table shapes
    (measured: 1–3 min per scatter, ~15 min extra for the factorized train
    step). The mathematically identical one-hot matmul — dtable = onehotᵀ·ct
    — compiles in seconds, runs on the MXU, and accumulates f32 (better
    summation than bf16 scatter-add). Used by the vocabulary-factorized
    streams (models/realise.py); cotangents never flow to ``ids``.
    See ``TABLE_GATHER_BWD`` for the bandwidth-bound alternative.
    """
    algo = TABLE_GATHER_BWD
    if algo == "auto":
        algo = ("sort_segment" if table.shape[0] >= _GATHER_AUTO_SORT_MIN_V
                else "onehot")
    return _table_gather(table, ids,
                         (table.shape[0], jnp.dtype(table.dtype).name, algo))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _table_gather(table, ids, meta):
    return jnp.take(table, ids, axis=0)


def _table_gather_fwd(table, ids, meta):
    return jnp.take(table, ids, axis=0), ids


def _table_gather_bwd(meta, ids, ct):
    v, tdt, algo = meta
    flat_ids = ids.reshape(-1)
    h = ct.shape[-1]
    ct2 = ct.reshape(-1, h)
    n = ct2.shape[0]
    if algo == "sort_segment":
        order = jnp.argsort(flat_ids)
        g = jax.ops.segment_sum(
            ct2[order].astype(jnp.float32), flat_ids[order],
            num_segments=v, indices_are_sorted=True)
        return (g.astype(tdt),
                np.zeros(ids.shape, dtype=jax.dtypes.float0))
    chunk = _GATHER_BWD_CHUNK
    if n <= chunk:
        onehot = jax.nn.one_hot(flat_ids, v, dtype=ct2.dtype)
        g = jax.lax.dot_general(onehot, ct2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        # Chunk so the transient one-hot stays ~(chunk, V) — a scan, not an
        # unrolled loop, to keep compile time flat in N.
        pad = (-n) % chunk
        if pad:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.full((pad,), v, flat_ids.dtype)])  # OOB → 0h
            ct2 = jnp.concatenate(
                [ct2, jnp.zeros((pad, h), ct2.dtype)])
        k = flat_ids.shape[0] // chunk

        def body(acc, xs):
            cids, cct = xs
            onehot = jax.nn.one_hot(cids, v, dtype=cct.dtype)
            return acc + jax.lax.dot_general(
                onehot, cct, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None

        g, _ = jax.lax.scan(
            body, jnp.zeros((v, h), jnp.float32),
            (flat_ids.reshape(k, chunk), ct2.reshape(k, chunk, h)))
    return g.astype(tdt), np.zeros(ids.shape, dtype=jax.dtypes.float0)


_table_gather.defvjp(_table_gather_fwd, _table_gather_bwd)


# ---------------------------------------------------------------- dropout
def _mix_u32(h: jax.Array) -> jax.Array:
    """murmur3 fmix32: bijective avalanche over uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def dropout(x: jax.Array, rate: float, deterministic: bool, rng: Optional[jax.Array]) -> jax.Array:
    """Counter-based dropout: the keep mask is a murmur3 hash of
    (key bits, element index) — the same construction the fused train
    kernels use (ops/pallas/bert_block_train.py _keep_mask). ~10 VPU ops
    per element instead of a threefry block: jax.random.bernoulli on a
    (256,128,768) activation costs ~6.5 ms/step on v5e, this ~0.5 ms.
    Dropout needs the right marginal rate, independence across elements,
    and reproducibility per key — not a particular stream; tests assert
    exactly those properties (tests/test_ops.py)."""
    if deterministic or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng when not deterministic")
    keep = 1.0 - rate
    kd = rng if jnp.issubdtype(rng.dtype, jnp.uint32) \
        else jax.random.key_data(rng)
    kd = kd.reshape(-1).astype(jnp.uint32)
    base = _mix_u32(kd[-1] ^ _mix_u32(kd[-2] ^ jnp.uint32(0x9E3779B1)))
    idx = jax.lax.iota(jnp.uint32, x.size).reshape(x.shape)
    bits = _mix_u32(base ^ _mix_u32(idx))
    thresh = jnp.uint32(min(int(keep * (1 << 24)), 1 << 24))
    mask = (bits >> 8) < thresh
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def site_rng(rng: Optional[jax.Array], salt: int) -> Optional[jax.Array]:
    """Derive a per-dropout-site key deterministically from one step key."""
    if rng is None:
        return None
    return jax.random.fold_in(rng, salt)


# ------------------------------------------------------------- activations
def gelu(x: jax.Array) -> jax.Array:
    # Exact (erf-based) gelu, matching the reference's BERT 'gelu'
    # (transformers/modeling_bert.py gelu = x * 0.5 * (1 + erf(x/sqrt(2)))).
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
}
