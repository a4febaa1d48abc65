"""Probe: the factorized streams' glue — table_gather backward, counts
scatter, image transpose — at production shape (N=32768 tokens, G=21128
glyph rows, H=768).

probe_conv.py showed PROD conv stream (81.4 ms) minus the isolated blocks
(66.4 ms) leaves ~15 ms of glue; this pins down which piece and compares
the onehot-matmul gather backward against sort+segment_sum and a raw
scatter-add.

Usage: python tools/probe_gather.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _log(msg):
    print(f"[probe_gather] {msg}", file=sys.stderr, flush=True)


def time_fn(fn, iters, warmup=2):
    for _ in range(warmup):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--v", type=int, default=21128)
    ap.add_argument("--h", type=int, default=768)
    args = ap.parse_args()
    n, v, h = args.n, args.v, args.h

    import faulthandler
    faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)

    import numpy as np

    from realise_tpu.ops.layers import _table_gather_bwd
    from realise_tpu.ops.pallas import tpu_compiler_options
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    copts = tpu_compiler_options()
    jit = lambda f, **kw: jax.jit(f, compiler_options=copts, **kw)

    _log("building host arrays")
    rng = np.random.default_rng(0)
    ids = jax.device_put(rng.integers(0, v, size=(n,), dtype=np.int32))
    ct = jax.device_put(
        rng.standard_normal((n, h), np.float32).astype(jnp.bfloat16))
    table = jax.device_put(
        rng.standard_normal((v, h), np.float32).astype(jnp.bfloat16))
    imgs = jax.device_put(
        rng.standard_normal((v, 3, 32, 32), np.float32).astype(jnp.bfloat16))
    _log("arrays on device")

    def bench(name, fn, *a):
        _log(f"compiling {name}")
        f = jit(fn)
        sec = time_fn(lambda: f(*a), args.iters)
        _log(f"{name}: {sec * 1e3:.3f} ms")
        return sec

    # gather forward
    bench("gather fwd (N,H) from (V,H)", lambda t, i: jnp.take(t, i, 0),
          table, ids)

    # backward: onehot matmul (production path)
    bench("gather bwd: onehot matmul (prod)",
          lambda i, c: _table_gather_bwd((v, "bfloat16", "onehot"), i, c)[0],
          ids, ct)

    # backward: sort + segment_sum
    bench("gather bwd: sort+segment_sum",
          lambda i, c: _table_gather_bwd((v, "bfloat16", "sort_segment"),
                                         i, c)[0], ids, ct)

    # backward: raw scatter-add (what jnp.take's transpose would emit)
    def raw_scatter(i, c):
        return jnp.zeros((v, h), jnp.float32).at[i].add(
            c.astype(jnp.float32)).astype(jnp.bfloat16)
    _log("compiling raw scatter-add (may be slow to compile)")
    bench("gather bwd: raw scatter-add", raw_scatter, ids, ct)

    # counts scatter (the occurrence-count build in _factorized_conv)
    bench("counts: zeros.at[ids].add(1)",
          lambda i: jnp.zeros((v,), jnp.float32).at[i].add(1.0), ids)

    def counts_bincount(i):
        return jnp.bincount(i, length=v).astype(jnp.float32)
    bench("counts: bincount", counts_bincount, ids)

    def counts_sort(i):
        return jax.ops.segment_sum(jnp.ones((n,), jnp.float32),
                                   jnp.sort(i), num_segments=v,
                                   indices_are_sorted=True)
    bench("counts: sort+segment_sum", counts_sort, ids)

    # image transpose NCHW->NHWC (done inside every step today)
    bench("img transpose (V,3,32,32)->(V,32,32,3)+astype",
          lambda x: jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.bfloat16),
          imgs)


if __name__ == "__main__":
    main()
