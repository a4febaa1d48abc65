"""Microbenchmark the fused BERT-block train kernels at production shape.

Times attention/FFN train blocks (forward, and forward+backward through
jax.grad) per layer-call on the real device, so kernel experiments can be
judged in isolation before a full bench.py run. Knobs under test (dropout
rates, REALISE_TPU_* env) are printed with the numbers.

Usage: python tools/bench_kernels.py [--b 256] [--s 128] [--h 768]
           [--rates 0.1 0.0] [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def time_fn(fn, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--i", type=int, default=3072)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--rates", type=float, nargs="*", default=[0.1, 0.0])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from realise_tpu.ops.layers import init_dense, init_layer_norm
    from realise_tpu.ops.pallas.bert_block_train import (
        attention_block_train,
        ffn_block_train,
    )
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    b, s, h, isz = args.b, args.s, args.h, args.i
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, s, h), jnp.bfloat16)
    dy = jax.random.normal(ks[7], (b, s, h), jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.bfloat16)
    seed = jnp.array([1234], jnp.int32)
    attn = {
        "query": init_dense(ks[1], h, h), "key": init_dense(ks[2], h, h),
        "value": init_dense(ks[3], h, h), "output": init_dense(ks[4], h, h),
        "layer_norm": init_layer_norm(h),
    }
    ffn = {
        "intermediate": init_dense(ks[5], h, isz),
        "output": init_dense(ks[6], isz, h),
        "layer_norm": init_layer_norm(h),
    }
    # Useful-FLOP references (fwd; bwd counted as 2x fwd).
    attn_f = (8 * s * h * h + 4 * s * s * h) * b
    ffn_f = 4 * s * h * isz * b
    dev = jax.devices()[0]
    peak = 197e12 if "v5 lite" in dev.device_kind else None
    print(f"device={dev.device_kind} B={b} S={s} H={h} I={isz} "
          f"env: SAVE_T1={os.environ.get('REALISE_TPU_FFN_SAVE_T1', '0')}")

    for rate in args.rates:
        af = jax.jit(functools.partial(
            attention_block_train, num_heads=args.heads,
            p_rate=rate, h_rate=rate))
        ff = jax.jit(functools.partial(ffn_block_train, h_rate=rate))

        def attn_fb(x, p, bias, seed, dy):
            y, vjp = jax.vjp(lambda x, p: af(x, p, bias, seed), x, p)
            return vjp(dy)

        def ffn_fb(x, p, seed, dy):
            y, vjp = jax.vjp(lambda x, p: ff(x, p, seed), x, p)
            return vjp(dy)

        attn_fb = jax.jit(attn_fb)
        ffn_fb = jax.jit(ffn_fb)

        t_af = time_fn(lambda: af(x, attn, bias, seed), args.iters)
        t_ab = time_fn(lambda: attn_fb(x, attn, bias, seed, dy), args.iters)
        t_ff = time_fn(lambda: ff(x, ffn, seed), args.iters)
        t_fb = time_fn(lambda: ffn_fb(x, ffn, seed, dy), args.iters)

        def mfu(flops, t):
            return f"{flops / t / peak * 100:5.1f}%" if peak else "n/a"

        print(f"rate={rate}: attn fwd {t_af * 1e3:7.3f} ms "
              f"[{mfu(attn_f, t_af)}]  attn f+b {t_ab * 1e3:7.3f} ms "
              f"[{mfu(3 * attn_f, t_ab)}]")
        print(f"          ffn  fwd {t_ff * 1e3:7.3f} ms "
              f"[{mfu(ffn_f, t_ff)}]  ffn  f+b {t_fb * 1e3:7.3f} ms "
              f"[{mfu(3 * ffn_f, t_fb)}]")


if __name__ == "__main__":
    main()
