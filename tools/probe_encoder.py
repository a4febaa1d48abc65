"""Probe: where do the 13 ms/layer of the training-step encoder go?

Times the production 19-layer scan fwd+bwd (ops/bert.py bert_encoder with
the custom-VJP Pallas kernels) under controlled variants:

* baseline (scan, dropout on)            — the number inside the train step
* REALISE_TPU_SCAN_UNROLL=19 (full)      — is it scan glue?
* dropout rates forced to 0              — is it the in-kernel mask hashing?
* REALISE_TPU_ATTN_SAVE_QKV=1            — is it the qkv recompute?

Each variant is one compiled program timed over --iters calls, so the
remote-tunnel sync latency amortizes to ~sync/iters.

Usage: python tools/probe_encoder.py [--iters 30] [--variants a,b,...]
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
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


def time_fn(fn, iters, warmup=3):
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
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="base,unroll,nodrop,saveqkv")
    args = ap.parse_args()

    import faulthandler

    faulthandler.dump_traceback_later(900, repeat=True, file=sys.stderr)

    import dataclasses

    from realise_tpu.config import config_for
    from realise_tpu.ops.bert import (
        attention_bias_from_mask,
        bert_encoder,
        init_bert_encoder,
    )
    from realise_tpu.ops.pallas import tpu_compiler_options
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    cfg = config_for("bert-pho2-res-arch3", vocab_size=21128,
                     dtype="bfloat16")
    layers = cfg.num_hidden_layers + cfg.pho_num_layers + cfg.out_num_layers
    bs, s, h = args.batch_size, cfg.max_seq_length, cfg.hidden_size
    dtype = jnp.dtype(cfg.dtype)
    peak = 197e12

    # Key AND init on the host CPU: host_normal reads the key back with
    # np.asarray, and a TPU-resident key turns the 19x6 init draws into
    # 100+ tiny device->host transfers through the (slow) tunnel.
    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.PRNGKey(0)
        enc = init_bert_encoder(key, cfg, layers)
    enc = jax.device_put(enc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, s, h), dtype)
    dy = jax.random.normal(jax.random.fold_in(key, 1), (bs, s, h), dtype)
    bias = attention_bias_from_mask(jnp.ones((bs, s), jnp.int32), dtype)
    rng = jax.random.PRNGKey(3)
    copts = tpu_compiler_options()

    attn_flops = bs * (8 * s * h * h + 4 * s * s * h)
    ffn_flops = bs * 4 * s * h * cfg.intermediate_size
    useful = 3 * layers * (attn_flops + ffn_flops)

    def make_fb(cfg_v, use_pallas=True):
        def enc_fb(p, x, bias, rng, dy):
            def fwd(p, x):
                return bert_encoder(p, x, bias, cfg_v, deterministic=False,
                                    rng=rng, use_pallas=use_pallas)
            y, vjp = jax.vjp(fwd, p, x)
            return vjp(dy)
        return jax.jit(enc_fb, compiler_options=copts)

    results = {}
    for variant in args.variants.split(","):
        env = {}
        cfg_v = cfg
        use_pallas = True
        if variant == "unroll":
            env["REALISE_TPU_SCAN_UNROLL"] = str(layers)
        elif variant == "nodrop":
            cfg_v = dataclasses.replace(
                cfg, attention_probs_dropout_prob=0.0,
                hidden_dropout_prob=0.0)
        elif variant == "saveqkv":
            env["REALISE_TPU_ATTN_SAVE_QKV"] = "1"
        elif variant == "jnp":
            use_pallas = False
        elif variant == "jnp_nodrop":
            use_pallas = False
            cfg_v = dataclasses.replace(
                cfg, attention_probs_dropout_prob=0.0,
                hidden_dropout_prob=0.0)
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            _log(f"compiling variant {variant!r}")
            f = make_fb(cfg_v, use_pallas)
            sec = time_fn(lambda: f(enc, x, bias, rng, dy), args.iters)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        results[variant] = sec
        _log(f"{variant}: {sec * 1e3:.2f} ms ({sec * 1e3 / layers:.2f} "
             f"ms/layer, {100 * useful / sec / peak:.1f}% of peak on "
             f"useful fwd+2bwd FLOPs)")

    base = results.get("base")
    for k, v in results.items():
        delta = f" ({(v - base) * 1e3:+.2f} ms vs base)" if base else ""
        print(f"{k}: {v * 1e3:.2f} ms{delta}")


if __name__ == "__main__":
    main()
