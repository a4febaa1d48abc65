"""Probe: where do the conv stream's ~81 ms (21.9% of the train step) go?

Times each CharResNet BasicBlock fwd+bwd in isolation at the production
factorized shape (G unique glyph rows, bf16, weighted-BN train mode), plus
diagnostic variants (BN off, weights off), so the 50%-peak number from
docs/STEP_BREAKDOWN.md decomposes into per-block rates.

Usage: python tools/probe_conv.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _log(msg):
    print(f"[probe_conv] {msg}", file=sys.stderr, flush=True)


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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import faulthandler
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

    import bench
    from realise_tpu.models.realise import _factorized_conv
    from realise_tpu.ops.pallas import tpu_compiler_options
    from realise_tpu.ops.resnet import _channels, basic_block
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    _log("building model via bench.build")
    (_, _, trainer, (params, state, _, batch), bs, cfg,
     _) = bench.build(tiny=False, batch_size=args.batch_size, train=True,
                      use_pallas=True, infer=False)
    peak, kind = bench.peak_flops()
    _log(f"device {kind!r}, peak {peak / 1e12:.0f} TF/s")
    copts = tpu_compiler_options()
    jit = lambda f, **kw: jax.jit(f, compiler_options=copts, **kw)
    dtype = jnp.dtype(cfg.dtype)
    f32 = jnp.float32
    ts = trainer.train_state
    rp = ts.params["res"]["resnet"]
    st = ts.state

    from realise_tpu.models.realise import res_conv_rows
    g = res_conv_rows(st)
    images_nhwc = st.get("res_uniq_images_nhwc")
    if images_nhwc is None:
        images_nhwc = jnp.transpose(
            st.get("res_uniq_images", st["char_images"]), (0, 2, 3, 1))
    src_idx = batch["src_idx"]
    _log(f"G={g} unique glyph rows, fonts={cfg.num_fonts}, "
         f"glyph={cfg.glyph_size}")

    rows = []

    def add(name, sec, flops, note=""):
        pct = round(100 * flops / sec / peak, 1) if flops else None
        _log(f"  {name}: {sec * 1e3:.3f} ms  ({pct}% peak)")
        rows.append({"name": name, "ms": round(sec * 1e3, 3),
                     "gflop": round(flops / 1e9, 1), "pct_peak": pct,
                     "note": note})

    # --------------------------------------------------- full stream (prod)
    key = jax.random.PRNGKey(0)
    dyf = jax.random.normal(key, (bs, cfg.max_seq_length, cfg.hidden_size),
                            f32)

    def conv_loss(rp, st, src_idx, dyf):
        feats, new_bn = _factorized_conv(rp, st, src_idx, True, cfg, dtype)
        return (feats.astype(f32) * dyf).sum(), new_bn

    from tools.step_breakdown import conv_flops_per_glyph
    total_f = 3 * g * conv_flops_per_glyph(cfg)
    _log("compiling production conv stream f+b")
    conv_fb = jit(jax.grad(conv_loss, has_aux=True))
    sec = time_fn(lambda: conv_fb(rp, st, src_idx, dyf), args.iters)
    add("PROD factorized conv stream f+b", sec, total_f)

    # --------------------------------------------------------- per block
    chans = _channels(cfg.res_encoder, cfg.hidden_size)
    counts = jnp.ones((g,), f32)
    prev, sp = cfg.num_fonts, cfg.glyph_size
    x = images_nhwc.astype(dtype)
    for i, ch in enumerate(chans):
        name = f"block{i + 1}"
        bp = rp[name]
        bst = st["resnet"][name]
        sp_o = sp // 2
        # fwd conv flops: conv1(3x3 prev->ch) + conv2(3x3 ch->ch) [+ 1x1 sc]
        f_fwd = g * sp_o * sp_o * 2 * (9 * prev * ch + 9 * ch * ch + prev * ch)
        dy_b = jax.random.normal(jax.random.fold_in(key, i),
                                 (g, sp_o, sp_o, ch), f32)

        def blk_loss(bp, bst, x, dy_b, _i=i):
            y, ns = basic_block(bp, bst, x, stride=2, train=True,
                                weights=counts)
            return (y.astype(f32) * dy_b).sum(), ns

        blk_fb = jit(jax.grad(blk_loss, has_aux=True))
        _log(f"compiling {name} f+b  in=({g},{sp},{sp},{prev}) out_ch={ch}")
        sec = time_fn(lambda: blk_fb(bp, bst, x, dy_b), args.iters)
        add(f"{name} f+b in={sp}x{sp}x{prev} out={sp_o}x{sp_o}x{ch}",
            sec, 3 * f_fwd)

        def blk_fwd(bp, bst, x, _i=i):
            return basic_block(bp, bst, x, stride=2, train=True,
                               weights=counts)

        blk_f = jit(blk_fwd)
        sec_f = time_fn(lambda: blk_f(bp, bst, x), args.iters)
        add(f"{name} fwd only", sec_f, f_fwd)

        # next block's input: run this block once
        x = blk_f(bp, bst, x)[0]
        prev, sp = ch, sp_o

    # ------------------------------------------------ variants (diagnosis)
    x0 = images_nhwc.astype(dtype)

    def stream_nobn(rp, x, dyf_g):
        """convs + relu only — isolates BN reduction/normalize cost."""
        h = x
        prev = cfg.num_fonts
        for i, ch in enumerate(chans):
            bp = rp[f"block{i + 1}"]
            from realise_tpu.ops.resnet import conv2d
            h1 = jax.nn.relu(conv2d(bp["conv1"], h, 2))
            h1 = conv2d(bp["conv2"], h1, 1)
            sc = (conv2d(bp["shortcut_conv"], h, 2, padding=0)
                  if "shortcut_conv" in bp else h)
            h = jax.nn.relu(h1 + sc)
            prev = ch
        return (h.reshape(g, -1).astype(f32) * dyf_g).sum()

    dyf_g = jax.random.normal(key, (g, cfg.hidden_size), f32)
    nobn_fb = jit(jax.grad(stream_nobn))
    _log("compiling no-BN stream f+b")
    sec = time_fn(lambda: nobn_fb(rp, x0, dyf_g), args.iters)
    add("stream f+b, BN removed", sec, total_f,
        "convs+relu only; gap vs PROD = BN+gather cost")

    print(f"{'name':58s} {'ms':>9s} {'GF':>9s} {'%peak':>6s}")
    for r in rows:
        print(f"{r['name'][:58]:58s} {r['ms']:9.3f} {r['gflop']:9.1f} "
              f"{r['pct_peak'] if r['pct_peak'] is not None else '':>6}")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"device": kind, "G": int(g), "rows": rows}, fh,
                      indent=1)
        _log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
