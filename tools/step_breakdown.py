"""Measured per-component breakdown of the arch3 training step on device.

``jax.profiler`` traces HANG through the remote-TPU tunnel this environment
uses: ``start_trace`` never creates the log directory and the first traced
step never returns (>15 min observed, no output) — so the trace-driven
report (tools/trace_report.py) cannot run against the real chip here. This
tool produces the same decision data the trace would have: each hot
component of the training step is jitted and timed IN ISOLATION at the
exact production shape/dtype/flags the full step uses, scored against its
analytic FLOP count, and the gap between the component sum and the full
measured step is reported as glue (scan slicing of stacked params, gathers,
gate fusion, embeddings, residual adds, optimizer-state plumbing).

Caveats (why this is a breakdown, not an exact trace): components timed
alone enjoy XLA fusion/overlap opportunities the full program may schedule
differently, and the isolated fns skip donation; treat per-component
numbers as lower bounds and the residual as an upper bound on glue.

Usage: python tools/step_breakdown.py [--batch_size 256] [--iters 10]
           [--json out.json]
       python tools/step_breakdown.py --infer   # forward/serving attribution
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
    print(f"[breakdown] {msg}", file=sys.stderr, flush=True)


def _sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def time_fn(fn, iters=10, warmup=2):
    """fn must be a jitted function taking its operands as ARGUMENTS —
    0-arg closures capture device arrays as HLO constants, and XLA spends
    minutes embedding/folding the ~50 MB literals (observed: the first
    component never finished compiling)."""
    for _ in range(warmup):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def conv_flops_per_glyph(cfg) -> float:
    """Forward conv FLOPs for one glyph (matches bench.py's accounting)."""
    from realise_tpu.ops.resnet import _channels

    chans = _channels(cfg.res_encoder, cfg.hidden_size)
    prev, sp, conv = cfg.num_fonts, cfg.glyph_size, 0
    for ch in chans:
        sp //= 2
        conv += 2 * 9 * prev * ch * sp * sp
        conv += 2 * 9 * ch * ch * sp * sp
        conv += 2 * 1 * prev * ch * sp * sp
        prev = ch
    return float(conv)


def infer_main(args):
    """Forward-path attribution: where do the serving fast path's ms go?

    Times the FULL table-path infer step and the training-shaped
    full_forward, then the pieces: the 19-layer encoder scan (fwd only, one
    program), the (B·S,H)×(H,V) head matmul + argmax, the (V,H) table
    gathers + gate fusion, and — for full_forward — the live conv/GRU
    streams. Residual = full minus component sum (embeddings, LN, glue)."""
    import faulthandler
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

    import bench
    from realise_tpu.models.realise import (
        _factorized_conv,
        _factorized_gru,
        _vocab_pho_from_state,
        res_conv_rows,
    )
    from realise_tpu.ops.bert import attention_bias_from_mask, bert_encoder
    from realise_tpu.ops.fusion import gate_fusion
    from realise_tpu.ops.pallas import tpu_compiler_options
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    bs = args.batch_size
    _log("building model via bench.build (infer tables, no trainer)")
    (infer_step, full_fwd, _, (params, state, infer_batch, batch), bs, cfg,
     _) = bench.build(tiny=False, batch_size=bs, train=False,
                      use_pallas=True, infer=True)
    peak, kind = bench.peak_flops()
    _log(f"device {kind!r}, peak {peak / 1e12:.0f} TF/s")
    copts = tpu_compiler_options()
    jit = lambda f, **kw: jax.jit(f, compiler_options=copts, **kw)

    s, h, isz = cfg.max_seq_length, cfg.hidden_size, cfg.intermediate_size
    v = cfg.vocab_size
    dtype = jnp.dtype(cfg.dtype)
    layers = cfg.num_hidden_layers + cfg.pho_num_layers + cfg.out_num_layers
    attn_flops = bs * (8 * s * h * h + 4 * s * s * h)
    ffn_flops = bs * 4 * s * h * isz

    rows = []

    def add(name, sec, useful_flops, note=""):
        _log(f"  {name}: {sec * 1e3:.3f} ms")
        rows.append({
            "component": name, "ms": round(sec * 1e3, 3),
            "useful_gflop": round(useful_flops / 1e9, 1),
            "pct_peak": round(100 * useful_flops / sec / peak, 1)
            if sec > 0 and useful_flops else None,
            "note": note,
        })

    # Full programs first (HBM headroom, same reason as the train mode).
    _log("timing FULL infer step (table fast path)")
    sec_inf = time_fn(lambda: infer_step(params, state, infer_batch),
                      args.iters)
    fast_f = bs * bench.analytic_flops_per_sentence(cfg, fast_path=True,
                                                    train=False)
    add("FULL infer step (table fast path)", sec_inf, fast_f,
        f"{bs / sec_inf:.1f} sent/s; MFU "
        f"{100 * fast_f / sec_inf / peak:.1f}%")

    _log("timing FULL full_forward (live streams)")
    sec_ff = time_fn(lambda: full_fwd(params, state, infer_batch), args.iters)
    vocab_pho = _vocab_pho_from_state(state)
    u_rows = vocab_pho[0].shape[0] if vocab_pho is not None else 0
    g_rows = res_conv_rows(state)
    ff_f = bs * bench.analytic_flops_per_sentence(
        cfg, fast_path=False, train=False, batch_size=bs,
        pho_rows=u_rows, res_rows=g_rows)
    add("FULL full_forward (live GRU+conv streams)", sec_ff, ff_f,
        f"{bs / sec_ff:.1f} sent/s; MFU {100 * ff_f / sec_ff / peak:.1f}%")

    # ------------------------------------------- 19-layer encoder fwd scan
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, s, h), dtype)
    bias = attention_bias_from_mask(batch["masks"], dtype)
    stacked = jax.tree.map(
        lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
        params["bert"]["encoder"], params["pho"]["model"]["encoder"],
        params["output_block"]["encoder"])

    def enc_f(p, x, bias):
        return bert_encoder(p, x, bias, cfg, deterministic=True,
                            rng=None, use_pallas=True)

    _log("compiling whole-encoder (19-layer scan) fwd")
    f = jit(enc_f)
    sec_enc = time_fn(lambda: f(stacked, x, bias), args.iters)
    add("19-layer encoder scan fwd (one program)", sec_enc,
        layers * (attn_flops + ffn_flops),
        f"{sec_enc * 1e3 / layers:.2f} ms/layer")

    # ----------------------------------------------------- head + argmax
    word = params["bert"]["embeddings"]["word_embeddings"]["embedding"]
    hbias = params["head"]["bias"]

    def head_f(word, hbias, hid):
        logits = jnp.matmul(hid, word.astype(hid.dtype).T,
                            preferred_element_type=hid.dtype)
        return (logits + hbias.astype(logits.dtype)).argmax(-1)

    _log("compiling head+argmax fwd")
    f = jit(head_f)
    sec = time_fn(lambda: f(word, hbias, x), args.iters)
    add("tied head matmul + argmax", sec, bs * 2 * s * h * v,
        "(B*S,H)x(H,V) bf16 + bias + argmax")

    # -------------------------------------- table gathers + gate fusion
    src_idx = batch["src_idx"]
    tbl = jax.random.normal(key, (v, h), dtype)
    fusion_p = params["fusion"]

    def gathers_fuse(tbl, fusion_p, src_idx, sem, mask):
        pho = jnp.take(tbl, src_idx, axis=0)
        res = jnp.take(tbl, src_idx, axis=0)
        return gate_fusion(fusion_p, [sem, pho, res], mask)

    _log("compiling table gathers + gate fusion")
    f = jit(gathers_fuse)
    sec = time_fn(lambda: f(tbl, fusion_p, src_idx, x, batch["masks"]),
                  args.iters)
    add("2x (V,H) table gather + gate fusion", sec, 0,
        "serving fast path's replacement for the live streams")

    # ------------------------------- live streams (full_forward only)
    if cfg.with_res:
        def conv_f(rp, st, src_idx):
            feats, _ = _factorized_conv(rp, st, src_idx, False, cfg, dtype)
            return feats

        _log("compiling conv stream fwd")
        f = jit(conv_f)
        sec = time_fn(lambda: f(params["res"]["resnet"], state, src_idx),
                      args.iters)
        add("CharResNet conv stream fwd (live)", sec,
            g_rows * conv_flops_per_glyph(cfg),
            f"full_forward only; {g_rows} unique rows")

    if vocab_pho is not None:
        from realise_tpu.config import PHO2_VOCAB_SIZE

        def gru_f(pp, vocab_pho, src_idx):
            return _factorized_gru(pp, vocab_pho, src_idx, dtype)

        _log("compiling GRU stream fwd")
        f = jit(gru_f)
        sec = time_fn(lambda: f(params["pho"], vocab_pho, src_idx),
                      args.iters)
        gru_step = 6 * h * h + 2 * PHO2_VOCAB_SIZE * 3 * h
        add("pinyin GRU stream fwd (live)", sec,
            u_rows * cfg.pho2_max_len * gru_step,
            f"full_forward only; {u_rows} unique rows")

    print(f"{'component':52s} {'ms':>8s} {'GF':>8s} {'%peak':>6s}")
    for r in rows:
        print(f"{r['component'][:52]:52s} {r['ms']:8.3f} "
              f"{r['useful_gflop']:8.1f} "
              f"{r['pct_peak'] if r['pct_peak'] is not None else '':>6} "
              f" {r['note']}")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"device": kind, "batch_size": bs, "mode": "infer",
                       "peak_tflops": peak / 1e12, "rows": rows}, fh,
                      indent=1)
        _log(f"wrote {args.json}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json", default=None, help="also write the rows here")
    ap.add_argument("--infer", action="store_true",
                    help="forward/serving attribution instead of training")
    args = ap.parse_args()
    if args.infer:
        return infer_main(args)

    # The remote-TPU tunnel can wedge a transfer/compile indefinitely (the
    # same pathology that hangs jax.profiler here); dump a stack every 10
    # minutes of no-progress so a hang is diagnosable instead of silent.
    import faulthandler
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)

    import bench
    from realise_tpu.config import PHO2_VOCAB_SIZE
    from realise_tpu.models.realise import (
        _factorized_conv,
        _factorized_gru,
        _vocab_pho_from_state,
        masked_cross_entropy_sum,
        res_conv_rows,
    )
    from realise_tpu.ops.bert import attention_bias_from_mask
    from realise_tpu.ops.pallas import tpu_compiler_options
    from realise_tpu.ops.pallas.bert_block_train import (
        attention_block_train,
        ffn_block_train,
    )
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    bs = args.batch_size
    _log("building model via bench.build (train, pallas, no infer tables)")
    (_, _, trainer, (params, state, _, batch), bs, cfg,
     _) = bench.build(tiny=False, batch_size=bs, train=True,
                      use_pallas=True, infer=False)
    peak, kind = bench.peak_flops()
    _log(f"device {kind!r}, peak {peak / 1e12:.0f} TF/s")
    copts = tpu_compiler_options()
    jit = lambda f, **kw: jax.jit(f, compiler_options=copts, **kw)

    s, h, isz = cfg.max_seq_length, cfg.hidden_size, cfg.intermediate_size
    v = cfg.vocab_size
    nh = cfg.num_attention_heads
    eps = cfg.layer_norm_eps
    p_rate = cfg.attention_probs_dropout_prob
    h_rate = cfg.hidden_dropout_prob
    dtype = jnp.dtype(cfg.dtype)
    f32 = jnp.float32
    layers = cfg.num_hidden_layers + cfg.pho_num_layers + cfg.out_num_layers

    ts = trainer.train_state
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bs, s, h), dtype)
    dy = jax.random.normal(jax.random.fold_in(key, 1), (bs, s, h), dtype)
    bias = attention_bias_from_mask(batch["masks"], dtype)
    seed = jnp.asarray([7], jnp.int32)
    layer0 = jax.tree.map(lambda a: a[0], ts.params["bert"]["encoder"])

    rows = []

    def add(name, sec, useful_flops, count=1, note=""):
        _log(f"  {name}: {sec * 1e3:.3f} ms")
        rows.append({
            "component": name, "ms": round(sec * 1e3, 3), "count": count,
            "total_ms": round(sec * 1e3 * count, 2),
            "useful_gflop": round(useful_flops / 1e9, 1),
            "pct_peak": round(100 * useful_flops / sec / peak, 1)
            if sec > 0 else None,
            "note": note,
        })

    # ----------------------------------------------------------- full step
    # Timed FIRST: the donated full step plus the component executables
    # compiled below do not fit HBM together at B=256 (measured:
    # ResourceExhausted when the full step ran last, even after deleting
    # the measurement-only operand buffers).
    vocab_pho = _vocab_pho_from_state(ts.state)
    u_rows = vocab_pho[0].shape[0] if vocab_pho is not None else 0
    g_rows = res_conv_rows(state)
    step_arr = jnp.asarray(0, jnp.int32)
    lr = jnp.asarray(5e-5, jnp.float32)
    dbatch = trainer._put_batch(batch)
    _log("compiling/timing FULL train step")

    def one_step():
        t = trainer.train_state
        out = trainer._train_step(t.params, t.state, t.opt_state, dbatch,
                                  step_arr, trainer.base_rng, lr)
        trainer.train_state = type(t)(out[0], out[1], out[2], t.step + 1)
        return out[3]

    full_sec = time_fn(one_step, args.iters)
    train_flops = bs * bench.analytic_flops_per_sentence(
        cfg, fast_path=False, train=True, batch_size=bs,
        pho_rows=u_rows, res_rows=g_rows)
    add("FULL train step", full_sec, train_flops, 1,
        f"{bs / full_sec:.1f} sent/s; MFU "
        f"{100 * train_flops / full_sec / peak:.1f}%")
    ts = trainer.train_state  # post-step state (donation consumed the old)

    # ---------------------------------------------------------- BERT layer
    # All jitted fns take their operands as ARGUMENTS (see time_fn).
    def attn_fwd(x, p, bias, seed):
        return attention_block_train(x, p, bias, seed, nh, eps,
                                     p_rate, h_rate)

    def attn_fb(x, p, bias, seed, dy):
        y, vjp = jax.vjp(lambda x, p: attn_fwd(x, p, bias, seed), x, p)
        return vjp(dy)

    def ffn_fwd(x, p, seed):
        return ffn_block_train(x, p, seed, eps, h_rate)

    def ffn_fb(x, p, seed, dy):
        y, vjp = jax.vjp(lambda x, p: ffn_fwd(x, p, seed), x, p)
        return vjp(dy)

    attn_flops = bs * (8 * s * h * h + 4 * s * s * h)
    ffn_flops = bs * 4 * s * h * isz

    ap = layer0["attention"]
    _log("compiling attention fwd")
    f = jit(attn_fwd)
    sec = time_fn(lambda: f(x, ap, bias, seed), args.iters)
    add("attention fwd (kernel)", sec, attn_flops)
    _log("compiling attention fwd+bwd")
    f = jit(attn_fb)
    sec_attn = time_fn(lambda: f(x, ap, bias, seed, dy), args.iters)
    add("attention fwd+bwd", sec_attn, 3 * attn_flops, layers,
        "custom-VJP pallas; bwd recomputes qkv/probs in VMEM")

    fp = layer0["ffn"]
    _log("compiling ffn fwd")
    f = jit(ffn_fwd)
    sec = time_fn(lambda: f(x, fp, seed), args.iters)
    add("ffn fwd (kernel)", sec, ffn_flops)
    _log("compiling ffn fwd+bwd")
    f = jit(ffn_fb)
    sec_ffn = time_fn(lambda: f(x, fp, seed, dy), args.iters)
    add("ffn fwd+bwd", sec_ffn, 3 * ffn_flops, layers,
        "custom-VJP pallas; bwd recomputes the intermediate")

    # ------------------------------------------- whole encoder (scan) f+b
    # The per-layer rows above each pay the tunnel's per-call dispatch
    # overhead (~2-3 ms — visible as 'fwd' > 'fwd+bwd' inversions at low
    # iters), which multiplies by 19 in their total. This row times ALL
    # 19 layers as ONE program — the production lax.scan over the stacked
    # params, dropout seeds and all — so it includes the scan's
    # param-slicing glue and amortizes the dispatch to nothing. This is
    # the number to trust for "what do the BERT stacks cost in the step".
    from realise_tpu.ops.bert import bert_encoder

    stacked = jax.tree.map(
        lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
        ts.params["bert"]["encoder"], ts.params["pho"]["model"]["encoder"],
        ts.params["output_block"]["encoder"])
    enc_rng = jax.random.PRNGKey(3)

    def enc_fb(p, x, bias, rng, dy):
        def fwd(p, x):
            return bert_encoder(p, x, bias, cfg, deterministic=False,
                                rng=rng, use_pallas=True)
        y, vjp = jax.vjp(fwd, p, x)
        return vjp(dy)

    _log("compiling whole-encoder (19-layer scan) fwd+bwd")
    f = jit(enc_fb)
    sec_enc = time_fn(lambda: f(stacked, x, bias, enc_rng, dy), args.iters)
    add("19-layer encoder scan fwd+bwd (one program)", sec_enc,
        3 * layers * (attn_flops + ffn_flops), 1,
        f"{sec_enc * 1e3 / layers:.2f} ms/layer incl. scan glue; isolated "
        f"rows pay ~{max(0.0, (sec_attn + sec_ffn - sec_enc / layers)) * 1e3:.1f}"
        " ms/layer dispatch overhead")

    # ---------------------------------------------------------- head + CE
    word = ts.params["bert"]["embeddings"]["word_embeddings"]["embedding"]
    hbias = ts.params["head"]["bias"]
    tgt, lm = batch["tgt_idx"], batch["loss_masks"]

    def head_loss(word, hbias, hid):
        logits_nb = jnp.matmul(hid, word.astype(hid.dtype).T,
                               preferred_element_type=hid.dtype)
        ls, lc = masked_cross_entropy_sum(logits_nb, tgt, lm, bias=hbias)
        return ls / jnp.maximum(lc, 1.0)

    _log("compiling head+CE fwd+bwd")
    head_fb = jit(jax.grad(head_loss, argnums=(0, 1, 2)))
    sec = time_fn(lambda: head_fb(word, hbias, x), args.iters)
    add("tied head + masked CE fwd+bwd", sec, 3 * bs * 2 * s * h * v, 1,
        "(B*S,H)x(H,V) + fused-CE custom VJP + dWord/dhid")

    # ------------------------------------------------------ glyph conv f+b
    src_idx = batch["src_idx"]
    g_rows = res_conv_rows(state)
    dyf = dy.astype(f32)

    def conv_loss(rp, st, src_idx, dyf):
        feats, new_bn = _factorized_conv(rp, st, src_idx, True, cfg, dtype)
        return (feats.astype(f32) * dyf).sum(), new_bn

    _log("compiling conv stream fwd+bwd")
    conv_fb = jit(jax.grad(conv_loss, has_aux=True))
    sec = time_fn(lambda: conv_fb(ts.params["res"]["resnet"], ts.state,
                                  src_idx, dyf), args.iters)
    add("CharResNet conv stream fwd+bwd", sec,
        3 * g_rows * conv_flops_per_glyph(cfg), 1,
        f"factorized over {g_rows} unique glyph rows + per-token gather")

    # -------------------------------------------------------- pho GRU f+b
    vocab_pho = _vocab_pho_from_state(ts.state)
    u_rows = vocab_pho[0].shape[0] if vocab_pho is not None else 0
    if vocab_pho is not None:
        def gru_loss(pp, vocab_pho, src_idx, dyf):
            hid = _factorized_gru(pp, vocab_pho, src_idx, dtype)
            return (hid.astype(f32) * dyf).sum()

        _log("compiling GRU stream fwd+bwd")
        gru_fb = jit(jax.grad(gru_loss))
        sec = time_fn(lambda: gru_fb(ts.params["pho"], vocab_pho, src_idx,
                                     dyf), args.iters)
        gru_step = 6 * h * h + 2 * PHO2_VOCAB_SIZE * 3 * h
        add("pinyin GRU stream fwd+bwd", sec,
            3 * u_rows * cfg.pho2_max_len * gru_step, 1,
            f"factorized scan over {u_rows} unique pinyin rows + gather")

    # ----------------------------------------------------------- optimizer
    import optax

    grads = jax.tree.map(jnp.zeros_like, ts.params)

    def opt_step(params, opt_state, grads):
        updates, opt_state = trainer.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    _log("compiling optimizer update")
    opt = jit(opt_step)
    sec = time_fn(lambda: opt(ts.params, ts.opt_state, grads), args.iters)
    n_params = sum(x.size for x in jax.tree.leaves(ts.params))
    add("grad-clip + AdamW update", sec, 0, 1,
        f"{n_params / 1e6:.0f}M params; bandwidth-bound (no donation here)")

    comp_ms = sum(r["total_ms"] for r in rows
                  if r["component"] in (
                      "19-layer encoder scan fwd+bwd (one program)",
                      "tied head + masked CE fwd+bwd",
                      "CharResNet conv stream fwd+bwd",
                      "pinyin GRU stream fwd+bwd",
                      "grad-clip + AdamW update"))
    rows.append({"component": "residual (glue: embeddings, gate, scan "
                              "slicing, fusion boundaries)",
                 "ms": round(full_sec * 1e3 - comp_ms, 2), "count": 1,
                 "total_ms": round(full_sec * 1e3 - comp_ms, 2),
                 "useful_gflop": 0, "pct_peak": None,
                 "note": "full step minus isolated component sum"})

    hdr = (f"{'component':52s} {'ms':>8s} {'xN':>4s} {'tot ms':>8s} "
           f"{'GF':>8s} {'%peak':>6s}")
    print(hdr)
    for r in rows:
        print(f"{r['component'][:52]:52s} {r['ms']:8.3f} {r['count']:4d} "
              f"{r['total_ms']:8.2f} {r['useful_gflop']:8.1f} "
              f"{r['pct_peak'] if r['pct_peak'] is not None else '':>6} "
              f" {r['note']}")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"device": kind, "batch_size": bs,
                       "peak_tflops": peak / 1e12, "rows": rows}, fh,
                      indent=1)
        _log(f"wrote {args.json}")


if __name__ == "__main__":
    main()
