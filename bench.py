"""Benchmark harness: flagship-model throughput + MFU on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sentences/sec/chip",
     "vs_baseline": N, "train_sentences_per_sec": N, "train_mfu": N,
     "infer_mfu": N, "full_forward_sentences_per_sec": N}

Measured by default (all at batch 256, S=128, bf16, full 21128 vocab;
the vocab's composition matches the REAL hfl/chinese-roberta-wwm-ext —
~36% single-CJK/renderable, so install_glyphs' dedup runs the conv stream
over ~7.7k rows as it would on real fonts. ``--all_cjk_vocab`` restores
the r1-r4 ~99%-CJK worst case where every one of 21128 rows convolves):

* **infer** (headline): serving fast path — per-vocab GRU/glyph features
  precomputed into (V, H) tables (realise_tpu.models.realise), so the hot
  loop is 19 BERT layers + gathers + tied classifier.
* **full_forward**: training-shaped forward (GRU scan + CharResNet convs
  run live) — what the reference's eval loop executes every batch
  (reference: src/models.py:806-870).
* **train**: the full jitted update (forward, backward, clip, AdamW,
  BN state) with encoder remat — realise_tpu.training.trainer.

MFU divides a documented analytic dense-matmul FLOP count
(:func:`analytic_flops_per_sentence`) by wall time and the chip's bf16 peak
(looked up from ``device_kind``). XLA's ``cost_analysis()`` is logged as a
cross-check only: through the remote-TPU tunnel it undercounts, and Pallas
kernels report no cost. Timing forces a one-element host readback per
measurement because ``block_until_ready`` does not actually sync through
the tunnel.

The reference publishes no speed numbers (SURVEY.md §6), so ``vs_baseline``
divides by an engineering estimate of the torch reference on its era
hardware (V100, fp32, torch 1.2): ~49 GFLOPs/sentence forward at a generous
30% utilization ≈ 85 sent/s, rounded up to 100 so the ratio understates the
speedup. MFU is the defensible number; vs_baseline is context.

Usage:
    python bench.py                  # full model on the available accelerator
    python bench.py --smoke          # tiny model on CPU (CI smoke)
    python bench.py --no-train       # skip the training-step measurement
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_V100_SENTENCES_PER_SEC = 100.0  # documented estimate, see header

# bf16 peak FLOP/s per chip by device kind (public cloud specs).
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5": 459e12,          # v5p
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5e": 197e12,
    "TPU v6 lite": 918e12,     # v6e / Trillium
    "TPU v6e": 918e12,
}
DEFAULT_PEAK = 197e12  # assume v5e when the kind is unrecognized


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = time.perf_counter()


def peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    # Longest prefix wins ('TPU v5 lite' must not match the v5p entry).
    for key in sorted(PEAK_BF16, key=len, reverse=True):
        if kind.lower().startswith(key.lower()):
            return PEAK_BF16[key], kind
    return DEFAULT_PEAK, kind


def compiled_flops(jitted, *args):
    """XLA's FLOP estimate for one call (logged as a cross-check only —
    through the remote-TPU tunnel it undercounts, and Pallas kernels report
    no cost), or None when unavailable."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = cost.get("flops")
        if flops:
            _log(f"xla cost_analysis cross-check: "
                 f"{float(flops) / 1e9:.1f} GFLOP/call")
            return float(flops)
        return None
    except Exception as e:  # pragma: no cover - cost analysis is best-effort
        _log(f"cost_analysis unavailable: {e}")
        return None


def analytic_flops_per_sentence(cfg, fast_path: bool, train: bool,
                                batch_size: int = 1,
                                pho_rows: int = 0,
                                res_rows: int = 0) -> float:
    """Dense-matmul FLOP count for one S-token sentence of the arch3 model.

    Per BERT layer (2·M·K·N per matmul): q/k/v/out 8SH², scores+ctx 4S²H,
    FFN 4SHI; 19 layers total (12 sem + 4 pho + 3 out). Tied classifier
    2SHV. The full forward adds the pinyin GRU (P steps × 3 gates × input +
    recurrent projections per token: 12PH² with D=H) and the CharResNet
    stack (per-glyph conv FLOPs from the channel plan). Training = fwd +
    2×bwd = 3× forward — the strict MFU convention: recompute (the jnp
    path's remat re-forward, the Pallas VJP's in-VMEM recompute) is
    overhead, not useful work, so both training paths are scored against
    the same denominator. LayerNorm/softmax/gather costs are excluded
    (sub-1%), so MFU is slightly understated.
    """
    s, h, i = cfg.max_seq_length, cfg.hidden_size, cfg.intermediate_size
    v = cfg.vocab_size
    layers = cfg.num_hidden_layers + cfg.pho_num_layers + cfg.out_num_layers
    per_layer = 8 * s * h * h + 4 * s * s * h + 4 * s * h * i
    fwd = layers * per_layer + 2 * s * h * v
    if not fast_path:
        # Vocabulary factorization (models/realise.py): when B·S exceeds a
        # stream's row count the GRU/conv run per UNIQUE row (deduplicated
        # pinyin sequences / glyph images — install_pho_vocab_tables /
        # install_glyphs; V when the state predates dedup), so the
        # per-sentence share of their FLOPs shrinks by rows/(B·S).
        # Counting the smaller number keeps MFU honest — the factorized
        # step must not get credit for work it skipped. ``pho_rows`` /
        # ``res_rows``: the actual factorized row counts (default V).
        pho_rows = pho_rows or v
        res_rows = res_rows or v
        stream_scale = min(1.0, pho_rows / float(batch_size * s))
        if stream_scale < 1.0:
            # Factorized scan folds the input projection through the
            # 33-symbol pinyin alphabet (ops/gru.py
            # gru_last_hidden_factored): per step only the recurrent
            # 2·H·3H matmul plus a (·,33)×(33,3H) one-hot product remain.
            # Counting the folded (smaller) number keeps MFU honest.
            from realise_tpu.config import PHO2_VOCAB_SIZE

            gru_step = 6 * h * h + 2 * PHO2_VOCAB_SIZE * 3 * h
        else:
            # Per-token path: input 2·H·3H + recurrent 2·H·3H per step.
            gru_step = 12 * h * h
        fwd += stream_scale * s * cfg.pho2_max_len * gru_step
        # CharResNet: stride-2 basic blocks, 2 convs (+1×1 shortcut) each.
        from realise_tpu.ops.resnet import _channels

        chans = _channels(cfg.res_encoder, h)
        prev, sp, conv = cfg.num_fonts, cfg.glyph_size, 0
        for ch in chans:
            sp //= 2
            conv += 2 * 9 * prev * ch * sp * sp      # conv1 (stride 2)
            conv += 2 * 9 * ch * ch * sp * sp        # conv2
            conv += 2 * 1 * prev * ch * sp * sp      # 1×1 shortcut
            prev = ch
        res_scale = min(1.0, res_rows / float(batch_size * s))
        fwd += res_scale * s * conv
    return fwd * (3.0 if train else 1.0)


def build(tiny: bool, batch_size: int, train: bool, use_pallas: bool = False,
          infer: bool = True, cjk_chars: "int | None" = 7606):
    import jax

    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import (
        apply_realise,
        init_realise,
        precompute_inference_tables,
    )
    from realise_tpu.text.glyphs import build_glyph_table
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict

    # Full-scale vocabulary (21128, the BERT-Chinese size) unless smoke.
    # ``cjk_chars=7606`` reproduces the REAL vocab's ~36%-renderable
    # composition (hfl/chinese-roberta-wwm-ext; see build_synthetic_vocab),
    # which engages install_glyphs' dedup table exactly as real fonts do —
    # the r1-r4 bench vocab was ~99% CJK, an artificial 2.8× inflation of
    # the conv stream's row count. None = that legacy all-CJK worst case.
    _log("building vocab/tokenizer")
    vocab = build_synthetic_vocab(size=None if tiny else 21128,
                                  cjk_chars=None if tiny else cjk_chars)
    tokenizer = WordPieceTokenizer(vocab_to_dict(vocab))
    if tiny:
        cfg = config_for(
            "bert-pho2-res-arch3", vocab_size=len(tokenizer), hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
            pho_num_layers=1, out_num_layers=1, max_seq_length=32,
            max_position_embeddings=64, num_fonts=2)
    else:
        cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                         dtype="bfloat16")

    _log("rasterizing glyph table")
    glyphs = build_glyph_table(vocab, num_fonts=cfg.num_fonts,
                               use_traditional_font=cfg.use_traditional_font,
                               font_size=cfg.glyph_size)
    _log("initializing params (on host CPU, bulk transfer after)")
    feat = Featurizer(tokenizer, cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = init_realise(jax.random.PRNGKey(0), cfg,
                                     glyphs=glyphs,
                                     pho_tables=feat.pho2_tables())
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    _log("params on device")
    data = synthetic_dataset(tokenizer, num_examples=batch_size, min_len=20,
                             max_len=min(cfg.max_seq_length - 2, 100), seed=0)
    batch = {k: jax.numpy.asarray(v)
             for k, v in feat.device_batch(feat.featurize(data)).items()}

    infer_batch = {k: v for k, v in batch.items() if k != "tgt_idx"}
    infer_step = None
    if infer:
        _log("featurized; precomputing inference tables")
        vocab_pho_idx, vocab_pho_lens = feat.pho2_tables()
        tables = precompute_inference_tables(
            params, state, cfg,
            vocab_pho_idx=jax.numpy.asarray(vocab_pho_idx),
            vocab_pho_lens=jax.numpy.asarray(vocab_pho_lens))

        _log("tables ready")

        @jax.jit
        def infer_step(params, state, b):
            out = apply_realise(params, state, b, cfg, use_pallas=use_pallas,
                                inference_tables=tables)
            return out["logits"].argmax(-1)

    @jax.jit
    def full_forward_step(params, state, b):
        # Training-shaped forward: live GRU scan + CharResNet convs
        # (the reference's eval loop, src/models.py:806-870).
        out = apply_realise(params, state, b, cfg, use_pallas=use_pallas)
        return out["logits"].argmax(-1)

    trainer = None
    if train:
        from realise_tpu.training.trainer import Trainer

        # The jnp path rematerializes the encoder layer body: without it
        # the backward saves every layer's FFN intermediates + attention
        # probs (~12 GB at batch 256) and OOMs a 16 GB chip. The Pallas
        # train kernels need neither (their custom VJP stores only the
        # block inputs and recomputes in VMEM).
        train_cfg = cfg.replace(remat=True)
        trainer = Trainer(train_cfg, jax.tree.map(lambda x: x, params),
                          jax.tree.map(lambda x: x, state),
                          learning_rate=5e-5, total_steps=1000, seed=0,
                          use_pallas=use_pallas)

    return (infer_step, full_forward_step, trainer,
            (params, state, infer_batch, batch), batch_size, cfg,
            (tokenizer, feat))


def _sync(out):
    """Force REAL completion: fetch one element to the host.

    ``jax.block_until_ready`` is a no-op through the remote-TPU tunnel used
    here (measured: a 22-TFLOP chain 'completes' in 0.1 ms); only a host
    readback actually waits for the device queue to drain.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[:1])


def time_fn(fn, iters: int, warmup: int = 2):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny model on CPU")
    p.add_argument("--no-train", dest="train", action="store_false",
                   help="skip the training-step benchmark")
    p.add_argument("--train-only", action="store_true",
                   help="measure ONLY the training step (skips the "
                        "inference-table build — the fast lane for "
                        "training A/B experiments)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--use_pallas", dest="use_pallas", action="store_true",
                   default=None,
                   help="fused Pallas block kernels on the inference paths "
                        "(default: auto — on for real TPUs, measured 1.3x "
                        "end-to-end on v5e; OFF on CPU, where interpret "
                        "mode would time the emulator, not the model)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--e2e_steps", type=int, default=50,
                   help="sustained-training steps for the end-to-end "
                        "benchmark (Trainer.fit through the REAL host "
                        "input path: batch_iterator → Featurizer → "
                        "threaded_prefetch → device prefetch). 0 disables.")
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler trace of the timed inference "
                        "steps into this directory")
    p.add_argument("--train_trace_dir", default=None,
                   help="capture a jax.profiler trace of the timed training "
                        "steps into this directory")
    p.add_argument("--all_cjk_vocab", action="store_true",
                   help="legacy r1-r4 vocab composition (~99%% CJK, no "
                        "glyph dedup): the conv stream's artificial worst "
                        "case, kept for cross-round comparability. Default "
                        "is the real vocab's ~36%%-renderable composition.")
    args = p.parse_args()
    if args.train_only and not args.train:
        p.error("--train-only and --no-train are contradictory")

    if args.smoke:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from realise_tpu.utils.cache import enable_persistent_compile_cache

    # One-time-per-machine compiles (the table conv chunk, the step fns)
    # come from the on-disk cache on repeat runs — the round-1 bench paid
    # a ~15 min cold start before the first measurement.
    enable_persistent_compile_cache()

    if args.use_pallas is None:  # auto: kernels on real TPUs only
        from realise_tpu.cli.common import auto_use_pallas

        args.use_pallas = auto_use_pallas(None)
    bs = args.batch_size or (32 if args.smoke else 256)
    if args.train_only:
        args.train = True
    (infer_step, full_fwd, trainer, (params, state, infer_batch, batch),
     bs, cfg_full, (tokenizer, feat)) = build(
         tiny=args.smoke, batch_size=bs, train=args.train,
         use_pallas=args.use_pallas, infer=not args.train_only,
         cjk_chars=None if args.all_cjk_vocab else 7606)

    peak, kind = peak_flops()
    _log(f"device_kind={kind!r}, assumed bf16 peak {peak / 1e12:.0f} TFLOP/s")

    result = {}
    if not args.smoke:
        from realise_tpu.models.realise import res_conv_rows

        result["conv_rows"] = res_conv_rows(state)
        result["vocab_composition"] = ("all_cjk (legacy r1-r4)"
                                       if args.all_cjk_vocab
                                       else "realistic (~36% CJK, dedup)")
        _log(f"conv stream rows: {result['conv_rows']} "
             f"({result['vocab_composition']})")
    sent_per_sec, infer_mfu = None, None

    if not args.train_only:
        sent_per_sec, infer_mfu = _measure_inference(
            args, result, infer_step, full_fwd, params, state, infer_batch,
            bs, cfg_full, peak)

    # --- training step ---
    if trainer is not None:
        trainer = _measure_train(args, result, trainer, batch, bs,
                                 cfg_full, peak)
        if not args.smoke:
            _measure_train_realistic(args, result, trainer, tokenizer,
                                     feat, bs, cfg_full, peak)
        if args.e2e_steps > 0:
            _measure_train_e2e(args, result, trainer, tokenizer, feat, bs,
                               cfg_full)

    if args.train_only:
        # Dev A/B mode: the train numbers ARE the output. No training
        # baseline exists (REFERENCE_V100_SENTENCES_PER_SEC estimates the
        # reference's inference forward), so vs_baseline is null here.
        result.update({
            "metric": "arch3 training throughput (train-only mode)",
            "value": result.get("train_sentences_per_sec"),
            "unit": "sentences/sec/chip",
            "vs_baseline": None,
            "device_kind": kind,
            "assumed_peak_tflops": round(peak / 1e12),
        })
    else:
        result.update({
            "metric":
                "SIGHAN15-shape inference throughput (arch3, S=128, bf16)",
            "value": round(sent_per_sec, 1),
            "unit": "sentences/sec/chip",
            "vs_baseline":
                round(sent_per_sec / REFERENCE_V100_SENTENCES_PER_SEC, 2),
            "device_kind": kind,
            "assumed_peak_tflops": round(peak / 1e12),
        })
        if infer_mfu:
            result["infer_mfu"] = round(infer_mfu, 3)
    print(json.dumps(result))


def _stream_rows(state):
    """Actual factorized row counts for honest MFU accounting (0 → V)."""
    pho = state.get("pho_uniq_idx")
    res = state.get("res_uniq_images_nhwc", state.get("res_uniq_images"))
    return ((pho.shape[0] if pho is not None else 0),
            (res.shape[0] if res is not None else 0))


def _measure_inference(args, result, infer_step, full_fwd, params, state,
                       infer_batch, bs, cfg_full, peak):
    """Returns (sent_per_sec, infer_mfu) for the serving fast path; writes
    the full-forward numbers into ``result``."""
    # --- serving fast path (headline) ---
    compiled_flops(infer_step, params, state, infer_batch)
    infer_flops = bs * analytic_flops_per_sentence(cfg_full, fast_path=True,
                                                   train=False)
    if args.trace_dir:
        from realise_tpu.utils.profiler import trace

        with trace(args.trace_dir):
            time_fn(lambda: infer_step(params, state, infer_batch), iters=3)
        _log(f"wrote profiler trace to {args.trace_dir}")
    sec = time_fn(lambda: infer_step(params, state, infer_batch),
                  iters=args.iters)
    sent_per_sec = bs / sec
    infer_mfu = (infer_flops / sec / peak) if infer_flops else None
    _log(f"infer: {sent_per_sec:.1f} sent/s ({sec * 1e3:.2f} ms @ {bs}), "
         f"MFU {infer_mfu:.1%}" if infer_mfu else
         f"infer: {sent_per_sec:.1f} sent/s")

    # --- full forward (training-shaped eval) ---
    ff_sec = time_fn(lambda: full_fwd(params, state, infer_batch),
                     iters=max(args.iters // 2, 3))
    pho_rows, res_rows = _stream_rows(state)
    ff_flops = bs * analytic_flops_per_sentence(cfg_full, fast_path=False,
                                                train=False, batch_size=bs,
                                                pho_rows=pho_rows,
                                                res_rows=res_rows)
    result["full_forward_sentences_per_sec"] = round(bs / ff_sec, 1)
    result["full_forward_mfu"] = round(ff_flops / ff_sec / peak, 3)
    _log(f"full_forward: {bs / ff_sec:.1f} sent/s ({ff_sec * 1e3:.2f} ms), "
         f"MFU {ff_flops / ff_sec / peak:.1%}")
    return sent_per_sec, infer_mfu


def _train_lane_flops(trainer, cfg_full, bs, conv_slots: int):
    """Analytic train FLOPs for one batch, honest about the conv rows the
    SELECTED program actually convolves: ``conv_slots`` > 0 means the
    batch-unique compact program ran over that many rows (× the number of
    per-step conv calls); 0 means the full factorized table."""
    pho_rows, res_rows = _stream_rows(trainer.train_state.state)
    if conv_slots:
        groups = trainer._conv_data_shards * trainer.grad_accum_steps
        res_rows = conv_slots * groups
    return bs * analytic_flops_per_sentence(cfg_full, fast_path=False,
                                            train=True, batch_size=bs,
                                            pho_rows=pho_rows,
                                            res_rows=res_rows)


def _dispatch_lane(trainer, host_batch):
    """(step_fn_thunk, conv_slots) for the REAL dispatch path —
    Trainer.train_step with the host unique-row count and per-batch conv
    program selection included (the loop Trainer.fit runs)."""

    def one_step():
        return trainer.train_step(host_batch)

    conv_slots = 0
    if trainer._conv_auto:
        count = trainer._conv_unique_rows(host_batch["src_idx"])
        fn = trainer._select_train_step(count, host_batch["src_idx"].size)
        if fn is not trainer._train_step:
            conv_slots = next(k for k, v in trainer._conv_step_cache.items()
                              if v is fn)
    return one_step, conv_slots


def _measure_train(args, result, trainer, batch, bs, cfg_full, peak):
    """Headline train lane = the real dispatch path (Trainer.train_step:
    host put + unique-row count + conv program selection), on the same
    uniform synthetic batch as rounds 1-4. Secondary lanes: the raw
    full-table executable (`train_full_table_*`, the r1-r4 headline
    definition, for cross-round comparability) and a realistic
    Zipf-distributed text batch (`train_realistic_*`) where the
    batch-unique conv factorization actually engages — a 32768-token
    uniform draw touches 1−e^(−32768/rows) of the glyph table (~99% of
    the realistic 7.7k-row dedup table, ~79% of the legacy 21k one),
    which no compact program covers."""
    import jax
    import numpy as np

    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    ts = trainer.train_state
    step_arr = jax.numpy.asarray(0, jax.numpy.int32)
    lr_arr = jax.numpy.asarray(5e-5, jax.numpy.float32)
    dbatch = {k: v
              for k, v in trainer._put_batch(dict(host_batch),
                                             train=False).items()
              if k != "_conv_rows_max"}
    if args.use_pallas:
        # Guard the driver artifact: if the custom-VJP kernels fail to
        # compile on this toolchain, fall back to the jnp trainer
        # instead of dying without the JSON line.
        try:
            trainer._train_step.lower(ts.params, ts.state, ts.opt_state,
                                      dbatch, step_arr,
                                      trainer.base_rng, lr_arr).compile()
        except Exception as e:
            _log(f"pallas train step failed to compile ({e!r:.200}); "
                 f"falling back to the jnp training path")
            from realise_tpu.training.trainer import Trainer

            trainer = Trainer(trainer.cfg, ts.params, ts.state,
                              learning_rate=5e-5, total_steps=1000,
                              seed=0, use_pallas=False)
            ts = trainer.train_state
    compiled_flops(trainer._train_step, ts.params, ts.state,
                   ts.opt_state, dbatch, step_arr, trainer.base_rng,
                   lr_arr)

    # --- secondary: raw full-table executable (r1-r4 comparable) ---
    def raw_step():
        t = trainer.train_state
        p2, s2, o2, loss = trainer._train_step(
            t.params, t.state, t.opt_state, dbatch,
            step_arr, trainer.base_rng, lr_arr)
        trainer.train_state = type(t)(p2, s2, o2, t.step + 1)
        return loss

    if getattr(args, "train_trace_dir", None):
        from realise_tpu.utils.profiler import trace

        with trace(args.train_trace_dir):
            time_fn(raw_step, iters=3)
        _log(f"wrote train profiler trace to {args.train_trace_dir}")
    raw_sec = time_fn(raw_step, iters=max(args.iters // 2, 3))
    raw_flops = _train_lane_flops(trainer, cfg_full, bs, conv_slots=0)
    result["train_full_table_sentences_per_sec"] = round(bs / raw_sec, 1)
    result["train_full_table_mfu"] = round(raw_flops / raw_sec / peak, 3)
    _log(f"train full-table executable: {bs / raw_sec:.1f} sent/s "
         f"({raw_sec * 1e3:.1f} ms/step), MFU "
         f"{raw_flops / raw_sec / peak:.1%}")
    # The raw lane donates its buffers, leaving dbatch's arrays intact but
    # the train_state rebuilt — keep going on the same trainer.

    # --- headline: the real dispatch path on the same batch ---
    one_step, conv_slots = _dispatch_lane(trainer, host_batch)
    tsec = time_fn(one_step, iters=max(args.iters // 2, 3))
    train_flops = _train_lane_flops(trainer, cfg_full, bs, conv_slots)
    train_mfu = train_flops / tsec / peak
    result["train_sentences_per_sec"] = round(bs / tsec, 1)
    result["train_mfu"] = round(train_mfu, 3)
    result["train_conv_slots"] = conv_slots
    _log(f"train (dispatch path, conv program: "
         f"{conv_slots or 'full table'}): {bs / tsec:.1f} sent/s "
         f"({tsec * 1e3:.1f} ms/step), MFU {train_mfu:.1%}")
    # The pallas-compile fallback above may have replaced the trainer —
    # return it so the realistic/e2e lanes run the same (working) one.
    return trainer


def _measure_train_realistic(args, result, trainer, tokenizer, feat, bs,
                             cfg_full, peak):
    """Train throughput on realistic text: Zipf-distributed characters
    (what actual Chinese corpora look like — a 30k-token batch covers a
    few thousand distinct chars, not ~11k like the uniform draw). This is
    the lane where the batch-unique conv factorization engages a compact
    program; uniform stays the honest worst case."""
    import numpy as np

    from realise_tpu.data.dataset import synthetic_dataset

    data = synthetic_dataset(tokenizer, num_examples=bs, min_len=20,
                             max_len=min(cfg_full.max_seq_length - 2, 100),
                             seed=2, char_dist="zipf")
    host_batch = {k: np.asarray(v)
                  for k, v in feat.device_batch(feat.featurize(data)).items()}
    one_step, conv_slots = _dispatch_lane(trainer, host_batch)
    tsec = time_fn(one_step, iters=max(args.iters // 2, 3))
    flops = _train_lane_flops(trainer, cfg_full, bs, conv_slots)
    mfu = flops / tsec / peak
    result["train_realistic_sentences_per_sec"] = round(bs / tsec, 1)
    result["train_realistic_mfu"] = round(mfu, 3)
    result["train_realistic_conv_slots"] = conv_slots
    _log(f"train realistic text (zipf chars, conv program: "
         f"{conv_slots or 'full table'}): {bs / tsec:.1f} sent/s "
         f"({tsec * 1e3:.1f} ms/step), MFU {mfu:.1%}")


def _measure_train_e2e(args, result, trainer, tokenizer, feat, bs, cfg):
    """Sustained training through the REAL host input path.

    The reference's acknowledged bottleneck was per-step host featurization
    (src/run.py:68-123 + per-model build_batch, worked around by the
    experimental threaded prefetcher src/run_speedup.py:64-122). This
    framework removed it by design — AOT (V, P) pinyin tables + numpy
    featurization + a host prefetch thread + device prefetch — and this
    measurement PROVES it: ``train_e2e_ratio`` is sustained end-to-end
    sent/s over the step-only number; input-bound training would show < 1.

    A ratio slightly ABOVE 1 is expected, not an anomaly: the step-only
    headline times uniform-random full-length batches (the conv stream's
    worst case — usually no compact program fits), while fit() here runs
    real featurized sentences whose per-batch distinct-glyph counts let
    the Trainer select compact batch-unique conv programs for some
    batches. The e2e number is the honest sustained rate on data-shaped
    input; the step lane is the honest worst-case kernel rate.
    """
    from realise_tpu.data.dataset import (
        batch_iterator,
        synthetic_dataset,
        threaded_prefetch,
    )

    steps = args.e2e_steps
    data = synthetic_dataset(tokenizer, num_examples=bs * 8, min_len=20,
                             max_len=min(cfg.max_seq_length - 2, 100),
                             seed=1)

    def batches():
        epoch = 0
        while True:  # fit() stops at max_steps
            for ex in batch_iterator(data, bs, shuffle=True, seed=epoch,
                                     drop_remainder=True):
                yield feat.device_batch(feat.featurize(ex))
            epoch += 1

    # Warm the fit-path executable (same shapes as the step bench, so this
    # is cache-hit compilation; the timed run below starts hot).
    trainer.fit(threaded_prefetch(batches(), size=3),
                max_steps=trainer.train_state.step + 3, logging_steps=0)
    summary = trainer.fit(threaded_prefetch(batches(), size=3),
                          max_steps=trainer.train_state.step + steps,
                          logging_steps=0)
    e2e = summary["steps_per_sec"] * bs
    result["train_e2e_sentences_per_sec"] = round(e2e, 1)
    step_only = result.get("train_sentences_per_sec")
    if step_only:
        result["train_e2e_ratio"] = round(e2e / step_only, 3)
    _log(f"train e2e ({steps} steps through the host input path): "
         f"{e2e:.1f} sent/s (ratio vs step-only: "
         f"{result.get('train_e2e_ratio')})")


if __name__ == "__main__":
    main()
