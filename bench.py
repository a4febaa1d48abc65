"""Benchmark harness: flagship-model throughput on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sentences/sec/chip", "vs_baseline": N}

Headline metric: SIGHAN15-shaped inference throughput (B×128 batches of the
full bert-pho2-res-arch3 model, 21128 vocab, bf16) using the serving fast
path (precomputed per-vocab GRU/glyph tables — realise_tpu.models.realise).
The reference publishes no speed numbers (SURVEY.md §6), so the baseline is
an engineering estimate of the torch reference on its era hardware (V100,
fp32, torch 1.2):

    per-sentence forward ≈ 19 BERT layers (12 sem + 4 pho + 3 out) ≈ 35
    GFLOPs at S=128 + CharResNet on 128 glyph stacks ≈ 6 GFLOPs + vocab
    classifier ≈ 8 GFLOPs ⇒ ~49 GFLOPs; V100 fp32 ≈ 14 TFLOP/s peak at a
    generous 30% utilization ⇒ ~85 sentences/sec. We round up to 100 to be
    conservative (vs_baseline understates our speedup).

Usage:
    python bench.py                  # full model on the available accelerator
    python bench.py --train          # also benchmark the training step
    python bench.py --smoke          # tiny model on CPU (CI smoke)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_V100_SENTENCES_PER_SEC = 100.0  # documented estimate, see header


def _log(msg):
    import sys, time

    print(f"[bench +{time.perf_counter() - _T0:.1f}s] {msg}", file=sys.stderr,
          flush=True)


_T0 = __import__("time").perf_counter()


def build(tiny: bool, batch_size: int, train: bool, use_pallas: bool = False):
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
    _log("building vocab/tokenizer")
    vocab = build_synthetic_vocab(size=None if tiny else 21128)
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
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = init_realise(jax.random.PRNGKey(0), cfg, glyphs=glyphs)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    _log("params on device")

    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=batch_size, min_len=20,
                             max_len=min(cfg.max_seq_length - 2, 100), seed=0)
    batch = {k: jax.numpy.asarray(v)
             for k, v in feat.device_batch(feat.featurize(data)).items()}

    _log("featurized; precomputing inference tables")
    vocab_pho_idx, vocab_pho_lens = feat.pho2_tables()
    tables = precompute_inference_tables(
        params, state, cfg,
        vocab_pho_idx=jax.numpy.asarray(vocab_pho_idx),
        vocab_pho_lens=jax.numpy.asarray(vocab_pho_lens))

    _log("tables ready")
    infer_batch = {k: v for k, v in batch.items() if k != "tgt_idx"}

    @jax.jit
    def infer_step(params, state, b):
        out = apply_realise(params, state, b, cfg, use_pallas=use_pallas,
                            inference_tables=tables)
        return out["logits"].argmax(-1)

    train_fn = None
    if train:
        from realise_tpu.training.trainer import Trainer

        # Training rematerializes the encoder layer body: without it the
        # backward saves every layer's FFN intermediates + attention probs
        # (~12 GB at batch 256) and OOMs a 16 GB chip.
        train_cfg = cfg.replace(remat=True)
        trainer = Trainer(train_cfg, jax.tree.map(lambda x: x, params),
                          jax.tree.map(lambda x: x, state),
                          learning_rate=5e-5, total_steps=1000, seed=0)
        train_fn = trainer, batch

    return infer_step, (params, state, infer_batch), train_fn, batch_size


def time_fn(fn, iters: int, warmup: int = 2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="tiny model on CPU")
    p.add_argument("--train", action="store_true",
                   help="benchmark the training step too (stderr report)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    if args.smoke:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    batch_size = args.batch_size or (32 if args.smoke else 256)
    infer_step, (params, state, infer_batch), train_fn, bs = build(
        tiny=args.smoke, batch_size=batch_size, train=args.train,
        use_pallas=args.use_pallas)

    build_done = True
    sec = time_fn(lambda: infer_step(params, state, infer_batch),
                  iters=args.iters)
    _log("inference timed")
    sent_per_sec = bs / sec

    import sys

    if train_fn is not None:
        trainer, tbatch = train_fn
        tsec = time_fn(lambda: trainer._train_step(
            trainer.train_state.params, trainer.train_state.state,
            trainer.train_state.opt_state, trainer._put_batch(tbatch),
            0), iters=max(args.iters // 2, 3))
        print(f"train: {bs / tsec:.1f} sentences/sec/chip "
              f"({tsec * 1e3:.1f} ms/step @ batch {bs})", file=sys.stderr)

    print(f"infer: {sent_per_sec:.1f} sentences/sec/chip "
          f"({sec * 1e3:.2f} ms @ batch {bs})", file=sys.stderr)

    print(json.dumps({
        "metric": "SIGHAN15-shape inference throughput (arch3, S=128, bf16)",
        "value": round(sent_per_sec, 1),
        "unit": "sentences/sec/chip",
        "vs_baseline": round(sent_per_sec / REFERENCE_V100_SENTENCES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
