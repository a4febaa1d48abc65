"""Phonetic-encoder pretraining CLI — the pretrain_pho.sh equivalent.

Objective (reference: src/run_pretrain.py, pretrain_pho.sh:3-16): recover
each character's identity from its pinyin alone. Inputs are target ids; the
GRU + pho BERT encode pinyin; an MLM head predicts the char; loss covers
Chinese-char positions. Eval reports token accuracy (run_pretrain.py:242-251).

Example (smoke):
    python -m realise_tpu.cli.pretrain_pho --synthetic --tiny \
        --max_steps 4 --output_dir /tmp/pho
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from realise_tpu.cli.common import (
    add_common_args,
    auto_use_pallas,
    build_config,
    build_mesh,
    build_tokenizer,
    force_platform,
    load_dataset,
    setup_logging,
    write_json,
    zero_padding_loss,
    logger,
)
from realise_tpu.parallel.distributed import is_main_process
from realise_tpu.data.dataset import batch_iterator, pad_examples
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import init_pretrain
from realise_tpu.training.checkpoint import save_checkpoint
from realise_tpu.training.trainer import Trainer


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--train_file", default="trainall.times2.pkl")
    p.add_argument("--dev_file", default="dev.pkl")
    p.add_argument("--per_device_train_batch_size", type=int, default=64)
    p.add_argument("--gradient_accumulation_steps", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--max_steps", type=int, default=30000)
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--save_steps", type=int, default=1000)
    return p


def token_accuracy(trainer, data, featurizer, batch_size=64):
    """Chinese-char token accuracy (run_pretrain.py:242-251)."""
    correct = total = 0
    losses = []
    # Unpadded iteration + per-device padding: padded duplicate rows must
    # not inflate the token counts (same bug class as the round-1 eval).
    weights = []
    for examples in batch_iterator(data, batch_size, pad_final=False):
        n = len(examples)
        host = featurizer.featurize_pho_pretrain(
            pad_examples(examples, batch_size))
        feed = featurizer.device_batch(host)
        feed = zero_padding_loss(feed, n)
        out = trainer.eval_step(feed)
        preds = np.asarray(out["pred_idx"])[:n]
        mask = host["loss_masks"][:n].astype(bool)
        host = {k: (v[:n] if hasattr(v, "__getitem__") else v)
                for k, v in host.items()}
        correct += int((preds[mask] == host["tgt_idx"][mask]).sum())
        total += int(mask.sum())
        if "loss" in out:
            losses.append(float(out["loss"]))
            weights.append(int(mask.sum()))
    return {"accuracy": correct / max(total, 1),
            "avg_loss": (float(np.average(losses, weights=weights))
                         if losses and sum(weights) else float("nan"))}


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.model_type = "pho2-pretrain"
    setup_logging()
    force_platform(args.platform)

    tokenizer = build_tokenizer(args)
    cfg = build_config(args, len(tokenizer))
    featurizer = Featurizer(tokenizer, cfg)
    mesh = build_mesh(args)

    params, state = init_pretrain(jax.random.PRNGKey(args.seed), cfg,
                                  pho_tables=featurizer.pho2_tables())
    batch_size = args.per_device_train_batch_size
    if mesh is not None and "data" in mesh.axis_names:
        batch_size *= mesh.shape["data"]
    # Reference flag semantics (pretrain_pho.sh: bs 64, accum 2 -> UPDATE
    # batch 128): the Trainer takes the full update batch per step and
    # microbatches in-jit, so the stream must yield bs x accum examples.
    batch_size *= args.gradient_accumulation_steps

    trainer = Trainer(cfg, params, state,
                      learning_rate=args.learning_rate,
                      warmup_steps=args.warmup_steps,
                      total_steps=max(args.max_steps, 1),
                      grad_accum_steps=args.gradient_accumulation_steps,
                      mesh=mesh, use_pallas=auto_use_pallas(args.use_pallas),
                      pretrain=True, seed=args.seed)

    train_data = load_dataset(args, tokenizer, args.train_file,
                              num_synthetic=256, seed=args.seed)

    def batches():
        epoch = 0
        while True:
            for ex in batch_iterator(train_data, batch_size, shuffle=True,
                                     seed=args.seed + epoch,
                                     pad_final=False):
                n = len(ex)
                feed = featurizer.featurize_pho_pretrain(
                    pad_examples(ex, batch_size))
                yield featurizer.device_batch(zero_padding_loss(feed, n))
            epoch += 1

    def save_fn(step, ts):
        save_checkpoint(args.output_dir, step, ts.params, ts.state,
                        ts.opt_state, cfg=cfg,
                        training_args=vars(args))

    trainer.fit(batches(), max_steps=args.max_steps,
                logging_steps=args.logging_steps,
                save_steps=args.save_steps, save_fn=save_fn)
    save_fn(trainer.train_state.step, trainer.train_state)

    dev = load_dataset(args, tokenizer, args.dev_file, num_synthetic=64,
                       seed=args.seed + 1)
    res = token_accuracy(trainer, dev, featurizer)
    logger.info("pho-pretrain dev: %s", res)
    if is_main_process():
        write_json(f"{args.output_dir}/dev_results.json", res)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
