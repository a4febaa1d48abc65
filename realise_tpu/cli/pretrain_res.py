"""Glyph-encoder pretraining CLI — the pretrain_res.sh equivalent.

Objective (reference: src/run_res_pretrain.py, pretrain_res.sh:3-13): the
dataset is simply every single-Chinese-char entry of the vocabulary
(run_res_pretrain.py:45-54); CharResNet must classify each char from its
glyph image stack (src/models.py:1473-1488). Eval = classification accuracy.

Example (smoke):
    python -m realise_tpu.cli.pretrain_res --synthetic --tiny \
        --num_train_epochs 1 --output_dir /tmp/res
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from realise_tpu.cli.common import (
    add_common_args,
    auto_use_pallas,
    build_config,
    build_glyphs,
    build_mesh,
    build_tokenizer,
    force_platform,
    setup_logging,
    write_json,
    logger,
)
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import init_pretrain
from realise_tpu.training.checkpoint import save_checkpoint
from realise_tpu.training.trainer import Trainer


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--per_device_train_batch_size", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--num_train_epochs", type=float, default=8)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--logging_steps", type=int, default=50)
    p.add_argument("--save_steps", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.model_type = "res-pretrain"
    setup_logging()
    force_platform(args.platform)

    tokenizer = build_tokenizer(args)
    cfg = build_config(args, len(tokenizer))
    featurizer = Featurizer(tokenizer, cfg)
    mesh = build_mesh(args)
    glyphs = build_glyphs(args, tokenizer, cfg)

    params, state = init_pretrain(jax.random.PRNGKey(args.seed), cfg,
                                  glyphs=glyphs)

    # Dataset: ids of single-Chinese-char vocab entries (run_res_pretrain.py:45-54).
    char_ids = np.nonzero(featurizer.cjk_token_mask())[0].astype(np.int32)
    logger.info("res-pretrain over %d chars", len(char_ids))
    batch_size = min(args.per_device_train_batch_size, len(char_ids))
    if mesh is not None and "data" in mesh.axis_names:
        batch_size = min(batch_size * mesh.shape["data"], len(char_ids))
        batch_size -= batch_size % mesh.shape["data"]
    if batch_size <= 0:
        raise SystemExit(
            f"res-pretrain needs at least one CJK vocab char per data-mesh "
            f"shard (have {len(char_ids)} chars"
            + (f", data axis {mesh.shape['data']}" if mesh is not None
               and "data" in mesh.axis_names else "")
            + ") — check the vocab file")
    steps_per_epoch = max(len(char_ids) // batch_size, 1)
    total = (args.max_steps if args.max_steps > 0
             else int(steps_per_epoch * args.num_train_epochs))

    trainer = Trainer(cfg, params, state, learning_rate=args.learning_rate,
                      warmup_steps=0, total_steps=max(total, 1), mesh=mesh,
                      use_pallas=auto_use_pallas(args.use_pallas), pretrain=True,
                      seed=args.seed)

    rng = np.random.default_rng(args.seed)

    def batches():
        while True:
            order = rng.permutation(len(char_ids))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                yield {"char_idx": char_ids[order[i : i + batch_size]]}

    def save_fn(step, ts):
        save_checkpoint(args.output_dir, step, ts.params, ts.state,
                        ts.opt_state, cfg=cfg, training_args=vars(args))

    trainer.fit(batches(), max_steps=total,
                logging_steps=args.logging_steps,
                save_steps=args.save_steps,
                save_fn=save_fn if args.save_steps else None)
    save_fn(trainer.train_state.step, trainer.train_state)

    # Eval: classification accuracy over the full char set
    # (run_res_pretrain.py:229-235).
    correct = 0
    for i in range(0, len(char_ids), batch_size):
        chunk = char_ids[i : i + batch_size]
        n = len(chunk)
        if n < batch_size:
            # Pad to the static batch shape; score only the true rows
            # (previously the mesh path dropped the tail from the numerator
            # while keeping it in the denominator).
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_size - n)])
        out = trainer.eval_step({"char_idx": chunk})
        preds = np.asarray(out["pred_idx"])
        correct += int((preds.reshape(-1)[:n] == chunk[:n]).sum())
    acc = correct / max(len(char_ids), 1)
    logger.info("res-pretrain accuracy: %.4f", acc)
    from realise_tpu.parallel.distributed import is_main_process

    if is_main_process():
        write_json(f"{args.output_dir}/dev_results.json",
                   {"accuracy": acc})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
