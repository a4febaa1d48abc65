"""Standalone evaluation CLI — the test.sh / src/test.py equivalent.

Reference flow (reference: src/test.py:83-161): recover the model config
saved beside the checkpoint, load the weights, forward the test pkl, score
with the SIGHAN metric (applying remove_de for year 13).

Example:
    python -m realise_tpu.cli.test --ckpt_dir /tmp/out --synthetic
    python -m realise_tpu.cli.test --ckpt_dir ckpts --data_dir data \
        --testset_year 13 --ckpt_num -1
"""

from __future__ import annotations

import argparse
import os

from realise_tpu.cli.common import (
    auto_use_pallas,
    build_mesh,
    build_tokenizer,
    evaluate_model,
    force_platform,
    load_dataset,
    setup_logging,
    write_json,
    logger,
)
from realise_tpu.data.features import Featurizer
from realise_tpu.training.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    load_config,
)
from realise_tpu.training.trainer import Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--ckpt_num", type=int, default=-1,
                   help="checkpoint step to load; -1 = latest (src/test.py:85-90)")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--testset_year", type=int, default=15,
                   help="13/14/15 — selects test.sighanNN.pkl and applies "
                        "remove_de for 13 (src/test.py:152-159)")
    p.add_argument("--test_file", default=None)
    p.add_argument("--label_file", default=None)
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--use_pallas", action="store_true", default=None,
                   help="fused block kernels (default: auto — on for TPU)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--mesh", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()
    force_platform(args.platform)

    ckpts = list_checkpoints(args.ckpt_dir)
    if ckpts:
        if args.ckpt_num == -1:
            step, ckpt_path = ckpts[-1]
        else:
            matches = [c for c in ckpts if c[0] == args.ckpt_num]
            if not matches:
                raise SystemExit(
                    f"no saved_ckpt-{args.ckpt_num} under {args.ckpt_dir}; "
                    f"available: {[s for s, _ in ckpts]}")
            step, ckpt_path = matches[0]
    else:
        # The ckpt_dir may itself be a checkpoint directory.
        if not os.path.exists(os.path.join(args.ckpt_dir, "ckpt")):
            raise SystemExit(f"no checkpoints found under {args.ckpt_dir}")
        if args.ckpt_num != -1:
            # Silently evaluating THIS directory would attribute results
            # to the wrong step.
            raise SystemExit(
                f"--ckpt_num {args.ckpt_num} given, but {args.ckpt_dir} is "
                f"itself a checkpoint directory (no saved_ckpt-* children "
                f"to select from)")
        step, ckpt_path = -1, args.ckpt_dir

    cfg = load_config(ckpt_path)
    logger.info("loaded config: model_type=%s step=%s", cfg.model_type, step)

    args.font_paths = None  # glyphs come from the checkpoint state
    tokenizer = build_tokenizer(args)
    if len(tokenizer) != cfg.vocab_size:
        raise SystemExit(
            f"tokenizer vocab ({len(tokenizer)}) != model vocab "
            f"({cfg.vocab_size}) — pass the matching --vocab_path")
    featurizer = Featurizer(tokenizer, cfg)

    restored = load_checkpoint(ckpt_path)
    import jax
    import jax.numpy as jnp

    # Device arrays up front — raw numpy params would re-upload the model
    # on every jitted eval batch.
    trainer = Trainer(cfg, jax.tree.map(jnp.asarray, restored["params"]),
                      jax.tree.map(jnp.asarray, restored["state"]),
                      mesh=build_mesh(args),
                      use_pallas=auto_use_pallas(args.use_pallas),
                      table_cache_dir=ckpt_path)

    test_file = args.test_file or f"test.sighan{args.testset_year}.pkl"
    label_file = args.label_file or f"test.sighan{args.testset_year}.lbl.tsv"
    data = load_dataset(args, tokenizer, test_file, num_synthetic=64, seed=99)
    label = (os.path.join(args.data_dir, label_file)
             if args.data_dir and not args.synthetic else None)
    if label and not os.path.exists(label):
        logger.warning("label file %s not found — deriving gold labels "
                       "from the dataset's src/tgt instead", label)
        label = None

    out_dir = args.output_dir or os.path.join(args.ckpt_dir, "test_output")
    res = evaluate_model(trainer, data, featurizer, tokenizer, out_dir,
                         prefix=f"sighan{args.testset_year}",
                         batch_size=args.eval_batch_size, label_path=label,
                         should_remove_de=(args.testset_year == 13))
    for k in sorted(res):
        print(f"{k}: {res[k]:.4f}" if isinstance(res[k], float) else f"{k}: {res[k]}")
    from realise_tpu.parallel.distributed import is_main_process

    if is_main_process():
        write_json(os.path.join(out_dir, "test_results.json"), res)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
