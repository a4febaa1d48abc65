"""Checkpoint-merge CLI — the merge.py equivalent.

Overlays pho2-pretrain and res-pretrain checkpoints onto a base arch3 init
and writes a merged checkpoint to initialize fine-tuning from (reference:
merge.py:5-38).

Example:
    python -m realise_tpu.cli.merge --base_ckpt base/saved_ckpt-0 \
        --pho_ckpt pho/saved_ckpt-3 --res_ckpt res/saved_ckpt-2 \
        --output_dir merged
"""

from __future__ import annotations

import argparse

import jax

from realise_tpu.cli.common import force_platform, setup_logging, logger
from realise_tpu.training.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    load_config,
    save_checkpoint,
)
from realise_tpu.training.merge import merge_params


def _resolve(path):
    """Accept either a run dir (pick latest saved_ckpt-*) or a ckpt dir."""
    ckpts = list_checkpoints(path)
    return ckpts[-1][1] if ckpts else path


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_ckpt", required=True,
                   help="base arch3 checkpoint (e.g. imported HF weights)")
    p.add_argument("--pho_ckpt", default=None)
    p.add_argument("--res_ckpt", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()
    force_platform(args.platform)

    base_dir = _resolve(args.base_ckpt)
    base = load_checkpoint(base_dir)
    cfg = load_config(base_dir)
    pho = load_checkpoint(_resolve(args.pho_ckpt)) if args.pho_ckpt else None
    res = load_checkpoint(_resolve(args.res_ckpt)) if args.res_ckpt else None

    params, state = merge_params(
        base["params"], base["state"],
        pho_params=pho["params"] if pho else None,
        res_params=res["params"] if res else None,
        res_state=res["state"] if res else None)

    out = save_checkpoint(args.output_dir, 0, params, state, cfg=cfg,
                          training_args={"merged_from": {
                              "base": base_dir,
                              "pho": args.pho_ckpt,
                              "res": args.res_ckpt}})
    logger.info("merged checkpoint written to %s", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
