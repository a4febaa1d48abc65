"""Interactive / batch spelling-correction CLI (serving surface).

Reads Chinese sentences (stdin or --input file, one per line), runs the
model with the precomputed-table serving fast path, prints corrected
sentences. This is the user-facing correction tool the reference implies but
never ships (its closest surface is the batch scorer src/test.py).

Example:
    echo "我爱北经。" | python -m realise_tpu.cli.correct --ckpt_dir ckpts
    python -m realise_tpu.cli.correct --ckpt_dir /tmp/out --synthetic \
        --input sents.txt --show_edits
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from realise_tpu.cli.common import (
    auto_use_pallas,
    build_tokenizer,
    force_platform,
    setup_logging,
    logger,
)
from realise_tpu.data.features import Featurizer
from realise_tpu.eval.metric import Metric
from realise_tpu.models.realise import apply_realise, precompute_inference_tables
from realise_tpu.training.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    load_config,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--input", default=None, help="file of sentences (default stdin)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--show_edits", action="store_true",
                   help="append detected (pos, wrong→correct) edits")
    p.add_argument("--no_fast_path", action="store_true",
                   help="skip table precompute (slower, lower startup cost)")
    p.add_argument("--native_featurizer", action="store_true",
                   help="tokenize + assemble batches with the C++ featurizer "
                        "(csrc/featurizer.cpp); requires --vocab_path")
    p.add_argument("--use_pallas", action="store_true", default=None,
                   help="fused block kernels (default: auto — on for TPU)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    import jax

    args = build_parser().parse_args(argv)
    setup_logging(verbose=False)
    force_platform(args.platform)
    args.use_pallas = auto_use_pallas(args.use_pallas)

    ckpts = list_checkpoints(args.ckpt_dir)
    ckpt_path = ckpts[-1][1] if ckpts else args.ckpt_dir
    cfg = load_config(ckpt_path)
    restored = load_checkpoint(ckpt_path)
    params = jax.tree.map(jax.numpy.asarray, restored["params"])
    state = jax.tree.map(jax.numpy.asarray, restored["state"])

    args.font_paths = None
    tokenizer = build_tokenizer(args)
    featurizer = Featurizer(tokenizer, cfg)

    native = None
    if args.native_featurizer:
        import os as _os

        from realise_tpu.data.native import NativeFeaturizer

        vocab_path = args.vocab_path
        if vocab_path is None and args.data_dir:
            vocab_path = _os.path.join(args.data_dir, "vocab.txt")
        if vocab_path is None:
            import tempfile

            vocab_path = tokenizer.save_pretrained(tempfile.mkdtemp())
        native = NativeFeaturizer(vocab_path)
        logger.info("using native C++ featurizer (%d-token vocab)",
                    native.vocab_size)

    tables = None
    if not args.no_fast_path:
        idx, lens = featurizer.pho2_tables()
        tables = precompute_inference_tables(
            params, state, cfg,
            vocab_pho_idx=jax.numpy.asarray(idx),
            vocab_pho_lens=jax.numpy.asarray(lens))

    @jax.jit
    def step(params, state, batch):
        out = apply_realise(params, state, batch, cfg,
                            use_pallas=args.use_pallas,
                            inference_tables=tables)
        return out["logits"].argmax(-1)

    source = open(args.input, encoding="utf-8") if args.input else sys.stdin
    sentences = [ln.strip() for ln in source if ln.strip()]
    if args.input:
        source.close()

    metric = Metric(tokenizer)
    for start in range(0, len(sentences), args.batch_size):
        chunk = sentences[start : start + args.batch_size]
        host = featurizer.featurize_raw(chunk, native=native)
        preds = np.asarray(step(params, state, featurizer.device_batch(host)))
        host["pred_idx"] = preds
        for i, sent in enumerate(chunk):
            pred_txt, _ = metric.process_batch_item(host, i)
            corrected = pred_txt.split("\t", 1)[1]
            if args.show_edits:
                edits = [f"{p}:{a}→{b}"
                         for p, (a, b) in enumerate(zip(sent, corrected), 1)
                         if a != b]
                print(f"{corrected}\t{' '.join(edits) if edits else '-'}")
            else:
                print(corrected)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
