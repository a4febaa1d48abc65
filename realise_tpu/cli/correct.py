"""Interactive / batch spelling-correction CLI (serving surface).

Reads Chinese sentences (stdin or --input file, one per line), runs the
model with the precomputed-table serving fast path, prints corrected
sentences. This is the user-facing correction tool the reference implies but
never ships (its closest surface is the batch scorer src/test.py). For a
long-running daemon use realise_tpu.cli.serve; both wrap
:class:`realise_tpu.serving.Corrector`.

Example:
    echo "我爱北经。" | python -m realise_tpu.cli.correct --ckpt_dir ckpts
    python -m realise_tpu.cli.correct --ckpt_dir /tmp/out --synthetic \
        --input sents.txt --show_edits
"""

from __future__ import annotations

import argparse
import sys

from realise_tpu.cli.common import force_platform, setup_logging, logger


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
    args = build_parser().parse_args(argv)
    setup_logging(verbose=False)
    force_platform(args.platform)

    from realise_tpu.cli.common import resolve_vocab_path
    from realise_tpu.serving import Corrector

    corrector = Corrector(
        args.ckpt_dir,
        vocab_path=resolve_vocab_path(args.vocab_path, args.data_dir),
        batch_size=args.batch_size, use_pallas=args.use_pallas,
        fast_path=not args.no_fast_path,
        native_featurizer=args.native_featurizer,
        synthetic_vocab=args.synthetic)
    if corrector.native is not None:
        logger.info("using native C++ featurizer (%d-token vocab)",
                    corrector.native.vocab_size)

    if args.input is None and sys.stdin.isatty():
        # Truly interactive: correct per line as typed — buffering to EOF
        # would print nothing until Ctrl-D.
        corrector.warmup()
        print("enter sentences (Ctrl-D to finish):", file=sys.stderr)
        for ln in sys.stdin:
            s = ln.strip()
            if not s:
                continue
            if args.show_edits:
                r = corrector.correct_with_edits([s])[0]
                edits = [f"{e['pos']}:{e['wrong']}→{e['correct']}"
                         for e in r["edits"]]
                print(f"{r['corrected']}\t{' '.join(edits) if edits else '-'}",
                      flush=True)
            else:
                print(corrector.correct([s])[0], flush=True)
        return 0

    source = open(args.input, encoding="utf-8") if args.input else sys.stdin
    sentences = [ln.strip() for ln in source if ln.strip()]
    if args.input:
        source.close()

    if args.show_edits:
        for r in corrector.correct_with_edits(sentences):
            edits = [f"{e['pos']}:{e['wrong']}→{e['correct']}"
                     for e in r["edits"]]
            print(f"{r['corrected']}\t{' '.join(edits) if edits else '-'}")
    else:
        for corrected in corrector.correct(sentences):
            print(corrected)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
