"""One-command SIGHAN accuracy-parity run against a released torch checkpoint.

Given a data directory holding the reference's processed assets and one of
its released fine-tuned checkpoints, this tool imports the torch weights,
evaluates SIGHAN 13/14/15 exactly the way the reference's test pipeline
does (src/test.py:83-161; remove_de on year 13, src/test.py:158), and
prints each year's sentence-level metrics next to the published numbers
(BASELINE.md / reference README.md:92-116), flagging any |ΔC-F| or |ΔD-F|
beyond the ±0.3 target.

Expected data-dir layout (the reference's own processed layout):

    data_dir/
      vocab.txt
      test.sighan13.pkl   test.sighan13.lbl.tsv
      test.sighan14.pkl   test.sighan14.lbl.tsv
      test.sighan15.pkl   test.sighan15.lbl.tsv

Checkpoint: a directory holding ``pytorch_model.bin`` (or a path to the
.bin itself). Glyphs come from the checkpoint's ``char_images_multifonts``
buffer when present, else are rasterized from ``--font_paths``.

Usage:
    python tools/verify_parity.py --data_dir DATA --torch_ckpt CKPT
    python tools/verify_parity.py --smoke        # synthetic end-to-end check

The moment the real corpora + released checkpoints are present, parity is
this single invocation; ``--smoke`` proves the mechanics (import → eval →
table) with synthetic stand-ins so the path stays tested in CI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published reference numbers (reference README.md:98,107,116; BASELINE.md).
PUBLISHED = {
    15: {"sent-detect-acc": 84.7, "sent-detect-p": 77.3, "sent-detect-r": 81.3,
         "sent-detect-f1": 79.3, "sent-correct-acc": 84.0,
         "sent-correct-p": 75.9, "sent-correct-r": 79.9,
         "sent-correct-f1": 77.8},
    14: {"sent-detect-acc": 78.4, "sent-detect-p": 67.8, "sent-detect-r": 71.5,
         "sent-detect-f1": 69.6, "sent-correct-acc": 77.7,
         "sent-correct-p": 66.3, "sent-correct-r": 70.0,
         "sent-correct-f1": 68.1},
    13: {"sent-detect-acc": 82.7, "sent-detect-p": 88.6, "sent-detect-r": 82.5,
         "sent-detect-f1": 85.4, "sent-correct-acc": 81.4,
         "sent-correct-p": 87.2, "sent-correct-r": 81.2,
         "sent-correct-f1": 84.1},
}

F1_KEYS = ("sent-detect-f1", "sent-correct-f1")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--torch_ckpt", default=None,
                   help="released checkpoint dir (pytorch_model.bin) or .bin")
    p.add_argument("--model_type", default="bert-pho2-res-arch3")
    p.add_argument("--years", default="13,14,15")
    p.add_argument("--font_paths", default=None,
                   help="comma-separated TTFs if the checkpoint lacks "
                        "char_images_multifonts")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--tolerance", type=float, default=0.3,
                   help="max |Δ| on the F1 columns before failing")
    p.add_argument("--platform", default=None)
    p.add_argument("--use_pallas", action="store_true", default=None)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--smoke", action="store_true",
                   help="synthetic vocab/data/weights — exercises the full "
                        "import→eval→table path without real assets")
    return p


def load_state_dict(path: str):
    from realise_tpu.models.torch_import import load_torch_bin

    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_model.bin")
    return load_torch_bin(path)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.smoke and not (args.data_dir and args.torch_ckpt):
        raise SystemExit("need --data_dir and --torch_ckpt (or --smoke)")

    from realise_tpu.cli.common import (auto_use_pallas, evaluate_model,
                                        force_platform, setup_logging,
                                        write_json)
    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.models.torch_import import (import_realise_state_dict,
                                                 normalize_state_dict,
                                                 overlay_params)
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict
    from realise_tpu.training.trainer import Trainer

    import jax
    import numpy as np

    setup_logging()
    force_platform(args.platform)

    # ----------------------------------------------------------- tokenizer
    if args.smoke:
        tokenizer = WordPieceTokenizer(vocab_to_dict(build_synthetic_vocab()))
    else:
        tokenizer = WordPieceTokenizer.from_pretrained(
            os.path.join(args.data_dir, "vocab.txt"))

    cfg = config_for(args.model_type, vocab_size=len(tokenizer))
    if args.smoke:
        cfg = config_for(
            args.model_type, vocab_size=len(tokenizer), hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
            pho_num_layers=1, out_num_layers=1, max_seq_length=32,
            max_position_embeddings=64, num_fonts=2)

    # ------------------------------------------------------ import weights
    if args.smoke:
        sd = _smoke_state_dict(cfg)
    else:
        sd = normalize_state_dict(load_state_dict(args.torch_ckpt))
    imported_params, imported_state = import_realise_state_dict(sd, cfg)

    glyphs = imported_state.get("char_images")
    if glyphs is None and cfg.with_res:
        if not args.font_paths:
            raise SystemExit(
                "checkpoint carries no char_images_multifonts — pass "
                "--font_paths simhei.ttf,xiaozhuan.ttf[,...]")
        from realise_tpu.text.glyphs import build_glyph_table

        vocab = tokenizer.convert_ids_to_tokens(range(len(tokenizer)))
        glyphs = build_glyph_table(
            vocab, num_fonts=cfg.num_fonts,
            use_traditional_font=cfg.use_traditional_font,
            font_paths=args.font_paths.split(","), font_size=cfg.glyph_size)

    feat = Featurizer(tokenizer, cfg)
    params, state = init_realise(jax.random.PRNGKey(0), cfg, glyphs=glyphs,
                                 pho_tables=feat.pho2_tables())
    params = overlay_params(params, imported_params)
    state = overlay_params(state, imported_state)
    if glyphs is not None:
        state["char_images"] = jax.numpy.asarray(np.asarray(glyphs,
                                                            np.float32))
    missing = [k for k in params if k not in imported_params]
    if missing:
        print(f"note: fresh-init subtrees (absent from checkpoint): {missing}")

    out_dir = args.output_dir or (args.smoke and "/tmp/verify_parity_smoke"
                                  or os.path.join(args.data_dir,
                                                  "parity_output"))
    ckpt_for_cache = (args.torch_ckpt if args.torch_ckpt
                      and os.path.isdir(args.torch_ckpt) else out_dir)
    trainer = Trainer(cfg, params, state,
                      use_pallas=auto_use_pallas(args.use_pallas),
                      table_cache_dir=ckpt_for_cache)

    # ------------------------------------------------------------ evaluate
    years = [int(y) for y in args.years.split(",")]
    rows = {}
    for year in years:
        if args.smoke:
            from realise_tpu.data.dataset import synthetic_dataset

            data = synthetic_dataset(tokenizer, num_examples=32,
                                     seed=90 + year)
            label = None
        else:
            from realise_tpu.data.dataset import load_pkl_dataset

            data = load_pkl_dataset(
                os.path.join(args.data_dir, f"test.sighan{year}.pkl"))
            label = os.path.join(args.data_dir,
                                 f"test.sighan{year}.lbl.tsv")
            if not os.path.exists(label):
                label = None
        res = evaluate_model(trainer, data, feat, tokenizer, out_dir,
                             prefix=f"sighan{year}",
                             batch_size=args.eval_batch_size,
                             label_path=label,
                             should_remove_de=(year == 13))
        rows[year] = res

    # --------------------------------------------------------------- table
    cols = ["sent-detect-acc", "sent-detect-p", "sent-detect-r",
            "sent-detect-f1", "sent-correct-acc", "sent-correct-p",
            "sent-correct-r", "sent-correct-f1"]
    short = {c: c.replace("sent-", "").replace("detect", "D")
              .replace("correct", "C").replace("acc", "A").replace("f1", "F")
             for c in cols}
    failures = []
    print(f"\n{'year':<6}{'':<10}" + "".join(f"{short[c]:>8}" for c in cols))
    for year in years:
        pub = PUBLISHED.get(year, {})
        got = rows[year]
        print(f"{year:<6}{'ours':<10}"
              + "".join(f"{got.get(c, float('nan')):>8.1f}" for c in cols))
        if pub:
            print(f"{'':<6}{'published':<10}"
                  + "".join(f"{pub[c]:>8.1f}" for c in cols))
            deltas = {c: got.get(c, float("nan")) - pub[c] for c in cols}
            print(f"{'':<6}{'delta':<10}"
                  + "".join(f"{deltas[c]:>+8.1f}" for c in cols))
            for c in F1_KEYS:
                if abs(deltas[c]) > args.tolerance:
                    failures.append((year, c, deltas[c]))
    write_json(os.path.join(out_dir, "parity_results.json"),
               {str(y): rows[y] for y in years})

    if args.smoke:
        print("\nsmoke run complete (synthetic data — deltas not meaningful)")
        return 0
    if failures:
        print(f"\nPARITY FAIL (tolerance ±{args.tolerance}):")
        for year, c, d in failures:
            print(f"  sighan{year} {c}: {d:+.2f}")
        return 1
    print(f"\nPARITY OK: all F1 columns within ±{args.tolerance} of the "
          "published numbers")
    return 0


def _smoke_state_dict(cfg):
    """A reference-shaped arch3 state dict with random weights, built from
    the faithful torch replica the parity tests use (tests/torch_ref.py) —
    the exact key surface a released checkpoint carries."""
    import torch

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from torch_ref import TorchArch3

    from realise_tpu.config import PHO2_VOCAB_SIZE

    torch.manual_seed(0)
    model = TorchArch3(cfg, PHO2_VOCAB_SIZE)
    model.tie_cls_weight()
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


if __name__ == "__main__":
    raise SystemExit(main())
