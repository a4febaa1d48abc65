"""Gate introspection CLI — the src/show_gate.py equivalent.

Dumps the per-token selective-modality gate values (g_semantic, g_phonetic,
g_graphic) of an arch3/arch4 checkpoint over a dataset to a TSV for analysis
(reference: src/show_gate.py:130-133,243-268 — which monkey-patches the
forward to capture gates and is broken at import, SURVEY.md §2.3; here the
model exposes gates natively via ``return_gates``).

Output TSV columns: id, position, char, g_sem, g_pho, g_res.
"""

from __future__ import annotations

import argparse

import numpy as np

from realise_tpu.cli.common import (
    build_tokenizer,
    force_platform,
    load_dataset,
    setup_logging,
    logger,
)
from realise_tpu.data.dataset import batch_iterator, pad_examples
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import apply_realise
from realise_tpu.training.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    load_config,
)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--test_file", default=None)
    p.add_argument("--output", default="gate.tsv")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    import jax

    args = build_parser().parse_args(argv)
    setup_logging()
    force_platform(args.platform)

    ckpts = list_checkpoints(args.ckpt_dir)
    ckpt_path = ckpts[-1][1] if ckpts else args.ckpt_dir
    cfg = load_config(ckpt_path)
    if cfg.fusion not in ("gate", "softmax_gate"):
        raise SystemExit(f"model {cfg.model_type} has no gate fusion")
    restored = load_checkpoint(ckpt_path)
    params = jax.tree.map(jax.numpy.asarray, restored["params"])
    state = jax.tree.map(jax.numpy.asarray, restored["state"])

    tokenizer = build_tokenizer(args)
    featurizer = Featurizer(tokenizer, cfg)
    data = load_dataset(args, tokenizer, args.test_file, num_synthetic=32,
                        seed=5)

    @jax.jit
    def gate_step(params, state, batch):
        out = apply_realise(params, state, batch, cfg, return_gates=True)
        return out["gates"]

    # Gate columns follow the model's actual stream order (semantic first,
    # then pho if present, then res) — ablated models have only 2 streams.
    stream_names = ["g_sem"]
    if cfg.with_pho:
        stream_names.append("g_pho")
    if cfg.with_res:
        stream_names.append("g_res")

    rows = []
    # Iterate UNPADDED (true counts); pad only for the static-shape device
    # step — else the final short batch duplicates gate rows (the same bug
    # class as the round-1 eval crash, cli/common.py evaluate_model).
    for examples in batch_iterator(data, args.batch_size, pad_final=False):
        host = featurizer.featurize(pad_examples(examples, args.batch_size))
        # astype: bf16 checkpoints yield ml_dtypes.bfloat16 scalars, whose
        # f-string float formatting raises ValueError.
        gates = np.asarray(gate_step(params, state,
                                     featurizer.device_batch(host))
                           ).astype(np.float32)
        for i, ex in enumerate(examples):
            # Truncated examples keep untruncated `lengths`; only S-2
            # content positions exist (same cap as eval/metric.py).
            length = min(ex["lengths"], host["src_idx"].shape[1] - 2)
            for pos in range(1, length + 1):
                char = tokenizer.convert_ids_to_tokens(
                    [int(host["src_idx"][i, pos])])[0]
                g = gates[i, pos]
                vals = "\t".join(f"{g[j]:.4f}"
                                 for j in range(len(stream_names)))
                rows.append(f"{ex['id']}\t{pos}\t{char}\t{vals}")

    with open(args.output, "w", encoding="utf-8") as f:
        f.write("id\tpos\tchar\t" + "\t".join(stream_names) + "\n")
        f.write("\n".join(rows) + "\n")
    logger.info("wrote %d gate rows to %s", len(rows), args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
