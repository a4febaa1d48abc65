"""Prediction → SIGHAN label-file writer + scoring entry point.

Behavioral parity with the reference's Metric class (reference: src/metric.py):

* token-id → text reconstruction strips WordPiece ``##`` prefixes, maps the
  UNK token to the literal ``'U'``, and re-expands each token to its original
  source width using ``tokens_size`` (padding with ``'x'``)
  (src/metric.py:47-61).
* the label line records 1-based character positions where prediction differs
  from source (src/metric.py:69-76).
* SIGHAN13 is scored after ``remove_de`` filtering (src/metric.py:15-19).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Mapping, Sequence, Tuple

import numpy as np

from realise_tpu.eval.metric_core import metric_file
from realise_tpu.eval.remove_de import remove_de


class Metric:
    """Decodes predicted token ids back to text and scores SIGHAN label files.

    ``tokenizer`` needs ``convert_ids_to_tokens(list[int]) -> list[str]`` and
    an ``unk_token`` attribute (realise_tpu.text.tokenizer.WordPieceTokenizer
    or any HF-compatible tokenizer).
    """

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def metric(
        self,
        batches: Iterable[Mapping],
        pred_txt_path: str,
        pred_lbl_path: str,
        label_path: str,
        should_remove_de: bool = False,
    ) -> Dict[str, float]:
        self.write_pred(batches, pred_txt_path, pred_lbl_path)
        if should_remove_de:
            remove_de(input_path=pred_lbl_path, output_path=pred_lbl_path)
        return metric_file(pred_path=pred_lbl_path, targ_path=label_path)

    def write_pred(
        self,
        batches: Iterable[Mapping],
        pred_txt_path: str,
        pred_lbl_path: str,
    ) -> None:
        txt_lines: List[str] = []
        lbl_lines: List[str] = []
        for batch in batches:
            n = np.asarray(batch["src_idx"]).shape[0]
            for i in range(n):
                pred_txt, pred_lbl = self.process_batch_item(batch, i)
                txt_lines.append(pred_txt)
                lbl_lines.append(pred_lbl)

        for path in (pred_lbl_path, pred_txt_path):
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
        with open(pred_lbl_path, "w", encoding="utf-8") as f:
            f.write("\n".join(lbl_lines))
        with open(pred_txt_path, "w", encoding="utf-8") as f:
            f.write("\n".join(txt_lines))

    def process_batch_item(self, batch: Mapping, idx: int) -> Tuple[str, str]:
        """Reconstruct predicted text for one example and diff it vs source."""
        length = int(batch["lengths"][idx])
        # Truncated examples keep [CLS] + width-2 content + [SEP]
        # (data/features.py), so only width-2 predictions exist; the
        # reference never truncates (its data prep bounds lengths), so this
        # cap is outside its behavior surface.
        length = min(length, int(np.asarray(batch["src_idx"]).shape[1]) - 2)

        pred_idx = np.asarray(batch["pred_idx"][idx]).tolist()
        # Positions 1..length hold the sentence (0 is [CLS], length+1 is [SEP];
        # reference: src/metric.py:50-51).
        pred_idx = pred_idx[1 : 1 + length]
        tokens = self.tokenizer.convert_ids_to_tokens(pred_idx)
        tokens = [t[2:] if t.startswith("##") else t for t in tokens]
        unk = self.tokenizer.unk_token
        tokens = ["U" if t == unk else t for t in tokens]

        # Re-expand each token to its source character width so predicted text
        # aligns char-for-char with the original sentence.
        sized: List[str] = []
        for size, tok in zip(batch["tokens_size"][idx], tokens):
            piece = tok[:size]
            if len(piece) < size:
                piece += "x" * (size - len(piece))
            sized.append(piece)
        pred = "".join(sized)
        sid = batch["id"][idx]
        pred_txt = f"{sid}\t{pred}"

        src = batch["src"][idx]
        # Reference scoring semantics, kept verbatim (src/metric.py:65-66):
        # when the reconstruction is shorter than the source — a truncated
        # example, or a multi-char OOV span whose UNK records tokens_size=1
        # (the reference's own convention, data_process/dataset.py:60-69)
        # — the source tail is dropped before diffing. For the OOV case
        # this shifts every later position; the reference does exactly the
        # same, and published F1 comparability requires matching it.
        if len(src) > len(pred):
            src = src[: len(pred)]
        if len(pred) != len(src):
            raise ValueError(
                f"prediction/source length mismatch for {sid}: "
                f"{len(pred)} vs {len(src)}")

        edits = []
        for pos, (a, b) in enumerate(zip(src, pred), start=1):
            if a != b:
                edits.append(str(pos))
                edits.append(b)
        if edits:
            pred_lbl = ", ".join([sid] + edits)
        else:
            pred_lbl = f"{sid}, 0"
        return pred_txt, pred_lbl
