"""SIGHAN13 convention: drop 地/得 corrections before scoring.

The SIGHAN13 test set does not annotate 的/地/得 confusions consistently, so the
reference deletes any predicted correction whose char is 地 or 得 from the label
file before scoring year 13 (reference: src/remove_de.py:9-19, applied at
src/test.py:158). We implement it structurally on parsed label items instead of
regex-on-raw-text, which also removes the reference's implicit assumption that
every sentence id is exactly 5 digits (src/remove_de.py:16)."""

from __future__ import annotations

from typing import List

from realise_tpu.eval.metric_core import (
    LabelItem,
    format_label_line,
    parse_label_line,
)


def remove_de_items(items: List[LabelItem]) -> List[LabelItem]:
    out: List[LabelItem] = []
    for sid, edits in items:
        out.append((sid, [(p, c) for p, c in edits if c not in ("地", "得")]))
    return out


def remove_de_text(text: str) -> str:
    items = [parse_label_line(ln) for ln in text.splitlines() if ln.strip()]
    items = remove_de_items(items)
    return "\n".join(format_label_line(sid, edits) for sid, edits in items)


def remove_de(input_path: str, output_path: str) -> None:
    with open(input_path, "r", encoding="utf-8") as f:
        text = f.read()
    with open(output_path, "w", encoding="utf-8") as f:
        f.write(remove_de_text(text) + "\n")


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_path", required=True)
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args()
    remove_de(args.input_path, args.output_path)
