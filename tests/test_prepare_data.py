"""End-to-end prepare_data CLI test: raw SGML fixture → TSV + lbl + pkl."""

import os

from realise_tpu.cli import prepare_data
from realise_tpu.data.dataset import load_pkl_dataset

SGML = """<ESSAY title="t">
<TEXT>
<PASSAGE id="B1-0001-1">他是我的好朋有。</PASSAGE>
<PASSAGE id="B1-0001-2">天气很好。</PASSAGE>
</TEXT>
<MISTAKE id="B1-0001-1" location="7">
<WRONG>朋有</WRONG>
<CORRECTION>朋友</CORRECTION>
</MISTAKE>
</ESSAY>"""


def test_prepare_data_sighan_train(tokenizer, tmp_path):
    raw = tmp_path / "B1_training.sgml"
    raw.write_text(SGML, encoding="utf-8")
    vocab_path = tokenizer.save_pretrained(str(tmp_path))
    tsv = tmp_path / "train.tsv"
    pkl = tmp_path / "train.pkl"
    lbl = tmp_path / "train.lbl.tsv"

    rc = prepare_data.main([
        "--format", "sighan-train", "--year", "14",
        "--input", str(raw), "--vocab_path", vocab_path,
        "--output_tsv", str(tsv), "--output_pkl", str(pkl),
        "--output_lbl", str(lbl), "--repeat", "2",
    ])
    assert rc == 0

    rows = tsv.read_text(encoding="utf-8").splitlines()
    assert len(rows) == 2
    assert rows[0].startswith("sighan14-B1-0001-1\t")

    lines = lbl.read_text(encoding="utf-8").splitlines()
    assert any(l.endswith(", 0") for l in lines)          # clean sentence
    assert any(", 7, " in l for l in lines)               # the correction

    # --repeat 2 oversamples into the runtime pkl (trainall.timesN).
    examples = load_pkl_dataset(str(pkl))
    assert len(examples) == 4
    ex = examples[0]
    assert ex["lengths"] + 2 == len(ex["src_idx"])        # pkl invariants


def test_prepare_data_test_format(tokenizer, tmp_path):
    inputs = tmp_path / "TestInput.txt"
    truth = tmp_path / "TestTruth.txt"
    inputs.write_text("(pid=A2-1-1)\t我号。\n(pid=A2-1-2)\t天气好。\n",
                      encoding="utf-8")
    truth.write_text("A2-1-1, 2, 好\nA2-1-2, 0\n", encoding="utf-8")
    vocab_path = tokenizer.save_pretrained(str(tmp_path))
    pkl = tmp_path / "test.pkl"
    lbl = tmp_path / "test.lbl.tsv"

    rc = prepare_data.main([
        "--format", "sighan-test", "--year", "15",
        "--input", str(inputs), "--truth", str(truth),
        "--vocab_path", vocab_path,
        "--output_pkl", str(pkl), "--output_lbl", str(lbl),
    ])
    assert rc == 0
    examples = load_pkl_dataset(str(pkl))
    assert [e["id"] for e in examples] == ["A2-1-1", "A2-1-2"]
    assert examples[0]["tgt"] == "我好。"
    # The emitted label file round-trips through the scorer's reader.
    from realise_tpu.eval.metric_core import read_label_file

    items = read_label_file(str(lbl))
    assert items[0] == ("A2-1-1", [(2, "好")])
