"""Offline corpus pipeline tests with fabricated raw corpus snippets."""

import numpy as np
import pytest

from realise_tpu.data.corpus import (
    clean_pair,
    collapse_english_words,
    compute_errors,
    full_to_half_width,
    make_record,
    normalize_punct,
    parse_sighan13_sample,
    parse_sighan_test,
    parse_sighan_training,
    parse_wang271k,
    read_tsv,
    records_to_examples,
    write_label_file,
    write_tsv,
)

IDENTITY = lambda s: s  # skip t2s in tests: synthetic data is simplified


def test_full_to_half_width():
    assert full_to_half_width("ＡＢＣ１２３") == "ABC123"
    # Chinese punctuation is untouched (only alnum + －．convert).
    assert full_to_half_width("，。") == "，。"


def test_normalize_punct():
    assert normalize_punct("「你好」") == "“你好”"
    assert normalize_punct("好?") == "好？"
    assert normalize_punct("a,b") == "a，b"


def test_collapse_english_words():
    src = "我用app看app和web。"
    tgt = "我用app看app和web。"
    s, t = collapse_english_words(src, tgt)
    # Same word → same marker; distinct word → next marker.
    assert s == "我用①看①和②。"
    assert t == s


def test_clean_pair_appends_terminator():
    s, t = clean_pair("你好吗", "你好吗", t2s=IDENTITY)
    assert s.endswith("。") and t.endswith("。")
    s2, _ = clean_pair("你好！", "你好！", t2s=IDENTITY)
    assert s2 == "你好！"


def test_compute_errors_one_based():
    assert compute_errors("你号吗", "你好吗") == [(2, "好")]


def test_make_record_multichar_mistake():
    rec = make_record("x1", "我动遥了", [(1, "动遥", "动摇")], t2s=IDENTITY)
    assert rec["tgt"].startswith("我动摇了")
    assert rec["errors"] == [(3, "摇")]


SIGHAN13 = """<DOC Nid="00001">
<P>这是一个测试句。</P>
<TEXT>
<MISTAKE wrong_position=3>
<WRONG>一个</WRONG>
<CORRECT>一各</CORRECT>
</MISTAKE>
</TEXT>
</DOC>"""


def test_parse_sighan13():
    recs = parse_sighan13_sample(SIGHAN13, t2s=IDENTITY)
    assert len(recs) == 1
    assert recs[0]["id"] == "sighan13-00001"
    assert recs[0]["errors"] == [(4, "各")]


SIGHAN15 = """<ESSAY title="t">
<TEXT>
<PASSAGE id="A2-0001-1">他是我的好朋有。</PASSAGE>
<PASSAGE id="A2-0001-2">天气很好。</PASSAGE>
</TEXT>
<MISTAKE id="A2-0001-1" location="7">
<WRONG>朋有</WRONG>
<CORRECTION>朋友</CORRECTION>
</MISTAKE>
</ESSAY>"""


def test_parse_sighan_training():
    recs = parse_sighan_training(SIGHAN15, year=15, t2s=IDENTITY)
    assert len(recs) == 2
    by_id = {r["id"]: r for r in recs}
    assert by_id["sighan15-A2-0001-1"]["errors"] == [(7, "友")]
    assert by_id["sighan15-A2-0001-2"]["errors"] == []


WANG = """<SENTENCE>
<TEXT>我爱北经。</TEXT>
<MISTAKE>
<WRONG>经</WRONG>
<CORRECTION>京</CORRECTION>
<LOCATION>4</LOCATION>
</MISTAKE>
</SENTENCE>"""


def test_parse_wang271k():
    recs = parse_wang271k(WANG, t2s=IDENTITY)
    assert len(recs) == 1
    assert recs[0]["id"] == "wang27k-000000"
    assert recs[0]["tgt"] == "我爱北京。"
    assert recs[0]["errors"] == [(4, "京")]


def test_parse_sighan_test():
    inputs = "(pid=A2-1-1)\t我号。\n(pid=A2-1-2)\t天气好。"
    truth = "A2-1-1, 2, 好\nA2-1-2, 0"
    recs = parse_sighan_test(inputs, truth, year=15, t2s=IDENTITY)
    by_id = {r["id"]: r for r in recs}
    assert by_id["A2-1-1"]["tgt"] == "我好。"
    assert by_id["A2-1-2"]["errors"] == []


def test_tsv_roundtrip(tmp_path):
    recs = parse_sighan_training(SIGHAN15, year=15, t2s=IDENTITY)
    path = str(tmp_path / "data.tsv")
    write_tsv(recs, path)
    back = read_tsv(path)
    assert back == recs


def test_write_label_file(tmp_path):
    recs = [
        {"id": "a", "src": "x", "tgt": "x", "errors": []},
        {"id": "b", "src": "x", "tgt": "y", "errors": [(1, "y")]},
    ]
    path = str(tmp_path / "lbl.tsv")
    write_label_file(recs, path)
    lines = open(path, encoding="utf-8").read().splitlines()
    assert lines == ["a, 0", "b, 1, y"]
    # Must parse back through the scorer's reader.
    from realise_tpu.eval.metric_core import read_label_file

    items = read_label_file(path)
    assert items[1] == ("b", [(1, "y")])


def test_records_to_examples(tokenizer, tmp_path):
    recs = [
        {"id": "r1", "src": "你号吗", "tgt": "你好吗", "errors": [(2, "好")]},
        {"id": "r2", "src": "好" * 50, "tgt": "好" * 50, "errors": []},
    ]
    examples = records_to_examples(recs, tokenizer, max_len=20)
    # r2 filtered by length; r1 satisfies the pkl invariants.
    assert [e["id"] for e in examples] == ["r1"]
    ex = examples[0]
    assert ex["lengths"] + 2 == len(ex["src_idx"])

    # And the full chain feeds the runtime loader.
    from realise_tpu.data.dataset import load_pkl_dataset, save_pkl_dataset

    p = str(tmp_path / "run.pkl")
    save_pkl_dataset(examples, p)
    assert load_pkl_dataset(p)[0]["id"] == "r1"
