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


# ---------------------------------------------------------------------------
# Corpus repair tables (round-2: the reference's ~60 hand-written byte fixes,
# trainset.py:77-106,228-485 and testset.py:78-124 → realise_tpu/data/fixes.py)
# ---------------------------------------------------------------------------
def test_train_fixes_dispatch():
    from realise_tpu.data.fixes import TRAIN_FIXES, train_fixes_for

    assert train_fixes_for("SIGHAN2014/Training/B1_training.sgml", 14) \
        is TRAIN_FIXES["sighan14-b1"]
    assert train_fixes_for("C1_training.sgml", 14) is TRAIN_FIXES["sighan14-c1"]
    assert train_fixes_for("SIGHAN15_CSC_A2_Training.sgml", 15) \
        is TRAIN_FIXES["sighan15-a2"]
    assert train_fixes_for("SIGHAN15_CSC_B2_Training.sgml", 15) \
        is TRAIN_FIXES["sighan15-b2"]
    assert train_fixes_for("Bakeoff2013_SampleSet_WithError_00001-00350.txt",
                           13) is TRAIN_FIXES["sighan13-witherror"]
    assert train_fixes_for("Bakeoff2013_SampleSet_WithoutError.txt", 13) == ()
    assert train_fixes_for("train.sgml", 27) == ()  # wang271k: no fixes


# A corrupt-SGML fixture that needs a fix table to parse: a mojibake char in
# the passage and an off-by-one MISTAKE location (the two dominant corruption
# classes in the real SIGHAN files).
BROKEN_SGML = """<ESSAY title="t">
<TEXT>
<PASSAGE id="B1-0001-1">他们多很高兴�以我陪他们。</PASSAGE>
</TEXT>
<MISTAKE id="B1-0001-1" location="9">
<WRONG>陪</WRONG>
<CORRECTION>赔</CORRECTION>
</MISTAKE>
</ESSAY>"""

FIXTURE_FIXES = (
    ("高兴�以", "高兴所以"),
    ('<MISTAKE id="B1-0001-1" location="9">',
     '<MISTAKE id="B1-0001-1" location="10">'),
)


def test_fix_table_repairs_broken_sgml(tmp_path):
    # Unfixed: the off-by-one location cannot be located and raises an
    # actionable error pointing at the fix mechanism.
    with pytest.raises(ValueError, match="fixes.py"):
        parse_sighan_training(BROKEN_SGML, year=14, t2s=IDENTITY)

    recs = parse_sighan_training(BROKEN_SGML, year=14,
                                 text_fixes=FIXTURE_FIXES, t2s=IDENTITY)
    assert recs[0]["src"] == "他们多很高兴所以我陪他们。"
    assert recs[0]["errors"] == [(10, "赔")]

    # Golden byte-compare of the emitted TSV + label file.
    tsv = tmp_path / "out.tsv"
    lbl = tmp_path / "out.lbl.tsv"
    write_tsv(recs, str(tsv))
    write_label_file(recs, str(lbl))
    assert tsv.read_bytes().decode("utf-8") == (
        "sighan14-B1-0001-1\t他们多很高兴所以我陪他们。\t"
        "他们多很高兴所以我赔他们。\t[(10, '赔')]\n")
    assert lbl.read_bytes().decode("utf-8") == "sighan14-B1-0001-1, 10, 赔\n"


def test_unfixed_mismatch_is_actionable():
    """A MISTAKE that cannot be located raises an error that names the fix
    mechanism instead of crashing opaquely."""
    bad = BROKEN_SGML.replace("<WRONG>陪</WRONG>", "<WRONG>伴</WRONG>")
    with pytest.raises(ValueError, match="fixes.py"):
        parse_sighan_training(bad, year=14, t2s=IDENTITY)


def test_test_fixes_by_pid():
    from realise_tpu.data.fixes import apply_test_fixes

    # year 13: global ellipsis/paren strip (testset.py:80-84)
    assert apply_test_fixes(13, "anything", "好(的)…啊") == "好的啊"
    # year 15: pid-keyed quote repair (testset.py:104-107)
    fixed = apply_test_fixes(15, "A2-0506-1", "所以我在＂義大利麵方子＂已經定位了")
    assert fixed == "所以我在“義大利麵方子”已經定位了。"
    # other pids untouched
    assert apply_test_fixes(15, "A2-9999-9", "好。") == "好。"


def test_test_label_override():
    """Broken truth rows are replaced by pid (testset.py:86-91) — the fixed
    row scores as error-free."""
    inputs = "(pid=B1-1430-2)\t我好．．．\n(pid=B1-0001-1)\t我号。"
    truth = "B1-1430-2, 8, 恤, 55, 恤\nB1-0001-1, 2, 好"
    recs = parse_sighan_test(inputs, truth, year=14, t2s=IDENTITY)
    by_id = {r["id"]: r for r in recs}
    assert by_id["B1-1430-2"]["errors"] == []
    assert by_id["B1-1430-2"]["src"] == "我好。"  # ．．． → 。 input fix
    assert by_id["B1-0001-1"]["errors"] == [(2, "好")]


def test_mistake_offsets_survive_internal_spaces():
    """A SIGHAN-training passage with an internal space and a MISTAKE
    located after it: offsets were computed on the space-containing text,
    so stripping spaces before applying them would shift every later
    position (the space is removed ALIGNED afterwards, inside clean_pair,
    matching the reference which keeps spaces in 14/15 srcs)."""
    sgml = (
        '<ESSAY title="t"><TEXT><PASSAGE id="A1">我的 朋有来了。</PASSAGE>'
        "</TEXT>"
        '<MISTAKE id="A1" location="5"><WRONG>朋有</WRONG>'
        "<CORRECTION>朋友</CORRECTION></MISTAKE></ESSAY>"
    )
    recs = parse_sighan_training(sgml, year=15, t2s=IDENTITY)
    assert len(recs) == 1
    r = recs[0]
    assert r["src"] == "我的朋有来了。"   # space removed aligned, post-apply
    assert r["tgt"] == "我的朋友来了。"   # 有→友 landed on the right char
    assert r["errors"] == [(4, "友")]


def test_ideographic_space_converts_and_strips():
    """U+3000 must become ASCII space (reference trainset.py:26-42) so the
    downstream space-strip removes it before truth positions index into
    src — review round 5 found the conversion branch unreachable."""
    from realise_tpu.data.corpus import full_to_half_width

    assert full_to_half_width("你　好") == "你 好"
    assert full_to_half_width("ＡＢ１　。") == "AB1 。"


def test_forbidden_symbols_raise():
    """The reference's post-cleaning invariant (trainset.py:204-207):
    surviving mojibake/ASCII junk raises instead of flowing into the
    corpus."""
    import pytest as _pytest

    from realise_tpu.data.corpus import clean_pair

    with _pytest.raises(ValueError, match="forbidden"):
        clean_pair("你�好吗。", "你好好吗。", t2s=lambda s: s,
                   collapse_english=False)
    with _pytest.raises(ValueError, match="forbidden"):
        clean_pair("你<好吗。", "你好好吗。", t2s=lambda s: s,
                   collapse_english=False)


def test_compute_errors_rejects_misaligned():
    import pytest as _pytest

    from realise_tpu.data.corpus import compute_errors

    with _pytest.raises(ValueError, match="mismatch"):
        compute_errors("你好", "你好吗")


def test_t2s_alignment_fallback():
    """A phrase-based converter that changes length falls back to aligned
    per-char conversion."""
    from realise_tpu.data.corpus import clean_pair

    def bad_t2s(s):
        # phrase conversion that drops a char on multi-char input
        return s.replace("乾燥", "干") if len(s) > 1 else (
            "干" if s == "乾" else s)

    src, tgt = clean_pair("乾燥的天。", "乾燥的天。", t2s=bad_t2s,
                          collapse_english=False)
    assert src == tgt == "干燥的天。"
    assert len(src) == 5


def test_wrong_position_quoting_is_minimal():
    """The attribute-quoting regex must leave quoted values and same-line
    tag layouts intact (a greedy \\S* swallowed through the tag)."""
    import re

    pat = (r"wrong_position=(\d+)>", r'wrong_position="\1">')
    fix = lambda t: re.sub(*pat, t)
    assert fix('wrong_position=4>') == 'wrong_position="4">'
    assert fix('wrong_position="4">') == 'wrong_position="4">'
    assert (fix('<MISTAKE wrong_position=4><WRONG>寫</WRONG>')
            == '<MISTAKE wrong_position="4"><WRONG>寫</WRONG>')
