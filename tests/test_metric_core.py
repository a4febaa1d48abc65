"""Golden tests for the SIGHAN sentence-level scorer.

Fixture label files are hand-built; expected A/P/R/F1 are hand-computed from
the reference's definitions (reference: src/metric_core.py:33-86)."""

import math

import pytest

from realise_tpu.eval.metric_core import (
    format_label_line,
    metric_file,
    metric_items,
    parse_label_line,
    sent_metric_correct,
    sent_metric_detect,
)
from realise_tpu.eval.remove_de import remove_de_text


def test_parse_no_error_line():
    assert parse_label_line("A0001, 0") == ("A0001", [])


def test_parse_multi_edit_line():
    assert parse_label_line("B002, 3, 好, 7, 吗") == ("B002", [(3, "好"), (7, "吗")])


def test_format_roundtrip():
    for line in ["X1, 0", "X2, 1, 很", "X3, 2, 天, 9, 气"]:
        sid, edits = parse_label_line(line)
        assert format_label_line(sid, edits) == line


def _items(lines):
    return [parse_label_line(ln) for ln in lines]


def test_detect_and_correct_hand_computed():
    # 4 sentences:
    #  s1: target has error at pos 2->好; pred hits position AND char  (det tp, cor tp)
    #  s2: target has error at 3->天; pred hits position, wrong char   (det tp, cor miss)
    #  s3: target clean; pred predicts an error                        (false positive)
    #  s4: target clean; pred clean                                    (true negative)
    targs = _items(["s1, 2, 好", "s2, 3, 天", "s3, 0", "s4, 0"])
    preds = _items(["s1, 2, 好", "s2, 3, 地", "s3, 1, 不", "s4, 0"])

    det = sent_metric_detect(preds, targs)
    # detection: pred_p=3, targ_p=2, tp=2, hit=3 (s1,s2,s4)
    assert det["sent-detect-acc"] == pytest.approx(75.0)
    assert det["sent-detect-p"] == pytest.approx(100 * 2 / 3)
    assert det["sent-detect-r"] == pytest.approx(100.0)
    f1 = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)
    assert det["sent-detect-f1"] == pytest.approx(100 * f1)

    cor = sent_metric_correct(preds, targs)
    # correction: tp=1 (s1), hit=2 (s1,s4), pred_p=3, targ_p=2
    assert cor["sent-correct-acc"] == pytest.approx(50.0)
    assert cor["sent-correct-p"] == pytest.approx(100 / 3)
    assert cor["sent-correct-r"] == pytest.approx(50.0)


def test_multi_error_detection_needs_exact_position_multiset():
    targs = _items(["t1, 2, 好, 5, 吗"])
    # Same positions, any chars -> detection hit.
    preds = _items(["t1, 2, 地, 5, 的"])
    det = sent_metric_detect(preds, targs)
    assert det["sent-detect-f1"] == pytest.approx(100.0)
    # Subset of positions -> no detection hit.
    preds2 = _items(["t1, 2, 好"])
    det2 = sent_metric_detect(preds2, targs)
    assert det2["sent-detect-f1"] == pytest.approx(0.0)


def test_zero_division_guards():
    targs = _items(["a, 0", "b, 0"])
    preds = _items(["a, 0", "b, 0"])
    res = metric_items(preds, targs)
    assert res["sent-detect-p"] == 0.0
    assert res["sent-detect-acc"] == pytest.approx(100.0)


def test_id_mismatch_raises():
    with pytest.raises(ValueError):
        sent_metric_detect(_items(["a, 0"]), _items(["b, 0"]))


def test_metric_file(tmp_path):
    pred = tmp_path / "pred.lbl"
    targ = tmp_path / "targ.lbl"
    pred.write_text("s1, 2, 好\ns2, 0\n", encoding="utf-8")
    targ.write_text("s1, 2, 好\ns2, 0\n", encoding="utf-8")
    res = metric_file(str(pred), str(targ))
    assert res["sent-correct-f1"] == pytest.approx(100.0)
    assert res["sent-detect-acc"] == pytest.approx(100.0)


def test_remove_de():
    text = "\n".join([
        "10001, 2, 地",          # only-de edit -> becomes clean
        "10002, 3, 好, 4, 得",   # mixed -> keeps non-de edit
        "10003, 0",              # already clean
        "10004, 1, 得, 2, 地",   # all de -> clean
    ])
    out = remove_de_text(text).splitlines()
    assert out == ["10001, 0", "10002, 3, 好", "10003, 0", "10004, 0"]


def test_sig_test_reference_semantics():
    """The paired bootstrap must follow the reference's scheme: 50% subsample
    WITHOUT replacement, per-system mean/median/CI stats, p = 1 - win ratio
    of the superior system (reference: sig_test.py:24-27,43-53)."""
    from realise_tpu.eval.sig_test import paired_bootstrap

    targ = [(f"S{i}", [(1, "好")]) for i in range(20)]
    sys1 = list(targ)                     # perfect system
    sys2 = [(f"S{i}", []) for i in range(20)]   # detects nothing

    res = paired_bootstrap(sys1, sys2, targ, metric_key="sent-detect-f1",
                           num_samples=50, sample_ratio=0.5, seed=3)
    assert res["wins_sys1"] == 1.0 and res["wins_sys2"] == 0.0
    assert res["p_value"] == 0.0
    # A perfect system scores 1.0 on every subsample — and because sampling
    # is without replacement, the degenerate sys2 scores exactly 0.0 on all.
    assert res["sys1_mean"] == res["sys1_ci95_low"] == res["sys1_ci95_high"] == 100.0
    assert res["sys2_mean"] == 0.0
    assert res["sys1_median"] == 100.0


def test_sig_test_tie_and_subsample_size():
    from realise_tpu.eval.sig_test import paired_bootstrap

    targ = [(f"S{i}", [(1, "好")]) for i in range(8)]
    res = paired_bootstrap(targ, targ, targ, num_samples=10, seed=0)
    assert res["ties"] == 1.0
    assert res["wins_sys1"] == res["wins_sys2"] == 0.0


def test_parse_label_line_lenient_commas():
    """Raw truth files without a space after commas must parse like the
    corpus-side parser does (review round 5: strict ', ' split collapsed
    the whole line into a bogus id)."""
    from realise_tpu.eval.metric_core import parse_label_line

    assert parse_label_line("A2-0001-1,2,俊") == ("A2-0001-1", [(2, "俊")])
    assert parse_label_line("A2-0002-2,0") == ("A2-0002-2", [])
    assert parse_label_line("A2, 3, 好, 5, 吗") == ("A2", [(3, "好"), (5, "吗")])
