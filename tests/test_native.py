"""Native C++ featurizer: build + parity vs the Python tokenizer."""

import numpy as np
import pytest

from realise_tpu.data.native import NativeFeaturizer, native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native featurizer not built")


@pytest.fixture(scope="module")
def native(tokenizer, tmp_path_factory):
    vocab_dir = str(tmp_path_factory.mktemp("vocab"))
    vocab_path = tokenizer.save_pretrained(vocab_dir)
    return NativeFeaturizer(vocab_path)


def test_vocab_size(native, tokenizer):
    assert native.vocab_size == len(tokenizer)


@pytest.mark.parametrize("text", [
    "你好吗",
    "天气很好。",
    "hello你好world",
    "worlding好",
    "a,b你",
    "你Ω好",          # unknown char → UNK
])
def test_parity_with_python_tokenizer(native, tokenizer, text):
    from realise_tpu.data.features import make_example

    out = native.encode_batch([text], max_len=16)
    ex = make_example("x", text, text, tokenizer)

    want = np.zeros(16, np.int32)
    want[: len(ex["src_idx"])] = ex["src_idx"]
    np.testing.assert_array_equal(out["src_idx"][0], want,
                                  err_msg=f"text={text!r}")
    assert out["lengths"][0] == ex["lengths"]
    np.testing.assert_array_equal(
        out["tokens_size"][0][: ex["lengths"]], ex["tokens_size"])
    # masks/loss_masks semantics (run.py:68-101).
    assert out["masks"][0].sum() == ex["lengths"] + 2
    assert out["loss_masks"][0].sum() == ex["lengths"]
    assert out["loss_masks"][0][0] == 0


def test_truncation(native, tokenizer):
    text = "好" * 30
    out = native.encode_batch([text], max_len=8)
    assert out["src_idx"].shape == (1, 8)
    assert out["masks"][0].all()
    assert out["lengths"][0] == 30  # true length reported; ids truncated
    # BERT truncation layout, identical to the Python featurizer:
    # [CLS] + 6 content + [SEP], loss over content positions only.
    assert out["src_idx"][0][-1] == tokenizer.sep_token_id
    assert out["loss_masks"][0].tolist() == [0, 1, 1, 1, 1, 1, 1, 0]

    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer, make_example

    cfg = config_for("bert", vocab_size=len(tokenizer), max_seq_length=8)
    feat = Featurizer(tokenizer, cfg)
    py = feat.featurize([make_example("0", text, text, tokenizer)],
                        seq_len=8)
    np.testing.assert_array_equal(out["src_idx"][0], py["src_idx"][0])
    np.testing.assert_array_equal(out["loss_masks"][0], py["loss_masks"][0])
    np.testing.assert_array_equal(out["masks"][0], py["masks"][0])


def test_batch_throughput_sanity(native):
    sents = ["你好吗今天天气很好" * 3] * 512
    out = native.encode_batch(sents, max_len=64)
    assert out["src_idx"].shape == (512, 64)


def test_featurize_raw_native_parity(native, tokenizer):
    """featurize_raw with the C++ encoder equals the pure-Python path on the
    FULL production batch contract (ids, masks, pinyin gathers, passthrough
    fields) — the contract cli/correct.py serves with --native_featurizer."""
    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer

    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                     max_seq_length=16)
    feat = Featurizer(tokenizer, cfg)
    sentences = ["你好吗", "天气很好。", "hello你好"]
    a = feat.featurize_raw(sentences, native=native)
    b = feat.featurize_raw(sentences, native=None)
    for key in ("src_idx", "masks", "loss_masks", "pho_idx", "pho_lens"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    np.testing.assert_array_equal(np.asarray(a["lengths"]),
                                  np.asarray(b["lengths"]))
    assert a["tokens_size"] == b["tokens_size"]
    assert a["src"] == b["src"]
