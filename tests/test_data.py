"""Featurization + dataset IO tests."""

import numpy as np
import pytest

from realise_tpu.config import config_for
from realise_tpu.data.dataset import (
    batch_iterator,
    dataset_labels,
    load_pkl_dataset,
    save_pkl_dataset,
    synthetic_dataset,
)
from realise_tpu.data.features import Featurizer, make_example


def test_make_example_invariants(tokenizer):
    ex = make_example("t1", "你好吗", "你好吗", tokenizer)
    # The reference pkl invariants (process_data.py:33-36).
    assert len(ex["src_idx"]) == len(ex["tgt_idx"])
    assert ex["lengths"] + 2 == len(ex["src_idx"])
    assert ex["lengths"] == len(ex["tokens_size"])
    assert ex["src_idx"][0] == tokenizer.cls_token_id
    assert ex["src_idx"][-1] == tokenizer.sep_token_id
    assert ex["tokens_size"] == [1, 1, 1]


def test_make_example_multichar_tokens(tokenizer):
    ex = make_example("t2", "hello你", "hello你", tokenizer)
    assert ex["tokens_size"][0] == 5  # 'hello' spans 5 source chars


def test_featurizer_shapes(tokenizer):
    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                     max_seq_length=16)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=3, seed=0)
    batch = feat.featurize(data)
    assert batch["src_idx"].shape == (3, 16)
    assert batch["pho_idx"].shape == (3, 16, cfg.pho2_max_len)
    assert batch["pho_lens"].shape == (3, 16)
    # loss mask covers positions 1..length only.
    for i, ex in enumerate(data):
        row = batch["loss_masks"][i]
        assert row[0] == 0
        assert row[1 : 1 + ex["lengths"]].all()
        assert not row[1 + ex["lengths"] :].any()
    # attention mask covers CLS + sentence + SEP.
    assert batch["masks"][0].sum() == data[0]["lengths"] + 2


def test_pho_gather_equals_per_token_conversion(tokenizer):
    """The (V,P)-table gather must equal converting each token directly
    (what the reference does per step, src/models.py:797-804)."""
    from realise_tpu.text.pinyin import Pinyin2Convertor

    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                     max_seq_length=12)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=2, seed=3)
    batch = feat.featurize(data)

    conv = Pinyin2Convertor(max_len=cfg.pho2_max_len)
    flat = batch["src_idx"].flatten().tolist()
    chars = tokenizer.convert_ids_to_tokens(flat)
    want_ids, want_lens = conv.convert(chars)
    np.testing.assert_array_equal(
        batch["pho_idx"].reshape(-1, cfg.pho2_max_len), want_ids)
    np.testing.assert_array_equal(batch["pho_lens"].reshape(-1), want_lens)


def test_pho1_features(tokenizer):
    cfg = config_for("bert-pho1", vocab_size=len(tokenizer), max_seq_length=12)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=2, seed=4)
    batch = feat.featurize(data)
    assert batch["pho1_idx"].shape == (2, 12, 3)


def test_pkl_roundtrip(tokenizer, tmp_path):
    data = synthetic_dataset(tokenizer, num_examples=5, seed=5)
    path = str(tmp_path / "data.pkl")
    save_pkl_dataset(data, path)
    loaded = load_pkl_dataset(path)
    assert loaded == data


def test_batch_iterator_pads_final_batch(tokenizer):
    data = synthetic_dataset(tokenizer, num_examples=5, seed=6)
    batches = list(batch_iterator(data, batch_size=2))
    assert len(batches) == 3
    assert all(len(b) == 2 for b in batches)
    # No example lost (vs the reference's tail-dropping shard, run.py:134-137).
    ids = {ex["id"] for b in batches for ex in b}
    assert ids == {ex["id"] for ex in data}


def test_dataset_labels(tokenizer):
    data = synthetic_dataset(tokenizer, num_examples=8, seed=7)
    labels = dataset_labels(data)
    assert len(labels) == 8
    for line, ex in zip(labels, data):
        assert line.startswith(ex["id"])
        if ex["src"] == ex["tgt"]:
            assert line.endswith(", 0")


def test_truncation_at_max_seq_length(tokenizer):
    cfg = config_for("bert", vocab_size=len(tokenizer), max_seq_length=8)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=2, min_len=10,
                             max_len=12, seed=8)
    batch = feat.featurize(data)
    assert batch["src_idx"].shape == (2, 8)
    # BERT-style truncation: the last slot is [SEP], not a loss position.
    assert batch["src_idx"][:, -1].tolist() == [tokenizer.sep_token_id] * 2
    assert batch["loss_masks"][:, -1].tolist() == [0, 0]
    assert batch["loss_masks"][:, -2].tolist() == [1, 1]


def test_bucketed_batch_iterator(tokenizer):
    from realise_tpu.data.dataset import bucketed_batch_iterator

    data = synthetic_dataset(tokenizer, num_examples=20, min_len=4,
                             max_len=40, seed=9)
    seen = set()
    for seq_len, batch in bucketed_batch_iterator(data, batch_size=4,
                                                  buckets=(16, 32, 64)):
        assert seq_len in (16, 32, 64)
        assert len(batch) == 4
        for ex in batch:
            # every real example fits its bucket (largest bucket may truncate)
            if seq_len != 64:
                assert len(ex["src_idx"]) <= seq_len
            seen.add(ex["id"])
    assert seen == {ex["id"] for ex in data}


def test_threaded_prefetch_order_and_errors():
    from realise_tpu.data.dataset import threaded_prefetch

    assert list(threaded_prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("boom")

    it = threaded_prefetch(boom())
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_featurize_truncation_keeps_sep(tokenizer):
    """Overlong examples truncate BERT-style — [CLS] + s-2 content + [SEP] —
    matching the native featurizer's layout (previously the python path
    hard-cut at s, dropping [SEP] and keeping one extra content token)."""
    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer, make_example

    cfg = config_for("bert", vocab_size=len(tokenizer), max_seq_length=8)
    feat = Featurizer(tokenizer, cfg)
    ex = make_example("1", "好" * 30, "好" * 30, tokenizer)
    batch = feat.featurize([ex], seq_len=8)
    row = batch["src_idx"][0]
    assert row[0] == tokenizer.cls_token_id
    assert row[7] == tokenizer.sep_token_id
    assert (row[1:7] == tokenizer.vocab["好"]).all()
    # loss covers content positions only (1..6), never the [SEP] slot.
    assert batch["loss_masks"][0].tolist() == [0, 1, 1, 1, 1, 1, 1, 0]
    # Short examples unchanged.
    ex2 = make_example("2", "好好", "好好", tokenizer)
    b2 = feat.featurize([ex2], seq_len=8)
    assert b2["src_idx"][0][3] == tokenizer.sep_token_id
    assert b2["loss_masks"][0].tolist() == [0, 1, 1, 0, 0, 0, 0, 0]


def test_threaded_prefetch_abandoned_consumer_releases_thread():
    """Closing the consumer generator mid-stream must release the worker
    thread even when the queue is full (the sentinel put must not block
    forever on a dead queue)."""
    import threading
    import time

    from realise_tpu.data.dataset import threaded_prefetch

    started = threading.active_count()
    gen = threaded_prefetch(iter(range(100)), size=2)
    assert next(gen) == 0
    gen.close()  # sets stop; worker may be blocked mid-put with full queue
    deadline = time.time() + 5.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= started


def test_threaded_prefetch_tuple_items_pass_through():
    """Generic 2-tuple items must not be mistaken for the in-band error
    encoding (now an out-of-band wrapper class)."""
    import numpy as np

    from realise_tpu.data.dataset import threaded_prefetch

    items = [("__error__", np.zeros(2)), ("a", 1)]
    got = list(threaded_prefetch(iter(items), size=2))
    assert len(got) == 2 and got[1] == ("a", 1)
    assert got[0][0] == "__error__"


def test_threaded_prefetch_propagates_errors():
    import pytest as _pytest

    from realise_tpu.data.dataset import threaded_prefetch

    def bad():
        yield 1
        raise RuntimeError("boom")

    gen = threaded_prefetch(bad(), size=2)
    assert next(gen) == 1
    with _pytest.raises(RuntimeError, match="boom"):
        list(gen)
