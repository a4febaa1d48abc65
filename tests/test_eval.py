"""Regression tests for evaluate_model on ragged dataset sizes.

Round-1 verdict confirmed a crash: batch_iterator padded the final short
batch by duplicating examples and evaluate_model sliced with the *padded*
length, so every dataset whose size is not a multiple of eval_batch_size
(e.g. SIGHAN15's 1100 at bs=32) emitted more pred lines than gold lines and
metric_core raised. The reference's evaluate() never duplicates
(reference: src/run.py:239-280).
"""

import os

import jax
import numpy as np
import pytest



@pytest.fixture(scope="module")
def tokenizer(small_tokenizer):
    """Shadow the session 21k-vocab tokenizer: these are model-SEMANTICS
    tests; the small vocab cuts V-proportional compute (factorized scans,
    inference tables, tied head) that dominated their wall clock."""
    return small_tokenizer

@pytest.fixture(scope="module")
def eval_env(tokenizer):
    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.trainer import Trainer

    cfg = config_for(
        "bert-pho2-res-arch3", vocab_size=len(tokenizer), hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
        pho_num_layers=1, out_num_layers=1, max_seq_length=16,
        max_position_embeddings=32, num_fonts=1)
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(cfg, params, state, total_steps=10)
    featurizer = Featurizer(tokenizer, cfg)
    return trainer, featurizer


@pytest.mark.parametrize("n_examples", [33, 65])
def test_eval_ragged_dataset_sizes(eval_env, tokenizer, tmp_path, n_examples):
    """Eval on 33/65 examples at bs=32 yields exactly n label lines and a
    finite metric — no duplicated predictions from batch padding."""
    from realise_tpu.cli.common import evaluate_model
    from realise_tpu.data.dataset import synthetic_dataset

    trainer, featurizer = eval_env
    data = synthetic_dataset(tokenizer, num_examples=n_examples, seed=3,
                             min_len=4, max_len=10)
    out_dir = str(tmp_path / f"eval{n_examples}")
    res = evaluate_model(trainer, data, featurizer, tokenizer, out_dir,
                         batch_size=32)
    assert "sent-correct-f1" in res
    assert res["sent-correct-f1"] == res["sent-correct-f1"]  # not NaN
    with open(os.path.join(out_dir, "labels.txt"), encoding="utf-8") as f:
        pred_lines = [l for l in f.read().splitlines() if l.strip()]
    with open(os.path.join(out_dir, "gold.lbl.tsv"), encoding="utf-8") as f:
        gold_lines = [l for l in f.read().splitlines() if l.strip()]
    assert len(pred_lines) == n_examples
    assert len(gold_lines) == n_examples


def test_eval_exact_multiple_unchanged(eval_env, tokenizer, tmp_path):
    """Dataset size divisible by batch size still works (no regression)."""
    from realise_tpu.cli.common import evaluate_model
    from realise_tpu.data.dataset import synthetic_dataset

    trainer, featurizer = eval_env
    data = synthetic_dataset(tokenizer, num_examples=64, seed=5)
    res = evaluate_model(trainer, data, featurizer, tokenizer,
                         str(tmp_path / "eval64"), batch_size=32)
    assert "avg_loss" in res


def test_eval_fast_path_tables_match_slow_path(eval_env, tokenizer):
    """prepare_eval_tables routes eval through the per-vocab GRU/glyph
    tables; predictions must equal the live-GRU/conv slow path (the same
    equivalence the serving CLI relies on)."""
    from realise_tpu.data.dataset import synthetic_dataset

    trainer, featurizer = eval_env
    data = synthetic_dataset(tokenizer, num_examples=8, seed=9)
    batch = featurizer.device_batch(featurizer.featurize(data))

    trainer.clear_eval_tables()
    slow = trainer.eval_step(batch)
    assert trainer.prepare_eval_tables(featurizer)
    fast = trainer.eval_step(batch)
    np.testing.assert_array_equal(slow["pred_idx"], fast["pred_idx"])
    np.testing.assert_allclose(slow["loss"], fast["loss"], rtol=1e-5)
    trainer.clear_eval_tables()
