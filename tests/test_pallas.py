"""Pallas kernel parity tests (interpret mode on CPU) vs the jnp paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realise_tpu.config import RealiseConfig
from realise_tpu.ops.bert import attention_bias_from_mask


def test_attention_block_matches_jnp(tokenizer):
    """Fused attention-block kernel == the jnp sub-block (q/k/v proj ->
    attention -> out proj -> residual LN), including padding-mask handling."""
    from realise_tpu.config import config_for
    from realise_tpu.ops.bert import _self_attention, init_bert_layer
    from realise_tpu.ops.pallas.bert_block import attention_block

    cfg = config_for("bert-pho2-res-arch3", vocab_size=64, hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_seq_length=8,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 16))
    mask = jnp.ones((3, 8), jnp.int32).at[1, 5:].set(0)
    bias = attention_bias_from_mask(mask, jnp.float32)

    want = _self_attention(layer["attention"], x, bias, cfg,
                           deterministic=True, rng=None)
    got = attention_block(x, layer["attention"], bias,
                          cfg.num_attention_heads, eps=cfg.layer_norm_eps,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # Garbage in masked positions must not change valid outputs.
    x2 = x.at[1, 5:].set(99.0)
    got2 = attention_block(x2, layer["attention"], bias,
                           cfg.num_attention_heads, eps=cfg.layer_norm_eps,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got2[1, :5]),
                               np.asarray(got[1, :5]), atol=2e-5)


@pytest.mark.parametrize("n_splits", [1, 2])
def test_ffn_block_matches_jnp(n_splits):
    """Fused FFN-block kernel (incl. polynomial exact-erf gelu and the
    split-intermediate accumulation path) == the jnp sub-block."""
    from realise_tpu.config import config_for
    from realise_tpu.ops.bert import _ffn, init_bert_layer
    from realise_tpu.ops.pallas.bert_block import ffn_block

    cfg = config_for("bert-pho2-res-arch3", vocab_size=64, hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_seq_length=8,
                     hidden_dropout_prob=0.0)
    layer = init_bert_layer(jax.random.PRNGKey(4), cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 8, 16))
    want = _ffn(layer["ffn"], x, cfg, deterministic=True, rng=None)
    got = ffn_block(x, layer["ffn"], eps=cfg.layer_norm_eps,
                    n_splits=n_splits, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_model_forward_with_pallas_matches(tokenizer):
    """Whole-model parity: use_pallas deterministic forward == jnp forward."""
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import apply_realise, init_realise

    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                     hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     pho_num_layers=1, out_num_layers=1, max_seq_length=8,
                     max_position_embeddings=16, num_fonts=1)
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    feat = Featurizer(tokenizer, cfg)
    batch = feat.device_batch(feat.featurize(
        synthetic_dataset(tokenizer, 2, min_len=3, max_len=5, seed=0)))
    a = apply_realise(params, state, batch, cfg, use_pallas=False)
    b = apply_realise(params, state, batch, cfg, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a["logits"]),
                               np.asarray(b["logits"]), atol=2e-4)
