"""Pallas kernel parity tests (interpret mode on CPU) vs the jnp paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realise_tpu.config import RealiseConfig
from realise_tpu.ops.bert import attention_bias_from_mask
from realise_tpu.ops.fusion import gate_fusion, init_gate_fusion
from realise_tpu.ops.gru import gru_last_hidden, init_gru
from realise_tpu.ops.pallas.attention import fused_attention
from realise_tpu.ops.pallas.fusion import fused_gate_fusion
from realise_tpu.ops.pallas.gru import fused_gru_last_hidden


def test_fused_attention_matches_jnp():
    key = jax.random.PRNGKey(0)
    b, s, h, d = 2, 16, 2, 8
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, s, h, d))
               for i in range(3))
    mask = jnp.ones((b, s), jnp.int32).at[0, 10:].set(0)
    bias = attention_bias_from_mask(mask, jnp.float32)

    got = fused_attention(q, k, v, bias, interpret=True)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d ** 0.5)
    probs = jax.nn.softmax(scores + bias, axis=-1)
    want = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_attention_respects_mask():
    key = jax.random.PRNGKey(1)
    b, s, h, d = 1, 8, 1, 4
    q = jax.random.normal(key, (b, s, h, d))
    k1 = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d))
    v1 = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d))
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]])
    bias = attention_bias_from_mask(mask, jnp.float32)
    # Garbage in masked keys/values must not change valid outputs.
    k2 = k1.at[:, 4:].set(99.0)
    v2 = v1.at[:, 4:].set(-99.0)
    o1 = fused_attention(q, k1, v1, bias, interpret=True)
    o2 = fused_attention(q, k2, v2, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(o1[:, :4]), np.asarray(o2[:, :4]),
                               atol=1e-5)


def test_fused_gru_matches_scan():
    key = jax.random.PRNGKey(2)
    params = init_gru(key, 12, 16, stddev=0.3)
    n, p = 37, 6  # deliberately not a tile multiple
    x = jax.random.normal(key, (n, p, 12))
    lens = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, p + 1)
    want = gru_last_hidden(params, x, lens)
    got = fused_gru_last_hidden(params, x, lens, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("softmax_gate", [False, True])
def test_fused_gate_fusion_matches_jnp(softmax_gate):
    key = jax.random.PRNGKey(3)
    b, s, h = 3, 8, 16
    params = init_gate_fusion(key, h, 3)
    streams = [jax.random.normal(jax.random.fold_in(key, i), (b, s, h))
               for i in range(3)]
    mask = jnp.ones((b, s), jnp.int32).at[1, 5:].set(0)
    want = gate_fusion(params, streams, mask, softmax_gate=softmax_gate)
    got = fused_gate_fusion(params, streams, mask, softmax_gate=softmax_gate,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


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
