"""Unit tests for the primitive ops (bert/gru/resnet/fusion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realise_tpu.config import RealiseConfig
from realise_tpu.ops.bert import (
    attention_bias_from_mask,
    bert_model,
    init_bert_model,
)
from realise_tpu.ops.fusion import (
    gate_fusion,
    init_gate_fusion,
    masked_mean_pool,
)
from realise_tpu.ops.gru import gru_cell, gru_last_hidden, init_gru
from realise_tpu.ops.layers import layer_norm, init_layer_norm
from realise_tpu.ops.resnet import char_resnet, init_char_resnet


CFG = RealiseConfig(
    vocab_size=64, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=32, max_seq_length=8)


def test_layer_norm_normalizes():
    params = init_layer_norm(16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16)) * 5 + 3
    y = layer_norm(params, x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-2)


def test_bert_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    params = init_bert_model(key, CFG, num_layers=2)
    ids = jax.random.randint(key, (3, 8), 0, CFG.vocab_size)
    mask = jnp.ones((3, 8), jnp.int32)
    out1 = bert_model(params, CFG, input_ids=ids, attention_mask=mask)
    out2 = bert_model(params, CFG, input_ids=ids, attention_mask=mask)
    assert out1.shape == (3, 8, 16)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_bert_padding_mask_blocks_attention():
    """Padding positions must not influence valid positions' outputs."""
    key = jax.random.PRNGKey(1)
    params = init_bert_model(key, CFG, num_layers=2)
    ids_a = jnp.array([[5, 6, 7, 8, 0, 0, 0, 0]])
    ids_b = jnp.array([[5, 6, 7, 8, 9, 3, 2, 1]])  # different padding content
    mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]])
    out_a = bert_model(params, CFG, input_ids=ids_a, attention_mask=mask)
    out_b = bert_model(params, CFG, input_ids=ids_b, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out_a[:, :4]), np.asarray(out_b[:, :4]),
                               atol=1e-5)


def test_bert_inputs_embeds_and_zero_positions():
    key = jax.random.PRNGKey(2)
    params = init_bert_model(key, CFG, num_layers=2, with_word=False)
    embeds = jax.random.normal(key, (2, 8, 16))
    mask = jnp.ones((2, 8), jnp.int32)
    pos0 = jnp.zeros((2, 8), jnp.int32)
    out = bert_model(params, CFG, inputs_embeds=embeds, attention_mask=mask,
                     position_ids=pos0)
    assert out.shape == (2, 8, 16)
    # With zeroed positions a permutation of inputs permutes outputs
    # (no positional signal; attention is permutation-equivariant).
    perm = jnp.array([3, 1, 0, 2, 4, 5, 6, 7])
    out_perm = bert_model(params, CFG, inputs_embeds=embeds[:, perm],
                          attention_mask=mask, position_ids=pos0)
    np.testing.assert_allclose(np.asarray(out[:, perm]), np.asarray(out_perm),
                               atol=1e-5)


def test_dropout_active_in_training():
    key = jax.random.PRNGKey(3)
    params = init_bert_model(key, CFG, num_layers=1)
    ids = jnp.zeros((2, 8), jnp.int32)
    det = bert_model(params, CFG, input_ids=ids)
    r1 = bert_model(params, CFG, input_ids=ids, deterministic=False,
                    rng=jax.random.PRNGKey(10))
    r2 = bert_model(params, CFG, input_ids=ids, deterministic=False,
                    rng=jax.random.PRNGKey(11))
    assert not np.allclose(np.asarray(det), np.asarray(r1))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    # Same rng -> same result (reproducibility).
    r1b = bert_model(params, CFG, input_ids=ids, deterministic=False,
                     rng=jax.random.PRNGKey(10))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r1b))


# ------------------------------------------------------------------- GRU
def _np_gru_reference(params, inputs, lengths):
    """Plain numpy GRU replicating pack_padded 'last valid hidden' semantics."""
    w_ih = np.asarray(params["w_ih"]); w_hh = np.asarray(params["w_hh"])
    b_ih = np.asarray(params["b_ih"]); b_hh = np.asarray(params["b_hh"])
    n, p, d = inputs.shape
    h_dim = w_hh.shape[0]
    out = np.zeros((n, h_dim), np.float32)
    sigmoid = lambda x: 1 / (1 + np.exp(-x))
    for i in range(n):
        h = np.zeros((h_dim,), np.float32)
        for t in range(int(lengths[i])):
            gi = inputs[i, t] @ w_ih + b_ih
            gh = h @ w_hh + b_hh
            i_r, i_z, i_n = np.split(gi, 3)
            h_r, h_z, h_n = np.split(gh, 3)
            r = sigmoid(i_r + h_r)
            z = sigmoid(i_z + h_z)
            ncand = np.tanh(i_n + r * h_n)
            h = (1 - z) * ncand + z * h
        out[i] = h
    return out


def test_gru_matches_numpy_reference_with_ragged_lengths():
    key = jax.random.PRNGKey(4)
    params = init_gru(key, 8, 12, stddev=0.5)
    x = np.asarray(jax.random.normal(key, (5, 6, 8)), np.float32)
    lens = np.array([6, 1, 3, 0, 5], np.int32)
    got = np.asarray(gru_last_hidden(params, jnp.asarray(x), jnp.asarray(lens)))
    want = _np_gru_reference(params, x, lens)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gru_factored_matches_embedding_then_gru():
    """gru_last_hidden_factored(table, idx) == gru_last_hidden(table[idx]):
    folding the input projection through the alphabet is associativity,
    not an approximation — values AND grads must match."""
    from realise_tpu.ops.gru import gru_last_hidden_factored

    key = jax.random.PRNGKey(6)
    params = init_gru(key, 8, 8, stddev=0.3)
    table = jax.random.normal(jax.random.fold_in(key, 1), (33, 8)) * 0.5
    idx = jax.random.randint(jax.random.fold_in(key, 2), (7, 6), 0, 33)
    lens = jnp.array([6, 1, 3, 0, 5, 2, 4], jnp.int32)

    def ref(params, table):
        return gru_last_hidden(params, jnp.take(table, idx, axis=0), lens)

    def fac(params, table):
        return gru_last_hidden_factored(params, table, idx, lens)

    np.testing.assert_allclose(np.asarray(ref(params, table)),
                               np.asarray(fac(params, table)), atol=1e-5)
    dy = jax.random.normal(jax.random.fold_in(key, 3), (7, 8))
    gr = jax.grad(lambda p, t: jnp.sum(ref(p, t) * dy), argnums=(0, 1))(
        params, table)
    gf = jax.grad(lambda p, t: jnp.sum(fac(p, t) * dy), argnums=(0, 1))(
        params, table)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5), gr, gf)


def test_gru_padding_after_length_is_ignored():
    key = jax.random.PRNGKey(5)
    params = init_gru(key, 4, 4)
    x1 = jax.random.normal(key, (2, 5, 4))
    x2 = x1.at[:, 3:].set(99.0)  # garbage in padded region
    lens = jnp.array([3, 2])
    h1 = gru_last_hidden(params, x1, lens)
    h2 = gru_last_hidden(params, x2, lens)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


# ---------------------------------------------------------------- resnet
def test_char_resnet_shapes_and_channel_plan():
    from realise_tpu.ops.resnet import _channels

    assert _channels("resnet", 768) == [64, 128, 256, 512, 768]
    assert _channels("resnet1", 768) == [64, 128, 192, 192]

    key = jax.random.PRNGKey(6)
    params, state = init_char_resnet(key, in_channels=3, hidden_size=48)
    x = jax.random.normal(key, (5, 32, 32, 3))
    out, _ = char_resnet(params, state, x, train=False, hidden_size=48)
    assert out.shape == (5, 48)


def test_char_resnet1_flattens_to_hidden():
    key = jax.random.PRNGKey(7)
    params, state = init_char_resnet(key, 1, variant="resnet1", hidden_size=48)
    x = jax.random.normal(key, (2, 32, 32, 1))
    out, _ = char_resnet(params, state, x, train=False, variant="resnet1",
                         hidden_size=48)
    assert out.shape == (2, 48)


def test_batchnorm_state_updates_in_train_only():
    key = jax.random.PRNGKey(8)
    params, state = init_char_resnet(key, 1, hidden_size=24)
    x = jax.random.normal(key, (4, 32, 32, 1)) * 3 + 1
    _, state_eval = char_resnet(params, state, x, train=False, hidden_size=24)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), state, state_eval))
    _, state_train = char_resnet(params, state, x, train=True, hidden_size=24)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(not jnp.array_equal(a, b)), state, state_train))
    assert any(changed)


# ---------------------------------------------------------------- fusion
def test_masked_mean_pool():
    h = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    mask = jnp.array([[1, 1, 0, 0]])
    got = masked_mean_pool(h, mask)
    want = np.arange(24, dtype=np.float32).reshape(4, 6)[:2].mean(0)
    np.testing.assert_allclose(np.asarray(got[0]), want)


def test_gate_fusion_bounds_and_shapes():
    key = jax.random.PRNGKey(9)
    params = init_gate_fusion(key, 16, 3)
    streams = [jax.random.normal(jax.random.fold_in(key, i), (2, 8, 16))
               for i in range(3)]
    mask = jnp.ones((2, 8), jnp.int32)
    fused, gates = gate_fusion(params, streams, mask, return_gates=True)
    assert fused.shape == (2, 8, 16)
    assert gates.shape == (2, 8, 3)
    assert (np.asarray(gates) >= 0).all() and (np.asarray(gates) <= 1).all()


def test_softmax_gate_sums_to_one():
    key = jax.random.PRNGKey(10)
    params = init_gate_fusion(key, 16, 3)
    streams = [jax.random.normal(jax.random.fold_in(key, i), (2, 8, 16))
               for i in range(3)]
    mask = jnp.ones((2, 8), jnp.int32)
    _, gates = gate_fusion(params, streams, mask, softmax_gate=True,
                           return_gates=True)
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, atol=1e-5)


def test_host_normal_deterministic_and_distinct():
    """host_normal (the init draw primitive): same key → identical draw,
    split keys → decorrelated draws, moments ≈ N(0, std)."""
    import jax

    from realise_tpu.ops.layers import host_normal

    k = jax.random.PRNGKey(42)
    a = np.asarray(host_normal(k, (4096,), 0.02))
    b = np.asarray(host_normal(k, (4096,), 0.02))
    np.testing.assert_array_equal(a, b)

    k1, k2 = jax.random.split(k)
    c = np.asarray(host_normal(k1, (4096,), 0.02))
    d = np.asarray(host_normal(k2, (4096,), 0.02))
    assert abs(np.corrcoef(c, d)[0, 1]) < 0.1
    assert abs(c.mean()) < 0.002 and abs(c.std() - 0.02) < 0.002

    # Under jit (tracer key) it falls back to the traced path and still
    # produces finite draws of the right shape/scale.
    e = jax.jit(lambda kk: host_normal(kk, (512,), 0.02))(k)
    e = np.asarray(e)
    assert e.shape == (512,) and np.isfinite(e).all()
    assert abs(e.std() - 0.02) < 0.005


def test_table_gather_bwd_algorithms_agree():
    """Both table_gather backwards — one-hot matmul-transpose (default) and
    sorted segment-sum (REALISE_TPU_GATHER_BWD=sort_segment) — produce the
    gradient of jnp.take, including repeated and unused ids."""
    import jax

    from realise_tpu.ops.layers import _table_gather

    rng = np.random.default_rng(3)
    v, h, n = 97, 16, 4096 + 37  # n > chunk would be slow here; cover both
    table = jnp.asarray(rng.standard_normal((v, h)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v - 5, size=(n,)), jnp.int32)
    ct = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)

    def grad_with(algo):
        meta = (v, "float32", algo)
        f = lambda t: (_table_gather(t, ids, meta) * ct).sum()
        return np.asarray(jax.grad(f)(table))

    g_ref = np.zeros((v, h), np.float32)
    np.add.at(g_ref, np.asarray(ids), np.asarray(ct))
    g1 = grad_with("onehot")
    g2 = grad_with("sort_segment")
    np.testing.assert_allclose(g1, g_ref, atol=1e-4)
    np.testing.assert_allclose(g2, g_ref, atol=1e-4)
