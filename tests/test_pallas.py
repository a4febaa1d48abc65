"""Pallas kernel parity tests (interpret mode on CPU) vs the jnp paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realise_tpu.config import RealiseConfig
from realise_tpu.ops.bert import attention_bias_from_mask



@pytest.fixture(scope="module")
def tokenizer(small_tokenizer):
    """Shadow the session 21k-vocab tokenizer: these are model-SEMANTICS
    tests; the small vocab cuts V-proportional compute (factorized scans,
    inference tables, tied head) that dominated their wall clock."""
    return small_tokenizer

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


# --------------------------------------------------------------------------
# Differentiable (training) block kernels — ops/pallas/bert_block_train.py
# --------------------------------------------------------------------------
def _train_cfg():
    from realise_tpu.config import config_for

    return config_for("bert-pho2-res-arch3", vocab_size=64, hidden_size=16,
                      num_hidden_layers=1, num_attention_heads=2,
                      intermediate_size=32, max_seq_length=8,
                      hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)


def test_train_blocks_grads_match_jnp_rate0():
    """custom-VJP kernels (dropout off) == jax.grad of the jnp sub-blocks,
    for the input grad and every weight/bias/LN grad."""
    from realise_tpu.ops.bert import _ffn, _self_attention, init_bert_layer
    from realise_tpu.ops.pallas.bert_block_train import (
        attention_block_train,
        ffn_block_train,
    )

    cfg = _train_cfg()
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 16))
    mask = jnp.ones((3, 8), jnp.int32).at[1, 5:].set(0)
    bias = attention_bias_from_mask(mask, jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 16))
    seed = jnp.array([5], jnp.int32)

    def attn_ref(x, p):
        return jnp.sum(_self_attention(p, x, bias, cfg, True, None) * dy)

    def attn_pal(x, p):
        return jnp.sum(attention_block_train(
            x, p, bias, seed, cfg.num_attention_heads, cfg.layer_norm_eps,
            0.0, 0.0, True) * dy)

    gr = jax.grad(attn_ref, argnums=(0, 1))(x, layer["attention"])
    gp = jax.grad(attn_pal, argnums=(0, 1))(x, layer["attention"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=3e-5), gr, gp)

    def ffn_ref(x, p):
        return jnp.sum(_ffn(p, x, cfg, True, None) * dy)

    def ffn_pal(x, p):
        return jnp.sum(ffn_block_train(
            x, p, seed, cfg.layer_norm_eps, 0.0, True) * dy)

    gr = jax.grad(ffn_ref, argnums=(0, 1))(x, layer["ffn"])
    gp = jax.grad(ffn_pal, argnums=(0, 1))(x, layer["ffn"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=3e-5), gr, gp)


def test_train_blocks_dropout_finite_difference():
    """With dropout ON the masks are a pure function of the seed, so the
    analytic gradient must match central finite differences — this proves
    the backward replays the forward's masks exactly."""
    from realise_tpu.ops.bert import init_bert_layer
    from realise_tpu.ops.pallas.bert_block_train import (
        attention_block_train,
        ffn_block_train,
    )

    cfg = _train_cfg()
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    bias = attention_bias_from_mask(jnp.ones((2, 8), jnp.int32), jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16))
    seed = jnp.array([5], jnp.int32)

    def loss_attn(x):
        return jnp.sum(attention_block_train(
            x, layer["attention"], bias, seed, cfg.num_attention_heads,
            cfg.layer_norm_eps, 0.2, 0.2, True) * dy)

    def loss_ffn(x):
        return jnp.sum(ffn_block_train(
            x, layer["ffn"], seed, cfg.layer_norm_eps, 0.2, True) * dy)

    rng = np.random.RandomState(0)
    for loss in (loss_attn, loss_ffn):
        g = jax.grad(loss)(x)
        for _ in range(4):
            idx = tuple(rng.randint(0, d) for d in x.shape)
            eps = 1e-2
            fd = (loss(x.at[idx].add(eps)) - loss(x.at[idx].add(-eps)))
            fd = float(fd) / (2 * eps)
            assert abs(fd - float(g[idx])) <= 2e-2 * max(abs(fd), 1.0), \
                (fd, float(g[idx]))


def test_train_blocks_dropout_deterministic_and_stochastic():
    from realise_tpu.ops.bert import init_bert_layer
    from realise_tpu.ops.pallas.bert_block_train import attention_block_train

    cfg = _train_cfg()
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16))
    bias = attention_bias_from_mask(jnp.ones((2, 8), jnp.int32), jnp.float32)

    def run(s):
        return attention_block_train(
            x, layer["attention"], bias, jnp.array([s], jnp.int32),
            cfg.num_attention_heads, cfg.layer_norm_eps, 0.3, 0.3, True)

    a, b, c = run(7), run(7), run(8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_keep_mask_rate_and_determinism():
    """The counter-based hash mask hits the requested keep rate and is a
    pure function of (seed, site, example)."""
    from realise_tpu.ops.pallas.bert_block_train import (
        _keep_mask,
        _site_base,
    )

    rates = []
    for ex in range(16):
        base = _site_base(jnp.int32(123), 3, jnp.int32(ex))
        m = np.asarray(_keep_mask(base, 64, 128, 0.9))
        rates.append((m > 0).mean())
        m2 = np.asarray(_keep_mask(base, 64, 128, 0.9))
        np.testing.assert_array_equal(m, m2)
        # Survivors are scaled by 1/keep.
        np.testing.assert_allclose(m[m > 0], 1.0 / 0.9, rtol=1e-6)
    assert abs(float(np.mean(rates)) - 0.9) < 0.01, np.mean(rates)


def test_keep_mask_dual_sample_stream(monkeypatch):
    """REALISE_TPU_DROPOUT_SAMPLES=2 (two 16-bit Bernoulli draws per hash)
    must still hit the keep rate, scale survivors by 1/keep, stay
    deterministic, and fall back to the 24-bit stream when cols % 256 != 0."""
    from realise_tpu.ops.pallas.bert_block_train import _keep_mask, _site_base

    monkeypatch.setenv("REALISE_TPU_DROPOUT_SAMPLES", "2")
    rates = []
    for ex in range(16):
        base = _site_base(jnp.int32(77), 5, jnp.int32(ex))
        m = np.asarray(_keep_mask(base, 64, 256, 0.9))
        rates.append((m > 0).mean())
        np.testing.assert_array_equal(m, np.asarray(_keep_mask(base, 64, 256, 0.9)))
        np.testing.assert_allclose(m[m > 0], 1.0 / 0.9, rtol=1e-6)
    assert abs(float(np.mean(rates)) - 0.9) < 0.01, np.mean(rates)

    # Left/right column halves draw from different bits of the same hash —
    # they must not be copies of each other.
    m = np.asarray(_keep_mask(jnp.uint32(4242), 64, 256, 0.5)) > 0
    assert abs(float((m[:, :128] == m[:, 128:]).mean()) - 0.5) < 0.05

    # Odd-vreg widths keep the classic stream (identical to samples=1).
    a = np.asarray(_keep_mask(jnp.uint32(9), 64, 128, 0.5))
    monkeypatch.setenv("REALISE_TPU_DROPOUT_SAMPLES", "1")
    np.testing.assert_array_equal(a, np.asarray(_keep_mask(jnp.uint32(9), 64, 128, 0.5)))


def test_keep_mask_nearby_bases_give_disjoint_streams():
    """Bases closer than rows*cols must NOT share a shifted run of bits
    (the old single-round ``_mix(base + idx)`` did): agreement between two
    adjacent-base masks stays at chance under every small shift."""
    from realise_tpu.ops.pallas.bert_block_train import _keep_mask

    a = (np.asarray(_keep_mask(jnp.uint32(1000), 64, 128, 0.5)) > 0).ravel()
    b = (np.asarray(_keep_mask(jnp.uint32(1001), 64, 128, 0.5)) > 0).ravel()
    n = a.size
    for shift in range(8):
        agree = float((a[: n - shift] == b[shift:]).mean()) if shift else \
            float((a == b).mean())
        assert abs(agree - 0.5) < 0.05, (shift, agree)


def test_model_train_grads_with_pallas_match_rate0(tokenizer):
    """Whole-model: apply_realise loss grads with use_pallas=True equal the
    jnp path when dropout is off (the only stochastic divergence between
    the two training paths is the dropout bit-stream)."""
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import apply_realise, init_realise

    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                     hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     pho_num_layers=1, out_num_layers=1, max_seq_length=8,
                     max_position_embeddings=16, num_fonts=1,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    feat = Featurizer(tokenizer, cfg)
    batch = feat.device_batch(feat.featurize(
        synthetic_dataset(tokenizer, 2, min_len=3, max_len=5, seed=0)))
    rng = jax.random.PRNGKey(3)

    def loss(params, use_pallas):
        out = apply_realise(params, state, batch, cfg, deterministic=False,
                            rng=rng, train=True, use_pallas=use_pallas)
        return out["loss"]

    g_jnp = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), g_jnp, g_pal)


def test_trainer_fits_with_pallas_kernels(tokenizer):
    """End-to-end: a Trainer with use_pallas=True (dropout on → in-kernel
    masks + custom VJP) drives the loss down on an overfit batch."""
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.trainer import Trainer

    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                     hidden_size=24, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=48,
                     pho_num_layers=1, out_num_layers=1, max_seq_length=12,
                     max_position_embeddings=32, num_fonts=1,
                     hidden_dropout_prob=0.1,
                     attention_probs_dropout_prob=0.1)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=8, max_len=8, seed=0)
    batch = feat.device_batch(feat.featurize(data))
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, params, state, learning_rate=2e-3, total_steps=400,
                 use_pallas=True)
    first = float(tr.train_step(batch))
    for _ in range(29):
        loss = tr.train_step(batch)
    assert float(loss) < first - 1.0, (first, float(loss))


def test_attention_train_bf16_forward_and_grad():
    """bf16 path: the train kernel's forward (dropout 0) matches the serving
    kernel's bit-for-bit (same activation-dtype rounding at the out-proj),
    and its backward produces a bf16 bias cotangent (not f32 — jax's
    custom_vjp tolerance for that is a deprecated escape hatch)."""
    from realise_tpu.ops.bert import init_bert_layer
    from realise_tpu.ops.pallas.bert_block import attention_block
    from realise_tpu.ops.pallas.bert_block_train import attention_block_train

    cfg = _train_cfg()
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16)).astype(
        jnp.bfloat16)
    mask = jnp.ones((2, 8), jnp.int32).at[0, 6:].set(0)
    bias = attention_bias_from_mask(mask, jnp.bfloat16)
    seed = jnp.array([3], jnp.int32)

    serve = attention_block(x, layer["attention"],
                            bias.astype(jnp.float32),
                            cfg.num_attention_heads, cfg.layer_norm_eps,
                            interpret=True)
    train = attention_block_train(x, layer["attention"], bias, seed,
                                  cfg.num_attention_heads,
                                  cfg.layer_norm_eps, 0.0, 0.0, True)
    np.testing.assert_array_equal(
        np.asarray(serve, np.float32), np.asarray(train, np.float32))

    def loss(x, p, b):
        return jnp.sum(attention_block_train(
            x, p, b, seed, cfg.num_attention_heads, cfg.layer_norm_eps,
            0.0, 0.0, True).astype(jnp.float32))

    dx, dp, db = jax.grad(loss, argnums=(0, 1, 2))(x, layer["attention"],
                                                   bias)
    assert dx.dtype == jnp.bfloat16
    assert db.dtype == jnp.bfloat16  # the primal's dtype, exactly
    assert np.isfinite(np.asarray(dx, np.float32)).all()


def test_attention_train_save_qkv_bit_identical(monkeypatch):
    """REALISE_TPU_ATTN_SAVE_QKV=1 (stream q/k/v out of the forward and read
    them in the backward instead of recomputing the input projections) must
    be bit-identical to the default recompute path — forward output, input
    grad, every weight/bias/LN grad, and the bias cotangent — with dropout
    both off and on (same counter-based mask streams either way)."""
    from realise_tpu.ops.bert import init_bert_layer
    from realise_tpu.ops.pallas.bert_block_train import attention_block_train

    cfg = _train_cfg()
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 16)).astype(
        jnp.bfloat16)
    mask = jnp.ones((3, 8), jnp.int32).at[1, 5:].set(0)
    bias = attention_bias_from_mask(mask, jnp.bfloat16)
    seed = jnp.array([7], jnp.int32)

    def run(p_rate, h_rate):
        def loss(x, p, b):
            return jnp.sum(attention_block_train(
                x, p, b, seed, cfg.num_attention_heads, cfg.layer_norm_eps,
                p_rate, h_rate, True).astype(jnp.float32))
        y = attention_block_train(x, layer["attention"], bias, seed,
                                  cfg.num_attention_heads,
                                  cfg.layer_norm_eps, p_rate, h_rate, True)
        grads = jax.grad(loss, argnums=(0, 1, 2))(x, layer["attention"],
                                                  bias)
        return jax.tree.map(lambda a: np.asarray(a, np.float32), (y, grads))

    for rates in ((0.0, 0.0), (0.25, 0.1)):
        monkeypatch.setenv("REALISE_TPU_ATTN_SAVE_QKV", "0")
        base = run(*rates)
        monkeypatch.setenv("REALISE_TPU_ATTN_SAVE_QKV", "1")
        saved = run(*rates)
        jax.tree.map(np.testing.assert_array_equal, base, saved)


def test_attention_train_fused_qkv_matches(monkeypatch):
    """REALISE_TPU_ATTN_FUSED_QKV=1 (q/k/v as one (rows, H)x(H, 3H) matmul
    against the concatenated [Wq|Wk|Wv]; dx/dW as single 3H-wide matmuls in
    the backward) computes the same function: per output column the f32
    contraction is unchanged, so forward and every projection grad match the
    three-dot path exactly; only dx's three-term sum becomes one wider
    contraction (different f32 add order — allclose, not array_equal).
    Checked with dropout off and on, and composed with SAVE_QKV."""
    from realise_tpu.ops.bert import init_bert_layer
    from realise_tpu.ops.pallas.bert_block_train import attention_block_train

    cfg = _train_cfg()
    layer = init_bert_layer(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 16)).astype(
        jnp.bfloat16)
    mask = jnp.ones((3, 8), jnp.int32).at[1, 5:].set(0)
    bias = attention_bias_from_mask(mask, jnp.bfloat16)
    seed = jnp.array([7], jnp.int32)

    def run(p_rate, h_rate):
        def loss(x, p, b):
            return jnp.sum(attention_block_train(
                x, p, b, seed, cfg.num_attention_heads, cfg.layer_norm_eps,
                p_rate, h_rate, True).astype(jnp.float32))
        y = attention_block_train(x, layer["attention"], bias, seed,
                                  cfg.num_attention_heads,
                                  cfg.layer_norm_eps, p_rate, h_rate, True)
        grads = jax.grad(loss, argnums=(0, 1, 2))(x, layer["attention"],
                                                  bias)
        return jax.tree.map(lambda a: np.asarray(a, np.float32), (y, grads))

    for save_qkv in ("0", "1"):
        monkeypatch.setenv("REALISE_TPU_ATTN_SAVE_QKV", save_qkv)
        for rates in ((0.0, 0.0), (0.25, 0.1)):
            monkeypatch.setenv("REALISE_TPU_ATTN_FUSED_QKV", "0")
            base = run(*rates)
            monkeypatch.setenv("REALISE_TPU_ATTN_FUSED_QKV", "1")
            fused = run(*rates)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    a, b, rtol=2e-5, atol=2e-6),
                base, fused)
