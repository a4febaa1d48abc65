"""Unified model tests: every zoo variant builds and runs; loss/fast-path
semantics hold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realise_tpu.config import MODEL_PRESETS, config_for
from realise_tpu.data.dataset import synthetic_dataset
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import (
    apply_pretrain,
    apply_realise,
    init_pretrain,
    init_realise,
    masked_cross_entropy,
    precompute_inference_tables,
)

TINY = dict(vocab_size=0, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48, pho_num_layers=1,
            max_seq_length=16, max_position_embeddings=32, num_fonts=2)



@pytest.fixture(scope="module")
def tokenizer(small_tokenizer):
    """Shadow the session 21k-vocab tokenizer: these are model-SEMANTICS
    tests; the small vocab cuts V-proportional compute (factorized scans,
    inference tables, tied head) that dominated their wall clock."""
    return small_tokenizer

@pytest.fixture(scope="module")
def featurized(tokenizer):
    cfg = config_for("bert-pho2-res-arch3",
                     **{**TINY, "vocab_size": len(tokenizer)})
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=4, seed=1)
    return cfg, feat.device_batch(feat.featurize(data))


def _batch_for(cfg, tokenizer):
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=2, seed=2)
    return feat.device_batch(feat.featurize(data))


FINETUNE_TYPES = [t for t in MODEL_PRESETS if not t.endswith("pretrain")]


@pytest.mark.parametrize("model_type", FINETUNE_TYPES)
def test_every_zoo_variant_runs(model_type, tokenizer):
    cfg = config_for(model_type, **{**TINY, "vocab_size": len(tokenizer)})
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    batch = _batch_for(cfg, tokenizer)
    out = apply_realise(params, state, batch, cfg)
    b, s = batch["src_idx"].shape
    assert out["logits"].shape == (b, s, cfg.vocab_size)
    assert jnp.isfinite(out["loss"]).item()


def test_forward_deterministic(featurized):
    cfg, batch = featurized
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    o1 = apply_realise(params, state, batch, cfg)
    o2 = apply_realise(params, state, batch, cfg)
    np.testing.assert_array_equal(np.asarray(o1["logits"]),
                                  np.asarray(o2["logits"]))


def test_gates_exposed(featurized):
    cfg, batch = featurized
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    out = apply_realise(params, state, batch, cfg, return_gates=True)
    b, s = batch["src_idx"].shape
    assert out["gates"].shape == (b, s, 3)


def test_tied_head_follows_word_embeddings(featurized):
    """The classifier must read the live word embeddings (structural tying,
    vs the reference's manual tie_cls_weight, src/models.py:700-701)."""
    cfg, batch = featurized
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    out1 = apply_realise(params, state, batch, cfg)
    params2 = jax.tree.map(lambda x: x, params)
    params2["bert"]["embeddings"]["word_embeddings"]["embedding"] = (
        params["bert"]["embeddings"]["word_embeddings"]["embedding"] * 2.0)
    out2 = apply_realise(params2, state, batch, cfg)
    assert not np.allclose(np.asarray(out1["logits"]),
                           np.asarray(out2["logits"]))


def test_masked_cross_entropy_ignores_masked_positions():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8), jnp.float32)
    labels = jnp.zeros((2, 4), jnp.int32)
    mask = jnp.array([[0, 1, 1, 0], [0, 1, 0, 0]], jnp.int32)
    base = masked_cross_entropy(logits, labels, mask)
    # Corrupt logits at masked-out positions: loss must not change.
    corrupted = logits.at[:, 0].set(100.0).at[0, 3].set(-50.0)
    same = masked_cross_entropy(corrupted, labels, mask)
    np.testing.assert_allclose(float(base), float(same), rtol=1e-6)


def test_inference_tables_match_full_forward(featurized, tokenizer):
    """The gather-based serving path must produce identical logits to the
    full conv+GRU eval path."""
    cfg, batch = featurized
    glyphs = np.random.RandomState(0).randn(
        cfg.vocab_size, cfg.num_fonts, 32, 32).astype(np.float32)
    params, state = init_realise(jax.random.PRNGKey(0), cfg, glyphs=glyphs)

    feat = Featurizer(tokenizer, cfg)
    vocab_pho_idx, vocab_pho_lens = feat.pho2_tables()
    tables = precompute_inference_tables(
        params, state, cfg,
        vocab_pho_idx=jnp.asarray(vocab_pho_idx),
        vocab_pho_lens=jnp.asarray(vocab_pho_lens))

    slow = apply_realise(params, state, batch, cfg)
    fast = apply_realise(params, state, batch, cfg, inference_tables=tables)
    np.testing.assert_allclose(np.asarray(slow["logits"]),
                               np.asarray(fast["logits"]), atol=2e-4)


def test_inference_table_cache_roundtrip(featurized, tokenizer, tmp_path):
    """cache_dir: second build is a file read with identical tables; changed
    params miss the cache (content digest, utils/cache.py)."""
    cfg, _ = featurized
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    feat = Featurizer(tokenizer, cfg)
    idx, lens = map(jnp.asarray, feat.pho2_tables())
    kw = dict(vocab_pho_idx=idx, vocab_pho_lens=lens,
              cache_dir=str(tmp_path))

    t1 = precompute_inference_tables(params, state, cfg, **kw)
    files = [f for f in tmp_path.iterdir() if f.suffix == ".npz"]
    assert len(files) == 1
    t2 = precompute_inference_tables(params, state, cfg, **kw)
    for k in t1:
        np.testing.assert_array_equal(np.asarray(t1[k]), np.asarray(t2[k]))

    # Perturbed params must not hit the stale entry.
    params2 = jax.tree.map(lambda x: x, params)
    params2["pho"]["gru"] = jax.tree.map(lambda x: x + 1.0,
                                         params2["pho"]["gru"])
    t3 = precompute_inference_tables(params2, state, cfg, **kw)
    assert len([f for f in tmp_path.iterdir() if f.suffix == ".npz"]) == 2
    assert not np.allclose(np.asarray(t1["pho"]), np.asarray(t3["pho"]))


def test_table_cache_roundtrips_bfloat16(tmp_path):
    """bfloat16 (the TPU serving dtype) cannot round-trip through np.savez
    natively — the cache stores a raw view + dtype sidecar. A cache that
    only works for f32 would silently rebuild every time in production."""
    import ml_dtypes

    from realise_tpu.utils.cache import load_tables, save_tables

    rng = np.random.default_rng(0)
    tables = {
        "res": rng.standard_normal((7, 5)).astype(ml_dtypes.bfloat16),
        "pho": rng.standard_normal((7, 5)).astype(np.float32),
    }
    save_tables(str(tmp_path), "abc", tables)
    out = load_tables(str(tmp_path), "abc")
    assert out is not None, "bf16 table did not survive the npz round-trip"
    for k in tables:
        assert out[k].dtype == tables[k].dtype
        np.testing.assert_array_equal(
            out[k].view(np.uint16) if k == "res" else out[k],
            tables[k].view(np.uint16) if k == "res" else tables[k])


def test_loss_decreases_with_identity_labels(featurized):
    """Sanity: loss on tgt==src with tied head should beat random labels."""
    cfg, batch = featurized
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    out = apply_realise(params, state, batch, cfg)
    rand_batch = dict(batch)
    rand_batch["tgt_idx"] = (batch["tgt_idx"] * 7 + 13) % cfg.vocab_size
    out_rand = apply_realise(params, state, rand_batch, cfg)
    assert jnp.isfinite(out["loss"]) and jnp.isfinite(out_rand["loss"])


# ------------------------------------------------------------- pretrain
def test_pho2_pretrain_runs(tokenizer):
    cfg = config_for("pho2-pretrain", **{**TINY, "vocab_size": len(tokenizer)})
    params, state = init_pretrain(jax.random.PRNGKey(0), cfg)
    batch = _batch_for(cfg, tokenizer)
    out = apply_pretrain(params, state, batch, cfg)
    assert jnp.isfinite(out["loss"]).item()


def test_pho2_res_pretrain_runs(tokenizer):
    cfg = config_for("pho2-res-pretrain", **{**TINY, "vocab_size": len(tokenizer)})
    params, state = init_pretrain(jax.random.PRNGKey(0), cfg)
    batch = _batch_for(cfg, tokenizer)
    out = apply_pretrain(params, state, batch, cfg)
    assert jnp.isfinite(out["loss"]).item()


def test_res_pretrain_runs(tokenizer):
    cfg = config_for("res-pretrain", **{**TINY, "vocab_size": len(tokenizer)})
    glyphs = np.random.RandomState(1).randn(
        cfg.vocab_size, cfg.num_fonts, 32, 32).astype(np.float32)
    params, state = init_pretrain(jax.random.PRNGKey(0), cfg, glyphs=glyphs)
    batch = {"char_idx": jnp.arange(8, dtype=jnp.int32)}
    out = apply_pretrain(params, state, batch, cfg, train=True)
    assert out["logits"].shape == (8, cfg.vocab_size)
    assert jnp.isfinite(out["loss"]).item()


def test_bfloat16_forward(featurized):
    """Mixed precision: bf16 activations must not upcast through the stack
    (regression: dense() once promoted bf16@f32 → f32, breaking scan)."""
    import jax.numpy as jnp

    cfg, batch = featurized
    cfg16 = cfg.replace(dtype="bfloat16")
    params, state = init_realise(jax.random.PRNGKey(0), cfg16)
    out = jax.jit(
        lambda p, s, b: apply_realise(p, s, b, cfg16)["logits"])(
            params, state, batch)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_vocab_factorized_streams_match_per_token():
    """Vocabulary factorization (per-VOCAB GRU scan + conv stack with
    occurrence-weighted BN, gathered per token) must compute the identical
    loss, gradients, and BN state updates to the per-token path — it is the
    same function, reparametrized over unique inputs."""
    import jax
    import jax.numpy as jnp

    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import apply_realise, init_realise
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict

    # Tiny vocabulary so that B·S > V triggers the factorized branch.
    vocab = build_synthetic_vocab(size=96)
    tok = WordPieceTokenizer(vocab_to_dict(vocab))
    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tok),
                     hidden_size=24, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=48,
                     pho_num_layers=1, out_num_layers=1, max_seq_length=16,
                     max_position_embeddings=32, num_fonts=2,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    feat = Featurizer(tok, cfg)
    data = synthetic_dataset(tok, num_examples=8, min_len=10, max_len=14,
                             seed=0)
    batch = {k: jnp.asarray(v)
             for k, v in feat.device_batch(feat.featurize(data)).items()}
    assert batch["src_idx"].size > len(tok)  # factorization profitable

    params, state_fac = init_realise(jax.random.PRNGKey(0), cfg,
                                     pho_tables=feat.pho2_tables())
    assert "pho_vocab_idx" in state_fac
    state_tok = {k: v for k, v in state_fac.items()
                 if not k.startswith(("pho_vocab_", "pho_uniq_"))}

    def loss(params, state):
        out = apply_realise(params, state, batch, cfg, deterministic=False,
                            rng=jax.random.PRNGKey(1), train=True)
        return out["loss"], out["state"]

    (l_fac, s_fac), g_fac = jax.value_and_grad(loss, has_aux=True)(
        params, state_fac)
    (l_tok, s_tok), g_tok = jax.value_and_grad(loss, has_aux=True)(
        params, state_tok)
    np.testing.assert_allclose(float(l_fac), float(l_tok), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g_fac, g_tok)
    # Weighted BN stats == instance BN stats.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s_fac["resnet"], s_tok["resnet"])
    # Deterministic eval (no tables) agrees too.
    e_fac = apply_realise(params, state_fac, batch, cfg)
    e_tok = apply_realise(params, state_tok, batch, cfg)
    np.testing.assert_allclose(np.asarray(e_fac["logits"]),
                               np.asarray(e_tok["logits"]), atol=1e-5)


def test_vocab_factorized_pretrain_matches_per_token():
    """Same equivalence for the pho2-pretrain objective."""
    import jax
    import jax.numpy as jnp

    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import apply_pretrain, init_pretrain
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict

    vocab = build_synthetic_vocab(size=96)
    tok = WordPieceTokenizer(vocab_to_dict(vocab))
    cfg = config_for("pho2-pretrain", vocab_size=len(tok), hidden_size=24,
                     num_attention_heads=2, intermediate_size=48,
                     pho_num_layers=1, max_seq_length=16,
                     max_position_embeddings=32,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    feat = Featurizer(tok, cfg)
    from realise_tpu.data.dataset import synthetic_dataset
    data = synthetic_dataset(tok, num_examples=8, min_len=10, max_len=14,
                             seed=0)
    batch = {k: jnp.asarray(v) for k, v in feat.device_batch(
        feat.featurize_pho_pretrain(data)).items()}
    params, state_fac = init_pretrain(jax.random.PRNGKey(0), cfg,
                                      pho_tables=feat.pho2_tables())
    assert "pho_vocab_idx" in state_fac
    state_tok = {k: v for k, v in state_fac.items()
                 if not k.startswith(("pho_vocab_", "pho_uniq_"))}

    def loss(params, state):
        out = apply_pretrain(params, state, batch, cfg, deterministic=False,
                             rng=jax.random.PRNGKey(1), train=True)
        return out["loss"]

    l_fac, g_fac = jax.value_and_grad(loss)(params, state_fac)
    l_tok, g_tok = jax.value_and_grad(loss)(params, state_tok)
    np.testing.assert_allclose(float(l_fac), float(l_tok), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g_fac, g_tok)


def test_unique_row_tables_reconstruct_and_gate():
    """install_glyphs / install_pho_vocab_tables: the deduplicated tables
    must reconstruct the originals through their inverse, and the glyph
    dedup must stand down when the vocab shares too few glyphs (the second
    image tensor would waste HBM for no conv-row cut)."""
    from realise_tpu.models.realise import (install_glyphs,
                                            install_pho_vocab_tables)

    rng = np.random.RandomState(0)
    # 64 distinct glyphs spread over 512 vocab rows (dedup profitable).
    base = rng.randn(64, 2, 8, 8).astype(np.float32)
    assign = rng.randint(0, 64, size=512)
    glyphs = base[assign]
    state = install_glyphs({}, glyphs)
    assert state["res_uniq_images_nhwc"].shape[0] == 128  # 64 padded to 128
    # Table is stored pre-transposed NHWC; undo to compare with the input.
    rebuilt = np.asarray(state["res_uniq_images_nhwc"]).transpose(0, 3, 1, 2)[
        np.asarray(state["res_uniq_inverse"])]
    np.testing.assert_array_equal(rebuilt, glyphs)

    # >75% unique rows: keep the plain per-vocab path, no duplicate tensor.
    state2 = install_glyphs({}, rng.randn(64, 2, 8, 8).astype(np.float32))
    assert "res_uniq_images_nhwc" not in state2

    # Pinyin tables: same reconstruction property (dedup always installed).
    idx = rng.randint(0, 30, size=(512, 6)).astype(np.int32)
    lens = rng.randint(0, 7, size=512).astype(np.int32)
    idx[assign == 0] = 0  # force sharing
    lens[assign == 0] = 3
    st = install_pho_vocab_tables({}, idx, lens)
    inv = np.asarray(st["pho_uniq_inverse"])
    np.testing.assert_array_equal(np.asarray(st["pho_uniq_idx"])[inv], idx)
    np.testing.assert_array_equal(np.asarray(st["pho_uniq_lens"])[inv], lens)
    assert st["pho_uniq_idx"].shape[0] % 128 == 0


def test_masked_ce_bias_fold_matches_unfused():
    """CE with bias= folded must equal CE(logits + bias) exactly in value
    and dlogits. dbias is NOT expected to match the unfused path bitwise:
    both reduce the same (bit-identical) emitted dlogits over rows, but the
    fused VJP accumulates in f32 while the unfused broadcast-add autodiff
    accumulates the bf16 cotangent in bf16 — so each is compared against an
    f64 oracle of that row-reduce, with the fused path held to a far
    tighter tolerance (it is strictly more precise)."""
    from realise_tpu.models.realise import masked_cross_entropy_sum

    rng = np.random.RandomState(1)
    for dt in (jnp.bfloat16, jnp.float32):
        ln = jnp.asarray(rng.randn(41, 67) * 2, dtype=dt)
        bias = jnp.asarray(rng.randn(67) * 0.5, jnp.float32)
        labels = jnp.asarray(rng.randint(0, 67, 41))
        m = jnp.asarray(rng.randint(0, 2, 41))
        unfused = lambda a: masked_cross_entropy_sum(
            a[0] + a[1].astype(a[0].dtype), labels, m)[0]
        fused = lambda a: masked_cross_entropy_sum(
            a[0], labels, m, bias=a[1])[0]
        su, gu = jax.value_and_grad(unfused)((ln, bias))
        sf, gf = jax.value_and_grad(fused)((ln, bias))
        assert float(su) == float(sf)
        np.testing.assert_array_equal(np.asarray(gu[0], np.float32),
                                      np.asarray(gf[0], np.float32))
        # f64 oracle: exact row-sum of the (identical) emitted dlogits.
        oracle = np.asarray(gf[0], np.float64).sum(axis=0)
        scale = np.abs(oracle).max() + 1e-12
        # Fused dbias: f32 accumulation over 41 rows — near-exact.
        np.testing.assert_allclose(np.asarray(gf[1], np.float64), oracle,
                                   rtol=1e-5, atol=1e-6 * scale)
        # Unfused dbias: bf16 accumulation for the bf16 case — loose.
        tol = 3e-2 if dt == jnp.bfloat16 else 1e-5
        np.testing.assert_allclose(np.asarray(gu[1], np.float64), oracle,
                                   rtol=tol, atol=tol * scale)


def test_masked_ce_sum_custom_vjp_matches_autodiff():
    """The fused CE VJP (bf16 dlogits, no materialized onehot) must match
    plain autodiff of the logsumexp formulation in value and gradient."""
    from realise_tpu.models.realise import masked_cross_entropy_sum

    def ref(logits, labels, m):
        l32 = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(l32, axis=-1)
        gold = jnp.take_along_axis(l32, labels[..., None], axis=-1)[..., 0]
        return ((logz - gold) * m.astype(jnp.float32)).sum()

    rng = np.random.RandomState(0)
    for dt in (jnp.float32, jnp.bfloat16):
        logits = jnp.asarray(rng.randn(37, 53) * 3, dtype=dt)
        labels = jnp.asarray(rng.randint(0, 53, 37))
        m = jnp.asarray(rng.randint(0, 2, 37))
        s_new, g_new = jax.value_and_grad(
            lambda l: masked_cross_entropy_sum(l, labels, m)[0])(logits)
        s_ref, g_ref = jax.value_and_grad(
            lambda l: ref(l, labels, m))(logits)
        np.testing.assert_allclose(float(s_new), float(s_ref), rtol=1e-6)
        assert g_new.dtype == dt  # dlogits stays in the logits dtype
        np.testing.assert_allclose(
            np.asarray(g_new, np.float32),
            np.asarray(g_ref.astype(dt), np.float32), rtol=2e-2, atol=1e-6)
        # Outer scaling must flow through the cotangent.
        g2 = jax.grad(
            lambda l: 3.5 * masked_cross_entropy_sum(l, labels, m)[0])(logits)
        np.testing.assert_allclose(
            np.asarray(g2, np.float32),
            np.asarray((3.5 * g_ref).astype(dt), np.float32),
            rtol=2e-2, atol=1e-6)
        assert float(masked_cross_entropy_sum(logits, labels, m)[1]) == \
            float(np.asarray(m).sum())


def test_conv_batch_unique_matches_full():
    """The batch-unique conv stage (``batch_slots > 0``: convolve only the
    glyph rows present in this call, compacted under a static shape by
    ``jnp.unique(size=batch_slots)``) must compute the same features, BN
    state update, and parameter gradients as the full-table path — it is
    the same occurrence-weighted function over fewer rows. Protects the
    reference semantics that the factorized conv equals the per-token conv
    exactly (src/char_cnn.py:35-55 + src/models.py:829-838)."""
    import jax
    import jax.numpy as jnp

    from realise_tpu.config import config_for
    from realise_tpu.models.realise import _factorized_conv
    from realise_tpu.ops.resnet import init_char_resnet

    cfg = config_for("bert-pho2-res-arch3", vocab_size=512, hidden_size=24,
                     num_fonts=2, glyph_size=8)
    g = 512
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(g, 2, 8, 8).astype(np.float32))
    rp, bn_state = init_char_resnet(jax.random.PRNGKey(0), in_channels=2,
                                    variant=cfg.res_encoder, hidden_size=24)
    state = {"char_images": images, "resnet": bn_state}
    # 64 token slots drawing from 40 distinct rows (with repeats, so the
    # occurrence-weighted BN pooling is actually exercised).
    src_idx = jnp.asarray(rng.randint(0, 40, size=(4, 16)), jnp.int32)
    n_uniq = len(np.unique(np.asarray(src_idx)))
    assert 1 < n_uniq <= 40
    dy = jnp.asarray(rng.randn(4, 16, 24).astype(np.float32))

    def run(train, slots):
        # jit per (train, slots): eager op-by-op grads through the 5-block
        # conv took >80 s on CPU; compiled it's seconds.
        @jax.jit
        def go(rp):
            def loss(rp):
                feats, new_bn = _factorized_conv(rp, state, src_idx, train,
                                                 cfg, jnp.float32,
                                                 batch_slots=slots)
                return (feats * dy).sum(), (feats, new_bn)
            return jax.value_and_grad(loss, has_aux=True)(rp)
        (l, (feats, new_bn)), grads = go(rp)
        return l, feats, new_bn, grads

    def assert_trees_close(a, b):
        jax.tree.map(lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-5), a, b)

    for train in (True, False):
        # Compact with headroom (fill slots weight 0), compact with the
        # budget EXACTLY at the unique count (no fill slots), and the
        # slots >= g degenerate guard must all equal the full table.
        l_f, f_f, bn_f, g_f = run(train, 0)
        for slots in (128, n_uniq, g + 128):
            l_c, f_c, bn_c, g_c = run(train, slots)
            # Same function; only the BN-stat reduction ORDER differs
            # (einsum over `slots` rows vs all g rows in f32).
            np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_f),
                                       rtol=1e-3, atol=1e-5)
            assert_trees_close(bn_c, bn_f)
            assert_trees_close(g_c, g_f)


def test_conv_slot_buckets_properties():
    """The candidate slot budgets the runner chooses from: every bucket
    must be profitable (undercut both the g-row vocab table and the
    n-token per-token conv by the documented 1024-row margin), cover the
    analytic uniform worst case at the top, and be sorted so `next(b for b
    in buckets if u <= b)` picks the smallest sufficient program."""
    import math

    from realise_tpu.models.realise import conv_slot_buckets

    for g, n in [(8192, 3072), (21248, 3072), (21248, 32768), (4096, 3072),
                 (21248, 131072), (3072, 3072)]:
        buckets = conv_slot_buckets(g, n)
        assert buckets == sorted(buckets)
        limit = min(g, n) - 1024
        worst = min(n, g, int(g * (1.0 - math.exp(-n / g))
                              + 4.0 * math.sqrt(g)))
        worst += (-worst) % 128
        for b in buckets:
            assert b <= limit, (g, n, b)
        if buckets:
            # Top bucket covers the padded analytic worst case whenever
            # that worst case is itself profitable.
            if worst <= limit:
                assert buckets[-1] >= worst, (g, n, buckets, worst)
    # Tiny tables/batches: no compact program is worth a second compile.
    assert conv_slot_buckets(400, 96) == []
    assert conv_slot_buckets(2048, 1024) == []


def test_install_glyphs_reinstall_clears_stale_dedup():
    """Re-installing glyphs that DON'T dedup (>75% unique) must drop a
    previous install's dedup tables — _factorized_conv prefers them, so
    stale tables would silently convolve the OLD glyphs forever."""
    import numpy as np

    from realise_tpu.models.realise import install_glyphs, res_conv_rows

    rng = np.random.RandomState(0)
    v = 64
    # First: highly-shared glyphs (dedup engages).
    shared = np.zeros((v, 1, 8, 8), np.float32)
    shared[:4] = rng.randn(4, 1, 8, 8)
    state = install_glyphs({}, shared)
    assert "res_uniq_images_nhwc" in state
    # Re-install with all-distinct glyphs (dedup skipped): the stale
    # tables must be gone and the row count must be the full vocab.
    distinct = rng.randn(v, 1, 8, 8).astype(np.float32)
    state = install_glyphs(state, distinct)
    assert "res_uniq_images_nhwc" not in state
    assert "res_uniq_inverse" not in state
    assert res_conv_rows(state) == v


def test_merged_fusion_without_streams_rejected():
    import pytest as _pytest

    from realise_tpu.config import config_for

    with _pytest.raises(ValueError, match="merged"):
        config_for("bert-pho2", pho_encoder="none")
