"""Whole-model numerical parity against faithful torch replicas.

Round-1 verdict item #1: per-component parity (BERT stack, GRU, conv,
tokenizer) cannot catch a wrong gate order, a swapped stream, or a subtly
wrong output block. These tests run the ENTIRE model — fusion wiring, output
block, tied head, masked loss — against torch replicas of the reference
architectures (tests/torch_ref.py, built with installed torch/transformers),
with weights flowing through the same `import_realise_state_dict` mapping
released checkpoints would use. Passing means checkpoint drop-in correctness
is a mapping fact, not an inference from parts.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from realise_tpu.config import (
    PHO1_VOCAB_SIZE,
    PHO2_VOCAB_SIZE,
    config_for,
)
from realise_tpu.models.realise import (
    apply_pretrain,
    apply_realise,
    init_pretrain,
    init_realise,
)
from realise_tpu.models.torch_import import (
    import_realise_state_dict,
    merge_torch_state_dicts,
    normalize_state_dict,
    overlay_params,
)

import torch_ref


# Tiny-but-real dims: hidden divisible by 12 (CharResNet channel plan) and by
# the head count; glyphs stay 32x32 (five stride-2 blocks need them).
TINY = dict(vocab_size=80, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=32, pho_num_layers=2,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)

B, S, P = 2, 10, 5


def make_batch(seed, vocab_size, with_pho2=True, with_pho1=False):
    rng = np.random.RandomState(seed)
    src = rng.randint(4, vocab_size, size=(B, S)).astype(np.int32)
    tgt = rng.randint(4, vocab_size, size=(B, S)).astype(np.int32)
    masks = np.ones((B, S), np.int32)
    masks[1, 7:] = 0
    loss_masks = masks.copy()
    loss_masks[:, 0] = 0           # [CLS]-style exclusion
    loss_masks[0, S - 1] = 0
    batch = {"src_idx": src, "tgt_idx": tgt, "masks": masks,
             "loss_masks": loss_masks}
    if with_pho2:
        batch["pho_idx"] = rng.randint(
            1, PHO2_VOCAB_SIZE, size=(B, S, P)).astype(np.int32)
        batch["pho_lens"] = rng.randint(1, P + 1, size=(B, S)).astype(np.int32)
    if with_pho1:
        batch["pho1_idx"] = rng.randint(
            1, PHO1_VOCAB_SIZE, size=(B, S, 3)).astype(np.int32)
    return batch


def to_torch(batch):
    return {k: torch.tensor(np.asarray(v, np.int64)) for k, v in batch.items()}


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def perturb_bn_and_eval(model, batch):
    """One train-mode forward gives BN running stats non-trivial values
    (fresh mean-0/var-1 stats would mask normalization mapping bugs)."""
    model.train()
    with torch.no_grad():
        model(batch)
    model.eval()


def assert_parity(torch_model, batch, cfg, apply_fn, atol=3e-4):
    tbatch = to_torch(batch)
    perturb_bn_and_eval(torch_model, tbatch)
    with torch.no_grad():
        want_loss, want_logits = torch_model(tbatch)

    sd = normalize_state_dict(torch_ref.numpy_state_dict(torch_model))
    params, state = import_realise_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    out = apply_fn(params, state, to_jnp(batch), cfg, deterministic=True,
                   train=False)

    np.testing.assert_allclose(np.asarray(out["logits"]),
                               want_logits.numpy(), atol=atol)
    np.testing.assert_allclose(float(out["loss"]),
                               float(want_loss), atol=1e-5)
    return params, state


def test_arch3_whole_model_parity():
    """The published ReaLiSe model end-to-end (src/models.py:806-870)."""
    cfg = config_for("bert-pho2-res-arch3", **TINY, num_fonts=2,
                     dtype="float32")
    torch.manual_seed(0)
    model = torch_ref.TorchArch3(cfg, PHO2_VOCAB_SIZE)
    model.tie_cls_weight()
    assert_parity(model, make_batch(0, cfg.vocab_size), cfg, apply_realise)


def test_arch4_softmax_gate_parity():
    """arch4: softmax over the three gate logits (src/models.py:1144-1148)."""
    cfg = config_for("bert-pho2-res-arch4", **TINY, num_fonts=2,
                     dtype="float32")
    torch.manual_seed(1)
    model = torch_ref.TorchArch3(cfg, PHO2_VOCAB_SIZE, softmax_gate=True)
    model.tie_cls_weight()
    assert_parity(model, make_batch(1, cfg.vocab_size), cfg, apply_realise)


def test_arch3_mlm_head_parity():
    """arch3-MLM: untied BertOnlyMLMHead classifier (src/models.py:912)."""
    cfg = config_for("bert-pho2-res-arch3-mlm", **TINY, num_fonts=2,
                     dtype="float32")
    torch.manual_seed(2)
    model = torch_ref.TorchArch3(cfg, PHO2_VOCAB_SIZE, mlm_head=True)
    assert_parity(model, make_batch(2, cfg.vocab_size), cfg, apply_realise)


def test_arch2_concat_fusion_parity():
    """arch2: three streams, concat(3H)+integrate (src/models.py:513-649)."""
    cfg = config_for("bert-pho2-res-arch2", **TINY, dtype="float32")
    torch.manual_seed(3)
    model = torch_ref.TorchArch2(cfg, PHO2_VOCAB_SIZE)
    model.tie_cls_weight()
    assert_parity(model, make_batch(3, cfg.vocab_size), cfg, apply_realise)


def test_merged_pho2res_parity():
    """SpellBertPho2Res: RAW res sum into the shared pho_res_model
    (src/models.py:382-511) — covers the pho_res_model.* import mapping."""
    cfg = config_for("bert-pho2-res", **TINY, dtype="float32")
    torch.manual_seed(4)
    model = torch_ref.TorchMergedPho2Res(cfg, PHO2_VOCAB_SIZE)
    model.tie_cls_weight()
    assert_parity(model, make_batch(4, cfg.vocab_size), cfg, apply_realise)


def test_merged_pho2_parity():
    """SpellBertPho2 (src/models.py:163-249), no glyph stream."""
    cfg = config_for("bert-pho2", **TINY, dtype="float32")
    torch.manual_seed(5)
    model = torch_ref.TorchMergedPho2(cfg, PHO2_VOCAB_SIZE)
    model.tie_cls_weight()
    assert_parity(model, make_batch(5, cfg.vocab_size), cfg, apply_realise)


def test_merged_pho1_parity():
    """SpellBertPho1: summed initial/final/tone embeddings
    (src/models.py:75-161)."""
    cfg = config_for("bert-pho1", **TINY, dtype="float32")
    torch.manual_seed(6)
    model = torch_ref.TorchMergedPho1(cfg, PHO1_VOCAB_SIZE)
    model.tie_cls_weight()
    batch = make_batch(6, cfg.vocab_size, with_pho2=False, with_pho1=True)
    assert_parity(model, batch, cfg, apply_realise)


def test_merged_pho1res_parity():
    """SpellBertPho1Res: pho1 embeddings + raw res into pho_res_model
    (src/models.py:251-380)."""
    cfg = config_for("bert-pho1-res", **TINY, dtype="float32")
    torch.manual_seed(7)
    model = torch_ref.TorchMergedPho1(cfg, PHO1_VOCAB_SIZE, with_res=True)
    model.tie_cls_weight()
    batch = make_batch(7, cfg.vocab_size, with_pho2=False, with_pho1=True)
    assert_parity(model, batch, cfg, apply_realise)


def test_spellbert_parity():
    """BERT-only SpellBert baseline (src/models.py:32-73)."""
    cfg = config_for("bert", **TINY, dtype="float32")
    torch.manual_seed(8)
    model = torch_ref.TorchSpellBert(cfg)
    model.tie_cls_weight()
    batch = make_batch(8, cfg.vocab_size, with_pho2=False)
    assert_parity(model, batch, cfg, apply_realise)


def test_pho2_pretrain_parity():
    """Pho2Pretrain: pinyin -> char identity, cls2 MLM head
    (src/models.py:1286-1347); input/labels are the target sequence."""
    cfg = config_for("pho2-pretrain", **TINY, dtype="float32")
    torch.manual_seed(9)
    model = torch_ref.TorchPho2Pretrain(cfg, PHO2_VOCAB_SIZE)
    batch = make_batch(9, cfg.vocab_size)
    batch["src_idx"] = batch["tgt_idx"]  # pretrain reads the clean sequence
    assert_parity(model, batch, cfg, apply_pretrain)


def test_pho2_res_pretrain_parity():
    """Pho2ResPretrain: GRU + RAW resnet sum — no LayerNorm — into the shared
    pho_res_model (src/models.py:1269-1275). Round-1 verdict found our extra
    LayerNorm here; this test pins the exact reference structure."""
    cfg = config_for("pho2-res-pretrain", **TINY, num_fonts=1,
                     dtype="float32")
    torch.manual_seed(10)
    model = torch_ref.TorchPho2ResPretrain(cfg, PHO2_VOCAB_SIZE)
    batch = make_batch(10, cfg.vocab_size)
    batch["src_idx"] = batch["tgt_idx"]
    assert_parity(model, batch, cfg, apply_pretrain)


def test_res_pretrain_parity():
    """ResPretrain: glyphs -> CharResNet -> cls3 (src/models.py:1349-1488)."""
    cfg = config_for("res-pretrain", **TINY, num_fonts=2, dtype="float32")
    torch.manual_seed(11)
    model = torch_ref.TorchResPretrain(cfg)
    char_idx = np.random.RandomState(11).randint(
        4, cfg.vocab_size, size=(6,)).astype(np.int32)

    model.train()
    with torch.no_grad():
        model(torch.tensor(char_idx, dtype=torch.int64))
    model.eval()
    with torch.no_grad():
        want_loss, want_logits = model(torch.tensor(char_idx, dtype=torch.int64))

    sd = normalize_state_dict(torch_ref.numpy_state_dict(model))
    params, state = import_realise_state_dict(sd, cfg)
    out = apply_pretrain(jax.tree.map(jnp.asarray, params),
                         jax.tree.map(jnp.asarray, state),
                         {"char_idx": jnp.asarray(char_idx)}, cfg,
                         deterministic=True, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               want_logits.numpy(), atol=3e-4)
    np.testing.assert_allclose(float(out["loss"]), float(want_loss),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Structural round-trip: every zoo model's state dict slots exactly onto a
# fresh init (overlay fills only what the checkpoint carries).
# ---------------------------------------------------------------------------
ZOO_BUILDERS = {
    "bert": lambda cfg: torch_ref.TorchSpellBert(cfg),
    "bert-pho1": lambda cfg: torch_ref.TorchMergedPho1(cfg, PHO1_VOCAB_SIZE),
    "bert-pho2": lambda cfg: torch_ref.TorchMergedPho2(cfg, PHO2_VOCAB_SIZE),
    "bert-pho1-res": lambda cfg: torch_ref.TorchMergedPho1(
        cfg, PHO1_VOCAB_SIZE, with_res=True),
    "bert-pho2-res": lambda cfg: torch_ref.TorchMergedPho2Res(
        cfg, PHO2_VOCAB_SIZE),
    "bert-pho2-res-arch2": lambda cfg: torch_ref.TorchArch2(
        cfg, PHO2_VOCAB_SIZE),
    "bert-pho2-res-arch3": lambda cfg: torch_ref.TorchArch3(
        cfg, PHO2_VOCAB_SIZE),
    "bert-pho2-res-arch3-mlm": lambda cfg: torch_ref.TorchArch3(
        cfg, PHO2_VOCAB_SIZE, mlm_head=True),
    "bert-pho2-res-arch4": lambda cfg: torch_ref.TorchArch3(
        cfg, PHO2_VOCAB_SIZE, softmax_gate=True),
    "pho2-pretrain": lambda cfg: torch_ref.TorchPho2Pretrain(
        cfg, PHO2_VOCAB_SIZE),
    "pho2-res-pretrain": lambda cfg: torch_ref.TorchPho2ResPretrain(
        cfg, PHO2_VOCAB_SIZE),
    "res-pretrain": lambda cfg: torch_ref.TorchResPretrain(cfg),
}


@pytest.mark.parametrize("model_type", sorted(ZOO_BUILDERS))
def test_zoo_state_dict_roundtrip(model_type):
    """Import every zoo model's synthesized state dict; the result must
    overlay onto a fresh init with an IDENTICAL tree structure — i.e. the
    import covers the full parameter surface (verdict item #2)."""
    kw = dict(TINY)
    if model_type in ("bert-pho2-res-arch3", "bert-pho2-res-arch3-mlm",
                      "bert-pho2-res-arch4", "res-pretrain"):
        kw["num_fonts"] = 2
    elif model_type == "pho2-res-pretrain":
        kw["num_fonts"] = 1   # single-font char_images (src/models.py:1181)
    cfg = config_for(model_type, **kw, dtype="float32")
    torch.manual_seed(13)
    model = ZOO_BUILDERS[model_type](cfg)
    if hasattr(model, "tie_cls_weight"):
        model.tie_cls_weight()
    sd = normalize_state_dict(torch_ref.numpy_state_dict(model))
    params, state = import_realise_state_dict(sd, cfg)

    init_fn = init_pretrain if "pretrain" in model_type else init_realise
    base_params, base_state = init_fn(jax.random.PRNGKey(0), cfg)
    merged = overlay_params(base_params, params)
    assert (jax.tree.structure(merged)
            == jax.tree.structure(base_params)), model_type
    # Every imported leaf shape must match the init's.
    jax.tree.map(lambda a, b: None if np.shape(a) == np.shape(b)
                 else pytest.fail(f"shape mismatch {np.shape(a)} vs {np.shape(b)}"),
                 merged, base_params)
    # The import must carry the full surface: with the word-embedding tie
    # structural, at most nothing is fresh except what the reference also
    # re-initializes (nothing, for a full checkpoint of the same type).
    n_imported = len(jax.tree.leaves(params))
    n_total = len(jax.tree.leaves(base_params))
    assert n_imported == n_total, (
        f"{model_type}: imported {n_imported}/{n_total} param leaves")


def test_merge_torch_state_dicts_roundtrip():
    """merge.py-equivalent composition: bert + pho-pretrain + res-pretrain
    state dicts -> one merged dict (sec_version rename included) that imports
    onto an arch3 init (reference: merge.py:5-38)."""
    kw = dict(TINY)
    cfg3 = config_for("bert-pho2-res-arch3", **kw, num_fonts=2,
                      dtype="float32")
    torch.manual_seed(14)

    import transformers
    hf = transformers.BertModel(torch_ref.hf_config(cfg3, cfg3.num_hidden_layers))
    # The base dict is a bare BertModel dump: unprefixed keys (merge.py:6).
    bert_sd = torch_ref.numpy_state_dict(hf)

    pho = torch_ref.TorchPho2Pretrain(
        config_for("pho2-pretrain", **kw, dtype="float32"), PHO2_VOCAB_SIZE)
    res = torch_ref.TorchResPretrain(
        config_for("res-pretrain", **kw, num_fonts=2, dtype="float32"))
    pho_sd = torch_ref.numpy_state_dict(pho)
    res_sd = torch_ref.numpy_state_dict(res)

    for sec_version in (0, 1):
        merged_sd = merge_torch_state_dicts(bert_sd, pho_sd, res_sd,
                                            sec_version=sec_version)
        # merge.py deletes only the single-font char_images.weight; the
        # multifont char_images_multifonts key does NOT match its filter
        # and survives into the merged dict (reference behavior — released
        # multifont checkpoints carry their glyph table).
        assert not any(k.startswith("char_images.") for k in merged_sd)
        assert "char_images_multifonts" in merged_sd
        params, state = import_realise_state_dict(merged_sd, cfg3)
        assert "char_images" in state  # imported from the multifont key
        assert "bert" in params and "pho" in params and "res" in params
        assert "gru" in params["pho"] and "model" in params["pho"]
        assert "resnet" in state  # BN stats came through the rename
        # Conv weights must survive the char_resent round-trip bit-exactly.
        np.testing.assert_array_equal(
            params["res"]["resnet"]["block1"]["conv1"]["kernel"],
            np.transpose(res_sd["resnet.res_block1.residual_function.0.weight"],
                         (2, 3, 1, 0)))

        # Overlay onto a fresh arch3 init: pretrain pieces land, fine-tune-
        # only pieces (gate_net, resnet_layernorm, output_block, head) stay
        # freshly initialized — exactly from_pretrained-with-missing-keys.
        base_params, base_state = init_realise(jax.random.PRNGKey(1), cfg3)
        full = overlay_params(base_params, params)
        assert jax.tree.structure(full) == jax.tree.structure(base_params)
