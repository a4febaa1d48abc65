import pytest

from realise_tpu.config import MODEL_PRESETS, RealiseConfig, config_for


def test_all_reference_model_types_have_presets():
    # The reference zoo (src/run.py:40-51) plus the pretrain stages
    # (src/run_pretrain.py:33-36, src/run_res_pretrain.py:33-35).
    expected = {
        "bert", "bert-pho1", "bert-pho2", "bert-pho1-res", "bert-pho2-res",
        "bert-pho2-res-arch2", "bert-pho2-res-arch3", "bert-pho2-res-arch3-mlm",
        "bert-pho2-res-arch4",
        "pho2-pretrain", "res-pretrain", "pho2-res-pretrain",
    }
    assert expected <= set(MODEL_PRESETS)


def test_flagship_preset():
    cfg = config_for("bert-pho2-res-arch3")
    assert cfg.fusion == "gate"
    assert cfg.out_num_layers == 3
    assert cfg.zero_out_positions
    assert cfg.with_pho and cfg.with_res
    assert cfg.num_streams == 3
    assert cfg.head == "linear_tied"


def test_overrides_express_ablations():
    cfg = config_for("bert-pho2-res-arch3", pho_encoder="none", fusion="sum")
    assert not cfg.with_pho
    assert cfg.fusion == "sum"
    assert cfg.num_streams == 2


def test_json_roundtrip(tmp_path):
    cfg = config_for("bert-pho2-res-arch4", hidden_size=64)
    cfg.save(str(tmp_path))
    cfg2 = RealiseConfig.load(str(tmp_path))
    assert cfg2 == cfg


def test_unknown_model_type_raises():
    with pytest.raises(KeyError):
        config_for("nope")


def test_head_dim():
    cfg = RealiseConfig(hidden_size=768, num_attention_heads=12)
    assert cfg.head_dim == 64
