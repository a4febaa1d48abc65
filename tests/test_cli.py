"""End-to-end CLI tests (in-process, tiny configs, synthetic data)."""

import json
import os

import numpy as np
import pytest


SMOKE = ["--synthetic", "--tiny", "--platform", "cpu", "--seed", "7"]


@pytest.mark.slow
def test_full_reference_workflow(tmp_path):
    """pretrain-pho → pretrain-res → merge → finetune → test: the complete
    reference pipeline (pretrain_pho.sh, pretrain_res.sh, merge.py, train.sh,
    test.sh) in one pass."""
    from realise_tpu.cli import merge, pretrain_pho, pretrain_res, test as test_cli, train

    pho_dir = str(tmp_path / "pho")
    res_dir = str(tmp_path / "res")
    base_dir = str(tmp_path / "base")
    merged_dir = str(tmp_path / "merged")
    ft_dir = str(tmp_path / "ft")

    assert pretrain_pho.main(SMOKE + [
        "--output_dir", pho_dir, "--max_steps", "2", "--save_steps", "0",
        "--warmup_steps", "1", "--logging_steps", "1",
        "--gradient_accumulation_steps", "1",
        "--per_device_train_batch_size", "4"]) == 0
    assert os.path.exists(os.path.join(pho_dir, "dev_results.json"))

    assert pretrain_res.main(SMOKE + [
        "--output_dir", res_dir, "--max_steps", "2", "--logging_steps", "1",
        "--per_device_train_batch_size", "32"]) == 0

    assert train.main(SMOKE + [
        "--output_dir", base_dir, "--max_steps", "1", "--save_steps", "0",
        "--warmup_steps", "1", "--do_train",
        "--per_device_train_batch_size", "4"]) == 0

    assert merge.main([
        "--base_ckpt", base_dir, "--pho_ckpt", pho_dir, "--res_ckpt", res_dir,
        "--output_dir", merged_dir, "--platform", "cpu"]) == 0

    assert train.main(SMOKE + [
        "--output_dir", ft_dir, "--max_steps", "2", "--save_steps", "2",
        "--warmup_steps", "1", "--do_train", "--do_eval",
        "--init_ckpt", os.path.join(merged_dir, "saved_ckpt-0"),
        "--per_device_train_batch_size", "4"]) == 0
    assert os.path.exists(os.path.join(ft_dir, "dev_results.json"))

    assert test_cli.main([
        "--ckpt_dir", ft_dir, "--synthetic", "--platform", "cpu"]) == 0
    with open(os.path.join(ft_dir, "test_output", "test_results.json")) as f:
        res = json.load(f)
    assert "sent-correct-f1" in res


def test_merge_overlays_pho_and_res(tokenizer):
    """merge_params grafts pretrain subtrees with the reference's EFFECTIVE
    semantics: merge.py's position_embeddings delete only matches top-level
    keys and the pho BERT's are nested (merge.py:26-34), so the pretrained
    position embeddings survive into the merge."""
    import jax

    from realise_tpu.config import config_for
    from realise_tpu.models.realise import init_pretrain, init_realise
    from realise_tpu.training.merge import merge_params

    tiny = dict(vocab_size=len(tokenizer), hidden_size=16,
                num_hidden_layers=1, num_attention_heads=2,
                intermediate_size=32, pho_num_layers=1, out_num_layers=1,
                max_seq_length=8, max_position_embeddings=16, num_fonts=1)
    cfg = config_for("bert-pho2-res-arch3", **tiny)
    base_p, base_s = init_realise(jax.random.PRNGKey(0), cfg)
    pho_p, _ = init_pretrain(jax.random.PRNGKey(1),
                             config_for("pho2-pretrain", **tiny))
    res_cfg = config_for("res-pretrain", **tiny)
    res_p, res_s = init_pretrain(jax.random.PRNGKey(2), res_cfg)

    merged_p, merged_s = merge_params(base_p, base_s, pho_params=pho_p,
                                      res_params=res_p, res_state=res_s)
    # GRU weights come from the pho pretrain.
    np.testing.assert_array_equal(
        np.asarray(merged_p["pho"]["gru"]["w_ih"]),
        np.asarray(pho_p["pho"]["gru"]["w_ih"]))
    # Position embeddings come from the pho pretrain (the reference's
    # delete never fires on the nested pho_model.embeddings.* keys).
    np.testing.assert_array_equal(
        np.asarray(merged_p["pho"]["model"]["embeddings"]["position_embeddings"]["embedding"]),
        np.asarray(pho_p["pho"]["model"]["embeddings"]["position_embeddings"]["embedding"]))
    # Resnet convs come from the res pretrain, glyphs stay from the base.
    np.testing.assert_array_equal(
        np.asarray(merged_p["res"]["resnet"]["block1"]["conv1"]["kernel"]),
        np.asarray(res_p["res"]["resnet"]["block1"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(merged_s["char_images"]),
                                  np.asarray(base_s["char_images"]))


def test_pho_pretrain_features(tokenizer):
    """Pretrain features: inputs are target ids; loss only on Chinese chars."""
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer

    cfg = config_for("pho2-pretrain", vocab_size=len(tokenizer),
                     max_seq_length=12)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=3, seed=0)
    batch = feat.featurize_pho_pretrain(data)
    np.testing.assert_array_equal(batch["src_idx"], batch["tgt_idx"])
    cjk = feat.cjk_token_mask()
    mask = batch["loss_masks"].astype(bool)
    assert cjk[batch["tgt_idx"][mask]].all()
    # [CLS]/[SEP]/pad never in the loss.
    assert not mask[:, 0].any()


@pytest.mark.slow
def test_train_resume(tmp_path):
    """--resume restores params+opt_state+step and continues training."""
    from realise_tpu.cli import train

    out = str(tmp_path / "resume")
    assert train.main(SMOKE + [
        "--output_dir", out, "--max_steps", "2", "--save_steps", "2",
        "--warmup_steps", "1", "--do_train",
        "--per_device_train_batch_size", "4"]) == 0
    assert os.path.exists(os.path.join(out, "saved_ckpt-2"))
    assert train.main(SMOKE + [
        "--output_dir", out, "--max_steps", "4", "--save_steps", "2",
        "--warmup_steps", "1", "--do_train", "--resume",
        "--per_device_train_batch_size", "4"]) == 0
    # Continued from step 2 → saved step 4 exists.
    assert os.path.exists(os.path.join(out, "saved_ckpt-4"))


def test_pho_pretrain_token_accuracy_ragged(tokenizer):
    """token_accuracy must not count padded duplicate rows: the same value
    regardless of batch size (10 examples at bs=8 has a ragged final batch)."""
    import jax

    from realise_tpu.cli.pretrain_pho import token_accuracy
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_pretrain
    from realise_tpu.training.trainer import Trainer

    cfg = config_for("pho2-pretrain", vocab_size=len(tokenizer),
                     hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     pho_num_layers=1, max_seq_length=12,
                     max_position_embeddings=16)
    params, state = init_pretrain(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, params, state, pretrain=True)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=10, seed=2)

    a = token_accuracy(tr, data, feat, batch_size=8)   # ragged: 8 + 2
    b = token_accuracy(tr, data, feat, batch_size=16)  # single ragged batch
    assert a["accuracy"] == b["accuracy"]


def test_evaluate_model_avg_loss_unbiased_by_padding(tokenizer, tmp_path):
    """avg_loss must be the true dataset token-mean regardless of batch
    size: the final short batch pads by repeating the last example, and
    those duplicate rows' loss tokens must not count (they previously
    dominated the last batch's mean)."""
    import jax

    from realise_tpu.cli.common import evaluate_model
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.trainer import Trainer

    cfg = config_for("bert", vocab_size=len(tokenizer), hidden_size=16,
                     num_hidden_layers=1, num_attention_heads=2,
                     intermediate_size=32, max_seq_length=12,
                     max_position_embeddings=32)
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=5, max_len=8, seed=3)

    r_ragged = evaluate_model(Trainer(cfg, params, state), data, feat,
                              tokenizer, str(tmp_path), prefix="a",
                              batch_size=4)   # batches of 4 + 1(+3 pads)
    params2, state2 = init_realise(jax.random.PRNGKey(0), cfg)
    r_single = evaluate_model(Trainer(cfg, params2, state2), data, feat,
                              tokenizer, str(tmp_path), prefix="b",
                              batch_size=8)   # 5 real + 3 pads, one batch
    assert r_ragged["avg_loss"] == pytest.approx(r_single["avg_loss"],
                                                 rel=1e-5)
