"""Golden-CHECKPOINT durability: a committed on-disk checkpoint every
future revision must still restore.

The orbax tree layout written by ``save_checkpoint`` (params / state /
opt_state / step + config.json + training_args.json,
training/checkpoint.py) is load-bearing for serving, ``--resume``, and
checkpoint topology portability — the analogue of the reference's released
``pytorch_model.bin`` contract (reference: modeling_utils.py:53+). A silent
layout rename would strand every trained artifact while the save/load
round-trip tests stay green (they exercise the NEW layout on both sides).
This test restores a checkpoint committed to git and trains one more step,
asserting the recorded loss — so only a layout change that can still read
OLD artifacts passes.

Regenerate after an INTENTIONAL format change with:

    REALISE_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden_checkpoint.py -q

and commit the new checkpoint directory with a note in the message; add a
backward-compat shim in load_checkpoint if old artifacts must keep working.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "ckpt_arch3")
EXPECT = os.path.join(os.path.dirname(__file__), "golden",
                      "ckpt_arch3_expect.json")
STEP = 3


def _setup():
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict

    tok = WordPieceTokenizer(vocab_to_dict(build_synthetic_vocab(size=96)))
    cfg = config_for(
        "bert-pho2-res-arch3", vocab_size=len(tok), hidden_size=24,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=48,
        pho_num_layers=1, out_num_layers=1, max_seq_length=12,
        max_position_embeddings=32, num_fonts=1,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)
    feat = Featurizer(tok, cfg)
    data = synthetic_dataset(tok, num_examples=8, max_len=8, seed=3)
    return cfg, feat.device_batch(feat.featurize(data))


def _make_trainer(cfg, params, state):
    from realise_tpu.training.trainer import Trainer

    return Trainer(cfg, params, state, learning_rate=1e-3, seed=17)


def _regenerate():
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.checkpoint import save_checkpoint

    cfg, batch = _setup()
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    tr = _make_trainer(cfg, params, state)
    for _ in range(STEP):
        tr.train_step(batch)
    ts = tr.train_state
    import shutil

    if os.path.isdir(GOLDEN_DIR):
        shutil.rmtree(GOLDEN_DIR)
    save_checkpoint(GOLDEN_DIR, STEP, ts.params, ts.state, ts.opt_state,
                    cfg=cfg, training_args={"model_type":
                                            "bert-pho2-res-arch3"})
    next_loss = float(tr.train_step(batch))
    with open(EXPECT, "w") as f:
        json.dump({"step": STEP, "next_loss": next_loss}, f, indent=1)
    return next_loss


def test_golden_checkpoint_restores_and_trains():
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.checkpoint import (list_checkpoints,
                                                 load_checkpoint, load_config,
                                                 load_training_args)

    if os.environ.get("REALISE_TPU_REGEN_GOLDEN") == "1" \
            or not os.path.isdir(GOLDEN_DIR):
        missing = not os.path.isdir(GOLDEN_DIR)
        _regenerate()
        if missing and os.environ.get("REALISE_TPU_REGEN_GOLDEN") != "1":
            raise AssertionError(
                f"golden checkpoint was missing — wrote {GOLDEN_DIR}; "
                f"commit it")
        return

    ckpts = list_checkpoints(GOLDEN_DIR)
    assert ckpts and ckpts[-1][0] == STEP
    step, ckpt_dir = ckpts[-1]

    # The config must come from the checkpoint, like test.py-equivalents do
    # (reference: src/test.py:105-107 recovers model_type the same way).
    cfg = load_config(ckpt_dir)
    assert load_training_args(ckpt_dir)["model_type"] == "bert-pho2-res-arch3"
    _, batch = _setup()

    # Fresh trainer from a DIFFERENT init — everything learned must come
    # from the restored artifact, exactly the cli/train.py --resume path.
    params, state = init_realise(jax.random.PRNGKey(99), cfg)
    tr = _make_trainer(cfg, params, state)
    ts = tr.train_state
    template = jax.tree.map(np.asarray, {
        "params": ts.params, "state": ts.state,
        "opt_state": ts.opt_state, "step": 0})
    restored = load_checkpoint(ckpt_dir, template=template)
    assert int(restored["step"]) == STEP
    tr.train_state = type(ts)(
        params=jax.tree.map(jnp.asarray, restored["params"]),
        state=jax.tree.map(jnp.asarray, restored["state"]),
        opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        step=int(restored["step"]))

    got = float(tr.train_step(batch))
    with open(EXPECT) as f:
        want = json.load(f)
    np.testing.assert_allclose(
        got, want["next_loss"], rtol=1e-4,
        err_msg=("the committed golden checkpoint no longer restores to the "
                 "recorded training state — the on-disk layout changed. If "
                 "intentional, add a compat shim for old artifacts or "
                 "regenerate with REALISE_TPU_REGEN_GOLDEN=1 and call the "
                 "break out in the commit message"))
