"""Golden-trajectory regression: a fixed-seed 20-step loss curve.

Kernel work (custom VJPs, fused blocks, dropout masks) is exactly the kind
of change that can silently shift training numerics while every unit test
stays green. This pins the tiny-arch3 loss trajectory for BOTH training
paths — the jnp path and the Pallas custom-VJP path (interpret mode on
CPU) — against a committed golden file.

Regenerate after an INTENTIONAL numerics change with:

    REALISE_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q

and commit the diff with a note on what changed.
"""

import json
import os

import jax
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "trajectory_arch3.json")
STEPS = 20


@pytest.fixture(scope="module")
def tokenizer(small_tokenizer):
    """Small vocab: the trajectory's job is pinning numerics, and the tied
    21k-vocab head made each of the 40 recorded steps ~10x more CPU work."""
    return small_tokenizer


def _run_trajectory(tokenizer, use_pallas: bool):
    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.trainer import Trainer

    cfg = config_for(
        "bert-pho2-res-arch3", vocab_size=len(tokenizer), hidden_size=24,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=48,
        pho_num_layers=1, out_num_layers=1, max_seq_length=12,
        max_position_embeddings=32, num_fonts=1,
        # Dropout ON: the trajectory then also pins the counter-based mask
        # streams (jnp path) and the in-kernel replay (pallas path).
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)
    feat = Featurizer(tokenizer, cfg)
    data = synthetic_dataset(tokenizer, num_examples=16, max_len=8, seed=0)
    batches = [feat.device_batch(feat.featurize(data[:8])),
               feat.device_batch(feat.featurize(data[8:]))]
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, params, state, learning_rate=1e-3, seed=17,
                 use_pallas=use_pallas)
    return [float(tr.train_step(batches[step % 2])) for step in range(STEPS)]


def test_golden_trajectory(tokenizer):
    got = {
        "jnp": _run_trajectory(tokenizer, use_pallas=False),
        "pallas_interpret": _run_trajectory(tokenizer, use_pallas=True),
    }
    if os.environ.get("REALISE_TPU_REGEN_GOLDEN") == "1" \
            or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        if os.environ.get("REALISE_TPU_REGEN_GOLDEN") != "1":
            raise AssertionError(
                f"golden file was missing — wrote {GOLDEN}; commit it")
        return
    with open(GOLDEN) as f:
        want = json.load(f)
    for path in ("jnp", "pallas_interpret"):
        np.testing.assert_allclose(
            got[path], want[path], rtol=1e-4, atol=1e-5,
            err_msg=(f"{path} training trajectory drifted from the golden "
                     f"file — if the numerics change was intentional, "
                     f"regenerate with REALISE_TPU_REGEN_GOLDEN=1"))
    # Sanity: training actually trains (first → last loss decreases).
    assert got["jnp"][-1] < got["jnp"][0]
