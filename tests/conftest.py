"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the torch reference
had no distributed tests at all — SURVEY.md §4); set platform/device-count
flags before JAX initializes.
"""

import os

# Force, don't setdefault: the container env pins JAX_PLATFORMS=axon (the
# remote-TPU tunnel) and its sitecustomize re-selects it programmatically, so
# we must override both the env var and the live jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def vocab_list():
    from realise_tpu.text.vocab import build_synthetic_vocab

    return build_synthetic_vocab()


@pytest.fixture(scope="session")
def tokenizer(vocab_list):
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import vocab_to_dict

    return WordPieceTokenizer(vocab_to_dict(vocab_list))


@pytest.fixture(scope="session")
def tiny_config():
    """A tiny arch3 config in the spirit of the reference's library tests
    (tiny randomly-initialized configs, transformers/tests/modeling_bert_test.py:43+)."""
    from realise_tpu.config import config_for

    return config_for(
        "bert-pho2-res-arch3",
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        pho_num_layers=2,
        out_num_layers=2,
        max_seq_length=16,
        max_position_embeddings=64,
        num_fonts=2,
    )
