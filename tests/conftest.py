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
def small_vocab_list(vocab_list):
    """~400-entry vocab with the same KINDS of entries as the full one
    (specials, ascii, '##' continuations, multi-char pieces, CJK chars).

    Model-semantics tests don't need the full ~21k vocabulary — with it,
    every vocab-factorized scan / inference-table build / tied-head matmul
    drags V≈21k of real compute through a tiny-model test (measured: the
    three heaviest tests spent >60 s each on exactly that)."""
    is_cjk = lambda t: len(t) == 1 and "一" <= t <= "鿿"
    head = [t for t in vocab_list if not is_cjk(t)]
    cjk = [t for t in vocab_list if is_cjk(t)][:300]
    return head + cjk


@pytest.fixture(scope="session")
def small_tokenizer(small_vocab_list):
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import vocab_to_dict

    return WordPieceTokenizer(vocab_to_dict(small_vocab_list))


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


# Persistent XLA compile cache for the test lane: the suite's wall clock is
# dominated by XLA:CPU compiles (the same tiny-model programs, re-built in
# every xdist worker on every run). Cached executables cut a warm run's
# wall clock several-fold. XLA:CPU logs noisy machine-feature-mismatch
# errors when reloading AOT results (its feature fingerprint includes
# tuning pseudo-flags); they are benign on the same host. Opt out with
# REALISE_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("REALISE_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "REALISE_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/realise_tpu/xla-tests"))
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
