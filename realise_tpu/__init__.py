"""realise-tpu: a TPU-native multimodal Chinese Spell Checking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DaDaMrX/ReaLiSe
(ACL Findings 2021): a semantic BERT encoder, a pinyin-GRU phonetic encoder
and a CharResNet glyph encoder fused by a per-token selective-modality gate,
decoded into per-position corrections over the BERT vocabulary.

Everything on the device path is pure-functional pytree code compiled by XLA
(with Pallas kernels for the hot ops); featurization (tokenize / pinyin /
glyph rasterization) runs ahead of time on the host and emits fixed-shape
arrays; distribution is expressed with `jax.sharding` over a device mesh.
"""

__version__ = "0.1.0"

from realise_tpu.config import RealiseConfig, MODEL_PRESETS  # noqa: F401
