"""Torch/HuggingFace checkpoint import: ``pytorch_model.bin`` → pytrees.

Maps the reference's torch parameter names onto this framework's pytree
layout so released weights drop in:

* plain HF BERT checkpoints (``hfl/chinese-roberta-wwm-ext`` — the
  reference's init, README.md:45-48) via :func:`import_hf_bert`,
* full ReaLiSe fine-tuned/merged checkpoints (the state dict produced by
  ``SpellBertPho2ResArch3`` + merge.py) via :func:`import_realise_state_dict`.

Key-mapping notes (torch name → pytree path):

* ``*.weight`` of Linear layers transpose (out,in) → (in,out) kernels,
* encoder layers stack along a leading axis (scan-over-layers),
* ``attention.self.query/key/value`` → ``attention.query/key/value``,
  ``attention.output.dense`` → ``attention.output``,
  ``attention.output.LayerNorm`` → ``attention.layer_norm``,
  ``intermediate.dense``/``output.dense``/``output.LayerNorm`` →
  ``ffn.intermediate``/``ffn.output``/``ffn.layer_norm``,
* GRU ``weight_ih_l0``/``weight_hh_l0`` (3H, D) transpose to (D, 3H) —
  torch gate order r/z/n matches ops/gru.py,
* CharResNet ``res_blockK.residual_function.{0,1,3,4}`` →
  ``blockK.{conv1,bn1,conv2,bn2}``; ``shortcut.{0,1}`` →
  ``blockK.{shortcut_conv,shortcut_bn}``; conv kernels (O,I,H,W) → HWIO;
  BN running stats land in the state tree,
* ``char_images_multifonts`` → ``state['char_images']``,
* the tied ``classifier.weight`` is dropped (tying is structural here);
  ``classifier.bias`` → ``head['bias']``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from realise_tpu.config import RealiseConfig


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a pytorch_model.bin into numpy arrays (torch CPU required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _set(tree: Dict, path, value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def _layer_norm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _embedding(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"embedding": sd[key]}


def import_bert_stack(
    sd: Mapping[str, np.ndarray],
    prefix: str,
    num_layers: int,
    with_word: bool = True,
) -> Dict[str, Any]:
    """One BertModel (embeddings + stacked encoder) from torch names."""
    emb: Dict[str, Any] = {
        "position_embeddings": _embedding(
            sd, f"{prefix}embeddings.position_embeddings.weight"),
        "token_type_embeddings": _embedding(
            sd, f"{prefix}embeddings.token_type_embeddings.weight"),
        "layer_norm": _layer_norm(sd, f"{prefix}embeddings.LayerNorm"),
    }
    if with_word and f"{prefix}embeddings.word_embeddings.weight" in sd:
        emb["word_embeddings"] = _embedding(
            sd, f"{prefix}embeddings.word_embeddings.weight")

    layers = []
    for i in range(num_layers):
        lp = f"{prefix}encoder.layer.{i}."
        layers.append({
            "attention": {
                "query": _linear(sd, lp + "attention.self.query"),
                "key": _linear(sd, lp + "attention.self.key"),
                "value": _linear(sd, lp + "attention.self.value"),
                "output": _linear(sd, lp + "attention.output.dense"),
                "layer_norm": _layer_norm(sd, lp + "attention.output.LayerNorm"),
            },
            "ffn": {
                "intermediate": _linear(sd, lp + "intermediate.dense"),
                "output": _linear(sd, lp + "output.dense"),
                "layer_norm": _layer_norm(sd, lp + "output.LayerNorm"),
            },
        })
    import jax

    encoder = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)
    return {"embeddings": emb, "encoder": encoder}


def import_hf_bert(sd: Mapping[str, np.ndarray], cfg: RealiseConfig,
                   prefix: Optional[str] = None) -> Dict[str, Any]:
    """A plain HF BertModel state dict → our ``params['bert']`` subtree."""
    if prefix is None:
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    return import_bert_stack(sd, prefix, cfg.num_hidden_layers)


def _import_gru(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "w_ih": np.ascontiguousarray(sd[f"{prefix}.weight_ih_l0"].T),
        "w_hh": np.ascontiguousarray(sd[f"{prefix}.weight_hh_l0"].T),
        "b_ih": sd[f"{prefix}.bias_ih_l0"],
        "b_hh": sd[f"{prefix}.bias_hh_l0"],
    }


def _conv(sd: Mapping[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    # torch OIHW → HWIO
    return {"kernel": np.ascontiguousarray(
        np.transpose(sd[key], (2, 3, 1, 0)))}


def _bn(sd: Mapping[str, np.ndarray], prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    state = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, state


def import_char_resnet(sd: Mapping[str, np.ndarray], prefix: str,
                       num_blocks: int = 5):
    """CharResNet torch names → (params, bn_state)."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    for i in range(1, num_blocks + 1):
        bp = f"{prefix}res_block{i}."
        bn1_p, bn1_s = _bn(sd, bp + "residual_function.1")
        bn2_p, bn2_s = _bn(sd, bp + "residual_function.4")
        block_p = {
            "conv1": _conv(sd, bp + "residual_function.0.weight"),
            "bn1": bn1_p,
            "conv2": _conv(sd, bp + "residual_function.3.weight"),
            "bn2": bn2_p,
        }
        block_s = {"bn1": bn1_s, "bn2": bn2_s}
        if bp + "shortcut.0.weight" in sd:
            bns_p, bns_s = _bn(sd, bp + "shortcut.1")
            block_p["shortcut_conv"] = _conv(sd, bp + "shortcut.0.weight")
            block_p["shortcut_bn"] = bns_p
            block_s["shortcut_bn"] = bns_s
        params[f"block{i}"] = block_p
        state[f"block{i}"] = block_s
    return params, state


def import_realise_state_dict(
    sd: Mapping[str, np.ndarray], cfg: RealiseConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """A full SpellBertPho2ResArch3-family state dict → (params, state)."""
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    params["bert"] = import_bert_stack(sd, "bert.", cfg.num_hidden_layers)

    if cfg.pho_encoder == "pho2" and "pho_embeddings.weight" in sd:
        params["pho"] = {
            "embeddings": _embedding(sd, "pho_embeddings.weight"),
            "gru": _import_gru(sd, "pho_gru"),
            "model": import_bert_stack(sd, "pho_model.", cfg.pho_num_layers,
                                       with_word=False),
        }

    if cfg.with_res and any(k.startswith("resnet.") for k in sd):
        num_blocks = 5 if cfg.res_encoder == "resnet" else 4
        res_p, res_s = import_char_resnet(sd, "resnet.", num_blocks)
        params["res"] = {"resnet": res_p}
        if "resnet_layernorm.weight" in sd:
            params["res"]["layer_norm"] = _layer_norm(sd, "resnet_layernorm")
        state["resnet"] = res_s
        if "char_images_multifonts" in sd:
            state["char_images"] = sd["char_images_multifonts"]
        elif "char_images.weight" in sd:
            v = sd["char_images.weight"]
            state["char_images"] = v.reshape(v.shape[0], 1, 32, 32)

    if "gate_net.weight" in sd:
        params["fusion"] = {"gate_net": _linear(sd, "gate_net")}
    if "integrate.weight" in sd:
        params["fusion"] = {"integrate": _linear(sd, "integrate")}

    if cfg.out_num_layers > 0 and any(k.startswith("output_block.") for k in sd):
        params["output_block"] = import_bert_stack(
            sd, "output_block.", cfg.out_num_layers, with_word=False)

    if cfg.head == "linear_tied" and "classifier.bias" in sd:
        # classifier.weight is the tied word-embedding table — structural here.
        params["head"] = {"bias": sd["classifier.bias"]}
    elif "classifier.weight" in sd:
        params["head"] = {"classifier": _linear(sd, "classifier")}
    elif "cls.predictions.transform.dense.weight" in sd:
        params["head"] = {
            "transform": _linear(sd, "cls.predictions.transform.dense"),
            "layer_norm": _layer_norm(sd, "cls.predictions.transform.LayerNorm"),
            "decoder": {
                "kernel": np.ascontiguousarray(sd["cls.predictions.decoder.weight"].T),
                "bias": sd.get("cls.predictions.bias",
                               np.zeros(sd["cls.predictions.decoder.weight"].shape[0],
                                        np.float32)),
            },
        }
    return params, state


def import_checkpoint_dir(path: str, cfg: RealiseConfig):
    """Convenience: a torch checkpoint dir (pytorch_model.bin) → pytrees."""
    import os

    sd = load_torch_bin(os.path.join(path, "pytorch_model.bin"))
    if any(k.startswith("pho_") or k.startswith("resnet.") for k in sd):
        return import_realise_state_dict(sd, cfg)
    return {"bert": import_hf_bert(sd, cfg)}, {}
