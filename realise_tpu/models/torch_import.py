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

Coverage spans the whole reference zoo's naming surface:

* the shared merged-stream BERT ``pho_res_model.*`` (SpellBertPho{1,2}Res,
  src/models.py:265,404 and Pho2ResPretrain, src/models.py:1194) maps to the
  same ``params['pho']['model']`` slot as ``pho_model.*``,
* the pretrain MLM head ``cls2.predictions.*`` (src/models.py:1198,1305) and
  the arch3-MLM head ``cls.predictions.*`` (src/models.py:912) both map to
  the ``head`` subtree; ResPretrain's ``cls3`` linear (src/models.py:1371)
  maps to ``head['classifier']``,
* merge.py's ``sec_version`` rename ``resnet.`` → ``char_resent.``
  (merge.py:10-15) is normalized back on load,
* pho1 models (no GRU; one 65-symbol embedding summed three ways,
  src/models.py:82,131-137) import their ``pho_embeddings`` + ``pho_model``.
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


def normalize_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Canonicalize torch key spellings before mapping.

    * strips DDP's ``module.`` wrapper prefix,
    * undoes merge.py's ``sec_version`` rename ``resnet.`` → ``char_resent.``
      (reference: merge.py:10-15) so merged res-pretrain overlays import like
      plain ``resnet.`` weights.
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("char_resent."):
            k = "resnet." + k[len("char_resent."):]
        out[k] = v
    return out


def _import_mlm_head(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """A BertOnlyMLMHead (``{prefix}.predictions.*``) → our mlm head subtree
    (reference: modeling_bert.py:436-462 dense→gelu→LN→decoder+bias)."""
    dec_w = sd[f"{prefix}.predictions.decoder.weight"]
    bias = sd.get(f"{prefix}.predictions.bias",
                  sd.get(f"{prefix}.predictions.decoder.bias"))
    if bias is None:
        bias = np.zeros(dec_w.shape[0], np.float32)
    return {
        "transform": _linear(sd, f"{prefix}.predictions.transform.dense"),
        "layer_norm": _layer_norm(sd, f"{prefix}.predictions.transform.LayerNorm"),
        "decoder": {"kernel": np.ascontiguousarray(dec_w.T), "bias": bias},
    }


def import_realise_state_dict(
    sd: Mapping[str, np.ndarray], cfg: RealiseConfig
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Any reference-zoo state dict → (params, state).

    Covers the 13 model types' parameter surfaces: the fine-tune zoo
    (SpellBert…Arch4, src/models.py:32-1170), the pretrain stages
    (Pho2Pretrain/Pho2ResPretrain/ResPretrain, src/models.py:1174-1488) and
    merge.py-composed checkpoints. Absent submodules are simply absent from
    the result — overlay onto a fresh init with :func:`overlay_params`.
    """
    sd = normalize_state_dict(sd)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    if any(k.startswith("bert.") for k in sd):
        params["bert"] = import_bert_stack(sd, "bert.", cfg.num_hidden_layers)
    elif "embeddings.word_embeddings.weight" in sd:
        # merge.py overlays onto a bare BertModel dump whose keys carry no
        # ``bert.`` prefix (merge.py:6); the semantic stack lives at the root.
        params["bert"] = import_bert_stack(sd, "", cfg.num_hidden_layers)

    # The merged-stream models name their shared 4-layer BERT pho_res_model
    # (src/models.py:265,404,1194); every other pho BERT is pho_model.
    pho_bert_prefix = None
    for cand in ("pho_model.", "pho_res_model."):
        if any(k.startswith(cand) for k in sd):
            pho_bert_prefix = cand
            break

    if cfg.with_pho and "pho_embeddings.weight" in sd:
        pho: Dict[str, Any] = {
            "embeddings": _embedding(sd, "pho_embeddings.weight")}
        if cfg.pho_encoder == "pho2" and "pho_gru.weight_ih_l0" in sd:
            pho["gru"] = _import_gru(sd, "pho_gru")
        if pho_bert_prefix is not None:
            pho["model"] = import_bert_stack(sd, pho_bert_prefix,
                                             cfg.pho_num_layers,
                                             with_word=False)
        params["pho"] = pho

    if cfg.with_res and any(k.startswith("resnet.") for k in sd):
        # Block count from the keys themselves (CharResNet has 5,
        # CharResNet1 has 4 — src/char_cnn.py:40-44,61-73).
        num_blocks = max(int(m.group(1)) for k in sd
                         if (m := re.match(r"resnet\.res_block(\d+)\.", k)))
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
        params.setdefault("fusion", {})["gate_net"] = _linear(sd, "gate_net")
    if "integrate.weight" in sd:
        params.setdefault("fusion", {})["integrate"] = _linear(sd,
                                                              "integrate")

    if cfg.out_num_layers > 0 and any(k.startswith("output_block.") for k in sd):
        params["output_block"] = import_bert_stack(
            sd, "output_block.", cfg.out_num_layers, with_word=False)

    if cfg.head == "linear_tied" and "classifier.bias" in sd:
        # classifier.weight is the tied word-embedding table — structural here.
        params["head"] = {"bias": sd["classifier.bias"]}
    elif cfg.head == "linear":
        if "classifier.weight" in sd:
            params["head"] = {"classifier": _linear(sd, "classifier")}
        elif "cls3.weight" in sd:
            # ResPretrain's glyph classifier (src/models.py:1371).
            params["head"] = {"classifier": _linear(sd, "cls3")}
    elif cfg.head == "mlm":
        for head_prefix in ("cls", "cls2"):
            if f"{head_prefix}.predictions.transform.dense.weight" in sd:
                params["head"] = _import_mlm_head(sd, head_prefix)
                break
    return params, state


def overlay_params(base: Dict[str, Any], imported: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge an imported (possibly partial) pytree onto a fresh init.

    Merged pretrain checkpoints carry only bert + pho + resnet weights —
    gate_net, resnet_layernorm, output_block and classifier start fresh at
    fine-tune time (they are simply missing keys for from_pretrained,
    reference: merge.py:5-38 + run.py:429-430) — so absent subtrees keep the
    base initialization.

    When the overlay replaces ``char_images`` (a checkpoint carrying its
    own glyph tensor), the dedup tables are re-derived from it: the conv
    stream PREFERS ``res_uniq_images_nhwc``/``res_uniq_inverse``
    (models/realise.py _factorized_conv), so leaving the init-time tables
    in place would silently convolve the OLD glyphs forever.
    """
    out = dict(base)
    for k, v in imported.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = overlay_params(out[k], v)
        else:
            out[k] = v
    if "char_images" in imported and "resnet" in out:
        from realise_tpu.models.realise import install_glyphs

        out = install_glyphs(dict(out), imported["char_images"])
    return out


def merge_torch_state_dicts(
    bert_sd: Mapping[str, np.ndarray],
    pho_sd: Optional[Mapping[str, np.ndarray]] = None,
    res_sd: Optional[Mapping[str, np.ndarray]] = None,
    sec_version: int = 0,
) -> Dict[str, np.ndarray]:
    """Replicate merge.py's checkpoint composition on numpy state dicts.

    Overlays the pho-pretrain and res-pretrain dicts onto the base BERT dict
    (later wins, reference: merge.py:18-24), optionally renaming the res
    overlay's ``resnet.`` keys to ``char_resent.`` first (``sec_version=1``,
    merge.py:10-15), then deletes TOP-LEVEL ``position_embeddings.*`` and
    ``char_images.*`` keys exactly as merge.py:26-34 does. Note the
    reference's filter semantics, replicated deliberately: the pho BERT's
    position embeddings live NESTED under ``pho_model.embeddings.*`` so the
    position filter never fires (pretrain position embeddings survive into
    the merged checkpoint), and a multifont res-pretrain's glyphs are named
    ``char_images_multifonts`` (no trailing dot match) so they survive too
    — only the single-font ``char_images.weight`` is dropped. The result
    imports via :func:`import_realise_state_dict` (which normalizes
    ``char_resent.`` back) exactly like the released merged checkpoints.
    """
    merged: Dict[str, np.ndarray] = dict(bert_sd)
    if pho_sd is not None:
        merged.update(pho_sd)
    if res_sd is not None:
        res_sd = dict(res_sd)
        if sec_version == 1:
            res_sd = {
                ("char_resent." + k[len("resnet."):]
                 if k.startswith("resnet.") else k): v
                for k, v in res_sd.items()
            }
        merged.update(res_sd)
    return {k: v for k, v in merged.items()
            if not (k.startswith("position_embeddings.")
                    or k.startswith("char_images."))}


def import_checkpoint_dir(path: str, cfg: RealiseConfig):
    """Convenience: a torch checkpoint dir (pytorch_model.bin) → pytrees.

    import_realise_state_dict covers every shape — the full zoo, pretrain
    stages, merged dumps, AND plain-BERT checkpoints (bert.* with a
    classifier/MLM head, or a bare BertModel dump) — so no routing
    heuristic is needed; a heuristic here once silently dropped the
    trained classifier of a BERT-baseline checkpoint."""
    import os

    sd = normalize_state_dict(
        load_torch_bin(os.path.join(path, "pytorch_model.bin")))
    return import_realise_state_dict(sd, cfg)
