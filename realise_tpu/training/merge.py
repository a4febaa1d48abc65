"""Checkpoint composition: overlay pretrained pho/res encoders onto a base.

The reference stage (reference: merge.py:5-38) overlays the phonetic-pretrain
and glyph-pretrain torch state dicts onto the BERT state dict, dropping
``position_embeddings.*`` (so fine-tune re-initializes them fresh) and
``char_images.*`` (glyphs are rebuilt from fonts at startup) before writing a
merged ``pytorch_model.bin``. Here the same surgery is pytree-structural.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple


def merge_params(
    base_params: Dict[str, Any],
    base_state: Dict[str, Any],
    pho_params: Optional[Dict[str, Any]] = None,
    res_params: Optional[Dict[str, Any]] = None,
    res_state: Optional[Dict[str, Any]] = None,
    keep_base_position_embeddings: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Return (params, state) with pretrain subtrees grafted in.

    * ``pho_params``: a pho2-pretrain checkpoint's params — its ``pho``
      subtree replaces the base's; the pho BERT's position embeddings keep the
      base init when ``keep_base_position_embeddings`` (merge.py deletes
      ``position_embeddings.*`` from the overlay, merge.py:24-31).
    * ``res_params``/``res_state``: a res-pretrain checkpoint — its resnet
      conv/BN params and BN running stats replace the base's. Glyph tables
      (``char_images``) are never copied (merge.py drops them too) — they are
      rebuilt from fonts.
    """
    params = copy.deepcopy(base_params)
    state = copy.deepcopy(base_state)

    if pho_params is not None and "pho" in pho_params:
        overlay = copy.deepcopy(pho_params["pho"])
        if keep_base_position_embeddings and "pho" in params:
            base_emb = params["pho"].get("model", {}).get("embeddings", {})
            over_emb = overlay.get("model", {}).get("embeddings", {})
            if "position_embeddings" in base_emb and "position_embeddings" in over_emb:
                over_emb["position_embeddings"] = base_emb["position_embeddings"]
        params["pho"] = overlay

    if res_params is not None and "res" in res_params:
        if "res" not in params:
            params["res"] = {}
        params["res"]["resnet"] = copy.deepcopy(res_params["res"]["resnet"])
        if res_state is not None and "resnet" in res_state:
            state["resnet"] = copy.deepcopy(res_state["resnet"])

    return params, state


def graft_mlm_head_from_hf(params: Dict[str, Any],
                           hf_state_dict) -> Dict[str, Any]:
    """Initialize an MLM head from a HF BERT's ``cls.predictions.*`` weights.

    The utils/add_mlm_to_weights.py + add_trans_to_weights.py equivalent
    (reference: utils/add_mlm_to_weights.py:4-9, add_trans_to_weights.py:4-9):
    those scripts copy the pretrained MLM transform/decoder into a checkpoint
    under new key prefixes; here the head subtree is replaced directly.
    """
    import numpy as np

    params = copy.deepcopy(params)
    sd = hf_state_dict
    head = {
        "transform": {
            "kernel": np.ascontiguousarray(
                sd["cls.predictions.transform.dense.weight"].T),
            "bias": sd["cls.predictions.transform.dense.bias"],
        },
        "layer_norm": {
            "scale": sd["cls.predictions.transform.LayerNorm.weight"],
            "bias": sd["cls.predictions.transform.LayerNorm.bias"],
        },
        "decoder": {
            "kernel": np.ascontiguousarray(sd["cls.predictions.decoder.weight"].T),
            "bias": sd.get("cls.predictions.bias",
                           sd.get("cls.predictions.decoder.bias")),
        },
    }
    params["head"] = head
    return params
