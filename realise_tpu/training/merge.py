"""Checkpoint composition: overlay pretrained pho/res encoders onto a base.

The reference stage (reference: merge.py:5-38) overlays the phonetic-pretrain
and glyph-pretrain torch state dicts onto the BERT state dict, then deletes
top-level ``position_embeddings.*`` and ``char_images.*`` keys. In practice
(and matching the released checkpoints) only the single-font
``char_images.weight`` ever matches — the pho BERT's position embeddings are
nested under ``pho_model.embeddings.*`` and multifont glyphs are named
``char_images_multifonts``, so both SURVIVE the reference's merge. Here the
same surgery is pytree-structural, with the same effective semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


def _tree_copy(t):
    """Rebuild dict SPINES only: the leaves are immutable (jax/numpy)
    arrays, so aliasing them is safe and a deepcopy would transiently
    duplicate every buffer in the model (~hundreds of MB with the frozen
    glyph tensor) just to graft a small subtree."""
    if isinstance(t, dict):
        return {k: _tree_copy(v) for k, v in t.items()}
    return t


def merge_params(
    base_params: Dict[str, Any],
    base_state: Dict[str, Any],
    pho_params: Optional[Dict[str, Any]] = None,
    res_params: Optional[Dict[str, Any]] = None,
    res_state: Optional[Dict[str, Any]] = None,
    keep_base_position_embeddings: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Return (params, state) with pretrain subtrees grafted in.

    * ``pho_params``: a pho2-pretrain checkpoint's params — its ``pho``
      subtree (including the pho BERT's position embeddings) replaces the
      base's, matching the reference's effective behavior: merge.py's
      ``position_embeddings.`` delete only matches top-level keys and the
      pho BERT's are nested (merge.py:26-34), so released merged
      checkpoints carry the pretrained ones. Set
      ``keep_base_position_embeddings=True`` for the filter's (dead)
      intended semantics.
    * ``res_params``/``res_state``: a res-pretrain checkpoint — its resnet
      conv/BN params and BN running stats replace the base's. Glyph tables
      (``char_images``) are never copied — they are deterministic from the
      fonts, so rebuilding at startup equals the reference's multifont
      checkpoints carrying them.
    """
    params = _tree_copy(base_params)
    state = _tree_copy(base_state)

    if pho_params is not None and "pho" in pho_params:
        overlay = _tree_copy(pho_params["pho"])
        if keep_base_position_embeddings and "pho" in params:
            base_emb = params["pho"].get("model", {}).get("embeddings", {})
            over_emb = overlay.get("model", {}).get("embeddings", {})
            if "position_embeddings" in base_emb and "position_embeddings" in over_emb:
                over_emb["position_embeddings"] = base_emb["position_embeddings"]
        params["pho"] = overlay

    if res_params is not None and "res" in res_params:
        if "res" not in params:
            params["res"] = {}
        params["res"]["resnet"] = _tree_copy(res_params["res"]["resnet"])
        if res_state is not None and "resnet" in res_state:
            state["resnet"] = _tree_copy(res_state["resnet"])

    return params, state


def graft_mlm_head_from_hf(params: Dict[str, Any],
                           hf_state_dict) -> Dict[str, Any]:
    """Initialize an MLM head from a HF BERT's ``cls.predictions.*`` weights.

    The utils/add_mlm_to_weights.py + add_trans_to_weights.py equivalent
    (reference: utils/add_mlm_to_weights.py:4-9, add_trans_to_weights.py:4-9):
    those scripts copy the pretrained MLM transform/decoder into a checkpoint
    under new key prefixes; here the head subtree is replaced directly
    (delegating to torch_import's importer, which zero-fills a missing
    decoder bias instead of propagating None into dense())."""
    from realise_tpu.models.torch_import import _import_mlm_head

    params = _tree_copy(params)
    params["head"] = _import_mlm_head(hf_state_dict, "cls")
    return params
