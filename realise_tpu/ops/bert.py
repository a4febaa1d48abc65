"""BERT encoder as pure functions with scan-over-layers.

Re-implements the behavior of the reference's vendored BertModel
(reference: transformers/modeling_bert.py:586-745) the TPU way:

* layer parameters are *stacked* along a leading layer axis and the encoder
  iterates with ``lax.scan`` — one traced layer body regardless of depth, so
  the 12/4/3/2-layer stacks ReaLiSe instantiates (src/models.py:659,672,693)
  compile fast and XLA pipelines the weight streaming,
* post-LN transformer blocks: softmax(QKᵀ/√d + bias)V with an additive
  −10000 padding bias (modeling_bert.py:691-697), residual + LayerNorm after
  attention and FFN (modeling_bert.py:196-263,346-369),
* ``inputs_embeds`` is first-class — ReaLiSe feeds fused hidden states back
  through BERT stacks (src/models.py:827,852) — as is forcing position ids
  to zero (src/models.py:852-854),
* optional ``jax.checkpoint`` rematerialization of the layer body for memory,
* optional fused Pallas block kernels for the hot S=128 inference path:
  the whole attention sub-block and FFN sub-block each run as one kernel
  (ops/pallas/bert_block.py — measured 1.37×/1.27× vs XLA on v5e).

Everything is shape-static; the attention bias is computed once per call.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from realise_tpu.config import RealiseConfig
from realise_tpu.ops.layers import (
    ACTIVATIONS,
    dense,
    dropout,
    embed,
    init_dense,
    init_embedding,
    init_layer_norm,
    layer_norm,
    site_rng,
)


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------
def init_bert_embeddings(key, cfg: RealiseConfig, with_word: bool = True):
    """``with_word=False`` for sub-stacks that are only ever fed via
    ``inputs_embeds`` (pho_model / output_block, src/models.py:827,852) — the
    torch versions carry full unused 21128×768 word tables; we don't."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "position_embeddings": init_embedding(k2, cfg.max_position_embeddings, cfg.hidden_size, cfg.initializer_range),
        "token_type_embeddings": init_embedding(k3, cfg.type_vocab_size, cfg.hidden_size, cfg.initializer_range),
        "layer_norm": init_layer_norm(cfg.hidden_size),
    }
    if with_word:
        params["word_embeddings"] = init_embedding(k1, cfg.vocab_size, cfg.hidden_size, cfg.initializer_range)
    return params


def init_bert_layer(key, cfg: RealiseConfig):
    keys = jax.random.split(key, 6)
    h = cfg.hidden_size
    return {
        "attention": {
            "query": init_dense(keys[0], h, h, cfg.initializer_range),
            "key": init_dense(keys[1], h, h, cfg.initializer_range),
            "value": init_dense(keys[2], h, h, cfg.initializer_range),
            "output": init_dense(keys[3], h, h, cfg.initializer_range),
            "layer_norm": init_layer_norm(h),
        },
        "ffn": {
            "intermediate": init_dense(keys[4], h, cfg.intermediate_size, cfg.initializer_range),
            "output": init_dense(keys[5], cfg.intermediate_size, h, cfg.initializer_range),
            "layer_norm": init_layer_norm(h),
        },
    }


def init_bert_encoder(key, cfg: RealiseConfig, num_layers: int):
    """Stacked layer params: every leaf has leading dim ``num_layers``."""
    keys = jax.random.split(key, num_layers)
    per_layer = [init_bert_layer(k, cfg) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)


def init_bert_pooler(key, cfg: RealiseConfig):
    # Computed-but-discarded in ReaLiSe (modeling_bert.py:404-416); kept for
    # checkpoint-surface parity.
    return {"dense": init_dense(key, cfg.hidden_size, cfg.hidden_size, cfg.initializer_range)}


def init_bert_model(key, cfg: RealiseConfig, num_layers: int,
                    with_pooler: bool = False, with_word: bool = True):
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "embeddings": init_bert_embeddings(k1, cfg, with_word=with_word),
        "encoder": init_bert_encoder(k2, cfg, num_layers),
    }
    if with_pooler:
        params["pooler"] = init_bert_pooler(k3, cfg)
    return params


# --------------------------------------------------------------------------
# Apply
# --------------------------------------------------------------------------
def attention_bias_from_mask(attention_mask: jax.Array, dtype) -> jax.Array:
    """(B, S) {0,1} mask → (B, 1, 1, S) additive bias.

    Same −10000 scheme as the reference (modeling_bert.py:691-697); −10000 is
    representable in bf16 and large enough at S=128.
    """
    bias = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
    return bias[:, None, None, :].astype(dtype)


def bert_embeddings(
    params,
    cfg: RealiseConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    extra_embeds: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Word+position+type embedding sum → LN → dropout.

    ``extra_embeds`` mirrors the reference's local ``other_embeds``
    modification to BertEmbeddings (modeling_bert.py:169,189-190).
    """
    dtype = jnp.dtype(cfg.dtype)
    if inputs_embeds is None:
        if input_ids is None:
            raise ValueError("need input_ids or inputs_embeds")
        inputs_embeds = embed(params["word_embeddings"], input_ids, dtype=dtype)
    else:
        inputs_embeds = inputs_embeds.astype(dtype)

    batch, seq = inputs_embeds.shape[:2]
    if position_ids is None:
        position_ids = jnp.arange(seq, dtype=jnp.int32)[None, :]
    pos = embed(params["position_embeddings"], position_ids, dtype=dtype)
    if token_type_ids is None:
        token_type_ids = jnp.zeros((batch, seq), dtype=jnp.int32)
    typ = embed(params["token_type_embeddings"], token_type_ids, dtype=dtype)

    hidden = inputs_embeds + pos + typ
    if extra_embeds is not None:
        hidden = hidden + extra_embeds.astype(dtype)
    hidden = layer_norm(params["layer_norm"], hidden, cfg.layer_norm_eps)
    hidden = dropout(hidden, cfg.hidden_dropout_prob, deterministic, site_rng(rng, 0))
    return hidden


def _self_attention(layer_params, hidden, attn_bias, cfg: RealiseConfig,
                    deterministic: bool, rng):
    b, s, h = hidden.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    dtype = hidden.dtype

    q = dense(layer_params["query"], hidden).reshape(b, s, nh, hd)
    k = dense(layer_params["key"], hidden).reshape(b, s, nh, hd)
    v = dense(layer_params["value"], hidden).reshape(b, s, nh, hd)

    # (B, H, S, S) scores in f32 for a stable softmax. (The Pallas path
    # fuses the whole sub-block instead — ops/pallas/bert_block.py.)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    scores = scores + attn_bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, cfg.attention_probs_dropout_prob,
                    deterministic, site_rng(rng, 1))
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                     preferred_element_type=dtype)
    ctx = ctx.reshape(b, s, h)

    out = dense(layer_params["output"], ctx)
    out = dropout(out, cfg.hidden_dropout_prob, deterministic, site_rng(rng, 2))
    return layer_norm(layer_params["layer_norm"], hidden + out, cfg.layer_norm_eps)


def _ffn(layer_params, hidden, cfg: RealiseConfig, deterministic: bool, rng):
    act = ACTIVATIONS[cfg.hidden_act]
    inter = act(dense(layer_params["intermediate"], hidden))
    out = dense(layer_params["output"], inter)
    out = dropout(out, cfg.hidden_dropout_prob, deterministic, site_rng(rng, 3))
    return layer_norm(layer_params["layer_norm"], hidden + out, cfg.layer_norm_eps)


def bert_encoder(
    encoder_params,
    hidden: jax.Array,
    attn_bias: jax.Array,
    cfg: RealiseConfig,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """lax.scan over stacked layer params."""

    # Kernel routing: the deterministic path uses the forward-only fused
    # block kernels (ops/pallas/bert_block.py); the training path uses the
    # custom-VJP variants with in-kernel dropout and fused backward
    # (ops/pallas/bert_block_train.py).
    use_blocks = use_pallas and deterministic
    use_train_blocks = use_pallas and not deterministic
    p_rate = cfg.attention_probs_dropout_prob
    h_rate = cfg.hidden_dropout_prob
    if use_train_blocks and (p_rate > 0.0 or h_rate > 0.0) and rng is None:
        raise ValueError("dropout requires an rng when not deterministic")

    def layer_body(carry, xs):
        hidden, layer_idx = carry
        layer_params = xs
        layer_rng = None if rng is None else jax.random.fold_in(rng, layer_idx)
        if use_blocks:
            from realise_tpu.ops.pallas.bert_block import (
                attention_block,
                ffn_block,
            )

            hidden = attention_block(hidden, layer_params["attention"],
                                     attn_bias, cfg.num_attention_heads,
                                     eps=cfg.layer_norm_eps)
            hidden = ffn_block(hidden, layer_params["ffn"],
                               eps=cfg.layer_norm_eps)
        elif use_train_blocks:
            from realise_tpu.ops.pallas.bert_block_train import (
                attention_block_train,
                ffn_block_train,
            )

            # One int32 seed per layer drives every dropout site in both
            # sub-blocks (sites are salted separately in-kernel); the
            # backward replays the identical masks from the same seed.
            if layer_rng is not None:
                seed = jax.random.randint(layer_rng, (1,), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            hidden = attention_block_train(
                hidden, layer_params["attention"], attn_bias, seed,
                cfg.num_attention_heads, cfg.layer_norm_eps, p_rate, h_rate)
            hidden = ffn_block_train(hidden, layer_params["ffn"], seed,
                                     cfg.layer_norm_eps, h_rate)
        else:
            hidden = _self_attention(layer_params["attention"], hidden,
                                     attn_bias, cfg, deterministic,
                                     layer_rng)
            hidden = _ffn(layer_params["ffn"], hidden, cfg, deterministic,
                          layer_rng)
        return (hidden, layer_idx + 1), None

    body = layer_body
    # The custom-VJP kernels already store only (x, z) per sub-block and
    # recompute the rest in VMEM during backward — wrapping them in
    # jax.checkpoint would just re-run the forward kernels for nothing.
    if cfg.remat and not use_train_blocks:
        body = jax.checkpoint(layer_body)
    # Scan unrolling (experimental, measured via bench.py): the scan's
    # per-layer dynamic-slice of stacked params and dynamic-update-slice of
    # saved residuals showed up as ~6% of the v5e train step in traces;
    # unrolling trades program size for that glue.
    unroll = int(os.environ.get("REALISE_TPU_SCAN_UNROLL", "1"))
    (hidden, _), _ = jax.lax.scan(body, (hidden, 0), encoder_params,
                                  unroll=unroll)
    return hidden


def bert_model(
    params,
    cfg: RealiseConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    extra_embeds: Optional[jax.Array] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Full BERT stack → (B, S, H) sequence output.

    Mirrors BertModel.forward's surface (modeling_bert.py:639-745): accepts
    ``input_ids`` or ``inputs_embeds``, an optional padding mask, optional
    position ids (ReaLiSe passes zeros into the output block), and the local
    ``other_embeds`` extension as ``extra_embeds``.
    """
    if input_ids is None and inputs_embeds is None:
        raise ValueError("need input_ids or inputs_embeds")
    if attention_mask is None:
        ref = input_ids if input_ids is not None else inputs_embeds[..., 0]
        attention_mask = jnp.ones(ref.shape[:2], dtype=jnp.int32)
    dtype = jnp.dtype(cfg.dtype)
    emb_rng = site_rng(rng, 1000)
    enc_rng = site_rng(rng, 2000)
    hidden = bert_embeddings(
        params["embeddings"], cfg,
        input_ids=input_ids, inputs_embeds=inputs_embeds,
        position_ids=position_ids, token_type_ids=token_type_ids,
        extra_embeds=extra_embeds,
        deterministic=deterministic, rng=emb_rng,
    )
    attn_bias = attention_bias_from_mask(attention_mask, dtype)
    return bert_encoder(params["encoder"], hidden, attn_bias, cfg,
                        deterministic=deterministic, rng=enc_rng,
                        use_pallas=use_pallas)


def bert_pooler(params, sequence_output: jax.Array) -> jax.Array:
    first = sequence_output[:, 0]
    return jnp.tanh(dense(params["dense"], first))
