"""CharResNet glyph encoder (the "See" stream).

Re-implements the behavior of the reference's glyph CNN (reference:
src/char_cnn.py:9-74): five stride-2 BasicBlocks taking a 32×32×F glyph to a
768-vector (channels 64→128→256→512→768), where each BasicBlock is
conv3×3-BN-ReLU-conv3×3-BN with a 1×1-conv-BN shortcut on shape change, plus
the 4-block ``CharResNet1`` variant that flattens 192·2·2=768.

TPU-native choices:

* NHWC layout with HWIO conv kernels — the native layout for TPU convolution,
* BatchNorm running statistics are explicit *state* threaded through apply
  (the functional equivalent of torch's BN buffers); training mode returns
  updated state, eval mode consumes frozen stats — this resolves the
  reference's implicit train/eval BN handling under jit,
* batch statistics are computed in f32 even under bf16 activations.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1  # torch nn.BatchNorm2d default
BN_EPS = 1e-5


# ------------------------------------------------------------------- conv
def init_conv(key, kh: int, kw: int, in_ch: int, out_ch: int):
    from realise_tpu.ops.layers import host_normal

    fan_in = kh * kw * in_ch
    std = (2.0 / fan_in) ** 0.5  # He init for ReLU nets
    return {"kernel": host_normal(key, (kh, kw, in_ch, out_ch), std)}


def conv2d(params, x: jax.Array, stride: int = 1, padding: int = 1) -> jax.Array:
    """Conv with torch-style symmetric integer padding.

    Torch's ``padding=p`` pads (p, p) on both spatial dims; XLA's "SAME"
    pads asymmetrically for even strides ((0,1) at stride 2), which shifts
    window alignment — checkpoint parity requires the torch convention.

    Tiny-spatial inputs take an EXACT matmul lowering instead
    (:func:`_conv3x3_tiny`): at the tail of the 32→1 stride-2 pyramid a
    padded 3×3 conv spends most of its MACs on structural padding zeros
    (8/9 at 1×1, 5/9 at 2×2) and leaves the MXU under-tiled; re-lowering
    to a dense tap matmul computes the identical function — and identical
    gradients, including the zero cotangent on taps that only ever see
    padding — in a single well-shaped (N, k·C)×(k·C, k·C') contraction.

    An im2col patches lowering of block1's thin-input stride-2 conv1
    (9-tap strided-slice concat + (N·HW/4, 9C)×(9C, O) matmul) was
    measured and REJECTED round 5: the materialized patch tensor and its
    k=9·C=27 contraction ran block1 f+b at 65.5 ms vs the conv's 24.3
    (full stream 117 vs 76 ms) — XLA's internal C=3 conv handling beats
    explicit im2col at these shapes.
    """
    kernel = params["kernel"].astype(x.dtype)
    if (kernel.shape[0] == kernel.shape[1] == 3 and padding == 1
            and x.shape[1] == x.shape[2] and x.shape[1] <= 2):
        y = _conv3x3_tiny(kernel, x, stride)
        if y is not None:
            return y
    pad = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _conv3x3_tiny(kernel: jax.Array, x: jax.Array, stride: int):
    """Exact matmul form of a pad-1 3×3 conv on 1×1 / 2×2 inputs (or None).

    y[n,i,j] = Σ_{u,v ∈ valid} x[n,u,v] · K[u−i·s+1, v−j·s+1]: with all
    spatial positions in play the conv IS a dense linear map from the
    (sp²·C) input vector to the C' output vector, whose matrix is a gather
    of kernel taps. MAC counts vs the padded conv: 1×1 1/9, 2×2/s2 4/9 —
    and the contraction dim k·C tiles the MXU far better than a 9-tap
    window over a 2-pixel image (block5 f+b 4.95 → 4.14 ms on v5e).
    """
    n, sp, _, c = x.shape
    co = kernel.shape[-1]
    if sp == 1:  # either stride: the one output window centers on the pixel
        w = kernel[1, 1]  # only the center tap sees the input
    elif sp == 2 and stride == 2:
        w = kernel[1:3, 1:3].reshape(2 * 2 * c, co)  # output pixel (0,0)
    else:
        # 2×2/stride-1 has an exact (4C, 4C') dense-tap form too, but it
        # measured ~1% SLOWER than XLA's conv on v5e (tools/probe_conv.py
        # block4) — XLA already avoids most padding work there. Only the
        # two measured wins stay.
        return None
    y = jax.lax.dot_general(
        x.reshape(n, -1), w.reshape(x.size // n, -1),
        (((1,), (0,)), ((), ())), preferred_element_type=x.dtype)
    return y.reshape(n, 1, 1, co)


# ------------------------------------------------------------- batch norm
def init_bn(ch: int):
    params = {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}
    state = {"mean": jnp.zeros((ch,), jnp.float32), "var": jnp.ones((ch,), jnp.float32)}
    return params, state


def batch_norm(
    params, state, x: jax.Array, train: bool, weights=None
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """``weights``: optional (N,) per-row multiplicities. With weights, the
    batch statistics are the *weighted* mean/variance — exactly the stats an
    instance batch containing each row ``weights[n]`` times would produce.
    This is what makes the per-vocab training path (models/realise.py) compute
    the identical function to per-token conv: row v appearing c_v times
    contributes c_v-fold to the stats, and rows with weight 0 contribute
    nothing."""
    if train:
        x32 = x.astype(jnp.float32)
        if weights is None:
            mean = x32.mean(axis=(0, 1, 2))
            var = x32.var(axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased_n = max(n - 1, 1)
        else:
            w = weights.astype(jnp.float32)
            hw = x.shape[1] * x.shape[2]
            tot = jnp.maximum(w.sum() * hw, 1.0)
            wsum = lambda t: jnp.einsum("nhwc,n->c", t, w)
            mean = wsum(x32) / tot
            # One-pass E[x²] − mean² can round slightly negative for
            # near-constant channels; clamp so the running-stat EMA (and
            # eval-time rsqrt) never sees a negative variance.
            var = jnp.maximum(wsum(x32 * x32) / tot - mean * mean, 0.0)
            n = tot
            unbiased_n = jnp.maximum(tot - 1.0, 1.0)
        # torch tracks the *unbiased* variance in running stats.
        unbiased = var * (n / unbiased_n)
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"]
    # Scale-shift form, not (x − mean)·inv + bias: same to ~1 ulp, one
    # fused multiply-add pass over x. (A jax.checkpoint over the whole
    # stats+normalize was tried to shrink the f32 autodiff residuals and
    # measured SLOWER — 84.3 vs 76.0 ms on the full factorized stream;
    # the rematerialized reductions plus lost conv/BN fusion cost more
    # than the spills they avoid.)
    y = x.astype(jnp.float32) * inv + (params["bias"] - mean * inv)
    return y.astype(x.dtype), new_state


# ------------------------------------------------------------ basic block
def init_basic_block(key, in_ch: int, out_ch: int, stride: int):
    k1, k2, k3 = jax.random.split(key, 3)
    bn1_p, bn1_s = init_bn(out_ch)
    bn2_p, bn2_s = init_bn(out_ch)
    params = {
        "conv1": init_conv(k1, 3, 3, in_ch, out_ch),
        "bn1": bn1_p,
        "conv2": init_conv(k2, 3, 3, out_ch, out_ch),
        "bn2": bn2_p,
    }
    state = {"bn1": bn1_s, "bn2": bn2_s}
    if stride != 1 or in_ch != out_ch:
        bns_p, bns_s = init_bn(out_ch)
        params["shortcut_conv"] = init_conv(k3, 1, 1, in_ch, out_ch)
        params["shortcut_bn"] = bns_p
        state["shortcut_bn"] = bns_s
    return params, state


def basic_block(params, state, x: jax.Array, stride: int, train: bool,
                weights=None):
    h, s1 = batch_norm(params["bn1"], state["bn1"],
                       conv2d(params["conv1"], x, stride), train, weights)
    h = jax.nn.relu(h)
    h, s2 = batch_norm(params["bn2"], state["bn2"],
                       conv2d(params["conv2"], h, 1), train, weights)
    new_state = {"bn1": s1, "bn2": s2}
    if "shortcut_conv" in params:
        sc, s3 = batch_norm(
            params["shortcut_bn"], state["shortcut_bn"],
            conv2d(params["shortcut_conv"], x, stride, padding=0), train,
            weights)
        new_state["shortcut_bn"] = s3
    else:
        sc = x
    return jax.nn.relu(h + sc), new_state


# ------------------------------------------------------------- the models
def _channels(variant: str, hidden_size: int = 768):
    """Channel plan scaled off the model width. At hidden_size=768 this is
    exactly the reference's plan: CharResNet 64→128→256→512→768
    (src/char_cnn.py:40-44) and CharResNet1 64→128→192→192 with a 2×2×192
    flatten = 768 (src/char_cnn.py:61-73)."""
    h = hidden_size
    if variant == "resnet":
        return [max(h // 12, 1), max(h // 6, 1), max(h // 3, 1),
                max((2 * h) // 3, 1), h]
    if variant == "resnet1":
        assert h % 4 == 0, "resnet1 flattens 2x2 spatial; hidden must be /4"
        return [max(h // 12, 1), max(h // 6, 1), h // 4, h // 4]
    raise ValueError(f"unknown res encoder variant {variant!r}")


def init_char_resnet(key, in_channels: int, variant: str = "resnet",
                     hidden_size: int = 768):
    chans = _channels(variant, hidden_size)
    keys = jax.random.split(key, len(chans))
    params, state = {}, {}
    prev = in_channels
    for i, (k, ch) in enumerate(zip(keys, chans)):
        p, s = init_basic_block(k, prev, ch, stride=2)
        params[f"block{i + 1}"] = p
        state[f"block{i + 1}"] = s
        prev = ch
    return params, state


def char_resnet(
    params, state, x: jax.Array, train: bool = False, variant: str = "resnet",
    hidden_size: int = 768, weights=None,
) -> Tuple[jax.Array, Dict]:
    """(N, 32, 32, F) glyphs → (N, hidden) features (+ updated BN state).

    CharResNet ends at 1×1 spatial (squeeze); CharResNet1 ends at 2×2×H/4 and
    flattens (src/char_cnn.py:54,73). ``weights``: per-row multiplicities for
    the BN batch statistics (see :func:`batch_norm`).
    """
    chans = _channels(variant, hidden_size)
    new_state = {}
    h = x
    for i in range(len(chans)):
        name = f"block{i + 1}"
        h, s = basic_block(params[name], state[name], h, stride=2,
                           train=train, weights=weights)
        new_state[name] = s
    n = h.shape[0]
    if variant == "resnet1":
        # torch's h.view flattens NCHW channel-major (src/char_cnn.py:73);
        # flattening NHWC directly would permute the 768 features and break
        # checkpoint parity for image_model_type=1.
        h = jnp.transpose(h, (0, 3, 1, 2))
    return h.reshape(n, -1), new_state
