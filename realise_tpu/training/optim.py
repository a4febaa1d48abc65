"""Optimizer: AdamW with decoupled decay groups + linear warmup schedule.

Matches the reference's training recipe (reference: run.py:146-154):

* AdamW (decoupled weight decay, optimization.py:87-169),
* weight decay excluded for biases and LayerNorm parameters
  (``no_decay = ['bias', 'LayerNorm.weight']``, run.py:146-151),
* linear warmup to peak then linear decay to zero over total steps
  (optimization.py:45-54),
* global-norm gradient clipping at 1.0 (run.py:203-207) — expressed inside
  the optax chain, so it happens under jit on-device.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def decay_mask(params):
    """True for leaves that receive weight decay: everything except biases and
    layer-norm scales (and BN params, which torch also names *.weight/bias)."""

    def is_decay(path, leaf):
        names = []
        for p in path:
            names.append(str(getattr(p, "key", getattr(p, "idx", p))))
        leaf_name = names[-1] if names else ""
        if leaf_name == "bias":
            return False
        if "layer_norm" in names:  # scale+bias of LN
            return False
        if any(n.startswith("bn") or n == "shortcut_bn" for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_decay, params)


def linear_warmup_schedule(peak_lr: float, warmup_steps: int, total_steps: int):
    """Linear 0→peak over warmup, then linear peak→0 (optimization.py:45-54)."""
    warmup_steps = max(warmup_steps, 0)
    decay_steps = max(total_steps - warmup_steps, 1)
    if warmup_steps == 0:
        return optax.linear_schedule(peak_lr, 0.0, decay_steps)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, peak_lr, warmup_steps),
            optax.linear_schedule(peak_lr, 0.0, decay_steps),
        ],
        boundaries=[warmup_steps],
    )


def make_optimizer(
    params,
    learning_rate: float = 5e-5,
    warmup_steps: int = 0,
    total_steps: int = 10000,
    weight_decay: float = 0.0,
    adam_epsilon: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    constant_lr: bool = False,
):
    schedule = (learning_rate if constant_lr else
                linear_warmup_schedule(learning_rate, warmup_steps, total_steps))
    tx_parts = []
    if max_grad_norm is not None:
        tx_parts.append(optax.clip_by_global_norm(max_grad_norm))
    tx_parts.append(
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=adam_epsilon,
            weight_decay=weight_decay,
            mask=decay_mask(params) if weight_decay else None,
        )
    )
    return optax.chain(*tx_parts), schedule
