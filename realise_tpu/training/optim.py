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
    """True for leaves that receive weight decay.

    Mirrors the reference's substring filter
    ``no_decay = ['bias', 'LayerNorm.weight']`` over torch names
    (run.py:146-151):

    * every bias is excluded — including the GRU's, whose torch names
      ('gru.bias_ih_l0'/'bias_hh_l0') contain 'bias' but whose leaves
      here are ``b_ih``/``b_hh``;
    * LayerNorm scale+bias are excluded;
    * BatchNorm SCALES are decayed — torch names them 'bn1.weight',
      which matches neither reference pattern (their biases stay
      excluded via the bias rule). One knowing deviation: the
      reference's arch2 ``resnet_layernorm.weight`` evades its own
      case-sensitive 'LayerNorm.weight' filter and gets decayed; we
      exclude every layer-norm uniformly.
    """

    def is_decay(path, leaf):
        names = []
        for p in path:
            names.append(str(getattr(p, "key", getattr(p, "idx", p))))
        leaf_name = names[-1] if names else ""
        if leaf_name in ("bias", "b_ih", "b_hh"):
            return False
        if any("layer_norm" in n for n in names):  # scale+bias of LN
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


def make_tx(
    params,
    adam_epsilon: float = 1e-8,
    with_clip: bool = True,
    learning_rate: float = 5e-5,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
):
    """AdamW chain with DYNAMIC lr / weight-decay / clip-norm.

    The three hyperparameters live as jnp leaves in the optimizer state
    (optax.inject_hyperparams), not as baked program constants, so one
    compiled update program serves every (lr, wd, clip) combination — the
    Trainer overwrites ``opt_state.hyperparams['learning_rate']`` each step
    with the scheduled value. Only ``adam_epsilon`` and the decay-mask
    structure are static. The mask is always applied (wd=0 is exact), so
    decay on/off shares the program too."""
    mask = decay_mask(params)

    if with_clip:
        def factory(learning_rate, weight_decay, max_grad_norm):
            return optax.chain(
                optax.clip_by_global_norm(max_grad_norm),
                optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=adam_epsilon,
                            weight_decay=weight_decay, mask=mask))

        return optax.inject_hyperparams(factory)(
            learning_rate=learning_rate, weight_decay=weight_decay,
            max_grad_norm=max_grad_norm)

    def factory(learning_rate, weight_decay):
        return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=adam_epsilon,
                           weight_decay=weight_decay, mask=mask)

    return optax.inject_hyperparams(factory)(
        learning_rate=learning_rate, weight_decay=weight_decay)


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
    """(tx, schedule). The schedule is host-evaluated by the caller per step
    and written into ``tx``'s state (see :func:`make_tx`); ``tx`` used
    standalone runs at the constant peak ``learning_rate``."""
    schedule = (learning_rate if constant_lr else
                linear_warmup_schedule(learning_rate, warmup_steps, total_steps))
    tx = make_tx(params, adam_epsilon=adam_epsilon,
                 with_clip=max_grad_norm is not None,
                 learning_rate=learning_rate, weight_decay=weight_decay,
                 max_grad_norm=max_grad_norm if max_grad_norm is not None else 1.0)
    return tx, schedule
