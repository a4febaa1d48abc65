"""Pallas TPU kernels for the hot BERT-block path.

Two modules ship:

* :mod:`bert_block` — forward-only fused attention/FFN sub-block kernels
  for the deterministic serving path (measured 1.37×/1.27× vs XLA per
  sub-block on v5e, +36% end-to-end serving).
* :mod:`bert_block_train` — the differentiable variants: same fusion plus
  in-kernel dropout (counter-based hash masks, replayed exactly in the
  backward) and a fused custom-VJP backward that recomputes q/k/v/probs /
  the FFN intermediate in VMEM and accumulates weight grads across the
  batch grid. They store only the block input and pre-LN residual per
  sub-block, so training needs neither ``jax.checkpoint`` nor a remat
  re-forward.

Each kernel has a jnp reference implementation in realise_tpu.ops with
interpret-mode parity/gradient tests; kernels compile on TPU and run
interpreted on CPU (tests only — auto-disabled for speed there). A kernel
body is single-device (pallas_call is a custom call XLA cannot shard), but
on a data-only mesh the Trainer runs the whole step under ``jax.shard_map``
— each device executes the kernels on its batch shard with explicit psum
of loss sums/grads (training/trainer.py:_train_step_shard) — so multi-chip
data parallelism keeps the fused path. Tensor-parallel meshes split the
hidden dim the kernels assume whole; those fall back to the jnp path,
which XLA partitions.

``use_pallas`` flags default to auto (on for real TPUs) on the serving/eval
CLIs. Kernels that measured slower than their jnp/XLA counterparts
END-TO-END were retired (bare attention, GRU, gate fusion,
classifier+argmax — see PARITY.md); the rule is: a kernel ships only where
the end-to-end number wins.
"""
