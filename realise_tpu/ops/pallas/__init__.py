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


# XLA:TPU caps "scoped vmem" (the VMEM a single fusion may reserve) at
# ~16 MB by default — smaller than the physical VMEM. The fused train
# kernels' f32 weight-grad outputs (18.9 MB at H=768/I=3072) count against
# the cap of the fusion wrapping the pallas_call, which is why the FFN
# backward historically ran as 3 split kernels re-reading x/z/dy. The cap
# is a per-compile compiler option: jax.jit(..., compiler_options=...)
# plumbs it through PJRT (the client-side XLA_FLAGS parser rejects the
# flag, but the backend accepts the option — verified on v5e through the
# remote tunnel). Raising it to 64 MB lets the backward run as ONE kernel
# per sub-block and gives XLA's own fusions (conv/BN stacks) more room.
SCOPED_VMEM_KIB = 65536


def tpu_compiler_options() -> "dict | None":
    """compiler_options for jit'ing programs that contain the fused train
    kernels (None off-TPU: other backends reject TPU-only options)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(SCOPED_VMEM_KIB)}


def pallas_dims_reason(cfg) -> "str | None":
    """Why this config cannot use the fused TPU kernels (None = it can).

    Mosaic requires a block's last two dims to be (8, 128)-tile multiples
    unless the block spans the whole array; the FFN kernels split the
    intermediate dim (bert_block.ffn_block / bert_block_train._ffn_splits),
    and the weight-grad accumulators put hidden on the lane axis — so
    production dims (768/3072, S=128) pass but tiny smoke configs must fall
    back to the jnp path (interpret-mode tests on CPU never hit the tiling
    rules, which is why only a real-TPU run can surface this).
    """
    if cfg.hidden_size % 128 != 0:
        return (f"hidden_size {cfg.hidden_size} is not a multiple of the "
                f"128-lane tile the fused kernels' weight blocks require")
    if cfg.intermediate_size % 128 != 0:
        return (f"intermediate_size {cfg.intermediate_size} is not a "
                f"multiple of 128 (FFN split blocks put it on the lane axis)")
    if cfg.max_seq_length % 8 != 0:
        return (f"max_seq_length {cfg.max_seq_length} is not a multiple of "
                f"the 8-sublane tile of the (S, H) activation blocks")
    if cfg.hidden_size % cfg.num_attention_heads != 0:
        return "hidden_size must divide evenly into attention heads"
    return None


def pallas_unviable_reason(cfg, train: bool = False) -> "str | None":
    """The ONE gating policy for running the fused kernels on this backend
    (None = viable). Shared by the Trainer and the serving Corrector so the
    fallback rules cannot drift between them.

    CPU runs the kernels in interpret mode, which has neither Mosaic's
    (8, 128) tiling rules nor the scoped-vmem budget — always viable
    (parity tests push tiny dims through deliberately). On a real TPU the
    dims must satisfy :func:`pallas_dims_reason`, and the training kernels
    additionally need an FFN split that fits the VMEM budget
    (bert_block_train._ffn_splits raises when none exists). The activation
    check applies on EVERY backend: the fused FFN kernels hardcode exact
    erf-gelu (forward and the _gelu_grad backward), so any other
    hidden_act must take the jnp path or it would silently compute the
    wrong function."""
    import jax

    if cfg.hidden_act != "gelu":
        return (f"hidden_act {cfg.hidden_act!r} is not supported by the "
                f"fused FFN kernels (they hardcode erf-gelu)")
    if jax.default_backend() != "tpu":
        return None
    reason = pallas_dims_reason(cfg)
    if reason is None and train:
        import jax.numpy as jnp

        from realise_tpu.ops.pallas.bert_block_train import _ffn_splits

        try:
            _ffn_splits(cfg.hidden_size, cfg.intermediate_size,
                        jnp.dtype(cfg.dtype).itemsize)
        except ValueError as e:
            reason = str(e)
    return reason
