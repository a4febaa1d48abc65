"""Pallas TPU kernels for the hot inference path.

One module ships: :mod:`bert_block` — the fused attention sub-block and FFN
sub-block kernels (measured 1.37×/1.27× vs XLA per sub-block on v5e, +36%
end-to-end serving). Each has a jnp reference implementation in
realise_tpu.ops with an interpret-mode parity test; kernels compile on TPU
and run interpreted on CPU (tests only — auto-disabled for speed there).

Kernels are deterministic-forward only (no dropout, no custom VJP): the
training path keeps the differentiable jnp code. ``use_pallas`` flags
default to auto (on for real TPUs) on the serving/eval CLIs. Kernels that
measured slower than their jnp/XLA counterparts END-TO-END were retired
(bare attention, GRU, gate fusion, classifier+argmax — see PARITY.md);
the rule is: a kernel ships only where the end-to-end number wins.
"""
