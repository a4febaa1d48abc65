"""Pallas TPU kernels for the hot ops.

Each kernel has a jnp reference implementation in realise_tpu.ops with a
parity test; kernels run in interpret mode on CPU (tests) and compiled on
TPU. Kernels are opt-in via ``use_pallas`` flags and gated to the paths where
they are mathematically identical (e.g. attention without probs-dropout).
"""
