"""Multi-host bootstrap + per-process batch slicing.

The reference launches one process per GPU and forms an NCCL process group
(reference: src/run.py:400-404, train.sh:5), shards the dataset by rank with
a stride that drops the tail ``len % world_size`` examples (run.py:128-137),
and gates checkpoint/log on rank 0 (run.py:214,223,455).

TPU-native equivalent: ``jax.distributed.initialize()`` (one Python process
per host), a mesh over the GLOBAL ``jax.devices()``, and per-STEP batch
slicing — each process featurizes only its strided share of every global
batch and the global device array is assembled with
``jax.make_array_from_process_local_data``. Slicing per batch instead of
per dataset means no example is ever dropped (the reference loses the tail)
and shuffling stays globally consistent (every process shuffles the same
index order with the same seed).

Single-process runs pass through untouched: ``process_count() == 1`` makes
every helper the identity, so the same code path serves one chip, one host
with 8 chips, and a multi-host slice.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger("realise_tpu")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bootstrap JAX's distributed runtime (multi-host only).

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID``); on cloud
    TPU pods ``jax.distributed.initialize()`` autodetects everything and all
    three may be None. Returns True when initialization ran.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    logger.info("jax.distributed initialized: process %d/%d, %d/%d devices "
                "local", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gating for checkpoint/log (the reference's
    ``local_rank in [-1, 0]``, run.py:214,223,455)."""
    return process_index() == 0


def pad_to_multiple(indices: Sequence[int], multiple: int) -> List[int]:
    """Pad an index list by repeating the last entry so every process gets
    an equal share — instead of the reference's strided shard that DROPS the
    tail ``len % world_size`` examples (run.py:134-137)."""
    out = list(indices)
    if multiple > 1 and out:
        while len(out) % multiple:
            out.append(out[-1])
    return out


def local_slice(items: Sequence, index: Optional[int] = None,
                count: Optional[int] = None) -> List:
    """This process's contiguous share of one global batch.

    ``concat(local_slice(b, p, P) for p in range(P)) == pad(b)``: the global
    batch is exactly the concatenation of the per-process slices, in order
    (tested in tests/test_parallel.py). Contiguous (not strided like the
    reference's run.py:128-137) because ``make_array_from_process_local_data``
    places process p's rows at the global offsets owned by p's devices —
    processes own contiguous leading blocks in mesh order, so contiguous
    slicing keeps global row i == example i (eval relies on this).
    """
    if count is None:
        count = process_count()
    if index is None:
        index = process_index()
    if count == 1:
        return list(items)
    padded = pad_to_multiple(list(items), count)
    share = len(padded) // count
    return padded[index * share : (index + 1) * share]


_ROW_OWNERSHIP_OK = set()  # (mesh axes+shape, global rows) already validated


def _check_contiguous_rows(sharding, global_shape, local_rows: int,
                           key: str) -> None:
    """Validate the documented local_slice contract: this process's devices
    own exactly the contiguous global rows [p·share, (p+1)·share).

    That holds for data-parallel meshes with ``data`` as the outermost
    axis (the supported multi-process layout). Anything else — no data
    axis (batch replicated: every process would need the FULL batch, but
    local_slice fed it a shard), or data inner to another axis (each
    process spans all data coordinates) — would silently mis-place rows;
    raise the configuration error instead."""
    mesh = sharding.mesh
    memo = (tuple(mesh.axis_names), tuple(mesh.devices.shape), global_shape)
    if memo in _ROW_OWNERSHIP_OK:
        return
    owned = set()
    for sl in sharding.addressable_devices_indices_map(global_shape).values():
        r = sl[0] if sl else slice(None)
        start, stop, step = r.indices(global_shape[0])
        if step != 1:
            raise ValueError(f"strided row ownership for batch key {key!r}")
        owned.update(range(start, stop))
    p = process_index()
    expect = set(range(p * local_rows, (p + 1) * local_rows))
    if owned != expect:
        raise ValueError(
            f"multi-process batch key {key!r}: this process's devices own "
            f"global rows {sorted(owned)[:4]}..[{len(owned)}] but "
            f"local_slice fed rows {p * local_rows}..{(p + 1) * local_rows}."
            f" Multi-process runs need a 'data' mesh axis as the OUTERMOST "
            f"axis (e.g. --mesh data={process_count()}, or "
            f"--mesh data=N,model=M — data first) so each process owns a "
            f"contiguous leading block of the batch.")
    _ROW_OWNERSHIP_OK.add(memo)


def make_global_batch(local_arrays: Dict[str, np.ndarray], mesh,
                      batch_sharding_fn) -> Dict:
    """Assemble per-process local batch arrays into global device arrays.

    ``local_arrays`` holds this process's slice (leading dim = B/P); the
    returned arrays are global (leading dim = B) sharded per
    ``batch_sharding_fn(arrays, mesh)``. Single-process: plain device_put.
    """
    import jax

    if process_count() == 1:
        return jax.device_put(local_arrays,
                              batch_sharding_fn(local_arrays, mesh))

    global_arrays = {}
    shardings = batch_sharding_fn(local_arrays, mesh)
    for k, v in local_arrays.items():
        v = np.asarray(v)
        sharding = shardings[k]
        if v.ndim == 0:
            # Scalar side-channels (e.g. _conv_rows_max) are replicated
            # and identical on every process: global shape == local shape
            # is the documented "data must be the same across all hosts"
            # mode of make_array_from_process_local_data.
            global_arrays[k] = jax.make_array_from_process_local_data(
                sharding, v, v.shape)
            continue
        global_shape = (v.shape[0] * process_count(),) + v.shape[1:]
        _check_contiguous_rows(sharding, global_shape, v.shape[0], k)
        global_arrays[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return global_arrays
