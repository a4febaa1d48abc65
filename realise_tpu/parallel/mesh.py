"""Device mesh + sharding rules.

The reference's entire distributed story is NCCL DDP data parallelism
(reference: run.py:164-167,400-404, train.sh:5). The TPU-native equivalent is
declarative: build a ``jax.sharding.Mesh``, annotate parameter and batch
shardings with ``NamedSharding``, and let XLA GSPMD insert the gradient
all-reduce (and any tensor-parallel collectives) over ICI/DCN.

Two mesh axes:

* ``data`` — batch sharding; the gradient mean becomes an XLA all-reduce,
  exactly replacing DDP.
* ``model`` — optional tensor parallelism: attention head and FFN sharding
  (Megatron-style split: qkv column-parallel, output row-parallel), useful
  mainly to demonstrate the wiring on this 110M-param model but written so
  larger configs shard correctly.

Rules are matched on parameter-tree paths. Encoder layer stacks carry a
leading layer axis (scan-over-layers), which the rules account for.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh; default: all devices on the ``data`` axis.

    Device placement is topology-aware when all devices participate
    (mesh_utils.create_device_mesh orders the trailing — tensor-parallel —
    axis along the fastest ICI links); an explicit ``devices`` subset falls
    back to flat-order reshape (mesh_utils requires the full slice)."""
    explicit = devices is not None
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    total = int(np.prod(shape))
    if total != len(devices):
        raise ValueError(f"mesh {axes} needs {total} devices, have {len(devices)}")
    if not explicit:
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(shape), names)
        except Exception:
            pass  # odd shapes/backends: flat order below still works
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Path-pattern → (spec without the layer-stack axis). The leading layer axis
# of scanned encoder stacks is always unsharded (None prepended when the
# array rank exceeds the spec rank).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # Attention: qkv column-parallel, proj row-parallel.
    (r"attention/(query|key|value)/kernel$", P(None, "model")),
    (r"attention/(query|key|value)/bias$", P("model")),
    (r"attention/output/kernel$", P("model", None)),
    (r"attention/output/bias$", P()),
    # FFN: up column-parallel, down row-parallel.
    (r"ffn/intermediate/kernel$", P(None, "model")),
    (r"ffn/intermediate/bias$", P("model")),
    (r"ffn/output/kernel$", P("model", None)),
    (r"ffn/output/bias$", P()),
    # Embeddings/norms/heads replicated (vocab matmul is compute-bound on the
    # already-sharded hidden stream; 21128×768 replicated is cheap).
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_s: str, ndim: int, use_tp: bool) -> P:
    if use_tp:
        for pattern, spec in _TP_RULES:
            if re.search(pattern, path_s):
                spec_t = tuple(spec)
                if len(spec_t) < ndim:  # scanned stack: prepend layer axis
                    spec_t = (None,) * (ndim - len(spec_t)) + spec_t
                return P(*spec_t)
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param/state tree under ``mesh``."""
    use_tp = "model" in mesh.axis_names and mesh.shape["model"] > 1

    def leaf_sharding(path, leaf):
        spec = _spec_for(_path_str(path), getattr(leaf, "ndim", 0), use_tp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_shardings(batch, mesh: Mesh):
    """Shard every batch array along ``data`` on its leading axis."""
    if "data" in mesh.axis_names:
        spec = P("data")
    else:
        spec = P()

    def leaf_sharding(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(leaf_sharding, batch)
