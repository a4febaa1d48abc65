"""Persistent on-disk caches that kill the serving cold start.

Round-1 bench logs showed ~15 min between "featurized" and "tables ready"
on a cold v5e (BENCH_r01.json tail): almost all of it XLA compiling the
CharResNet chunk that builds the per-vocab glyph table, re-paid by every
process and — because the jitted chunk was a closure — by every checkpoint
within one process. Two layers fix it:

* :func:`enable_persistent_compile_cache` points JAX's on-disk compilation
  cache at a stable location, so any process after the first deserializes
  the conv executable instead of recompiling it;
* :func:`load_tables` / :func:`save_tables` cache the finished (V, H)
  serving tables keyed by a content digest of everything they depend on,
  so re-evaluating the *same* checkpoint (serving restarts, the three
  SIGHAN test years, repeated ``--do_eval``) skips the build entirely.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Dict, Iterable, Optional

import numpy as np

logger = logging.getLogger("realise_tpu")

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "realise_tpu")

_TABLE_CACHE_VERSION = "tables-v1"


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache (idempotent).

    Default location ``~/.cache/realise_tpu/xla``, overridable with
    ``REALISE_TPU_COMPILE_CACHE``; disabled entirely when
    ``REALISE_TPU_NO_COMPILE_CACHE`` is set (returns None). Unsupported
    backends degrade to a logged warning inside JAX, never an error.
    """
    if os.environ.get("REALISE_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    # CPU backend skips it: XLA:CPU persists AOT executables keyed by
    # fine-grained host CPU features, and reloading them logs machine-
    # feature-mismatch errors (and risks SIGILL) even on the same box.
    # The cold start this cache exists to kill is the TPU conv compile.
    # Explicit platform settings avoid touching the backend; otherwise ask
    # the resolved backend (initializes it — callers are about to anyway).
    platforms = (os.environ.get("JAX_PLATFORMS", "")
                 or (jax.config.jax_platforms or ""))
    platform = platforms.split(",")[0].strip().lower()
    if not platform:
        platform = jax.default_backend()
    if platform == "cpu":
        return None

    cache_dir = (cache_dir
                 or os.environ.get("REALISE_TPU_COMPILE_CACHE")
                 or os.path.join(DEFAULT_CACHE_DIR, "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # The conv chunk is the one that matters (~95 s); cache anything that
    # took over a second so eval/serving steps are covered too.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def content_digest(arrays: Iterable, meta: str) -> str:
    """Digest of array *values* (+shape/dtype) and a metadata string.

    Device arrays are pulled to host — for the serving-table key this is
    dominated by the (V, F, 32, 32) glyph tensor, a few hundred MB ≈
    O(1 s), vs the O(100 s) build it lets us skip.
    """
    h = hashlib.blake2b(digest_size=16)
    h.update(meta.encode())
    for leaf in arrays:
        a = np.asarray(leaf)
        h.update(repr((a.shape, str(a.dtype))).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def _table_path(cache_dir: str, digest: str) -> str:
    return os.path.join(cache_dir, f"{_TABLE_CACHE_VERSION}-{digest}.npz")


_DTYPE_KEY = "__dtype__"


def load_tables(cache_dir: str, digest: str) -> Optional[Dict[str, np.ndarray]]:
    path = _table_path(cache_dir, digest)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            out = {}
            for k in z.files:
                if k.endswith(_DTYPE_KEY):
                    continue
                a = z[k]
                dt = (z[k + _DTYPE_KEY]
                      if k + _DTYPE_KEY in z.files else None)
                if dt is not None:
                    # Stored as a raw uint16/uint8 view (np can't round-trip
                    # ml_dtypes like bfloat16 through savez) — view back.
                    import ml_dtypes  # noqa: F401  (registers the dtypes)

                    a = a.view(np.dtype(str(dt)))
                out[k] = a
        logger.info("serving tables: cache hit (%s)", path)
        return out
    except Exception as e:  # corrupt/partial file: rebuild
        logger.warning("serving-table cache unreadable (%s): %s", path, e)
        return None


def save_tables(cache_dir: str, digest: str,
                tables: Dict[str, np.ndarray]) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    path = _table_path(cache_dir, digest)
    enc: Dict[str, np.ndarray] = {}
    for k, v in tables.items():
        a = np.asarray(v)
        if a.dtype.kind == "V" or not _npz_roundtrips(a.dtype):
            # bfloat16 (the TPU serving dtype) and friends: savez writes
            # them but np.load cannot read the entry back — store a raw
            # same-width view plus the dtype name.
            width = a.dtype.itemsize
            view = {1: np.uint8, 2: np.uint16, 4: np.uint32,
                    8: np.uint64}[width]
            enc[k] = a.view(view)
            enc[k + _DTYPE_KEY] = np.array(str(a.dtype))
        else:
            enc[k] = a
    # np.savez appends .npz when absent — keep the suffix so the atomic
    # rename targets the file savez actually wrote.
    tmp = path + f".{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **enc)
        os.replace(tmp, path)  # atomic vs concurrent writers
        logger.info("serving tables: cached to %s", path)
    except Exception as e:
        logger.warning("serving-table cache write failed (%s): %s", path, e)
        if os.path.exists(tmp):
            os.remove(tmp)


def _npz_roundtrips(dtype: np.dtype) -> bool:
    """True when np.load can read back a savez entry of this dtype (the
    builtin numeric/bool dtypes); ml_dtypes extension types cannot."""
    return dtype.kind in "biufc"
