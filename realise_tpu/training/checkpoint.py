"""Checkpointing: full train-state save/restore + top-k retention.

Improves on the reference, which saves model weights + config only
(reference: run.py:223-230 ``save_pretrained`` + ``training_args.bin``) — so
"resume" silently loses Adam moments and the LR-schedule position
(SURVEY.md §5.3). Here a checkpoint directory ``saved_ckpt-{step}/`` holds:

* ``ckpt/`` — orbax pytree: params, mutable state (BN stats + glyphs),
  optimizer state, step counter,
* ``config.json`` — the RealiseConfig (reference: config.json),
* ``training_args.json`` — run arguments (reference: training_args.bin,
  torch-pickled; ours is JSON so ``test.py``-equivalents can recover the
  model type without torch, cf. src/test.py:105-107).

The "evaluate all checkpoints → rank by dev metric → keep top-k" workflow
(run.py:473-505, train.sh:17-19) is :func:`retain_top_k`.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from realise_tpu.config import RealiseConfig

CKPT_PREFIX = "saved_ckpt-"


def save_checkpoint(
    directory: str,
    step: int,
    params,
    state,
    opt_state=None,
    cfg: Optional[RealiseConfig] = None,
    training_args: Optional[Dict[str, Any]] = None,
) -> str:
    """Write ``{directory}/saved_ckpt-{step}``; returns the checkpoint dir.

    Multi-process contract (``jax.process_count() > 1``): EVERY process
    must call this — the host gather below is a collective — but the
    files are written by process 0 only (the reference's rank-0
    checkpointing, run.py:223-230), with an end barrier so other
    processes only proceed (e.g. to restore or score the checkpoint)
    once the write is complete. Non-main callers get the same path back;
    on a shared filesystem it is immediately readable everywhere.
    """
    ckpt_dir = os.path.join(os.path.abspath(directory), f"{CKPT_PREFIX}{step}")
    tree = {"params": params, "state": state, "step": step}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    # Serialize as host numpy: checkpoints then restore on any device
    # topology (save on a TPU mesh, restore on CPU, and vice versa). At this
    # model scale (~110M params) gathering to host is cheap; a sharded async
    # save can be layered in for much larger configs. Arrays sharded across
    # OTHER hosts (multi-host tensor parallelism) must be allgathered first
    # — np.asarray raises on non-addressable shards.
    def _to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            x = multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    tree = jax.tree.map(_to_host, tree)
    multi = jax.process_count() > 1
    ok, err = True, None
    if not multi or jax.process_index() == 0:
        try:
            os.makedirs(ckpt_dir, exist_ok=True)
            path = os.path.join(ckpt_dir, "ckpt")
            if os.path.exists(path):
                shutil.rmtree(path)
            # Multi-process: the tree is plain host numpy by now, so the
            # (sole) writer must run orbax with its barriers restricted to
            # itself (active_processes={0}) — the stock checkpointer's save
            # would wait on 'Checkpointer:save_start' barriers the
            # non-writing processes never enter. Single-process keeps the
            # stock checkpointer (the golden-layout test pins it); the
            # handler args below are exactly PyTreeCheckpointer's
            # constructor defaults, so the on-disk layout is identical
            # either way.
            if multi:
                ckptr = ocp.Checkpointer(
                    ocp.PyTreeCheckpointHandler(use_ocdbt=True,
                                                use_zarr3=False),
                    multiprocessing_options=(
                        ocp.options.MultiprocessingOptions(
                            primary_host=0, active_processes={0})))
            else:
                ckptr = ocp.PyTreeCheckpointer()
            with ckptr:
                ckptr.save(path, tree)
            if cfg is not None:
                cfg.save(ckpt_dir)
            if training_args is not None:
                with open(os.path.join(ckpt_dir, "training_args.json"),
                          "w") as f:
                    json.dump(training_args, f, indent=2, sort_keys=True,
                              default=str)
        except Exception as e:
            # Multi-process: the write failure must still reach the
            # broadcast below, or every other process hangs in it forever
            # (disk-full on the writer wedging the whole pod).
            if not multi:
                raise
            ok, err = False, e
    if multi:
        from jax.experimental import multihost_utils

        # Doubles as the end barrier: no process proceeds (e.g. to restore
        # or score the checkpoint) until the write finished — and every
        # process learns whether it SUCCEEDED.
        ok = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(ok, np.int32)))
        if not ok:
            raise RuntimeError(
                f"checkpoint write failed on process 0 at {ckpt_dir}"
                + (f": {err!r}" if err is not None else
                   " (see process 0's log)"))
    return ckpt_dir


def _saved_state_keys(path: str) -> Optional[set]:
    """Top-level keys under 'state' in the on-disk orbax tree (from the
    checkpoint's _METADATA JSON); None if the layout can't be read."""
    import ast

    try:
        with open(os.path.join(path, "_METADATA")) as f:
            md = json.load(f)
        keys = set()
        for k in md.get("tree_metadata", {}):
            t = ast.literal_eval(k)
            if isinstance(t, tuple) and len(t) > 1 and t[0] == "state":
                keys.add(t[1])
        return keys
    except Exception:
        return None


# Glyph-table layout generations (models/realise.py install_glyphs):
# round ≤3 checkpoints store the dedup table NCHW under 'res_uniq_images';
# newer states pre-transpose to NHWC under 'res_uniq_images_nhwc'. Restores
# reconcile the template to the on-disk layout, then _modernize converts the
# restored state to the current one (an exact transpose) so resumed runs
# don't pay the per-step NCHW→NHWC shuffle.
def _reconcile_glyph_layout(path: str, template):
    if not (isinstance(template, dict) and isinstance(
            template.get("state"), dict)):
        return template
    saved = _saved_state_keys(path)
    if saved is None:
        return template
    st = dict(template["state"])
    changed = False
    if ("res_uniq_images" in saved and "res_uniq_images" not in st
            and "res_uniq_images_nhwc" in st):
        st["res_uniq_images"] = st.pop(
            "res_uniq_images_nhwc").transpose(0, 3, 1, 2)
        changed = True
    if ("res_uniq_images_nhwc" in saved
            and "res_uniq_images_nhwc" not in st and "res_uniq_images" in st):
        st["res_uniq_images_nhwc"] = st.pop(
            "res_uniq_images").transpose(0, 2, 3, 1)
        changed = True
    return {**template, "state": st} if changed else template


def _modernize_state(restored):
    if not (isinstance(restored, dict) and isinstance(
            restored.get("state"), dict)):
        return restored
    st = restored["state"]
    if "res_uniq_images" in st and "res_uniq_images_nhwc" not in st:
        st = dict(st)
        st["res_uniq_images_nhwc"] = st.pop(
            "res_uniq_images").transpose(0, 2, 3, 1)
        restored = {**restored, "state": st}
    return restored


def load_checkpoint(ckpt_dir: str, template=None) -> Dict[str, Any]:
    """Restore a checkpoint dict. ``template``: optional pytree of like-shaped
    arrays (for sharded restore); without it arrays restore as numpy.
    Handles glyph-table layout generations — see _reconcile_glyph_layout."""
    path = os.path.join(os.path.abspath(ckpt_dir), "ckpt")
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            template = _reconcile_glyph_layout(path, template)
            return _modernize_state(ckptr.restore(path, item=template))
        return _modernize_state(ckptr.restore(path))


def load_config(ckpt_dir: str) -> RealiseConfig:
    return RealiseConfig.load(ckpt_dir)


def load_training_args(ckpt_dir: str) -> Dict[str, Any]:
    with open(os.path.join(ckpt_dir, "training_args.json")) as f:
        return json.load(f)


def list_checkpoints(directory: str) -> List[Tuple[int, str]]:
    """[(step, path)] of saved_ckpt-* dirs, sorted by step."""
    out = []
    if not os.path.isdir(directory):
        return out
    for name in os.listdir(directory):
        m = re.fullmatch(re.escape(CKPT_PREFIX) + r"(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, name)))
    return sorted(out)


def retain_top_k(
    scored: List[Tuple[str, float]],
    k: int,
    reverse: bool = True,
    delete: bool = True,
) -> List[str]:
    """Keep the k best checkpoint dirs by score; optionally delete the rest
    (run.py:473-505). Returns the kept dirs, best first. NaN scores (a
    diverged checkpoint's dev metric) always rank WORST — plain sorted()
    would leave their position undefined and could delete a good
    checkpoint while keeping the unusable one."""
    import math

    def key(t):
        s = t[1]
        if isinstance(s, float) and math.isnan(s):
            return float("-inf") if reverse else float("inf")
        return s

    ranked = sorted(scored, key=key, reverse=reverse)
    keep = [d for d, _ in ranked[:k]]
    if delete:
        for d, _ in ranked[k:]:
            shutil.rmtree(d, ignore_errors=True)
    return keep
