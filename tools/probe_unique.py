"""Probe: what does the batch-unique conv COMPACTION machinery cost on
device, separately from the conv itself?

The compact program (models/realise._factorized_conv with batch_slots>0)
prepends `jnp.unique(size=slots)` + a scatter-add occurrence count + a
row gather to the CharResNet stack. BENCH r5 showed the compact program
saving less than the removed conv rows predict (16384 of 21128 rows should
save ~18 ms at the conv's 50% rate; measured ~10), so ~8 ms/step is
machinery. This times each stage in isolation at the production shape and
compares alternative formulations:

* `unique_scatter` — the shipped formulation (jnp.unique + .at[].add).
* `sort_searchsorted` — scatter-free: one sort, uniques compacted via a
  second sort of masked positions, counts and inverse via vectorized
  binary search (no scatter at all).

Usage: python tools/probe_unique.py [--tokens 32768] [--slots 16384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(f"[probe_unique] {msg}", file=sys.stderr, flush=True)


def time_fn(fn, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def unique_scatter(ids, slots):
    uniq, inv = jnp.unique(ids, size=slots, fill_value=0,
                           return_inverse=True)
    counts = jnp.zeros((slots,), jnp.float32).at[inv].add(1.0)
    return uniq, inv, counts


def sort_searchsorted(ids, slots):
    n = ids.shape[0]
    s = jnp.sort(ids)
    is_new = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    # First-occurrence positions compacted by a second sort (no scatter);
    # fill slots clamp to the LAST sorted element so `uniq` stays sorted
    # (searchsorted needs that) — their counts are forced to 0 below, so
    # they convolve a duplicate row with weight 0, same as the shipped
    # fill_value row.
    pos = jnp.where(is_new, jnp.arange(n), n)
    pos = jnp.sort(pos)[:slots]
    fill = pos >= n
    uniq = s[jnp.minimum(pos, n - 1)]
    lo = jnp.searchsorted(s, uniq, side="left")
    hi = jnp.searchsorted(s, uniq, side="right")
    counts = jnp.where(fill, 0, hi - lo).astype(jnp.float32)
    # Exact because every id occurs in uniq's non-fill prefix; 'left'
    # lands on the first (real) slot even when fills duplicate the max.
    inv = jnp.searchsorted(uniq, ids, side="left").astype(jnp.int32)
    return uniq, inv, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=32768)
    ap.add_argument("--slots", type=int, default=16384)
    ap.add_argument("--rows", type=int, default=21128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (args.tokens,), 0, args.rows, jnp.int32)
    imgs = jax.random.normal(jax.random.PRNGKey(1),
                             (args.rows, 3072), jnp.bfloat16)
    rows = []

    def add(name, sec, note=""):
        rows.append({"name": name, "ms": round(sec * 1e3, 3), "note": note})
        _log(f"{name:34s} {sec * 1e3:8.3f} ms  {note}")

    f1 = jax.jit(lambda ids: unique_scatter(ids, args.slots))
    add("unique+scatter (shipped)", time_fn(lambda: f1(ids), args.iters))

    f2 = jax.jit(lambda ids: sort_searchsorted(ids, args.slots))
    add("sort+searchsorted (no scatter)", time_fn(lambda: f2(ids), args.iters))

    # Equivalence on this draw (uniq set + counts; inverse maps to the
    # same uniq values). Only meaningful when the slot budget covers the
    # draw's uniques — the production precondition the Trainer guarantees.
    uniq_n = len(np.unique(np.asarray(ids)))
    if uniq_n <= args.slots:
        u1, i1, c1 = jax.device_get(f1(ids))
        u2, i2, c2 = jax.device_get(f2(ids))
        ok = (np.array_equal(np.sort(u1[c1 > 0]), np.sort(u2[c2 > 0]))
              and np.array_equal(u1[i1], u2[i2])
              and c1.sum() == c2.sum() == args.tokens)
        _log(f"equivalent: {ok} (batch uniques: {uniq_n}/{args.slots})")
        assert ok
    else:
        _log(f"slot budget overflowed ({uniq_n} uniques > {args.slots} "
             f"slots): timing only, equivalence skipped")

    g = jax.jit(lambda uniq: jnp.take(imgs, uniq, axis=0))
    uniq_rows = f1(ids)[0]  # computed once: time the gather in isolation
    add("row gather (slots, 3072) bf16", time_fn(lambda: g(uniq_rows),
                                                 args.iters))

    # The per-step total of the shipped machinery (unique+scatter+gather).
    tot = jax.jit(lambda ids: jnp.take(imgs, unique_scatter(ids,
                                                            args.slots)[0],
                                       axis=0).sum())
    add("machinery total (shipped)", time_fn(lambda: tot(ids), args.iters))
    tot2 = jax.jit(lambda ids: jnp.take(imgs,
                                        sort_searchsorted(ids,
                                                          args.slots)[0],
                                        axis=0).sum())
    add("machinery total (sort+ss)", time_fn(lambda: tot2(ids), args.iters))

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(rows, fh, indent=1)


if __name__ == "__main__":
    main()
