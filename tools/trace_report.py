"""Aggregate device-op durations from a jax.profiler trace.

Usage: python tools/trace_report.py /tmp/ttrace [--steps N] [--top K]
           [--by source|op]

Parses the perfetto trace.json.gz that ``jax.profiler.trace`` writes and
prints per-op (or per-source-line) SELF time on the TPU device tracks so
kernel work can be attacked in measured order (VERDICT round-2 task #1:
trace-driven MFU work). Self time = event duration minus the duration of
events nested inside it on the same thread lane — module/while/call spans
therefore report only their own gaps, not their children's work, and the
table sums to the true busy time.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace_file(root: str) -> str:
    hits = sorted(glob.glob(os.path.join(
        root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return hits[-1]


_STRIP = re.compile(r"\.\d+$")


def canon(name: str) -> str:
    """Collapse fusion.123 → fusion, keep pallas kernel names whole."""
    return _STRIP.sub("", name)


def self_times_simple(lane_events):
    """Self time per key via interval nesting (events sorted, a stack).

    Stack frames are [start, dur, key, child_dur]; a frame's self time is
    its duration minus the total duration of events nested inside it."""
    out = collections.Counter()
    calls = collections.Counter()
    stack = []
    events = sorted(lane_events, key=lambda e: (e[0], -e[1]))
    for ts, dur, key in events:
        while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-9:
            s, d, k, child = stack.pop()
            out[k] += max(d - child, 0.0)
        if stack:
            stack[-1][3] += dur
        stack.append([ts, dur, key, 0.0])
        calls[key] += 1
    while stack:
        s, d, k, child = stack.pop()
        out[k] += max(d - child, 0.0)
    return out, calls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by this many steps")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=("op", "source"), default="op",
                    help="aggregate by op name or by args.source file:line")
    args = ap.parse_args()

    path = find_trace_file(args.trace_dir)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n.upper() or "device" in n.lower()}

    lanes = collections.defaultdict(list)
    t_lo, t_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        if "Steps" in tname or "Framework" in tname or "Scope" in tname:
            continue
        dur = float(e.get("dur", 0.0))
        ts = float(e.get("ts", 0.0))
        if args.by == "source":
            key = (e.get("args") or {}).get("source", "") or \
                canon(e.get("name", "?"))
        else:
            key = canon(e.get("name", "?"))
        lanes[(e["pid"], e["tid"])].append((ts, dur, key))
        t_lo = min(t_lo, ts)
        t_hi = max(t_hi, ts + dur)

    per_key = collections.Counter()
    per_key_n = collections.Counter()
    for lane_events in lanes.values():
        out, calls = self_times_simple(lane_events)
        per_key.update(out)
        per_key_n.update(calls)

    total = sum(per_key.values())
    span = (t_hi - t_lo) if total else 0.0
    div = args.steps or 1
    print(f"trace: {path}")
    print(f"device tracks: "
          f"{[n for p, n in pid_name.items() if p in device_pids]}")
    print(f"self-time total: {total / 1e3:.1f} ms over span "
          f"{span / 1e3:.1f} ms (idle {100 * (1 - total / span) if span else 0:.1f}%)"
          + (f"; per step: busy {total / div / 1e3:.2f} ms" if args.steps
             else ""))
    print(f"{'key':64s} {'ms/step':>9s} {'%busy':>6s} {'calls':>7s}")
    for name, dur in per_key.most_common(args.top):
        print(f"{str(name)[:64]:64s} {dur / div / 1e3:9.3f} "
              f"{100 * dur / total:6.2f} {per_key_n[name] // div:7d}")


if __name__ == "__main__":
    main()
