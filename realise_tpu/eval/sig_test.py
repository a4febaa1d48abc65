"""Paired bootstrap significance test between two systems' label files.

Neubig-style paired bootstrap (reference: sig_test.py:15-52): resample 50% of
the test set 10000 times; for each resample score both systems and count wins;
report the win ratio as a p-value proxy plus a 95% CI of the metric deltas.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from realise_tpu.eval.metric_core import (
    LabelItem,
    metric_items,
    read_label_file,
)


def paired_bootstrap(
    sys1: Sequence[LabelItem],
    sys2: Sequence[LabelItem],
    targ: Sequence[LabelItem],
    metric_key: str = "sent-correct-f1",
    num_samples: int = 10000,
    sample_ratio: float = 0.5,
    seed: int = 0,
) -> Dict[str, float]:
    if not (len(sys1) == len(sys2) == len(targ)):
        raise ValueError("all three label lists must have equal length")
    n = len(targ)
    m = max(1, int(n * sample_ratio))
    rng = np.random.default_rng(seed)

    wins1 = wins2 = ties = 0
    deltas: List[float] = []
    for _ in range(num_samples):
        idx = rng.integers(0, n, size=m)
        s1 = [sys1[i] for i in idx]
        s2 = [sys2[i] for i in idx]
        t = [targ[i] for i in idx]
        v1 = metric_items(s1, t)[metric_key]
        v2 = metric_items(s2, t)[metric_key]
        deltas.append(v1 - v2)
        if v1 > v2:
            wins1 += 1
        elif v2 > v1:
            wins2 += 1
        else:
            ties += 1

    deltas_arr = np.asarray(deltas)
    lo, hi = np.percentile(deltas_arr, [2.5, 97.5])
    return {
        "wins_sys1": wins1 / num_samples,
        "wins_sys2": wins2 / num_samples,
        "ties": ties / num_samples,
        # One-sided p-value proxy: fraction of resamples where sys1 did NOT win.
        "p_value": 1.0 - wins1 / num_samples,
        "mean_delta": float(deltas_arr.mean()),
        "ci95_low": float(lo),
        "ci95_high": float(hi),
    }


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sys1", required=True, help="label file of system 1")
    parser.add_argument("--sys2", required=True, help="label file of system 2")
    parser.add_argument("--target", required=True, help="gold label file")
    parser.add_argument("--metric", default="sent-correct-f1")
    parser.add_argument("--num_samples", type=int, default=10000)
    parser.add_argument("--sample_ratio", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    res = paired_bootstrap(
        read_label_file(args.sys1),
        read_label_file(args.sys2),
        read_label_file(args.target),
        metric_key=args.metric,
        num_samples=args.num_samples,
        sample_ratio=args.sample_ratio,
        seed=args.seed,
    )
    for k, v in res.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
