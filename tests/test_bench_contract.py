"""bench.py driver-contract test.

The round driver executes ``python bench.py`` and parses exactly ONE JSON
line with {metric, value, unit, vs_baseline}; this guards that contract
(plus the round-2 fields) against bitrot by running the real script in
smoke mode as a subprocess.
"""

import json
import os
import pytest
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_smoke_json_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke",
         "--iters", "2"],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]

    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, proc.stdout
    rec = json.loads(json_lines[0])
    # Driver contract.
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["unit"] == "sentences/sec/chip"
    assert rec["value"] > 0
    # Round-2 additions the judge reads.
    for key in ("train_sentences_per_sec", "train_mfu", "infer_mfu",
                "full_forward_sentences_per_sec", "device_kind"):
        assert key in rec, rec
    assert rec["train_sentences_per_sec"] > 0
