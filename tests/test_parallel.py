"""Multi-host wiring tests: batch slicing, reassembly, 2-process training.

The reference's distribution is NCCL DDP with rank-strided dataset sharding
that drops the tail (reference: src/run.py:128-137,400-404). Our multi-host
story (realise_tpu.parallel.distributed) slices each global BATCH
contiguously per process and reassembles it with
``jax.make_array_from_process_local_data``. Single-process unit tests cover
the slicing algebra; the integration test spawns two REAL
``jax.distributed`` processes (gloo CPU collectives) and checks that both
compute the identical global loss through the actual Trainer path.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from realise_tpu.parallel.distributed import local_slice, pad_to_multiple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- slicing
def test_pad_to_multiple():
    assert pad_to_multiple([1, 2, 3], 2) == [1, 2, 3, 3]
    assert pad_to_multiple([1, 2, 3, 4], 2) == [1, 2, 3, 4]
    assert pad_to_multiple([], 4) == []
    assert pad_to_multiple([7], 1) == [7]


@pytest.mark.parametrize("n,procs", [(8, 2), (8, 4), (7, 2), (5, 4), (9, 3)])
def test_local_slices_reassemble_global_batch(n, procs):
    """concat of per-process slices == padded global batch, in order —
    the invariant make_array_from_process_local_data placement relies on."""
    batch = list(range(n))
    slices = [local_slice(batch, index=p, count=procs) for p in range(procs)]
    assert len({len(s) for s in slices}) == 1  # equal shares
    flat = [x for s in slices for x in s]
    assert flat == pad_to_multiple(batch, procs)
    assert flat[:n] == batch  # order preserved; only tail padding appended


def test_local_slice_single_process_identity():
    assert local_slice([1, 2, 3], index=0, count=1) == [1, 2, 3]


# ---------------------------------------------------- 2-process integration
_WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    from realise_tpu.config import config_for
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.parallel.distributed import is_main_process, local_slice
    from realise_tpu.parallel.mesh import make_mesh
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict
    from realise_tpu.training.trainer import Trainer

    tok = WordPieceTokenizer(vocab_to_dict(build_synthetic_vocab()))
    cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tok),
                     hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     pho_num_layers=1, out_num_layers=1, max_seq_length=12,
                     max_position_embeddings=32, num_fonts=1,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    feat = Featurizer(tok, cfg)
    data = synthetic_dataset(tok, num_examples=8, max_len=8, seed=0)
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh({"data": 4})  # global mesh over both processes
    tr = Trainer(cfg, params, state, learning_rate=1e-3, mesh=mesh, seed=3)

    # Each process featurizes ONLY its contiguous half of the global batch.
    batch = feat.device_batch(feat.featurize(local_slice(data)))
    loss = float(tr.train_step(batch))

    # Eval gathers global predictions back to every process.
    out = tr.eval_step(batch)
    assert out["pred_idx"].shape == (8, 12), out["pred_idx"].shape

    # Checkpoint save under the multi-process mesh: arrays are NOT fully
    # addressable here, so save_checkpoint must take the process_allgather
    # branch (checkpoint.py _to_host). The call is COLLECTIVE — every
    # process makes it, with one shared directory (the single-host stand-in
    # for a shared filesystem); process 0 writes, the end barrier inside
    # save_checkpoint makes the files visible to process 1 before its
    # load below.
    import numpy as np
    from realise_tpu.training.checkpoint import (load_checkpoint,
                                                 save_checkpoint)

    ts = tr.train_state
    assert not ts.params["head"]["bias"].is_fully_addressable
    d = save_checkpoint(f"/tmp/realise_2proc_ckpt_{port}", 1,
                        ts.params, ts.state, cfg=cfg)
    restored = load_checkpoint(d)
    want = np.asarray(ts.params["head"]["bias"].addressable_data(0))
    got = np.asarray(restored["params"]["head"]["bias"])
    assert np.array_equal(got, want), "allgather save round-trip mismatch"

    print(f"RESULT {pid} {loss:.6f} main={int(is_main_process())}",
          flush=True)
""")


@pytest.mark.slow
def test_two_process_training_step(tmp_path):
    """Two real jax.distributed processes train one dp step on a global
    mesh; both must report the identical global loss, process-0 gating must
    hold, and eval predictions must come back at global batch shape."""
    import portpicker

    port = portpicker.pick_unused_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO  # drop the axon sitecustomize dir
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(p), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for p in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("2-process integration run timed out — host too "
                        "loaded for two extra JAX compile processes "
                        "(passes standalone)")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, main = line.split()
                results[int(pid)] = (float(loss), main)
    assert set(results) == {0, 1}, outs
    # Identical global loss on both processes (the all-reduce happened).
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    assert np.isfinite(results[0][0])
    # Rank-0 gating.
    assert results[0][1] == "main=1" and results[1][1] == "main=0"


def test_row_ownership_validation_rejects_bad_meshes():
    """_check_contiguous_rows raises a clear configuration error when this
    process's devices do not own the contiguous rows local_slice fed it —
    the silent-corruption cases are a replicated batch spec (no 'data'
    axis) and a data axis inner to another axis."""
    import numpy as np
    import pytest as _pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from realise_tpu.parallel.distributed import _check_contiguous_rows
    from realise_tpu.parallel.mesh import make_mesh

    # Pretend this single process were 1 of 2: its 8 devices owning ALL
    # 8 global rows mismatches a claimed local share of 4.
    mesh = make_mesh({"data": 8})
    sh = NamedSharding(mesh, P("data"))
    with _pytest.raises(ValueError, match="data.*OUTERMOST|outermost|own"):
        _check_contiguous_rows(sh, (8, 4), 4, "src_idx")
    # Replicated spec (model-only mesh): every device owns every row.
    mesh2 = make_mesh({"model": 8})
    sh2 = NamedSharding(mesh2, P())
    with _pytest.raises(ValueError):
        _check_contiguous_rows(sh2, (8, 4), 4, "src_idx")
    # The honest single-process case (local == global) passes.
    _check_contiguous_rows(sh, (8, 4), 8, "src_idx")
