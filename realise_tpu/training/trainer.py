"""Training loop: jitted steps, grad accumulation, mesh sharding, eval.

The TPU rendition of the reference's hand-rolled loop (reference:
run.py:125-237): AdamW + linear warmup, grad clip 1.0, periodic logging and
checkpointing, dev evaluation with the SIGHAN metric, top-k checkpoint
retention. Differences by design:

* the whole update (forward, backward, clip, Adam, BN-state update) is ONE
  jitted, donated function — no per-step host sync except the scalar loss,
* gradient accumulation is a ``lax.scan`` over microbatches inside the same
  jit (reference re-enters python per microbatch, run.py:193-207),
* data parallelism is a sharding annotation, not a DDP wrapper: batches are
  sharded over the mesh ``data`` axis and XLA inserts the gradient
  all-reduce; tensor parallelism comes from the same mechanism over
  ``model`` (realise_tpu.parallel.mesh),
* randomness is an explicit key folded per step — seeded runs are exactly
  reproducible (the reference pins seeds + cudnn flags, run.py:54-61).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from realise_tpu.config import RealiseConfig
from realise_tpu.models.realise import (
    CONV_BATCH_UNIQUE,
    _cfg_cache_key,
    apply_pretrain,
    apply_realise,
    conv_slot_buckets,
    res_conv_rows,
)
from realise_tpu.parallel.mesh import batch_shardings, param_shardings
from realise_tpu.training.optim import linear_warmup_schedule, make_tx

logger = logging.getLogger("realise_tpu")


@dataclasses.dataclass
class TrainState:
    params: Any
    state: Any          # mutable model state (BN stats, glyph constants)
    opt_state: Any
    step: int = 0


# ---------------------------------------------------------------- step cache
# One compiled train/eval step per SEMANTIC configuration, shared across
# Trainer instances. The per-run knobs are dynamic: lr/wd/clip live in the
# optimizer state (optim.make_tx) and the RNG key + step index are plain
# arguments, so trainers differing only in schedule, seed or decay rate
# reuse the same executables. This matters because the backward program is
# the expensive compile (conv grads alone ≈ 20 s on an 8-vCPU host; 20-40 s
# on a cold TPU) and the test pyramid builds dozens of Trainers.
_STEP_CACHE: Dict[Any, "_StepFns"] = {}


@dataclasses.dataclass
class _StepFns:
    tx: Any
    train_step: Any     # (params, state, opt_state, batch, step, rng, lr)
    eval_step: Any      # (params, state, batch, tables)


def _build_step_fns(cfg: RealiseConfig, params, pretrain: bool,
                    use_pallas: bool, shard_pallas: bool,
                    grad_accum_steps: int, mesh,
                    adam_epsilon: float, with_clip: bool,
                    conv_slots: int = 0) -> _StepFns:
    eval_apply_fn = apply_pretrain if pretrain else apply_realise
    apply_fn = eval_apply_fn
    if conv_slots and not pretrain:
        # Batch-unique conv budget: a separate TRAIN executable per slot
        # bucket; Trainer.train_step picks one from the batch's
        # host-counted distinct glyph rows (apply_realise
        # conv_batch_slots). Eval batches are never host-checked, so the
        # eval step always uses the full-table apply.
        apply_fn = partial(apply_realise, conv_batch_slots=conv_slots)
    tx = make_tx(params, adam_epsilon=adam_epsilon, with_clip=with_clip)

    def accumulate(params, state, batch, rng, pallas):
        """(grads of the loss SUM, loss_sum, loss_count, new_state).

        Always works in unnormalized loss *sums* + valid-token counts —
        normalized once by the caller — so the microbatch scan is exactly
        equal to the full-batch gradient even with ragged lengths (the
        reference averages per-microbatch means, run.py:193-194, which is
        not), and the shard_map path can psum the same quantities for the
        exact global-batch gradient."""
        def sum_loss_fn(p, st, mb, r):
            out = apply_fn(p, st, mb, cfg, deterministic=False,
                           rng=r, train=True, use_pallas=pallas)
            return out["loss_sum"], (out["state"], out["loss_count"])

        vg = jax.value_and_grad(sum_loss_fn, has_aux=True)
        if grad_accum_steps == 1:
            (ls, (new_state, lc)), grads = vg(params, state, batch, rng)
            return grads, ls, lc, new_state

        def micro(carry, mb):
            g_acc, sum_acc, cnt_acc, st, i = carry
            (mls, (st2, mlc)), g = vg(params, st, mb,
                                      jax.random.fold_in(rng, i))
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            return (g_acc, sum_acc + mls, cnt_acc + mlc, st2, i + 1), None

        micro_batches = jax.tree.map(
            lambda x: x.reshape((grad_accum_steps,
                                 x.shape[0] // grad_accum_steps) + x.shape[1:]),
            batch)
        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, ls, lc, new_state, _), _ = jax.lax.scan(
            micro, (zero, 0.0, 0.0, state, 0), micro_batches)
        return grads, ls, lc, new_state

    def apply_update(grads, ls, lc, params, state, opt_state, lr):
        denom = jnp.maximum(lc, 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)
        loss = ls / denom
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, state, opt_state, loss

    def train_step_impl(params, state, opt_state, batch, step, rng, lr):
        rng = jax.random.fold_in(rng, step)
        grads, ls, lc, new_state = accumulate(params, state, batch, rng,
                                              use_pallas)
        return apply_update(grads, ls, lc, params, new_state, opt_state, lr)

    def eval_step_impl(params, state, batch, tables=None):
        kwargs = {}
        if tables is not None:
            kwargs["inference_tables"] = tables
        out = eval_apply_fn(params, state, batch, cfg,
                            deterministic=True, use_pallas=use_pallas,
                            **kwargs)
        res = {"pred_idx": jnp.argmax(out["logits"], axis=-1)}
        if "loss" in out:
            res["loss"] = out["loss"]
        return res

    # TPU-only: raise XLA's scoped-vmem cap so the fused FFN backward can
    # run as one kernel (f32 weight-grad outputs exceed the ~16 MB default)
    # and XLA's own fusions (conv/BN) get more room. None off-TPU.
    from realise_tpu.ops.pallas import tpu_compiler_options

    copts = tpu_compiler_options()

    if not shard_pallas:
        return _StepFns(tx=tx,
                        train_step=jax.jit(train_step_impl,
                                           donate_argnums=(0, 1, 2),
                                           compiler_options=copts),
                        eval_step=jax.jit(eval_step_impl,
                                          compiler_options=copts))

    # --------------------------------------------- shard_map (pallas × mesh)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rep, dat = P(), P("data")

    def train_step_shard(params, state, opt_state, batch, step, rng, lr):
        """Per-device body of the shard_map'd train step.

        Runs the Pallas kernels on this device's batch shard, then psums
        the loss *sums*, valid-token *counts*, and gradients over the
        ``data`` axis before normalizing — exactly the global-batch
        gradient, matching what GSPMD inserts for the jnp path (and the
        reference's DDP all-reduce, run.py:164-167)."""
        rng = jax.random.fold_in(rng, step)
        # Decorrelate dropout across shards: GSPMD partitions one global
        # mask; here each device draws its own stream.
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, ls, lc, new_state = accumulate(params, state, batch, rng,
                                              pallas=True)
        ls = jax.lax.psum(ls, "data")
        lc = jax.lax.psum(lc, "data")
        grads = jax.lax.psum(grads, "data")
        if isinstance(new_state, dict) and "resnet" in new_state:
            # BN running stats: average the per-shard updates. This
            # approximates global-batch stats (the between-shard variance
            # of means is lost) — the same approximation torch DDP makes,
            # except DDP keeps rank-0's purely local stats.
            new_state = dict(new_state)
            new_state["resnet"] = jax.lax.pmean(new_state["resnet"], "data")
        return apply_update(grads, ls, lc, params, new_state, opt_state, lr)

    train_step = jax.jit(
        shard_map(train_step_shard, mesh=mesh,
                  in_specs=(rep, rep, rep, dat, rep, rep, rep),
                  out_specs=(rep, rep, rep, rep),
                  check_vma=False),
        donate_argnums=(0, 1, 2), compiler_options=copts)

    eval_cache: Dict[bool, Any] = {}

    def make_sharded_eval(with_loss: bool):
        out_specs = {"pred_idx": dat}
        if with_loss:
            out_specs["loss"] = rep

        def shard_fn(params, state, batch, tables):
            kwargs = {}
            if tables is not None:
                kwargs["inference_tables"] = tables
            out = eval_apply_fn(params, state, batch, cfg,
                                deterministic=True, use_pallas=True,
                                **kwargs)
            res = {"pred_idx": jnp.argmax(out["logits"], axis=-1)}
            if with_loss:
                ls = jax.lax.psum(out["loss_sum"], "data")
                lc = jax.lax.psum(out["loss_count"], "data")
                res["loss"] = ls / jnp.maximum(lc, 1.0)
            return res

        return jax.jit(shard_map(shard_fn, mesh=mesh,
                                 in_specs=(rep, rep, dat, rep),
                                 out_specs=out_specs, check_vma=False),
                       compiler_options=copts)

    def sharded_eval_dispatch(params, state, batch, tables=None):
        # Labels: tgt_idx for CSC/pho-pretrain; res-pretrain's char_idx
        # doubles as input and label, so its loss is always available.
        with_loss = "tgt_idx" in batch or (pretrain and "char_idx" in batch)
        fn = eval_cache.get(with_loss)
        if fn is None:
            fn = make_sharded_eval(with_loss)
            eval_cache[with_loss] = fn
        return fn(params, state, batch, tables)

    return _StepFns(tx=tx, train_step=train_step,
                    eval_step=sharded_eval_dispatch)


def _step_fns_for(cfg, params, pretrain, use_pallas, shard_pallas,
                  grad_accum_steps, mesh, adam_epsilon, with_clip,
                  conv_slots: int = 0) -> _StepFns:
    key = (_cfg_cache_key(cfg), pretrain, bool(use_pallas), shard_pallas,
           grad_accum_steps, mesh, adam_epsilon, with_clip, conv_slots,
           jax.tree.structure(params))
    fns = _STEP_CACHE.get(key)
    if fns is None:
        fns = _build_step_fns(cfg, params, pretrain, use_pallas,
                              shard_pallas, grad_accum_steps, mesh,
                              adam_epsilon, with_clip, conv_slots)
        _STEP_CACHE[key] = fns
    return fns


class Trainer:
    """Owns the jitted train/eval steps for one model config."""

    def __init__(
        self,
        cfg: RealiseConfig,
        params,
        state,
        learning_rate: float = 5e-5,
        warmup_steps: int = 0,
        total_steps: int = 10000,
        weight_decay: float = 0.0,
        adam_epsilon: float = 1e-8,
        max_grad_norm: Optional[float] = 1.0,
        grad_accum_steps: int = 1,
        mesh=None,
        use_pallas: bool = False,
        pretrain: bool = False,
        seed: int = 17,
        table_cache_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        # On-disk cache for the serving fast-path tables; only set for
        # frozen-params evals (checkpoint eval/test CLIs), never while
        # training (utils/cache.py).
        self.table_cache_dir = table_cache_dir
        # pallas_call is a custom call XLA's SPMD partitioner cannot split,
        # so the kernels cannot run on global arrays under a >1-device
        # mesh. Data-only meshes instead run the step under shard_map —
        # each device executes the kernels on its local batch shard with
        # explicit psum of loss sums / grads (exact global-batch gradient,
        # the collectives XLA would have inserted for DDP). Tensor
        # parallelism splits H across devices, which the kernels assume
        # whole — fall back to the jnp path there.
        self._shard_pallas = False
        if use_pallas and mesh is not None and mesh.size > 1:
            data_only = all(mesh.shape[ax] == 1 for ax in mesh.axis_names
                            if ax != "data")
            if data_only and "data" in mesh.axis_names:
                self._shard_pallas = True
            else:
                logger.info("use_pallas disabled under a tensor-parallel "
                            "mesh (fused kernels need the full hidden dim)")
                use_pallas = False
        if use_pallas:
            # Nonstandard dims break the fused kernels on a real chip
            # (Mosaic tiling rules + the FFN backward's scoped-vmem
            # budget); the shared gate falls back to the jnp path instead
            # of dying mid-setup (ops/pallas.pallas_unviable_reason).
            from realise_tpu.ops.pallas import pallas_unviable_reason

            reason = pallas_unviable_reason(cfg, train=True)
            if reason is not None:
                logger.info("use_pallas disabled: %s", reason)
                use_pallas = False
                self._shard_pallas = False
        self.use_pallas = use_pallas
        self.pretrain = pretrain
        self.grad_accum_steps = grad_accum_steps
        self.base_rng = jax.random.PRNGKey(seed)
        self.apply_fn = apply_pretrain if pretrain else apply_realise

        self._fns_key = dict(
            cfg=cfg, pretrain=pretrain, use_pallas=use_pallas,
            shard_pallas=self._shard_pallas,
            grad_accum_steps=grad_accum_steps, mesh=mesh,
            adam_epsilon=adam_epsilon,
            with_clip=max_grad_norm is not None)
        fns = _step_fns_for(params=params, **self._fns_key)
        self.tx = fns.tx
        self._train_step = fns.train_step
        self._eval_step = fns.eval_step

        # Batch-unique conv (models/realise._factorized_conv): the runner —
        # not the graph — guarantees the static slot budget, by counting
        # the batch's distinct glyph rows on the host (in _put_batch, i.e.
        # on the prefetch thread) and dispatching the matching compiled
        # bucket; batches that bypass _put_batch's host stage fall back to
        # the always-correct full-table program. GSPMD multi-device meshes
        # are excluded (the compact path's unique/sort would partition into
        # cross-device collectives); the shard_map path counts per shard.
        self._conv_auto = (CONV_BATCH_UNIQUE and not pretrain
                           and cfg.with_res
                           and jax.process_count() == 1
                           and (mesh is None or self._shard_pallas))
        self._conv_data_shards = (mesh.shape["data"]
                                  if self._shard_pallas else 1)
        self._conv_step_cache: Dict[int, Any] = {}
        self._res_inverse_np = None
        self._conv_rows = 0
        # Counts carry this version; a restore that swaps the glyph tables
        # bumps it, so stale counts already sitting in the prefetch queue
        # can never select a compact program against the new tables.
        self._conv_meta_version = 0
        if self._conv_auto:
            self._conv_rows = res_conv_rows(state)
            if "res_uniq_inverse" in state:
                self._res_inverse_np = np.asarray(state["res_uniq_inverse"])
        self.schedule = linear_warmup_schedule(learning_rate, warmup_steps,
                                               total_steps)
        opt_state = self.tx.init(params)
        # Per-trainer hyperparameters live as leaves in the optimizer state
        # (optim.make_tx): write this trainer's values over the cached tx's
        # defaults; the scheduled lr is written per step in train_step.
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            learning_rate, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(
            weight_decay, jnp.float32)
        if max_grad_norm is not None:
            opt_state.hyperparams["max_grad_norm"] = jnp.asarray(
                max_grad_norm, jnp.float32)

        if mesh is not None:
            p_sh = param_shardings(params, mesh)
            s_sh = param_shardings(state, mesh)
            params = jax.device_put(params, p_sh)
            state = jax.device_put(state, s_sh)
            # Adam moments mirror the param shardings: optax's mu/nu subtrees
            # repeat the param tree paths, so the same path-pattern rules
            # apply (under tp>1 replicated moments would waste memory and
            # gather bandwidth on every update).
            o_sh = param_shardings(opt_state, mesh)
            opt_state = jax.device_put(opt_state, o_sh)

        self.train_state = TrainState(params=params, state=state,
                                      opt_state=opt_state, step=0)

    # ------------------------------------------------------------------ api
    def _conv_unique_rows(self, src_np: np.ndarray):
        """(meta_version, max distinct glyph rows) over the conv calls this
        batch makes — one per (data shard × grad-accum microbatch), both
        contiguous splits of the batch dim, matching the in-program
        reshape/sharding exactly. Runs on host numpy before device put.

        Runs on the prefetch thread, racing _refresh_conv_meta on the
        training thread: the VERSION is read first, then the inverse
        reference snapshotted, so an interleaved restore can only stamp a
        count computed against the NEW inverse with the OLD version — which
        _select_train_step rejects (full-table program). The unsafe
        interleaving (old-inverse count carrying the new version) cannot
        occur."""
        version = self._conv_meta_version
        inverse = self._res_inverse_np
        ids = src_np if inverse is None else inverse[src_np]
        groups = self._conv_data_shards * self.grad_accum_steps
        if ids.shape[0] % groups:
            u = self._conv_rows  # ragged: let the full program handle it
        else:
            u = max(len(np.unique(row)) for row in ids.reshape(groups, -1))
        return (version, u)

    def _refresh_conv_meta(self) -> bool:
        """Re-derive the host glyph metadata if the live state's tables
        changed shape (e.g. a checkpoint restore); returns True if current.
        Same-shape content changes cannot happen for honest states — the
        inverse is deterministic in (vocab, fonts) (install_glyphs)."""
        st = self.train_state.state
        rows = res_conv_rows(st)
        has_inv = "res_uniq_inverse" in st
        if (rows == self._conv_rows
                and has_inv == (self._res_inverse_np is not None)):
            return True
        self._conv_rows = rows
        self._res_inverse_np = (np.asarray(st["res_uniq_inverse"])
                                if has_inv else None)
        self._conv_step_cache.clear()
        self._conv_meta_version += 1
        return False

    def _select_train_step(self, count, n_tokens: int):
        """The compiled step whose conv slot budget fits this batch's
        host-counted distinct rows; the full-table program otherwise."""
        if count is None or not self._conv_auto:
            return self._train_step
        version, u = count
        if version != self._conv_meta_version or not self._refresh_conv_meta():
            return self._train_step  # count predates the current tables
        per_call = n_tokens // (self._conv_data_shards
                                * self.grad_accum_steps)
        slots = next((b for b in conv_slot_buckets(self._conv_rows, per_call)
                      if u <= b), 0)
        if not slots:
            return self._train_step
        fn = self._conv_step_cache.get(slots)
        if fn is None:
            logger.info("compiling batch-unique train step: %d conv slots "
                        "(batch needs %d of %d rows)", slots, u,
                        self._conv_rows)
            fn = _step_fns_for(params=self.train_state.params,
                               conv_slots=slots, **self._fns_key).train_step
            self._conv_step_cache[slots] = fn
        return fn

    def _put_batch(self, device_batch: Dict[str, np.ndarray],
                   train: bool = True):
        # Idempotent: fit()'s device-prefetch queue already ran batches
        # through this function, and train_step applies it again — on
        # multi-host meshes a second make_global_batch would np.asarray a
        # global array whose shards live on other hosts (crash), and on any
        # mesh it would redo placement work.
        conv_rows = None
        if isinstance(device_batch, dict):
            conv_rows = device_batch.get("_conv_rows_max")
            if conv_rows is not None:
                device_batch = {k: v for k, v in device_batch.items()
                                if k != "_conv_rows_max"}
            elif (train and self._conv_auto
                    and isinstance(device_batch.get("src_idx"), np.ndarray)):
                # Batch-unique conv: count distinct glyph rows while the
                # batch is still HOST data (free here on the prefetch
                # thread; a device pull later would sync the dispatch
                # queue). Travels with the batch as a plain-int side
                # channel; train_step pops it before dispatch.
                conv_rows = self._conv_unique_rows(device_batch["src_idx"])
        leaves = jax.tree.leaves(device_batch)
        if leaves and all(isinstance(x, jax.Array) for x in leaves):
            if self.mesh is None or all(
                    getattr(x.sharding, "mesh", None) == self.mesh
                    for x in leaves):
                out = device_batch
            else:
                out = self._put_batch_arrays(device_batch)
        else:
            out = self._put_batch_arrays(device_batch)
        if conv_rows is not None:
            out = dict(out)
            out["_conv_rows_max"] = conv_rows
        return out

    def _put_batch_arrays(self, device_batch):
        if self.mesh is not None:
            from realise_tpu.parallel.distributed import (
                make_global_batch,
                process_count,
            )

            if process_count() > 1:
                # Multi-host: the caller feeds this process's LOCAL slice
                # (realise_tpu.parallel.distributed.local_slice); assemble
                # the global array from per-process shards.
                return make_global_batch(device_batch, self.mesh,
                                         batch_shardings)
            arrays = {k: jnp.asarray(v) for k, v in device_batch.items()}
            return jax.device_put(arrays, batch_shardings(arrays, self.mesh))
        return {k: jnp.asarray(v) for k, v in device_batch.items()}

    def train_step(self, device_batch: Dict[str, np.ndarray]) -> float:
        self._eval_tables = None  # params change: fast-path tables go stale
        ts = self.train_state
        # The scheduled lr is evaluated here (host side) and written into
        # the optimizer state inside the step — schedule shape stays out of
        # the compiled program (see _build_step_fns).
        lr = (self.schedule(ts.step) if callable(self.schedule)
              else self.schedule)
        batch = self._put_batch(device_batch)
        conv_rows = None
        if isinstance(batch, dict) and "_conv_rows_max" in batch:
            batch = dict(batch)
            conv_rows = batch.pop("_conv_rows_max")
        step_fn = self._select_train_step(
            conv_rows, batch["src_idx"].size if "src_idx" in batch else 0)
        # Step goes in as an array so the jitted fn does not retrace per step.
        params, state, opt_state, loss = step_fn(
            ts.params, ts.state, ts.opt_state, batch,
            jnp.asarray(ts.step, jnp.int32), self.base_rng,
            jnp.asarray(lr, jnp.float32))
        self.train_state = TrainState(params, state, opt_state, ts.step + 1)
        return loss

    def prepare_eval_tables(self, featurizer) -> bool:
        """Precompute the serving fast-path tables from the CURRENT params.

        Per-vocab GRU hiddens and glyph features depend only on the token
        id (models/realise.py), so one table build (~a few batches' worth
        of conv/GRU over the 21k vocab) replaces the live GRU scan + conv
        stack in every subsequent eval_step — the same fast path the
        serving CLI uses, ~2× eval throughput on v5e. Call again after
        loading different params (cli/train does, per checkpoint)."""
        from realise_tpu.models.realise import precompute_inference_tables

        if self.pretrain:
            return False  # pretrain objectives have no serving tables
        if jax.process_count() > 1:
            # Multi-host: the chunked table builders would need per-process
            # global-array assembly; eval stays on the live path there.
            return False
        cfg = self.cfg
        if not (cfg.with_res or cfg.pho_encoder == "pho2"):
            return False
        idx = lens = None
        if cfg.pho_encoder == "pho2":
            t, l = featurizer.pho2_tables()
            idx, lens = jnp.asarray(t), jnp.asarray(l)
        ts = self.train_state
        tables = precompute_inference_tables(
            ts.params, ts.state, cfg, vocab_pho_idx=idx, vocab_pho_lens=lens,
            cache_dir=self.table_cache_dir)
        if self.mesh is not None:
            # Replicate over the mesh: each (V, H) table is ~33 MB bf16 —
            # cheap next to the 2× eval speedup of skipping the live GRU
            # scan + conv stack every batch (the shard_map eval path takes
            # them through a replicated in_spec).
            from jax.sharding import NamedSharding, PartitionSpec

            tables = jax.device_put(
                tables, NamedSharding(self.mesh, PartitionSpec()))
        self._eval_tables = tables
        return True

    def clear_eval_tables(self):
        self._eval_tables = None

    def eval_step(self, device_batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        ts = self.train_state
        # train=False skips the host unique-row count — eval always runs the
        # full-table program, so the O(B·S log) np.unique would be wasted
        # prefetch-thread work. The strip below still guards batches that
        # came through a train-path prefetch queue.
        batch = self._put_batch(device_batch, train=False)
        if isinstance(batch, dict) and "_conv_rows_max" in batch:
            batch = {k: v for k, v in batch.items()
                     if k != "_conv_rows_max"}  # train-side side channel
        out = self._eval_step(ts.params, ts.state, batch,
                              getattr(self, "_eval_tables", None))
        if jax.process_count() > 1:
            # Multi-host: outputs are global sharded arrays whose shards
            # live on other hosts; gather the full value everywhere.
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        return jax.tree.map(np.asarray, out)

    # ------------------------------------------------------------------ loop
    def fit(
        self,
        batches: Iterable[Dict[str, np.ndarray]],
        max_steps: Optional[int] = None,
        logging_steps: int = 100,
        save_steps: int = 0,
        save_fn: Optional[Callable[[int, "TrainState"], None]] = None,
        log_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
        device_prefetch: int = 2,
    ) -> Dict[str, float]:
        """Consume an iterable of host batches; returns summary stats.

        ``device_prefetch`` keeps that many batches already transferred (and
        mesh-sharded) on device so host→device copies overlap compute —
        realise_tpu.data.dataset.prefetch_to_device with this trainer's
        ``_put_batch``. 0 disables. NOTE: when ``max_steps`` stops the
        loop, up to that many in-flight batches are dropped — a caller
        that resumes the SAME stream with a second fit() (cli/train's
        trace path) must wrap the stream with prefetch_to_device ONCE
        outside and pass ``device_prefetch=0``, or the resumed steps
        train on the wrong batches."""
        from realise_tpu.data.dataset import prefetch_to_device

        from realise_tpu.utils.profiler import StepTimer

        if device_prefetch:
            batches = prefetch_to_device(batches, size=device_prefetch,
                                         put_fn=self._put_batch)
        timer = StepTimer(warmup=2)
        count = 0
        t0 = time.time()
        loss = None
        last_loss = float("nan")
        for batch in batches:
            with timer:
                loss = self.train_step(batch)
            count += 1
            step = self.train_state.step
            # Defer the host sync: read the loss scalar only at logging time.
            if logging_steps and step % logging_steps == 0:
                last_loss = float(loss)
                lr = float(self.schedule(step)) if callable(self.schedule) else self.schedule
                rec = {"step": step, "loss": last_loss, "lr": lr,
                       "steps_per_sec": count / (time.time() - t0)}
                (log_fn or (lambda r: logger.info("%s", r)))(rec)
            if save_steps and save_fn and step % save_steps == 0:
                save_fn(step, self.train_state)
            if max_steps is not None and step >= max_steps:
                break
        jax.block_until_ready(self.train_state.params)
        wall = time.time() - t0
        if loss is not None:
            last_loss = float(loss)  # one host sync, after the wall clock
        return {"steps": self.train_state.step,
                "final_loss": float(last_loss),
                "wall_time_s": wall,
                "steps_per_sec": count / wall if wall > 0 else 0.0,
                # dispatch-time percentiles (steps are async; spikes here
                # mean the host input pipeline stalled the queue).
                "dispatch": timer.summary()}
