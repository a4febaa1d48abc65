"""Fine-tune CLI — the train.sh / src/run.py equivalent.

Reference flow (reference: src/run.py:282-526, train.sh): load config +
tokenizer, build model + glyphs, train with AdamW/warmup/clip, checkpoint
every ``--save_steps``, then evaluate every checkpoint on dev, keep the top-k
by ``--order_metric``, and optionally predict on the test set.

Example (smoke, no corpus assets):
    python -m realise_tpu.cli.train --model_type bert-pho2-res-arch3 \
        --synthetic --tiny --max_steps 4 --output_dir /tmp/out
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from realise_tpu.cli.common import (
    add_common_args,
    auto_use_pallas,
    build_config,
    build_glyphs,
    build_mesh,
    build_tokenizer,
    evaluate_model,
    force_platform,
    load_dataset,
    setup_logging,
    write_json,
    zero_padding_loss,
    logger,
)
from realise_tpu.data.dataset import (
    batch_iterator,
    bucketed_batch_iterator,
    pad_examples,
    threaded_prefetch,
)
from realise_tpu.data.features import Featurizer
from realise_tpu.models.realise import init_realise
from realise_tpu.training.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    retain_top_k,
    save_checkpoint,
)
from realise_tpu.training.merge import merge_params
from realise_tpu.training.trainer import Trainer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--train_file", default="trainall.times2.pkl")
    p.add_argument("--dev_file", default="dev.pkl")
    p.add_argument("--dev_label_file", default=None)
    p.add_argument("--predict_file", default="test.sighan15.pkl")
    p.add_argument("--predict_label_file", default=None)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_predict", action="store_true")
    p.add_argument("--init_ckpt", default=None,
                   help="checkpoint dir to initialize from (e.g. merged "
                        "pretrain, the merge.py equivalent)")
    p.add_argument("--pho_ckpt", default=None,
                   help="pho2-pretrain checkpoint to overlay at init")
    p.add_argument("--res_ckpt", default=None,
                   help="res-pretrain checkpoint to overlay at init")
    p.add_argument("--per_device_train_batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=32)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--num_train_epochs", type=float, default=10)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--warmup_steps", type=int, default=10000)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--save_steps", type=int, default=1000)
    p.add_argument("--order_metric", default="sent-detect-f1")
    # BooleanOptionalAction: the reference's plain store_true
    # (run.py:323) paired with its avg_loss default; our default metric
    # is sent-detect-f1 (higher better), so reverse defaults True and
    # --no-metric_reverse selects lower-is-better ordering (a bare
    # store_true with default=True could never be turned off — the
    # top-k retention would keep the WORST checkpoints for loss
    # metrics).
    p.add_argument("--metric_reverse", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--num_save_ckpts", type=int, default=5)
    p.add_argument("--remove_unused_ckpts", action="store_true")
    p.add_argument("--length_buckets", default=None,
                   help="comma-separated padded lengths (e.g. '32,64,128'): "
                        "length-bucketed batching, one jit variant per "
                        "bucket, instead of always padding to max_seq_length")
    p.add_argument("--no_prefetch", action="store_true",
                   help="disable the background featurization thread")
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler trace of the first "
                        "--trace_steps training steps into this directory "
                        "(TensorBoard-loadable)")
    p.add_argument("--trace_steps", type=int, default=5)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() before "
                        "device discovery (coordinator/count/id from "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID, or autodetected on TPU pods); "
                        "the mesh then spans the global device set and "
                        "each process feeds its contiguous slice of every "
                        "global batch")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in output_dir, "
                        "restoring params, BN stats, Adam moments and the "
                        "step counter (the reference loses optimizer state "
                        "on restart, SURVEY.md §5.3)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()
    force_platform(args.platform)
    if args.distributed:
        from realise_tpu.parallel.distributed import initialize

        initialize()  # must run before any device discovery
    from realise_tpu.parallel.distributed import (
        is_main_process,
        local_slice,
        process_count,
        process_index,
    )

    if not (args.do_train or args.do_eval or args.do_predict):
        args.do_train = True  # sensible default for smoke runs

    tokenizer = build_tokenizer(args)
    cfg = build_config(args, len(tokenizer))
    featurizer = Featurizer(tokenizer, cfg)
    mesh = build_mesh(args)
    if args.distributed and mesh is None:
        # Without a mesh each process would train an independent model on
        # its local data slice (no global batch, no gradient sync) —
        # silently wrong. Default to data parallelism over every device.
        from realise_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        logger.info("--distributed without --mesh: defaulting to data "
                    "parallelism over all %d devices", mesh.size)
    glyphs = build_glyphs(args, tokenizer, cfg)

    pho_tables = (featurizer.pho2_tables()
                  if cfg.pho_encoder == "pho2" else None)
    params, state = init_realise(jax.random.PRNGKey(args.seed), cfg,
                                 glyphs=glyphs, pho_tables=pho_tables)
    if args.init_ckpt:
        restored = load_checkpoint(args.init_ckpt)
        params = restored["params"]
        state = {**restored["state"]}
        if glyphs is not None:
            state["char_images"] = state.get("char_images", glyphs)
        if pho_tables is not None and "pho_uniq_idx" not in state:
            # Older checkpoints predate the per-vocab GRU tables (or their
            # deduplicated form) — install both from the featurizer.
            from realise_tpu.models.realise import install_pho_vocab_tables
            install_pho_vocab_tables(state, pho_tables[0], pho_tables[1])
    if args.pho_ckpt or args.res_ckpt:
        pho = load_checkpoint(args.pho_ckpt) if args.pho_ckpt else None
        res = load_checkpoint(args.res_ckpt) if args.res_ckpt else None
        params, state = merge_params(
            params, state,
            pho_params=pho["params"] if pho else None,
            res_params=res["params"] if res else None,
            res_state=res["state"] if res else None)

    train_data = load_dataset(args, tokenizer, args.train_file,
                              num_synthetic=256, seed=args.seed)
    batch_size = args.per_device_train_batch_size
    if mesh is not None and "data" in mesh.axis_names:
        batch_size *= mesh.shape["data"]
    # Reference flag semantics (run.py:193-207): the loader batch is the
    # MICRO batch and the optimizer steps once per `accum` loader batches,
    # so the UPDATE batch is bs × accum. Our Trainer takes the full update
    # batch per step and microbatches it in-jit — so the stream must yield
    # bs × accum examples per step or accum would silently HALVE the
    # effective batch (and data consumed) vs the reference recipe.
    batch_size *= args.gradient_accumulation_steps
    if batch_size % process_count():
        raise SystemExit(
            f"global batch {batch_size} must divide evenly across "
            f"{process_count()} processes")
    # ceil: the stream pads (never drops) the final short batch of each
    # epoch, so it yields ceil(len/bs) optimizer steps per epoch — the
    # resume fast-forward below indexes into exactly that stream.
    steps_per_epoch = max(-(-len(train_data) // batch_size), 1)
    total_steps = (args.max_steps if args.max_steps > 0
                   else int(steps_per_epoch * args.num_train_epochs))

    trainer = Trainer(
        cfg, params, state,
        learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps,
        total_steps=max(total_steps, 1),
        weight_decay=args.weight_decay,
        adam_epsilon=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm,
        grad_accum_steps=args.gradient_accumulation_steps,
        mesh=mesh,
        use_pallas=auto_use_pallas(args.use_pallas),
        seed=args.seed,
    )

    if args.resume:
        ckpts = list_checkpoints(args.output_dir)
        if ckpts:
            step, ckpt_dir = ckpts[-1]
            import numpy as _np
            ts = trainer.train_state
            # Restore INTO the live pytree structure so optax NamedTuple
            # states come back as NamedTuples, not plain dicts.
            template = jax.tree.map(_np.asarray, {
                "params": ts.params, "state": ts.state,
                "opt_state": ts.opt_state, "step": 0})
            restored = load_checkpoint(ckpt_dir, template=template)
            trainer.train_state = type(ts)(
                params=jax.tree.map(jnp.asarray, restored["params"]),
                state=jax.tree.map(jnp.asarray, restored["state"]),
                opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
                step=int(restored["step"]))
            logger.info("resumed from %s at step %d", ckpt_dir, step)

    training_args = {k: v for k, v in vars(args).items()}

    def save_fn(step, ts):
        # EVERY process calls: the host gather inside save_checkpoint is a
        # collective on multi-host meshes (gating it to process 0 would
        # deadlock the allgather). The function itself implements the
        # reference's rank-0 file writes (run.py:223-230) + an end barrier.
        save_checkpoint(args.output_dir, step, ts.params, ts.state,
                        ts.opt_state, cfg=cfg, training_args=training_args)
        if is_main_process():
            logger.info("saved checkpoint at step %d", step)

    if args.do_train:
        logger.info("training: %d examples, batch %d, %d total steps",
                    len(train_data), batch_size, total_steps)

        buckets = ([int(x) for x in args.length_buckets.split(",")]
                   if args.length_buckets else None)

        def batches():
            # Every process iterates the same global batch order (same
            # shuffle seed) and featurizes only its contiguous slice; the
            # trainer reassembles the global array from per-process shards
            # (no tail-dropping, unlike run.py:134-137). A --resume run
            # fast-forwards to the epoch/offset the restored step implies
            # (same per-epoch shuffle seeds), so the data stream continues
            # where the crashed run stopped instead of replaying epoch 0.
            start = trainer.train_state.step
            epoch = start // steps_per_epoch
            skip = start % steps_per_epoch
            while True:
                if buckets:
                    it = ((seq_len, examples) for seq_len, examples in
                          bucketed_batch_iterator(train_data, batch_size,
                                                  buckets=buckets,
                                                  shuffle=True,
                                                  seed=args.seed + epoch,
                                                  pad_final=False))
                else:
                    it = ((None, examples) for examples in
                          batch_iterator(train_data, batch_size,
                                         shuffle=True,
                                         seed=args.seed + epoch,
                                         pad_final=False))
                for i, (seq_len, examples) in enumerate(it):
                    if i < skip:
                        continue  # pre-featurization: skipping is free
                    kw = {"seq_len": seq_len} if seq_len else {}
                    # Pad the final short batch HERE (static shapes) and
                    # zero the padding rows' loss: counting the duplicate
                    # rows would over-weight one example's gradient up to
                    # batch_size-1x once per epoch.
                    n = len(examples)
                    padded = pad_examples(examples, batch_size)
                    sliced = local_slice(padded)
                    feed = featurizer.featurize(sliced, **kw)
                    row0 = process_index() * len(sliced)
                    feed = zero_padding_loss(feed, n, row0)
                    yield featurizer.device_batch(feed)
                skip = 0
                epoch += 1

        stream = batches() if args.no_prefetch else threaded_prefetch(batches())
        # Device-prefetch OUTSIDE fit: fit's internal wrapper would hold up
        # to 2 in-flight batches when max_steps stops it, and the trace
        # path below resumes the SAME stream — those batches would be
        # dropped and steps after the trace would train on the wrong data
        # (the deterministic resume contract maps step k to batch k).
        from realise_tpu.data.dataset import prefetch_to_device

        stream = prefetch_to_device(stream, size=2,
                                    put_fn=trainer._put_batch)

        if args.trace_dir:
            # Profile a few steps first (jax.profiler trace for TensorBoard),
            # then continue untraced.
            from realise_tpu.utils.profiler import trace

            n_trace = min(args.trace_steps, total_steps)
            with trace(args.trace_dir):
                trainer.fit(stream, max_steps=n_trace,
                            logging_steps=args.logging_steps,
                            save_steps=args.save_steps, save_fn=save_fn,
                            device_prefetch=0)
            logger.info("wrote profiler trace to %s", args.trace_dir)

        summary = trainer.fit(stream, max_steps=total_steps,
                              logging_steps=args.logging_steps,
                              save_steps=args.save_steps, save_fn=save_fn,
                              device_prefetch=0)
        logger.info("train summary: %s", summary)
        save_fn(trainer.train_state.step, trainer.train_state)

    scored = []  # (ckpt_dir, dev score) — also feeds do_predict's pick
    if args.do_eval:
        dev_data = load_dataset(args, tokenizer, args.dev_file,
                                num_synthetic=64, seed=args.seed + 1)
        label = (os.path.join(args.data_dir, args.dev_label_file)
                 if args.data_dir and args.dev_label_file else None)
        all_results = {}
        for step, ckpt_dir in list_checkpoints(args.output_dir):
            restored = load_checkpoint(ckpt_dir)
            # jnp.asarray: restored leaves are host numpy; installing them
            # raw would re-upload the whole model per eval batch.
            trainer.train_state = trainer.train_state.__class__(
                params=jax.tree.map(jnp.asarray, restored["params"]),
                state=jax.tree.map(jnp.asarray, restored["state"]),
                opt_state=trainer.train_state.opt_state, step=step)
            # Frozen checkpoint params: the serving-table build may cache.
            trainer.table_cache_dir = ckpt_dir
            res = evaluate_model(trainer, dev_data, featurizer, tokenizer,
                                 args.output_dir, prefix=f"eval-{step}",
                                 batch_size=args.eval_batch_size,
                                 label_path=label)
            logger.info("ckpt %d dev: %s", step, res)
            all_results[str(step)] = res
            score = res[args.order_metric]
            scored.append((ckpt_dir, score))
        if scored and args.remove_unused_ckpts:
            # Rank-0 deletes (every process computed the identical scores);
            # the barrier keeps other processes from listing/loading a
            # checkpoint mid-deletion below.
            if is_main_process():
                retain_top_k(scored, args.num_save_ckpts,
                             reverse=args.metric_reverse)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("realise_retain_top_k")
        if is_main_process():
            write_json(os.path.join(args.output_dir, "dev_results.json"),
                       all_results)
        if scored:
            best = max(scored, key=lambda t: t[1]) if args.metric_reverse \
                else min(scored, key=lambda t: t[1])
            logger.info("best checkpoint: %s (%s=%.2f)", best[0],
                        args.order_metric, best[1])

    if args.do_predict:
        test_data = load_dataset(args, tokenizer, args.predict_file,
                                 num_synthetic=64, seed=args.seed + 2)
        label = (os.path.join(args.data_dir, args.predict_label_file)
                 if args.data_dir and args.predict_label_file else None)
        # Predict with the best dev checkpoint when do_eval just ranked
        # them (the reference predicts per saved checkpoint, run.py:507-526
        # — best-by-order_metric is the one its pipeline reports); else the
        # latest saved checkpoint (standalone --do_predict runs); else the
        # live params (fresh --do_train without saves).
        predict_ckpt = None
        if args.do_eval and scored:
            predict_ckpt = (max if args.metric_reverse else min)(
                scored, key=lambda t: t[1])[0]
        else:
            ckpts = list_checkpoints(args.output_dir)
            if ckpts:
                predict_ckpt = ckpts[-1][1]
        if predict_ckpt is not None:
            restored = load_checkpoint(predict_ckpt)
            trainer.train_state = trainer.train_state.__class__(
                params=jax.tree.map(jnp.asarray, restored["params"]),
                state=jax.tree.map(jnp.asarray, restored["state"]),
                opt_state=trainer.train_state.opt_state,
                step=trainer.train_state.step)
            trainer.table_cache_dir = predict_ckpt
            logger.info("predicting with %s", predict_ckpt)
        res = evaluate_model(trainer, test_data, featurizer, tokenizer,
                             args.output_dir, prefix="predict",
                             batch_size=args.eval_batch_size,
                             label_path=label)
        logger.info("predict: %s", res)
        if is_main_process():
            write_json(os.path.join(args.output_dir,
                                    "predict_results.json"), res)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
