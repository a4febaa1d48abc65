"""Serving core: load a checkpoint once, correct sentences fast.

:class:`Corrector` owns everything the serving surfaces share — checkpoint
+ config load, tokenizer/featurizer, the precomputed per-vocab GRU/glyph
tables (the fast path that removes the conv stack and GRU scan from the hot
loop), the jitted forward, and prediction→text decoding. The batch CLI
(realise_tpu.cli.correct) and the HTTP daemon (realise_tpu.cli.serve) are
thin wrappers over it.

The reference ships no serving surface at all (its closest is the batch
scorer src/test.py); this is additive.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class _CrossRequestBatcher:
    """Coalesce concurrent requests' device calls into one jitted step.

    The serving hot loop is device-lock bound under concurrency: N request
    threads of small batches become N sequential device programs
    (measured: 8×32-sentence threads sustain ~0.92k sent/s vs the ~3.5k
    raw batch-256 ceiling — BENCH_SERVING.json round 5 pre-batching).
    This batcher is *opportunistic*: a dedicated device worker drains, in
    one go, every queued submission that shares the caller's sequence
    bucket (up to the device batch size) and runs ONE step for the group.
    While a step is in flight, new arrivals queue — so under load the
    group size rises toward batch_size with **no wait timer** and the
    unloaded case stays a batch of one (a thread handoff of overhead,
    ~0.1 ms, instead of a latency-vs-throughput knob to mistune).

    Submissions carry host arrays (featurization stays in the request
    threads, concurrently); the worker concatenates rows, pads the group
    to the corrector's batch bucket, and fans the prediction rows back.
    """

    def __init__(self, corrector: "Corrector"):
        self._c = corrector
        self._cv = threading.Condition()
        self._pending: List[Dict] = []
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="serving-device-batcher")
        self._thread.start()

    def submit(self, device_arrays: Dict[str, np.ndarray], n: int,
               seq_len: int) -> np.ndarray:
        """Block until the group step containing these ``n`` rows ran;
        returns this submission's (n, seq_len) prediction rows."""
        sub = {"arrays": device_arrays, "n": n, "seq": seq_len,
               "event": threading.Event(), "preds": None, "err": None}
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._pending.append(sub)
            self._cv.notify()
        sub["event"].wait()
        if sub["err"] is not None:
            raise sub["err"]
        return sub["preds"]

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._thread.join()

    def _take_group(self) -> List[Dict]:
        """Under the cv: pop the head submission plus every same-bucket
        one that still fits the device batch (FIFO — skipped buckets keep
        their order for the next round). The head is taken even when it
        alone exceeds the cap (a direct correct_batch() call larger than
        batch_size): it then rides solo at its own row count."""
        cap = self._c.batch_size
        seq = self._pending[0]["seq"]
        group, rest, total = [], [], 0
        for sub in self._pending:
            if not group or (sub["seq"] == seq
                             and total + sub["n"] <= cap):
                group.append(sub)
                total += sub["n"]
            else:
                rest.append(sub)
        self._pending = rest
        return group

    def _run(self) -> None:
        c = self._c
        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if not self._pending:
                    return  # closed and drained
                group = self._take_group()
            try:
                total = sum(sub["n"] for sub in group)
                # An oversize solo submission exceeds every bucket: run it
                # at its own row count rather than truncating.
                rows = max(c._batch_bucket_for(total), total)
                keys = group[0]["arrays"].keys()
                arrays = {
                    k: np.concatenate([sub["arrays"][k] for sub in group])
                    for k in keys}
                if rows > total:  # pad with copies of the last row
                    arrays = {
                        k: np.concatenate(
                            [v, np.repeat(v[-1:], rows - total, axis=0)])
                        for k, v in arrays.items()}
                preds = c._device_step(arrays)
                off = 0
                for sub in group:
                    sub["preds"] = preds[off : off + sub["n"]]
                    off += sub["n"]
            except Exception as e:  # pragma: no cover - propagate to callers
                for sub in group:
                    sub["err"] = e
            finally:
                for sub in group:
                    sub["event"].set()


class Corrector:
    """Spelling-correction engine over a trained checkpoint."""

    def __init__(
        self,
        ckpt_dir: str,
        vocab_path: Optional[str] = None,
        batch_size: int = 32,
        use_pallas: Optional[bool] = None,
        fast_path: bool = True,
        native_featurizer: bool = False,
        synthetic_vocab: bool = False,
        length_buckets: Sequence[int] = (32, 64, 128),
        cross_request_batching: bool = False,
    ):
        import jax

        from realise_tpu.cli.common import auto_use_pallas
        from realise_tpu.data.features import Featurizer
        from realise_tpu.eval.metric import Metric
        from realise_tpu.models.realise import (
            apply_realise,
            precompute_inference_tables,
        )
        from realise_tpu.text.tokenizer import WordPieceTokenizer
        from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict
        from realise_tpu.training.checkpoint import (
            list_checkpoints,
            load_checkpoint,
            load_config,
        )

        from realise_tpu.utils.cache import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        ckpts = list_checkpoints(ckpt_dir)
        ckpt_path = ckpts[-1][1] if ckpts else ckpt_dir
        self.cfg = load_config(ckpt_path)
        restored = load_checkpoint(ckpt_path)
        self.params = jax.tree.map(jax.numpy.asarray, restored["params"])
        self.state = jax.tree.map(jax.numpy.asarray, restored["state"])
        self.batch_size = batch_size
        use_pallas = auto_use_pallas(use_pallas)
        if use_pallas:
            from realise_tpu.ops.pallas import pallas_unviable_reason

            # Tiny/nonstandard dims violate Mosaic's tiling rules on a
            # real chip — serve on the jnp path instead (shared gate).
            if pallas_unviable_reason(self.cfg) is not None:
                use_pallas = False

        if vocab_path:
            self.tokenizer = WordPieceTokenizer.from_pretrained(vocab_path)
        elif synthetic_vocab:
            self.tokenizer = WordPieceTokenizer(
                vocab_to_dict(build_synthetic_vocab()))
        else:
            raise ValueError("need vocab_path (or synthetic_vocab=True)")
        if len(self.tokenizer) != self.cfg.vocab_size:
            raise ValueError(
                f"tokenizer vocab ({len(self.tokenizer)}) != model vocab "
                f"({self.cfg.vocab_size})")
        self.featurizer = Featurizer(self.tokenizer, self.cfg)
        self.metric = Metric(self.tokenizer)

        self.native = None
        if native_featurizer:
            from realise_tpu.data.native import NativeFeaturizer

            if not vocab_path:
                import tempfile

                vocab_path = self.tokenizer.save_pretrained(tempfile.mkdtemp())
            self.native = NativeFeaturizer(
                vocab_path,
                do_lower_case=self.tokenizer.basic.do_lower_case)

        tables = None
        if fast_path:
            idx, lens = self.featurizer.pho2_tables()
            # cache_dir: serving restarts on the same checkpoint skip the
            # table build entirely (content-digest keyed, utils/cache.py).
            tables = precompute_inference_tables(
                self.params, self.state, self.cfg,
                vocab_pho_idx=jax.numpy.asarray(idx),
                vocab_pho_lens=jax.numpy.asarray(lens),
                cache_dir=ckpt_path)

        self._device_lock = threading.Lock()

        @jax.jit
        def _step(params, state, batch):
            out = apply_realise(params, state, batch, self.cfg,
                                use_pallas=use_pallas,
                                inference_tables=tables)
            return out["logits"].argmax(-1)

        self._step = _step
        # Static padded lengths: each request pays for the smallest bucket
        # that fits its longest sentence instead of always max_seq_length
        # (one jit specialization per bucket; tile-friendly multiples of 8).
        s_max = self.cfg.max_seq_length
        self._buckets = sorted({min(int(b), s_max)
                                for b in length_buckets} | {s_max})
        # Batch-dim buckets: a single-sentence request computes 1 row, not
        # batch_size rows (latency engineering — the round-2 design padded
        # every request to the full batch). Same static-shape discipline:
        # one jit specialization per (batch_bucket, seq_bucket). Powers of
        # two from 8 up: with the cross-request batcher a group's total can
        # land anywhere below the cap, and a sparse {1, 8, cap} set would
        # pad a 3-request group of 96 rows to a 256-row program.
        self._batch_buckets = sorted(
            {1} | {b for b in (8, 16, 32, 64, 128) if b < batch_size}
            | {batch_size})
        self._batcher = (_CrossRequestBatcher(self)
                         if cross_request_batching else None)

    def _bucket_for(self, sentences: Sequence[str]) -> int:
        # +2 for [CLS]/[SEP]; WordPiece can only shrink char counts for CJK.
        need = max((len(s) for s in sentences), default=0) + 2
        for b in self._buckets:
            if need <= b:
                return b
        return self._buckets[-1]

    def _batch_bucket_for(self, n: int) -> int:
        for b in self._batch_buckets:
            if n <= b:
                return b
        return self._batch_buckets[-1]

    def warmup(self, all_buckets: bool = False) -> None:
        """Trigger the jit compile so the first request is fast.

        Bypasses the cross-request batcher: live requests arriving during
        a minutes-long warmup (the daemon binds its socket first) would
        otherwise merge into warmup groups and bump them to a LARGER
        batch bucket, silently leaving some (batch, length) programs
        uncompiled despite ``all_buckets``."""
        batcher, self._batcher = self._batcher, None
        try:
            if all_buckets:
                for b in self._buckets:
                    for n in self._batch_buckets:
                        self.correct_batch(["好" * min(b - 2, 4)] * n,
                                           seq_len=b)
            else:
                self.correct(["好"])
        finally:
            self._batcher = batcher

    def _device_step(self, device_arrays: Dict[str, np.ndarray]) -> np.ndarray:
        """One jitted step over a bucket-shaped device batch → pred ids.
        Serialized: concurrent HTTP request threads interleave
        featurization and splicing but never the accelerator step."""
        with self._device_lock:
            return np.asarray(self._step(self.params, self.state,
                                         device_arrays))

    def close(self) -> None:
        """Stop the cross-request batcher worker (no-op without one)."""
        if self._batcher is not None:
            self._batcher.close()
            self._batcher = None

    def correct_batch(self, sentences: Sequence[str],
                      seq_len: Optional[int] = None) -> List[str]:
        """One device batch (≤ batch_size sentences) → corrected strings.

        The device sees one static shape per (batch, length) bucket pair:
        requests are padded (repeating the last sentence) to the smallest
        batch bucket that fits, so the jit never re-specializes on the
        request size and one sentence never pays for batch_size rows.
        With ``cross_request_batching`` the padding (and the device call)
        happens at the GROUP level instead: concurrent requests sharing a
        sequence bucket ride one step (:class:`_CrossRequestBatcher`)."""
        n = len(sentences)
        if n == 0:
            return []
        seq = seq_len or self._bucket_for(sentences)
        batcher = self._batcher  # snapshot: warmup/close may null the attr
        if batcher is not None:
            host = self.featurizer.featurize_raw(
                list(sentences), native=self.native, seq_len=seq)
            preds = batcher.submit(
                self.featurizer.device_batch(host), n, seq)
        else:
            rows = self._batch_bucket_for(n)
            padded = list(sentences) + [sentences[-1]] * (rows - n)
            host = self.featurizer.featurize_raw(
                padded, native=self.native, seq_len=seq)
            preds = self._device_step(self.featurizer.device_batch(host))
        host["pred_idx"] = preds
        out = []
        for i in range(n):
            out.append(self._reconstruct(sentences[i], host, i))
        return out

    def _reconstruct(self, src: str, host, i) -> str:
        """Splice predicted tokens back into the ORIGINAL sentence.

        The metric-path reconstruction (eval/metric.py, reference parity)
        rebuilds text from token widths alone, which drops whatever the
        tokenizer dropped — a sentence with a space comes back shifted and
        one char short. Serving instead maps each token to its source span
        (tokenize_with_spans) and substitutes only clean same-width
        corrections, so whitespace, casing, and un-tokenizable characters
        of the user's input survive untouched."""
        spans = self.tokenizer.tokenize_with_spans(src)
        length = int(host["lengths"][i])
        pred_ids = np.asarray(host["pred_idx"][i]).tolist()[1 : 1 + length]
        pred_tokens = self.tokenizer.convert_ids_to_tokens(pred_ids)
        if len(spans) != length:
            # Span tokenization disagrees with the featurizer (never-split
            # specials in raw text, native-path divergence): fall back to
            # the reference-style width reconstruction.
            pred_txt, _ = self.metric.process_batch_item(host, i)
            return pred_txt.split("\t", 1)[1]
        out = list(src)
        unk = self.tokenizer.unk_token
        for (tok, a, b), pred in zip(spans, pred_tokens):
            if pred == tok or pred == unk or tok == unk:
                # tok == unk: the model never saw the original char (it got
                # the [UNK] embedding), so its output there is not a
                # correction of anything — keep the user's text.
                continue
            piece = pred[2:] if pred.startswith("##") else pred
            if len(piece) == b - a:
                out[a:b] = piece
            # width mismatch (multi-char [UNK] span, accent-stripped word):
            # no faithful per-char mapping exists — keep the original.
        return "".join(out)

    def correct(self, sentences: Sequence[str]) -> List[str]:
        """Any number of sentences, chunked into device batches."""
        out: List[str] = []
        for start in range(0, len(sentences), self.batch_size):
            out.extend(self.correct_batch(
                sentences[start : start + self.batch_size]))
        return out

    @staticmethod
    def edits(src: str, corrected: str) -> List[Tuple[int, str, str]]:
        """1-based (pos, wrong, correct) diffs."""
        return [(i, a, b)
                for i, (a, b) in enumerate(zip(src, corrected), start=1)
                if a != b]

    def correct_with_edits(self, sentences: Sequence[str]) -> List[Dict]:
        corrected = self.correct(sentences)
        return [{"input": s, "corrected": c,
                 "edits": [{"pos": p, "wrong": w, "correct": r}
                           for p, w, r in self.edits(s, c)]}
                for s, c in zip(sentences, corrected)]
