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

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


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
            self.native = NativeFeaturizer(vocab_path)

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

        import threading

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
        # one jit specialization per (batch_bucket, seq_bucket).
        self._batch_buckets = sorted(
            {b for b in (1, 8) if b < batch_size} | {batch_size})

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
        """Trigger the jit compile so the first request is fast."""
        if all_buckets:
            for b in self._buckets:
                for n in self._batch_buckets:
                    self.correct_batch(["好" * min(b - 2, 4)] * n, seq_len=b)
        else:
            self.correct(["好"])

    def correct_batch(self, sentences: Sequence[str],
                      seq_len: Optional[int] = None) -> List[str]:
        """One device batch (≤ batch_size sentences) → corrected strings.

        The device sees one static shape per (batch, length) bucket pair:
        requests are padded (repeating the last sentence) to the smallest
        batch bucket that fits, so the jit never re-specializes on the
        request size and one sentence never pays for batch_size rows."""
        n = len(sentences)
        if n == 0:
            return []
        rows = self._batch_bucket_for(n)
        padded = list(sentences) + [sentences[-1]] * (rows - n)
        host = self.featurizer.featurize_raw(
            padded, native=self.native,
            seq_len=seq_len or self._bucket_for(sentences))
        # One jitted program over static shapes: serialize the device call
        # so concurrent HTTP request threads interleave featurization and
        # splicing but never the accelerator step.
        with self._device_lock:
            preds = np.asarray(self._step(
                self.params, self.state, self.featurizer.device_batch(host)))
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
