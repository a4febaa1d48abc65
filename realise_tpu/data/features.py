"""Ahead-of-time featurization: examples → fixed-shape arrays.

The reference featurizes on the CPU *inside the training loop*: every step it
pads/truncates (run.py:68-101) and then runs the tokenizer + pypinyin over
every token of the batch (``build_batch``, src/models.py:797-804) — B·S=2048
pypinyin calls per step, its acknowledged input bottleneck (the experimental
thread-prefetch runner run_speedup.py:64-122 exists to hide it).

The TPU design removes the work instead of hiding it: pinyin features depend
only on the *token id*, so we precompute one (V, P) pinyin-id table + (V,)
length table per vocabulary, and per-batch featurization is a numpy gather —
``pho_idx = table[src_idx]`` — exactly equal to the reference's per-token
conversion, at O(1) python cost. Example → array layout matches the reference
batch contract (run.py:68-101):

    src_idx/tgt_idx  (B, S) int32, zero-padded
    masks            (B, S) int32, 1 on [CLS]+sentence+[SEP]
    loss_masks       (B, S) int32, 1 on sentence positions 1..length
    pho_idx          (B, S, P) int32   (pho2 models)
    pho_lens         (B, S) int32
    pho1_idx         (B, S, 3) int32   (pho1 models)

plus passthrough python fields (id, src, tgt, tokens_size, lengths) used by
the metric writer.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from realise_tpu.config import RealiseConfig
from realise_tpu.text.pinyin import Pinyin1Convertor, Pinyin2Convertor
from realise_tpu.text.tokenizer import WordPieceTokenizer


def make_example(sid: str, src: str, tgt: str, tokenizer: WordPieceTokenizer) -> Dict:
    """Build one dataset example in the reference pkl schema
    (process_data.py:33-36: len(src_idx)==len(tgt_idx)==lengths+2,
    lengths==len(tokens_size))."""
    src_tokens = tokenizer.tokenize(src)
    tgt_tokens = tokenizer.tokenize(tgt)
    # CSC is char-aligned; enforce equal token counts.
    if len(src_tokens) != len(tgt_tokens):
        raise ValueError(
            f"source/target token mismatch for {sid}: "
            f"{len(src_tokens)} vs {len(tgt_tokens)}")
    tokens_size = []
    for t in src_tokens:
        if t == tokenizer.unk_token:
            tokens_size.append(1)
        elif t.startswith("##"):
            tokens_size.append(len(t) - 2)
        else:
            tokens_size.append(len(t))
    src_idx = tokenizer.convert_tokens_to_ids(
        [tokenizer.cls_token] + src_tokens + [tokenizer.sep_token])
    tgt_idx = tokenizer.convert_tokens_to_ids(
        [tokenizer.cls_token] + tgt_tokens + [tokenizer.sep_token])
    return {
        "id": sid,
        "src": src,
        "tgt": tgt,
        "tokens_size": tokens_size,
        "src_idx": src_idx,
        "tgt_idx": tgt_idx,
        "lengths": len(src_tokens),
    }


class Featurizer:
    """Vocab-level pinyin tables + batch assembly."""

    def __init__(self, tokenizer: WordPieceTokenizer, cfg: RealiseConfig):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self._pho2_table: Optional[np.ndarray] = None
        self._pho2_lens: Optional[np.ndarray] = None
        self._pho1_table: Optional[np.ndarray] = None

    # ---- vocab tables -----------------------------------------------------
    def pho2_tables(self):
        """(V, P) pinyin char ids + (V,) lens for every vocab token."""
        if self._pho2_table is None:
            conv = Pinyin2Convertor(max_len=self.cfg.pho2_max_len)
            vocab = self.tokenizer.convert_ids_to_tokens(
                range(len(self.tokenizer)))
            self._pho2_table, self._pho2_lens = conv.convert(vocab)
        return self._pho2_table, self._pho2_lens

    def pho1_table(self):
        """(V, 3) initial/final/tone ids for every vocab token."""
        if self._pho1_table is None:
            conv = Pinyin1Convertor()
            vocab = self.tokenizer.convert_ids_to_tokens(
                range(len(self.tokenizer)))
            self._pho1_table = np.asarray(conv.convert(vocab), dtype=np.int32)
        return self._pho1_table

    # ---- batch assembly ---------------------------------------------------
    def featurize(self, examples: Sequence[Dict],
                  with_labels: bool = True,
                  seq_len: Optional[int] = None,
                  with_pho: bool = True) -> Dict:
        """Examples → fixed-shape arrays + passthrough fields.

        ``seq_len`` overrides the padded length (length-bucketed batching:
        a handful of tile-friendly shapes instead of always padding to the
        global max — the static-shape counterpart of the reference's
        sort-by-length batching, data_process/dataset.py:106-175).

        ``with_pho=False`` skips the (B, S, P) phonetic table gathers —
        for host-side metric bookkeeping copies that never feed the model
        (multi-host evaluate featurizes the device slice separately)."""
        cfg = self.cfg
        s = seq_len or cfg.max_seq_length
        b = len(examples)
        src_idx = np.zeros((b, s), dtype=np.int32)
        tgt_idx = np.zeros((b, s), dtype=np.int32)
        masks = np.zeros((b, s), dtype=np.int32)
        loss_masks = np.zeros((b, s), dtype=np.int32)

        for i, ex in enumerate(examples):
            seq = ex["src_idx"]
            tseq = ex["tgt_idx"]
            if len(seq) > s:
                # Truncate BERT-style: keep [CLS] + s-2 content + [SEP]
                # (the trailing id of the untruncated sequence IS the SEP).
                # Matches the native featurizer's layout exactly.
                seq = list(seq[: s - 1]) + [seq[-1]]
                tseq = list(tseq[: s - 1]) + [tseq[-1]]
            src_idx[i, : len(seq)] = seq
            masks[i, : len(seq)] = 1
            tgt_idx[i, : len(tseq)] = tseq
            # loss positions 1..length (excl [CLS]/[SEP], run.py:87-92);
            # capped at s-2 content positions when truncated.
            upper = min(1 + ex["lengths"], s - 1)
            loss_masks[i, 1:upper] = 1

        batch = {
            "id": [ex["id"] for ex in examples],
            "src": [ex["src"] for ex in examples],
            "tgt": [ex["tgt"] for ex in examples],
            "tokens_size": [ex["tokens_size"] for ex in examples],
            "lengths": np.asarray([ex["lengths"] for ex in examples], np.int32),
            "src_idx": src_idx,
            "masks": masks,
            "loss_masks": loss_masks,
        }
        if with_labels:
            batch["tgt_idx"] = tgt_idx

        if not with_pho:
            return batch
        if cfg.pho_encoder == "pho2":
            table, lens = self.pho2_tables()
            batch["pho_idx"] = table[src_idx]        # (B, S, P) gather
            batch["pho_lens"] = lens[src_idx]        # (B, S)
        elif cfg.pho_encoder == "pho1":
            batch["pho1_idx"] = self.pho1_table()[src_idx]  # (B, S, 3)
        return batch

    def featurize_raw(self, sentences: Sequence[str],
                      native=None,
                      seq_len: Optional[int] = None) -> Dict:
        """Raw sentences → the same host-batch contract as :meth:`featurize`.

        ``native``: an optional :class:`realise_tpu.data.native.NativeFeaturizer`
        — the C++ tokenizer then does tokenization + batch assembly in one
        call (the per-step Python cost of the reference, run.py:68-101) and
        only the pinyin table gather stays in numpy. Without it the Python
        tokenizer path via :func:`make_example` is used. Both produce
        identical arrays (tests/test_native.py parity).
        """
        cfg = self.cfg
        s = seq_len or cfg.max_seq_length
        if native is not None:
            enc = native.encode_batch(list(sentences), max_len=s)
            lengths = enc["lengths"]

            def _sizes(i: int):
                # Per-example python list, full token count — the contract
                # make_example documents (lengths == len(tokens_size)).
                # The (B, S) transport array holds at most S entries, so a
                # TRUNCATED sentence (lengths > s-2) re-derives its full
                # widths through the Python tokenizer (rare slow path; the
                # ids arrays stay the native ones — identical by the
                # native/Python parity contract).
                n_tok = int(lengths[i])
                if n_tok <= s - 2:
                    return enc["tokens_size"][i][:n_tok].tolist()
                return make_example(str(i), sentences[i], sentences[i],
                                    self.tokenizer)["tokens_size"]

            batch = {
                "id": [str(i) for i in range(len(sentences))],
                "src": list(sentences),
                "tgt": list(sentences),
                "tokens_size": [_sizes(i) for i in range(len(sentences))],
                "lengths": lengths,
                "src_idx": enc["src_idx"],
                "masks": enc["masks"],
                "loss_masks": enc["loss_masks"],
            }
            if cfg.pho_encoder == "pho2":
                table, lens = self.pho2_tables()
                batch["pho_idx"] = table[batch["src_idx"]]
                batch["pho_lens"] = lens[batch["src_idx"]]
            elif cfg.pho_encoder == "pho1":
                batch["pho1_idx"] = self.pho1_table()[batch["src_idx"]]
        else:
            examples = [make_example(str(i), t, t, self.tokenizer)
                        for i, t in enumerate(sentences)]
            batch = self.featurize(examples, with_labels=False, seq_len=s)
        return batch

    def cjk_token_mask(self) -> np.ndarray:
        """(V,) bool: vocab tokens that are single Chinese chars. Memoized —
        the pho-pretrain loader needs it per batch and the O(V) Python pass
        would otherwise sit on the input-pipeline critical path."""
        if getattr(self, "_cjk_mask", None) is None:
            from realise_tpu.text.tokenizer import is_chinese_char

            vocab = self.tokenizer.convert_ids_to_tokens(
                range(len(self.tokenizer)))
            self._cjk_mask = np.asarray(
                [len(t) == 1 and is_chinese_char(ord(t)) for t in vocab],
                bool)
        return self._cjk_mask

    def featurize_pho_pretrain(self, examples: Sequence[Dict]) -> Dict:
        """Phonetic-pretrain features: the model must recover each char from
        its pinyin alone, so inputs are the *target* ids and the loss covers
        Chinese-char positions only (reference: run_pretrain.py:56-69,
        src/models.py:1318-1347)."""
        # with_pho=False: the pho tables are regathered below from the new
        # src_idx (= tgt_idx); gathering them from the original src first
        # would be thrown away.
        batch = self.featurize(examples, with_labels=True, with_pho=False)
        batch["src_idx"] = batch["tgt_idx"].copy()
        cjk = self.cjk_token_mask()
        batch["loss_masks"] = (
            batch["loss_masks"].astype(bool) & cjk[batch["tgt_idx"]]
        ).astype(np.int32)
        if self.cfg.pho_encoder == "pho2":
            table, lens = self.pho2_tables()
            batch["pho_idx"] = table[batch["src_idx"]]
            batch["pho_lens"] = lens[batch["src_idx"]]
        return batch

    def device_batch(self, batch: Dict) -> Dict[str, np.ndarray]:
        """Strip host-only fields; what remains goes to the device."""
        keep = {"src_idx", "tgt_idx", "masks", "loss_masks",
                "pho_idx", "pho_lens", "pho1_idx", "char_idx"}
        return {k: v for k, v in batch.items() if k in keep}
