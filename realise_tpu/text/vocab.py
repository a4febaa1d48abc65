"""Vocabulary helpers.

The production vocabulary is the 21128-token BERT-Chinese ``vocab.txt``
(reference: hfl/chinese-roberta-wwm-ext; loaded at src/run.py:426-428 and for
glyphs at src/models.py:704-706). When that asset is not on disk we can build
a structurally equivalent synthetic vocabulary — specials first, then ASCII,
then the CJK chars the pinyin table knows — for tests and smoke runs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

SPECIAL_TOKENS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def build_synthetic_vocab(size: Optional[int] = None) -> List[str]:
    """Deterministic BERT-style vocab: specials, unused slots, ASCII, CJK.

    Mirrors the real vocab's shape: [PAD]=0, [UNK]=100-ish region is not
    replicated — ids are compact instead — but the *kinds* of entries (and the
    properties the featurizers rely on: single CJK chars dominate, '##'
    continuations exist) are preserved.
    """
    from realise_tpu.text.pinyin import _builtin_table

    vocab: List[str] = list(SPECIAL_TOKENS)
    vocab += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    vocab += [chr(c) for c in range(ord("0"), ord("9") + 1)]
    vocab += list("，。！？、；：""''（）《》")
    cjk = sorted(_builtin_table().keys())
    vocab += cjk
    vocab += ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    # A handful of multi-char word pieces so tokens_size>1 paths get exercised.
    vocab += ["hello", "world", "##ing", "##ed"]
    # Deduplicate preserving order.
    seen = set()
    uniq = []
    for t in vocab:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    if size is not None:
        if size < len(uniq):
            uniq = uniq[:size]
        else:
            uniq += [f"[unused{i}]" for i in range(size - len(uniq))]
    return uniq


def vocab_to_dict(vocab: List[str]) -> Dict[str, int]:
    return {t: i for i, t in enumerate(vocab)}
