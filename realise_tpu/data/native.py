"""ctypes binding for the native C++ batch featurizer (csrc/featurizer.cpp).

Loads ``build/librealise_featurizer.so``, compiling it on first use when a
toolchain is available. Falls back cleanly: callers check
:func:`native_available` and use the pure-Python featurizer otherwise.

The native path covers tokenization + batch assembly (the reference's
per-step Python cost, src/run.py:68-101); pinyin features remain a numpy
table gather (realise_tpu.data.features) on top of the returned ids.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "build", "librealise_featurizer.so")
_SRC_DIR = os.path.join(_REPO_ROOT, "csrc")

_lib = None


def _build_library() -> bool:
    if not os.path.isdir(_SRC_DIR):
        return False
    try:
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rtf_create.restype = ctypes.c_void_p
    lib.rtf_create.argtypes = [ctypes.c_char_p]
    lib.rtf_create_ex.restype = ctypes.c_void_p
    lib.rtf_create_ex.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.rtf_destroy.argtypes = [ctypes.c_void_p]
    lib.rtf_vocab_size.restype = ctypes.c_int
    lib.rtf_vocab_size.argtypes = [ctypes.c_void_p]
    lib.rtf_encode_batch.restype = ctypes.c_int
    lib.rtf_encode_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _normalize(s: str, lower: bool = True) -> bytes:
    """Pre-normalize for the C++ tokenizer so its ids match the Python path
    beyond ASCII/CJK: the Python BasicTokenizer lowercases and NFD-strips
    accents per word (tokenizer.py:84-85) and drops every category-C
    char (tokenizer.py _is_control: Cc/Cf/Co/Cn — bidi marks, ZWJ, soft
    hyphen, BOM...); the C++ side only lowercases ASCII/Latin-1 and has
    no Unicode tables, and — critically — reads the bytes with strlen, so
    an embedded NUL (category Cc) would silently truncate the sentence.
    Lowercase + accent-strip commute with the (case/accent-invariant)
    splitting, so applying them to the whole string first is equivalent.
    Lone surrogates (Cs, hostile JSON) cannot be UTF-8 encoded at all and
    drop with the rest of category C; \\t\\n\\r stay — they are whitespace
    to both tokenizers."""
    import unicodedata

    if lower:
        # Accent-stripping is gated on do_lower_case in the Python
        # tokenizer too (tokenize(): lower + _strip_accents together).
        s = unicodedata.normalize("NFD", s.lower())
        s = "".join(ch for ch in s if unicodedata.category(ch) != "Mn")
    s = "".join(ch for ch in s
                if ch in "\t\n\r"
                or not unicodedata.category(ch).startswith("C"))
    return s.encode("utf-8")


class NativeFeaturizer:
    """Batch-encode raw sentences with the C++ tokenizer.

    Produces the same ``src_idx/masks/loss_masks/lengths/tokens_size``
    contract as the Python featurizer (run.py:68-101 semantics).
    """

    def __init__(self, vocab_path: str, do_lower_case: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native featurizer unavailable (build/librealise_featurizer.so "
                "missing and `make -C csrc` failed)")
        self._lib = lib
        self._lower = do_lower_case
        self._handle = lib.rtf_create_ex(vocab_path.encode("utf-8"),
                                         1 if do_lower_case else 0)
        if not self._handle:
            raise RuntimeError(
                f"failed to load vocab from {vocab_path} (missing file or "
                f"missing [UNK]/[CLS]/[SEP] specials)")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.rtf_destroy(self._handle)
            self._handle = None

    @property
    def vocab_size(self) -> int:
        return self._lib.rtf_vocab_size(self._handle)

    def encode_batch(self, sentences: Sequence[str], max_len: int) -> Dict[str, np.ndarray]:
        n = len(sentences)
        arr = (ctypes.c_char_p * n)(
            *[_normalize(s, lower=self._lower) for s in sentences])
        src_idx = np.zeros((n, max_len), np.int32)
        masks = np.zeros((n, max_len), np.int32)
        loss_masks = np.zeros((n, max_len), np.int32)
        lengths = np.zeros((n,), np.int32)
        tokens_size = np.zeros((n, max_len), np.int32)

        def ptr(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        rc = self._lib.rtf_encode_batch(
            self._handle, arr, n, max_len,
            ptr(src_idx), ptr(masks), ptr(loss_masks), ptr(lengths),
            ptr(tokens_size))
        if rc != 0:
            raise RuntimeError(f"rtf_encode_batch failed with {rc}")
        return {
            "src_idx": src_idx,
            "masks": masks,
            "loss_masks": loss_masks,
            "lengths": lengths,
            "tokens_size": tokens_size,
        }
