"""Dataset IO, batching and host→device prefetch.

The runtime dataset format is the reference's flat pickle: a list of
per-example dicts ``{id, src, tgt, tokens_size, src_idx, tgt_idx, lengths}``
(reference: process_data.py:38-45; consumed by run.py:63-66). We read and
write that format unchanged so existing ReaLiSe data drops in.

Sharding for data parallelism slices each *batch* across processes instead of
the reference's strided whole-dataset shard that silently drops the tail
``len % world_size`` examples (run.py:128-137 — a bug we don't replicate;
short final batches are padded to full shape instead).
"""

from __future__ import annotations

import pickle
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def load_pkl_dataset(path: str) -> List[Dict]:
    with open(path, "rb") as f:
        data = pickle.load(f)
    if not isinstance(data, list):
        raise ValueError(f"{path}: expected a list of example dicts")
    for ex in data:
        # The reference's own format invariants (process_data.py:33-36),
        # enforced over the WHOLE file (a bad tail example would otherwise
        # surface as an opaque shape error deep inside featurize) and with
        # real exceptions (assert vanishes under python -O).
        if not (len(ex["src_idx"]) == len(ex["tgt_idx"])
                == ex["lengths"] + 2) or ex["lengths"] != len(ex["tokens_size"]):
            raise ValueError(
                f"{path}: malformed example {ex.get('id')!r} — "
                f"len(src_idx)={len(ex['src_idx'])}, "
                f"len(tgt_idx)={len(ex['tgt_idx'])}, lengths={ex['lengths']}, "
                f"len(tokens_size)={len(ex['tokens_size'])}")
    return data


def save_pkl_dataset(data: List[Dict], path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(data, f)


def pad_examples(examples: List[Dict], batch_size: int) -> List[Dict]:
    """Repeat the last example to fill a short batch (static shapes for jit);
    callers use ``lengths``/ids of the first len(examples) rows only."""
    out = list(examples)
    while len(out) < batch_size:
        out.append(examples[-1])
    return out


def batch_iterator(
    dataset: Sequence[Dict],
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
    pad_final: bool = True,
) -> Iterator[List[Dict]]:
    order = list(range(len(dataset)))
    if shuffle:
        random.Random(seed).shuffle(order)
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if len(idx) < batch_size:
            if drop_remainder:
                return
            batch = [dataset[j] for j in idx]
            if pad_final:
                batch = pad_examples(batch, batch_size)
            yield batch
        else:
            yield [dataset[j] for j in idx]


def bucketed_batch_iterator(
    dataset: Sequence[Dict],
    batch_size: int,
    buckets: Sequence[int] = (32, 64, 128),
    shuffle: bool = False,
    seed: int = 0,
    pad_final: bool = True,
) -> Iterator[Tuple[int, List[Dict]]]:
    """Yield (bucket_seq_len, examples) with each batch padded only to its
    bucket's length.

    A handful of static shapes (one jit variant per bucket) instead of
    always padding to max_seq_length — the XLA-friendly equivalent of the
    reference's sort-by-length + fixed-size batch sampler
    (data_process/dataset.py:106-175). Buckets are on ``len(src_idx)``
    (sentence + [CLS]/[SEP]); examples longer than the largest bucket go to
    the largest (and truncate there).
    """
    buckets = sorted(buckets)
    binned: Dict[int, List[int]] = {b: [] for b in buckets}
    for i, ex in enumerate(dataset):
        n = len(ex["src_idx"])
        for b in buckets:
            if n <= b:
                binned[b].append(i)
                break
        else:
            binned[buckets[-1]].append(i)

    rng = random.Random(seed)
    order: List[Tuple[int, List[int]]] = []
    for b, idxs in binned.items():
        if shuffle:
            rng.shuffle(idxs)
        for i in range(0, len(idxs), batch_size):
            order.append((b, idxs[i : i + batch_size]))
    if shuffle:
        rng.shuffle(order)

    for b, idx in order:
        batch = [dataset[j] for j in idx]
        if len(batch) < batch_size and pad_final:
            batch = pad_examples(batch, batch_size)
        yield b, batch


# --------------------------------------------------------------------------
def synthetic_dataset(
    tokenizer,
    num_examples: int = 64,
    min_len: int = 4,
    max_len: int = 12,
    error_rate: float = 0.15,
    seed: int = 0,
    char_dist: str = "uniform",
) -> List[Dict]:
    """Generate a synthetic CSC dataset from the tokenizer's CJK vocab.

    Targets are random CJK sentences; sources corrupt ~error_rate of the
    positions with a different random CJK char — the same supervision shape
    as SIGHAN without the corpus. Used by tests, smoke CLIs and the bench.

    ``char_dist``: ``"uniform"`` draws every CJK char equally — the WORST
    case for the batch-unique conv factorization (a large batch touches
    most of the glyph table). ``"zipf"`` draws chars with the rank-frequency
    law real Chinese text follows (p(rank r) ∝ 1/(r+2.7)^1.05 — the
    Zipf-Mandelbrot fit for modern Chinese corpora, where a 30k-char batch
    covers ~2-4k distinct characters, not ~11k): the realistic workload for
    training benchmarks.
    """
    from realise_tpu.data.features import make_example
    from realise_tpu.text.tokenizer import is_chinese_char

    rng = random.Random(seed)
    cjk = [t for t in tokenizer.vocab
           if len(t) == 1 and is_chinese_char(ord(t))]
    if len(cjk) < 8:
        raise ValueError("tokenizer vocab has too few CJK chars")
    if char_dist == "zipf":
        # Frequency rank is independent of vocab order: shuffle so rank 0
        # isn't always the same codepoint across seeds.
        rng.shuffle(cjk)
        ranks = np.arange(len(cjk), dtype=np.float64)
        p = 1.0 / np.power(ranks + 2.7, 1.05)
        p /= p.sum()
        npr = np.random.RandomState(seed + 1)
        cdf = np.cumsum(p)
        buf: List[int] = []

        def pick(_cjk=cjk, _buf=buf):
            if not _buf:
                # Inverse-CDF in bulk: np.random.choice(p=...) rebuilds the
                # cumsum per call, O(V) per draw. Clamp: fp normalization
                # can leave cdf[-1] a ulp under 1.0, and a draw landing in
                # that sliver would index past the end.
                idx = np.searchsorted(cdf, npr.random_sample(4096))
                _buf.extend(np.minimum(idx, len(_cjk) - 1).tolist())
            return _cjk[_buf.pop()]
    elif char_dist == "uniform":
        # NOTE: keep this branch's random-stream consumption EXACTLY as it
        # always was (rng.choice inside the loop) — seeded synthetic data
        # is pinned by golden/convergence tests.
        pick = lambda: rng.choice(cjk)
    else:
        raise ValueError(f"unknown char_dist {char_dist!r}")
    data = []
    for n in range(num_examples):
        length = rng.randint(min_len, max_len)
        tgt = [pick() for _ in range(length)]
        src = list(tgt)
        for i in range(length):
            if rng.random() < error_rate:
                src[i] = pick()
        data.append(make_example(f"{10000 + n}", "".join(src), "".join(tgt),
                                 tokenizer))
    return data


def synthetic_confusion_dataset(
    tokenizer,
    num_examples: int = 512,
    min_len: int = 4,
    max_len: int = 12,
    error_rate: float = 0.3,
    seed: int = 0,
) -> List[Dict]:
    """Synthetic CSC data with a LEARNABLE error distribution.

    :func:`synthetic_dataset` corrupts with uniformly random chars — noise no
    model can invert, so held-out correction F1 is bounded near zero there.
    Here the CJK vocab is split into disjoint "content" and "error" halves
    and corruption applies a FIXED injective confusion map content→error:
    an error char in the source always decodes to the same content char, so
    a model that learns the mapping (and that content chars pass through)
    reaches high held-out F1. This is the accuracy-parity stand-in while the
    real SIGHAN corpora are unavailable in CI (confusion-set corruption is
    also how CSC errors behave: visually/phonetically confusable pairs).
    """
    from realise_tpu.data.features import make_example
    from realise_tpu.text.tokenizer import is_chinese_char

    rng = random.Random(seed)
    cjk = sorted(t for t in tokenizer.vocab
                 if len(t) == 1 and is_chinese_char(ord(t)))
    if len(cjk) < 16:
        raise ValueError("tokenizer vocab has too few CJK chars")
    half = len(cjk) // 2
    content, errors = cjk[:half], cjk[half : 2 * half]
    confusion = dict(zip(content, errors))  # fixed, injective

    data = []
    for n in range(num_examples):
        length = rng.randint(min_len, max_len)
        tgt = [rng.choice(content) for _ in range(length)]
        src = [confusion[c] if rng.random() < error_rate else c for c in tgt]
        data.append(make_example(f"{20000 + n}", "".join(src), "".join(tgt),
                                 tokenizer))
    return data


def dataset_labels(dataset: Sequence[Dict]) -> List[str]:
    """Gold label lines (``id, pos, char, ...``) from src/tgt texts —
    the build_lbl.py equivalent (data_process/build_lbl.py)."""
    lines = []
    for ex in dataset:
        edits = []
        for i, (a, b) in enumerate(zip(ex["src"], ex["tgt"]), start=1):
            if a != b:
                edits.append(f"{i}, {b}")
        if edits:
            lines.append(f"{ex['id']}, " + ", ".join(edits))
        else:
            lines.append(f"{ex['id']}, 0")
    return lines


def threaded_prefetch(iterator, size: int = 2):
    """Run ``iterator`` in a background thread with a bounded queue.

    Overlaps host-side featurization with device compute — the corrected
    TPU equivalent of the reference's DataProcessor thread
    (run_speedup.py:64-122): a sentinel ends iteration instead of the
    ``queue.empty()`` race (run_speedup.py:190), and exceptions propagate.
    """
    import queue as queue_mod
    import threading

    q: "queue_mod.Queue" = queue_mod.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()

    class _Raise:
        """Out-of-band error wrapper: a plain ('__error__', e) tuple could
        collide with a legitimate 2-tuple item from a generic iterator."""

        def __init__(self, exc):
            self.exc = exc

    def put_with_stop(item) -> bool:
        """Bounded put that gives up when the consumer is gone — an
        abandoned consumer (trainer hit max_steps mid-epoch, generator
        closed) must release the thread instead of pinning buffered
        batches + the live generator for the process lifetime. The
        sentinel/error puts go through here too: an unbounded q.put on a
        full queue with no consumer would block forever."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue_mod.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not put_with_stop(item):
                    return
        except BaseException as e:  # propagate into the consumer
            put_with_stop(_Raise(e))
        finally:
            put_with_stop(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, _Raise):
                raise item.exc
            yield item
    finally:
        stop.set()


def prefetch_to_device(iterator, size: int = 2, put_fn=None):
    """Double-buffered host→device transfer: keep ``size`` batches in flight.

    The TPU-native replacement for the reference's thread+CUDA-stream
    prefetcher (run_speedup.py:64-122) — jax transfers are already async, so
    a simple lookahead queue suffices (and has no queue.empty() race,
    run_speedup.py:190). ``put_fn`` maps a host batch to device arrays
    (default ``jax.device_put``); the Trainer passes its sharding-aware
    ``_put_batch`` so batches land pre-sharded. Used by ``Trainer.fit``.
    """
    import collections

    import jax

    put = put_fn or jax.device_put
    queue = collections.deque()
    it = iter(iterator)

    def enqueue(n):
        for _ in range(n):
            try:
                host = next(it)
            except StopIteration:
                return
            queue.append(put(host))

    enqueue(size)
    while queue:
        item = queue.popleft()
        enqueue(1)
        yield item
