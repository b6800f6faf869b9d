"""Parallel host batch loading: the TPU-native counterpart of the
reference's `DataLoader(num_workers=12)` worker pool
(`KITTI/trainer.py:128-139`, `NYUv2/data.py:222-223`).

The reference parallelizes `__getitem__` across fork()ed worker
processes; here a thread pool does the same work — the heavy per-item
ops (JPEG decode, Lanczos resize, jitter) are C-level PIL/cv2 calls
that release the GIL, so threads give real decode parallelism without
pickling batches across process boundaries. Batches are collated in a
background thread into a bounded queue, so item loading for batch N+k
overlaps the device step on batch N (pair with `prefetch.to_device`
to also overlap the host->device transfer).

Determinism (SURVEY §5.2): augmentation randomness is re-keyed per
(seed, epoch, item-index) instead of drawn from the dataset's shared
sequential RNG — worker count and completion order cannot change the
augmentation stream (the torch DataLoader makes the same trade via
per-worker seeding). Datasets opt in by exposing
`item(index, rng: random.Random)`; plain `dataset[index]` is the
fallback (then num_workers must be 0 to keep the shared-RNG stream
race-free).
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def _collate(items: list) -> dict:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _load_item(dataset, index: int, seed: int, epoch: int):
    if hasattr(dataset, "item"):
        # str seeds hash stably (sha512) across processes/versions
        rng = random.Random(f"{seed}/{epoch}/{int(index)}")
        return dataset.item(int(index), rng)
    return dataset[int(index)]


def parallel_batches(dataset, batch_size: int, num_workers: int = 4,
                     shuffle: bool = True, drop_last: bool = True,
                     seed: int = 0, epochs: Optional[int] = None,
                     prefetch_batches: int = 2) -> Iterator[dict]:
    """Yield collated NHWC batches, loading items with `num_workers`
    threads and keeping up to `prefetch_batches` ready batches ahead of
    the consumer. num_workers=0 degrades to synchronous loading (same
    batches: the item order and per-item RNG keys are identical)."""
    if num_workers > 0 and not hasattr(dataset, "item"):
        raise ValueError(
            "parallel loading needs dataset.item(index, rng) — plain "
            "__getitem__ draws from a shared RNG and would race across "
            "workers; pass num_workers=0 for such datasets")
    if drop_last and len(dataset) < batch_size:
        # an epoch would yield ZERO batches and the epochs=None stream
        # would spin forever producing nothing (a too-small val split
        # used to hang the train CLIs here)
        raise ValueError(
            f"dataset has {len(dataset)} items < batch_size={batch_size} "
            f"with drop_last: no batch can ever be yielded")
    order = np.arange(len(dataset))
    rng = np.random.RandomState(seed)

    def index_stream():
        # epochs=None repeats indefinitely (training/val streams); pass
        # epochs=1 for a single deterministic pass (eval loops)
        epoch = 0
        while epochs is None or epoch < epochs:
            if shuffle:
                rng.shuffle(order)
            for start in range(0, len(order), batch_size):
                idx = order[start:start + batch_size]
                if len(idx) < batch_size and drop_last:
                    continue
                yield epoch, idx.copy()
            epoch += 1

    if num_workers <= 0:
        for epoch, idx in index_stream():
            yield _collate([_load_item(dataset, i, seed, epoch)
                            for i in idx])
        return

    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch_batches))
    stop = object()
    err: list = []

    def producer():
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                for epoch, idx in index_stream():
                    items = list(pool.map(
                        lambda i: _load_item(dataset, i, seed, epoch),
                        idx))
                    q.put(_collate(items))
        except BaseException as e:          # surface in the consumer
            err.append(e)
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            if err:
                raise err[0]
            return
        yield item


def stack_batches(batch_iter, k: int):
    """Group consecutive host batches into stacked super-batches
    (leaves [k, B, ...]) for the K-steps-per-dispatch train path
    (`train/kitti.py make_multi_train_step`). Stacking happens on the
    host BEFORE device placement, so one transfer ships K steps of
    input. A trailing group smaller than k is dropped (drop-last
    semantics, mirroring the batch-level truncation above)."""
    import numpy as np
    group = []
    for b in batch_iter:
        group.append(b)
        if len(group) == k:
            yield {key: np.stack([g[key] for g in group])
                   for key in group[0]}
            group = []
