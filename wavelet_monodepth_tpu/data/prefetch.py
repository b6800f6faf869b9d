"""Host->device prefetching: overlap input-pipeline work with device
steps (the TPU-side counterpart of the reference's DataLoader worker
pool, `trainer.py:128-138` — decode parallelism lives in
native_loader/threading; this module hides the transfer latency)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


def to_device(batch_iter: Iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator; keeps `size` batches in flight on
    device. With a NamedSharding, batches land sharded (data-parallel)."""

    q: queue.Queue = queue.Queue(maxsize=size)
    stop = object()
    err: list = []

    def put(batch):
        if sharding is not None:
            # multi-process safe: under jax.distributed each host feeds
            # its local rows and the put assembles one global array
            from ..parallel.mesh import put_global
            return jax.tree_util.tree_map(
                lambda a: put_global(a, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def producer():
        try:
            for batch in batch_iter:
                q.put(put(batch))
        except BaseException as e:      # re-raised in the consumer
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
