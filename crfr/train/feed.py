"""Double-buffered host→device feeding for train loops.

On a TPU host (and especially over this sandbox's remote-device tunnel),
``jax.device_put`` of a ~10 MB uint8 batch blocks the Python thread for the
transfer; issued inline it serializes H2D with the device step and was
measured to cost ~58% of `crfr train`'s throughput (fit 1.3k vs step-only
3.1k imgs/s, r2). ``device_feed`` moves the puts to a worker thread and
keeps ``depth`` batches in flight so the transfer of batch i+1 overlaps the
compute of batch i.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import jax
import numpy as np

from crfr.parallel.mesh import batch_sharding, host_put, host_put_local


def device_feed(batches: Iterable, mesh, depth: int = 2,
                local: bool = False) -> Iterator:
    """(images, labels) host batches → same tuples as device arrays, with
    up to ``depth`` H2D transfers running ahead of the consumer.

    labels may be None (SR training). Already-on-device inputs pass
    through unchanged (device_put is a no-op then). ``local=True`` switches
    to the multi-host data-parallel input convention (host_put_local): each
    process feeds its OWN (batch/P)-row slab and the global batch is the
    concatenation across processes.
    """
    bs = batch_sharding(mesh, 4)
    ls = batch_sharding(mesh, 1)
    putter = host_put_local if local else host_put

    def put(b):
        images, labels = b
        di = putter(np.asarray(images), bs)
        dl = (None if labels is None
              else putter(np.asarray(labels, np.int32), ls))
        return di, dl

    it = iter(batches)
    with ThreadPoolExecutor(1) as ex:
        q: deque = deque()
        for _ in range(max(depth, 1)):
            try:
                q.append(ex.submit(put, next(it)))
            except StopIteration:
                break
        while q:
            out = q.popleft().result()
            try:
                q.append(ex.submit(put, next(it)))
            except StopIteration:
                pass
            yield out


class ResumableDeviceFeed:
    """device_feed over a ResumableBatches source that keeps EXACT-resume
    semantics despite prefetch: ``state`` always returns the grain iterator
    state as of the last batch the CONSUMER received (not the batches drawn
    ahead), so checkpointing `feed.state` instead of `batches.get_state()`
    resumes without skipping the in-flight prefetched batches."""

    def __init__(self, batches, mesh, depth: int = 2, local: bool = False):
        self._batches = batches
        self._it = iter(batches)
        self._ex = ThreadPoolExecutor(1)
        self._q: deque = deque()
        self._bs = batch_sharding(mesh, 4)
        self._ls = batch_sharding(mesh, 1)
        self._putter = host_put_local if local else host_put
        self.state = batches.get_state()
        for _ in range(max(depth, 1)):
            self._prefetch()

    def _put(self, b):
        images, labels = b
        return (self._putter(np.asarray(images), self._bs),
                None if labels is None
                else self._putter(np.asarray(labels, np.int32), self._ls))

    def _prefetch(self):
        try:
            b = next(self._it)
        except StopIteration:
            return
        st = self._batches.get_state()        # state AFTER drawing b
        self._q.append((self._ex.submit(self._put, b), st))

    def __iter__(self):
        return self

    def __next__(self):
        if not self._q:
            self._ex.shutdown(wait=False)
            raise StopIteration
        fut, st = self._q.popleft()
        self._prefetch()
        out = fut.result()
        self.state = st                       # resume point = after THIS batch
        return out
