"""Host-side batch loader with threaded prefetch.

Replaces the reference's torch DataLoader (n_data_workers=20,
config/behavior_net.yaml:19) for feeding the TPU: a thread pool maps
``dataset[idx]`` over the batch (cv2/numpy release the GIL for the heavy
ops), collates to stacked numpy arrays, and keeps ``prefetch`` batches in
flight so host IO overlaps device compute.  The C++ native pipeline under
native/ accelerates decode/warp inside ``__getitem__`` itself.

``prefetch_iter`` additionally overlaps the host->device stage: it runs a
``prepare`` callable (numpy conversion + ``device_put``/sharding) up to n
batches ahead on a background thread, so the H2D transfer of batch k+1
rides under the device compute of batch k.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np

_SENTINEL = object()


def collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = np.asarray(vals[0])
        out[key] = np.stack([np.asarray(v) for v in vals]) \
            if first.ndim > 0 else np.asarray(vals)
    return out


def _put_until_stopped(q: "queue.Queue", item, stop: threading.Event
                       ) -> bool:
    """q.put that gives up when the consumer abandoned the iterator."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False


def prefetch_iter(iterator: Iterable, prepare: Optional[Callable] = None,
                  n: int = 2) -> Iterator:
    """Yield ``prepare(item)`` for each item, computed up to n ahead on a
    background thread.

    ``prepare`` typically does the host->device placement (device_put /
    mesh sharding), so the transfer of the next batch overlaps the device
    compute on the current one.  jax.device_put is thread-safe.  Safe to
    abandon mid-iteration (``break``): the producer exits via a stop flag
    instead of blocking forever on a full queue.  Exceptions in the
    producer re-raise at the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, n))
    stop = threading.Event()
    err = []

    def produce():
        try:
            for item in iterator:
                item = prepare(item) if prepare is not None else item
                if not _put_until_stopped(q, item, stop):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised below
            err.append(e)
        finally:
            _put_until_stopped(q, _SENTINEL, stop)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        if err:
            raise err[0]
        t.join()
    finally:
        stop.set()


class Loader:
    def __init__(self, dataset, batch_sampler: Iterable,
                 num_workers: int = 8, prefetch: int = 2):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers == 1:
            for batch_ids in self.batch_sampler:
                yield collate([self.dataset[i] for i in batch_ids])
            return

        def batches():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for batch_ids in self.batch_sampler:
                    yield collate(list(pool.map(self.dataset.__getitem__,
                                                batch_ids)))

        # prefetch_iter's stop flag also makes abandoning an epoch
        # mid-iteration safe (the producer thread exits instead of
        # blocking on a full queue — iteration-capped training loops
        # break out of epochs routinely)
        yield from prefetch_iter(batches(), n=self.prefetch)
