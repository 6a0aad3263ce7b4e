"""Host-side batch loader with threaded prefetch.

Replaces the reference's torch DataLoader (n_data_workers=20,
config/behavior_net.yaml:19) for feeding the TPU: a thread pool maps
``dataset[idx]`` over the batch (cv2/numpy release the GIL for the heavy
ops), collates to stacked numpy arrays, and keeps ``prefetch`` batches in
flight so host IO overlaps device compute.  The C++ native pipeline under
native/ accelerates decode/warp inside ``__getitem__`` itself.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterable, Iterator

import numpy as np


def collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = np.asarray(vals[0])
        out[key] = np.stack([np.asarray(v) for v in vals]) \
            if first.ndim > 0 else np.asarray(vals)
    return out


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

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for batch_ids in self.batch_sampler:
                        items = list(pool.map(self.dataset.__getitem__,
                                              batch_ids))
                        q.put(collate(items))
                finally:
                    q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
