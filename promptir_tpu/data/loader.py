"""Host-side batch loader with background prefetch into device HBM.

Replaces the reference's `DataLoader(num_workers=16, pin_memory=True)`
(/root/reference/train.py:336-337) with a thread-pooled decode/augment
pipeline that double-buffers batches onto the device (optionally sharded
over a data-parallel mesh axis via `jax.device_put` + NamedSharding), so
the TPU never waits on the host.

Determinism: sample order and every augmentation/noise draw derive from
(seed, epoch, index) — reproducible by construction, unlike the
reference's global-`random` pipeline.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np


class TrainLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.sharding = sharding

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Yield batches {de_type, degraded, clean} for one epoch."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        nb = len(self)

        def make_batch(b: int) -> dict:
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            de, deg, cln = [], [], []
            for i in idxs:
                rng = np.random.default_rng((self.seed, epoch, int(i)))
                d, x, y = self.dataset.get(int(i), rng)
                de.append(d)
                deg.append(x)
                cln.append(y)
            batch = {
                "de_type": np.asarray(de, np.int32),
                "degraded": np.stack(deg),
                "clean": np.stack(cln),
            }
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            return batch

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(make_batch, b) for b in range(nb)]
                for f in futures:
                    if stop.is_set():
                        return
                    q.put(f.result())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def eval_batches(dataset, sharding=None) -> Iterator[tuple]:
    """Per-image eval iterator (batch 1, reference semantics)."""
    for i in range(len(dataset)):
        name, degraded, clean = dataset.get(i)
        deg = degraded[None]
        cln = clean[None]
        if sharding is not None:
            deg = jax.device_put(deg, sharding)
            cln = jax.device_put(cln, sharding)
        yield name, deg, cln
