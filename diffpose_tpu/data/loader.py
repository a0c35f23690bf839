"""Host-side batch iteration with static shapes and multi-host sharding.

Replaces the reference's 32-worker ``torch.utils.data.DataLoader``
(``runners/diffpose_frame.py:170-173``): the heavy per-sample work (GMM
kernel draw) is done on device (:mod:`diffpose_tpu.data.gmm`), so the host
loader is a thin permutation + gather.

TPU specifics:

* every batch has the same static shape — the trailing partial batch is
  wrap-padded (the reference generator also wraps indices modulo the
  dataset length, ``common/generators.py:26-29``) and carries a ``valid``
  mask so eval can discount padding;
* for multi-host runs each process takes a disjoint contiguous slice of
  the *same* global permutation (seeded identically on all hosts), so the
  global sample order is host-count invariant — required for parity runs.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from diffpose_tpu import native
from diffpose_tpu.data.pipeline import FlatDataset


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Async host→device prefetch: keep ``size`` batches in flight.

    ``jax.device_put`` is asynchronous — enqueuing the next batch's
    transfer before the current step runs overlaps H2D with compute
    (measured: the batch transfer costs as much as the whole
    backward pass through this environment's tunnel; docs/PERF.md).

    ``sharding`` may be a single Sharding for every key, or a callable
    ``key -> Sharding`` for batches whose arrays shard differently (e.g.
    video windows: poses over (data, context), ids over (data,)).
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        out = {}
        for k, v in batch.items():
            s = sharding(k) if callable(sharding) else sharding
            out[k] = jax.device_put(v, s) if s is not None else jax.device_put(v)
        return out

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class BatchLoader:
    def __init__(
        self,
        dataset: FlatDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        process_count: int = 1,
        process_index: int = 0,
    ):
        assert 0 <= process_index < process_count
        assert batch_size % process_count == 0, "global batch must divide across hosts"
        self.dataset = dataset
        self.batch_size = batch_size
        self.per_host_batch = batch_size // process_count
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_count = process_count
        self.process_index = process_index

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch_indices(self, epoch: int = 0) -> Iterator[np.ndarray]:
        """Index-only iteration (device-resident-data training): yields the
        same per-host ``[B]`` dataset indices :meth:`epoch` would gather,
        without assembling the batches on the host."""
        n = len(self.dataset)
        if self.shuffle:
            perm = np.random.default_rng(self.seed + epoch).permutation(n)
        else:
            perm = np.arange(n)
        for b in range(len(self)):
            start = b * self.batch_size
            idx_global = np.arange(start, start + self.batch_size) % n
            idx = perm[idx_global]
            lo = self.process_index * self.per_host_batch
            yield idx[lo:lo + self.per_host_batch].astype(np.int32)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        if self.shuffle:
            perm = np.random.default_rng(self.seed + epoch).permutation(n)
        else:
            perm = np.arange(n)

        num_batches = len(self)
        for b in range(num_batches):
            start = b * self.batch_size
            idx_global = np.arange(start, start + self.batch_size)
            valid = idx_global < n
            idx_global = idx_global % n  # wrap-pad the tail
            idx = perm[idx_global]
            # Contiguous per-host slice of the global batch.
            lo = self.process_index * self.per_host_batch
            hi = lo + self.per_host_batch
            sel = idx[lo:hi]
            # Per-sample RNG ids: deterministic in (loader seed, epoch,
            # dataset index) — they make on-device randomness (GMM kernel
            # draw) independent of batch/shard layout.
            seeds = (
                np.asarray(sel, np.int64) * 2654435761
                + np.int64(epoch) * 97531
                + np.int64(self.seed) * 1000003
            ).astype(np.uint32).astype(np.int32)
            # Batch assembly via the native multithreaded multi-array
            # row-gather when the library is available (one parallel region
            # for both big arrays; numpy fancy-indexing fallback).
            p3, p2 = native.gather_rows_multi(
                [self.dataset.poses_3d, self.dataset.poses_2d_gmm], sel
            )
            batch = {
                "poses_3d": p3,
                "poses_2d_gmm": p2,
                "action_ids": self.dataset.action_ids[sel],
                "valid": valid[lo:hi],
                "seeds": seeds,
            }
            # Video window datasets carry no per-sample camera params.
            cam = getattr(self.dataset, "camera_para", None)
            if cam is not None:
                batch["camera_para"] = cam[sel]
            yield batch
