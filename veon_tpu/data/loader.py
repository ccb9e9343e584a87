"""Threaded, order-preserving batch loader with per-process sharding.

Replaces mmcv's build_dataloader + DistributedSampler
(`mmdet3d/apis/train.py:186-200`, `tools/test.py:247-249`): samples are
decoded on a thread pool (PIL/numpy release the GIL for the heavy parts, and
the native C++ depth projection releases it entirely), batches are yielded
strictly in order, and `shard=(rank, count)` strides the dataset so each
process/host sees a disjoint partition (distributed eval / per-host input
pipelines).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of sample dicts into one batch dict.

    numpy arrays of a common shape gain a leading batch axis; dicts recurse;
    strings / scalars / ragged arrays become lists (e.g. retrieval
    annotations with per-sample point counts).
    """
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, dict):
            out[key] = collate(vals)
        elif isinstance(first, np.ndarray) and all(
            isinstance(v, np.ndarray) and v.shape == first.shape and v.dtype == first.dtype
            for v in vals
        ):
            out[key] = np.stack(vals)
        else:
            out[key] = list(vals)
    return out


class DataLoader:
    """Order-preserving threaded loader.

    Args:
      dataset: indexable with __len__/__getitem__ returning a sample dict.
      batch_size: samples per batch.
      shuffle: reshuffle per epoch (seeded by `set_epoch`).
      num_workers: decode threads (also the prefetch depth in batches).
      drop_last: drop the trailing partial batch (train default).
      shard: optional (rank, count) — this loader sees dataset indices
        rank, rank+count, rank+2*count, ... (exact partition across ranks).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        num_workers: int = 2,
        drop_last: bool = True,
        shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.num_workers = max(1, int(num_workers))
        self.drop_last = bool(drop_last)
        self.shard = shard
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(12345 + self._epoch)
            rng.shuffle(idx)
        if self.shard is not None:
            rank, count = self.shard
            # pad (wrap-around) to a multiple of count so every rank gets
            # the same number of samples — unequal counts would deadlock
            # the lockstep collectives in the sharded train step
            # (torch DistributedSampler's padding semantics)
            pad = (-len(idx)) % count
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[rank::count]
        return idx

    def _batches(self) -> List[np.ndarray]:
        idx = self._indices()
        nb = len(idx) // self.batch_size
        rem = len(idx) - nb * self.batch_size
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]
        if rem and not self.drop_last:
            batches.append(idx[nb * self.batch_size:])
        return batches

    def __len__(self) -> int:
        return len(self._batches())

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batches()
        if not batches:
            return

        def load(batch_idx: np.ndarray) -> Dict[str, Any]:
            return collate([self.dataset[int(i)] for i in batch_idx])

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            depth = self.num_workers + 1
            futures = [pool.submit(load, b) for b in batches[:depth]]
            nxt = depth
            for i in range(len(batches)):
                yield futures[i].result()
                futures[i] = None  # release
                if nxt < len(batches):
                    futures.append(pool.submit(load, batches[nxt]))
                    nxt += 1
