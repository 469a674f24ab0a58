"""NMC training batches: sequences of normalized 6-hourly frames.

Replaces the reference `weather_dataset` S3/shared-memory pipeline
(dataset/dataset.py:69-501) with a simple host iterator over any
StateSource (local npy store or synthetic). Each sample is `length`
frames spaced `file_stride` hours apart, normalized per channel — the
shape the VAE trainer consumes (B, length, 69, H, W).

A native C++ prefetching loader (native/dataloader) can back
`LocalNpyStore` reads; this module stays source-agnostic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from vaevar_tpu import channels


class NMCSequenceDataset:
    def __init__(
        self,
        source,
        start_time,
        end_time,
        length: int = 5,
        file_stride_hours: int = 6,
        sample_stride_hours: int = 6,
    ):
        self.source = source
        self.length = length
        self.stride = pd.Timedelta(hours=file_stride_hours)
        t0 = pd.Timestamp(start_time)
        t1 = pd.Timestamp(end_time)
        last_start = t1 - (length - 1) * self.stride
        self.starts = list(
            pd.date_range(t0, last_start, freq=f"{sample_stride_hours}h")
        )

    def __len__(self):
        return len(self.starts)

    def __getitem__(self, idx: int) -> np.ndarray:
        t = self.starts[idx]
        frames = []
        for i in range(self.length):
            x = self.source.get_state(t + i * self.stride)
            frames.append(channels.normalize(x))
        return np.stack(frames).astype(np.float32)  # (length, 69, H, W)


def epoch_indices(
    n: int, shuffle: bool = True, seed: int = 0, epoch: int = 0,
    rank: int = 0, world_size: int = 1,
) -> np.ndarray:
    """DistributedSampler analogue (reference utils/builder.py:128-138 +
    torch DistributedSampler semantics): one global permutation per epoch
    (seed + epoch, so every epoch reshuffles and all ranks agree), padded
    by wrap-around to a multiple of world_size, then stride-sliced so each
    process sees a disjoint 1/world_size of the samples."""
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(idx)
    if world_size > 1:
        total = -(-n // world_size) * world_size
        if total > n:
            # cyclic repeat (np.resize), not a single slice: with
            # world_size > 2n a one-slice pad is too short and leaves
            # ranks with unequal (even empty) shards, which desyncs the
            # collective — DistributedSampler repeats the permutation
            idx = np.resize(idx, total)
        idx = idx[rank::world_size]
    return idx


def batched_loader(
    dataset, batch_size: int, shuffle: bool = True, seed: int = 0,
    drop_last: bool = True, epoch: int = 0, rank: int = 0,
    world_size: int = 1,
) -> Iterator[np.ndarray]:
    """Streams per-process batches; never materializes the epoch. `epoch`
    reshuffles (pass the epoch number each epoch), rank/world_size shard
    the sample stream across hosts."""
    idx = epoch_indices(len(dataset), shuffle, seed, epoch, rank, world_size)
    n_full = len(idx) // batch_size
    end = n_full * batch_size if drop_last else len(idx)
    for s in range(0, end, batch_size):
        chunk = idx[s : s + batch_size]
        yield np.stack([dataset[int(i)] for i in chunk])
