"""Epoch samplers: sharded shuffling + chunk-aware order for TSV shards.

Replaces torch's DistributedSampler / the reference's DistributedChunkSampler
(datasets/samplers/distributed_chunk_sampler.py): pure index math, one
process per host (jax.process_index), deterministic per (seed, epoch).
"""

from __future__ import annotations

import numpy as np


def sharded_indices(n: int, *, epoch: int, seed: int = 0, shuffle: bool = True,
                    process_index: int = 0, process_count: int = 1,
                    drop_last: bool = True) -> np.ndarray:
    """Per-process index slice for one epoch, torch-DistributedSampler style
    (pad-to-divisible, rank-strided)."""
    rng = np.random.default_rng((seed, epoch))
    idx = rng.permutation(n) if shuffle else np.arange(n)
    if drop_last:
        per = n // process_count
        idx = idx[: per * process_count]
    else:
        pad = (-len(idx)) % process_count
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
    return idx[process_index::process_count]


def chunk_aware_indices(chunk_sizes: list[int], *, epoch: int, seed: int = 0,
                        process_index: int = 0, process_count: int = 1
                        ) -> np.ndarray:
    """Shuffle at chunk granularity, then within chunks, so each process
    touches few TSV shards per epoch (the DistributedChunkSampler idea,
    distributed_chunk_sampler.py:126-209). Chunks are dealt round-robin to
    processes; alternate epochs reverse the deal order for cache reuse."""
    rng = np.random.default_rng((seed, epoch))
    starts = np.concatenate([[0], np.cumsum(chunk_sizes)[:-1]])
    order = rng.permutation(len(chunk_sizes))
    if epoch % 2 == 1:
        order = order[::-1]
    mine = order[process_index::process_count]
    out = []
    for c in mine:
        within = rng.permutation(chunk_sizes[c]) + starts[c]
        out.append(within)
    return np.concatenate(out) if out else np.zeros((0,), np.int64)
