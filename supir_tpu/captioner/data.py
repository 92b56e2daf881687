"""Captioner training data pipeline pieces.

Behavioral contract: `llava/train/llava_trainer.py:33-130` —
LengthGroupedSampler with modality grouping: multimodal and text-only
samples are shuffled separately, chunked into megabatches sorted by
length, and split into world-size-even chunks so every data-parallel rank
gets a balanced batch. Here `rank` comes from `jax.process_index()` when
not given.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def split_to_even_chunks(indices: Sequence[int], lengths: Sequence[int], num_chunks: int):
    """Greedy balance of indices into num_chunks with ~equal total length
    (llava_trainer.py:33-55)."""
    if len(indices) % num_chunks != 0:
        return [list(indices[i::num_chunks]) for i in range(num_chunks)]
    num_per = len(indices) // num_chunks
    chunks = [[] for _ in range(num_chunks)]
    loads = [0] * num_chunks
    for idx in indices:
        slot = int(np.argmin([l if len(c) < num_per else np.inf for l, c in zip(loads, chunks)]))
        chunks[slot].append(idx)
        loads[slot] += lengths[idx]
    return chunks


def length_grouped_indices(
    lengths: Sequence[int],
    batch_size: int,
    world_size: int,
    seed: int = 0,
    group_by_modality: bool = True,
):
    """Indices grouped by (modality,) length into world-even megabatches
    (llava_trainer.py:58-95). Multimodal samples carry positive lengths,
    text-only negative (the reference's convention)."""
    rng = np.random.default_rng(seed)
    lengths = np.asarray(lengths)
    mega = batch_size * world_size

    def group(idx):
        idx = idx[rng.permutation(len(idx))]
        megabatches = [idx[i : i + mega] for i in range(0, len(idx), mega)]
        megabatches = [
            sorted(m.tolist(), key=lambda i: abs(int(lengths[i])), reverse=True)
            for m in megabatches
        ]
        return [
            split_to_even_chunks(m, np.abs(lengths).tolist(), world_size)
            for m in megabatches
        ]

    if group_by_modality and (lengths > 0).any() and (lengths < 0).any():
        mm = np.nonzero(lengths > 0)[0]
        txt = np.nonzero(lengths < 0)[0]
        batches = group(mm) + group(txt)
    else:
        batches = group(np.arange(len(lengths)))

    order = rng.permutation(len(batches))
    out = []
    for bi in order:
        for chunk in batches[bi]:
            out.extend(chunk)
    return out


def rank_batches(
    lengths: Sequence[int],
    batch_size: int,
    world_size: int,
    rank: Optional[int] = None,
    seed: int = 0,
) -> List[List[int]]:
    """Per-rank batch index lists (the jax.process_index()-aware loader of
    SURVEY.md section 2.6)."""
    if rank is None:
        import jax

        rank = jax.process_index()
    idx = length_grouped_indices(lengths, batch_size, world_size, seed)
    mega = batch_size * world_size
    batches = []
    for i in range(0, len(idx) - mega + 1, mega):
        block = idx[i : i + mega]
        batches.append(block[rank * batch_size : (rank + 1) * batch_size])
    return batches
