"""Stable partition / radix partition — the reusable reorder primitive.

One radix pass (histogram → scan → scatter) generalized to arbitrary bucket
ids: the same machinery the reference's per-pass reorder implements
(``src/kernels/RadixSort.cl:74-119``), exposed as a first-class operator
because filter, hash join, hash aggregate and the distributed shuffle are all
"partition by some digit" at heart (SURVEY.md §7 M3-M4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ranking


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def stable_partition(bucket_ids: jnp.ndarray, arrays, num_buckets: int,
                     block_elems: int = 1 << 16):
    """Stably reorder ``arrays`` so rows with equal ``bucket_ids`` become
    contiguous, buckets in ascending id order.

    Arbitrary n is handled the way the reference pads to whole sublists
    (src/RadixSortGPU.cpp:269-297): internally pad with a one-past-the-end
    bucket id so padding provably lands at the tail, then slice it off.

    Returns (reordered_arrays, bucket_counts, bucket_starts) where
    ``bucket_starts`` is the exclusive prefix of counts — the bucket
    boundaries downstream operators (join probe, shuffle send) slice on.
    """
    n = bucket_ids.shape[0]
    m = min(block_elems, _next_pow2(max(n, 1)))
    padded = -(-max(n, 1) // m) * m
    ids = bucket_ids.astype(jnp.int32)
    if padded != n:
        pad = jnp.full((padded - n,), num_buckets, dtype=jnp.int32)
        ids = jnp.concatenate([ids, pad])
        arrays = tuple(
            jnp.concatenate([a, jnp.zeros((padded - n,), dtype=a.dtype)])
            for a in arrays
        )
    db = ids.reshape(padded // m, m)
    dest, _, total = ranking.stable_dest(
        db, num_buckets + 1, sequential_blocks=padded >= (1 << 22))
    out = ranking.apply_destinations(dest.reshape(-1), tuple(arrays))
    out = tuple(a[:n] for a in out)
    total = total[:num_buckets]
    starts = jnp.cumsum(total) - total
    return out, total, starts


def compact_mask(mask: jnp.ndarray, arrays, block_elems: int = 1 << 16):
    """Stable compaction: rows with mask=True move to the front, preserving
    order; returns (compacted_arrays, kept_count).  This is stable_partition
    with buckets (kept=0, dropped=1)."""
    bucket = jnp.where(mask, 0, 1).astype(jnp.int32)
    out, counts, _ = stable_partition(bucket, arrays, 2,
                                      block_elems=block_elems)
    return out, counts[0]


def radix_partition(keys_u: jnp.ndarray, arrays, bits: int, shift: int = 0,
                    block_elems: int = 1 << 16):
    """Partition rows by a key digit: the building block of the partitioned
    hash join and of the cross-chip shuffle (digit selects the destination
    partition/chip)."""
    radix = 1 << bits
    digits = (keys_u >> shift) & (radix - 1)
    return stable_partition(digits.astype(jnp.int32), arrays, radix,
                            block_elems=block_elems)
