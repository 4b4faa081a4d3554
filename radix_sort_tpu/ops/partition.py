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
                     block_elems: int = 1 << 16, method: str = "sort"):
    """Stably reorder ``arrays`` so rows with equal ``bucket_ids`` become
    contiguous, buckets in ascending id order.

    Returns (reordered_arrays, bucket_counts, bucket_starts) where
    ``bucket_starts`` is the exclusive prefix of counts — the bucket
    boundaries downstream operators (join probe, shuffle send) slice on.

    method="sort" (default): stable ``lax.sort`` keyed on the bucket id —
    the fastest data movement XLA offers on TPU (measured: XLA scatter runs
    at ~1.5 GB/s on v5e while the sort network is ~50x faster end-to-end,
    docs/DESIGN.md §2.2).
    method="stream": ONE streaming Pallas radix pass
    (pallas_stream.partition_planes) — 2 passes/byte of HBM traffic where
    "sort" pays a full log-depth sort network.  The r4 verdict (loses
    0.33-0.51x at R=16, 2^22) is SIZE- and RADIX-dependent: the r5 sweep
    found the crossover — the dispatch cost is O(R)/element while the
    network deepens with n, so at radix 2 the stream pass WINS 1.12-1.85x
    from 2^24 up, and at radix<=16 single-plane wins 1.12x at 2^27
    (docs/PROBES.md r5).  method="auto" applies exactly that measured
    policy (_auto_method); filter/aggregate/join compactions use it.
    Falls back to "sort" when
    a payload dtype is not 4/8-byte plane-representable, when n == 0, or
    when the bucket count (rounded up to a power of two) exceeds the
    hardware-verified radix cap of 256 (larger radices inflate the
    kernel's (NP*radix, 128) VMEM outputs past what the capability probes
    validated — ADVICE r3).  NB: the stream pass computes buckets as
    ``ids & (radix-1)``, so ids outside [0, num_buckets) WRAP into low
    buckets instead of landing after the last bucket the way the sort
    method orders them — callers relying on the virtual-bucket tail
    pattern (exchange.ragged_all_to_all) must use method="sort".
    method="rank": the radix rank+scatter pipeline (the reference-shaped
    path; used by tests to cross-validate the ranking machinery).
    """
    n = bucket_ids.shape[0]
    ids = bucket_ids.astype(jnp.int32)
    if method == "auto":
        method = _auto_method(n, arrays, num_buckets)
    if method == "stream":
        from . import pallas_stream

        planes, specs = pallas_stream.payloads_to_planes(tuple(arrays))
        if _next_pow2(max(num_buckets, 1)) > 256:
            planes = None  # beyond the verified radix cap — sort path
        if planes is not None and n > 0:
            outs, total = pallas_stream.partition_planes(
                ids, planes, num_buckets)
            out = pallas_stream.planes_to_payloads(outs, specs)
            starts = jnp.cumsum(total) - total
            return out, total, starts
        method = "sort"
    if method == "sort":
        out = jax.lax.sort((ids,) + tuple(arrays), num_keys=1,
                           is_stable=True)
        out = tuple(out[1:])
        total = _counts_big(ids, num_buckets, n)
        starts = jnp.cumsum(total) - total
        return out, total, starts

    m = min(block_elems, _next_pow2(max(n, 1)))
    padded = -(-max(n, 1) // m) * m
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


def _counts_big(ids: jnp.ndarray, num_buckets: int, n: int) -> jnp.ndarray:
    """Bucket histogram without materializing an (n, R) one-hot: blockwise
    one-hot reductions (XLA fuses the compare into the sum per block)."""
    if n == 0:
        return jnp.zeros((num_buckets,), jnp.int32)
    m = min(n, 1 << 15)
    padded = -(-n // m) * m
    idp = jnp.concatenate(
        [ids, jnp.full((padded - n,), num_buckets, jnp.int32)]) \
        if padded != n else ids
    blocks = idp.reshape(padded // m, m)
    counts = ranking.block_digit_counts(blocks, num_buckets + 1)
    return counts.sum(axis=0)[:num_buckets]


def compact_prefix_slots(arrays, counts: jnp.ndarray, slot_len: int):
    """Compact S fixed-length slots whose valid rows are each slot's prefix
    into one contiguous prefix (order preserved across and within slots).

    ``arrays`` are (S * slot_len,); slot s's valid rows are its first
    ``counts[s]``.  Returns (arrays, total) with every valid row packed at
    the front; rows past ``total`` are unspecified.

    This is the all_to_all receive layout (exchange.slot_valid_mask) and
    the shape of every sub-chunk stitch — compact_mask on such input pays
    a full stable sort for what is slot bookkeeping.  Here: S overlapping
    ``dynamic_update_slice`` writes in ascending slot order, each
    overwriting the previous slot's padding tail — one HBM pass.
    """
    counts = counts.astype(jnp.int32)
    S = counts.shape[0]
    offs = jnp.cumsum(counts, dtype=jnp.int32) - counts
    outs = []
    for a in arrays:
        slots = a.reshape(S, slot_len)
        # +slot_len so the last write never clamps (offs[s] <= s*slot_len).
        buf = jnp.zeros((S * slot_len + slot_len,), a.dtype)
        for s in range(S):
            buf = jax.lax.dynamic_update_slice(buf, slots[s], (offs[s],))
        outs.append(buf[:S * slot_len])
    return tuple(outs), jnp.sum(counts, dtype=jnp.int32,
                                promote_integers=False)


def _auto_method(n: int, arrays, num_buckets: int) -> str:
    """Measured dispatch policy (v5e r5, results_r5/stream_partition_*):
    the streaming Pallas partition's O(R)-per-element dispatch loses to
    the sort network at R=16/small n (0.33-0.52x, r4), but WINS where
    the dispatch is cheap and the network is deep —

      radix 2 (the filter/compaction shape): 1.12x at 2^24/4 planes up
      to 1.85x at 2^27/1 plane;
      radix <=16, single plane: 1.12x at 2^27 (0.99x at 2^26 — tie).

    Callers opting into "auto" must guarantee ids in [0, num_buckets)
    (the stream kernel wraps out-of-range ids; binary masks qualify).
    NB: not for use inside shard_map — the Pallas kernel is not
    validated under vma checking (parallel/dist_sort.py keeps "sort")."""
    from . import pallas_stream

    planes, _ = pallas_stream.payloads_to_planes(tuple(arrays))
    if planes is None or n == 0:
        return "sort"
    radix = _next_pow2(max(num_buckets, 1))
    np_ = len(planes)
    if radix == 2 and ((n >= (1 << 24) and np_ <= 4)
                       or (n >= (1 << 25) and np_ <= 8)):
        return "stream"
    if radix <= 16 and np_ == 1 and n >= (1 << 27):
        return "stream"
    return "sort"


def compact_mask(mask: jnp.ndarray, arrays, block_elems: int = 1 << 16,
                 method: str = "sort"):
    """Stable compaction: rows with mask=True move to the front, preserving
    order; returns (compacted_arrays, kept_count).  This is stable_partition
    with buckets (kept=0, dropped=1).

    ``method="auto"`` dispatches the measured-fastest backend for the
    shape (see _auto_method) — safe here since the binary bucket is
    always in range, but NOT for shard_map callers (vma caveat)."""
    bucket = jnp.where(mask, 0, 1).astype(jnp.int32)
    out, counts, _ = stable_partition(bucket, arrays, 2,
                                      block_elems=block_elems,
                                      method=method)
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
