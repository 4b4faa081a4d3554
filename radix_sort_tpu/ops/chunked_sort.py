"""Range-chunked single-chip sort — attacked lax.sort's log^2(n)
falloff; REFUTED on hardware, kept as the validated reference
implementation of range chunking (the distributed layer reuses the
same splitter/tie-spread machinery).

**Measured closure (r5, results_r5/chunked_ab_27.log):** at 2^27 on
v5e this engine runs 180.4 Mkeys/s key-only vs plain lax.sort's 636.4
(0.28x), and 99.0 Mpairs/s stable-KV vs 228.2 (0.43x) in the same
harness.  The premise below — "ONE streaming partition pass ~2 HBM
passes" — was priced on hardware at 265.8 Melem/s for the partition
alone (docs/PROBES.md r4), i.e. ~506 ms at 2^27 to chase a ~80 ms
falloff: the dispatch-bound partition costs ~5x what re-batching
saves, the same O(R)-per-element wall as every other TPU radix route
(docs/DESIGN.md 2.2c/e/f).  AUTO_CHUNKED_MIN_N therefore stays None —
`auto` never dispatches here; this module remains for parity/testing.

Original design (kept for the record):

  1. sample    — strided key samples, sorted; K-1 order statistics become
                 range splitters (the on-chip twin of dist_sort's
                 splitter sampling, parallel/dist_sort.py:53-67).
  2. assign    — each key's chunk is its splitter interval.  Keys EQUAL
                 to a splitter spread monotonically by input position
                 (``lo + pos*width//n``): position-monotone, so
                 stability survives, and an all-equal input (the Zeros
                 distribution) balances perfectly at zero extra passes —
                 where dist_sort's exact global-rank spread needs a
                 sort + segment scan per call.
  3. partition — ONE streaming Pallas radix pass
                 (pallas_stream.partition_planes) moves every plane to
                 chunk-major order: ~2 HBM passes where a lax.sort-based
                 partition would pay the full network again.
  4. sort      — the K chunks stack into a (K, cap) batch, padded with
                 the max sentinel, and ONE batched lax.sort along the
                 last axis sorts every chunk at the small-n rate.
  5. stitch    — K overlapping dynamic_update_slices lay the sorted
                 chunks (valid prefixes) back into a flat (n,) result;
                 each chunk's sentinel tail is overwritten by the next
                 chunk's data, so no compaction pass is needed.

Capacity is static (XLA shapes): ``cap = slack * n / K``.  If sampling
loses (a chunk overflows ``cap``), a device-side ``lax.cond`` falls back
to the plain full-width sort — bit-identical result, just the old speed.

Reference parity note: the reference has no analogue (it caps at 2^25 in
one GPU's memory, src/Parameters.h:29); this is TPU-native scaling work
on the same single-chip sort problem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import pallas_stream, ranking


def _order_stat_splitters(samples_sorted: jnp.ndarray, k_chunks: int):
    m = samples_sorted.shape[0]
    idx = (jnp.arange(1, k_chunks, dtype=jnp.int32) * m) // k_chunks
    return samples_sorted[idx]


def _chunk_destinations(keys_u: jnp.ndarray, splitters: jnp.ndarray,
                        k_chunks: int) -> jnp.ndarray:
    """Chunk id per key: splitter interval, ties spread position-
    monotonically across the tied chunk range (stable-compatible)."""
    n = keys_u.shape[0]
    # lo = #splitters < k, hi = #splitters <= k (fused compare+reduce; the
    # splitter axis is tiny).  int32 pinned for the x64 path.
    lo = jnp.sum(splitters[None, :] < keys_u[:, None], axis=1,
                 dtype=jnp.int32, promote_integers=False)
    hi = jnp.sum(splitters[None, :] <= keys_u[:, None], axis=1,
                 dtype=jnp.int32, promote_integers=False)
    width = hi - lo + 1                       # tied chunk-range size (>=1)
    # Position-proportional spread: monotone in input position among any
    # fixed key value, lands in [lo, hi] because pos < n.  The >>8 guard
    # keeps pos*width inside int32 (2^27 * 16 would overflow).
    pos_c = jnp.arange(n, dtype=jnp.int32) >> 8
    n_c = max(1, n >> 8)
    spread = lo + (pos_c * width) // jnp.int32(n_c)
    dest = jnp.where(width > 1, jnp.minimum(spread, hi), lo)
    return dest


def sort_chunked_biased(keys_u, payloads=(), *, k_chunks: int = 8,
                        slack: float = 1.30, samples: int = 2048,
                        stable: bool | None = None,
                        min_n: int = 1 << 18):
    """Sort biased-unsigned keys (+ payload tuple) via range chunking.

    Trace-level (jit-safe, static shapes).  Returns (keys, payloads)
    like sort_biased_kv.  Falls back to one plain ``lax.sort`` inside the
    trace when a payload dtype has no int32-plane mapping, when n is too
    small to matter, or — via ``lax.cond`` at runtime — when a chunk
    overflows its static capacity.
    """
    n = keys_u.shape[0]
    if stable is None:
        stable = bool(payloads)
    if k_chunks > 1024:
        # the >>8 tie-spread guard in _chunk_destinations keeps pos*width
        # inside int32 only while k_chunks stays small (ADVICE r4); 1024
        # chunks of >=128 rows already covers any plausible n
        raise ValueError(f"k_chunks must be <= 1024, got {k_chunks}")
    K = k_chunks

    def plain(_=None):
        out = jax.lax.sort((keys_u,) + tuple(payloads), num_keys=1,
                           is_stable=stable)
        return out[0], tuple(out[1:])

    if n < min_n or K < 2 or n // K < 128:
        return plain()

    planes_pay, specs = pallas_stream.payloads_to_planes(tuple(payloads))
    if planes_pay is None:
        return plain()
    kplanes, _ = pallas_stream._key_word_planes(keys_u)
    nk = len(kplanes)
    planes = tuple(
        jax.lax.bitcast_convert_type(p, jnp.int32) if p.dtype != jnp.int32
        else p for p in kplanes) + planes_pay

    cap = int(-(-int(slack * n / K) // 1024) * 1024)
    cap = min(cap, n)

    stride = max(1, n // min(samples, n))
    s = keys_u[::stride][: min(samples, n)]
    splitters = _order_stat_splitters(jnp.sort(s), K)
    dest = _chunk_destinations(keys_u, splitters, K)

    parted, counts = pallas_stream.partition_planes(dest, planes, K)
    # ranking._cumsum, not jnp.cumsum: the reduce-window lowering trips the
    # scoped-vmem compiler bug on any path a 64-bit sweep may jit (CLAUDE.md)
    starts = (ranking._cumsum(counts, 0) - counts).astype(jnp.int32)
    overflow = jnp.any(counts > cap)

    sent = jnp.int32(-1)  # 0xFFFFFFFF bit pattern = max unsigned word

    def chunked(parted):
        # (K, cap) batch per plane: K dynamic slices out of the flat
        # chunk-major planes (padded by cap so no slice ever clamps),
        # sentinel-masked past each chunk's count.
        col = jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid = col < counts[:, None]                        # (K, cap)
        rows_per_plane = []
        for pi, pl in enumerate(parted):
            flat = jnp.concatenate(
                [pl, jnp.full((cap,), 0, jnp.int32)])
            rows = jnp.stack([
                jax.lax.dynamic_slice(flat, (starts[c],), (cap,))
                for c in range(K)])                          # (K, cap)
            if pi < nk:
                rows = jnp.where(valid, rows, sent)
            rows_per_plane.append(rows)

        # Rebuild key containers for the batched sort (u32: bitcast one
        # plane; u64: recombine lo/hi — lax.sort compares the real key).
        if nk == 1:
            keys2d = jax.lax.bitcast_convert_type(
                rows_per_plane[0], jnp.uint32)
        else:
            lo_u = jax.lax.bitcast_convert_type(
                rows_per_plane[0], jnp.uint32).astype(jnp.uint64)
            hi_u = jax.lax.bitcast_convert_type(
                rows_per_plane[1], jnp.uint32).astype(jnp.uint64)
            keys2d = (hi_u << jnp.uint64(32)) | lo_u
        operands = (keys2d,) + tuple(rows_per_plane[nk:])
        res = jax.lax.sort(operands, num_keys=1, is_stable=stable,
                           dimension=1)

        # Stitch: ascending chunks overwrite the previous chunk's
        # sentinel tail; the global tail lands in the extra cap rows.
        if nk == 1:
            key_rows = (jax.lax.bitcast_convert_type(res[0], jnp.int32),)
        else:
            key_rows = (
                jax.lax.bitcast_convert_type(
                    (res[0] & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                    jnp.int32),
                jax.lax.bitcast_convert_type(
                    jax.lax.shift_right_logical(
                        res[0], jnp.uint64(32)).astype(jnp.uint32),
                    jnp.int32))
        out_planes = []
        for rows in key_rows + tuple(res[1:]):
            buf = jnp.zeros((n + cap,), jnp.int32)
            for c in range(K):
                buf = jax.lax.dynamic_update_slice(
                    buf, rows[c], (starts[c],))
            out_planes.append(buf[:n])
        return tuple(out_planes)

    def fallback(parted):
        ko, po = plain()
        kpl, _ = pallas_stream._key_word_planes(ko)
        kpl = tuple(
            jax.lax.bitcast_convert_type(p, jnp.int32)
            if p.dtype != jnp.int32 else p for p in kpl)
        ppl, _ = pallas_stream.payloads_to_planes(tuple(po))
        return kpl + ppl

    out_planes = jax.lax.cond(overflow, fallback, chunked, parted)
    keys_out = pallas_stream._join_key_word_planes(
        out_planes[:nk], keys_u.dtype, n)
    pays_out = pallas_stream.planes_to_payloads(out_planes[nk:], specs)
    return keys_out, pays_out
