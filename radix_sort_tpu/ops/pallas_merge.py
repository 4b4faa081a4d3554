"""Pallas merge-sort engine — the bandwidth-shaped single-chip sort.

Why this exists (docs/DESIGN.md §2.2): XLA scatter/gather run at ~1.5 GB/s
on this chip, killing every radix-scatter formulation, while `lax.sort`
spends O(log^2 n) HBM passes.  A merge sort does **log(n/tile)** streaming
passes: every byte moves through sequential DMA reads/writes, and all the
data-dependent work happens inside VMEM on the VPU:

  level 0:  bitonic-sort each 16K-element tile entirely in VMEM.
  level m:  merge runs of 2^m tiles pairwise.  Merge-path splits (computed
            in XLA with tiny binary searches — O(tiles) work) tell each
            output tile which [ia, ia+la) slice of run A and [ib, ib+lb)
            slice of run B it consumes; the kernel DMAs both windows,
            rotates them to their exact element offsets (lane gather),
            masks the tails with the max sentinel, flips B (constant
            mirror gather + transposes) to form a bitonic sequence, and
            runs a log(2·tile)-stage bitonic merge — emitting exactly one
            sorted output tile.  No scatter, no gather from HBM.

Compare-exchange networks use XOR partners realized as lane/sublane
`pltpu.roll` pairs with bit masks — every primitive verified on v5e
(scripts/pallas_capability_probe.py).

Scope (round 1): 32-bit key containers (u32 — i32/f32 arrive pre-biased),
key-only.  Sentinel masking is value-exact for key-only sorts: a masked
slot can only displace an equal-valued real key.  KV/stable variants need
(key, index) composite compares — see roadmap in DESIGN.md.

This is the reference's histogram/scan/reorder pipeline re-imagined once
more: the reorder that TPUs cannot do (random scatter) becomes a merge
that TPUs excel at (streaming DMA + vector min/max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 128
TILE = TILE_ROWS * LANES          # 16384 elements per tile
# Kernels run in the sign-biased int32 domain: Mosaic has no unsigned
# vector min/max, and (u32 ^ 0x8000_0000) viewed as int32 preserves the
# unsigned order exactly.  The driver converts on entry/exit.
SENTINEL = np.int32(0x7FFFFFFF)
_SIGN = np.uint32(0x80000000)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------ vreg helpers

def _elem_index(rows: int):
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return ri, li, ri * LANES + li


def _roll(x, shift, axis):
    if _interpret():
        return jnp.roll(x, shift, axis=axis)
    size = x.shape[axis]
    # np.int32: a python-int shift traces to a weak i64 const under
    # jax_enable_x64, which Mosaic cannot lower
    return pltpu.roll(x, shift=np.int32(shift % size), axis=axis)


def _partner(x, d: int, rows: int):
    """Value at each element's XOR-partner position (distance d, power of
    two).  d < 128 pairs within rows (lanes); d >= 128 pairs across rows."""
    ri, li, _ = _elem_index(rows)
    if d < LANES:
        up = _roll(x, -d, 1)    # value from lane l+d
        dn = _roll(x, d, 1)     # value from lane l-d
        return jnp.where((li & d) != 0, dn, up)
    dr = d // LANES
    up = _roll(x, -dr, 0)
    dn = _roll(x, dr, 0)
    return jnp.where((ri & dr) != 0, dn, up)


def _cmpex(x, d: int, asc_mask, rows: int):
    """One bitonic compare-exchange stage at distance d with per-element
    ascending mask (True = this element's block sorts ascending)."""
    _, _, gi = _elem_index(rows)
    p = _partner(x, d, rows)
    is_lower = (gi & d) == 0
    take_min = asc_mask == is_lower
    return jnp.where(take_min, jnp.minimum(x, p), jnp.maximum(x, p))


def _bitonic_sort(x, rows: int):
    """Full bitonic sort of (rows, 128) uint32 in row-major element order."""
    n = rows * LANES
    _, _, gi = _elem_index(rows)
    k = 2
    while k <= n:
        asc = (gi & k) == 0 if k < n else jnp.ones_like(gi, bool)
        d = k // 2
        while d >= 1:
            x = _cmpex(x, d, asc, rows)
            d //= 2
        k *= 2
    return x


def _bitonic_merge(x, rows: int):
    """Merge a bitonic (rows,128) sequence into ascending order."""
    n = rows * LANES
    asc = jnp.ones((rows, LANES), bool)
    d = n // 2
    while d >= 1:
        x = _cmpex(x, d, asc, rows)
        d //= 2
    return x


def _lane_reverse(x):
    idx = (LANES - 1 - jax.lax.broadcasted_iota(
        jnp.int32, x.shape, 1))
    return jnp.take_along_axis(x, idx, axis=1)


def _flip_tile(x):
    """Reverse the row-major order of a (128,128) tile: reverse lanes and
    reverse rows (rows via transpose → lane-reverse → transpose)."""
    x = _lane_reverse(x)
    x = _lane_reverse(x.T).T
    return x


def _rotate_elems(x, s, rows: int):
    """Element-space left rotation by dynamic s in [0, 128): new[i] =
    old[i + s] in row-major order.  Lane gather with wraparound plus a
    row-shifted source for the wrapped lanes."""
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    src = jnp.remainder(li + s, LANES)
    same = jnp.take_along_axis(x, src, axis=1)
    nxt = jnp.take_along_axis(_roll(x, -1, 0), src, axis=1)
    return jnp.where(li + s < LANES, same, nxt)


# ------------------------------------------------------------- kernels

def _tile_sort_kernel(x_ref, o_ref):
    o_ref[...] = _bitonic_sort(x_ref[...], TILE_ROWS)


def _merge_kernel(ia_ref, ib_ref, la_ref, in_hbm, o_ref,
                  wa, wb, sa, sb):
    """Emit one sorted output tile of a pairwise run merge.

    Scalar-prefetch per tile: ia/ib — element offsets of the A/B windows
    in the (flattened) input; la — elements consumed from A (lb = TILE-la).
    """
    t = pl.program_id(0)
    ia = ia_ref[t]
    ib = ib_ref[t]
    la = la_ref[t]

    W = TILE_ROWS + 8
    ra = ia // LANES
    rb = ib // LANES
    cp_a = pltpu.make_async_copy(in_hbm.at[pl.ds(ra, W), :], wa, sa)
    cp_b = pltpu.make_async_copy(in_hbm.at[pl.ds(rb, W), :], wb, sb)
    cp_a.start()
    cp_b.start()
    cp_a.wait()
    cp_b.wait()

    _, _, gi = _elem_index(TILE_ROWS)
    a = _rotate_elems(wa[...], ia - ra * LANES, W)[:TILE_ROWS]
    a = jnp.where(gi < la, a, jnp.int32(SENTINEL))
    b = _rotate_elems(wb[...], ib - rb * LANES, W)[:TILE_ROWS]
    b = jnp.where(gi < TILE - la, b, jnp.int32(SENTINEL))

    # Bitonic halver: a ++ flip(b) is bitonic, and the first compare-exchange
    # stage (distance TILE) is exactly the elementwise min/max of the two
    # halves.  This tile only emits the TILE smallest, so the max half is
    # never materialized: one jnp.minimum replaces a full stage on 2x rows,
    # and the remaining merge runs log(TILE)-1 stages on HALF the data the
    # old concat formulation processed (~1.9x less VPU work per level).
    low = jnp.minimum(a, _flip_tile(b))               # bitonic (128,128)
    o_ref[...] = _bitonic_merge(low, TILE_ROWS)


# ------------------------------------------------------- merge-path (XLA)

def _merge_splits(x, level: int, num_tiles: int):
    """Per-output-tile split offsets for one merge level, computed with a
    vectorized binary search (A-preference on ties keeps the merge
    deterministic).  Arrays are O(num_tiles) — tiny."""
    R = (1 << level) * TILE                 # run length in elements
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    pair = t // (2 << level)                # pair index
    g = (t - pair * (2 << level)) * TILE    # offset within the pair
    base = pair * (2 * R)

    lo = jnp.maximum(0, g - R)
    hi = jnp.minimum(g, R)
    nmax = x.shape[0] - 1

    def body(_, carry):
        lo_, hi_ = carry
        mid = (lo_ + hi_) // 2
        j = g - mid - 1
        a_v = x[jnp.clip(base + mid, 0, nmax)]
        b_v = x[jnp.clip(base + R + j, 0, nmax)]
        # "split too small" (must take more from A) iff A[mid] would sort
        # before-or-with B[j] (ties pull from A), respecting run edges:
        #   mid >= R  → A exhausted → never too small
        #   j < 0     → nothing left in B below → never too small
        #   j >= R    → B[j] is +inf → too small (if A available)
        too_small = jnp.logical_and(
            mid < R,
            jnp.logical_and(j >= 0,
                            jnp.logical_or(j >= R, a_v <= b_v)))
        lo_ = jnp.where(too_small, mid + 1, lo_)
        hi_ = jnp.where(too_small, hi_, mid)
        return lo_, hi_

    steps = int(np.ceil(np.log2(max(R, 2)))) + 2
    ia_rel, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    ia = base + ia_rel
    ib = base + R + (g - ia_rel)
    return ia, ib, ia_rel


def _level_splits(x, level: int, num_tiles: int):
    ia, ib, ia_rel = _merge_splits(x, level, num_tiles)
    # next tile's ia within the same pair; last tile of a pair consumes
    # whatever remains of A.
    R = (1 << level) * TILE
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    in_pair = t % (2 << level)
    last_of_pair = in_pair == (2 << level) - 1
    nxt = jnp.concatenate([ia_rel[1:], ia_rel[-1:]])
    ia_next = jnp.where(last_of_pair, R, nxt)
    la = ia_next - ia_rel
    return ia.astype(jnp.int32), ib.astype(jnp.int32), la.astype(jnp.int32)


# ------------------------------------------------------------- driver

def _pad_rows(x, extra_rows: int):
    return jnp.concatenate(
        [x, jnp.full((extra_rows * LANES,), SENTINEL, jnp.int32)])


@functools.partial(jax.jit, static_argnames=("n",))
def merge_sort_u32(keys_u32: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sort (n,) uint32 keys ascending via tile sort + merge levels."""
    out = _merge_sort_i32(
        jax.lax.bitcast_convert_type(keys_u32 ^ _SIGN, jnp.int32), n)
    return jax.lax.bitcast_convert_type(out, jnp.uint32) ^ _SIGN


def tile_sort(x_flat: jnp.ndarray) -> jnp.ndarray:
    """Level 0: in-VMEM bitonic sort of each TILE-element block.  Input is
    (num_tiles*TILE,) i32; output same shape, each tile row-major sorted."""
    num_tiles = x_flat.shape[0] // TILE
    x2 = pl.pallas_call(
        _tile_sort_kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((TILE_ROWS, LANES), lambda t: (t, np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_ROWS, LANES), lambda t: (t, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles * TILE_ROWS, LANES),
                                       jnp.int32),
        interpret=_interpret(),
    )(x_flat.reshape(num_tiles * TILE_ROWS, LANES))
    return x2.reshape(-1)


def merge_level(x_flat: jnp.ndarray, ia, ib, la) -> jnp.ndarray:
    """One pairwise merge level with precomputed per-output-tile splits."""
    num_tiles = x_flat.shape[0] // TILE
    xin = _pad_rows(x_flat, TILE_ROWS + 8).reshape(-1, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE_ROWS, LANES), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_ROWS + 8, LANES), jnp.int32),
            pltpu.VMEM((TILE_ROWS + 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _merge_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TILE_ROWS, LANES),
                                       jnp.int32),
        interpret=_interpret(),
    )(ia, ib, la, xin).reshape(-1)


def _merge_sort_i32(keys_i32: jnp.ndarray, n: int) -> jnp.ndarray:
    padded = max(TILE, -(-n // TILE) * TILE)
    num_tiles = padded // TILE
    # pad to a power-of-two tile count (merge pairing) + one spill tile
    # for the +1-row DMA windows.
    pot = 1
    while pot < num_tiles:
        pot *= 2
    num_tiles = pot
    padded = num_tiles * TILE
    x = jnp.concatenate([
        keys_i32,
        jnp.full((padded - n,), SENTINEL, jnp.int32)]) if padded != n \
        else keys_i32

    x = tile_sort(x)

    levels = int(np.log2(num_tiles))
    for level in range(levels):
        ia, ib, la = _level_splits(x, level, num_tiles)
        x = merge_level(x, ia, ib, la)

    return x[:n]
