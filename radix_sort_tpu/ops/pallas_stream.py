"""Streaming Pallas radix-scatter engine — the TPU-native reorder kernel.

This is the round-2 redesign of the reference's reorder kernel
(``src/kernels/RadixSort.cl:74-119``) that round 1 left as an XLA scatter
(docs/DESIGN.md §2.2).  TPUs cannot scatter per element (no per-lane
sublane access), so the kernel never scatters: every byte moves through

  per-row lane gathers  →  per-bucket one-hot MXU row-combines  →
  1024-element-aligned streaming DMA windows with VMEM-carried tails.

Pass structure (one Pallas kernel per radix pass, sequential grid over
blocks, plus a tiny XLA epilogue):

  1. per-row stable partition of each 128-lane row by digit (lane gather;
     ranks from a masked equality matrix — verified v5e primitives).
  2. cross-row combine: for each bucket, the per-row runs are rotated to
     their staging lane phase (lane gather) and summed into consecutive
     staging rows with a one-hot (rows→staging-rows) MXU matmul — the
     disjoint lane masks make the f32 adds exact placements.  This is the
     step that defeats the "no sublane gather" wall: the MXU does the
     cross-row data movement.
  3. staging → HBM: each bucket's staged bytes join a carry tail held in
     VMEM scratch (persisting across sequential grid steps); only full
     1024-element windows are written (Mosaic's HBM tiling demands
     1024-aligned DMA offsets), so consecutive blocks' ragged segments
     stitch densely with ZERO extra HBM traffic.
  4. digit-boundary windows (where one digit's tail and the next digit's
     head share a window) are reconstructed by an XLA epilogue from the
     kernel's exported head/tail scratch — ≤R tiny dynamic_update_slices.

The result is a dense, stable reorder whose HBM traffic is the
speed-of-light 2 passes/byte, with all data-dependent work on VPU+MXU.

This module is built bottom-up; each stage has an interpret-mode twin and
numpy-validated unit tests (tests/test_pallas_stream.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_radix import _incl_cumsum, _row_rank_eq

LANES = 128
# HBM DMA granularity: 2-D (rows, 128) HBM refs accept DYNAMIC row offsets
# with no divisibility proof (verified: scripts/scatter_probe.py cap-2drow
# on v5e), so the streaming window is one 128-element row; carries are
# single rows.  (1-D HBM refs are tiled (1024,) and need multiple_of
# hints — not used.)
WINDOW = LANES


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mod_lanes(x):
    """x mod 128 via bitwise-and — exact floor-mod for any-sign int32 in
    two's complement (positive power-of-two modulus).  jnp.remainder on
    signed vectors lowers to a divide + sign-fixup chain in Mosaic; this
    is one VPU op."""
    return x & (LANES - 1)


def _div_lanes(x):
    """x // 128 via arithmetic shift — exact floor-division for signed
    two's-complement int32 (jnp >> is sign-propagating for signed)."""
    return x >> 7



def _take1(x, idx):
    """Within-row gather: take_along_axis(x, idx, axis=1) with int32
    indices preserved.  Under jax_enable_x64, jnp.take_along_axis
    promotes its gather indices to int64, which Mosaic cannot lower;
    this emits the identical gather (same dimension_numbers) directly.
    Indices must be in-bounds (they are by construction everywhere
    here)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(x, idx[:, :, None], dnums, (1, 1),
                          mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _excl_cumsum(x, axis):
    # one shared in-kernel prefix-sum primitive (Mosaic workarounds —
    # roll+mask shift-adds, pinned int32 shifts — live in one place)
    return _incl_cumsum(x, axis) - x


# ---------------------------------------------------------------- in-kernel
# Helpers traced INSIDE pallas kernels (also valid in interpret mode).

def _row_counts(d, radix):
    """Per-(row, digit) counts: (rows, 128) int32 → (rows, R) int32.

    Chunked one-hot 3-D reduction (row-chunks keep the (CH, 128, R)
    intermediate small; narrow per-digit concats are a Mosaic trap).
    """
    rows = d.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, radix), 2)
    CH = min(8, rows)
    outs = []
    for r0 in range(0, rows, CH):
        dd = d[r0:r0 + CH, :]                             # short tail ok
        chunk = jnp.reshape(dd, (dd.shape[0], LANES, 1))
        oh = (chunk == iota).astype(jnp.int32)            # (ch, 128, R)
        outs.append(jnp.sum(oh, axis=1, dtype=jnp.int32,
                                promote_integers=False))  # (ch, R)
    return jnp.concatenate(outs, axis=0)


def _row_partition_indices(d, rank, counts, radix):
    """Gather indices realizing the per-row stable partition.

    Returns idx (rows, 128) with out[r, k] = row[r, idx[r, k]] placing
    digits in ascending runs, stably.  Built by inverting the destination
    map dst[l] = rowstart[d_l] + rank_l with a one-hot matmul (exact in
    f32: the summed index values are < 128 with exactly one nonzero term).
    """
    rows = d.shape[0]
    rowstart = _excl_cumsum(counts, 1)       # (rows, R) excl
    # dst = rowstart[r, d[r,l]] + rank: select via one-hot over R.
    sel = jnp.zeros(d.shape, jnp.int32)
    for dd in range(radix):
        sel = sel + jnp.where(d == dd, rowstart[:, dd:dd + 1], jnp.int32(0))
    dst = sel + rank                                      # (rows, 128)
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, LANES, 1), 1)
    # int32 iota: tpu.iota rejects float result types
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
    CH = min(8, rows)
    outs = []
    for r0 in range(0, rows, CH):                         # VMEM chunking
        # explicit reshape (slice+None indexing lowers to a Mosaic gather)
        dd = dst[r0:r0 + CH, :]                           # short tail ok
        chunk = jnp.reshape(dd, (dd.shape[0], 1, LANES))
        oh = (chunk == kk).astype(jnp.int32)
        outs.append(jnp.sum(oh * lane, axis=2, dtype=jnp.int32,
                                promote_integers=False))
    return jnp.concatenate(outs, axis=0)                  # (rows, 128)


def row_partition(d, radix):
    """Convenience: per-row stable partition machinery in one call.

    Returns (idx, counts, rowstart): gather indices, per-row digit counts,
    per-row exclusive digit starts.
    """
    rank = _row_rank_eq(d)
    counts = _row_counts(d, radix)
    idx = _row_partition_indices(d, rank, counts, radix)
    rowstart = _excl_cumsum(counts, 1)
    return idx, counts, rowstart


def tile_dispatch(parted, d_parted, counts, rowstart, fills, radix,
                  stage_rows):
    """Cross-row combine of one partitioned tile into bucket-major staging.

    parted:    (rows, 128) values, per-row partitioned by digit.
    d_parted:  (rows, 128) the digits in partitioned order.
    counts:    (rows, R) per-row digit counts.
    rowstart:  (rows, R) per-row exclusive digit starts (within the row).
    fills:     (R,) int32 — element offset within the staging buffer where
               each bucket's next element goes (bucket regions are
               disjoint by construction; caller provides them).
    stage_rows: static number of staging rows to emit.

    Returns (stage, stage_mask) both (stage_rows, 128): the accumulated
    contributions and a 0/1 mask of written lanes.  Caller ORs/adds into
    the persistent staging buffer.  All data movement is lane gathers +
    one-hot f32 matmuls (disjoint lanes ⇒ exact single-term sums).
    """
    rows = parted.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    # Per-row fill offset of each element's bucket at ITS row:
    # F[r, b] = fills[b] + sum_{r'<r} counts[r', b]
    col_prefix = _excl_cumsum(counts, 0)       # (rows, R)
    stage = jnp.zeros((stage_rows, LANES), parted.dtype)
    mask_acc = jnp.zeros((stage_rows, LANES), jnp.int32)
    si = jax.lax.broadcasted_iota(jnp.int32, (stage_rows, LANES), 0)

    for b in range(radix):
        F = fills[b] + col_prefix[:, b]                    # (rows,)
        c = counts[:, b]                                   # (rows,)
        start = rowstart[:, b]                             # (rows,)
        phase = jnp.remainder(F, LANES)                    # (rows,)
        # rotated run: lane l holds run element (l - phase) mod 128,
        # masked to [phase, phase + c) with wraparound split into the
        # "low" row (no wrap) and "high" row (wrapped lanes).
        src = jnp.remainder(li - phase[:, None], LANES) + start[:, None]
        src = jnp.clip(src, 0, LANES - 1)
        rot = _take1(parted, src)                          # (rows, 128)
        k = jnp.remainder(li - phase[:, None], LANES)      # in-run index
        valid = k < c[:, None]
        wrapped = (li < phase[:, None]) & valid
        low = jnp.where(valid & ~wrapped, rot, jnp.int32(0))
        high = jnp.where(wrapped, rot, jnp.int32(0))
        mlow = (valid & ~wrapped).astype(jnp.float32)
        mhigh = wrapped.astype(jnp.float32)

        srow = F // LANES                                  # (rows,)
        # one-hot row-combine: stage[s] += sum_r [srow_r == s] * low_r
        #                       stage[s] += sum_r [srow_r+1 == s] * high_r
        sidx = jax.lax.broadcasted_iota(jnp.int32, (stage_rows, rows), 0)
        a_lo = (srow[None, :] == sidx).astype(jnp.float32)  # (S, rows)
        a_hi = (srow[None, :] + 1 == sidx).astype(jnp.float32)
        for a, part, m in ((a_lo, low, mlow), (a_hi, high, mhigh)):
            lo16 = (part & 0xFFFF).astype(jnp.float32)
            hi16 = ((part >> 16) & 0xFFFF).astype(jnp.float32)
            glo = jax.lax.dot_general(
                a, lo16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ghi = jax.lax.dot_general(
                a, hi16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gm = jax.lax.dot_general(
                a, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            val = (ghi.astype(jnp.int32) << 16) | glo.astype(jnp.int32)
            stage = stage + val
            mask_acc = mask_acc + gm.astype(jnp.int32)
    return stage, mask_acc


# ---------------------------------------------------------- the pass kernel

def _pass_kernel(sh_ref, base_ref, cnt_ref, *refs, radix, rows, nbits,
                 nplanes):
    """One radix pass over ``nplanes`` value planes (keys = plane 0 drives
    the digits; payload planes ride the identical permutation), one tile
    per sequential grid step.

    refs layout: nplanes input tiles (rows, 128) VMEM; nplanes HBM outs;
    heads_ref, tails_out_ref (nplanes*R, 128) VMEM outputs (plane-major);
    scratch: tails_s (nplanes*R, 128), stage (nplanes*(rows+2R), 128),
    one DMA semaphore (serial start+wait v1).

    Scalar prefetch: pass shift (1,), base (R, B) global offsets, cnt
    (R, B) per-(digit, tile) counts.  DIGIT-major layout is a hardware
    constraint, not a style choice: SMEM prefetch operands are padded to
    128 lanes on the minor dimension, so a (B, R) table with R=16 burns
    8x its size in SMEM and busts the 1 MiB scoped-smem budget at B=1024
    (n=2^24 at rows=128 — measured, docs/PROBES.md r4); (R, B) keeps the
    padded dim already 128-aligned.  Only FULL 128-element rows are
    DMA'd; partial tails ride VMEM carries across grid steps, so blocks'
    ragged segments stitch densely (digit-boundary rows are rebuilt by
    the XLA epilogue from heads/tails).

    Staging is ONE fused one-hot matmul per grid step: every bucket's
    rotated runs AND its incoming carry row stack along the contraction
    dim, and dense dynamic region offsets (exclusive scan of per-bucket
    row needs) pack all buckets into rows + 2R staging rows — no
    per-bucket matmul latencies, tier branches, or slab writes.  The
    single-term-sum exactness argument is unchanged: bucket regions are
    disjoint by construction, runs tile each region row without overlap,
    and the carry row's lanes (< phase) are disjoint from the first
    run's lanes (>= phase).
    """
    NP = nplanes
    ins = refs[:NP]
    outs = refs[NP:2 * NP]
    heads_ref, tails_out_ref, tails_s, stage, sems = refs[2 * NP:]
    t = pl.program_id(0)
    B = pl.num_programs(0)
    M = rows + 2 * radix

    @pl.when(t == 0)
    def _init():
        tails_s[...] = jnp.zeros(tails_s.shape, tails_s.dtype)
        heads_ref[...] = jnp.zeros(heads_ref.shape, heads_ref.dtype)

    keys = ins[0][...]
    # dynamic pass shift (scalar prefetch): ONE kernel compile serves all
    # passes — remote compiles cost minutes each (CLAUDE.md).
    digits = jax.lax.shift_right_logical(
        keys, jnp.broadcast_to(sh_ref[0], keys.shape)) & jnp.int32(
            radix - 1)

    rank = _row_rank_eq(digits)
    counts = _row_counts(digits, radix)
    idx = _row_partition_indices(digits, rank, counts, radix)
    rowstart = _excl_cumsum(counts, 1)
    col_prefix = _excl_cumsum(counts, 0)
    parteds = tuple(_take1(r[...], idx) for r in ins)

    li = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    li1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # ---- dense per-bucket stage regions: exclusive scan of row needs.
    regs, cls, cnts, k_rows_l = [], [], [], []
    reg = jnp.int32(0)
    for b in range(radix):
        e = base_ref[b, t]
        c = cnt_ref[b, t]
        cl = _mod_lanes(e)
        k_rows = _div_lanes(cl + c)
        regs.append(reg)
        cls.append(cl)
        cnts.append(c)
        k_rows_l.append(k_rows)
        reg = reg + k_rows + jnp.int32(1)

    # ---- ONE fused one-hot matmul stages every bucket + its carry.
    sidx_r = jax.lax.broadcasted_iota(jnp.int32, (rows, M), 1)
    sidx_1 = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)

    # bf16 has an 8-bit significand: 0..255 byte planes and 0/1 one-hots
    # are exact either way (measured perf-neutral on v5e — the matmul is
    # tile-count-bound, docs/PROBES.md); the CPU interpreter emulates
    # bf16 slowly, so interpret mode stays on f32.
    mm_t = jnp.float32 if _interpret() else jnp.bfloat16

    def bytes4(part):
        return jnp.concatenate(
            [((part if s == 0
               else jax.lax.shift_right_logical(part, jnp.int32(s)))
              & 0xFF).astype(mm_t) for s in (0, 8, 16, 24)],
            axis=1)

    a_pieces, r_pieces = [], []
    for b in range(radix):
        F = cls[b] + col_prefix[:, b:b + 1]            # (rows, 1)
        srow = _div_lanes(F) + regs[b]
        a_lo = (srow == sidx_r).astype(jnp.bfloat16)   # (rows, M)
        a_hi = (srow + 1 == sidx_r).astype(jnp.bfloat16)
        a_cr = (regs[b] == sidx_1).astype(jnp.bfloat16)  # (1, M)

        c_col = counts[:, b:b + 1]
        start = rowstart[:, b:b + 1]
        phase = _mod_lanes(F)
        k = _mod_lanes(li - phase)                     # in-run index
        srcidx = _mod_lanes(k + start)
        valid = k < c_col
        wrapped = jnp.logical_and(li < phase, valid)
        m_low = jnp.logical_and(valid, jnp.logical_not(wrapped))

        lows, highs, crs = [], [], []
        for p in range(NP):
            rot = _take1(parteds[p], srcidx)
            lows.append(bytes4(jnp.where(m_low, rot, jnp.int32(0))))
            highs.append(bytes4(jnp.where(wrapped, rot, jnp.int32(0))))
            carry = jnp.where(li1 < cls[b],
                              tails_s[p * radix + b:p * radix + b + 1,
                                      :], jnp.int32(0))
            crs.append(bytes4(carry))
        a_pieces.append(jnp.concatenate([a_lo, a_hi, a_cr], axis=0))
        r_pieces.append(jnp.concatenate(
            [jnp.concatenate(lows, axis=1),
             jnp.concatenate(highs, axis=1),
             jnp.concatenate(crs, axis=1)], axis=0))   # (2r+1, NP*512)

    aT = jnp.concatenate(a_pieces, axis=0)             # (R*(2r+1), M)
    rhs = jnp.concatenate(r_pieces, axis=0)            # (R*(2r+1), NP*512)
    g = jax.lax.dot_general(aT, rhs, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gi = g.astype(jnp.int32)                           # (M, NP*512)
    packed = []
    for p in range(NP):
        o = p * 4 * LANES
        packed.append(gi[:, o:o + LANES]
                      | (gi[:, o + LANES:o + 2 * LANES] << 8)
                      | (gi[:, o + 2 * LANES:o + 3 * LANES] << 16)
                      | (gi[:, o + 3 * LANES:o + 4 * LANES] << 24))
    stage[...] = jnp.concatenate(packed, axis=0)       # (NP*M, 128)

    # ---- flush each bucket: full rows stream out, tails carry over.
    for b in range(radix):
        e = base_ref[b, t]
        cl = cls[b]
        k_rows = k_rows_l[b]
        reg = regs[b]
        gstart = _div_lanes(e)
        fw = _div_lanes(base_ref[b, 0])
        unaligned = _mod_lanes(base_ref[b, 0]) != 0
        first_here = jnp.logical_and(gstart == fw, unaligned)
        skip = jnp.where(first_here, jnp.int32(1), jnp.int32(0))

        # stash the digit's (never-DMA'd) first row for the epilogue
        @pl.when(jnp.logical_and(first_here, k_rows >= 1))
        def _(b=b, reg=reg):
            for p in range(NP):
                heads_ref[p * radix + b:p * radix + b + 1, :] = (
                    stage[pl.ds(p * M + reg, 1), :])

        # a first writer that has not yet crossed its row boundary has
        # k_rows=0, skip=1 — clamp so the bit-decomposed DMA emitter
        # never sees -1.
        cnt_rows = jnp.maximum(k_rows - skip, jnp.int32(0))
        for j in range(nbits):
            @pl.when(((cnt_rows >> j) & 1) == 1)
            def _(b=b, j=j, cnt_rows=cnt_rows, skip=skip, gstart=gstart,
                  reg=reg):
                off = jax.lax.shift_right_logical(
                    cnt_rows, jnp.int32(j + 1)) << (j + 1)
                for p in range(NP):
                    cp = pltpu.make_async_copy(
                        stage.at[pl.ds(p * M + reg + skip + off,
                                       1 << j), :],
                        outs[p].at[pl.ds(gstart + skip + off,
                                         1 << j), :],
                        sems)
                    cp.start()
                    cp.wait()

        # new carries = the (k_rows)-th region rows (partial tails; junk
        # past (cl+c)%128 is masked on the next use).
        for p in range(NP):
            tails_s[p * radix + b:p * radix + b + 1, :] = (
                stage[pl.ds(p * M + reg + k_rows, 1), :])

    # ---- last step: export final carries for the XLA epilogue.
    @pl.when(t == B - 1)
    def _finish():
        tails_out_ref[...] = tails_s[...]


def _radix_pass(planes, base_tbl, cnt_tbl, radix, rows, shift):
    """Run one streaming radix pass over a tuple of int32 planes (digits
    from plane 0; every plane permuted identically).  ``shift`` may be a
    traced int32 scalar — the kernel is shift-dynamic so all passes share
    one compile.  Returns (outs, heads, tails); boundary rows still need
    :func:`_boundary_fixup` per plane."""
    planes = tuple(planes)
    NP = len(planes)
    n = planes[0].shape[0]
    B = n // (rows * LANES)
    M = rows + 2 * radix
    # per-bucket DMA'd rows never exceed ``rows`` (a full tile)
    NBITS = max(1, int(np.ceil(np.log2(rows + 2))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        # np.int32 block-index constants: under jax_enable_x64 (the u64
        # paths) a python-int 0 traces to a weak i64 in the index-map
        # transform, which Mosaic cannot legalize
        in_specs=[pl.BlockSpec((rows, LANES),
                               lambda t, *_: (t, np.int32(0)),
                               memory_space=pltpu.VMEM)] * NP,
        out_specs=(
            tuple([pl.BlockSpec(memory_space=pl.ANY)] * NP)
            + (pl.BlockSpec((NP * radix, LANES),
                            lambda t, *_: (np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((NP * radix, LANES),
                            lambda t, *_: (np.int32(0), np.int32(0)),
                            memory_space=pltpu.VMEM))
        ),
        scratch_shapes=[
            pltpu.VMEM((NP * radix, LANES), jnp.int32),
            pltpu.VMEM((NP * M, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    sh = jnp.reshape(jnp.asarray(shift, jnp.int32), (1,))
    res = pl.pallas_call(
        functools.partial(_pass_kernel, radix=radix, rows=rows,
                          nbits=NBITS, nplanes=NP),
        grid_spec=grid_spec,
        out_shape=(
            tuple([jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32)]
                  * NP)
            + (jax.ShapeDtypeStruct((NP * radix, LANES), jnp.int32),
               jax.ShapeDtypeStruct((NP * radix, LANES), jnp.int32))
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # unrolled per-bucket temporaries exceed the default 16 MiB
            # scoped-vmem budget; v5e allows raising it
            vmem_limit_bytes=100 * 1024 * 1024),
        # the generic interpreter mishandles multiple DMAs to an ANY
        # output (only the last lands); the TPU-model interpreter is
        # faithful to semaphore/DMA semantics.
        interpret=(pltpu.InterpretParams() if _interpret() else False),
    )(sh, base_tbl, cnt_tbl,
      *(p.reshape(n // LANES, LANES) for p in planes))
    outs = res[:NP]
    heads, tails = res[NP], res[NP + 1]
    return outs, heads, tails


def _boundary_fixup(out2d, heads, tails, dstart, totals, radix):
    """Reconstruct the per-digit boundary rows the kernel never writes.

    For each digit: its start row (if unaligned) and its end row (if
    partial) are assembled from the exported head/tail rows of every digit
    intersecting that row, then written with dynamic_update_slice — ≤2R
    row-sized updates.
    """
    dend = dstart + totals
    li = jnp.arange(LANES, dtype=jnp.int32)[None, :]          # (1, 128)

    def assemble(w):
        """Full content of global row ``w`` from heads/tails."""
        gpos = w * LANES + li                                  # (1,128)
        acc = jnp.zeros((1, LANES), jnp.int32)
        for d in range(radix):
            in_d = jnp.logical_and(gpos >= dstart[d], gpos < dend[d])
            starts_here = dstart[d] // LANES == w
            extends = dend[d] >= (w + 1) * LANES
            use_head = jnp.logical_and(starts_here, extends)
            src = jnp.where(use_head, heads[d:d + 1, :],
                            tails[d:d + 1, :])
            acc = jnp.where(in_d, src, acc)
        return acc

    for d in range(radix):
        ws = dstart[d] // LANES
        we = dend[d] // LANES
        # start row needs fixup iff unaligned; end row iff partial.  The
        # update is idempotent (assemble() rebuilds the full row), so
        # applying it unconditionally to a neighbouring full row would be
        # wrong only if that row was kernel-written — guard by redirecting
        # no-op cases onto the (always-in-fixup-set) start row.
        w1 = jnp.where(jnp.remainder(dstart[d], LANES) != 0, ws, -1)
        w2 = jnp.where(jnp.remainder(dend[d], LANES) != 0, we, -1)
        for w in (w1, w2):
            row = assemble(jnp.maximum(w, 0))
            wc = jnp.maximum(w, 0).astype(jnp.int32)
            zero = jnp.zeros((), jnp.int32)
            cur = jax.lax.dynamic_slice(out2d, (wc, zero), (1, LANES))
            upd = jnp.where(w >= 0, row, cur)
            out2d = jax.lax.dynamic_update_slice(out2d, upd, (wc, zero))
    return out2d


def _one_pass(cur, radix, rows, padded, shift):
    """One streaming pass over a tuple of padded int32 planes: digits come
    from plane 0 at ``shift``; every plane rides the identical stable
    permutation.  Returns (planes_out, per-digit totals).  Degenerate
    passes (all elements share the digit) collapse to identity — the
    reference's CPU early-exit (CRadixSortCPU.h) done on device."""
    from . import pallas_radix as pr

    tile = rows * LANES
    B = padded // tile

    digits = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(cur[0], jnp.uint32),
        jnp.uint32(shift)).astype(jnp.int32) & (radix - 1)
    hist = pr.digit_histogram(digits, radix, tile)        # (B, R)
    totals = jnp.sum(hist, axis=0, dtype=jnp.int32)
    flat = hist.T.reshape(-1)
    scanned = pr.exclusive_scan(flat)
    # (R, B) digit-major: the kernel's SMEM-prefetch layout (see
    # _pass_kernel docstring — (B, R) lane-pads 8x and busts scoped smem).
    base_tbl = scanned.reshape(radix, B).astype(jnp.int32)
    dstart = base_tbl[:, 0]

    def run_pass(cur):
        outs, heads, tails = _radix_pass(
            cur, base_tbl, hist.T.astype(jnp.int32), radix, rows, shift)
        fixed = []
        for p in range(len(cur)):
            o = _boundary_fixup(
                outs[p], heads[p * radix:(p + 1) * radix],
                tails[p * radix:(p + 1) * radix], dstart, totals,
                radix)
            fixed.append(o.reshape(-1))
        return tuple(fixed)

    degenerate = jnp.max(totals) == padded
    return jax.lax.cond(degenerate, lambda c: c, run_pass, cur), totals


def _sort_planes(planes, digit_sel, radix, rows, n, padded):
    """Generic streaming LSD driver: ``planes`` is a tuple of padded int32
    planes; ``digit_sel`` gives, per pass, (plane_index, shift).  Digits
    always come from plane 0 inside the kernel, so the driver reorders
    planes per pass (free renaming in XLA) — one kernel compile serves
    every pass, dtype width, and payload count.
    """
    NP = len(planes)
    for p_idx, shift in digit_sel:
        order = (p_idx,) + tuple(i for i in range(NP) if i != p_idx)
        inv = tuple(order.index(i) for i in range(NP))
        cur = tuple(planes[i] for i in order)
        cur, _ = _one_pass(cur, radix, rows, padded, shift)
        planes = tuple(cur[inv[i]] for i in range(NP))
    return planes


def _pad_planes(arrs, fills, tile):
    n = arrs[0].shape[0]
    padded = max(tile, -(-n // tile) * tile)
    out = []
    for a, f in zip(arrs, fills):
        if padded != n:
            a = jnp.concatenate([a, jnp.full((padded - n,), f, a.dtype)])
        out.append(jax.lax.bitcast_convert_type(a, jnp.int32))
    return tuple(out), padded


def _round_rows(n: int, rows: int, radix: int = 16) -> int:
    """Clamp the requested grid-step height to the input and round UP to a
    sublane multiple: the histogram/scan kernels tile (8, 128) sublane
    blocks, so the grid-step height must be 8-aligned (and at least one
    sublane group).

    Also enforces the scoped-SMEM bound: the two (R, B) prefetch tables
    cost 2*R*B*4 bytes of SMEM (B 128-padded), and v5e's scoped smem is
    1 MiB — measured overflow at n=2^24/rows=128 with the old (B, R)
    layout (docs/PROBES.md r4).  Capping R*B <= 65536 (512 KiB of
    tables) auto-raises ``rows`` with n.  The cap interacts with a
    scoped-VMEM ceiling on ``rows`` itself: at 2^27/R=16 the old 32768
    cap forced rows=512, whose kernel stack needs 27.7 MiB of the
    16 MiB scoped vmem (measured r5, results_r5/stream_partition_2e27
    logs) — 65536 admits rows=256, which fits BOTH budgets (512 KiB
    tables, ~14 MiB stack; hardware-validated at 2^27 r5)."""
    min_rows = -(-(n * radix) // (LANES * 65536))
    return -(-max(8, min_rows, min(rows, -(-n // LANES))) // 8) * 8


def _next_pow2(v: int) -> int:
    p = 1
    while p < v:
        p <<= 1
    return p


def _key_word_planes(keys_u):
    """Split an unsigned key vector into uint32 word planes (LSD order)
    plus their max-sentinel pad fills: one plane for 32-bit keys, (lo, hi)
    for 64-bit — no 64-bit vector ops ever reach Mosaic."""
    if np.dtype(keys_u.dtype).itemsize == 4:
        return (keys_u,), (jnp.uint32(0xFFFFFFFF),)
    lo = (keys_u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = jax.lax.shift_right_logical(
        keys_u, jnp.uint64(32)).astype(jnp.uint32)
    return (lo, hi), (jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF))


def _join_key_word_planes(word_planes_i32, dtype, n):
    """Rebuild keys from sorted int32 word planes (inverse of
    :func:`_key_word_planes`), sliced to ``n``."""
    if np.dtype(dtype).itemsize == 4:
        return jax.lax.bitcast_convert_type(word_planes_i32[0],
                                            jnp.uint32)[:n]
    lo_u = jax.lax.bitcast_convert_type(word_planes_i32[0], jnp.uint32)[:n]
    hi_u = jax.lax.bitcast_convert_type(word_planes_i32[1], jnp.uint32)[:n]
    return (hi_u.astype(jnp.uint64) << jnp.uint64(32)) | lo_u.astype(
        jnp.uint64)


def sort_planes(keys_u, payload_planes_i32=(), radix: int = 16,
                rows: int = 128, total_bits: int | None = None):
    """Generic stable LSD sort: unsigned 32/64-bit keys plus ANY number of
    int32 payload planes, all riding the identical permutation every pass
    (the N-plane capability the reference's PERMUT machinery stubbed out,
    src/RadixSortGPU.cpp:578).  Returns (keys_out, payload_planes_out).

    Pads to a tile multiple with the max sentinel; each pass is histogram
    (pallas_radix kernels) → digit-major scan → streaming scatter kernel →
    XLA boundary fixup; degenerate passes are skipped.

    ``total_bits`` caps the sorted key width when the caller KNOWS every
    key is < 2**total_bits (the reference's data-dependent pass count,
    src/CRadixSortCPU.h:57-72, as a static hint): fewer passes traced,
    not just skipped.
    """
    n = keys_u.shape[0]
    rows = _round_rows(n, rows, radix)
    kplanes, kfills = _key_word_planes(keys_u)
    nk = len(kplanes)
    planes, padded = _pad_planes(
        kplanes + tuple(payload_planes_i32),
        kfills + (jnp.int32(0),) * len(payload_planes_i32), rows * LANES)
    bits_per = int(np.log2(radix))
    kbits = 8 * np.dtype(keys_u.dtype).itemsize if total_bits is None \
        else total_bits
    sel = []
    for w in range(nk):
        wbits = min(32, kbits - 32 * w)
        sel += [(w, p * bits_per) for p in range(-(-wbits // bits_per))]
    out = _sort_planes(planes, sel, radix, rows, n, padded)
    keys_out = _join_key_word_planes(out[:nk], keys_u.dtype, n)
    return keys_out, tuple(v[:n] for v in out[nk:])


def partition_planes(bucket_ids, planes_i32, num_buckets: int,
                     rows: int = 128):
    """Streaming stable partition: ONE radix pass moves every plane into
    bucket-major order — 2 passes/byte of HBM traffic where a
    ``lax.sort``-backed stable partition pays a full sort network.

    ``bucket_ids`` must be int32-representable in [0, num_buckets) — this
    is a CONTRACT, not a checked precondition: the kernel extracts the
    bucket as ``ids & (radix-1)``, so out-of-range ids silently WRAP into
    low buckets, unlike stable_partition(method="sort") which orders them
    after every valid bucket (the virtual-bucket tail pattern
    exchange.ragged_all_to_all relies on; ADVICE r3).
    Padding rows carry bucket id ``num_buckets - 1``: stability puts them
    after every real row of the last bucket, i.e. exactly at positions
    [n, padded) — so outputs slice to [:n] and only the last bucket's
    count needs the pad correction.

    Returns (partitioned planes [:n], counts (num_buckets,) int32).
    """
    n = bucket_ids.shape[0]
    radix = max(2, _next_pow2(num_buckets))
    rows = _round_rows(n, rows, radix)
    ids = bucket_ids.astype(jnp.int32)
    planes, padded = _pad_planes(
        (ids,) + tuple(planes_i32),
        (jnp.int32(num_buckets - 1),) + (jnp.int32(0),) * len(planes_i32),
        rows * LANES)
    out, totals = _one_pass(planes, radix, rows, padded, jnp.int32(0))
    pad_fix = jnp.where(
        jnp.arange(num_buckets, dtype=jnp.int32) == num_buckets - 1,
        jnp.int32(padded - n), jnp.int32(0))
    counts = totals[:num_buckets] - pad_fix
    return tuple(v[:n] for v in out[1:]), counts


def payloads_to_planes(payloads):
    """Map 1-D payload arrays to int32 planes: 4-byte dtypes bitcast to one
    plane, 8-byte dtypes split into (lo, hi) word planes.  Returns
    (planes, specs) for :func:`planes_to_payloads`, or (None, None) when a
    dtype is not plane-representable (caller falls back)."""
    planes, specs = [], []
    for p in payloads:
        isz = np.dtype(p.dtype).itemsize
        if isz == 4:
            planes.append(jax.lax.bitcast_convert_type(p, jnp.int32))
            specs.append((np.dtype(p.dtype), 1))
        elif isz == 8:
            w = jax.lax.bitcast_convert_type(p, jnp.int32)   # (n, 2)
            planes.append(w[:, 0])
            planes.append(w[:, 1])
            specs.append((np.dtype(p.dtype), 2))
        else:
            return None, None
    return tuple(planes), tuple(specs)


def planes_to_payloads(planes, specs):
    """Inverse of :func:`payloads_to_planes`."""
    out, i = [], 0
    for dtype, k in specs:
        if k == 1:
            out.append(jax.lax.bitcast_convert_type(planes[i], dtype))
        else:
            w = jnp.stack([planes[i], planes[i + 1]], axis=-1)  # (n, 2)
            out.append(jax.lax.bitcast_convert_type(w, dtype))  # (n,)
        i += k
    return tuple(out)


def sort_u32_keys(keys_u32: jnp.ndarray, radix: int = 16,
                  rows: int = 128) -> jnp.ndarray:
    """Full LSD sort of uint32 keys via streaming passes (key-only)."""
    return sort_planes(keys_u32, (), radix, rows)[0]


def sort_u32_kv(keys_u32: jnp.ndarray, values_i32: jnp.ndarray,
                radix: int = 16, rows: int = 128):
    """Stable KV sort: the payload plane rides the identical permutation
    through every pass (the capability the reference stubbed out —
    PERMUT, src/RadixSortGPU.cpp:578)."""
    ko, (vo,) = sort_planes(keys_u32, (values_i32,), radix, rows)
    return ko, vo


def sort_u64_kv(keys_u64: jnp.ndarray, values_i32: jnp.ndarray,
                radix: int = 16, rows: int = 128):
    """Stable 64-bit KV sort: (lo, hi) key planes + one payload plane all
    ride the same per-pass permutation (BASELINE config2's u64 KV shape on
    the streaming engine)."""
    ko, (vo,) = sort_planes(keys_u64, (values_i32,), radix, rows)
    return ko, vo


def sort_u64_keys(keys_u64: jnp.ndarray, radix: int = 16,
                  rows: int = 128) -> jnp.ndarray:
    """64-bit sort as two 32-bit planes: low-word passes first, then
    high-word passes (LSD order), both planes permuted together."""
    return sort_planes(keys_u64, (), radix, rows)[0]
