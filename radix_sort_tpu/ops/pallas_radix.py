"""Pallas TPU kernels for the radix-sort hot path.

TPU-native re-design of the reference's four OpenCL kernels
(``src/kernels/RadixSort.cl``):

  reference kernel                      TPU kernel here
  --------------------------------      -----------------------------------
  histogram      (RadixSort.cl:16)  →   digit_histogram: grid over blocks,
                                        VMEM one-hot reduction; wide radix
                                        (R > 32) uses a two-level one-hot
                                        MXU matmul (hi x lo digit outer
                                        product) so the VPU only builds two
                                        narrow one-hots per element.
  scanhistograms (RadixSort.cl:125) →   exclusive_scan: TPU grids execute
  pastehistograms(RadixSort.cl:185)     sequentially on a core, so the
                                        two-level Blelloch split + paste
                                        collapses into ONE kernel with a
                                        carry register in scratch — no
                                        barriers, no second dispatch.
  reorder        (RadixSort.cl:74)  →   rank_pass (fused digit+rank): each
                                        element's stable destination is
                                        computed in-kernel (row-histogram
                                        prefix + in-row lane cumsum); the
                                        HBM permutation itself is applied by
                                        XLA scatter (a dedicated Pallas
                                        scatter is the planned next step).

All kernels are digit-typed (int32 digits extracted outside), so one kernel
set serves u32/i32/u64/i64/f32/f64 keys — the reference needed per-type
recompilation of its OpenCL program (src/RadixSortGPU.cpp:432-442).

Mosaic tiling note: per-block histogram rows use 3-D blocks with singleton
or array-equal trailing dims — (1, 1, R) and (1, R//16, 16) — which satisfy
the "divisible by (8, 128) or equal to the array dim" rule without padding
games; the wide path writes its (R//16, 16) MXU tile directly (an
in-register (16,16)→(1,256) reshape is not relayout-legal on TPU) and XLA
flattens it outside the kernel, where hi*16+lo row-major order equals the
digit value.

Kernels run compiled on TPU and in interpret mode on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import dtypes
from ..config import SortConfig

LANES = 128
SUBLANES = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _incl_cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive prefix sum along ``axis`` via Hillis-Steele shift-adds.
    Mosaic has no native cumsum lowering, and pad/concat relayouts are
    fragile — use pltpu.roll (circular) plus an index mask instead."""
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    sh = 1
    while sh < n:
        if _interpret():
            rolled = jnp.roll(x, sh, axis=axis)
        else:
            rolled = pltpu.roll(x, shift=np.int32(sh), axis=axis)
        x = x + jnp.where(idx >= sh, rolled, jnp.int32(0))
        sh <<= 1
    return x


def _row_rank_eq(d: jnp.ndarray) -> jnp.ndarray:
    """Stable in-row rank among equal digits via a masked equality matrix
    (cheaper than a 3-D one-hot cumsum: 128 vs R ops/element, and no
    cumsum over a 3-D layout).  Shared by the rank kernel here and the
    streaming engine's partition (ops/pallas_stream.py).

    d: (rows, 128) int32 → (rows, 128) int32, rank[r, l] = #{l' < l :
    d[r, l'] == d[r, l]}.
    """
    rows = d.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 2)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 1)
    # chunk over row groups: the (chunk, 128, 128) equality tensor at
    # chunk=8 is 512 KB — keeps VMEM pressure flat for any tile height.
    ch = min(8, rows)
    outs = []
    for r0 in range(0, rows, ch):
        dd = d[r0:r0 + ch]
        eq = dd[:, :, None] == dd[:, None, :]            # (ch, l, l')
        outs.append(jnp.sum(
            jnp.logical_and(eq, jj < ii).astype(jnp.int32), axis=2,
            dtype=jnp.int32, promote_integers=False))
    return jnp.concatenate(outs, axis=0)


# --------------------------------------------------------------- histogram

def _hist_kernel_narrow(d_ref, out_ref, *, radix):
    """R <= 32: direct one-hot reduction on the VPU."""
    d = d_ref[...]                                   # (Mr, 128) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, radix), 2)
    oh = (d[:, :, None] == iota).astype(jnp.int32)   # (Mr, 128, R)
    # chained single-axis sums with pinned int32: under jax_enable_x64 a
    # multi-axis integer reduce_sum re-traces through promoting jnp ops
    # inside Mosaic and dies on the int64
    per_row = jnp.sum(oh, axis=1, dtype=jnp.int32,
                      promote_integers=False)        # (Mr, R)
    out_ref[...] = jnp.sum(per_row, axis=0, keepdims=True,
                           dtype=jnp.int32,
                           promote_integers=False).reshape(1, 1, radix)


def _hist_kernel_wide(d_ref, out_ref, *, radix):
    """R a multiple of 16 (up to 256) via a one-hot outer product on the
    MXU: counts[hi, lo] = onehot_hi^T @ onehot_lo, exact in f32."""
    d = d_ref[...].reshape(-1)                       # (M,) int32
    h = radix // 16
    hi = d >> 4
    lo = d & 15
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
    oh_hi = (hi[:, None] == iota_h).astype(jnp.float32)   # (M, h)
    oh_lo = (lo[:, None] == iota16).astype(jnp.float32)   # (M, 16)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (h, 16)
    out_ref[...] = counts.astype(jnp.int32).reshape(1, h, 16)


def digit_histogram(digits: jnp.ndarray, radix: int,
                    block_elems: int) -> jnp.ndarray:
    """Per-block digit counts: (N,) int32 digits → (B, R) int32.

    N must be a multiple of block_elems (a multiple of 8*128); radix <= 32,
    or a multiple of 16 up to 256.
    """
    n = digits.shape[0]
    assert block_elems % (SUBLANES * LANES) == 0
    assert n % block_elems == 0, (n, block_elems)
    B = n // block_elems
    rows = block_elems // LANES
    if radix > 256:
        raise ValueError("digit_histogram supports radix <= 256")
    d2 = digits.reshape(B * rows, LANES)
    if radix <= 32:
        out = pl.pallas_call(
            functools.partial(_hist_kernel_narrow, radix=radix),
            grid=(B,),
            in_specs=[pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, 1, radix),
                lambda b: (b, np.int32(0), np.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1, radix), jnp.int32),
            interpret=_interpret(),
        )(d2)
        return out.reshape(B, radix)
    if radix % 16:
        raise ValueError("wide histogram path needs radix % 16 == 0")
    h = radix // 16
    out = pl.pallas_call(
        functools.partial(_hist_kernel_wide, radix=radix),
        grid=(B,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, h, 16), lambda b: (b, np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, 16), jnp.int32),
        interpret=_interpret(),
    )(d2)
    # row-major (hi, lo) flatten == digit value hi*16+lo.
    return out.reshape(B, radix)


# ------------------------------------------------------------------- scan

def _scan_kernel(x_ref, out_ref, carry_ref):
    """Exclusive scan of one (8, 128) chunk in row-major element order,
    plus carry from all previous chunks (sequential grid ≡ the reference's
    scan+paste pair collapsed into one kernel)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = jnp.int32(0)

    x = x_ref[...].astype(jnp.int32)                 # (8, 128)
    row = _incl_cumsum(x, axis=1)                    # in-row inclusive
    # exclusive prefix over rows, kept (8, 128)-shaped throughout (narrow
    # column vectors hit Mosaic relayout limits).
    t = jnp.broadcast_to(row[:, LANES - 1:LANES], row.shape)
    rp = _incl_cumsum(t, axis=0) - t
    excl = row - x + rp + carry_ref[0, 0]
    out_ref[...] = excl
    # chained single-axis sums: under jax_enable_x64 Mosaic re-traces a
    # MULTI-axis integer reduce_sum through promoting jnp ops and dies on
    # the resulting int64 (single-axis int sums lower fine).
    tot = jnp.sum(jnp.sum(x, axis=1, keepdims=True, dtype=jnp.int32,
                          promote_integers=False),
                  axis=0, keepdims=True, dtype=jnp.int32,
                  promote_integers=False)
    carry_ref[0, 0] = carry_ref[0, 0] + tot[0, 0]


def exclusive_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum of a 1-D int32 array via a single carry-chained
    Pallas kernel (scanhistograms+pastehistograms equivalent).  Pads
    internally to a multiple of 8*128."""
    n = x.shape[0]
    chunk = SUBLANES * LANES
    padded = -(-max(n, 1) // chunk) * chunk
    xp = jnp.pad(x.astype(jnp.int32), (0, padded - n))
    out = pl.pallas_call(
        _scan_kernel,
        grid=(padded // chunk,),
        in_specs=[pl.BlockSpec((SUBLANES, LANES), lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBLANES, LANES), lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded // LANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=_interpret(),
    )(xp.reshape(padded // LANES, LANES))
    return out.reshape(-1)[:n]


# ------------------------------------------------------------------- rank

def _rank_kernel(d_ref, base_ref, out_ref, *, radix):
    """Fused stable-destination kernel for one block.

    dest[i] = base[block, d_i]                       (global scan input)
            + row_prefix[row(i), d_i]                (rows before mine)
            + in_row_rank[i]                         (lanes before mine)
    """
    d = d_ref[...]                                   # (Mr, 128) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, radix), 2)
    oh = (d[:, :, None] == iota).astype(jnp.int32)   # (Mr, 128, R)
    row_hist = jnp.sum(oh, axis=1, dtype=jnp.int32,
                       promote_integers=False)       # (Mr, R)
    row_prefix = _incl_cumsum(row_hist, axis=0) - row_hist
    in_row = _row_rank_eq(d)                         # (Mr, 128)
    # offsets select: (global base + rows-before-mine) at my digit.
    base_row = base_ref[...].reshape(1, radix)       # (1, R)
    sel = row_prefix + base_row                      # (Mr, R)
    off = jnp.sum(sel[:, None, :] * oh, axis=2, dtype=jnp.int32,
                  promote_integers=False)            # (Mr, 128)
    out_ref[...] = off + in_row


def rank_pass(digits: jnp.ndarray, block_base: jnp.ndarray, radix: int,
              block_elems: int) -> jnp.ndarray:
    """Stable destinations for one radix pass.

    digits: (N,) int32; block_base: (B, R) int32 — global exclusive offsets
    per (block, digit), digit-major stitched outside.  Returns (N,) int32.

    VMEM budget: the (Mr,128,R) one-hot must fit — block_elems * R * 4 bytes
    (a few live copies); callers size blocks accordingly.
    """
    n = digits.shape[0]
    assert n % block_elems == 0
    B = n // block_elems
    rows = block_elems // LANES
    out = pl.pallas_call(
        functools.partial(_rank_kernel, radix=radix),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, radix),
                lambda b: (b, np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda b: (b, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * rows, LANES), jnp.int32),
        interpret=_interpret(),
    )(digits.reshape(B * rows, LANES), block_base.reshape(B, 1, radix))
    return out.reshape(-1)


# ------------------------------------------------------------- full sort

def _stitch_block_base(counts: jnp.ndarray) -> jnp.ndarray:
    """(B, R) per-block counts → (B, R) global exclusive offsets with the
    stability-preserving digit-major layout (RadixSort.cl:69): scan the
    transposed (R, B) flat histogram, transpose back."""
    B, R = counts.shape
    flat = counts.T.reshape(-1)                      # digit-major
    scanned = exclusive_scan(flat)
    return scanned.reshape(R, B).T


def sort_biased(keys_u: jnp.ndarray, payloads, config: SortConfig, n: int):
    """LSD radix sort of biased unsigned keys using the Pallas kernels for
    histogram/scan/rank and XLA scatter for the permutation apply."""
    from . import ranking, sort as sort_ops

    total_bits = dtypes.key_bits(keys_u.dtype)
    R = config.radix
    # Blocks sized to the rank kernel's VMEM budget (one-hot = M*R*4 bytes,
    # a few live copies → keep M*R ≤ 2^19, i.e. ≤2 MB per temporary).
    block = config.block_elems
    unit = SUBLANES * LANES
    while block * R > (1 << 19) and block > unit:
        # halve, then round down to the vector-tile multiple the kernels
        # require (a plain halving of e.g. 3072 would leave 1536, which is
        # not a multiple of 1024).
        block = max(unit, (block // 2) // unit * unit)
    padded = -(-max(n, 1) // block) * block
    sent = dtypes._np_scalar(np.dtype(keys_u.dtype),
                             dtypes.sentinel_max_unsigned(keys_u.dtype))
    ku = sort_ops._pad_1d(keys_u, padded, sent)
    pls = tuple(sort_ops._pad_1d(p, padded, 0) for p in payloads)

    arrays = (ku,) + pls
    for p in range(total_bits // config.bits_per_pass):
        shift = p * config.bits_per_pass
        ku = arrays[0]
        digits = ((ku >> dtypes._np_scalar(np.dtype(ku.dtype), shift))
                  & dtypes._np_scalar(np.dtype(ku.dtype), R - 1)
                  ).astype(jnp.int32)
        counts = digit_histogram(digits, R, block)
        base = _stitch_block_base(counts)
        dest = rank_pass(digits, base, R, block)
        arrays = ranking.apply_destinations(dest, arrays)
    return arrays[0][:n], tuple(a[:n] for a in arrays[1:])
