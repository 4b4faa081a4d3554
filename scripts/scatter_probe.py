"""Round-2 hardware probe for the Pallas radix-scatter design space.

Extends scripts/pallas_capability_probe.py with the *quantitative* questions
the scatter design hinges on (docs/DESIGN.md §2.2 options a/c):

  cap-1dma   1-D element-granular DMA: HBM→HBM and VMEM→HBM copies at
             dynamic, NON-row-aligned element offsets.  If this passes, the
             ragged per-(block,bucket) write needs no capacity padding and
             leaves no holes.
  cap-dynvmem  dynamic-sublane-offset VMEM load/store (+ read-modify-write)
             — the primitive for in-VMEM bucket staging.
  dma-rate   HBM→HBM copy bandwidth vs chunk size (512 B … 64 KB) with
             NBUF outstanding DMAs — prices the per-DMA overhead that sets
             the minimum viable (block, bucket) segment size.
  kernels    hardware throughput of the existing Pallas radix kernels
             (digit_histogram / exclusive_scan / rank_pass) — the VPU-side
             cost that bounds any rank-based engine (VERDICT weak #3).
  mxu-perm   exactness + throughput of permutation-apply via one-hot MXU
             matmuls (bf16 lane-index trick, f32 16-bit-half trick).

Timing uses the tunnel-safe chained method (CLAUDE.md): R reps chained
through a fori_loop data dependency inside one jit, per-op =
(T(R)-T(1))/(R-1), synced via np.asarray(out[:1]).

Run on the real chip:  python scripts/scatter_probe.py [--only NAME]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ------------------------------------------------------------------ timing

def timed_chain(fn, x, reps=8, iters=3):
    """Tunnel-safe per-op seconds for y = fn(x) with y.shape == x.shape."""
    def chained(r):
        return jax.jit(lambda a: jax.lax.fori_loop(
            0, r, lambda _, v: fn(v), a))

    f1, fr = chained(1), chained(reps)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0][:1])

    sync(f1(x)); sync(fr(x))
    t1 = tr = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); sync(f1(x))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(fr(x))
        tr = min(tr, time.perf_counter() - t0)
    return max(1e-9, (tr - t1) / (reps - 1))


def report(name, fn):
    try:
        msg = fn()
        print(f"{name}: {msg}", flush=True)
    except Exception as e:  # noqa: BLE001
        with open(f"/tmp/probe_err_{name}.log", "w") as f:
            f.write(str(e))
        m = str(e).replace("\n", " ")[:300]
        print(f"{name}: FAIL {type(e).__name__}: {m} "
              f"[full: /tmp/probe_err_{name}.log]", flush=True)


# ------------------------------------------------------- cap: 1-D ragged DMA

def cap_1d_hbm_to_hbm():
    """1-D HBM→HBM DMA, dynamic misaligned element offsets on both sides."""
    n = 1 << 16
    L = 4096

    def k(off_ref, in_hbm, out_hbm, sem):
        src = off_ref[0]
        dst = off_ref[1]
        cp = pltpu.make_async_copy(
            in_hbm.at[pl.ds(src, L)], out_hbm.at[pl.ds(dst, L)], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(n, dtype=jnp.int32)
    # deliberately NOT multiples of 128 (nor 8)
    off = jnp.asarray(np.array([1234, 77], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[77:77 + L]
    exp = np.arange(1234, 1234 + L, dtype=np.int32)
    return "PASS" if np.array_equal(got, exp) else "WRONG-RESULT"


def cap_1d_vmem_to_hbm():
    """VMEM (1-D) → HBM (1-D) DMA at a dynamic misaligned element offset —
    the exact shape of the ragged bucket-segment writeback."""
    n = 1 << 16
    L = 2048

    def k(off_ref, x_ref, out_hbm, sem):
        dst = off_ref[0]
        cp = pltpu.make_async_copy(x_ref, out_hbm.at[pl.ds(dst, L)], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(L, dtype=jnp.int32) + 5
    off = jnp.asarray(np.array([321], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[321:321 + L]
    return "PASS" if np.array_equal(got, np.arange(L) + 5) else "WRONG-RESULT"


def cap_1d_vmem_slice_to_hbm():
    """VMEM 1-D *sub-slice* (dynamic start) → HBM 1-D dynamic offset: the
    per-(block,bucket) segment copy out of a dense staging buffer."""
    n = 1 << 16
    SEG = 512

    def k(off_ref, x_ref, out_hbm, sem):
        src = off_ref[0]
        dst = off_ref[1]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(src, SEG)], out_hbm.at[pl.ds(dst, SEG)], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(1 << 14, dtype=jnp.int32)
    off = jnp.asarray(np.array([333, 99], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[99:99 + SEG]
    return ("PASS" if np.array_equal(got, np.arange(333, 333 + SEG))
            else "WRONG-RESULT")


# --------------------------------------------- cap: dynamic-sublane VMEM RMW

def cap_dyn_sublane_store():
    S = 256

    def k(off_ref, x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        o = off_ref[0]
        o_ref[pl.ds(o, 8), :] = x_ref[0:8, :]
        # read-modify-write at a second dynamic offset
        o2 = off_ref[1]
        cur = o_ref[pl.ds(o2, 8), :]
        o_ref[pl.ds(o2, 8), :] = cur + x_ref[8:16, :]

    x = jnp.asarray(np.arange(16 * LANES, dtype=np.int32).reshape(16, LANES))
    off = jnp.asarray(np.array([37, 45], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(off, x)
    got = np.asarray(out)
    ref = np.zeros((S, LANES), np.int32)
    xn = np.asarray(x)
    ref[37:45] = xn[0:8]
    ref[45:53] += xn[8:16]
    return "PASS" if np.array_equal(got, ref) else "WRONG-RESULT"


# ------------------------------------------------------------- dma-rate

def dma_rate():
    """HBM→HBM copy of 2^22 int32 in K chunks of S rows, NBUF outstanding.
    Reports effective GB/s (read+write) per chunk size."""
    NROWS = (1 << 22) // LANES        # 32768 rows, 16 MiB
    NBUF = 8
    lines = []
    for S in (1, 2, 8, 32, 128):
        K = NROWS // S
        rng = np.random.default_rng(0)
        order = rng.permutation(K).astype(np.int32)

        def kern(ord_ref, in_hbm, out_hbm, sems, *, S=S, K=K):
            def dma(i):
                o = ord_ref[i] * S
                return pltpu.make_async_copy(
                    in_hbm.at[pl.ds(o, S), :],
                    out_hbm.at[pl.ds(o, S), :],
                    sems.at[i % NBUF])

            for j in range(NBUF):
                dma(j).start()

            def body(i, c):
                dma(i).wait()

                @pl.when(i + NBUF < K)
                def _():
                    dma(i + NBUF).start()
                return c
            jax.lax.fori_loop(0, K, body, jnp.int32(0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        )
        call = pl.pallas_call(
            functools.partial(kern),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NROWS, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
        ordd = jnp.asarray(order)

        fn = lambda v: call(ordd, v)  # noqa: E731
        x = jnp.arange(NROWS * LANES, dtype=jnp.int32).reshape(NROWS, LANES)
        # correctness once
        got = np.asarray(fn(x)[:256])
        if not np.array_equal(got, np.asarray(x[:256])):
            lines.append(f"S={S}: WRONG-RESULT")
            continue
        # many reps: tunnel noise is ~ms, one 16 MiB copy is ~50 us.
        secs = timed_chain(fn, x, reps=64)
        gbs = 2 * NROWS * LANES * 4 / secs / 1e9
        us_per_dma = secs / K * 1e6
        lines.append(f"S={S}({S * 512}B): {gbs:7.1f} GB/s "
                     f"{us_per_dma:7.3f} us/dma K={K}")
    return "\n  " + "\n  ".join(lines)


# ------------------------------------------------------------- kernels

def kernel_throughput():
    from radix_sort_tpu.ops import pallas_radix as pr

    n = 1 << 22
    R = 256
    block = 2048
    key = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    digits = (key & (R - 1)).astype(jnp.int32)
    lines = []

    # histogram
    def h(d):
        c = pr.digit_histogram(d, R, block)
        return d + c[0, 0]
    s = timed_chain(h, digits, reps=8)
    lines.append(f"digit_histogram R=256 block=2048: "
                 f"{n / s / 1e9:6.2f} Gelem/s")

    # scan (on B*R histogram)
    B = n // block
    hist = pr.digit_histogram(digits, R, block)
    flat = hist.T.reshape(-1)

    def sc(f):
        return pr.exclusive_scan(f) + f[:1]
    s = timed_chain(sc, flat, reps=8)
    lines.append(f"exclusive_scan {B * R} entries: {s * 1e6:8.1f} us")

    # rank
    base = pr._stitch_block_base(hist)

    def rk(d):
        dest = pr.rank_pass(d, base, R, block)
        return (d + dest[:1]) % R
    s = timed_chain(rk, digits, reps=8)
    lines.append(f"rank_pass R=256 block=2048:       "
                 f"{n / s / 1e9:6.2f} Gelem/s")
    return "\n  " + "\n  ".join(lines)


# ------------------------------------------------------------- mxu-perm

def mxu_perm():
    """Row-permutation of (128,128) int32 tiles via one-hot matmuls.

    perm-rows-f32x2: Y = P @ X exact via two f32 matmuls on 16-bit halves.
    invert-idx-bf16: s = iota @ onehot(dst) — invert a 7-bit lane
    permutation, exact in bf16.
    """
    T = 256                           # tiles
    rows = 128

    def k(idx_ref, x_ref, o_ref):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        # P[i, j] = (idx[i] == j) — one-hot permutation matrix
        row = idx_ref[pl.ds(t, 1), :]                    # (1, rows)
        P = (row.reshape(rows, 1) == iota).astype(jnp.float32)
        x = x_ref[...]
        lo = (x & 0xFFFF).astype(jnp.float32)
        hi = ((x >> 16) & 0xFFFF).astype(jnp.float32)
        ylo = jax.lax.dot_general(P, lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        yhi = jax.lax.dot_general(P, hi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[...] = (yhi.astype(jnp.int32) << 16) | ylo.astype(jnp.int32)

    rng = np.random.default_rng(2)
    xs = rng.integers(0, 2**31, (T * rows, LANES)).astype(np.int32)
    idx = np.stack([rng.permutation(rows) for _ in range(T)]).astype(np.int32)

    call = pl.pallas_call(
        k,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, rows), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * rows, LANES), jnp.int32),
    )
    out = call(jnp.asarray(idx), jnp.asarray(xs))
    got = np.asarray(out).reshape(T, rows, LANES)
    exp = xs.reshape(T, rows, LANES)[
        np.arange(T)[:, None], idx]
    okc = np.array_equal(got, exp)

    fn = lambda v: call(jnp.asarray(idx), v)  # noqa: E731
    s = timed_chain(fn, jnp.asarray(xs), reps=8)
    n = T * rows * LANES
    return (f"{'PASS' if okc else 'WRONG-RESULT'} "
            f"{n / s / 1e9:6.2f} Gelem/s (f32x2 row-perm 128x128)")


def cap_1d_hbm_aligned():
    """Control: 1-D HBM→HBM DMA with 1024-aligned dynamic offsets — isolates
    'raggedness' (misalignment) from '1-D refs' as the failure cause."""
    n = 1 << 16
    L = 4096

    def k(off_ref, in_hbm, out_hbm, sem):
        src = off_ref[0]
        dst = off_ref[1]
        cp = pltpu.make_async_copy(
            in_hbm.at[pl.ds(src, L)], out_hbm.at[pl.ds(dst, L)], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(n, dtype=jnp.int32)
    off = jnp.asarray(np.array([2048, 1024], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[1024:1024 + L]
    exp = np.arange(2048, 2048 + L, dtype=np.int32)
    return "PASS" if np.array_equal(got, exp) else "WRONG-RESULT"


def cap_1d_hbm_static():
    """Control 2: 1-D HBM→HBM DMA with STATIC misaligned offsets."""
    n = 1 << 16
    L = 4096

    def k(in_hbm, out_hbm, sem):
        cp = pltpu.make_async_copy(
            in_hbm.at[pl.ds(1234, L)], out_hbm.at[pl.ds(77, L)], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(n, dtype=jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    got = np.asarray(out)[77:77 + L]
    exp = np.arange(1234, 1234 + L, dtype=np.int32)
    return "PASS" if np.array_equal(got, exp) else "WRONG-RESULT"


def cap_1d_hint():
    """1-D HBM→HBM DMA with dynamic offsets declared multiple_of(1024) —
    Mosaic demands provable divisibility by the 1-D tiling (1024)."""
    n = 1 << 16
    L = 4096

    def k(off_ref, in_hbm, out_hbm, sem):
        src = pl.multiple_of(off_ref[0] * 1024, 1024)
        dst = pl.multiple_of(off_ref[1] * 1024, 1024)
        cp = pltpu.make_async_copy(
            in_hbm.at[pl.ds(src, L)], out_hbm.at[pl.ds(dst, L)], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(n, dtype=jnp.int32)
    off = jnp.asarray(np.array([2, 1], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[1024:1024 + L]
    exp = np.arange(2048, 2048 + L, dtype=np.int32)
    return "PASS" if np.array_equal(got, exp) else "WRONG-RESULT"


def cap_2d_row_offset():
    """2-D (rows,128) HBM→HBM DMA at dynamic row offsets NOT divisible by 8
    — decides whether HBM raggedness granularity is 128 elems (row) or 1024
    (sublane tile)."""
    rows = 512

    def k(off_ref, in_hbm, out_hbm, sem):
        src = off_ref[0]
        dst = off_ref[1]
        cp = pltpu.make_async_copy(
            in_hbm.at[pl.ds(src, 16), :], out_hbm.at[pl.ds(dst, 16), :],
            sem)
        cp.start()
        cp.wait()

    x = jnp.arange(rows * LANES, dtype=jnp.int32).reshape(rows, LANES)
    off = jnp.asarray(np.array([3, 11], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[11:27]
    exp = np.asarray(x)[3:19]
    return "PASS" if np.array_equal(got, exp) else "WRONG-RESULT"


def cap_vmem_rows_to_hbm2d():
    """VMEM (S,128) rows at dynamic sublane offset → 2-D HBM at dynamic row
    offset — the window writeback shape of the streaming scatter."""
    rows = 512

    def k(off_ref, x_ref, out_hbm, sem):
        s = off_ref[0]
        d = off_ref[1]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(s, 16), :], out_hbm.at[pl.ds(d, 16), :], sem)
        cp.start()
        cp.wait()

    x = jnp.arange(64 * LANES, dtype=jnp.int32).reshape(64, LANES)
    off = jnp.asarray(np.array([5, 21], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(off, x)
    got = np.asarray(out)[21:37]
    exp = np.asarray(x)[5:21]
    return "PASS" if np.array_equal(got, exp) else "WRONG-RESULT"


PROBES = {
    "cap-1dma-static": cap_1d_hbm_static,
    "cap-1dma-aligned": cap_1d_hbm_aligned,
    "cap-1dma-hint": cap_1d_hint,
    "cap-2drow": cap_2d_row_offset,
    "cap-vmemrow": cap_vmem_rows_to_hbm2d,
    "cap-1dma-hh": cap_1d_hbm_to_hbm,
    "cap-1dma-vh": cap_1d_vmem_to_hbm,
    "cap-1dma-vsh": cap_1d_vmem_slice_to_hbm,
    "cap-dynvmem": cap_dyn_sublane_store,
    "dma-rate": dma_rate,
    "kernels": kernel_throughput,
    "mxu-perm": mxu_perm,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for name, fn in PROBES.items():
        if args.only and args.only not in name:
            continue
        report(name, fn)


if __name__ == "__main__":
    main()
