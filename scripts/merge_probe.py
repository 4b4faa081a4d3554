"""Merge-path probe (round 3, VERDICT item 2): measure the primitives that
decide whether an O(L) in-VMEM two-run merge can beat the bitonic merge
levels — and time the halver-optimized merge engine end-to-end.

Stages:
  1. validate: merge_sort_u32 (halver kernel) bit-exact vs np.sort on TPU.
  2. e2e: merge engine vs lax.sort (unstable key-only) at 2^24 / 2^25.
  3. gather-rate: per-stage throughput of the in-kernel primitives the
     merge-path kernel would lean on — dynamic lane gather
     (take_along_axis axis=1, data-dependent indices), static roll,
     128x128 transpose, and a bitonic compare-exchange stage — so the
     merge-path cost model (docs/DESIGN.md:96-101) gets hardware numbers.

Run on the real chip: python scripts/merge_probe.py [validate e2e gather]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_chain(fn, x, reps=8, iters=3):
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


# ------------------------------------------------------------ 1. validate

def p_validate():
    from radix_sort_tpu.ops import pallas_merge

    rng = np.random.default_rng(7)
    msgs = []
    for n in ((1 << 20), (1 << 20) + 12345):
        data = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        out = np.asarray(pallas_merge.merge_sort_u32(jnp.asarray(data), n))
        ok = np.array_equal(out, np.sort(data))
        msgs.append(f"n={n}: {'PASS' if ok else 'MISMATCH'}")
        if not ok:
            bad = np.nonzero(out != np.sort(data))[0]
            msgs.append(f"first-bad={bad[0]} of {bad.size}")
    return "; ".join(msgs)


# ------------------------------------------------------------ 2. e2e bench

def p_e2e():
    from radix_sort_tpu.ops import pallas_merge

    rng = np.random.default_rng(11)
    msgs = []
    for log2n in (24, 25):
        n = 1 << log2n
        data = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        keys = jax.device_put(jnp.asarray(data))
        s_merge = timed_chain(
            lambda k: pallas_merge.merge_sort_u32(k, k.shape[0]), keys,
            reps=4)
        s_xla = timed_chain(
            lambda k: jax.lax.sort(k, is_stable=False), keys, reps=4)
        msgs.append(
            f"2^{log2n}: merge {n / s_merge / 1e6:.0f} Mkeys/s, "
            f"lax.sort {n / s_xla / 1e6:.0f} Mkeys/s")
    return "; ".join(msgs)


# ------------------------------------------------------------ 3. gather rate

ROWS = 256          # rows per grid block
K_HI = 17
K_LO = 1


def _stage_kernel(variant, k_stages):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        for i in range(k_stages):
            if variant == "gather":
                idx = (x ^ (x >> 7)) & 127
                x = jnp.take_along_axis(x, idx, axis=1) + 1
            elif variant == "gather_bcast1":
                # single index column broadcast — the row-gather shape
                idx = jnp.broadcast_to((x[:, :1] ^ (x[:, :1] >> 7)) & 127,
                                       x.shape)
                x = jnp.take_along_axis(x, idx, axis=1) + 1
            elif variant == "roll":
                x = pltpu.roll(x, shift=np.int32((i % 127) + 1), axis=1) + 1
            elif variant == "transpose":
                # transpose is (128,128)-shaped; do it blockwise
                parts = [x[j * 128:(j + 1) * 128].T
                         for j in range(ROWS // 128)]
                x = jnp.concatenate(parts, axis=0) + 1
            elif variant == "cmpex":
                d = 1 << (i % 7)
                li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
                p = pltpu.roll(x, shift=np.int32(128 - d), axis=1)
                pn = pltpu.roll(x, shift=np.int32(d), axis=1)
                part = jnp.where((li & d) != 0, pn, p)
                lower = (li & d) == 0
                x = jnp.where(lower, jnp.minimum(x, part),
                              jnp.maximum(x, part))
            else:
                raise ValueError(variant)
        o_ref[...] = x

    return kern


def _stage_rate(variant, total_rows=1 << 16):
    x = jnp.asarray(
        np.random.default_rng(3).integers(
            0, 1 << 31, (total_rows, 128)).astype(np.int32))

    def run(k_stages):
        f = pl.pallas_call(
            _stage_kernel(variant, k_stages),
            grid=(total_rows // ROWS,),
            in_specs=[pl.BlockSpec((ROWS, 128), lambda t: (t, np.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, 128), lambda t: (t, np.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total_rows, 128), jnp.int32),
        )
        return timed_chain(f, x, reps=8)

    s_hi, s_lo = run(K_HI), run(K_LO)
    per_stage = max(1e-12, (s_hi - s_lo) / (K_HI - K_LO))
    elems = total_rows * 128
    return f"{elems / per_stage / 1e9:.2f} Gelem/s per stage"


# --------------------------------------------------- 4. level-cost breakdown

def p_breakdown():
    """Where does the merge engine's time actually go at 2^24?  Chained
    timing of each pipeline component in isolation."""
    from radix_sort_tpu.ops import pallas_merge as pm

    n = 1 << 24
    num_tiles = n // pm.TILE
    rng = np.random.default_rng(5)
    data = rng.integers(0, 1 << 31, n).astype(np.int32)
    x = jax.device_put(jnp.asarray(data))
    msgs = []

    s = timed_chain(pm.tile_sort, x, reps=4)
    msgs.append(f"tile_sort {n / s / 1e6:.0f} Melem/s ({s*1e3:.2f} ms)")
    print(f"  {msgs[-1]}", flush=True)

    xs = pm.tile_sort(x)

    def splits_fold(v):
        ia, ib, la = pm._level_splits(v, 0, num_tiles)
        # fold a (runtime-zero) scalar back in so the chain can't DCE it
        bump = jnp.where(ia[0] + ib[0] + la[0] >= 0,
                         jnp.int32(0), jnp.int32(1))
        return v + bump

    s = timed_chain(splits_fold, xs, reps=8)
    msgs.append(f"level_splits(1 level) {s*1e3:.2f} ms")
    print(f"  {msgs[-1]}", flush=True)

    def level0(v):
        ia, ib, la = pm._level_splits(v, 0, num_tiles)
        return pm.merge_level(v, ia, ib, la)

    s = timed_chain(level0, xs, reps=4)
    msgs.append(f"merge_level0(incl splits) {n / s / 1e6:.0f} Melem/s "
                f"({s*1e3:.2f} ms)")
    print(f"  {msgs[-1]}", flush=True)

    # kernel-only: fixed splits (all from A: la=TILE) — same DMA + compute
    # shape, no split search.
    t_ar = jnp.arange(num_tiles, dtype=jnp.int32)
    ia0 = (t_ar // 2) * (2 * pm.TILE) + (t_ar % 2) * pm.TILE
    ib0 = ia0 + pm.TILE
    la0 = jnp.full((num_tiles,), pm.TILE, jnp.int32)

    def level_kernel_only(v):
        return pm.merge_level(v, ia0, ib0, la0)

    s = timed_chain(level_kernel_only, xs, reps=4)
    msgs.append(f"merge_kernel(fixed splits) {n / s / 1e6:.0f} Melem/s "
                f"({s*1e3:.2f} ms)")
    print(f"  {msgs[-1]}", flush=True)
    return "; ".join(msgs)


def p_gather():
    msgs = []
    for v in ("roll", "gather", "gather_bcast1", "transpose", "cmpex"):
        try:
            msgs.append(f"{v}={_stage_rate(v)}")
        except Exception as e:  # noqa: BLE001
            with open(f"/tmp/probe_err_gather_{v}.log", "w") as f:
                f.write(str(e))
            msgs.append(f"{v}=FAIL {type(e).__name__} "
                        f"[/tmp/probe_err_gather_{v}.log]")
        print(f"  {msgs[-1]}", flush=True)
    return "; ".join(msgs)


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    which = sys.argv[1:] or ["validate", "e2e", "gather", "breakdown"]
    fns = {"validate": p_validate, "e2e": p_e2e, "gather": p_gather,
           "breakdown": p_breakdown}
    for w in which:
        report(w, fns[w])


if __name__ == "__main__":
    main()
