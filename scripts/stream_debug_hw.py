"""Piecewise hardware validation of the streaming engine's in-kernel
building blocks vs numpy oracles — isolates HW-vs-interpret semantic
divergences (e.g. pltpu.roll direction) that end-to-end runs can't.

  python scripts/stream_debug_hw.py [--only NAME]
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radix_sort_tpu.ops import pallas_stream as ps

LANES = 128


def run_kernel(fn, out_shape, *args, scratch=()):
    return pl.pallas_call(
        fn,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def t_roll():
    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], shift=3, axis=1)

    x = jnp.asarray(np.arange(8 * LANES, dtype=np.int32).reshape(8, LANES))
    out = np.asarray(run_kernel(
        k, jax.ShapeDtypeStruct((8, LANES), jnp.int32), x))
    exp = np.roll(np.asarray(x), 3, axis=1)
    return "PASS" if np.array_equal(out, exp) else \
        f"DIVERGES (out[0,:6]={out[0, :6].tolist()} exp={exp[0, :6].tolist()})"


def t_cumsum():
    def k(x_ref, o_ref):
        o_ref[...] = ps._excl_cumsum(x_ref[...], 1)

    x = jnp.asarray(np.arange(8 * LANES, dtype=np.int32).reshape(8, LANES))
    out = np.asarray(run_kernel(
        k, jax.ShapeDtypeStruct((8, LANES), jnp.int32), x))
    xn = np.asarray(x)
    exp = np.cumsum(xn, axis=1) - xn
    return "PASS" if np.array_equal(out, exp) else \
        f"DIVERGES out[0,:5]={out[0, :5].tolist()} exp={exp[0, :5].tolist()}"


def t_cumsum0():
    def k(x_ref, o_ref):
        o_ref[...] = ps._excl_cumsum(x_ref[...], 0)

    x = jnp.asarray(np.arange(16 * LANES, dtype=np.int32).reshape(16, LANES))
    out = np.asarray(run_kernel(
        k, jax.ShapeDtypeStruct((16, LANES), jnp.int32), x))
    xn = np.asarray(x)
    exp = np.cumsum(xn, axis=0) - xn
    return "PASS" if np.array_equal(out, exp) else "DIVERGES"


def t_rank():
    rng = np.random.default_rng(0)
    d = rng.integers(0, 16, (16, LANES)).astype(np.int32)

    def k(d_ref, o_ref):
        o_ref[...] = ps._row_rank_eq(d_ref[...])

    out = np.asarray(run_kernel(
        k, jax.ShapeDtypeStruct((16, LANES), jnp.int32), jnp.asarray(d)))
    exp = np.zeros_like(d)
    for r in range(d.shape[0]):
        for l in range(LANES):
            exp[r, l] = np.sum(d[r, :l] == d[r, l])
    return "PASS" if np.array_equal(out, exp) else "DIVERGES"


def t_counts():
    rng = np.random.default_rng(1)
    d = rng.integers(0, 16, (16, LANES)).astype(np.int32)

    def k(d_ref, o_ref):
        o_ref[...] = ps._row_counts(d_ref[...], 16)

    out = np.asarray(run_kernel(
        k, jax.ShapeDtypeStruct((16, 16), jnp.int32), jnp.asarray(d)))
    exp = np.stack([np.sum(d == b, axis=1) for b in range(16)], axis=1)
    return "PASS" if np.array_equal(out, exp) else "DIVERGES"


def t_partition():
    rng = np.random.default_rng(2)
    d = rng.integers(0, 16, (16, LANES)).astype(np.int32)

    def k(d_ref, o_ref):
        idx, _, _ = ps.row_partition(d_ref[...], 16)
        o_ref[...] = jnp.take_along_axis(d_ref[...], idx, axis=1)

    out = np.asarray(run_kernel(
        k, jax.ShapeDtypeStruct((16, LANES), jnp.int32), jnp.asarray(d)))
    exp = np.sort(d, axis=1, kind="stable")
    return "PASS" if np.array_equal(out, exp) else \
        f"DIVERGES out[0,:8]={out[0, :8].tolist()} exp={exp[0, :8].tolist()}"


TESTS = {
    "roll": t_roll,
    "cumsum1": t_cumsum,
    "cumsum0": t_cumsum0,
    "rank": t_rank,
    "counts": t_counts,
    "partition": t_partition,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for name, fn in TESTS.items():
        if args.only and args.only not in name:
            continue
        try:
            print(f"{name}: {fn()}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e)[:250]}", flush=True)


if __name__ == "__main__":
    main()
