"""Capability probe for the Pallas-v2 scatter design: which Mosaic ops
compile on this chip?  Run on TPU; prints one PASS/FAIL line per feature.
Results drive the pallas engine roadmap (docs/DESIGN.md §2.2)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_feature(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'PASS' if ok else 'WRONG-RESULT'}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def f_transpose():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    x = jnp.asarray(np.arange(128 * 128, dtype=np.int32).reshape(128, 128))
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    return np.array_equal(np.asarray(out), np.asarray(x).T)


def f_wide_gather():
    # gather (S,128) -> (S,256): indices wider than the source
    S = 16
    rng = np.random.default_rng(0)
    x = rng.integers(0, 999, (S, 128)).astype(np.int32)
    idx = rng.integers(0, 128, (S, 256)).astype(np.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((S, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(x), jnp.asarray(idx))
    return np.array_equal(np.asarray(out),
                          np.take_along_axis(x, idx, axis=1))


def f_table_lookup_256():
    # per-row lookup into a 256-lane table via take_along_axis
    S = 16
    rng = np.random.default_rng(1)
    table = rng.integers(0, 10**6, (1, 256)).astype(np.int32)
    d = rng.integers(0, 256, (S, 128)).astype(np.int32)

    def k(t_ref, d_ref, o_ref):
        t = jnp.broadcast_to(t_ref[...], (S, 256))
        o_ref[...] = jnp.take_along_axis(t, d_ref[...], axis=1)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((S, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray(table), jnp.asarray(d))
    return np.array_equal(np.asarray(out), table[0][d])


def f_hbm_dma_dynamic():
    # HBM->HBM DMA with dynamic source/dest offsets, static size
    n = 4096
    x = jnp.asarray(np.arange(n, dtype=np.int32).reshape(n // 128, 128))

    def k(x_hbm, off_ref, o_hbm, sem):
        src_off = off_ref[0]
        dst_off = off_ref[1]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_off, 8), :],
            o_hbm.at[pl.ds(dst_off, 8), :],
            sem)
        cp.start()
        cp.wait()

    off = jnp.asarray(np.array([8, 16], np.int32))
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x, off)
    got = np.asarray(out)[16:24]
    exp = np.asarray(x)[8:16]
    return np.array_equal(got, exp)


def f_dynamic_trip_fori():
    # fori_loop with an SMEM-scalar trip count
    def k(n_ref, o_ref):
        def body(i, acc):
            return acc + i

        m = n_ref[0]
        o_ref[0, 0] = jax.lax.fori_loop(0, m, body, jnp.int32(0))

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM))(
            jnp.asarray(np.array([7], np.int32)))
    return int(np.asarray(out)[0, 0]) == 21


def f_vmem_dma_dynamic_lane_slab():
    # VMEM rectangle (S, c) strided copy to HBM via DMA on a lane sub-range
    S = 16
    x = jnp.asarray(np.arange(S * 128, dtype=np.int32).reshape(S, 128))

    def k(x_ref, o_hbm, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(32, 64)], o_hbm.at[:, :], sem)
        cp.start()
        cp.wait()

    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((S, 64), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    return np.array_equal(np.asarray(out), np.asarray(x)[:, 32:96])


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    try_feature("transpose_128x128", f_transpose)
    try_feature("wide_gather_128to256", f_wide_gather)
    try_feature("table_lookup_256lanes", f_table_lookup_256)
    try_feature("hbm_dma_dynamic_offsets", f_hbm_dma_dynamic)
    try_feature("dynamic_trip_fori", f_dynamic_trip_fori)
    try_feature("vmem_lane_slab_dma", f_vmem_dma_dynamic_lane_slab)


if __name__ == "__main__":
    main()
