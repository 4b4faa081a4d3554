"""Pallas merge-sort engine (interpret mode): building blocks + end-to-end
vs np.sort."""

import numpy as np
import jax.numpy as jnp
import pytest

from radix_sort_tpu.ops import pallas_merge as pm


def test_bitonic_tile_sort():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, (128, 128), dtype=np.uint32)
    out = np.asarray(pm._bitonic_sort(jnp.asarray(x), 128))
    assert np.array_equal(out.reshape(-1), np.sort(x.reshape(-1)))


def test_flip_tile():
    x = np.arange(128 * 128, dtype=np.uint32).reshape(128, 128)
    f = np.asarray(pm._flip_tile(jnp.asarray(x)))
    assert np.array_equal(f.reshape(-1), x.reshape(-1)[::-1])


def test_rotate_elems():
    rng = np.random.default_rng(1)
    w = rng.integers(0, 1000, (136, 128)).astype(np.uint32)
    for s in (0, 1, 37, 127):
        r = np.asarray(pm._rotate_elems(jnp.asarray(w), jnp.int32(s), 136))
        flat = w.reshape(-1)
        got = r.reshape(-1)[: flat.size - s]
        assert np.array_equal(got, flat[s:]), s


def test_bitonic_merge_of_two_runs():
    rng = np.random.default_rng(2)
    a = np.sort(rng.integers(0, 2**32, pm.TILE, dtype=np.uint32))
    b = np.sort(rng.integers(0, 2**32, pm.TILE, dtype=np.uint32))
    c = np.concatenate([a.reshape(128, 128),
                        np.asarray(pm._flip_tile(
                            jnp.asarray(b.reshape(128, 128))))])
    merged = np.asarray(pm._bitonic_merge(jnp.asarray(c), 256))
    assert np.array_equal(merged.reshape(-1),
                          np.sort(np.concatenate([a, b])))


@pytest.mark.parametrize("n", [5000, pm.TILE, 2 * pm.TILE + 13,
                               4 * pm.TILE, 8 * pm.TILE - 777])
def test_merge_sort_end_to_end(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    out = np.asarray(pm.merge_sort_u32(jnp.asarray(data), n))
    assert np.array_equal(out, np.sort(data))


def test_merge_sort_degenerate():
    for data in (np.zeros(3 * pm.TILE, np.uint32),
                 np.full(2 * pm.TILE, 0xFFFFFFFF, np.uint32),
                 np.arange(2 * pm.TILE, dtype=np.uint32)[::-1].copy()):
        out = np.asarray(pm.merge_sort_u32(jnp.asarray(data), data.size))
        assert np.array_equal(out, np.sort(data))


def test_pallas_merge_engine_dispatch():
    from radix_sort_tpu import sort
    rng = np.random.default_rng(3)
    data = rng.integers(0, 2**32, 40000, dtype=np.uint32)
    out = np.asarray(sort(jnp.asarray(data), engine="pallas_merge"))
    assert np.array_equal(out, np.sort(data))
    # i32 keys route through the bias transform
    di = data.view(np.int32)
    out = np.asarray(sort(jnp.asarray(di), engine="pallas_merge"))
    assert np.array_equal(out, np.sort(di))
