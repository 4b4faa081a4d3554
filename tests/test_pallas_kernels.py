"""Pallas kernel unit tests (interpret mode on CPU) — the kernel-level
coverage the reference only left as a TODO (src/RadixSortGPU.h:89-93,
SURVEY.md §4): histogram counts, exclusive-scan properties, rank/scatter
stability, each validated in isolation against numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from radix_sort_tpu.ops import pallas_radix as pr
from radix_sort_tpu import datasets, golden
from radix_sort_tpu.config import SortConfig


BLOCK = 2048  # 16 rows x 128 lanes


@pytest.mark.parametrize("radix", [16, 256])
def test_digit_histogram_matches_numpy(radix):
    rng = np.random.default_rng(0)
    n = 4 * BLOCK
    digits = rng.integers(0, radix, size=n).astype(np.int32)
    got = np.asarray(pr.digit_histogram(jnp.asarray(digits), radix, BLOCK))
    assert got.shape == (4, radix)
    for b in range(4):
        exp = np.bincount(digits[b * BLOCK:(b + 1) * BLOCK], minlength=radix)
        assert np.array_equal(got[b], exp), f"block {b}"


def test_digit_histogram_total_preserved():
    digits = np.zeros(2 * BLOCK, dtype=np.int32)
    got = np.asarray(pr.digit_histogram(jnp.asarray(digits), 256, BLOCK))
    assert got.sum() == 2 * BLOCK
    assert got[:, 0].sum() == 2 * BLOCK


@pytest.mark.parametrize("n", [1, 100, 1024, 5000, 8192])
def test_exclusive_scan(n):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 100, size=n).astype(np.int32)
    got = np.asarray(pr.exclusive_scan(jnp.asarray(x)))
    exp = np.cumsum(x) - x
    assert np.array_equal(got, exp)


def test_exclusive_scan_is_exclusive_prefix():
    # scan properties: out[0]==0, out[i+1]-out[i]==x[i]
    x = np.arange(1000, dtype=np.int32)
    got = np.asarray(pr.exclusive_scan(jnp.asarray(x)))
    assert got[0] == 0
    assert np.array_equal(np.diff(got), x[:-1])


@pytest.mark.parametrize("radix", [16, 256])
def test_rank_pass_is_stable_permutation(radix):
    rng = np.random.default_rng(2)
    n = 3 * BLOCK
    digits = rng.integers(0, radix, size=n).astype(np.int32)
    counts = np.stack([np.bincount(digits[b * BLOCK:(b + 1) * BLOCK],
                                   minlength=radix) for b in range(3)])
    base = np.asarray(pr._stitch_block_base(jnp.asarray(counts,
                                                        dtype=jnp.int32)))
    dest = np.asarray(pr.rank_pass(jnp.asarray(digits),
                                   jnp.asarray(base), radix, BLOCK))
    # dest must equal the stable argsort destination
    perm = np.argsort(digits, kind="stable")
    exp_dest = np.empty(n, dtype=np.int64)
    exp_dest[perm] = np.arange(n)
    assert np.array_equal(dest, exp_dest)


def test_stitch_block_base_digit_major():
    counts = np.array([[2, 1], [3, 4]], dtype=np.int32)  # B=2, R=2
    base = np.asarray(pr._stitch_block_base(jnp.asarray(counts)))
    # digit-major exclusive scan: d0b0=0, d0b1=2, d1b0=5, d1b1=6
    assert np.array_equal(base, [[0, 5], [2, 6]])


def test_pallas_sort_engine_u32():
    from radix_sort_tpu import sort
    cfg = SortConfig(bits_per_pass=8, block_elems=2048, engine="pallas")
    data = datasets.RandomDistributed(np.uint32, seed=4).generate(5000)
    got = np.asarray(sort(jnp.asarray(data), config=cfg))
    assert golden.validate_bit_exact(got, golden.oracle_sort(data), 5000)


def test_pallas_sort_engine_i64_kv():
    from radix_sort_tpu import sort_kv
    cfg = SortConfig(bits_per_pass=8, block_elems=2048, engine="pallas")
    data = datasets.RandomDistributed(np.int64, seed=5).generate(3000)
    vals = np.arange(3000, dtype=np.int32)
    k, v = sort_kv(jnp.asarray(data), jnp.asarray(vals), config=cfg)
    perm = golden.oracle_argsort(data)
    assert np.array_equal(np.asarray(k), data[perm])
    assert np.array_equal(np.asarray(v), vals[perm])


def test_pallas_sort_all_distributions():
    from radix_sort_tpu import sort
    cfg = SortConfig(bits_per_pass=8, block_elems=2048, engine="pallas")
    for ds in datasets.make_datasets(np.uint32, seed=6):
        data = ds.generate(2500)
        got = np.asarray(sort(jnp.asarray(data), config=cfg))
        assert golden.validate_bit_exact(got, golden.oracle_sort(data),
                                         2500), ds.name
