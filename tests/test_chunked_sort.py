"""Tests for the range-chunked sort engine (ops/chunked_sort.py): splitter
assignment, tie spreading, the streaming-partition + batched-sort pipeline,
and the runtime overflow fallback.  Small n via the min_n knob (the
production threshold gates the path to n >= 2^18); partition_planes runs in
interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radix_sort_tpu.ops import chunked_sort as cs


def _run(keys_u, payloads=(), **kw):
    kw.setdefault("min_n", 0)
    kw.setdefault("k_chunks", 4)
    kw.setdefault("samples", 256)
    return jax.jit(
        lambda k, p: cs.sort_chunked_biased(k, p, **kw))(keys_u, payloads)


def test_chunk_destinations_monotone_and_in_range():
    rng = np.random.default_rng(40)
    keys = jnp.asarray(rng.integers(0, 50, 4096).astype(np.uint32))
    spl = jnp.asarray(np.array([10, 20, 20, 40], np.uint32))  # dup splitter
    dest = np.asarray(cs._chunk_destinations(keys, spl, 5))
    kv = np.asarray(keys)
    assert dest.min() >= 0 and dest.max() <= 4
    # monotone in key value: sorting by (key) must give non-decreasing dest
    order = np.argsort(kv, kind="stable")
    d_sorted = dest[order]
    k_sorted = kv[order]
    # within equal keys dest must be non-decreasing by position (stability);
    # across increasing keys dest must never decrease
    assert np.all(np.diff(d_sorted) >= 0) or np.all(
        (np.diff(d_sorted) >= 0) | (np.diff(k_sorted) > 0))
    # ties of a duplicated splitter spread across its full chip range
    tied = kv == 20
    if tied.sum() > 64:
        assert len(np.unique(dest[tied])) > 1


def test_chunked_kv_stable_matches_oracle():
    rng = np.random.default_rng(41)
    n = 4096
    keys = rng.integers(0, 300, n).astype(np.uint32)  # heavy duplicates
    vals = np.arange(n, dtype=np.int32)
    ko, (vo,) = _run(jnp.asarray(keys), (jnp.asarray(vals),))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ko), keys[order])
    np.testing.assert_array_equal(np.asarray(vo), vals[order])


def test_chunked_zeros_balances_without_overflow():
    """All-equal keys (the Zeros distribution): the position-monotone tie
    spread must balance the chunks — the partition counts stay within
    capacity and stability holds (payload comes out as iota)."""
    n = 4096
    keys = jnp.zeros((n,), jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.int32)

    # internals: destinations must be near-balanced
    spl = cs._order_stat_splitters(
        jnp.sort(keys[:: max(1, n // 256)][:256]), 4)
    dest = np.asarray(cs._chunk_destinations(keys, spl, 4))
    counts = np.bincount(dest, minlength=4)
    assert counts.max() <= int(1.30 * n / 4) + 256  # inside slack capacity

    ko, (vo,) = _run(keys, (vals,))
    np.testing.assert_array_equal(np.asarray(ko), np.zeros(n, np.uint32))
    np.testing.assert_array_equal(np.asarray(vo),
                                  np.arange(n, dtype=np.int32))


def test_chunked_overflow_falls_back_correct():
    """slack too small for the skew -> a chunk overflows its static cap ->
    the lax.cond fallback must still return the exact stable sort."""
    rng = np.random.default_rng(42)
    n = 4096
    # adversarial: ties clustered in the first half so the position-
    # proportional spread overflows chunk 0 at tiny slack
    keys = np.concatenate([np.full(n // 2, 7, np.uint32),
                           rng.integers(0, 2**32, n // 2,
                                        dtype=np.uint32)])
    vals = np.arange(n, dtype=np.int32)
    ko, (vo,) = _run(jnp.asarray(keys), (jnp.asarray(vals),),
                     slack=0.30)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ko), keys[order])
    np.testing.assert_array_equal(np.asarray(vo), vals[order])


def test_chunked_key_only_u32():
    rng = np.random.default_rng(43)
    n = 4096
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    ko, _ = _run(jnp.asarray(keys))
    np.testing.assert_array_equal(np.asarray(ko), np.sort(keys))


def test_chunked_u64_kv():
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(44)
    n = 4096
    keys = rng.integers(0, 2**63, n).astype(np.uint64)
    keys[: n // 4] = keys[0]  # duplicate block exercises ties across words
    vals = np.arange(n, dtype=np.int32)
    ko, (vo,) = _run(jnp.asarray(keys), (jnp.asarray(vals),))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ko), keys[order])
    np.testing.assert_array_equal(np.asarray(vo), vals[order])


def test_engine_chunked_public_api_small_n_plain_path():
    """Through the public API, n below the production threshold takes the
    plain lax.sort path — bit-exact contract regardless."""
    from radix_sort_tpu.ops import sort as sort_ops

    rng = np.random.default_rng(45)
    keys = rng.integers(0, 1000, 8192).astype(np.int32)  # signed: bias path
    vals = np.arange(8192, dtype=np.int32)
    ko, vo = sort_ops.sort_kv(jnp.asarray(keys), jnp.asarray(vals),
                              engine="chunked")
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(ko), keys[order])
    np.testing.assert_array_equal(np.asarray(vo), vals[order])
