"""Multi-pass LSD radix sort — the engine's centerpiece.

TPU-native re-design of ``RadixSortGPU<T>`` (``src/RadixSortGPU.h:36-124``).
Where the reference runs 8-16 host-synchronized kernel rounds (≈48 sync
points per sort, SURVEY.md §3.3), the whole sort here is ONE jitted XLA
region: pad → bias → passes (rank + scatter with ping-pong buffers realized
by XLA buffer donation) → unbias → slice.  Upload/download, padding and
ping-pong management all live inside the compiler.

Engines:
  - ``xla_sort``:  wraps ``jax.lax.sort`` (XLA's native TPU sort network) —
    the production fast path until the Pallas pipeline beats it.
  - ``xla_radix``: the full LSD radix pipeline built from ops/ranking.py —
    portable (CPU/TPU), used to validate the radix machinery bit-exactly and
    as the template the Pallas kernels implement.
  - ``pallas``:    per-pass fused Pallas kernels (ops/pallas_radix.py).
  - ``pallas_merge``: the streaming Pallas merge sort
    (ops/pallas_merge.py) — key-only, 32-bit key containers; other
    shapes fall back to xla_sort.
  - ``pallas_stream``: the streaming radix-scatter engine
    (ops/pallas_stream.py) — the scatter-free TPU-native reorder; stable,
    32/64-bit keys, any number of 4/8-byte payload columns as int32
    planes (other payload widths fall back to xla_sort).
  - ``chunked``:   range-chunked hybrid (ops/chunked_sort.py): splitter
    sampling → one streaming partition pass → batched small-n lax.sort —
    attacks the sort network's log^2(n) per-element cost at big n.
  - ``auto``:      current best for the active backend.

All engines route keys through the order-preserving unsigned transform
(dtypes.to_sortable_unsigned — the reference's OFFSET bias,
``src/RadixSortGPU.cpp:436``), so i32/i64/u32/u64 (and f32/f64) share one
code path and one ordering semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes
from ..config import SortConfig, DEFAULT_CONFIG
from ..status import EngineError, OperationStatus
from . import ranking


def _require_x64_if_needed(dtype):
    if np.dtype(dtype).itemsize == 8 and not jax.config.jax_enable_x64:
        raise EngineError(
            OperationStatus.INITIALIZATION_FAILED,
            "64-bit keys need jax_enable_x64 "
            "(jax.config.update('jax_enable_x64', True))",
        )


def _pad_1d(x: jnp.ndarray, padded: int, fill):
    n = x.shape[0]
    if n == padded:
        return x
    return jnp.concatenate(
        [x, jnp.full((padded - n,), fill, dtype=x.dtype)], axis=0
    )


def _radix_pipeline(keys_u: jnp.ndarray, payloads, config: SortConfig,
                    total_bits: int):
    """The hot loop (reference ``calculate``, src/RadixSortGPU.cpp:311-346):
    for each pass, rank by the pass digit and scatter keys + payloads.
    ``keys_u`` must already be padded to (B*M,) unsigned."""
    R = config.radix
    M = config.block_elems
    B = keys_u.shape[0] // M
    num_passes = total_bits // config.bits_per_pass
    seq = keys_u.shape[0] >= (1 << 22)

    arrays = (keys_u,) + tuple(payloads)
    for p in range(num_passes):
        shift = p * config.bits_per_pass
        ku = arrays[0]
        digits = ((ku >> dtypes._np_scalar(np.dtype(ku.dtype), shift))
                  & dtypes._np_scalar(np.dtype(ku.dtype), R - 1))
        digits = digits.astype(jnp.int32).reshape(B, M)
        dest, _, _ = ranking.stable_dest(digits, R, sequential_blocks=seq)
        arrays = ranking.apply_destinations(dest.reshape(-1), arrays)
    return arrays[0], arrays[1:]


def _radix_engine_biased(keys_u, payloads, config: SortConfig):
    """Trace-level radix sort of biased unsigned keys: pad → passes → slice.
    Usable inside jit/shard_map (n = static shape)."""
    n = keys_u.shape[0]
    total_bits = dtypes.key_bits(keys_u.dtype)
    padded = config.padded_size(n)
    sent = dtypes._np_scalar(np.dtype(keys_u.dtype),
                             dtypes.sentinel_max_unsigned(keys_u.dtype))
    ku = _pad_1d(keys_u, padded, sent)
    pls = tuple(_pad_1d(p, padded, 0) for p in payloads)
    ku, pls = _radix_pipeline(ku, pls, config, total_bits)
    return ku[:n], tuple(p[:n] for p in pls)


def sort_biased_kv(keys_u, payloads, config: SortConfig = DEFAULT_CONFIG):
    """Engine-dispatched sort of already-biased unsigned keys + payload
    tuple.  Trace-level (no jit wrapper): the building block the distributed
    layer calls inside shard_map."""
    # n deliberately not passed: this is the shard_map building block, and
    # the chunked engine's Pallas partition is not validated under
    # shard_map vma checking (same caveat as pallas_merge below) — auto
    # resolves size-independently to xla_sort here.
    engine = _dispatch_engine(config.engine)
    if engine == "xla_sort":
        return _xla_sort_engine(keys_u, payloads, keys_u.shape[0])
    if engine == "xla_radix":
        return _radix_engine_biased(keys_u, tuple(payloads), config)
    if engine == "pallas":
        from . import pallas_radix

        return pallas_radix.sort_biased(keys_u, tuple(payloads), config,
                                        keys_u.shape[0])
    if engine == "pallas_merge":
        return _pallas_merge_engine(keys_u, payloads, keys_u.shape[0])
    if engine == "pallas_stream":
        return _pallas_stream_engine(keys_u, payloads, keys_u.shape[0])
    if engine == "chunked":
        from . import chunked_sort

        return chunked_sort.sort_chunked_biased(keys_u, tuple(payloads))
    raise EngineError(OperationStatus.INITIALIZATION_FAILED,
                      f"unknown engine {engine!r}")


@functools.partial(jax.jit, static_argnames=("config", "n"))
def _sort_biased_jit(keys_u, payloads, config: SortConfig, n: int):
    return _radix_engine_biased(keys_u, payloads, config)


def _pallas_stream_engine(keys_u, payloads, n):
    """Streaming radix-scatter engine (ops/pallas_stream.py): the fully
    TPU-native reorder (lane gathers + one-hot MXU row-combines +
    carry-chained row DMAs), stable by construction.  Covers 32- and
    64-bit keys with ANY number of 4- or 8-byte payload columns — every
    payload maps to int32 planes (8-byte dtypes as lo/hi word pairs) and
    all planes ride the kernel's single per-pass permutation, so
    Table/multi-column sorts dispatch here natively.  Payloads with other
    widths fall back to xla_sort.  Bit-exact on v5e across all reference
    distributions; see docs/DESIGN.md §2.2c for the measured performance
    frontier analysis."""
    from . import pallas_stream

    planes, specs = pallas_stream.payloads_to_planes(payloads)
    if planes is None:
        return _xla_sort_engine(keys_u, payloads, n)
    ko, pouts = pallas_stream.sort_planes(keys_u, planes)
    return ko, pallas_stream.planes_to_payloads(pouts, specs)


def _pallas_merge_engine(keys_u, payloads, n):
    """Streaming Pallas merge sort; key-only 32-bit containers, with an
    xla_sort fallback for payloads / 64-bit keys (merge networks are not
    stable, and Mosaic lacks 64-bit vector compares)."""
    if payloads or dtypes.key_bits(keys_u.dtype) != 32:
        return _xla_sort_engine(keys_u, payloads, n)
    from . import pallas_merge

    return pallas_merge.merge_sort_u32(keys_u, n), ()


def _xla_sort_engine(keys_u, payloads, n):
    # Key-only sorts don't need stability (equal keys are bit-identical) and
    # XLA's unstable network is ~2x faster on TPU (805 vs 408 Mkeys/s @ 2^25
    # on v5e).  Payload-carrying sorts keep the stable contract.
    if payloads and np.dtype(keys_u.dtype).itemsize == 4:
        # Two-key stability-by-uniqueness: sort (key, position) with the
        # UNSTABLE network — the composite key is unique, so the single
        # consistent order IS the stable order, bit-identical to
        # is_stable=True (validated on v5e at 2^27, results_r5/
        # packed_two_key.log) and measured 2.5% faster for 4-byte keys
        # (407.1 vs 418 ms at 2^27).  8-byte keys LOSE 12% under the
        # extra operand (packed_two_key_u64.log) and keep the stable
        # network.  Position is per-call local (shard-local under
        # shard_map), which matches the per-shard stability contract.
        iota = jax.lax.iota(jnp.uint32, keys_u.shape[0])
        out = jax.lax.sort((keys_u, iota) + tuple(payloads), num_keys=2,
                           is_stable=False)
        return out[0], out[2:]
    out = jax.lax.sort((keys_u,) + tuple(payloads), num_keys=1,
                       is_stable=bool(payloads))
    return out[0], out[1:]


# "auto" routes to the chunked engine at and above this size.  None =
# never — the MEASURED value (scripts/chunked_probe.py at 2^27,
# results_r5/chunked_ab_27.log): chunked runs 0.28x of lax.sort
# key-only and 0.43x stable-KV at the largest size, so there is no
# crossover; the partition pass costs ~5x the falloff it chases
# (docs/DESIGN.md §2.2f).
AUTO_CHUNKED_MIN_N: int | None = None


def _dispatch_engine(engine: str, n: int | None = None) -> str:
    """Resolve "auto" to a concrete engine.  Size-independent callers
    (n=None) get the size-independent answer; _sort_impl passes n so the
    policy can route big arrays to the chunked engine."""
    if engine != "auto":
        return engine
    # Auto policy: XLA's native sort network is the measured single-chip
    # optimum across the explored design space (DESIGN.md §2.2c-d); the
    # chunked engine takes over at large n once its A/B data justifies it.
    if (AUTO_CHUNKED_MIN_N is not None and n is not None
            and n >= AUTO_CHUNKED_MIN_N):
        return "chunked"
    return "xla_sort"


def _sort_impl(keys: jnp.ndarray, payloads, config: SortConfig):
    if keys.ndim != 1:
        raise EngineError(OperationStatus.HOST_BUFFERS_FAILED,
                          f"keys must be 1-D, got shape {keys.shape}")
    _require_x64_if_needed(keys.dtype)
    n = keys.shape[0]
    orig_dtype = np.dtype(keys.dtype)
    keys_u = dtypes.to_sortable_unsigned(keys)
    engine = _dispatch_engine(config.engine, n)
    if engine == "xla_sort":
        ku, pls = _xla_sort_engine(keys_u, payloads, n)
    elif engine == "xla_radix":
        ku, pls = _sort_biased_jit(keys_u, tuple(payloads), config, n)
    elif engine == "pallas":
        from . import pallas_radix

        ku, pls = pallas_radix.sort_biased(keys_u, tuple(payloads), config, n)
    elif engine == "pallas_merge":
        ku, pls = _pallas_merge_engine(keys_u, payloads, n)
    elif engine == "pallas_stream":
        ku, pls = _pallas_stream_engine(keys_u, payloads, n)
    elif engine == "chunked":
        from . import chunked_sort

        ku, pls = chunked_sort.sort_chunked_biased(keys_u, tuple(payloads))
    else:
        raise EngineError(OperationStatus.INITIALIZATION_FAILED,
                          f"unknown engine {engine!r}")
    return dtypes.from_sortable_unsigned(ku, orig_dtype), pls


def sort(keys: jnp.ndarray, config: SortConfig = DEFAULT_CONFIG,
         engine: str | None = None) -> jnp.ndarray:
    """Key-only sort (ascending, stable by construction)."""
    if engine is not None:
        config = dataclasses.replace(config, engine=engine)
    out, _ = _sort_impl(keys, (), config)
    return out


def sort_kv(keys: jnp.ndarray, values: Any,
            config: SortConfig = DEFAULT_CONFIG,
            engine: str | None = None):
    """Key-value sort: ``values`` is a pytree of 1-D arrays with the same
    length as ``keys``; every leaf is permuted alongside the keys.

    This makes the reference's *vestigial* permutation machinery real: its
    reorder kernel allocated and ping-ponged permutation buffers but never
    used them (#define PERMUT commented out, src/RadixSortGPU.cpp:578,
    SURVEY.md §2 capability notes)."""
    if engine is not None:
        config = dataclasses.replace(config, engine=engine)
    leaves, treedef = jax.tree.flatten(values)
    for leaf in leaves:
        if leaf.shape[0] != keys.shape[0]:
            raise EngineError(
                OperationStatus.HOST_BUFFERS_FAILED,
                f"value leaf length {leaf.shape[0]} != keys {keys.shape[0]}")
    out_keys, out_leaves = _sort_impl(keys, tuple(leaves), config)
    return out_keys, jax.tree.unflatten(treedef, out_leaves)


def argsort(keys: jnp.ndarray, config: SortConfig = DEFAULT_CONFIG,
            engine: str | None = None) -> jnp.ndarray:
    """Stable argsort: the permutation the reference's PERMUT path intended."""
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    _, perm = sort_kv(keys, iota, config=config, engine=engine)
    return perm
