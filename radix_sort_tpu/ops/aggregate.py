"""Hash aggregate (GROUP BY) — BASELINE.json config 3.

TPU-native design: instead of a hash table with random probes (which TPUs
punish), aggregation is *sort-based*: radix-sort rows by the group key, then
segment-reduce runs of equal keys (SURVEY.md §7 M3 "radix-partition then
per-partition reduce").  The sort is the engine's own; the reduction is a
vectorized segmented scan.  Output capacity equals input capacity (worst
case: all keys distinct); ``num_rows`` carries the dynamic group count.

Padding rows (index >= num_rows) are excluded by partitioning them to the
tail before reduction.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes
from ..config import SortConfig, DEFAULT_CONFIG
from ..table import Table
from . import sort as sort_ops

# agg spec: output_name -> (op, input_column); op in AGG_OPS.
AGG_OPS = ("count", "sum", "min", "max", "mean")


def _segment_reduce(op: str, vals: jnp.ndarray, seg_ids: jnp.ndarray,
                    num_segments: int, valid: jnp.ndarray):
    if op == "count":
        return jax.ops.segment_sum(valid.astype(jnp.int32), seg_ids,
                                   num_segments=num_segments)
    v = vals
    if op == "sum" or op == "mean":
        z = jnp.where(valid, v, jnp.zeros((), dtype=v.dtype))
        s = jax.ops.segment_sum(z, seg_ids, num_segments=num_segments)
        if op == "sum":
            return s
        c = jax.ops.segment_sum(valid.astype(v.dtype), seg_ids,
                                num_segments=num_segments)
        return s / jnp.maximum(c, 1)
    if op == "min":
        big = _type_extreme(v.dtype, max_side=True)
        z = jnp.where(valid, v, big)
        return jax.ops.segment_min(z, seg_ids, num_segments=num_segments)
    if op == "max":
        small = _type_extreme(v.dtype, max_side=False)
        z = jnp.where(valid, v, small)
        return jax.ops.segment_max(z, seg_ids, num_segments=num_segments)
    raise ValueError(f"unknown aggregation {op!r}")


def _type_extreme(dtype, max_side: bool):
    d = np.dtype(dtype)
    if d.kind == "f":
        v = np.inf if max_side else -np.inf
    else:
        info = np.iinfo(d)
        v = info.max if max_side else info.min
    return jnp.asarray(v, dtype=d)


def hash_aggregate(table: Table, key: str,
                   aggs: Mapping[str, Tuple[str, str | None]],
                   config: SortConfig = DEFAULT_CONFIG) -> Table:
    """GROUP BY ``key`` with aggregations ``aggs``.

    ``aggs`` maps output column name to (op, input_column); input_column is
    ignored (may be None) for "count".  Returns a Table with the group key
    column plus one column per aggregation; groups are emitted in ascending
    key order (a sorted GROUP BY — stronger than the reference-free hash
    contract, and deterministic).
    """
    keys = table[key]
    cap = table.capacity
    valid_in = table.valid_mask()

    # Sort rows by (padding-last, key): bias keys to unsigned and give
    # padding rows the sentinel so they sink to the tail.
    ku = dtypes.to_sortable_unsigned(keys)
    sent = dtypes._np_scalar(np.dtype(ku.dtype),
                             dtypes.sentinel_max_unsigned(ku.dtype))
    ku = jnp.where(valid_in, ku, sent)

    needed_cols = sorted({c for (_, c) in aggs.values() if c is not None})
    payload = {c: table[c] for c in needed_cols}
    payload["__valid__"] = valid_in.astype(jnp.int32)
    ku_sorted, payload_sorted = sort_ops.sort_kv(ku, payload, config=config)
    valid = payload_sorted.pop("__valid__").astype(bool)

    # Run boundaries over the sorted keys; padding contributes no groups.
    prev = jnp.concatenate([ku_sorted[:1] + 1 if cap else ku_sorted[:1],
                            ku_sorted[:-1]]) if cap else ku_sorted
    is_new = jnp.logical_and(valid, jnp.logical_or(
        jnp.arange(cap, dtype=jnp.int32) == 0, ku_sorted != prev))
    seg_ids = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    seg_ids = jnp.where(valid, seg_ids, cap - 1 if cap else 0)
    num_groups = jnp.sum(is_new.astype(jnp.int32))

    # Group keys: first occurrence of each run.
    group_keys_u = jax.ops.segment_max(
        jnp.where(is_new, ku_sorted, jnp.zeros((), dtype=ku_sorted.dtype)),
        seg_ids, num_segments=cap)
    out_cols = {key: dtypes.from_sortable_unsigned(group_keys_u, keys.dtype)}

    for out_name, (op, in_col) in aggs.items():
        vals = payload_sorted[in_col] if in_col is not None else ku_sorted
        out_cols[out_name] = _segment_reduce(op, vals, seg_ids, cap, valid)

    return Table(out_cols, num_rows=num_groups)
