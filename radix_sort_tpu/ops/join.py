"""Radix-partitioned hash join (build + probe) — BASELINE.json config 4.

TPU-native design.  A classical hash join does random-access probes into a
hash table; TPUs punish random access, so the probe is re-designed around the
engine's own sort machinery (SURVEY.md §7 M3):

  build:  radix-sort the build side by key (our LSD sort — this *is* the
          radix partitioning, taken to its fixed point).
  probe:  for every probe row, binary-search the sorted build keys with a
          vectorized, sort-friendly ``searchsorted``; runs of duplicate build
          keys are expanded per match.
  emit:   matched pairs are compacted (same scan+scatter primitive as
          filter) into a static-capacity output table.

``radix_partition`` (ops/partition.py) is exposed separately and used by the
distributed join to split both tables by key digit across chips before this
single-chip kernel runs per partition (parallel/dist_ops.py).

Output sizing: inner-join output is data-dependent; capacity must be given
statically (``out_capacity``, default = probe capacity x ``expand``).  If the
true match count exceeds capacity the result reports ``overflow`` = True and
truncates — the same static-shape discipline the distributed shuffle uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes
from ..config import SortConfig, DEFAULT_CONFIG
from ..table import Table
from . import partition, sort as sort_ops


def _searchsorted_left(sorted_u: jnp.ndarray, queries_u: jnp.ndarray):
    """Vectorized lower-bound on TPU-friendly compare-based method."""
    return jnp.searchsorted(sorted_u, queries_u, side="left", method="sort")


def _biased_with_sentinel(table: Table, key: str):
    u = dtypes.to_sortable_unsigned(table[key])
    sent = dtypes._np_scalar(np.dtype(u.dtype),
                             dtypes.sentinel_max_unsigned(u.dtype))
    return jnp.where(table.valid_mask(), u, sent)


def _merge_scan_join(probe: Table, build: Table, key: str,
                     out_capacity: int, suffixes):
    """Gather/scatter-free inner join for unique build keys (the hot path —
    XLA TPU gather runs at ~1.5 GB/s, docs/DESIGN.md §2.2):

      1. ONE stable multi-key sort of build+probe rows by (key, side) with
         every column as payload (build rows first among equal keys).
      2. a segmented forward scan propagates each build row's payload to the
         probe rows in its key run (lax.associative_scan — no gathers).
      3. matched probe rows compact to the front with one more stable sort.

    Output rows are emitted in key order (probe order preserved within
    equal keys).  Padding rows on either side never match (sentinel keys
    with a no-match flag).
    """
    P, B = probe.capacity, build.capacity
    n = P + B
    pu = _biased_with_sentinel(probe, key)
    bu = _biased_with_sentinel(build, key)
    keys_all = jnp.concatenate([bu, pu])
    # side: build=0 sorts before probe=1 within a key run.
    side = jnp.concatenate([jnp.zeros((B,), jnp.int32),
                            jnp.ones((P,), jnp.int32)])
    build_valid = jnp.concatenate([build.valid_mask(),
                                   jnp.zeros((P,), bool)])
    probe_valid = jnp.concatenate([jnp.zeros((B,), bool),
                                   probe.valid_mask()])

    operands = [keys_all, side, build_valid, probe_valid]
    b_names = build.column_names
    p_names = probe.column_names
    for nme in b_names:
        operands.append(jnp.concatenate(
            [build.columns[nme],
             jnp.zeros((P,), build.columns[nme].dtype)]))
    for nme in p_names:
        operands.append(jnp.concatenate(
            [jnp.zeros((B,), probe.columns[nme].dtype),
             probe.columns[nme]]))
    out = jax.lax.sort(tuple(operands), num_keys=2, is_stable=True)
    k_s, side_s, bval_s, pval_s = out[0], out[1], out[2], out[3]
    b_cols_s = dict(zip(b_names, out[4:4 + len(b_names)]))
    p_cols_s = dict(zip(p_names, out[4 + len(b_names):]))

    # run starts: first row of each distinct key.
    is_start = jnp.concatenate([jnp.ones((1,), bool), k_s[1:] != k_s[:-1]])
    is_build = jnp.logical_and(side_s == 0, bval_s)
    # duplicate build keys within one run (violates the max_duplicates=1
    # contract — reported via the overflow flag, like the expand path).
    prev_build = jnp.concatenate([jnp.zeros((1,), bool), is_build[:-1]])
    is_dup = is_build & prev_build & ~is_start

    # propagate (has_build, run_has_dup, FIRST build payload) within runs.
    def combine(a, b):
        reset_a, hasb_a, dup_a = a[0], a[1], a[2]
        reset_b, hasb_b, dup_b = b[0], b[1], b[2]
        out_reset = jnp.logical_or(reset_a, reset_b)
        out_has = jnp.where(reset_b, hasb_b,
                            jnp.logical_or(hasb_a, hasb_b))
        out_dup = jnp.where(reset_b, dup_b, jnp.logical_or(dup_a, dup_b))
        # keep-first: only adopt b's payload when a has none (or b resets).
        take_b = jnp.logical_or(reset_b,
                                jnp.logical_and(hasb_b, ~hasb_a))
        merged = [out_reset, out_has, out_dup]
        for va, vb in zip(a[3:], b[3:]):
            merged.append(jnp.where(take_b, vb, va))
        return tuple(merged)

    carry_in = (is_start, is_build, is_dup) + tuple(
        b_cols_s[nme] for nme in b_names)
    scanned = jax.lax.associative_scan(combine, carry_in)
    has_build = scanned[1]
    run_has_dup = scanned[2]
    prop_b = dict(zip(b_names, scanned[3:]))

    matched = jnp.logical_and(jnp.logical_and(side_s == 1, pval_s),
                              has_build)
    n_match = jnp.sum(matched.astype(jnp.int32))
    dup_overflow = jnp.any(jnp.logical_and(matched, run_has_dup))

    # compact matched probe rows (with their propagated build payloads).
    names_out = []
    vals_out = []
    for nme in p_names:
        names_out.append(nme + suffixes[0])
        vals_out.append(p_cols_s[nme])
    for nme in b_names:
        oname = nme + suffixes[1] if (nme + suffixes[0]) in names_out             else nme
        names_out.append(oname)
        vals_out.append(prop_b[nme])
    ck = jnp.where(matched, 0, 1).astype(jnp.int32)
    packed = jax.lax.sort((ck,) + tuple(vals_out), num_keys=1,
                          is_stable=True)[1:]
    n_out = jnp.minimum(n_match, out_capacity)
    out_cols = {nm: v[:out_capacity] for nm, v in zip(names_out, packed)}
    stats = {"match_count": n_match,
             "overflow": jnp.logical_or(n_match > out_capacity,
                                        dup_overflow)}
    return Table(out_cols, num_rows=n_out), stats


def hash_join(probe: Table, build: Table, key: str,
              out_capacity: int | None = None,
              max_duplicates: int = 1,
              suffixes=("", "_r"),
              config: SortConfig = DEFAULT_CONFIG):
    """Inner join ``probe`` ⋈ ``build`` on column ``key``.

    ``max_duplicates`` bounds how many build rows may share one key (the
    per-key fanout); output capacity defaults to
    ``probe.capacity * max_duplicates``.

    Returns ``(table, stats)`` where stats carries jit-safe device scalars
    ``match_count`` and ``overflow`` (true match count exceeded capacity or a
    key's duplicate run exceeded max_duplicates).
    """
    if out_capacity is None:
        out_capacity = probe.capacity * max_duplicates

    pk, bk = probe[key], build[key]
    if pk.dtype != bk.dtype:
        raise ValueError(f"join key dtypes differ: {pk.dtype} vs {bk.dtype}")

    if max_duplicates == 1:
        return _merge_scan_join(probe, build, key, out_capacity, suffixes)

    # ---- build phase: sort build side by biased key, padding last (build
    # validity rides along so candidates can exclude padding rows, which
    # share the sentinel value with real max-valued keys).
    bu = dtypes.to_sortable_unsigned(bk)
    sent = dtypes._np_scalar(np.dtype(bu.dtype),
                             dtypes.sentinel_max_unsigned(bu.dtype))
    bu = jnp.where(build.valid_mask(), bu, sent)
    b_names = build.column_names
    payload = {n: build.columns[n] for n in b_names}
    payload["__bvalid__"] = build.valid_mask().astype(jnp.int32)
    bu_sorted, b_sorted = sort_ops.sort_kv(bu, payload, config=config)
    bvalid_sorted = b_sorted.pop("__bvalid__").astype(bool)

    # ---- probe phase: lower bound of each probe key in the sorted build.
    pu = dtypes.to_sortable_unsigned(pk)
    lo = _searchsorted_left(bu_sorted, pu).astype(jnp.int32)  # (P,)

    P = probe.capacity
    Bcap = build.capacity
    probe_valid = probe.valid_mask()

    # Expand each probe row over up to max_duplicates consecutive build rows.
    # Candidates past the end of the build array are invalid (clamping alone
    # would duplicate the last row's match).
    offs = jnp.arange(max_duplicates, dtype=jnp.int32)            # (D,)
    raw_cand = lo[:, None] + offs[None, :]                        # (P, D)
    in_range = raw_cand < Bcap
    cand = jnp.minimum(raw_cand, Bcap - 1)
    cand_keys = bu_sorted[cand.reshape(-1)].reshape(P, max_duplicates)
    cand_valid = bvalid_sorted[cand.reshape(-1)].reshape(P, max_duplicates)
    match = (cand_keys == pu[:, None]) & probe_valid[:, None] \
        & in_range & cand_valid                                   # (P, D)
    # Guard duplicate-capped overflow: a run longer than max_duplicates means
    # the D-th candidate still matches — detect for the overflow flag.
    over_cand = jnp.minimum(lo + max_duplicates, Bcap - 1)
    dup_overflow = jnp.any(
        (bu_sorted[over_cand] == pu) & bvalid_sorted[over_cand]
        & probe_valid & (lo + max_duplicates < Bcap))

    # ---- emit: flatten (P, D) candidates, compact matches to the front.
    flat_match = match.reshape(-1)
    probe_idx = jnp.repeat(jnp.arange(P, dtype=jnp.int32), max_duplicates)
    build_idx = cand.reshape(-1)

    arrays = (probe_idx, build_idx)
    (pidx, bidx), n_match = partition.compact_mask(flat_match, arrays)
    n_out = jnp.minimum(n_match, out_capacity)
    pidx = pidx[:out_capacity]
    bidx = bidx[:out_capacity]

    out_cols = {}
    for n in probe.column_names:
        name = n + suffixes[0]
        out_cols[name] = probe.columns[n][pidx]
    for n in b_names:
        name = n + suffixes[1] if (n + suffixes[0]) in out_cols else n
        out_cols[name] = b_sorted[n][bidx]

    out = Table(out_cols, num_rows=n_out)
    stats = {
        "match_count": n_match,
        "overflow": jnp.logical_or(n_match > out_capacity, dup_overflow),
    }
    return out, stats
