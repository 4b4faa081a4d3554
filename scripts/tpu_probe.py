"""Measure primitive costs on the real TPU: XLA sort, scatter, gather,
one-hot rank, and the engine's sort paths.  Informs engine 'auto' policy and
the Pallas roadmap.  Run ON TPU (ambient backend): python scripts/tpu_probe.py

Timing method: the axon tunnel acks block_until_ready before execution truly
finishes, so each op is benched as a chained fori_loop of R reps inside one
jit (sequential data dependency through the loop carry) with a device_get
sync; per-op time = (T(R) - T(1)) / (R - 1), cancelling dispatch overhead.
Every benched callable maps x -> same-shape/dtype x to keep the carry chain.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf[:1])


def bench(fn, x, iters=3, warmup=2, reps=8):
    import jax

    def chained(r):
        return jax.jit(
            lambda a: jax.lax.fori_loop(0, r, lambda _, v: fn(v), a))

    f1, fr = chained(1), chained(reps)
    for _ in range(warmup):
        _sync(f1(x))
        _sync(fr(x))
    t1s, trs = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); _sync(f1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(fr(x)); trs.append(time.perf_counter() - t0)
    return max(1e-9, (min(trs) - min(t1s)) / (reps - 1))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << logn
    # generate ON DEVICE: host uploads at these sizes take minutes through
    # the dev tunnel (see CLAUDE.md environment rules).
    @jax.jit
    def _gen():
        keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
        perm = jax.random.permutation(
            jax.random.key(1), n).astype(jnp.int32)
        return keys, perm

    keys, perm = _gen()
    keys.block_until_ready()

    results = {}

    def rec(name, secs, bytes_moved=None):
        results[name] = {"ms": round(secs * 1e3, 3),
                         "Mkeys/s": round(n / secs / 1e6, 1)}
        if bytes_moved:
            results[name]["GB/s"] = round(bytes_moved / secs / 1e9, 1)
        print(f"{name:34s} {results[name]}", flush=True)

    rec("elementwise +1 u32",
        bench(lambda v: v + np.uint32(1), keys), bytes_moved=8 * n)
    rec("gather u32 by perm",
        bench(lambda v: v[perm], keys), bytes_moved=12 * n)
    rec("scatter u32 by perm",
        bench(lambda v: jnp.zeros_like(v).at[perm].set(
            v, unique_indices=True), keys), bytes_moved=12 * n)
    rec("cumsum u32", bench(lambda v: jnp.cumsum(v), keys),
        bytes_moved=8 * n)
    rec("lax.sort u32",
        bench(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=True)[0],
              keys, reps=4))
    rec("lax.sort_kv u32+u32",
        bench(lambda k: jax.lax.sort(
            (k, k ^ np.uint32(123)), num_keys=1, is_stable=True)[0],
            keys, reps=4))

    # one-hot rank machinery (single 8-bit radix pass) — xla path
    from radix_sort_tpu.ops import ranking

    def rank_xla(k):
        d = (k & np.uint32(255)).astype(jnp.int32).reshape(-1, 1 << 15)
        dest, _, _ = ranking.stable_dest(d, 256, sequential_blocks=True)
        return dest.reshape(-1).astype(jnp.uint32)

    rec("rank pass R=256 (lax.map)", bench(rank_xla, keys, reps=4))

    # full engines
    from radix_sort_tpu.ops import sort as sort_ops
    from radix_sort_tpu.config import SortConfig

    for eng, bits, blk in (("xla_radix", 8, 1 << 15),):
        cfg = SortConfig(bits_per_pass=bits, block_elems=blk, engine=eng)
        try:
            rec(f"{eng} b{bits} e2e",
                bench(lambda k: sort_ops.sort_biased_kv(k, (), cfg)[0],
                      keys, reps=3, iters=2, warmup=1))
        except Exception as e:  # noqa: BLE001
            print(f"{eng} failed: {type(e).__name__}: {e}", flush=True)

    # pallas kernels standalone
    from radix_sort_tpu.ops import pallas_radix as pr
    digits = jax.jit(lambda k: (k & np.uint32(255)).astype(jnp.int32))(keys)
    try:
        rec("pallas hist R=256",
            bench(lambda d: d + pr.digit_histogram(d, 256, 1 << 13)[0, 0],
                  digits), bytes_moved=8 * n)
        rec("pallas hist R=16",
            bench(lambda d: d + pr.digit_histogram(
                d & 15, 16, 1 << 15)[0, 0], digits), bytes_moved=8 * n)
        base = jnp.zeros((n // (1 << 13), 256), jnp.int32)
        rec("pallas rank R=256",
            bench(lambda d: pr.rank_pass(d, base, 256, 1 << 13), digits),
            bytes_moved=8 * n)
        rec("pallas scan 1M",
            bench(lambda d: d.at[: 1 << 20].set(
                pr.exclusive_scan(d[: 1 << 20])), digits))
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
