"""Validate + benchmark the streaming radix engine (ops/pallas_stream.py)
on the real chip.

  python scripts/stream_bench.py --logn 22 --radix 16 --rows 128

Validates bit-exactness on a 2^18 prefix (host) + full on-device checks
(sortedness, multiset sum/xor), then reports tunnel-safe chained timing.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=22)
    ap.add_argument("--radix", type=int, default=16)
    ap.add_argument("--rows", type=int, default=128)
    ap.add_argument("--dist", default="uniform",
                    choices=["uniform", "zeros", "skewed", "range", "all"])
    ap.add_argument("--mode", default="keys",
                    choices=["keys", "kv", "u64", "u64kv"])
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--validate-logn", type=int, default=20)
    args = ap.parse_args()

    from radix_sort_tpu.ops import pallas_stream as ps

    n = 1 << args.logn
    print(f"device={jax.devices()[0].device_kind} n=2^{args.logn} "
          f"R={args.radix} rows={args.rows} dist={args.dist}", flush=True)

    def gen(n, dist, seed=0):
        if dist == "zeros":
            return jnp.zeros((n,), jnp.uint32)
        if dist == "range":
            return jnp.arange(n, dtype=jnp.uint32)[::-1]
        bits = jax.random.bits(jax.random.key(seed), (n,),
                               dtype=jnp.uint32)
        if dist == "skewed":
            sel = jax.random.uniform(jax.random.key(seed + 1), (n,)) < 0.9
            return jnp.where(sel, jnp.uint32(7), bits)
        return bits

    if args.mode == "kv":
        def sort_fn(k):
            ko, vo = ps.sort_u32_kv(
                k, jnp.arange(k.shape[0], dtype=jnp.int32),
                radix=args.radix, rows=args.rows)
            return ko + vo.astype(jnp.uint32) * 0
    elif args.mode == "u64":
        import jax as _j
        _j.config.update("jax_enable_x64", True)

        def sort_fn(k64):
            return ps.sort_u64_keys(k64, radix=args.radix,
                                    rows=args.rows)
    elif args.mode == "u64kv":
        import jax as _j
        _j.config.update("jax_enable_x64", True)

        def sort_fn(k64):
            ko, vo = ps.sort_u64_kv(
                k64, jnp.arange(k64.shape[0], dtype=jnp.int32),
                radix=args.radix, rows=args.rows)
            return ko + vo.astype(jnp.uint64) * jnp.uint64(0)
    else:
        sort_fn = lambda k: ps.sort_u32_keys(  # noqa: E731
            k, radix=args.radix, rows=args.rows)
    sort_fn = jax.jit(sort_fn)

    # ---- validate at the TARGET size.  ONE jit per mode hoisted out of
    # the distribution loop: each fresh lambda is a separate jit cache
    # entry = a separate multi-minute remote compile (CLAUDE.md).
    kv_val_fn = None
    if args.mode == "u64kv":
        kv_val_fn = jax.jit(lambda k: ps.sort_u64_kv(
            k, jnp.arange(n, dtype=jnp.int32), radix=args.radix,
            rows=args.rows))
    elif args.mode == "kv":
        kv_val_fn = jax.jit(lambda k: ps.sort_u32_kv(
            k, jnp.arange(n, dtype=jnp.int32), radix=args.radix,
            rows=args.rows))

    dists = (["uniform", "zeros", "skewed", "range"]
             if args.dist == "all" else [args.dist])
    keys = None
    for dist in dists:
        keys = gen(n, dist)
        if args.mode in ("u64", "u64kv"):
            keys = (keys.astype(jnp.uint64) << jnp.uint64(32)) | \
                jax.random.bits(jax.random.key(7), (n,),
                                dtype=jnp.uint32).astype(jnp.uint64)
        if kv_val_fn is not None:
            kh = np.asarray(keys)
            ko, vo = kv_val_fn(keys)
            order = np.argsort(kh, kind="stable")
            okk = np.array_equal(np.asarray(ko), kh[order])
            okv = np.array_equal(np.asarray(vo), order.astype(np.int32))
            print(f"validate 2^{args.logn} {dist} {args.mode}: keys={okk} "
                  f"stable-perm={okv}", flush=True)
            if not (okk and okv):
                return
            continue
        keys.block_until_ready()
        t0 = time.time()
        out = sort_fn(keys)
        outh = np.asarray(out)
        print(f"run+fetch: {time.time() - t0:.1f}s", flush=True)
        exp = np.sort(np.asarray(keys))
        ok_full = np.array_equal(outh, exp)
        print(f"validate 2^{args.logn} {dist} {args.mode}: "
              f"full={ok_full}", flush=True)
        if not ok_full:
            bad = np.nonzero(outh != exp)[0]
            print(f"  nbad={len(bad)} first={bad[:5]} rows="
                  f"{sorted(set((bad // 128).tolist()))[:10]} "
                  f"got={outh[bad[:3]].tolist()} "
                  f"exp={exp[bad[:3]].tolist()}")
            return

    check_fn = jax.jit(lambda o, k: jnp.all(o[1:] >= o[:-1])
                       & (jnp.sum(o, dtype=jnp.uint64)
                          == jnp.sum(k, dtype=jnp.uint64))
                       & (jnp.bitwise_xor.reduce(o)
                          == jnp.bitwise_xor.reduce(k)))
    chained = jax.jit(lambda a, r: jax.lax.fori_loop(
        0, r, lambda _, v: sort_fn(v), a))

    def sync(o):
        np.asarray(o[:1])

    sync(chained(keys, jnp.int32(1)))
    sync(chained(keys, jnp.int32(args.reps)))
    t1 = tr = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); sync(chained(keys, jnp.int32(1)))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(chained(keys, jnp.int32(args.reps)))
        tr = min(tr, time.perf_counter() - t0)
    secs = max((tr - t1) / (args.reps - 1), 1e-9)
    ok = bool(check_fn(sort_fn(keys), keys))
    print(f"n=2^{args.logn}: {secs * 1e3:.2f} ms  "
          f"{n / secs / 1e6:.1f} Mkeys/s  valid={ok}", flush=True)


if __name__ == "__main__":
    main()
