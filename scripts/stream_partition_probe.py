"""Hardware validation + measurement of the streaming partition / N-plane
sort paths (round-3 production-job work for pallas_stream).

1. Validates sort_planes (multi-payload) and partition_planes bit-exact on
   the real chip (interpret mode passes things Mosaic rejects — CLAUDE.md).
2. Measures the production question: is ONE streaming pass
   (partition_planes) faster than the full stable lax.sort that
   stable_partition(method="sort") pays — and how does the gap scale with
   payload plane count?

Usage: python scripts/stream_partition_probe.py [log2n=22] [log2n2=24]
Writes findings to stdout (recorded in docs/PROBES.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(step, x, rest=(), reps=8, iters=3):
    # ``rest`` (payload planes) rides as a jit ARGUMENT: closure-captured
    # device arrays are serialized into the compile request as literals
    # and 4 planes at 2^24 (256 MB) exceed the transport's length limit
    # (HTTP 413 — results_r5/stream_partition_try2.log; CLAUDE.md).
    import jax
    import jax.numpy as jnp

    chained = jax.jit(lambda a, rr, r: jax.lax.fori_loop(
        0, r, lambda _, v: step(v, rr), a))
    r1, rR = jnp.int32(1), jnp.int32(reps)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0][:1])

    sync(chained(x, rest, r1)); sync(chained(x, rest, rR))
    t1 = tr = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); sync(chained(x, rest, r1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(chained(x, rest, rR))
        tr = min(tr, time.perf_counter() - t0)
    return max(1e-9, (tr - t1) / (reps - 1))


def validate(n=1 << 20):
    import jax
    import jax.numpy as jnp
    from radix_sort_tpu.ops import pallas_stream as ps

    rng = np.random.default_rng(31)
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    f32 = rng.standard_normal(n).astype(np.float32)

    # multi-plane sort: keys + 2 payload planes
    ko, (a, b) = jax.jit(lambda k, x, y: ps.sort_planes(k, (x, y)))(
        jnp.asarray(keys), jnp.asarray(vals),
        jax.lax.bitcast_convert_type(jnp.asarray(f32), jnp.int32))
    order = np.argsort(keys, kind="stable")
    ok_sort = (np.array_equal(np.asarray(ko), keys[order])
               and np.array_equal(np.asarray(a), vals[order])
               and np.array_equal(
                   np.asarray(jax.lax.bitcast_convert_type(b, jnp.float32)),
                   f32[order]))
    print(f"sort_planes 2-payload n=2^20: {'OK' if ok_sort else 'MISMATCH'}",
          flush=True)

    ok_part = True
    for nb in (8, 16):
        ids = rng.integers(0, nb, n).astype(np.int32)
        outs, counts = jax.jit(
            lambda i, v, nb=nb: ps.partition_planes(i, (v,), nb))(
            jnp.asarray(ids), jnp.asarray(vals))
        po = np.argsort(ids, kind="stable")
        ok = (np.array_equal(np.asarray(outs[0]), vals[po])
              and np.array_equal(np.asarray(counts),
                                 np.bincount(ids, minlength=nb)))
        ok_part &= ok
        print(f"partition_planes nb={nb} n=2^20: "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
    return ok_sort and ok_part


def measure(log2n, nplanes_list=(1, 2, 4), nb=16):
    import jax
    import jax.numpy as jnp
    from radix_sort_tpu.ops import pallas_stream as ps
    from radix_sort_tpu.ops import partition

    n = 1 << log2n
    rng = np.random.default_rng(32)
    ids = jax.device_put(jnp.asarray(
        rng.integers(0, nb, n).astype(np.int32)))
    planes = tuple(
        jax.device_put(jnp.asarray(
            rng.integers(0, 2**31, n).astype(np.int32)))
        for _ in range(max(nplanes_list)))

    out = []
    for npl in nplanes_list:
        pls = planes[:npl]

        def step_stream(i, rr):
            o, _ = ps.partition_planes(i, rr, nb)
            return o[0] ^ i if npl else i

        def step_sort(i, rr):
            o, _, _ = partition.stable_partition(i, rr, nb, method="sort")
            return o[0] ^ i

        t_stream = timed(step_stream, ids, pls)
        t_sort = timed(step_sort, ids, pls)
        row = {"n": n, "nb": nb, "payload_planes": npl,
               "stream_ms": round(t_stream * 1e3, 3),
               "lax_sort_ms": round(t_sort * 1e3, 3),
               "speedup": round(t_sort / t_stream, 2),
               "stream_melem_s": round(n / t_stream / 1e6, 1)}
        out.append(row)
        print(json.dumps(row), flush=True)
    return out


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    log2n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    import jax

    print(f"# backend={jax.default_backend()} "
          f"dev={jax.devices()[0].device_kind}", flush=True)
    ok = validate()
    if not ok:
        print("VALIDATION FAILED — not measuring", flush=True)
        sys.exit(1)
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    planes = (tuple(int(p) for p in sys.argv[4].split(","))
              if len(sys.argv) > 4 else (1, 2, 4))
    for ln in dict.fromkeys((log2n, log2n2)):
        measure(ln, nplanes_list=planes, nb=nb)


if __name__ == "__main__":
    main()
