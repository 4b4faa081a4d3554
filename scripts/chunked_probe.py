"""A/B the range-chunked engine against xla_sort on the real chip
(VERDICT r3 item 4: the 909->630 Melem/s 2^24->2^27 falloff).

For each size, times key-only (unstable network vs chunked) and stable KV
(the BASELINE headline shape), validates the chunked output on device
(sortedness + permutation proof), and reports whether the runtime
overflow fallback triggered (it should not on uniform data).

Usage: python scripts/chunked_probe.py [log2n ...]   (default: 25 26 27)
Results recorded in docs/PROBES.md + RESULTS_R4.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(step, x, reps=4, iters=3):
    import jax
    import jax.numpy as jnp

    chained = jax.jit(lambda a, r: jax.lax.fori_loop(
        0, r, lambda _, v: step(v), a))
    r1, rR = jnp.int32(1), jnp.int32(reps)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0][:1])

    try:
        sync(chained(x, r1)); sync(chained(x, rR))
        run1 = lambda a: chained(a, r1)   # noqa: E731
        runR = lambda a: chained(a, rR)   # noqa: E731
    except Exception as e:  # noqa: BLE001  (scoped-vmem at some sizes)
        print(f"# fori chain failed ({type(e).__name__}); unrolled "
              f"fallback", flush=True)
        import jax

        def unrolled(r):
            def _f(a):
                for _ in range(r):
                    a = step(a)
                return a
            return jax.jit(_f)
        u1, uR = unrolled(1), unrolled(reps)
        run1, runR = (lambda a: u1(a)), (lambda a: uR(a))
        sync(run1(x)); sync(runR(x))
    t1 = tr = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); sync(run1(x))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(runR(x))
        tr = min(tr, time.perf_counter() - t0)
    return max(1e-9, (tr - t1) / (reps - 1))


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [25, 26, 27]
    import jax
    import jax.numpy as jnp
    from radix_sort_tpu import datasets_device, dtypes
    from radix_sort_tpu.ops import chunked_sort, sort as sort_ops

    print(f"# backend={jax.default_backend()} "
          f"dev={jax.devices()[0].device_kind}", flush=True)

    for ln in sizes:
        n = 1 << ln
        keys = datasets_device.generate("RandomDistributed", np.uint32, n,
                                        seed=13)
        keys.block_until_ready()
        vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))

        # --- key-only ---
        def step_xla(k):
            return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]

        def step_chunk(k):
            ko, _ = chunked_sort.sort_chunked_biased(k, stable=False)
            return ko

        for name, step in (("xla_unstable", step_xla),
                           ("chunked", step_chunk)):
            secs = timed(step, keys)
            print(json.dumps({"probe": "keyonly", "n": f"2^{ln}",
                              "engine": name,
                              "ms": round(secs * 1e3, 2),
                              "mkeys_s": round(n / secs / 1e6, 1)}),
                  flush=True)

        # validate chunked key-only on device
        ko = jax.jit(step_chunk)(keys)
        ok = bool(jax.jit(
            lambda ki, k: jnp.all(k[1:] >= k[:-1])
            & (jnp.sum(k) == jnp.sum(ki))
            & (jnp.bitwise_xor.reduce(k) == jnp.bitwise_xor.reduce(ki)))(
            keys, ko))
        print(json.dumps({"probe": "keyonly_valid", "n": f"2^{ln}",
                          "ok": ok}), flush=True)

        # --- stable KV (headline shape) ---
        # the payload rides the fori carry tuple, NEVER a closure capture:
        # a captured device array becomes a 512 MB literal in the compile
        # request and the transport rejects it (HTTP 413 — see
        # scripts/headline_probe.py)
        def stepkv_xla(t):
            ko2, vo2 = jax.lax.sort(t, num_keys=1, is_stable=True)
            return ko2, vo2

        def stepkv_chunk(t):
            k, v = t
            ko2, (vo2,) = chunked_sort.sort_chunked_biased(k, (v,))
            return ko2, vo2

        for name, step in (("xla_stable_kv", stepkv_xla),
                           ("chunked_kv", stepkv_chunk)):
            secs = timed(step, (keys, vals))
            print(json.dumps({"probe": "kv", "n": f"2^{ln}",
                              "engine": name,
                              "ms": round(secs * 1e3, 2),
                              "mpairs_s": round(n / secs / 1e6, 1)}),
                  flush=True)

        kv_full = jax.jit(lambda k, v: chunked_sort.sort_chunked_biased(
            k, (v,)))(keys, vals)
        ko2, (vo2,) = kv_full
        okkv = bool(jax.jit(
            lambda ki, k, v: jnp.all(k[1:] >= k[:-1])
            & jnp.all(jnp.take(ki, v) == k)
            & (jnp.sum(v.astype(jnp.uint32))
               == jnp.sum(jnp.arange(n, dtype=jnp.uint32)))
            & jnp.all((k[1:] > k[:-1]) | (v[1:] > v[:-1])))(
            keys, ko2, vo2))
        print(json.dumps({"probe": "kv_valid_stable", "n": f"2^{ln}",
                          "ok": okkv}), flush=True)


if __name__ == "__main__":
    main()
