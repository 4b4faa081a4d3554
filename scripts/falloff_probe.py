"""Probe the 2^24 -> 2^27 lax.sort throughput falloff (VERDICT r3 item 4).

Measured r1-r3: u32 key-only lax.sort runs ~909 Melem/s at 2^24 but only
~630 Mkeys/s at 2^27 (-30%).  A sort network's per-element work grows with
log^2(n), so the falloff may simply be stage growth — or VMEM spill at the
last merge levels.  This probe charts:

  1. the size curve: lax.sort at 2^24, 2^25, 2^26, 2^27 (key-only,
     unstable network — the bench.py configuration);
  2. the batched alternative: the SAME total element count shaped
     (K, 2^27/K) and sorted along the last axis — if XLA sorts each row
     at the small-n rate, range-partition-then-batched-sort has real
     headroom;
  3. the same two curves for the stable KV sort (the BASELINE headline
     configuration).

Usage: python scripts/falloff_probe.py [max_log2n=27]
Results recorded in docs/PROBES.md (r4).
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
        np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:1])

    sync(chained(x, r1)); sync(chained(x, rR))
    t1 = tr = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); sync(chained(x, r1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(chained(x, rR))
        tr = min(tr, time.perf_counter() - t0)
    return max(1e-9, (tr - t1) / (reps - 1))


def main():
    max_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    import jax
    import jax.numpy as jnp
    from radix_sort_tpu import datasets_device

    print(f"# backend={jax.default_backend()} "
          f"dev={jax.devices()[0].device_kind}", flush=True)

    n_total = 1 << max_log2
    keys = datasets_device.generate("RandomDistributed", np.uint32,
                                    n_total, seed=9)
    keys.block_until_ready()

    # 1. size curve, key-only unstable (one jit per size: shape is static)
    for ln in range(24, max_log2 + 1):
        n = 1 << ln
        x = keys[:n]

        def step(k):
            return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]

        try:
            secs = timed(step, x, reps=max(2, (1 << 25) // n * 4))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": "size_curve", "n": f"2^{ln}",
                              "failed": type(e).__name__}), flush=True)
            continue
        print(json.dumps({"probe": "size_curve", "n": f"2^{ln}",
                          "ms": round(secs * 1e3, 2),
                          "melem_s": round(n / secs / 1e6, 1)}), flush=True)

    # 2. batched shapes, same total elements (each shape is a multi-minute
    # tunnel compile — the list stays minimal)
    for k_rows in (1, 8, 16):
        shape = (k_rows, n_total // k_rows)
        x = keys.reshape(shape)

        def stepb(a):
            return jax.lax.sort((a,), num_keys=1, is_stable=False,
                                dimension=1)[0]

        try:
            secs = timed(stepb, x, reps=2)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": "batched", "shape": list(shape),
                              "failed": type(e).__name__}), flush=True)
            continue
        print(json.dumps({"probe": "batched", "shape": list(shape),
                          "ms": round(secs * 1e3, 2),
                          "melem_s": round(n_total / secs / 1e6, 1)}),
              flush=True)

    # 3. stable KV variants (the headline config).  k_rows=1 LAST and each
    # row fault-isolated: the monolithic 2^27 stable-KV compile crashed
    # the remote-compile transport in the first r4 attempt.
    vals = jax.device_put(jnp.arange(n_total, dtype=jnp.int32))
    for k_rows in (8, 16, 1):
        shape = (k_rows, n_total // k_rows)
        x = (keys.reshape(shape), vals.reshape(shape))

        def stepkv(t):
            k, v = t
            ko, vo = jax.lax.sort((k, v), num_keys=1, is_stable=True,
                                  dimension=1)
            return ko, vo

        try:
            secs = timed(stepkv, x, reps=2)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": "batched_kv_stable",
                              "shape": list(shape),
                              "failed": type(e).__name__,
                              "msg": str(e)[:160]}), flush=True)
            continue
        print(json.dumps({"probe": "batched_kv_stable",
                          "shape": list(shape),
                          "ms": round(secs * 1e3, 2),
                          "mpairs_s": round(n_total / secs / 1e6, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
