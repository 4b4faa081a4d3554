#!/usr/bin/env python
"""Headline benchmark: u32 sort, 2^25 uniform-random keys — the reference's
flagship row (Performance/performance_uniform.csv:101: 740.664 ms on a
GTX 680 → 45.3 Mkeys/s).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is our keys/s over the reference's 45.3 Mkeys/s.

Timing: the sort is run as a chained fori_loop of R reps inside one jit
(sequential dependency) and synced with a device_get of a dependent slice;
per-sort time = (T(R) - T(1)) / (R - 1).  This cancels dispatch overhead and
is robust to transports whose block_until_ready acks early (axon tunnel).
The full sweep harness lives in scripts/benchmark.py.
"""

import json
import time

import numpy as np

BASELINE_MKEYS_PER_SEC = 33_554_432 / 0.740664 / 1e6  # 45.30 Mkeys/s
LOG2N = 25


def timed_chain(fn, x, reps=4, iters=3, warmup=2):
    import jax

    def chained(r):
        return jax.jit(
            lambda a: jax.lax.fori_loop(0, r, lambda _, v: fn(v), a))

    f1, fr = chained(1), chained(reps)

    def sync(out):
        np.asarray(out[:1])

    for _ in range(warmup):
        sync(f1(x))
        sync(fr(x))
    t1s, trs = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); sync(f1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(fr(x)); trs.append(time.perf_counter() - t0)
    return max(1e-9, (min(trs) - min(t1s)) / (reps - 1))


def main():
    import jax
    import jax.numpy as jnp

    from radix_sort_tpu import sort
    from radix_sort_tpu.config import SortConfig
    from radix_sort_tpu.datasets import RandomDistributed

    n = 1 << LOG2N
    data = RandomDistributed(np.uint32, seed=0).generate(n)
    keys = jax.device_put(jnp.asarray(data))

    cfg = SortConfig(engine="auto")
    secs = timed_chain(lambda k: sort(k, config=cfg), keys)
    mkeys = n / secs / 1e6

    # Validation: on-device sortedness + multiset checksum, plus bit-exact
    # spot check of a 2^20 prefix against np.sort (full 128 MB device→host
    # pulls are tunnel-expensive under the dev transport).
    out = jax.jit(lambda k: sort(k, config=cfg))(keys)
    sorted_ok = bool(jax.jit(lambda o: jnp.all(o[1:] >= o[:-1]))(out))
    sum_ok = bool(jax.jit(
        lambda o, k: (jnp.sum(o, dtype=jnp.uint32)
                      == jnp.sum(k, dtype=jnp.uint32))
        & (jnp.bitwise_xor.reduce(o) == jnp.bitwise_xor.reduce(k)))(
            out, keys))
    m = 1 << 20
    prefix_ok = np.array_equal(np.asarray(out[:m]),
                               np.sort(data)[:m])
    assert sorted_ok and sum_ok and prefix_ok, (
        f"validation failed: sorted={sorted_ok} checksum={sum_ok} "
        f"prefix={prefix_ok}")

    print(json.dumps({
        "metric": f"u32_sort_2^{LOG2N}_uniform_throughput",
        "value": round(mkeys, 2),
        "unit": "Mkeys/s",
        "vs_baseline": round(mkeys / BASELINE_MKEYS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
