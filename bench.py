#!/usr/bin/env python
"""Headline benchmark: u32 sort, 2^25 uniform-random keys — the reference's
flagship row (Performance/performance_uniform.csv:101: 740.664 ms on a
GTX 680 → 45.3 Mkeys/s).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...audit...}

vs_baseline is our keys/s over the reference's 45.3 Mkeys/s.

Timing (self-checking — VERDICT r4 weak #1: a ~65 ms transport hiccup in
the 1-rep arm of a 2-arm subtraction once doubled the reported rate to an
unreproducible 1766 Mkeys/s):
  * ONE jit with a dynamic fori_loop bound serves every rep count.
  * three arms R=1,5,17: rate = (T(17)-T(1))/16 — the delta spans 16
    sorts (~660 ms at 2^25), so an O(10-65 ms) hiccup moves it <10%.
  * cross-check: the independent subtraction (T(17)-T(5))/12 must agree
    with (T(17)-T(1))/16 within 10% or the whole measurement is
    re-taken; after 4 attempts the row is emitted with "suspect": true
    rather than silently wrong.  This is the check that matters: the
    corruption mode that SURVIVES min-over-iters is under-measurement
    (an early transport ack shrinking one arm — the 1766 mechanism),
    and any single corrupted arm moves the two subtractions unequally.
  * plus plain monotonicity (T(1) < T(5) < T(17)).  An absolute
    T(17)-vs-T(1) ratio test was tried first and false-positived on the
    ~25 ms fixed dispatch overhead in T(1) (results_r5/bench_run1.log).
All arms are min-over-iters; the JSON carries t1/t5/t17 and both derived
rates so the subtraction is auditable after the fact.
"""

import json
import time

import numpy as np

BASELINE_MKEYS_PER_SEC = 33_554_432 / 0.740664 / 1e6  # 45.30 Mkeys/s
LOG2N = 25
REPS = (1, 5, 17)


def timed_chain(fn, x, reps=REPS, iters=3, warmup=1):
    """Return (secs_per_call, audit_dict). See module docstring."""
    import jax
    import jax.numpy as jnp

    chained = jax.jit(
        lambda a, r: jax.lax.fori_loop(0, r, lambda _, v: fn(v), a))
    rs = [jnp.int32(r) for r in reps]

    def sync(out):
        np.asarray(out[:1])

    for _ in range(warmup):
        for r in rs:
            sync(chained(x, r))

    rate_a = rate_b = best = None
    for attempt in range(4):
        best = [1e9] * len(reps)
        for _ in range(iters):
            for i, r in enumerate(rs):
                t0 = time.perf_counter()
                sync(chained(x, r))
                best[i] = min(best[i], time.perf_counter() - t0)
        t1, tm, tR = best
        rate_a = max(1e-9, (tR - t1) / (reps[2] - reps[0]))
        rate_b = max(1e-9, (tR - tm) / (reps[2] - reps[1]))
        clean_t1 = t1 < tm < tR
        agree = abs(rate_a - rate_b) <= 0.10 * max(rate_a, rate_b)
        if clean_t1 and agree:
            break
        print(f"# suspect timing attempt {attempt}: t1={t1*1e3:.1f}ms "
              f"t{reps[1]}={tm*1e3:.1f}ms t{reps[2]}={tR*1e3:.1f}ms — retry")
    audit = {
        "t1_ms": round(best[0] * 1e3, 2),
        f"t{reps[1]}_ms": round(best[1] * 1e3, 2),
        f"t{reps[2]}_ms": round(best[2] * 1e3, 2),
        "rate_cross_ms": round(rate_b * 1e3, 2),
        "suspect": not (clean_t1 and agree),
    }
    return rate_a, audit


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
    secs, audit = timed_chain(lambda k: sort(k, config=cfg), keys)
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
        **audit,
    }))


if __name__ == "__main__":
    main()
