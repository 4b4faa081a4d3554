"""Fault-isolated headline measurement (VERDICT r4 item 1).

The scored metric is u32 KV sort pairs/s/chip at 2^27 (BASELINE.json).
r4's monolithic cfg2 run poisoned its own process: once the fori-chain
compile crashed the remote-compile transport, every subsequent compile in
the SAME process (even unrolled(1)) raised JaxRuntimeError, so all four
distributions recorded failed=compile without ever disambiguating "this
program cannot compile" from "this process's transport is dead".

This probe fixes that:
  * ONE chain-mode per process — escalation happens across processes
    (scripts/run_headline.sh), never inside one.
  * results are appended to BASELINE_RESULTS.json after EVERY
    distribution (cfg2 wrote only at exit and lost everything to
    timeouts — results_r4/cfg34_2e24.log).
  * failures record the full exception head, not just the class name.
  * timing is self-checking (VERDICT r4 weak 1): both chain arms are
    reported (t1_ms, tR_ms) and a run where tR < (R-1)*t1*0.7 — the
    signature of a jitter-corrupted subtraction — is retried and, if it
    persists, flagged suspect=True in the record.

Row names match scripts/baseline_configs.py config2 exactly, so
scripts/publish_baseline.py and scripts/headline.py consume them as-is.

Usage:
  python scripts/headline_probe.py DTYPE MODE LOG2N [DIST ...]
    DTYPE: u32 | u64
    MODE:  fori | u4 | u2 | u1   (chain construction; one per process)
    DIST:  any of Zeros Random Range InvertedRange (default: all four)

Reference anchor: /root/reference/Performance/performance_uniform.csv:101
(GTX 680 flagship row, u32 2^25 key-only uniform, 740.664 ms).
"""

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BASELINE_RESULTS.json")

HBM_GBS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v5": 2765.0}
DISTS = ("Zeros", "Random", "Range", "InvertedRange")
# datasets_device names: config2's "Random" row is the mt19937 host
# distribution, approximated on device by uniform bits (same name works).


def record(name, **kw):
    existing = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = json.load(f)
    existing[name] = kw
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"[{name}] " + " ".join(f"{k}={v}" for k, v in kw.items()),
          flush=True)


def main():
    dname = sys.argv[1]
    mode = sys.argv[2]
    log2n = int(sys.argv[3])
    dists = sys.argv[4:] or list(DISTS)
    n = 1 << log2n
    dt = {"u32": np.uint32, "u64": np.uint64}[dname]

    import jax
    import jax.numpy as jnp

    if os.environ.get("RST_FORCE_CPU"):
        # env var alone is ignored under the site-hooked backend (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    if np.dtype(dt).itemsize == 8:
        jax.config.update("jax_enable_x64", True)

    from radix_sort_tpu import sort_kv
    from radix_sort_tpu import datasets_device

    kind = jax.devices()[0].device_kind
    hbm = next((v for k, v in HBM_GBS.items() if kind.startswith(k)), None)
    print(f"# backend={jax.default_backend()} dev={kind} "
          f"dtype={dname} mode={mode} n=2^{log2n}", flush=True)

    vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))
    # CRITICAL: vals must be an ARGUMENT of every jit, never a closure
    # capture — a captured device array is baked into the serialized
    # module as a 512 MB literal and the remote-compile transport rejects
    # the body with HTTP 413 (the true cause of r1-r4's 2^27 stable-KV
    # "failed=compile" / broken-pipe headline failures; measured
    # 2026-08-20, results_r5/headline_u32_fori.log first attempt).
    step = lambda k, v: sort_kv(k, v)[0]                    # noqa: E731
    full = jax.jit(lambda k, v: sort_kv(k, v))

    reps = {"fori": 5, "u4": 4, "u2": 2, "u1": 1}[mode]
    if mode == "fori":
        chained = jax.jit(lambda a, v, r: jax.lax.fori_loop(
            0, r, lambda _, kk: step(kk, v), a))
        run1 = lambda a: chained(a, vals, jnp.int32(1))     # noqa: E731
        runR = lambda a: chained(a, vals, jnp.int32(reps))  # noqa: E731
    else:
        def unrolled(r):
            def _f(a, v):
                for _ in range(r):
                    a = step(a, v)
                return a
            return jax.jit(_f)
        _u1, _uR = unrolled(1), (unrolled(reps) if reps > 1 else None)
        run1 = lambda a: _u1(a, vals)                       # noqa: E731
        runR = (lambda a: _uR(a, vals)) if reps > 1 else run1  # noqa: E731

    def _check(k_in, k_out, v_out):
        sorted_ok = jnp.all(k_out[1:] >= k_out[:-1])
        iot = jnp.arange(n, dtype=jnp.uint32)
        vu = v_out.astype(jnp.uint32)
        perm_ok = (jnp.sum(vu) == jnp.sum(iot)) & \
            (jnp.bitwise_xor.reduce(vu) == jnp.bitwise_xor.reduce(iot))
        match_ok = jnp.all(jnp.take(k_in, v_out) == k_out)
        stable_ok = jnp.all((k_out[1:] > k_out[:-1])
                            | (v_out[1:] > v_out[:-1]))
        return sorted_ok & perm_ok & match_ok & stable_ok

    check = jax.jit(_check)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0][:1])

    def measure(kd):
        """Two-arm chained timing with a jitter-corruption self-check."""
        for attempt in range(3):
            t1 = tr = 1e9
            iters = 2 + attempt
            for _ in range(iters):
                t0 = time.perf_counter(); sync(run1(kd))
                t1 = min(t1, time.perf_counter() - t0)
                if reps > 1:
                    t0 = time.perf_counter(); sync(runR(kd))
                    tr = min(tr, time.perf_counter() - t0)
            if reps == 1:
                # last-resort mode: per-call min over extra iters
                for _ in range(3):
                    t0 = time.perf_counter(); sync(run1(kd))
                    t1 = min(t1, time.perf_counter() - t0)
                return t1, t1, t1, False
            secs = max(1e-9, (tr - t1) / (reps - 1))
            ok = tr >= (reps - 1) * t1 * 0.7
            if ok:
                return secs, t1, tr, False
            print(f"# suspect timing (tR={tr*1e3:.1f}ms < "
                  f"{reps-1}*t1={t1*1e3:.1f}ms*0.7) — retry {attempt+1}",
                  flush=True)
        return secs, t1, tr, True

    name_sfx = (f"_2^{log2n}" if log2n != 20 else "")
    compiled = False
    for dist in dists:
        rec_name = f"config2_kv_{dname}_{dist}{name_sfx}"
        try:
            kd = datasets_device.generate(dist, dt, n, seed=1)
            kd.block_until_ready()
            if not compiled:
                print(f"# compiling chain (mode={mode})...", flush=True)
                t0 = time.perf_counter()
                sync(run1(kd))
                print(f"# run1 compile+run {time.perf_counter()-t0:.0f}s",
                      flush=True)
                if reps > 1:
                    t0 = time.perf_counter()
                    sync(runR(kd))
                    print(f"# runR compile+run "
                          f"{time.perf_counter()-t0:.0f}s", flush=True)
                compiled = True
            secs, t1, tr, suspect = measure(kd)
            k_out, v_out = full(kd, vals)
            ok = bool(check(kd, k_out, v_out))
            extra = {}
            if hbm:
                min_bytes = 2 * n * (np.dtype(dt).itemsize + 4)
                extra["roofline_frac"] = round(
                    (min_bytes / secs) / (hbm * 1e9), 4)
            if suspect:
                extra["suspect"] = True
            record(rec_name,
                   mpairs_per_s=round(n / secs / 1e6, 1), valid=ok,
                   n=n, engine="auto", mode=mode, reps=reps,
                   t1_ms=round(t1 * 1e3, 1), tR_ms=round(tr * 1e3, 1),
                   **extra)
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            record(rec_name, failed=f"{type(e).__name__}:{mode}", n=n,
                   engine="auto", error=str(e)[:300])
            # a failed compile poisons this process's transport — stop and
            # let run_headline.sh escalate in a fresh process
            if not compiled:
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
