"""Run the five BASELINE.json benchmark configs end-to-end and record
results (throughput + bit-exact validation) to BASELINE_RESULTS.json.

  1. u32 key-only LSD radix sort, 1M uniform (CRadixSortCPU reference path)
  2. key-value sort (u32/u64 + payload) over zeros/range/inverted/random
  3. filter + hash aggregate (selective predicate -> GROUP BY count/sum)
  4. radix-partitioned hash join (build+probe), single host
  5. multi-host-style join+aggregate+sort with skewed keys and the
     distributed radix shuffle (runs on the available mesh: the simulated
     8-device CPU mesh in dev, a real slice in production)

Configs 1-4 run on the ambient accelerator; config 5 needs >=2 devices and
is skipped (with a note) on a single-chip host unless RST_FORCE_CPU_MESH=1
(then it runs on an 8-device CPU mesh in-process).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}

# single-chip HBM bandwidth for roofline accounting (GB/s)
HBM_GBS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v5": 2765.0}


def _hbm_gbs():
    import jax

    kind = jax.devices()[0].device_kind
    return next((v for k, v in HBM_GBS.items() if kind.startswith(k)), None)


def record(name, **kw):
    RESULTS[name] = kw
    print(f"[{name}] " + " ".join(f"{k}={v}" for k, v in kw.items()),
          flush=True)
    # write-through after EVERY row: r4's cfg34 2^24 run completed
    # config3 and lost it to the queue timeout because results were only
    # flushed at exit (results_r4/cfg34_2e24.log, VERDICT r4)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_RESULTS.json")
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing[name] = kw
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)


def timed(fn, x, reps=64, iters=2):
    # reps=64 keeps the chained extra work (reps-1 query evaluations) well
    # above the dev tunnel's O(10 ms) per-call jitter at the 1M-row config
    # sizes; reps is a runtime fori_loop bound, so one compile serves all.
    import jax
    import jax.numpy as jnp

    # ONE compile: the repetition count is a dynamic fori_loop bound.
    chained = jax.jit(lambda a, r: jax.lax.fori_loop(
        0, r, lambda _, v: fn(v), a))
    r1 = jnp.int32(1)
    rR = jnp.int32(reps)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0][:1])

    sync(chained(x, r1)); sync(chained(x, rR))
    best1 = bestr = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); sync(chained(x, r1)); best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(chained(x, rR)); bestr = min(bestr, time.perf_counter() - t0)
    return max(1e-9, (bestr - best1) / (reps - 1))


def config1():
    import jax, jax.numpy as jnp
    from radix_sort_tpu import sort, golden
    from radix_sort_tpu.datasets import RandomDistributed

    n = 1 << 20
    eng = os.environ.get("RST_ENGINE")  # e.g. pallas_stream; None = auto
    data = RandomDistributed(np.uint32, seed=0).generate(n)
    keys = jax.device_put(jnp.asarray(data))
    secs = timed(lambda k: sort(k, engine=eng), keys)
    out = np.asarray(jax.jit(lambda k: sort(k, engine=eng))(keys))
    ok = golden.validate_bit_exact(out, golden.cpu_radix_sort(data), n) and \
        golden.validate_bit_exact(out, golden.oracle_sort(data), n)
    # non-default engines record under a suffixed name so they never
    # clobber the production (auto) rows
    record("config1_u32_keyonly_1M_uniform" + (f"_{eng}" if eng else ""),
           mkeys_per_s=round(n / secs / 1e6, 1), valid=bool(ok),
           engine=eng or "auto", n=n)


def config2():
    import jax, jax.numpy as jnp
    from radix_sort_tpu import sort_kv, golden
    from radix_sort_tpu import datasets as ds_lib

    # RST_CFG2_LOG2N=27 publishes the BASELINE headline metric ("u32 KV sort
    # keys/s/chip at 2^27"); the 2^20 default keeps dev runs cheap.
    log2n = int(os.environ.get("RST_CFG2_LOG2N", "20"))
    n = 1 << log2n
    vals = np.arange(n, dtype=np.int32)
    dtype_sel = os.environ.get("RST_CFG2_DTYPES", "u32,u64").split(",")
    hbm_gbs = _hbm_gbs()
    for dt, dname in ((np.uint32, "u32"), (np.uint64, "u64")):
        if dname not in dtype_sel:
            continue
        if np.dtype(dt).itemsize == 8:
            jax.config.update("jax_enable_x64", True)
        vd = jax.device_put(jnp.asarray(vals))
        # jit once per dtype; reuse across the four distributions (remote
        # compiles are minutes each).  vd is an ARGUMENT, never a closure
        # capture: captured device arrays are serialized into the compile
        # request as literals, and at 2^27 the 512 MB body exceeds the
        # remote-compile transport's length limit (HTTP 413 — the root
        # cause of the r1-r4 headline "failed=compile"; results_r5/).
        eng = os.environ.get("RST_ENGINE")
        step = lambda k, v: sort_kv(k, v, engine=eng)[0]  # noqa: E731
        chained = jax.jit(lambda a, v, r: jax.lax.fori_loop(
            0, r, lambda _, kk: step(kk, v), a))
        full = jax.jit(lambda k, v: sort_kv(k, v, engine=eng))
        # Full on-device stable-KV validation (payload = iota): sorted keys
        # + keys match input at the permutation + payload is a permutation
        # + ties keep input order.  Together these pin the output to THE
        # unique stable sort — no host pull of n-sized arrays (tunnel cost).
        def _check(k_in, k_out, v_out):
            sorted_ok = jnp.all(k_out[1:] >= k_out[:-1])
            perm_ok = (jnp.sum(v_out.astype(jnp.uint32))
                       == jnp.sum(jnp.arange(n, dtype=jnp.uint32))) & \
                (jnp.bitwise_xor.reduce(v_out.astype(jnp.uint32))
                 == jnp.bitwise_xor.reduce(jnp.arange(n, dtype=jnp.uint32)))
            match_ok = jnp.all(jnp.take(k_in, v_out) == k_out)
            stable_ok = jnp.all((k_out[1:] > k_out[:-1])
                                | (v_out[1:] > v_out[:-1]))
            return sorted_ok & perm_ok & match_ok & stable_ok
        check = jax.jit(_check)
        # scale reps down with n: at 2^27 one KV sort is O(100 ms) so even
        # reps=4 gives chained extra work >> the tunnel's O(10 ms) jitter.
        reps = int(min(64, max(4, (1 << 22) // n * 64 or 4)))
        r1, rR = jnp.int32(1), jnp.int32(reps)

        def sync(o):
            np.asarray(o[:1])

        # chain-mode state shared across the four distributions: a failed
        # compile is NOT cached by jax, so re-trying the fori chain per
        # dataset would re-crash (and re-wait) four times.  Fallback jits
        # are created once per dtype and reused (fresh function objects
        # would recompile per dataset).
        mode = {"m": "fori", "u1": None, "uR": None}

        def unrolled(r):
            def _f(a, v):
                for _ in range(r):
                    a = step(a, v)
                return a
            return jax.jit(_f)

        for ds in ds_lib.make_datasets(dt, seed=1):
            if ds.name == "RandomDistributed":
                continue  # config names zeros/range/inverted/random
            if n <= (1 << 22):
                data = ds.generate(n)
                kd = jax.device_put(jnp.asarray(data))
            else:
                # big-n: generate the distribution ON DEVICE (uploading
                # 0.5-1 GB per row over the dev tunnel is minutes each);
                # validation is the on-device stable-KV proof above.
                from radix_sort_tpu import datasets_device

                data = None
                kd = datasets_device.generate(ds.name, dt, n, seed=1)
                kd.block_until_ready()
            # fori-wrapped 64-bit sorts can blow XLA's scoped-vmem budget
            # at specific sizes (docs/PROBES.md), and the 2^27 stable-KV
            # compile crashed the remote-compile transport outright in r4
            # — escalate fori -> unrolled(4) -> unrolled(2) ONCE per
            # dtype, then record failures per-combo and keep sweeping.
            if mode["m"] == "fori":
                try:
                    sync(chained(kd, vd, r1)); sync(chained(kd, vd, rR))
                except Exception as e:  # noqa: BLE001
                    print(f"# config2 fori chain failed "
                          f"({type(e).__name__}); unrolled fallback",
                          flush=True)
                    mode["m"] = "u4"
            if mode["m"] == "u4" and mode["u1"] is None:
                reps = min(reps, 4)
                try:
                    mode["u1"], mode["uR"] = unrolled(1), unrolled(reps)
                    sync(mode["u1"](kd, vd)); sync(mode["uR"](kd, vd))
                except Exception as e2:  # noqa: BLE001
                    print(f"# unrolled-4 failed too ({type(e2).__name__});"
                          f" reps=2", flush=True)
                    mode["m"] = "u2"
                    mode["u1"], mode["uR"] = None, None
            if mode["m"] == "u2" and mode["u1"] is None:
                reps = 2
                try:
                    mode["u1"], mode["uR"] = unrolled(1), unrolled(2)
                    sync(mode["u1"](kd, vd)); sync(mode["uR"](kd, vd))
                except Exception:  # noqa: BLE001
                    mode["m"] = "fail"
            if mode["m"] == "fail":
                record(f"config2_kv_{dname}_{ds.name}"
                       + (f"_2^{log2n}" if log2n != 20 else "")
                       + (f"_{eng}" if eng else ""),
                       failed="compile", n=n, engine=eng or "auto")
                continue
            if mode["m"] == "fori":
                run1 = lambda a: chained(a, vd, r1)    # noqa: E731
                runR = lambda a: chained(a, vd, rR)    # noqa: E731
            else:
                _u1, _uR = mode["u1"], mode["uR"]
                run1 = lambda a: _u1(a, vd)            # noqa: E731
                runR = lambda a: _uR(a, vd)            # noqa: E731
                sync(run1(kd)); sync(runR(kd))  # warm this dataset
            t1 = tr = 1e9
            for _ in range(2):
                t0 = time.perf_counter(); sync(run1(kd))
                t1 = min(t1, time.perf_counter() - t0)
                t0 = time.perf_counter(); sync(runR(kd))
                tr = min(tr, time.perf_counter() - t0)
            secs = max(1e-9, (tr - t1) / (reps - 1))
            k_out, v_out = full(kd, vd)
            if n <= (1 << 22):
                perm = golden.oracle_argsort(data)
                ok = np.array_equal(np.asarray(k_out), data[perm]) and \
                    np.array_equal(np.asarray(v_out), vals[perm])
            else:
                ok = bool(check(kd, k_out, v_out))
            extra = {}
            if hbm_gbs:
                # minimum traffic: one read + one write of keys + payload
                min_bytes = 2 * n * (np.dtype(dt).itemsize + 4)
                extra["roofline_frac"] = round(
                    (min_bytes / secs) / (hbm_gbs * 1e9), 4)
            record(f"config2_kv_{dname}_{ds.name}"
                   + (f"_2^{log2n}" if log2n != 20 else "")
                   + (f"_{eng}" if eng else ""),
                   mpairs_per_s=round(n / secs / 1e6, 1), valid=bool(ok),
                   n=n, engine=eng or "auto", **extra)


def config3():
    import jax, jax.numpy as jnp
    from radix_sort_tpu.table import Table
    from radix_sort_tpu.ops import filter as filt, aggregate

    log2n = int(os.environ.get("RST_CFG34_LOG2N", "20"))
    n = 1 << log2n
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1000, n).astype(np.uint32)
    vals = rng.integers(0, 100, n).astype(np.int32)
    t = Table.from_numpy({"k": keys, "x": vals})

    def query(cols):
        tbl = Table(cols)
        f = filt.filter_expr(tbl, "k", "lt", 500)     # selective predicate
        g = aggregate.hash_aggregate(
            f, "k", {"n": ("count", None), "s": ("sum", "x")})
        return g.columns

    # chained timing needs carry structure == input structure: fold the
    # query output back into the input columns.
    def step(c):
        out = query(c)
        return {"k": c["k"] ^ out["k"],
                "x": c["x"] + out["s"].astype(jnp.int32)}

    secs = timed(step, dict(t.columns))
    out = jax.jit(query)(dict(t.columns))
    got_keys = np.asarray(out["k"])[:500]
    mask = keys < 500
    exp_n = np.bincount(keys[mask], minlength=500)
    exp_s = np.bincount(keys[mask], weights=vals[mask],
                        minlength=500).astype(np.int64)
    ok = np.array_equal(got_keys, np.arange(500)) and \
        np.array_equal(np.asarray(out["n"])[:500], exp_n) and \
        np.array_equal(np.asarray(out["s"])[:500].astype(np.int64), exp_s)
    record("config3_filter_aggregate_1M"
           + (f"_2^{log2n}" if log2n != 20 else ""),
           mrows_per_s=round(n / secs / 1e6, 1), valid=bool(ok), n=n)


def config4():
    import jax, jax.numpy as jnp
    from radix_sort_tpu.table import Table
    from radix_sort_tpu.ops import join

    log2n = int(os.environ.get("RST_CFG34_LOG2N", "20"))
    n_probe, n_build = 1 << log2n, 1 << (log2n - 2)
    key_space = n_probe >> 1  # ~50% probe hit rate at any size
    rng = np.random.default_rng(4)
    pk = rng.integers(0, key_space, n_probe).astype(np.uint32)
    bk = rng.permutation(key_space)[:n_build].astype(np.uint32)  # unique
    probe = Table.from_numpy(
        {"k": pk, "pv": np.arange(n_probe, dtype=np.int32)})
    build = Table.from_numpy(
        {"k": bk, "bv": (bk * 3).astype(np.int32)})

    def q(cols):
        out, stats = join.hash_join(Table(cols), build, "k")
        return {"k": out.columns["k"], "bv": out.columns["bv"],
                "cnt": stats["match_count"]}

    def step(c):
        out = q(c)
        return {"k": c["k"] ^ out["k"], "pv": c["pv"]}

    secs = timed(step, dict(probe.columns))
    res = jax.jit(q)(dict(probe.columns))
    cnt = int(res["cnt"])
    exp = int(np.isin(pk, bk).sum())
    kk = np.asarray(res["k"])[:cnt]
    bb = np.asarray(res["bv"])[:cnt]
    ok = cnt == exp and np.array_equal(bb, (kk * 3).astype(np.int32))
    record("config4_hash_join_1M_probe_256K_build"
           + (f"_2^{log2n}" if log2n != 20 else ""),
           mrows_per_s=round(n_probe / secs / 1e6, 1), valid=bool(ok),
           matches=cnt, n_probe=n_probe, n_build=n_build)


def config5():
    import jax

    if len(jax.devices()) < 2 and not os.environ.get("RST_FORCE_CPU_MESH"):
        record("config5_multihost_query",
               skipped="needs >=2 devices (set RST_FORCE_CPU_MESH=1 to "
               "simulate on CPU)")
        return
    import jax.numpy as jnp
    from radix_sort_tpu.table import Table
    from radix_sort_tpu.parallel import dist_ops, dist_sort, mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    D = mesh.devices.size
    n = D * (1 << 14)
    rng = np.random.default_rng(5)
    # skewed keys: zipf-ish
    pk = (rng.zipf(1.3, n) % 4096).astype(np.uint32)
    pv = np.arange(n, dtype=np.int32)
    bk = np.arange(4096, dtype=np.uint32)
    pad = -(-bk.size // D) * D - bk.size
    build = Table({"k": jnp.asarray(np.concatenate(
        [bk, np.zeros(pad, np.uint32)])),
        "bv": jnp.asarray(np.concatenate(
            [(bk * 7).astype(np.int32), np.zeros(pad, np.int32)]))},
        num_rows=bk.size)
    probe = Table.from_numpy({"k": pk, "pv": pv})

    t0 = time.perf_counter()
    joined, jstats = dist_ops.dist_hash_join(probe, build, "k", mesh=mesh)
    agg, aover = dist_ops.dist_hash_aggregate(
        probe, "k", {"n": ("count", None)}, mesh=mesh)
    ks, vs, sover = dist_sort.dist_sort_kv(
        jnp.asarray(pk), jnp.asarray(pv), mesh=mesh)
    jax.block_until_ready(ks)
    wall = time.perf_counter() - t0

    res = agg.to_numpy()
    order = np.argsort(res["k"], kind="stable")
    uk, exp_counts = np.unique(pk, return_counts=True)
    agg_ok = np.array_equal(res["k"][order], uk) and \
        np.array_equal(res["n"][order], exp_counts)
    jres = joined.to_numpy()
    join_ok = int(jstats["match_count"]) == n and \
        np.array_equal(jres["bv"], (jres["k"] * 7).astype(np.int32))
    perm = np.argsort(pk, kind="stable")
    sort_ok = np.array_equal(np.asarray(ks), pk[perm]) and \
        np.array_equal(np.asarray(vs), pv[perm]) and not bool(sover)
    record("config5_multihost_query",
           devices=D, rows=n, wall_s=round(wall, 2),
           join_valid=bool(join_ok), agg_valid=bool(agg_ok),
           sort_valid=bool(sort_ok))


def main():
    import jax

    if os.environ.get("RST_FORCE_CPU_MESH"):
        # actually switch to the simulated mesh (the env var alone changes
        # nothing): host-device-count must land before backend init, and
        # the platform must be set via jax.config (site-hooked backends
        # ignore JAX_PLATFORMS — CLAUDE.md)
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device"
                                     "_count=8").strip()
        jax.config.update("jax_platforms", "cpu")

    print(f"# backend={jax.default_backend()} devices={len(jax.devices())}",
          flush=True)
    which = sys.argv[1:] or ["1", "2", "3", "4", "5"]
    fns = {"1": config1, "2": config2, "3": config3, "4": config4,
           "5": config5}
    for w in which:
        fns[w]()
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_RESULTS.json")
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing.update(RESULTS)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print("# wrote BASELINE_RESULTS.json")


if __name__ == "__main__":
    main()
