"""Pack-stable probe: can the UNSTABLE network beat the stable-KV sort
via key+iota packing? (r5 headline-improvement candidate.)

XLA's stable sort costs ~2x the unstable network on v5e (805 vs 408
Mkeys/s key-only u32 @2^25, docs/PROBES.md r1).  For keys of <=32 bits
the stability contract can be bought WITHOUT the stable network:

    packed = (key as u64) << 32 | position      (packed keys are UNIQUE)
    unstable sort of packed (+ payload operands)
    key = packed >> 32 ; the order is exactly THE stable order

Three arms, each its own chain compile (run modes in separate processes
— a failed compile poisons the transport, results_r5/headline logs):

  u64keyonly : unstable u64 key-only sort at 2^n — the ceiling for the
               iota-payload (argsort) case, where the payload IS the
               low word and no second operand is needed.
  pack_e2e   : full pipeline pack -> unstable key-only sort -> unpack
               (keys + iota payload out), validated bit-exact against
               the stable sort_kv contract on device.
  packed_kv  : (packed u64, i32 payload) two-operand unstable sort —
               the general-payload variant (payload rides the sort; no
               gather).

Usage: python scripts/packed_probe.py MODE [log2n=27]
Every array is a jit ARGUMENT (CLAUDE.md: closure-captured device
arrays become compile-request literals).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(step, args_tuple, reps=5, iters=3):
    import jax
    import jax.numpy as jnp

    chained = jax.jit(lambda a, rest, r: jax.lax.fori_loop(
        0, r, lambda _, aa: step(aa, rest), a))
    carry, rest = args_tuple

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0][:1])

    r1, rR = jnp.int32(1), jnp.int32(reps)
    t0 = time.perf_counter()
    sync(chained(carry, rest, r1))
    print(f"# run1 compile+run {time.perf_counter()-t0:.0f}s", flush=True)
    sync(chained(carry, rest, rR))
    t1 = tr = 1e9
    for _ in range(iters):
        t0 = time.perf_counter(); sync(chained(carry, rest, r1))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(chained(carry, rest, rR))
        tr = min(tr, time.perf_counter() - t0)
    secs = max(1e-9, (tr - t1) / (reps - 1))
    return secs, t1, tr


def main():
    mode = sys.argv[1]
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    n = 1 << log2n

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from radix_sort_tpu import datasets_device

    print(f"# backend={jax.default_backend()} "
          f"dev={jax.devices()[0].device_kind} mode={mode} n=2^{log2n}",
          flush=True)

    keys32 = datasets_device.generate("Random", np.uint32, n, seed=21)
    keys32.block_until_ready()

    pack = jax.jit(lambda k: (k.astype(jnp.uint64) << jnp.uint64(32))
                   | jax.lax.iota(jnp.uint64, n))
    packed = pack(keys32)
    packed.block_until_ready()

    if mode == "u64keyonly":
        def step(a, _):
            return jax.lax.sort((a,), num_keys=1, is_stable=False)[0]
        secs, t1, tr = timed(step, (packed, ()))

    elif mode == "pack_e2e":
        # keys32 is the carry; pack/sort/unpack per rep (the production
        # shape of the trick for the argsort/iota-payload case)
        def step(k, _):
            p = (k.astype(jnp.uint64) << jnp.uint64(32)) \
                | jax.lax.iota(jnp.uint64, n)
            s = jax.lax.sort((p,), num_keys=1, is_stable=False)[0]
            return (s >> jnp.uint64(32)).astype(jnp.uint32)
        secs, t1, tr = timed(step, (keys32, ()))
        # validate the full contract once vs the stable two-operand sort
        def both(k):
            p = (k.astype(jnp.uint64) << jnp.uint64(32)) \
                | jax.lax.iota(jnp.uint64, n)
            s = jax.lax.sort((p,), num_keys=1, is_stable=False)[0]
            ko_p = (s >> jnp.uint64(32)).astype(jnp.uint32)
            vo_p = s.astype(jnp.uint32)  # low word = position
            ko_s, vo_s = jax.lax.sort(
                (k, jax.lax.iota(jnp.uint32, n)), num_keys=1,
                is_stable=True)
            return jnp.all(ko_p == ko_s) & jnp.all(vo_p == vo_s)
        ok = bool(jax.jit(both)(keys32))
        print(json.dumps({"probe": "pack_e2e_valid", "ok": ok}), flush=True)

    elif mode == "packed_kv":
        vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))
        def step(a, v):
            s, vo = jax.lax.sort((a, v), num_keys=1, is_stable=False)
            return s
        secs, t1, tr = timed(step, (packed, vals))

    elif mode == "two_key":
        # (key, position) lexicographic with the UNSTABLE network — the
        # composite key is unique, so the result is exactly the stable
        # order, with no u64/x64 requirement.  Payload rides as a third
        # operand; carry = keys (iota + payload regenerated per rep
        # inside the jit as iota, payload passed as arg).
        vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))
        def step(k, v):
            ko, _, _ = jax.lax.sort(
                (k, jax.lax.iota(jnp.uint32, n), v), num_keys=2,
                is_stable=False)
            return ko
        secs, t1, tr = timed(step, (keys32, vals))
        def both(k, v):
            ko_t, po_t, vo_t = jax.lax.sort(
                (k, jax.lax.iota(jnp.uint32, n), v), num_keys=2,
                is_stable=False)
            ko_s, vo_s = jax.lax.sort((k, v), num_keys=1, is_stable=True)
            return jnp.all(ko_t == ko_s) & jnp.all(vo_t == vo_s)
        ok = bool(jax.jit(both)(keys32, vals))
        print(json.dumps({"probe": "two_key_valid", "ok": ok}), flush=True)

    elif mode == "two_key_u64":
        # does the two-key trick hold for 64-bit keys? (u64 keys + u32
        # iota tie-break vs the stable two-operand u64 sort)
        keys64 = datasets_device.generate("Random", np.uint64, n, seed=22)
        keys64.block_until_ready()
        vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))
        def step(k, v):
            ko, _, _ = jax.lax.sort(
                (k, jax.lax.iota(jnp.uint32, n), v), num_keys=2,
                is_stable=False)
            return ko
        secs, t1, tr = timed(step, (keys64, vals))
        def stable_step(k, v):
            ko, _ = jax.lax.sort((k, v), num_keys=1, is_stable=True)
            return ko
        secs_s, t1_s, tr_s = timed(stable_step, (keys64, vals))
        def both(k, v):
            ko_t, _, vo_t = jax.lax.sort(
                (k, jax.lax.iota(jnp.uint32, n), v), num_keys=2,
                is_stable=False)
            ko_s, vo_s = jax.lax.sort((k, v), num_keys=1, is_stable=True)
            return jnp.all(ko_t == ko_s) & jnp.all(vo_t == vo_s)
        ok = bool(jax.jit(both)(keys64, vals))
        print(json.dumps({"probe": "two_key_u64_valid", "ok": ok,
                          "stable_ms": round(secs_s * 1e3, 2),
                          "stable_mpairs_s": round(n / secs_s / 1e6, 1)}),
              flush=True)

    elif mode == "valid_first":
        # the dist layer's fused validity-first local sort
        # (parallel/dist_sort.py::_local_sorted_valid_first): 2-key
        # STABLE (invalid, key) today — would 3-key UNSTABLE with an
        # iota tie-break win like the single-chip two-key trick does?
        vals = jax.device_put(jnp.arange(n, dtype=jnp.int32))
        inv = jax.device_put(
            (jax.lax.iota(jnp.uint32, n) % jnp.uint32(7) == 0)
            .astype(jnp.int32))
        def stable2(k, rest):
            iv, v = rest
            out = jax.lax.sort((iv, k, v), num_keys=2, is_stable=True)
            return out[1]
        def unstable3(k, rest):
            iv, v = rest
            out = jax.lax.sort(
                (iv, k, jax.lax.iota(jnp.uint32, n), v), num_keys=3,
                is_stable=False)
            return out[1]
        s2, t1a, tra = timed(stable2, (keys32, (inv, vals)))
        s3, t1b, trb = timed(unstable3, (keys32, (inv, vals)))
        def both(k, iv, v):
            a = jax.lax.sort((iv, k, v), num_keys=2, is_stable=True)
            b = jax.lax.sort(
                (iv, k, jax.lax.iota(jnp.uint32, n), v), num_keys=3,
                is_stable=False)
            return jnp.all(a[1] == b[1]) & jnp.all(a[2] == b[3])
        ok = bool(jax.jit(both)(keys32, inv, vals))
        print(json.dumps({
            "probe": "valid_first", "n": f"2^{log2n}", "equal": ok,
            "stable2_ms": round(s2 * 1e3, 2),
            "unstable3_ms": round(s3 * 1e3, 2),
            "speedup": round(s2 / s3, 3)}), flush=True)
        return

    else:
        raise SystemExit(f"unknown mode {mode}")

    print(json.dumps({
        "probe": mode, "n": f"2^{log2n}",
        "ms": round(secs * 1e3, 2),
        "mpairs_s": round(n / secs / 1e6, 1),
        "t1_ms": round(t1 * 1e3, 1), "tR_ms": round(tr * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
