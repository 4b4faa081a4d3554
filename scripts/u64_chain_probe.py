"""Probe: can a runtime-reps chained u64 sort compile on v5e?

The benchmark sweep needs chained repetitions (tunnel-safe timing,
docs/DESIGN.md §5) with reps as a RUNTIME argument so one compile serves
every rep count.  Round 2 found `fori_loop(sort)` on u64 blows XLA's
16 MiB scoped-vmem budget; this probe checks (a) whether that reproduces
at small n, and (b) whether an optimization_barrier in the loop body
dodges it.  Findings recorded in docs/PROBES.md.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from radix_sort_tpu.config import SortConfig
from radix_sort_tpu.ops import sort as sort_ops

cfg = SortConfig(engine="auto")
sort_fn = lambda k: sort_ops.sort(k, config=cfg)  # noqa: E731


def try_variant(name, build, n):
    key = jax.random.key(0)
    x = jax.random.bits(key, (n,), dtype=jnp.uint64)
    fn = build()
    t0 = time.perf_counter()
    try:
        out = fn(x, jnp.int32(2))
        np.asarray(out[:1])
        dt = time.perf_counter() - t0
        print(f"  {name:28s} n=2^{n.bit_length()-1}: OK  compile+run "
              f"{dt:.1f}s", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:120]
        print(f"  {name:28s} n=2^{n.bit_length()-1}: FAIL {msg}", flush=True)
        return False


def plain():
    return jax.jit(lambda a, r: jax.lax.fori_loop(
        0, r, lambda _, v: sort_fn(v), a))


def barrier():
    return jax.jit(lambda a, r: jax.lax.fori_loop(
        0, r, lambda _, v: jax.lax.optimization_barrier(sort_fn(v)), a))


if __name__ == "__main__":
    print(f"# device={jax.devices()[0].device_kind}", flush=True)
    for n in (1 << 12, 1 << 18, 1 << 24):
        ok = try_variant("fori_loop", plain, n)
        if not ok:
            try_variant("fori_loop+opt_barrier", barrier, n)
