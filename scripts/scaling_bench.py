"""Weak-scaling harness for the distributed sort (BASELINE.json: ≥85%
weak-scaling efficiency at 2+ hosts).

Keeps per-device rows constant and sweeps mesh sizes, reporting wall time
and efficiency vs the smallest mesh.  On this dev box only a single TPU
chip is reachable, so hardware numbers await a real slice; run with
RST_FORCE_CPU_MESH=1 to exercise the harness on the simulated CPU mesh
(functional check — CPU "ICI" is shared memory, so efficiency numbers are
not meaningful for the roofline story).

  RST_FORCE_CPU_MESH=1 python scripts/scaling_bench.py --rows-per-dev 16384

Use ``--device-count 64 --mesh-sizes 64`` (with RST_FORCE_CPU_MESH=1) to
check that the distributed layer traces + validates well past toy meshes
(the tie-spreading and send-pack are O(1) trace size in D).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-dev", type=int, default=1 << 14)
    ap.add_argument("--mesh-sizes", default="")
    ap.add_argument("--device-count", type=int, default=8,
                    help="virtual CPU device count under RST_FORCE_CPU_MESH")
    args = ap.parse_args()

    import jax

    if os.environ.get("RST_FORCE_CPU_MESH"):
        # assign, don't setdefault: a pre-set XLA_FLAGS (e.g. a dump flag)
        # must not silently discard the device-count flag
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{args.device_count}").strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from radix_sort_tpu.parallel import dist_sort, mesh as mesh_lib

    ndev = len(jax.devices())
    sizes = ([int(s) for s in args.mesh_sizes.split(",") if s]
             or [d for d in (1, 2, 4, 8) if d <= ndev])
    rows = args.rows_per_dev
    results = {}
    base = None
    for D in sizes:
        mesh = mesh_lib.make_mesh(D)
        n = D * rows
        rng = np.random.default_rng(0)
        keys = jnp.asarray(
            rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
        # warm (compile)
        out = dist_sort.dist_sort(keys, mesh=mesh)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            out = dist_sort.dist_sort(keys, mesh=mesh)
            out.block_until_ready()
        wall = (time.perf_counter() - t0) / 3
        ok = bool(np.array_equal(np.asarray(out), np.sort(np.asarray(keys))))
        if base is None:
            base = wall
        eff = base / wall
        results[D] = {"rows": n, "wall_s": round(wall, 4),
                      "weak_scaling_eff": round(eff, 3), "valid": ok}
        print(f"D={D} rows={n} wall={wall*1e3:.1f} ms eff={eff:.2%} "
              f"valid={ok}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
