"""Sort visualization — the reference's `visualize` example
(examples/visualize/visualize.cpp: OpenCL sort + Vulkan point-cloud render,
unsorted on top / sorted below, heat-map colors, sort-time overlay)
re-imagined headlessly: the engine sorts on the accelerator and matplotlib
renders the same two point clouds with a magnitude heat map into a PNG.

Run: python examples/visualize.py [out.png]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

N = 4096  # the reference visualizes 4096 u32 keys


def main(out_path: str = "visualize.png"):
    import jax

    # Honor JAX_PLATFORMS even when a site hook pre-registered another
    # backend (the dev image registers a tunneled TPU in sitecustomize).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from radix_sort_tpu import sort
    from radix_sort_tpu.datasets import RandomDistributed

    data = RandomDistributed(np.uint32, seed=int(time.time()) % 2**31)
    keys = data.generate(N)

    fn = jax.jit(sort)
    fn(jnp.asarray(keys)).block_until_ready()  # compile
    t0 = time.perf_counter()
    sorted_keys = np.asarray(fn(jnp.asarray(keys)))
    ms = (time.perf_counter() - t0) * 1e3

    fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    x = np.arange(N)
    for ax, ys, title in ((ax0, keys, "unsorted"),
                          (ax1, sorted_keys, f"sorted ({ms:.2f} ms)")):
        ax.scatter(x, ys, c=ys, cmap="inferno", s=2)
        ax.set_title(title)
        ax.set_ylim(0, 2**32)
    fig.suptitle(f"radix_sort_tpu — {N} u32 keys")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print(f"wrote {out_path} (sort time {ms:.2f} ms)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
