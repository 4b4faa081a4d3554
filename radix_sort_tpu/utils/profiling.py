"""Profiling / observability utilities.

The reference's tracing is host-side CTimer bracketing with per-kernel
Statistics (SURVEY.md §5); the TPU-native equivalents here are:

- :func:`trace` — context manager around ``jax.profiler`` emitting an XPlane
  trace viewable in TensorBoard/XProf (the real per-kernel timeline, which
  the reference's dormant MORE_PROFILING path only aspired to).
- :func:`chained_time` — the tunnel-safe wall-clock method used by
  bench.py/scripts (chained fori_loop repetition + dependent device_get),
  because transports may ack ``block_until_ready`` early.
- :func:`roofline` — speed-of-light accounting: achieved bytes/s over the
  chip's HBM bandwidth, the first-class metric the north star scores
  (BASELINE.json: ≥80% of roofline).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

# Known single-chip HBM bandwidths, GB/s (device_kind prefixes).
HBM_GBS = {
    "TPU v5 lite": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v5": 2765.0,
    "TPU v6": 3584.0,
}


def device_hbm_gbs(device=None) -> float | None:
    import jax

    d = device or jax.devices()[0]
    for prefix, bw in HBM_GBS.items():
        if d.device_kind.startswith(prefix):
            return bw
    return None


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rst_trace"):
    """Capture an XProf trace of the enclosed device work."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def chained_time(fn, x, reps: int = 4, iters: int = 3,
                 warmup: int = 2) -> float:
    """Seconds per invocation of ``fn`` (an x→x device function)."""
    import jax

    def chained(r):
        return jax.jit(
            lambda a: jax.lax.fori_loop(0, r, lambda _, v: fn(v), a))

    f1, fr = chained(1), chained(reps)

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0][:1])

    for _ in range(warmup):
        sync(f1(x))
        sync(fr(x))
    t1s, trs = [], []
    for _ in range(iters):
        t0 = time.perf_counter(); sync(f1(x)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(fr(x)); trs.append(time.perf_counter() - t0)
    return max(1e-9, (min(trs) - min(t1s)) / (reps - 1))


def roofline(bytes_moved: int, seconds: float, device=None) -> float | None:
    """Fraction of the chip's HBM roofline achieved (None if unknown HW)."""
    bw = device_hbm_gbs(device)
    if bw is None or seconds <= 0:
        return None
    return (bytes_moved / seconds) / (bw * 1e9)


def sort_min_bytes(n: int, key_dtype, bits_per_pass: int = 8,
                   payload_bytes: int = 0) -> int:
    """Speed-of-light traffic for an LSD radix sort: one read + one write of
    keys (+ payload) per pass, plus a digit-read for the histogram pass."""
    kb = np.dtype(key_dtype).itemsize
    passes = (kb * 8) // bits_per_pass
    row = kb + payload_bytes
    return passes * n * (2 * row + kb)
