"""Test configuration: run everything on a simulated 8-device CPU backend.

The reference's tests require a physical GPU and its CI test step is titled
"Test (inactive)" (SURVEY.md §4); we fix that gap: the whole suite runs on
the CPU backend with 8 virtual devices so the multi-chip sharding paths are
exercised everywhere, hardware or not.  Must set env vars before jax import.
"""

import os

# Force CPU regardless of ambient config (the dev box tunnels to a real TPU
# and sitecustomize imports jax before conftest runs, so we must use
# jax.config rather than env vars).  Set RST_TEST_TPU=1 to run the suite
# against real hardware instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("RST_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # 64-bit key coverage

import numpy as np  # noqa: E402
import pytest  # noqa: E402

KEY_DTYPES = [np.uint32, np.int32, np.uint64, np.int64]
KEY_DTYPE_IDS = ["u32", "i32", "u64", "i64"]


@pytest.fixture(params=KEY_DTYPES, ids=KEY_DTYPE_IDS)
def key_dtype(request):
    return np.dtype(request.param)
