"""Test config: simulate an 8-device CPU mesh and enable x64 for the
f64 PageRank oracle (the reference's value path is double, deg.h:19)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU backend via jax.config;
# override it back to the simulated 8-device CPU platform
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_DATA = "/root/reference/data"
RMAT10 = os.path.join(REF_DATA, "rmat10_1024.bin")
RMAT10_W = os.path.join(REF_DATA, "rmat10_1024_w.bin")


@pytest.fixture(scope="session")
def rmat10_edges():
    raw = np.fromfile(RMAT10, dtype=np.uint32).reshape(-1, 2)
    return raw[:, 0].astype(np.int64), raw[:, 1].astype(np.int64)


@pytest.fixture(scope="session")
def rmat10_w_edges():
    raw = np.fromfile(RMAT10_W, dtype=np.uint32).reshape(-1, 3)
    return (raw[:, 0].astype(np.int64), raw[:, 1].astype(np.int64),
            raw[:, 2].astype(np.int32))
