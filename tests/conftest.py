"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere; pytest loads conftest
first, so this is the single place that configures the platform.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The build image's sitecustomize pre-imports jax and pins
# jax_platforms="axon,cpu" (remote TPU tunnel). Tests must run on the
# virtual 8-device CPU mesh, so override the config directly — env vars
# alone are ignored once jax is already imported.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture()
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def synth_data(tmp_path_factory):
    """Session-scoped synthetic HSI dataset tree (all formats)."""
    import subprocess
    import sys

    out = tmp_path_factory.mktemp("hsi_synth")
    root = os.path.dirname(os.path.dirname(__file__))
    subprocess.run(
        [
            sys.executable, os.path.join(root, "tools", "make_synth_data.py"),
            "--out", str(out), "--scenes", "2", "--size", "96",
            "--channels", "31", "--scale", "2",
        ],
        check=True,
    )
    return str(out)
