"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).
"""

import os

# Force CPU: the session env may point JAX_PLATFORMS at the real TPU
# tunnel, but tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# disable the axon sitecustomize, but remember the tunnel address so
# env-gated ON-CHIP tests (CBD_TPU_PARITY=1) can hand it to a subprocess
_axon = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if _axon:
    os.environ["CBD_SAVED_AXON_POOL_IPS"] = _axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize (TPU tunnel) may have already forced
# jax_platforms="axon,cpu" programmatically; override it before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0xC0FFEE)


@pytest.fixture(autouse=True)
def _reset_block_instances():
    from caltech_bifrost_dsp_tpu.control.command import CommandBlock
    from caltech_bifrost_dsp_tpu.utils import proclog

    CommandBlock.reset_instance_counts()
    proclog.clear_registry()
    yield
