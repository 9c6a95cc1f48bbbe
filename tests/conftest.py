"""Test configuration: run everything on 8 virtual CPU devices.

Set BEFORE jax is imported anywhere: tests must not grab the (single) real TPU
— the multi-device data-parallel path (SURVEY.md §4 item 3) is exercised on a
virtual 8-device CPU mesh, the standard JAX substitute for a fake distributed
backend.
"""

import os

# NOTE: this environment's sitecustomize pre-sets JAX_PLATFORMS=axon (the TPU
# tunnel) at interpreter start, so a plain env var is not enough — force the
# platform through jax.config, which wins over the env at backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep the TF oracle quiet and CPU-only
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax  # noqa: E402

# TPURPN_TPU_TESTS=1 keeps the real TPU visible so the `tpu`-marked kernel
# tests run non-interpreted on hardware (tests/run_tpu_tests.sh); default is
# the 8-virtual-CPU-device mesh for everything else.
if not os.environ.get("TPURPN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
