"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without a pod via XLA's host-platform
device-count flag (the standard JAX answer to "test distributed without a
cluster" — SURVEY.md §4.4). The environment's sitecustomize imports jax at
interpreter startup with JAX_PLATFORMS=axon (real TPU tunnel), so we must
redirect via jax.config before any backend is instantiated — env vars alone
are too late.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_programs():
    """Free jitted executables between test modules. The suite compiles
    hundreds of interpret-mode megakernel programs; letting them accumulate
    across all ~30 modules segfaulted XLA-CPU's compiler on this 2-vCPU image
    (reproducibly, at ~220 tests in, inside backend_compile_and_load — the
    per-module flush keeps the compiler's working set bounded). Costs ~10%
    wall: shared tiny programs recompile per module."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
