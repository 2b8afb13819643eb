"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX idiom for testing multi-chip sharding without TPU hardware
(replaces the reference's missing fake-backend story — it had no tests at all).

Note: this environment pre-imports part of jax at interpreter startup and
latches platform env vars, so plain JAX_PLATFORMS=cpu is ignored;
jax.config.update after import is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # the in-process CPU collective rendezvous CHECK-aborts the whole pytest
    # process if any participant is starved past the (short) default
    # terminate timeout — which happens routinely on few-core CI hosts where
    # an XLA compile of the next test's step hogs the machine while another
    # executable's all-gather waits. Slow is fine; SIGABRT is not.
    flags = (
        flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    ).strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: many tests build identical tiny models, and
# their HLO hashes hit across test files and reruns. The dir is keyed by a
# host-CPU-feature fingerprint (see avjepa_tpu/utils/cache_dir.py): XLA:CPU
# AOT executables target the compiling machine's ISA extensions and the
# cache key does NOT include them — loading an entry produced on a
# different host SIGABRTs mid-suite.
from avjepa_tpu.utils.cache_dir import compile_cache_dir

_CACHE = compile_cache_dir(os.path.join(os.path.dirname(__file__), ".."), "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
