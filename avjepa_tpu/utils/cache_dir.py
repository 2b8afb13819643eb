"""Persistent XLA compile-cache directory selection.

XLA:CPU AOT executables target the compiling host's ISA but the cache key
omits it — sharing one directory across heterogeneous hosts SIGABRTs on
load. The CPU cache directory is therefore keyed by a host-feature
fingerprint. This is the ONE implementation; the runtime
(parallel/mesh.py), tests/conftest.py, and tests/multihost_worker.py all
use it (they previously carried hand-synced copies).

Imports only stdlib — safe to call before JAX backend initialization.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform


def host_fingerprint() -> str:
    """Stable fingerprint of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            cpu = [line for line in f if line.startswith("flags")][0]
    except (OSError, IndexError):
        cpu = _platform.processor() or _platform.machine()
    return hashlib.sha1(cpu.encode()).hexdigest()[:10]


def compile_cache_dir(root: str, platform_name: str) -> str:
    """Cache dir under ``root`` for the given JAX platform name.

    CPU (and unknown/empty platform — the ISA-safe default) gets the
    host-fingerprinted directory; accelerator backends share one directory
    (their executables are not host-ISA-keyed).
    """
    plat = (platform_name or "").lower()
    if not plat or "cpu" in plat:
        return os.path.join(root, f".jax_cache_cpu_{host_fingerprint()}")
    return os.path.join(root, ".jax_cache")
