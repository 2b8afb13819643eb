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
    """Stable fingerprint of this host's CPU identity + feature set.

    The flags line alone is not enough: XLA's AOT target features (e.g.
    +prefer-no-gather) can differ between CPU models whose cpuinfo flags
    match, and loading such an entry risks SIGILL — so the model name and
    vendor are folded in too."""
    try:
        with open("/proc/cpuinfo") as f:
            keys = ("flags", "model name", "vendor_id", "cpu family", "model")
            seen = {}
            for line in f:
                k = line.split(":")[0].strip()
                if k in keys and k not in seen:
                    seen[k] = line.strip()
            cpu = "|".join(seen[k] for k in keys if k in seen)
            if not cpu:
                raise IndexError
    except (OSError, IndexError):
        cpu = _platform.processor() or _platform.machine()
    return hashlib.sha1(cpu.encode()).hexdigest()[:10]


def default_cache_root() -> str:
    """Directory to hold the persistent compile cache.

    A source checkout keeps the cache beside the repo (it survives
    re-installs and is what the bench/CI drivers expect); a wheel install
    must NOT write into site-packages (read-only or shared across users),
    so it falls back to the XDG user cache directory.
    """
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isfile(os.path.join(pkg_root, "pyproject.toml")) and os.access(
        pkg_root, os.W_OK
    ):
        return pkg_root
    xdg = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(xdg, "avjepa_tpu")


def active_platform(env_platform_name, env_platforms, backend_fn) -> str:
    """Resolve which JAX platform is actually active for cache routing.

    Prefers the env vars (cheap, no backend init), but a comma list
    (``JAX_PLATFORMS=tpu,cpu``) is a priority order, not a platform — which
    entry actually initialized is only knowable from the backend itself, so
    that case (and the unset case) asks ``backend_fn()``. String-matching the
    list would route TPU executables into a host-fingerprinted CPU dir (cache
    never shared) or, worse, CPU executables into the shared accelerator dir
    (ISA-unsafe)."""
    plat = env_platform_name or env_platforms or ""
    if not plat or "," in plat:
        return backend_fn()
    return plat


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
