"""Device profiling helpers — the TPU analog of the reference's CUDA-event
gpu_timer + torch.cuda.max_memory_allocated logging
(reference: src/utils/logging.py:14-31, app/avjepa/train.py:599).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_mb(device: Optional[jax.Device] = None) -> dict:
    """Per-device memory stats in MB (empty dict when unsupported)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k.replace("bytes", "mb")] = stats[k] / 1e6
    return out


def annotate(name: str):
    """Named trace region for step phases (shows up in the profile)."""
    return jax.profiler.TraceAnnotation(name)
