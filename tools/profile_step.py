"""Capture a jax.profiler trace of the pretrain step and print per-op self
times from the device plane — the data behind BENCH.md's profile tables.

Usage:
  python tools/profile_step.py [model] [batch] [steps] [top_k]

Writes the trace under /tmp/avjepa_trace and prints one line per HLO op
group: total ms across the traced steps, percent of device time, count.
"""

from __future__ import annotations

import collections
import glob
import os
import sys


def capture(model="vit_large", batch=24, steps=3, trace_dir="/tmp/avjepa_trace",
            variant="light"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp

    from avjepa_tpu.config import load_config
    from avjepa_tpu.train import pretrain
    from avjepa_tpu.train.step import stack_masksets
    from bench import north_star_config  # the ONE benchmark config definition

    cfg = load_config(north_star_config(model, batch, tag="profile"))
    handles = pretrain.setup(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    enc_m, pred_m, idx, union = stack_masksets(masks, with_idx=True)
    dt = jnp.bfloat16
    args = (
        jnp.asarray(video, dt), jnp.asarray(audio, dt),
        jnp.asarray(enc_m), jnp.asarray(pred_m),
        tuple(jnp.asarray(i) for i in idx) if handles.compact else None,
        jnp.asarray(union) if handles.compact_pred and union is not None else None,
    )
    state = handles.state
    # 'light' profiles the production hot-loop step (diagnostic reductions
    # skipped off log_freq boundaries); 'full' the every-metric variant
    step = (handles.step_fn_light or handles.step_fn) if variant == "light" \
        else handles.step_fn
    state, m = step(state, *args)
    float(jax.device_get(m["loss"]))

    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        state, m = step(state, *args)
    float(jax.device_get(m["loss"]))
    jax.profiler.stop_trace()
    return trace_dir, steps


def summarize(trace_dir: str, steps: int, top_k: int = 40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    agg = collections.Counter()
    counts = collections.Counter()
    total_ps = 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name.lower()
            if "tpu" not in name and "device" not in name and "axon" not in name:
                continue
            if "host" in name:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # ONLY the synchronous compute line: 'Async XLA Ops' carries
                # DMA-queue copy-start/done events that overlap compute —
                # counting them double-books the step (the async total alone
                # can exceed the wall step time)
                if line.name != "XLA Ops":
                    continue
                # self time: subtract nested children (scan `while` bodies and
                # the jit module event enclose their inner ops on the same line)
                evs = sorted(
                    line.events, key=lambda e: (e.offset_ps, -e.duration_ps)
                )
                stack = []  # (end_ps, child_time_acc_index)
                child_acc = []
                for ev in evs:
                    start, dur = ev.offset_ps, ev.duration_ps
                    while stack and start >= stack[-1][0]:
                        stack.pop()
                    if stack:
                        child_acc[stack[-1][1]] += dur
                    child_acc.append(0)
                    stack.append((start + dur, len(child_acc) - 1))
                for ev, acc in zip(evs, child_acc):
                    nm = meta.get(ev.metadata_id, "?")
                    self_ps = max(ev.duration_ps - acc, 0)
                    agg[nm] += self_ps
                    counts[nm] += 1
                    total_ps += self_ps
    print(f"planes: {len(paths)} files; total device event time "
          f"{total_ps / 1e9 / steps:.1f} ms/step over {steps} steps")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  op")
    for nm, ps in agg.most_common(top_k):
        print(f"{ps / 1e9 / steps:9.2f}  {100 * ps / max(total_ps, 1):5.1f}  "
              f"{counts[nm] // steps:5d}  {nm[:110]}")


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "vit_large"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    top_k = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    variant = sys.argv[5] if len(sys.argv) > 5 else "light"
    d, s = capture(model, batch, steps, variant=variant)
    summarize(d, s, top_k)
