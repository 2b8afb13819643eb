"""MFU + byte-derived tail accounting for the north-star step.

VERDICT r4 item 4 asks for two things BENCH.md lacked:

1. **A plain MFU line** — total step FLOPs (XLA's own cost analysis of the
   compiled executable), measured sec/step, delivered TFLOP/s, and MFU
   against both the 197-TFLOP v5e bf16 peak and the 150.6-TFLOP measured-
   matmul calibration.
2. **Byte-derived floors for the profile tail** — the ~310 ms of ops BENCH
   r3/r4 aggregated as "each <=0.5%, bandwidth-bound". For every HLO op in
   the profiled step this tool computes an HBM traffic model (sum of
   operand + output buffer bytes) from the compiled module text, pairs it
   with the op's measured self-time from the jax.profiler trace, and
   prints the top tail ops as `measured ms vs bytes/BW floor` so the whole
   step is accounted op-by-op.

Run on the TPU chip (compile is cache-hit after bench.py):
  python tools/mfu_report.py [model] [batch] [steps]
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PEAK_TFLOPS = 197.0          # v5e bf16 peak
CALIB_TFLOPS = 150.6         # measured 8192^3 bf16 matmul (BENCH.md)
HBM_GBPS = 819.0             # v5e HBM bandwidth

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "f8e4m3fn": 1, "f8e5m2": 1,
}
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")


def _shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def hbm_traffic_model(hlo_text: str) -> dict[str, int]:
    """name -> modeled HBM bytes (sum of operand + output buffer sizes).

    Parses every instruction line of the optimized module: the lhs shape is
    the output buffer; operand buffers are resolved through a name->bytes
    map built on the first pass. An over-count for operands that stay
    resident, an under-count for ops that re-read — a *floor* model, same
    standard as BENCH's round-3 accounting.
    """
    out_bytes: dict[str, int] = {}
    lines = []
    inst_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\(?[a-z0-9].*?\)?)\s+([\w-]+)\((.*)$")
    for raw in hlo_text.splitlines():
        m = inst_re.match(raw)
        if not m:
            continue
        name, shape, opcode, rest = m.groups()
        out_bytes[name] = _shape_bytes(shape)
        lines.append((name, opcode, rest))
    traffic: dict[str, int] = {}
    opref_re = re.compile(r"%([\w.-]+)")
    for name, opcode, rest in lines:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        args = rest.split(")", 1)[0]
        t = out_bytes.get(name, 0)
        for op in opref_re.findall(args):
            t += out_bytes.get(op, 0)
        traffic[name] = t
    return traffic


def analytic_step_flops(model, cfg, enc_m, idx, union):
    """MFU-convention model FLOPs per optimizer step: forward + 2x-forward
    backward, remat recompute EXCLUDED (the PaLM MFU definition — MFU counts
    the model's required math, not what the schedule re-executes):
      - target encoder forward (EMA tower, no backward)
      - one context-encoder forward+backward per mask config over its K
        kept tokens (the step runs the context tower once per config)
      - the compacted predictor forward+backward over [M*B, Ku] tokens
    Per transformer layer forward: dots 24*T*d^2 (qkv 6 + proj 2 + mlp 16),
    attention 4*T^2*d; backward doubles both. Patch embeds counted coarsely
    (<1%); LN/softmax/elementwise excluded as is conventional.
    """
    from avjepa_tpu.models.factory import VIT_SPECS

    spec = VIT_SPECS[model]
    d, L = spec.embed_dim, spec.depth
    M, B, N = enc_m.shape

    def tower(T, d, L, b, bwd):
        f = L * b * (24 * T * d * d + 4 * T * T * d)
        return f * (3 if bwd else 1)

    total = tower(N, d, L, B, False)                        # target fwd
    ks = [i.shape[1] for i in idx] if idx is not None else [N] * M
    for k in ks:                                            # ctx passes
        total += tower(k, d, L, B, True)
    dp, lp = cfg.model.pred_embed_dim, cfg.model.pred_depth
    ku = union.shape[2] if union is not None else N
    total += tower(ku, dp, lp, M * B, True)                 # predictor
    # patchify towers + predictor in/out projections, coarse upper bound
    total += 4 * B * N * (16 * 16 * 2 * 3) * d + 6 * M * B * ku * d * dp
    return total, {"N": N, "K_ctx": ks, "Ku": ku, "M": M, "B": B}


def main(model="vit_large", batch=24, steps=10, trace=True):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
    import subprocess
    import time

    # tail-floor trace FIRST, in a subprocess: profiling needs its own full
    # train state on the chip, and two ViT-L states do not co-reside in one
    # process's HBM footprint (measured: RESOURCE_EXHAUSTED)
    trace_dir, traced = "/tmp/avjepa_trace", 3
    if trace and os.environ.get("AVJEPA_MFU_REUSE_TRACE") and \
            os.path.isdir(trace_dir):
        pass  # reuse the last capture (same model/batch assumed)
    elif trace:
        rc = subprocess.call(
            [sys.executable, os.path.join(_REPO, "tools", "profile_step.py"),
             model, str(batch), str(traced)],
            stdout=open("/tmp/mfu_trace_capture.log", "w"),
            stderr=subprocess.STDOUT)
        if rc != 0:
            print(f"[mfu] trace capture failed rc={rc} "
                  "(see /tmp/mfu_trace_capture.log); tail table skipped")
            trace = False

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from avjepa_tpu.config import load_config
    from avjepa_tpu.train import pretrain
    from avjepa_tpu.train.step import stack_masksets
    from bench import north_star_config

    cfg = load_config(north_star_config(model, batch, tag="mfu"))
    handles = pretrain.setup(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    enc_m, pred_m, idx, union = stack_masksets(masks, with_idx=True)
    dt = jnp.bfloat16
    args = (
        jnp.asarray(video, dt), jnp.asarray(audio, dt),
        jnp.asarray(enc_m), jnp.asarray(pred_m),
        tuple(jnp.asarray(i) for i in idx) if handles.compact else None,
        jnp.asarray(union)
        if handles.compact_pred and union is not None else None,
    )
    step = handles.step_fn_light or handles.step_fn
    lowered = step.lower(handles.state, *args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # XLA's own counter is kept only as a lower-bound cross-check: it counts
    # a while-loop body ONCE (not per trip) and sees no FLOPs inside Pallas
    # custom-calls, so it wildly undercounts a scanned transformer
    xla_flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    flops, geom = analytic_step_flops(model, cfg, enc_m, idx, union)

    # warm + timed loop (sync via scalar device_get; block_until_ready is a
    # no-op on the axon backend)
    state = handles.state
    state, m = step(state, *args)
    float(jax.device_get(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, *args)
    float(jax.device_get(m["loss"]))
    sec = (time.perf_counter() - t0) / steps

    tflops_delivered = flops / sec / 1e12
    report = {
        "model": model, "batch": batch, "steps_timed": steps,
        "step_flops_model_tflop": round(flops / 1e12, 2),
        "geometry": geom,
        "step_flops_xla_counter_tflop": round(xla_flops / 1e12, 2),
        "hlo_bytes_accessed_gib": round(bytes_accessed / 2**30, 2),
        "sec_per_step": round(sec, 4),
        "clips_per_sec": round(batch / sec, 2),
        "delivered_tflops": round(tflops_delivered, 1),
        "mfu_vs_peak_197": round(tflops_delivered / PEAK_TFLOPS, 4),
        "mfu_vs_calibration_150.6": round(tflops_delivered / CALIB_TFLOPS, 4),
    }
    print(json.dumps(report))
    if not trace:
        return report

    # ---- tail floors: measured self-times vs HBM byte model -------------
    import collections
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    agg = collections.Counter()
    total_ps = 0
    for p in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            nm = plane.name.lower()
            if ("tpu" not in nm and "device" not in nm and "axon" not in nm) \
                    or "host" in nm:
                continue
            meta = {mm.id: mm.name for mm in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                evs = sorted(line.events,
                             key=lambda e: (e.offset_ps, -e.duration_ps))
                stack, child_acc = [], []
                for ev in evs:
                    start, dur = ev.offset_ps, ev.duration_ps
                    while stack and start >= stack[-1][0]:
                        stack.pop()
                    if stack:
                        child_acc[stack[-1][1]] += dur
                    child_acc.append(0)
                    stack.append((start + dur, len(child_acc) - 1))
                for ev, acc in zip(evs, child_acc):
                    self_ps = max(ev.duration_ps - acc, 0)
                    agg[meta.get(ev.metadata_id, "?")] += self_ps
                    total_ps += self_ps

    traffic = hbm_traffic_model(compiled.as_text())
    # major ops BENCH already floors (attention kernels, MLP fusions, dW/qkv
    # dots) are MXU-bound; the tail = everything else. Identify tail rows by
    # excluding ops whose measured share exceeds 2% of the step.
    rows = []
    for name, ps_t in agg.items():
        ms = ps_t / 1e9 / traced
        # trace metadata carries the whole instruction text
        # ("%fusion.12 = bf16[...] fusion(...)"); the traffic model keys on
        # the bare instruction name
        clean = name.split(" ")[0].strip("%")
        b = traffic.get(clean, 0)
        floor_ms = b / (HBM_GBPS * 1e9) * 1e3
        rows.append((ms, floor_ms, b, clean))
    rows.sort(reverse=True)
    total_ms = total_ps / 1e9 / traced
    major_ms = sum(r[0] for r in rows if r[0] / total_ms > 0.02)
    print(f"\ntotal device {total_ms:.1f} ms/step; major ops (>2% each) "
          f"{major_ms:.1f} ms; tail {total_ms - major_ms:.1f} ms")
    print(f"{'measured':>9} {'HBMfloor':>9} {'MiB':>8}  op (tail = <=2% rows)")
    shown = 0
    tail_acct = 0.0
    for ms, floor_ms, b, name in rows:
        if ms / total_ms > 0.02:
            continue
        if shown < 25:
            print(f"{ms:9.2f} {floor_ms:9.2f} {b / 2**20:8.1f}  {name[:90]}")
        shown += 1
        tail_acct += ms
    print(f"(tail rows shown: top 25 of {shown}; tail total {tail_acct:.1f} ms)")
    return report


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "vit_large"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(model, batch, steps)
