"""data=8 multi-chip evidence for the north-star ViT-L AV step.

VERDICT r4 item 5: the 2x2x2 dryrun proves mesh *correctness*; this tool
adds the DP deployment shape — AOT-compile the full north-star training
step (ViT-L AV, b24/chip, bf16, remat, both mask configs) over a virtual
``data=8`` mesh and extract the per-step collective profile from the
optimized HLO:

- asserts a clean SPMD partition (no "Involuntary full rematerialization"
  on stderr, same standard as tests/test_train_step.py::
  test_multichip_compile_no_involuntary_remat);
- sums the bytes moved by every collective op (all-reduce / all-gather /
  reduce-scatter / collective-permute / all-to-all) in the compiled module,
  grouped by op kind and dtype — the gradient all-reduce is the dominant
  row (enc+pred grads, f32);
- prints one JSON line with the byte profile and ring-allreduce ICI-time
  projections for v5e and v5p (formula: t = 2*S*(N-1)/N / W_axis, one
  torus axis; W from the public per-chip ICI specs).

Attention runs the XLA path here (the Pallas kernels interpret on CPU and
would make the trace enormous); attention is device-local in every
parallelism mode we ship, so the collective profile is identical to the
flash-kernel step's.

Usage:  python tools/multichip_data8.py [--model vit_large] [--batch 24]
        (self-configures an 8-device virtual CPU backend)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# virtual 8-device CPU backend (must precede jax import; see __graft_entry__)
from __graft_entry__ import _ensure_virtual_cpu_mesh  # noqa: E402

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of one HLO shape string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_profile(hlo_text: str) -> dict:
    """Bytes moved per collective kind, from optimized HLO text.

    LOOP-AWARE: a collective inside a while body (e.g. the per-layer
    gradient all-reduce emitted inside the backward scan loop) executes
    once per trip, so its bytes are multiplied by the loop's
    ``known_trip_count`` (nested loops multiply). An earlier revision
    counted static instruction bytes only, under-reporting the gradient
    all-reduce 10x at ViT-L (24-trip encoder scan).

    Returns per-kind {count, bytes} (bytes = per-step executed bytes) plus
    an `ops` list of every instruction's (kind, bytes, trips, shape) so the
    dominant movers are attributable, not just summed.
    """
    comp_re = re.compile(r"^%?([\w.$-]+)\s*\(")
    coll_re = re.compile(
        r"^(?:ROOT )?[%\w.-]+ = (.+?) ("
        + "|".join(_COLLECTIVES) + r")(?:-start|-done)?\(")
    body_re = re.compile(r"body=%?([\w.$-]+)")
    trip_re = re.compile(r'"known_trip_count":\{"n":"(\d+)"')

    current = None
    colls: list = []  # (comp, kind, bytes, shape)
    body_of: dict[str, tuple[str, int]] = {}  # body comp -> (parent, trips)
    for raw in hlo_text.splitlines():
        line = raw.strip()
        if raw and not raw.startswith(" ") and line.endswith("{") \
                and "->" in line:
            h = line[5:].strip() if line.startswith("ENTRY") else line
            m = comp_re.match(h)
            if m:
                current = m.group(1)
            continue
        m = coll_re.match(line)
        if m:
            shape, kind = m.group(1), m.group(2)
            if "-done" in line.split("(")[0]:
                continue  # -done pairs with -start; count once
            colls.append((current, kind, _shape_bytes(shape), shape))
        if " while(" in line:
            mb = body_re.search(line)
            mt = trip_re.search(line)
            if mb:
                body_of[mb.group(1)] = (
                    current, int(mt.group(1)) if mt else 1)

    def multiplier(comp: str, _depth: int = 0) -> int:
        if comp in body_of and _depth < 8:
            parent, trips = body_of[comp]
            return trips * multiplier(parent, _depth + 1)
        return 1

    prof: dict[str, dict] = {}
    ops: list = []
    for comp, kind, b, shape in colls:
        trips = multiplier(comp) if comp else 1
        ent = prof.setdefault(kind, {"count": 0, "bytes": 0})
        ent["count"] += trips
        ent["bytes"] += b * trips
        ops.append({"kind": kind, "bytes": b * trips, "trips": trips,
                    "shape": shape[:200]})
    ops.sort(key=lambda o: -o["bytes"])
    prof["ops"] = ops
    return prof


def main() -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_large")
    ap.add_argument("--batch", type=int, default=24, help="per-chip batch")
    ap.add_argument("--data", type=int, default=8)
    ap.add_argument("--from-hlo", default=None,
                    help="re-profile a saved optimized-HLO dump instead of "
                    "recompiling (collective accounting only; the clean-SPMD "
                    "assertion was made by the run that wrote the dump)")
    args = ap.parse_args()

    if args.from_hlo:
        with open(args.from_hlo) as f:
            prof = collective_profile(f.read())
        ops = prof.pop("ops", [])
        N = args.data
        ar = prof.get("all-reduce", {}).get("bytes", 0)
        wire = 2 * ar * (N - 1) / N
        out = {
            "mesh": {"data": N}, "model": args.model,
            "collectives": prof, "allreduce_bytes": ar,
            "ring_wire_bytes_per_chip": wire,
            "ici_projection": {"v5e_1axis_ms": wire / 100e9 * 1e3,
                               "v5p_1axis_ms": wire / 200e9 * 1e3},
            "top_collectives": ops[:12],
            "hlo_dump": args.from_hlo,
        }
        print(json.dumps(out))
        return out

    _ensure_virtual_cpu_mesh(args.data)
    import io
    import contextlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from avjepa_tpu.config import load_config
    from avjepa_tpu.parallel.mesh import make_mesh
    from avjepa_tpu.train import pretrain
    from avjepa_tpu.train.step import stack_masksets
    from bench import north_star_config

    devices = jax.devices()
    assert len(devices) >= args.data, (len(devices), args.data)
    mesh = make_mesh(args.data, 1, 1, devices=devices[: args.data])

    cfgd = north_star_config(args.model, args.batch, attn="xla")
    cfg = load_config(cfgd)
    cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor = args.data, 1, 1

    handles = pretrain.setup(cfg, mesh=mesh)

    layout = cfg.layout()
    gb = args.batch * args.data  # global batch
    video = jax.ShapeDtypeStruct(
        (gb, layout.num_frames, layout.crop_size, layout.crop_size, 3),
        jnp.bfloat16)
    audio = jax.ShapeDtypeStruct(
        (gb, layout.spec_height, layout.spec_width, 1), jnp.bfloat16)
    masks = handles.mask_collator(gb)
    enc_m, pred_m, idx, union = stack_masksets(masks, with_idx=True)
    st_args = (
        handles.state,
        video,
        audio,
        jax.ShapeDtypeStruct(np.asarray(enc_m).shape, jnp.bool_),
        jax.ShapeDtypeStruct(np.asarray(pred_m).shape, jnp.bool_),
        tuple(jax.ShapeDtypeStruct(np.asarray(i).shape, np.asarray(i).dtype)
              for i in idx) if handles.compact else None,
        jax.ShapeDtypeStruct(np.asarray(union).shape, np.asarray(union).dtype)
        if handles.compact_pred and union is not None else None,
    )

    jax.config.update("jax_enable_compilation_cache", False)
    err_buf = io.StringIO()
    lowered = handles.step_fn.lower(*st_args)
    # SPMD partitioner warnings land on the C++ stderr stream; capture the
    # python-level mirror AND scan the HLO afterwards
    with contextlib.redirect_stderr(err_buf):
        compiled = lowered.compile()
    err = err_buf.getvalue()
    assert "Involuntary full rematerialization" not in err, err[-2000:]

    hlo = compiled.as_text()
    prof = collective_profile(hlo)
    ops = prof.pop("ops", [])
    hlo_path = os.path.join(_REPO, "bench_artifacts",
                            f"data{args.data}_{args.model}_step.hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(hlo)

    # parameter/gradient accounting for context
    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t))

    enc_b = tree_bytes(handles.state.enc_params)
    pred_b = tree_bytes(handles.state.pred_params)

    # ring all-reduce projection: t = 2*S*(N-1)/N / W_axis.
    # W_axis = bandwidth one torus axis contributes per chip, both ring
    # directions (public per-chip ICI: v5e 4x400 Gbps => 100 GB/s per 1D
    # axis; v5p 6x~800 Gbps => ~200 GB/s per axis).
    N = args.data
    ar_bytes = prof.get("all-reduce", {}).get("bytes", 0)
    wire = 2 * ar_bytes * (N - 1) / N
    proj = {
        "v5e_1axis_ms": wire / 100e9 * 1e3,
        "v5p_1axis_ms": wire / 200e9 * 1e3,
    }

    out = {
        "mesh": {"data": args.data, "fsdp": 1, "tensor": 1},
        "model": args.model,
        "per_chip_batch": args.batch,
        "global_batch": gb,
        "clean_spmd_log": True,
        "collectives": prof,
        "enc_param_bytes": enc_b,
        "pred_param_bytes": pred_b,
        "allreduce_bytes": ar_bytes,
        "ring_wire_bytes_per_chip": wire,
        "ici_projection": proj,
        "top_collectives": ops[:12],
        "hlo_dump": os.path.relpath(hlo_path, _REPO),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
