"""Execution evidence for the 384-resolution pretrain configs.

VERDICT r4 item 3: `configs/pretrain/vith16_384.yaml` (reference:
configs/pretrain/vith16_384.yaml:1) loads and validates, and the trilinear
pos-embed interpolation is golden-tested, but no artifact showed the 384
raster (8*24*24 = 4,608 video tokens, 2.77x the N the flash kernels were
tuned at) actually compiling/executing. Two modes:

  --mode virtual   (CPU) the real vith16_384 config (ViT-H, crop 384,
                   16 frames -> N=4608) over a virtual fsdp=2 mesh:
                   AOT-compile the full train step (clean-SPMD-log
                   asserted), print the compiled per-device memory
                   analysis, then EXECUTE two steps on synthetic data and
                   print both losses. XLA attention path (Pallas
                   interprets on CPU); f32 (CPU bf16 is emulated).
  --mode chip      (TPU) vit_large at crop 384 with the production flash
                   kernels + remat + bf16: find the largest batch whose
                   step compiles + executes on one v5e (compile-or-OOM
                   evidence), timing a few steps at the largest fit.

The flash kernels take N=4608 with no retune: `_pick_blocks` solves
block_q from the same VMEM score budget (bf16 fwd: 12 MB -> block_q 512
at N=4608 vs full-width 1664), and the packed kernels' K/V row refs scale
linearly (4608*128*2B = 1.2 MB/ref). This tool is the proof.

Usage:
  python tools/res384_evidence.py --mode virtual
  python tools/res384_evidence.py --mode chip [--batches 8,6,4,2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _cfg_384(model: str, batch: int, dtype: str, attn: str,
             video_only: bool = True) -> dict:
    """The vith16_384 pretrain schema at synthetic-source/batch overrides
    (geometry identical to configs/pretrain/vith16_384.yaml)."""
    return {
        "app": "vjepa" if video_only else "avjepa",
        "data": {
            "dataset_type": "videodataset" if video_only
            else "audiovideodataset",
            "batch_size": batch,
            "num_frames": 16,
            "tubelet_size": 2,
            "crop_size": 384,
            "patch_size": 16,
            "num_workers": 0,
            "source": "synthetic",
        },
        "mask": [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 8,
             "spatial_scale": [0.15, 0.15], "temporal_scale": [1.0, 1.0]},
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
             "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]},
        ],
        "meta": {"seed": 234, "dtype": dtype},
        "model": {"model_name": model, "pred_depth": 12,
                  "pred_embed_dim": 384, "uniform_power": True,
                  "use_mask_tokens": True, "zero_init_mask_tokens": True},
        "optimization": {"ipe": 300, "epochs": 300, "warmup": 40},
        "logging": {"folder": "/tmp/avjepa_384", "write_tag": "res384"},
        "tpu": {"remat": True, "attn_impl": attn},
    }


def mode_virtual() -> dict:
    from __graft_entry__ import _ensure_virtual_cpu_mesh

    _ensure_virtual_cpu_mesh(2)
    import io
    import contextlib

    import jax
    import numpy as np

    from avjepa_tpu.config import load_config
    from avjepa_tpu.parallel.mesh import make_mesh
    from avjepa_tpu.train import pretrain

    devices = jax.devices()
    assert len(devices) >= 2, devices
    mesh = make_mesh(1, 2, 1, devices=devices[:2])

    cfg = load_config(_cfg_384("vit_huge", 2, "float32", "xla"))
    cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor = 1, 2, 1
    layout = cfg.layout()
    assert layout.num_tokens == 4608, layout.num_tokens

    handles = pretrain.setup(cfg, mesh=mesh)
    video, audio, _, masks = next(iter(handles.loader))

    # AOT: clean SPMD log + per-device memory analysis
    from avjepa_tpu.train.step import stack_masksets
    import jax.numpy as jnp

    enc_m, pred_m, idx, union = stack_masksets(masks, with_idx=True)
    st_args = (
        handles.state,
        jnp.asarray(video, jnp.float32),
        None if audio is None else jnp.asarray(audio, jnp.float32),
        jnp.asarray(enc_m), jnp.asarray(pred_m),
        tuple(jnp.asarray(i) for i in idx) if handles.compact else None,
        jnp.asarray(union)
        if handles.compact_pred and union is not None else None,
    )
    jax.config.update("jax_enable_compilation_cache", False)
    err_buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stderr(err_buf):
        compiled = handles.step_fn.lower(*st_args).compile()
    compile_s = time.perf_counter() - t0
    err = err_buf.getvalue()
    assert "Involuntary full rematerialization" not in err, err[-2000:]
    ma = compiled.memory_analysis()
    mem = {
        "argument_gib": round(ma.argument_size_in_bytes / 2**30, 2),
        "output_gib": round(ma.output_size_in_bytes / 2**30, 2),
        "temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
    } if ma is not None else None

    # two real steps through the normal host path
    losses = []
    state = handles.state
    t0 = time.perf_counter()
    for _ in range(2):
        state, metrics = handles.step(state, video, audio, masks)
        losses.append(float(jax.device_get(metrics["loss"])))
    exec_s = time.perf_counter() - t0
    assert all(np.isfinite(l) for l in losses), losses
    assert int(jax.device_get(state.step)) == 2

    out = {
        "mode": "virtual",
        "config": "vith16_384 geometry (vit_huge, crop 384, N_tokens 4608)",
        "mesh": {"data": 1, "fsdp": 2, "tensor": 1},
        "global_batch": 2,
        "clean_spmd_log": True,
        "compile_s": round(compile_s, 1),
        "memory_analysis_per_device": mem,
        "losses_2_steps": [round(l, 4) for l in losses],
        "exec_s_2_steps": round(exec_s, 1),
    }
    print(json.dumps(out))
    return out


def mode_chip(batches: list[int]) -> dict:
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from avjepa_tpu.config import load_config
    from avjepa_tpu.train import pretrain

    results = {}
    fit = None
    for b in batches:
        cfg = load_config(_cfg_384("vit_large", b, "bfloat16", "flash"))
        try:
            handles = pretrain.setup(cfg)
            video, audio, _, masks = next(iter(handles.loader))
            state, metrics = handles.step(handles.state, video, audio, masks)
            loss = float(jax.device_get(metrics["loss"]))
            assert np.isfinite(loss), loss
            # warm timing over 5 steps (sync via scalar device_get)
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                state, metrics = handles.step(state, video, audio, masks)
                loss = float(jax.device_get(metrics["loss"]))
            dt = (time.perf_counter() - t0) / n
            results[b] = {"ok": True, "loss": round(loss, 4),
                          "sec_per_step": round(dt, 3),
                          "clips_per_sec": round(b / dt, 2)}
            fit = b
            del handles, state
            break  # largest fit found (batches given descending)
        except Exception as e:  # noqa: BLE001 — OOM evidence is the point
            msg = str(e)
            results[b] = {"ok": False,
                          "error": msg[:300] + ("..." if len(msg) > 300 else "")}
            if "RESOURCE_EXHAUSTED" not in msg and "memory" not in msg.lower():
                raise
    out = {"mode": "chip",
           "config": "vit_large video-only @ crop 384 (N=4608, the "
                     "vith16_384 app/geometry at ViT-L scale)",
           "largest_fit_batch": fit, "attempts": results}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["virtual", "chip"], default="virtual")
    ap.add_argument("--batches", default="8,6,4,2",
                    help="chip mode: descending batch sizes to try")
    args = ap.parse_args()
    if args.mode == "virtual":
        mode_virtual()
    else:
        mode_chip([int(x) for x in args.batches.split(",")])
