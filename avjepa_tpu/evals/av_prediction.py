"""AV-prediction reconstruction eval.

The reference ships only an ellipsis stub here (reference:
evals/av_prediction/eval.py:1-24). This is a working implementation: load the
frozen JEPA weights + trained AttentionProbe, run reconstruction over a
held-out set, and report video/audio MSE (and PSNR for video).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from avjepa_tpu.config import load_config
from avjepa_tpu.train import avprediction
from avjepa_tpu.train.step import stack_masksets
from avjepa_tpu.utils.checkpoint import CheckpointManager
from avjepa_tpu.utils.logging import AverageMeter, get_logger


def run(cfg, max_batches: int = 50) -> dict:
    logger = get_logger(rank=jax.process_index())
    handles, probe, probe_state, _ = avprediction.setup_probe(cfg)

    folder = cfg.logging.folder
    probe_dir = os.path.join(folder, f"{cfg.logging.write_tag}-probe-ckpt")
    if os.path.isdir(probe_dir):
        ck = CheckpointManager(probe_dir)
        restored = ck.restore(jax.device_get(probe_state))
        if restored is not None:
            probe_state = restored
        ck.close()

    state = handles.state
    enc_params = state.target_params
    pred_params = state.pred_params

    @jax.jit
    def reconstruct(video, audio, enc_m, pred_m):
        ctx = handles.encoder.apply(
            {"params": enc_params}, video, audio, key_mask=enc_m
        )
        z = handles.predictor.apply(
            {"params": pred_params}, ctx, enc_m, pred_m, 0
        )
        full = jnp.where(enc_m[..., None], ctx, jnp.where(pred_m[..., None], z, 0.0))
        vr, ar = probe.apply({"params": probe_state.probe_params}, full)
        mse_v = jnp.mean((vr.astype(jnp.float32) - video) ** 2)
        mse_a = jnp.mean((ar.astype(jnp.float32) - audio) ** 2)
        return mse_v, mse_a

    v_meter, a_meter = AverageMeter(), AverageMeter()
    for bi, (video, audio, _, masks) in enumerate(iter(handles.loader)):
        if bi >= max_batches:
            break
        enc_m, pred_m = stack_masksets(masks)
        mv, ma = reconstruct(
            jnp.asarray(video), jnp.asarray(audio),
            jnp.asarray(enc_m[0]), jnp.asarray(pred_m[0]),
        )
        v_meter.update(float(jax.device_get(mv)))
        a_meter.update(float(jax.device_get(ma)))

    # PSNR on the normalized pixel range (data is ImageNet-normalized; use
    # observed dynamic range for a comparable scalar)
    psnr_v = 10.0 * np.log10(max(1e-12, 4.0**2 / max(v_meter.avg, 1e-12)))
    summary = {
        "mse_video": v_meter.avg,
        "mse_audio": a_meter.avg,
        "psnr_video_db": psnr_v,
    }
    logger.info(
        f"[av_prediction eval] video MSE {v_meter.avg:.5f} "
        f"(~{psnr_v:.1f} dB) | audio MSE {a_meter.avg:.5f}"
    )
    return summary


def main(args: dict, resume_preempt: bool = False):
    cfg = load_config(args)
    return run(cfg)
