"""AV-prediction reconstruction eval — held-out, deterministic.

The reference ships only an ellipsis stub here (reference:
evals/av_prediction/eval.py:1-24); this is a working implementation with an
eval-grade data contract the training pipeline deliberately does NOT have:

- **uniform clip windows** (``random_clip_sampling=False``) and a
  deterministic center-crop transform instead of the train-time random
  resized crop / flip / erase;
- an **unshuffled** sharded sampler over the dataset;
- a **fresh mask collator** whose ``(base_seed, counter)`` is fixed per
  invocation, so the context/target masks are identical run to run;
- a **strict abstract-template probe restore**: every probe leaf must be
  present in the checkpoint with a matching shape (the same standard as the
  classification evals' encoder merge,
  ``evals/video_classification.load_target_encoder_params``), so a silently
  random probe can never masquerade as a trained one.

Reported metrics are per-modality: full-frame video MSE + PSNR (fixed 4.0
dynamic range — ImageNet-normalized pixels span ~[-2.1, 2.6]) and
full-spectrogram audio MSE + PSNR (fixed 80 dB range — mel power_to_db uses
``top_db=80``, so spectrograms span [-80, 0]).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from avjepa_tpu.config import load_config
from avjepa_tpu.data.loader import JepaLoader, ShardedSampler
from avjepa_tpu.data.synthetic import SyntheticAVDataset
from avjepa_tpu.data.transforms import EvalVideoTransform
from avjepa_tpu.masks.multiblock3d import make_mask_collator
from avjepa_tpu.train import avprediction
from avjepa_tpu.train.step import stack_masksets
from avjepa_tpu.utils.checkpoint import CheckpointManager
from avjepa_tpu.utils.logging import AverageMeter, get_logger

# fixed PSNR dynamic ranges (documented in the module docstring)
_VIDEO_RANGE = 4.0
_AUDIO_RANGE_DB = 80.0


class _CenterCropEval:
    """Deterministic single-view eval transform adapting EvalVideoTransform
    to the AVFileDataset ``transform(frames, rng)`` signature (rng unused)."""

    def __init__(self, crop_size: int):
        self.inner = EvalVideoTransform(
            num_views=1, short_side=crop_size, crop_size=crop_size
        )

    def __call__(self, clip: np.ndarray, rng=None) -> np.ndarray:
        return self.inner(clip)[0]


def build_eval_loader(cfg, layout, seed_salt: int = 101) -> JepaLoader:
    """Held-out deterministic loader: uniform clip windows, center crop,
    no shuffle, seeded per-invocation mask collator."""
    if cfg.data.source == "synthetic" or not cfg.data.datasets:
        # a synthetic stream disjoint from the training one (different seed)
        dataset = SyntheticAVDataset(
            layout,
            length=max(256, cfg.data.batch_size * 8),
            seed=cfg.meta.seed + seed_salt,
        )
    else:
        from avjepa_tpu.data.av_dataset import AVFileDataset

        dataset = AVFileDataset(
            csv_paths=list(cfg.data.datasets),
            layout=layout,
            frames_per_clip=cfg.data.num_frames,
            frame_step=cfg.data.sampling_rate,
            num_clips=1,
            random_clip_sampling=False,
            filter_short_videos=cfg.data.filter_short_videos,
            filter_long_videos=cfg.data.filter_long_videos,
            duration=cfg.data.clip_duration,
            crop_size=cfg.data.crop_size,
            transform=_CenterCropEval(cfg.data.crop_size),
            seed=cfg.meta.seed + seed_salt,
        )
    collator = make_mask_collator(
        cfg.data.mask_type or cfg.tpu.mask_type,
        cfg.mask,
        layout,
        base_seed=cfg.meta.seed + seed_salt,
    )
    collator.set_counter(-1)  # fixed start -> identical masks run to run
    sampler = ShardedSampler(
        dataset_len=len(dataset),
        batch_size=cfg.data.batch_size,
        shuffle=False,
        seed=cfg.meta.seed + seed_salt,
    )
    return JepaLoader(
        dataset,
        sampler,
        mask_collator=collator,
        num_workers=cfg.data.num_workers,
        use_processes=cfg.data.source != "synthetic" and cfg.data.num_workers > 1,
    )


def load_probe_state_strict(probe_dir: str, probe_state_like):
    """Strict abstract-template restore of a ProbeState checkpoint.

    Builds the template from the live probe state's own shapes/dtypes and
    restores into it — Orbax verifies structure and shapes leaf-by-leaf, so
    a missing/renamed/mis-shaped leaf fails loudly instead of silently
    keeping init values. Raises FileNotFoundError when no checkpoint exists.
    """
    if not os.path.isdir(probe_dir):
        raise FileNotFoundError(f"no probe checkpoint directory: {probe_dir!r}")
    ck = CheckpointManager(probe_dir)
    try:
        step = ck.latest_step()
        if step is None:
            raise FileNotFoundError(f"no probe checkpoint under {probe_dir!r}")
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), probe_state_like
        )
        return ck.restore(template, step)
    finally:
        ck.close()


def run(cfg, max_batches: int = 50, require_probe: bool = True) -> dict:
    logger = get_logger(rank=jax.process_index())
    handles, probe, probe_state, _ = avprediction.setup_probe(cfg)

    # frozen pretrained JEPA weights (same restore path as probe training)
    avprediction.restore_jepa_weights(handles, cfg, logger)

    folder = cfg.logging.folder
    probe_dir = os.path.join(folder, f"{cfg.logging.write_tag}-probe-ckpt")
    try:
        probe_state = load_probe_state_strict(probe_dir, probe_state)
        logger.info(f"loaded trained probe from {probe_dir}")
    except FileNotFoundError:
        if require_probe:
            raise
        logger.warning(
            f"no trained probe under {probe_dir!r}; evaluating the INIT "
            "probe (require_probe=False)"
        )

    layout = cfg.layout()
    loader = build_eval_loader(cfg, layout)

    state = handles.state
    enc_params = state.target_params
    pred_params = state.pred_params
    audio_enabled = layout.audio_enabled

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
        mse_v = jnp.mean((vr.astype(jnp.float32) - video.astype(jnp.float32)) ** 2)
        if audio is None or ar is None:
            mse_a = jnp.zeros(())
        else:
            mse_a = jnp.mean(
                (ar.astype(jnp.float32) - audio.astype(jnp.float32)) ** 2
            )
        return mse_v, mse_a

    v_meter, a_meter = AverageMeter(), AverageMeter()
    for bi, (video, audio, _, masks) in enumerate(iter(loader)):
        if bi >= max_batches:
            break
        enc_m, pred_m = stack_masksets(masks)
        mv, ma = reconstruct(
            jnp.asarray(video),
            None if audio is None else jnp.asarray(audio),
            jnp.asarray(enc_m[0]),
            jnp.asarray(pred_m[0]),
        )
        v_meter.update(float(jax.device_get(mv)))
        a_meter.update(float(jax.device_get(ma)))

    def psnr(mse: float, rng: float) -> float:
        return 10.0 * np.log10(max(1e-12, rng**2 / max(mse, 1e-12)))

    summary = {
        "mse_video": v_meter.avg,
        "psnr_video_db": psnr(v_meter.avg, _VIDEO_RANGE),
        "num_batches": v_meter.count,
    }
    msg = (
        f"[av_prediction eval] video MSE {v_meter.avg:.5f} "
        f"({summary['psnr_video_db']:.1f} dB)"
    )
    if audio_enabled:
        summary["mse_audio"] = a_meter.avg
        summary["psnr_audio_db"] = psnr(a_meter.avg, _AUDIO_RANGE_DB)
        msg += f" | audio MSE {a_meter.avg:.5f} ({summary['psnr_audio_db']:.1f} dB)"
    logger.info(msg)
    return summary


def main(args: dict, resume_preempt: bool = False):
    cfg = load_config(args)
    return run(cfg)
