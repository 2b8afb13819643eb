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
``top_db=80``, so spectrograms span [-80, 0]). Metrics cover EVERY mask
config in ``cfg.mask`` (averaged, with per-config values alongside), not
just the first.
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
    """Deterministic eval loader: uniform clip windows, center crop,
    no shuffle, seeded per-invocation mask collator.

    Data disjointness: the synthetic branch is genuinely held out (seed
    disjoint from training); the file branch reads ``cfg.data.val_datasets``
    when set, and otherwise falls back to ``cfg.data.datasets`` — the
    TRAINING split — with a loud warning (the reference has no validation
    split convention for this eval; its eval.py is a stub)."""
    if cfg.data.source == "synthetic" or not (
        cfg.data.val_datasets or cfg.data.datasets
    ):
        # a synthetic stream disjoint from the training one (different seed)
        dataset = SyntheticAVDataset(
            layout,
            length=max(256, cfg.data.batch_size * 8),
            seed=cfg.meta.seed + seed_salt,
        )
    else:
        from avjepa_tpu.data.av_dataset import AVFileDataset

        csvs = cfg.data.val_datasets
        if not csvs:
            get_logger(rank=jax.process_index()).warning(
                "data.val_datasets is unset; evaluating on the TRAINING "
                "split (data.datasets) — metrics are not held out"
            )
            csvs = cfg.data.datasets
        dataset = AVFileDataset(
            csv_paths=list(csvs),
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


def run(cfg, max_batches: int = 50, require_probe: bool = True,
        require_jepa: Optional[bool] = None) -> dict:
    logger = get_logger(rank=jax.process_index())
    handles, probe, probe_state, _ = avprediction.setup_probe(cfg)

    # frozen pretrained JEPA weights (same restore path as probe training);
    # strict by default, mirroring require_probe — a missing/empty
    # meta.read_checkpoint must raise, not silently score a random encoder
    if require_jepa is None:
        require_jepa = require_probe
    avprediction.restore_jepa_weights(handles, cfg, logger,
                                      require=require_jepa)

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
    audio_enabled = layout.audio_enabled
    num_mask_cfgs = len(cfg.mask)

    @jax.jit
    def reconstruct(probe_params, enc_params, pred_params,
                    video, audio, enc_ms, pred_ms):
        """Per-mask-config (video MSE, audio MSE), stacked over configs.

        Params are jit ARGUMENTS (not closure constants) so the executable
        does not bake model weights in; the static unroll over mask configs
        mirrors the training step's multimask loop (train/step.py)."""
        mvs, mas = [], []
        for mi in range(num_mask_cfgs):
            enc_m, pred_m = enc_ms[mi], pred_ms[mi]
            ctx = handles.encoder.apply(
                {"params": enc_params}, video, audio, key_mask=enc_m
            )
            z = handles.predictor.apply(
                {"params": pred_params}, ctx, enc_m, pred_m, mi
            )
            full = jnp.where(
                enc_m[..., None], ctx, jnp.where(pred_m[..., None], z, 0.0)
            )
            vr, ar = probe.apply({"params": probe_params}, full)
            mvs.append(jnp.mean(
                (vr.astype(jnp.float32) - video.astype(jnp.float32)) ** 2))
            if audio is None or ar is None:
                mas.append(jnp.zeros(()))
            else:
                mas.append(jnp.mean(
                    (ar.astype(jnp.float32) - audio.astype(jnp.float32)) ** 2))
        return jnp.stack(mvs), jnp.stack(mas)

    v_meters = [AverageMeter() for _ in range(num_mask_cfgs)]
    a_meters = [AverageMeter() for _ in range(num_mask_cfgs)]
    for bi, (video, audio, _, masks) in enumerate(iter(loader)):
        if bi >= max_batches:
            break
        enc_m, pred_m = stack_masksets(masks)
        mv, ma = reconstruct(
            probe_state.probe_params, state.target_params, state.pred_params,
            jnp.asarray(video),
            None if audio is None else jnp.asarray(audio),
            jnp.asarray(enc_m),
            jnp.asarray(pred_m),
        )
        mv, ma = np.asarray(jax.device_get(mv)), np.asarray(jax.device_get(ma))
        for mi in range(num_mask_cfgs):
            v_meters[mi].update(float(mv[mi]))
            a_meters[mi].update(float(ma[mi]))

    def psnr(mse: float, rng: float) -> float:
        return 10.0 * np.log10(max(1e-12, rng**2 / max(mse, 1e-12)))

    mse_v_per = [m.avg for m in v_meters]
    mse_a_per = [m.avg for m in a_meters]
    mse_v = float(np.mean(mse_v_per))
    summary = {
        "mse_video": mse_v,
        "psnr_video_db": psnr(mse_v, _VIDEO_RANGE),
        "mse_video_per_mask": mse_v_per,
        "num_batches": v_meters[0].count,
    }
    msg = (
        f"[av_prediction eval] video MSE {mse_v:.5f} "
        f"({summary['psnr_video_db']:.1f} dB) over {num_mask_cfgs} mask cfgs"
    )
    if audio_enabled:
        mse_a = float(np.mean(mse_a_per))
        summary["mse_audio"] = mse_a
        summary["psnr_audio_db"] = psnr(mse_a, _AUDIO_RANGE_DB)
        summary["mse_audio_per_mask"] = mse_a_per
        msg += f" | audio MSE {mse_a:.5f} ({summary['psnr_audio_db']:.1f} dB)"
    logger.info(msg)
    return summary


def main(args: dict, resume_preempt: bool = False):
    cfg = load_config(args)
    return run(cfg)
