"""avprediction app: frozen-JEPA reconstruction probe training."""

import numpy as np

import jax

from avjepa_tpu.config import load_config
from avjepa_tpu.train import avprediction
from avjepa_tpu.train.step import stack_masksets

import jax.numpy as jnp


def make_cfg(tmp_path):
    return load_config({
        "app": "avprediction",
        "data": {
            "dataset_type": "audiovideodataset",
            "batch_size": 8,
            "num_frames": 4,
            "tubelet_size": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 2,
            "source": "synthetic",
        },
        "mask": [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 1,
             "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]},
        ],
        "meta": {"seed": 3, "dtype": "float32"},
        "model": {"model_name": "vit_tiny", "pred_depth": 2,
                  "pred_embed_dim": 48, "uniform_power": True},
        "optimization": {"ipe": 2, "epochs": 1, "warmup": 1},
        "logging": {"folder": str(tmp_path), "write_tag": "avpred"},
    })


def test_probe_step_trains(tmp_path):
    cfg = make_cfg(tmp_path)
    handles, probe, probe_state, step_fn = avprediction.setup_probe(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    enc_m, pred_m = stack_masksets(masks)
    state = handles.state
    losses = []
    for _ in range(4):
        probe_state, metrics = step_fn(
            probe_state, state.target_params, state.pred_params,
            jnp.asarray(video), jnp.asarray(audio),
            jnp.asarray(enc_m), jnp.asarray(pred_m),
        )
        losses.append(float(jax.device_get(metrics["loss"])))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"probe not learning: {losses}"


def test_avprediction_run_and_example(tmp_path):
    cfg = make_cfg(tmp_path)
    summary = avprediction.run(cfg, max_steps=2)
    assert np.isfinite(summary["avg_loss"])
    out = avprediction.example_main(cfg.raw)
    import os

    assert os.path.exists(out)


def test_av_prediction_eval(tmp_path):
    """Held-out eval contract: strict probe restore (missing probe raises),
    a trained probe beats the untrained one on BOTH modalities, and the eval
    is bit-deterministic run to run."""
    import pytest

    from avjepa_tpu.evals.av_prediction import run as eval_run

    cfg = make_cfg(tmp_path / "e")
    # missing JEPA checkpoint: strict by default (the frozen encoder must
    # never silently be the random init)
    with pytest.raises(FileNotFoundError):
        eval_run(cfg, max_batches=1)
    # missing probe checkpoint: also strict
    with pytest.raises(FileNotFoundError):
        eval_run(cfg, max_batches=1, require_jepa=False)
    # untrained control (init probe, init encoder — synthetic-only test)
    base = eval_run(cfg, max_batches=2, require_probe=False,
                    require_jepa=False)
    assert np.isfinite(base["mse_video"]) and np.isfinite(base["mse_audio"])
    # per-mask-config coverage: one meter per cfg.mask entry
    assert len(base["mse_video_per_mask"]) == len(cfg.mask)
    assert len(base["mse_audio_per_mask"]) == len(cfg.mask)
    # train the probe, then the strict eval must find and beat the control
    cfg.optimization.ipe = 30
    avprediction.run(cfg, max_steps=30)
    trained = eval_run(cfg, max_batches=2, require_jepa=False)
    assert trained["mse_video"] < base["mse_video"], (trained, base)
    assert trained["mse_audio"] < base["mse_audio"], (trained, base)
    assert trained["psnr_video_db"] > base["psnr_video_db"]
    assert trained["psnr_audio_db"] > base["psnr_audio_db"]
    # deterministic: identical numbers on a rerun
    again = eval_run(cfg, max_batches=2, require_jepa=False)
    assert again == trained


def test_probe_video_only(tmp_path):
    """vjepa-style video-only prediction: no audio stream, loss_audio == 0."""
    cfg = make_cfg(tmp_path)
    cfg.app = "vjepa_prediction"
    cfg.data.dataset_type = "videodataset"  # audio_enabled=False layout
    handles, probe, probe_state, step_fn = avprediction.setup_probe(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    assert audio is None
    enc_m, pred_m = stack_masksets(masks)
    state = handles.state
    probe_state, metrics = step_fn(
        probe_state, state.target_params, state.pred_params,
        jnp.asarray(video), None, jnp.asarray(enc_m), jnp.asarray(pred_m),
    )
    metrics = jax.device_get(metrics)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_audio"]) == 0.0


def test_probe_video_only_run_entrypoint(tmp_path):
    """The run() app entrypoint itself (not just step_fn) must handle a
    video-only loader (audio is None there; regression: it crashed in
    jnp.asarray(None))."""
    cfg = make_cfg(tmp_path)
    cfg.app = "vjepa_prediction"
    cfg.data.dataset_type = "videodataset"
    summary = avprediction.run(cfg, max_steps=1)
    assert np.isfinite(summary["avg_loss"])


def test_avprediction_resume_preempt(tmp_path):
    """A preempted probe run relaunched with resume_preempt=True restores the
    probe from its own checkpoint and skips completed epochs, instead of
    silently retraining from step 0 and clobbering the saved probe."""
    import os

    from avjepa_tpu.utils.checkpoint import CheckpointManager

    cfg = make_cfg(tmp_path)
    cfg.optimization.epochs = 2
    cfg.raw["optimization"]["epochs"] = 2  # main() below reloads from raw
    # first run: completes epoch 1 (ipe=2 -> save at step 2), then "dies"
    avprediction.run(cfg, max_steps=2)
    probe_dir = os.path.join(str(tmp_path), "avpred-probe-ckpt")
    ck = CheckpointManager(probe_dir)
    assert ck.latest_step() == 2
    ck.close()
    # relaunch through the registry entrypoint, as the runbook does
    summary = avprediction.main(cfg.raw, resume_preempt=True)
    assert summary["epoch"] == 2  # epoch 1 was skipped, epoch 2 ran
    ck = CheckpointManager(probe_dir)
    assert ck.latest_step() == 4  # resumed from 2 and advanced, not from 0
    ck.close()


def test_avprediction_resume_without_flag_restarts(tmp_path):
    """Without resume_preempt the run retrains from scratch (reference
    behavior: probe training is cheap and restart-by-default)."""
    cfg = make_cfg(tmp_path)
    avprediction.run(cfg)  # epochs=1, saves step 2
    summary = avprediction.run(cfg)
    assert summary["epoch"] == 1
