"""M2 milestone: AV pretraining end-to-end on real media files through the
config/CLI path (native decode -> mel -> transforms -> masks -> train step)."""

import numpy as np
import pytest

import jax

from avjepa_tpu.config import load_config
from avjepa_tpu.train import pretrain


@pytest.fixture(scope="module")
def media_csv(tmp_path_factory):
    from avjepa_tpu.data.video_decoder import write_test_video

    d = tmp_path_factory.mktemp("media")
    paths = []
    for i in range(10):
        p = str(d / f"clip{i}.avi")
        write_test_video(p, n_frames=40 + 4 * i, w=96, h=80, fps=25.0,
                         with_audio=True)
        paths.append(p)
    csv = d / "index.csv"
    csv.write_text("".join(f"{p} {i % 3}\n" for i, p in enumerate(paths)))
    return str(csv)


def file_cfg(media_csv, folder, **over):
    d = {
        "app": "avjepa",
        "data": {
            "dataset_type": "audiovideodataset",
            "datasets": [media_csv],
            "batch_size": 1,  # per-chip: loader batch 8 on the 8-device test backend
            "num_frames": 4,
            "tubelet_size": 2,
            "sampling_rate": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 2,
        },
        "mask": [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 1,
             "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]},
        ],
        "meta": {"seed": 1, "dtype": "float32"},
        "model": {"model_name": "vit_tiny", "pred_depth": 2,
                  "pred_embed_dim": 48, "uniform_power": True},
        "optimization": {"ipe": 2, "epochs": 1, "warmup": 1},
        "logging": {"folder": str(folder), "write_tag": "e2e"},
    }
    d.update(over)
    return load_config(d)


def test_av_pretrain_on_real_files(media_csv, tmp_path):
    cfg = file_cfg(media_csv, tmp_path)
    summary = pretrain.run(cfg)
    assert np.isfinite(summary["avg_loss"])
    assert summary["epoch"] == 1


def test_multi_clip_batching(media_csv, tmp_path):
    cfg = file_cfg(media_csv, tmp_path / "mc")
    cfg.data.num_clips = 2
    handles = pretrain.setup(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    assert video.shape[1] == 2 * cfg.data.num_frames  # clips stacked on time
    state, metrics = handles.step(handles.state, video, audio, masks)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_video_only_on_real_files(media_csv, tmp_path):
    cfg = file_cfg(
        media_csv, tmp_path / "v",
        data={
            "dataset_type": "videodataset",
            "datasets": [media_csv],
            "batch_size": 1,  # per-chip: loader batch 8 on the 8-device test backend
            "num_frames": 4,
            "tubelet_size": 2,
            "sampling_rate": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 2,
        },
        app="vjepa",
    )
    handles = pretrain.setup(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    assert audio is None
    state, metrics = handles.step(handles.state, video, None, masks)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
