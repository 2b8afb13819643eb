"""Eval pipeline tests on synthetic data (tiny models, few steps)."""

import numpy as np

from avjepa_tpu.evals.image_classification import ImageEvalConfig
from avjepa_tpu.evals.image_classification import run as run_image
from avjepa_tpu.evals.video_classification import VideoEvalConfig
from avjepa_tpu.evals.video_classification import run as run_video


def test_video_classification_synthetic(tmp_path):
    cfg = VideoEvalConfig(
        folder=str(tmp_path),
        num_classes=4,
        frames_per_clip=4,
        num_segments=2,
        num_views_per_segment=2,
        frame_step=2,
        attend_across_segments=True,
        num_epochs=1,
        resolution=32,
        batch_size=4,
        use_bfloat16=False,
        model_name="vit_tiny",
        patch_size=16,
        tubelet_size=2,
        source="synthetic",
    )
    summary = run_video(cfg, max_steps=4)
    assert "val_top1" in summary
    assert 0.0 <= summary["val_top1"] <= 100.0


def test_video_classification_per_segment_probe(tmp_path):
    cfg = VideoEvalConfig(
        folder=str(tmp_path),
        tag="per-seg",
        num_classes=3,
        frames_per_clip=4,
        num_segments=2,
        num_views_per_segment=1,
        attend_across_segments=False,
        num_epochs=1,
        resolution=32,
        batch_size=4,
        use_bfloat16=False,
        model_name="vit_tiny",
        source="synthetic",
    )
    summary = run_video(cfg, max_steps=2)
    assert np.isfinite(summary["val_top1"])


def test_image_classification_synthetic():
    cfg = ImageEvalConfig(
        num_classes=4,
        resolution=32,
        batch_size=4,
        num_epochs=1,
        use_bfloat16=False,
        model_name="vit_tiny",
        frames_per_clip=4,
        source="synthetic",
    )
    summary = run_image(cfg, max_steps=4)
    assert "val_top1" in summary
    assert np.isfinite(summary["val_top1"])


def test_video_classification_frame_aggregation(tmp_path):
    cfg = VideoEvalConfig(
        folder=str(tmp_path),
        tag="frame-agg",
        num_classes=3,
        frames_per_clip=4,
        num_segments=1,
        num_views_per_segment=1,
        attend_across_segments=True,
        frame_aggregation=True,
        num_epochs=1,
        resolution=32,
        batch_size=4,
        use_bfloat16=False,
        model_name="vit_tiny",
        source="synthetic",
    )
    summary = run_video(cfg, max_steps=2)
    assert np.isfinite(summary["val_top1"])
