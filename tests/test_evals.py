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
        batch_size=1,  # per-chip: loader batch = 8 on the test mesh
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
        batch_size=1,  # per-chip: loader batch = 8 on the test mesh
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
        batch_size=1,  # per-chip: loader batch = 8 on the test mesh
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
        batch_size=1,  # per-chip: loader batch = 8 on the test mesh
        use_bfloat16=False,
        model_name="vit_tiny",
        source="synthetic",
    )
    summary = run_video(cfg, max_steps=2)
    assert np.isfinite(summary["val_top1"])


def test_eval_metric_reduction_matches_host():
    """The jitted global-batch correct-count (sharded over the 8-device eval
    mesh) equals the host-side count — the multi-chip metric path is exact."""
    import jax
    import jax.numpy as jnp
    from avjepa_tpu.parallel.mesh import eval_mesh, put_batch

    mesh = eval_mesh()
    rng = np.random.default_rng(0)
    probs = rng.random((16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(16,))

    @jax.jit
    def count_correct(p, l):
        return jnp.sum((jnp.argmax(p, -1) == l).astype(jnp.int32))

    got = int(jax.device_get(count_correct(put_batch(mesh, probs), put_batch(mesh, labels))))
    want = int((probs.argmax(-1) == labels).sum())
    assert got == want
