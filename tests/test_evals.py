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


def test_video_classification_cached_features(tmp_path):
    """cache_features=True encodes each train clip once and runs the probe
    at device speed; with a strong synthetic class signal the probe must
    actually LEARN (train top-1 well above 33% chance), which the few-update
    loader path cannot demonstrate this cheaply."""
    cfg = VideoEvalConfig(
        folder=str(tmp_path),
        tag="cached",
        num_classes=3,
        frames_per_clip=4,
        num_segments=2,
        num_views_per_segment=1,
        frame_step=2,
        attend_across_segments=True,
        num_epochs=60,
        resolution=32,
        batch_size=2,
        use_bfloat16=False,
        model_name="vit_tiny",
        patch_size=16,
        tubelet_size=2,
        source="synthetic",
        cache_features=True,
    )
    summary = run_video(cfg)
    # learning, not plumbing: well past 33% chance on both splits
    assert summary["train_acc"] > 50.0, summary
    assert summary["val_top1"] > 45.0, summary


def test_image_classification_synthetic(tmp_path):
    cfg = ImageEvalConfig(
        num_classes=4,
        resolution=32,
        batch_size=1,  # per-chip: loader batch = 8 on the test mesh
        num_epochs=1,
        use_bfloat16=False,
        model_name="vit_tiny",
        frames_per_clip=4,
        source="synthetic",
        folder=str(tmp_path),
    )
    summary = run_image(cfg, max_steps=4)
    assert "val_top1" in summary
    assert np.isfinite(summary["val_top1"])
    # the classifier checkpoint + CSV exist (reference parity: per-epoch
    # probe checkpointing, evals/image_classification_frozen/eval.py:216-259)
    import os

    assert os.path.isdir(tmp_path / "image-eval-cls-ckpt")
    assert (tmp_path / "image-eval_r0.csv").exists()
    # with the opt-in resume flag (reference eval.py:106), a second run
    # resumes at the saved epoch and skips straight to val
    cfg.resume_checkpoint = True
    summary2 = run_image(cfg, max_steps=4)
    assert np.isfinite(summary2["val_top1"])


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


class _FakeVideoFile:
    """Stands in for the native decoder: one fixed-size random frame."""

    shape = (300, 400)  # h, w — smaller than 384*256/224 ≈ 439 short side

    def __init__(self, path):
        self.path = path

    def decode_frames(self, idxs):
        h, w = self.shape
        rng = np.random.default_rng(abs(hash(self.path)) % (2**32))
        return rng.uniform(0, 255, (len(idxs), h, w, 3)).astype(np.uint8)


def _make_image_ds(tmp_path, monkeypatch, resolution, train):
    import avjepa_tpu.evals.image_classification as ic

    monkeypatch.setattr(ic, "VideoFile", _FakeVideoFile)
    csv = tmp_path / "index.csv"
    csv.write_text("".join(f"/fake/img_{i}.jpg {i % 3}\n" for i in range(4)))
    cfg = ic.ImageEvalConfig(
        dataset_train=str(csv), dataset_val=str(csv), resolution=resolution
    )
    return ic.ImageDataset(cfg, train=train)


def test_image_val_transform_224_and_384(tmp_path, monkeypatch):
    """Val center-crop scales its resize with resolution (ref eval.py:406):
    at 384 the old fixed-256 short side underflowed the crop."""
    for r in (224, 384):
        ds = _make_image_ds(tmp_path, monkeypatch, r, train=False)
        img, label = ds[0]
        assert img.shape == (r, r, 3), (r, img.shape)
        assert 0 <= label < 3


def test_image_train_transform_augments_per_epoch(tmp_path, monkeypatch):
    """Train path (auto-augment original + pixel erasing) yields a valid
    shape and different samples across epochs (epoch-salted rng)."""
    ds = _make_image_ds(tmp_path, monkeypatch, 64, train=True)
    ds.set_epoch(0)
    a, _ = ds[1]
    ds.set_epoch(1)
    b, _ = ds[1]
    assert a.shape == b.shape == (64, 64, 3)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)


class _CorruptSometimesVideoFile(_FakeVideoFile):
    """Raises on one specific 'corrupt' path, decodes otherwise."""

    def __init__(self, path):
        super().__init__(path)
        if path.endswith("img_1.jpg"):
            raise RuntimeError("simulated corrupt file")


def test_eval_loader_survives_corrupt_file(tmp_path, monkeypatch):
    """A corrupt file in the eval index is retry-resampled by the shared
    loader machinery instead of crashing the probe run (reference resamples:
    src/datasets/audiovideo_dataset.py:163-170)."""
    import avjepa_tpu.evals.image_classification as ic
    from avjepa_tpu.data.loader import JepaLoader, ShardedSampler

    monkeypatch.setattr(ic, "VideoFile", _CorruptSometimesVideoFile)
    csv = tmp_path / "index.csv"
    csv.write_text("".join(f"/fake/img_{i}.jpg {i % 3}\n" for i in range(8)))
    cfg = ic.ImageEvalConfig(dataset_train=str(csv), dataset_val=str(csv), resolution=32)
    ds = ic.ImageDataset(cfg, train=False)

    def collate(samples):
        return (
            np.stack([s[0] for s in samples]),
            np.asarray([s[1] for s in samples]),
        )

    sampler = ShardedSampler(len(ds), batch_size=4, shuffle=False, num_shards=1, shard_index=0)
    loader = JepaLoader(ds, sampler, num_workers=2, collate=collate)
    batches = list(loader)
    loader.close()
    assert len(batches) == 2
    for imgs, labels in batches:
        assert imgs.shape == (4, 32, 32, 3)
        assert np.isfinite(imgs).all()


def test_missing_checkpoint_is_an_error(tmp_path):
    """A configured-but-absent pretrain checkpoint must fail loudly (not
    silently probe a random encoder) unless explicitly overridden."""
    import pytest

    from avjepa_tpu.evals.image_classification import ImageEvalConfig
    from avjepa_tpu.evals.image_classification import run as run_image

    cfg = ImageEvalConfig(
        num_classes=2, resolution=32, batch_size=1, num_epochs=1,
        use_bfloat16=False, model_name="vit_tiny", frames_per_clip=4,
        source="synthetic", checkpoint=str(tmp_path / "nope"),
        folder=str(tmp_path / "logs"),
    )
    with pytest.raises(FileNotFoundError):
        run_image(cfg, max_steps=1)
    cfg.allow_missing_checkpoint = True
    summary = run_image(cfg, max_steps=1)
    assert "val_top1" in summary


def test_val_loader_excludes_corrupt_file_from_metric(tmp_path, monkeypatch):
    """VAL path: a corrupt file must NOT be silently replaced by a resampled
    other sample (which would double-score it); the slot is excluded via the
    appended ok mask while batch shapes stay static."""
    import avjepa_tpu.evals.image_classification as ic
    from avjepa_tpu.data.loader import (
        JepaLoader,
        ShardedSampler,
        exact_val_collate,
    )

    monkeypatch.setattr(ic, "VideoFile", _CorruptSometimesVideoFile)
    csv = tmp_path / "index.csv"
    csv.write_text("".join(f"/fake/img_{i}.jpg {i % 3}\n" for i in range(8)))
    cfg = ic.ImageEvalConfig(dataset_train=str(csv), dataset_val=str(csv), resolution=32)
    ds = ic.ImageDataset(cfg, train=False)

    def collate(samples):
        return (
            np.stack([s[0] for s in samples]),
            np.asarray([s[1] for s in samples]),
        )

    sampler = ShardedSampler(len(ds), batch_size=4, shuffle=False, num_shards=1, shard_index=0)
    loader = JepaLoader(
        ds, sampler, num_workers=2,
        collate=exact_val_collate(collate), retry_resample=False,
    )
    batches = list(loader)
    loader.close()
    assert len(batches) == 2
    oks = np.concatenate([b[2] for b in batches])
    # exactly one corrupt sample (index 1) excluded; shapes still static
    assert oks.sum() == 7 and not oks[1]
    for imgs, labels, ok in batches:
        assert imgs.shape == (4, 32, 32, 3)
        assert np.isfinite(imgs).all()


def test_env_flag_tolerant_parsing(monkeypatch):
    """Preemption supervisors set e.g. AVJEPA_RESUME_PREEMPT=true; the parse
    must not crash on non-integer spellings."""
    from avjepa_tpu.utils import env_flag

    for val, expect in [
        ("1", True), ("true", True), ("YES", True), ("on", True),
        ("0", False), ("false", False), ("", False), ("off", False),
        ("garbage", False),
    ]:
        monkeypatch.setenv("AVJEPA_TEST_FLAG", val)
        assert env_flag("AVJEPA_TEST_FLAG") is expect, (val, expect)
    monkeypatch.delenv("AVJEPA_TEST_FLAG")
    assert env_flag("AVJEPA_TEST_FLAG") is False
    assert env_flag("AVJEPA_TEST_FLAG", default=True) is True
