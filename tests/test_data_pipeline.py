"""Data pipeline tests: native decoder, mel spectrogram, file dataset, loader."""

import os

import numpy as np
import pytest

from avjepa_tpu.data.mel import mel_filterbank, mel_spectrogram, power_to_db, stft_magnitude
from avjepa_tpu.layout import TokenLayout


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    from avjepa_tpu.data.video_decoder import write_test_video

    path = str(tmp_path_factory.mktemp("media") / "clip.avi")
    write_test_video(path, n_frames=80, w=128, h=96, fps=25.0, with_audio=True)
    return path


def test_mel_shapes_and_peak():
    sr = 44100
    t = np.arange(sr, dtype=np.float32) / sr
    y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    m = mel_spectrogram(y, sr)
    assert m.shape == (128, 192)
    # ref=max => peak at 0 dB (width zoom may interpolate slightly below)
    assert -1.0 <= m.max() <= 1e-6
    assert m.min() >= -81.0  # top_db clamp
    # the 440 Hz peak should sit in the low mel bins
    peak_bin = int(np.argmax(m.mean(axis=1)))
    assert 2 <= peak_bin <= 25


def test_mel_filterbank_properties():
    fb = mel_filterbank(44100, 2048, 128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_stft_frame_count():
    y = np.zeros(5120, np.float32)
    s = stft_magnitude(y, n_fft=2048, hop_length=512)
    assert s.shape == (1025, 1 + 5120 // 512)


def test_power_to_db_clamp():
    s = np.array([[1.0, 1e-12]])
    db = power_to_db(s, top_db=80.0)
    assert db[0, 0] == 0.0
    assert db[0, 1] == -80.0


def test_decoder_roundtrip(test_video):
    from avjepa_tpu.data.video_decoder import VideoFile

    vf = VideoFile(test_video)
    assert vf.num_frames == 80
    assert abs(vf.fps - 25.0) < 1e-6
    idx = np.array([0, 10, 10, 40, 79])
    frames = vf.decode_frames(idx)
    assert frames.shape == (5, 96, 128, 3)
    # duplicate index decodes identical frames
    np.testing.assert_array_equal(frames[1], frames[2])
    # different frames differ (moving pattern)
    assert np.abs(frames[0].astype(int) - frames[3].astype(int)).max() > 10
    pcm, sr = vf.decode_audio()
    assert sr == 44100
    assert len(pcm) > sr * 2  # ~3.2s of audio
    # 440 Hz sine: strong signal
    assert np.abs(pcm).max() > 0.2


def test_file_dataset(test_video, tmp_path):
    from avjepa_tpu.data.av_dataset import AVFileDataset

    csv = tmp_path / "index.csv"
    csv.write_text(f"{test_video} 3\n{test_video} 5\n")
    layout = TokenLayout(num_frames=8, crop_size=64, patch_size=16, tubelet_size=2)
    ds = AVFileDataset(
        csv_paths=[str(csv)], layout=layout, frames_per_clip=8, frame_step=4,
        crop_size=64,
    )
    assert len(ds) == 2
    video, mel, label = ds[0]
    assert video.shape == (8, 64, 64, 3)
    assert video.dtype == np.float32
    assert mel.shape == (128, 192)
    assert label == 3
    assert np.isfinite(video).all() and np.isfinite(mel).all()

    # augmentations/clip windows must be FRESH each epoch (regression: the
    # rng salt was never updated, freezing every epoch's crops/flips) and
    # reproducible within one
    v_same, _, _ = ds[0]
    np.testing.assert_array_equal(video, v_same)
    ds.set_epoch(1)
    v_e1, _, _ = ds[0]
    assert not np.array_equal(video, v_e1)


def test_clip_sampling_edge_pad():
    from avjepa_tpu.data.av_dataset import sample_clip_indices

    rng = np.random.default_rng(0)
    # short video: 10 frames, want 16 x step 4 = 64 frame span
    clips = sample_clip_indices(10, 16, 4, 1, rng)
    assert len(clips) == 1
    assert len(clips[0]) == 16
    assert clips[0].max() <= 9
    # long video
    clips = sample_clip_indices(300, 16, 4, 2, rng)
    assert len(clips) == 2
    assert all(len(c) == 16 for c in clips)
    assert clips[1].min() >= 150  # second partition


def test_loader_with_file_dataset(test_video, tmp_path):
    from avjepa_tpu.data.av_dataset import AVFileDataset
    from avjepa_tpu.data.loader import JepaLoader, ShardedSampler
    from avjepa_tpu.masks import AVMaskCollator

    csv = tmp_path / "index.csv"
    csv.write_text("".join(f"{test_video} {i}\n" for i in range(8)))
    layout = TokenLayout(num_frames=8, crop_size=64, patch_size=16, tubelet_size=2)
    ds = AVFileDataset(
        csv_paths=[str(csv)], layout=layout, frames_per_clip=8, frame_step=4,
        crop_size=64,
    )
    coll = AVMaskCollator(
        [{"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
          "spatial_scale": [0.5, 0.5], "temporal_scale": [1.0, 1.0]}],
        layout,
    )
    sampler = ShardedSampler(len(ds), batch_size=4, num_shards=1, shard_index=0)
    loader = JepaLoader(ds, sampler, mask_collator=coll, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    video, audio, labels, masks = batches[0]
    assert video.shape == (4, 8, 64, 64, 3)
    assert audio.shape == (4, 128, 192, 1)
    assert len(masks) == 1


def test_transforms_shapes():
    from avjepa_tpu.data.transforms import VideoTransform

    rng = np.random.default_rng(0)
    clip = (np.random.default_rng(1).uniform(0, 255, (8, 120, 160, 3))).astype(np.uint8)
    tf = VideoTransform(crop_size=64, motion_shift=True, reprob=1.0)
    out = tf(clip, rng)
    assert out.shape == (8, 64, 64, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_eval_transform_views():
    from avjepa_tpu.data.transforms import EvalVideoTransform

    clip = (np.random.default_rng(1).uniform(0, 255, (4, 120, 160, 3))).astype(np.uint8)
    tf = EvalVideoTransform(num_views=3, short_side=64, crop_size=64)
    views = tf(clip)
    assert len(views) == 3
    for v in views:
        assert v.shape == (4, 64, 64, 3)


def test_sharded_sampler_multihost():
    """Shards partition the (padded) index space; epochs reshuffle."""
    from avjepa_tpu.data.loader import ShardedSampler

    n, bs = 103, 4
    shards = [
        ShardedSampler(n, bs, seed=5, num_shards=4, shard_index=i)
        for i in range(4)
    ]
    batches = [np.concatenate(list(s)) for s in shards]
    allidx = np.concatenate(batches)
    # each shard sees a disjoint-ish slice of the permutation; drop_last
    # discards up to bs-1 indices per shard and wrap-around padding may
    # duplicate up to num_shards-1
    assert len(allidx) == sum(len(b) for b in batches)
    assert len(np.unique(allidx)) >= n - 4 * (bs - 1) - 4
    # same epoch, same seed -> deterministic across ranks
    again = np.concatenate(list(ShardedSampler(n, bs, seed=5, num_shards=4, shard_index=0)))
    np.testing.assert_array_equal(batches[0], again)
    # epoch reshuffles
    s = ShardedSampler(n, bs, seed=5, num_shards=4, shard_index=0)
    s.set_epoch(1)
    assert not np.array_equal(np.concatenate(list(s)), batches[0])


def test_mask_collator_cross_host_agreement():
    """Two hosts with the same base_seed/counter produce identical masks
    (the reference's shared-Value discipline)."""
    from avjepa_tpu.layout import TokenLayout
    from avjepa_tpu.masks import AVMaskCollator

    lo = TokenLayout()
    cfgs = [{"aspect_ratio": [0.75, 1.5], "num_blocks": 4,
             "spatial_scale": [0.2, 0.2], "temporal_scale": [1.0, 1.0]}]
    host0 = AVMaskCollator(cfgs, lo, base_seed=11)
    host1 = AVMaskCollator(cfgs, lo, base_seed=11)
    for _ in range(3):
        m0 = host0(4)[0]
        m1 = host1(4)[0]
        np.testing.assert_array_equal(m0.enc, m1.enc)
        np.testing.assert_array_equal(m0.pred, m1.pred)


def test_video_transform_class_family():
    """The composable clip-transform classes (reference vendored family,
    src/datasets/utils/video/transforms.py:803-1184) behave sanely."""
    import numpy as np
    from avjepa_tpu.data import video_transforms as vt

    rng = np.random.default_rng(0)
    clip = rng.random((4, 48, 64, 3)).astype(np.float32)

    pipeline = vt.Compose([
        vt.RandomResize((0.9, 1.1)),
        vt.Resize(40),
        vt.RandomCrop(32),
        vt.RandomHorizontalFlip(p=1.0),
        vt.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1),
        vt.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
    ])
    out = pipeline(clip, np.random.default_rng(1))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()

    # deterministic ops
    cc = vt.CenterCrop(32)(clip)
    assert cc.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(cc, clip[:, 8:40, 16:48])
    three = vt.ThreeCrop(32)(vt.Resize((32, 64))(clip))
    assert three.shape == (12, 32, 32, 3)
    # the three crops slide along the long side — they must differ
    assert not np.allclose(three[:4], three[4:8])
    assert not np.allclose(three[4:8], three[8:])
    # non-square input resizes the SHORT side to size (not both dims)
    three2 = vt.ThreeCrop(32)(clip)  # 48x64 -> 32x~43 -> three 32x32 crops
    assert three2.shape == (12, 32, 32, 3)
    assert not np.allclose(three2[:4], three2[8:])

    # flip p=1 flips width
    flipped = vt.RandomHorizontalFlip(1.0)(clip, rng)
    np.testing.assert_allclose(flipped, clip[:, :, ::-1])

    # rotation by 0 degrees is identity
    rot = vt.RandomRotation((0.0, 0.0))(clip, rng)
    np.testing.assert_allclose(rot, clip)

    # hue shift by a full turn is (nearly) identity
    h1 = vt.ColorJitter._hue_shift(clip, 1.0)
    np.testing.assert_allclose(h1, clip, atol=1e-5)

    # grayscale jitter functional helpers
    g = vt.grayscale(clip)
    assert np.allclose(g[..., 0], g[..., 1])
    cj = vt.color_jitter(clip, rng, 0.4, 0.4, 0.4)
    assert cj.shape == clip.shape


def test_sharded_sampler_no_drop_last_small_val():
    """drop_last=False wrap-pads the final partial batch: a val set SMALLER
    than one batch must still yield one (full, wrap-padded) batch — with
    drop_last it yielded zero and the eval reported 0% on small val CSVs."""
    from avjepa_tpu.data.loader import ShardedSampler

    s = ShardedSampler(20, 24, shuffle=False, num_shards=1, shard_index=0,
                       drop_last=False)
    batches = list(s)
    assert len(batches) == 1 and len(batches[0]) == 24
    # every sample appears; the pad wraps from the front
    assert set(batches[0]) == set(range(20))
    np.testing.assert_array_equal(batches[0][20:], [0, 1, 2, 3])

    # non-divisible larger set: all samples covered, static batch shape kept
    s = ShardedSampler(50, 16, shuffle=False, num_shards=1, shard_index=0,
                       drop_last=False)
    batches = list(s)
    assert [len(b) for b in batches] == [16, 16, 16, 16]
    assert set(np.concatenate(batches)) == set(range(50))

    # drop_last=True (train) behavior unchanged
    s = ShardedSampler(20, 24, shuffle=False, num_shards=1, shard_index=0)
    assert list(s) == []


def test_auto_augment_original_magnitude_semantics():
    """AutoAugment-'original' magnitudes follow timm's LEVEL_TO_ARG, not the
    RandAugment-'inc1' mappings (regression: Solarize severity was inverted
    and enhance ops used the 1.0 +/- 0.09*level random-sign mapping)."""
    from avjepa_tpu.data.randaugment import (
        _AA_ARG_OVERRIDES,
        auto_augment_original,
        color,
        solarize,
    )

    rng = np.random.default_rng(0)
    # timm _solarize_level_to_arg: int(mag/10 * 256) — magnitude 8 is a MILD
    # threshold 204 (inverts only near-white), magnitude 0 inverts everything
    assert _AA_ARG_OVERRIDES["Solarize"](8, rng) == 204
    assert _AA_ARG_OVERRIDES["Solarize"](0, rng) == 0
    mid_gray = np.full((1, 4, 4, 3), 100.0, np.float32)
    np.testing.assert_array_equal(solarize(mid_gray, 204), mid_gray)

    # timm _enhance_level_to_arg: deterministic mag/10*1.8 + 0.1 — the
    # policy's ("Color", 0.4, 0) is a STRONG 0.1 near-grayscale, not a no-op
    assert _AA_ARG_OVERRIDES["Color"](0, rng) == pytest.approx(0.1)
    assert _AA_ARG_OVERRIDES["Color"](10, rng) == pytest.approx(1.9)
    img = np.zeros((1, 2, 2, 3), np.float32)
    img[..., 0] = 200.0  # strongly colored
    out = color(img, 0.1)
    # factor 0.1 pulls channels toward the per-pixel gray mean (66.7)
    assert abs(out[0, 0, 0, 0] - out[0, 0, 0, 1]) < 0.12 * abs(
        img[0, 0, 0, 0] - img[0, 0, 0, 1]
    )

    # end-to-end: valid output range/shape for both image and clip inputs
    rng = np.random.default_rng(1)
    im = rng.uniform(0, 255, size=(8, 8, 3)).astype(np.float32)
    for _ in range(20):
        out = auto_augment_original(im, rng)
        assert out.shape == im.shape
        assert out.min() >= 0.0 and out.max() <= 255.0


def test_sampler_batch_valid_masks_exact_cover():
    """batch_valid_masks marks each dataset row valid EXACTLY once across
    all shards/batches (wrap-pad duplicates excluded) — the masks the evals
    use so top-1 counts every val sample once, like the reference's ragged
    torch loader (regression: padded duplicates biased small-val top-1)."""
    from avjepa_tpu.data.loader import ShardedSampler

    for n, batch, shards in [(10, 32, 1), (10, 8, 2), (50, 16, 1),
                             (20, 24, 1), (7, 4, 3), (64, 16, 2)]:
        per_row = np.zeros(n, np.int64)
        got_all = 0
        for si in range(shards):
            s = ShardedSampler(n, batch, shuffle=False, num_shards=shards,
                               shard_index=si, drop_last=False)
            batches = list(s)
            masks = list(s.batch_valid_masks())
            assert len(batches) == len(masks)
            for b, m in zip(batches, masks):
                assert b.shape == m.shape
                per_row += np.bincount(b[m], minlength=n)
                got_all += len(b)
        np.testing.assert_array_equal(per_row, np.ones(n, np.int64))
        assert got_all >= n  # pads exist whenever shapes don't divide

    # shuffled permutation orders: duplicates still only come from padding
    s = ShardedSampler(10, 8, shuffle=True, seed=3, num_shards=1,
                       shard_index=0, drop_last=False)
    s.set_epoch(2)
    rows = np.concatenate(list(s))
    valid = np.concatenate(list(s.batch_valid_masks()))
    np.testing.assert_array_equal(np.sort(rows[valid]), np.arange(10))


def test_active_platform_routing():
    """Comma-list JAX_PLATFORMS is a priority order, not a platform — cache
    routing must ask the backend; plain names pass through without backend
    init."""
    from avjepa_tpu.utils.cache_dir import active_platform, compile_cache_dir

    backend = lambda: "tpu"
    assert active_platform("tpu", None, lambda: 1 / 0) == "tpu"
    assert active_platform(None, "cpu", lambda: 1 / 0) == "cpu"
    assert active_platform(None, "tpu,cpu", backend) == "tpu"
    assert active_platform(None, None, backend) == "tpu"
    # and the resolved platform routes to the shared accelerator dir,
    # not the host-fingerprinted CPU dir
    assert compile_cache_dir("/r", active_platform(None, "tpu,cpu", backend)) \
        == "/r/.jax_cache"


def test_compose_rng_dispatch_and_warning():
    """Compose passes the seeded rng to 'rng'/'generator'-named second params
    and warns (rather than silently skipping) on other two-arg transforms."""
    import warnings

    import numpy as np

    from avjepa_tpu.data.video_transforms import Compose

    got = {}

    def takes_rng(clip, rng):
        got["rng"] = rng
        return clip

    def takes_generator(clip, generator):
        got["generator"] = generator
        return clip

    def takes_other(clip, scale=1.0):
        got["other"] = scale
        return clip

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        c = Compose([takes_rng, takes_generator, takes_other])
    assert len(w) == 1 and "scale" in str(w[0].message)
    rng = np.random.default_rng(0)
    c(np.zeros((2, 4, 4, 3), np.float32), rng)
    assert got["rng"] is rng and got["generator"] is rng
    assert got["other"] == 1.0  # called without the rng


def test_randaugment_args_match_reference_at_m7():
    """Golden per-op argument parity vs the reference's vendored timm
    LEVEL_TO_ARG at magnitude 7 with the shipped 'inc1' policy (regression:
    _MAX_LEVEL was 30 instead of 10, applying every op at 1/3 severity and
    making Posterize a literal no-op at m7)."""
    import random as _pyrandom
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        ra = pytest.importorskip("src.datasets.utils.video.randaugment")
    finally:
        sys.path.remove("/root/reference")

    from avjepa_tpu.data.randaugment import OPS

    # our OPS name -> the reference's increasing-severity ('inc1') entry,
    # i.e. _RAND_INCREASING_TRANSFORMS (reference randaugment.py:391-407)
    ref_name = {
        "Rotate": "Rotate",
        "Posterize": "PosterizeIncreasing",
        "Solarize": "SolarizeIncreasing",
        "SolarizeAdd": "SolarizeAdd",
        "Color": "ColorIncreasing",
        "Contrast": "ContrastIncreasing",
        "Brightness": "BrightnessIncreasing",
        "Sharpness": "SharpnessIncreasing",
        "ShearX": "ShearX",
        "ShearY": "ShearY",
        "TranslateX": "TranslateXRel",
        "TranslateY": "TranslateYRel",
    }
    hparams = {"translate_const": 250, "translate_pct": 0.45}
    enhance = {"Color", "Contrast", "Brightness", "Sharpness"}
    signed = {"Rotate", "ShearX", "ShearY", "TranslateX", "TranslateY"}

    for m in (0.0, 3.0, 7.0, 10.0):
        for name, _fn, arg_fn in OPS:
            if name not in ref_name:  # AutoContrast/Equalize/Invert: no arg
                continue
            _pyrandom.seed(0)
            (want,) = ra.LEVEL_TO_ARG[ref_name[name]](m, hparams)
            rng = np.random.default_rng(0)
            got = arg_fn(m, rng)
            if name in enhance:
                # both are 1.0 +/- m/10*0.9 with an independent random sign
                assert abs(got - 1.0) == pytest.approx(abs(want - 1.0)), name
            elif name in signed:
                assert abs(got) == pytest.approx(abs(want)), (name, m)
            else:
                assert got == want, (name, m, got, want)

    # Posterize is no longer a no-op at m7: 2 kept bits actually quantize
    from avjepa_tpu.data.randaugment import posterize

    arg = dict((n, f) for n, _o, f in OPS)["Posterize"](
        7.0, np.random.default_rng(0)
    )
    assert arg == 2
    ramp = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    out = posterize(ramp, arg)
    assert set(np.unique(out)) == {0.0, 64.0, 128.0, 192.0}
