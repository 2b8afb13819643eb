"""Mask collator semantics tests (dense static-shape invariants)."""

import numpy as np

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.masks import AVMaskCollator, MaskCollator, RandomTubeCollator
from avjepa_tpu.masks.multiblock3d import make_mask_collator

LAYOUT = TokenLayout()  # full 1568 + 96

CFGS = [
    {"aspect_ratio": [0.75, 1.5], "num_blocks": 8, "spatial_scale": [0.15, 0.15],
     "temporal_scale": [1.0, 1.0], "max_temporal_keep": 1.0},
    {"aspect_ratio": [0.75, 1.5], "num_blocks": 2, "spatial_scale": [0.7, 0.7],
     "temporal_scale": [1.0, 1.0], "max_temporal_keep": 1.0},
]


def test_av_collator_shapes_and_disjointness():
    coll = AVMaskCollator(CFGS, LAYOUT, base_seed=0)
    masks = coll(batch_size=4)
    assert len(masks) == 2
    for ms in masks:
        assert ms.enc.shape == (4, LAYOUT.num_tokens)
        assert ms.pred.shape == (4, LAYOUT.num_tokens)
        # context and targets disjoint
        assert not np.any(ms.enc & ms.pred)
        # nonempty context and targets, video and audio both
        nv = LAYOUT.num_video_tokens
        assert ms.enc[:, :nv].sum(1).min() > 0
        assert ms.pred[:, :nv].sum(1).min() > 0
        assert ms.enc[:, nv:].sum(1).min() > 0
        assert ms.pred[:, nv:].sum(1).min() > 0


def test_min_keep_truncation_equalizes_counts():
    """Reference truncation: every sample keeps exactly the batch-min count."""
    coll = AVMaskCollator(CFGS, LAYOUT, base_seed=1)
    for ms in coll(batch_size=6):
        nv = LAYOUT.num_video_tokens
        for part in (ms.enc[:, :nv], ms.pred[:, :nv], ms.enc[:, nv:], ms.pred[:, nv:]):
            counts = part.sum(axis=1)
            assert np.all(counts == counts[0]), counts


def test_counter_reproducibility_and_stepping():
    c1 = AVMaskCollator(CFGS, LAYOUT, base_seed=5)
    c2 = AVMaskCollator(CFGS, LAYOUT, base_seed=5)
    m1 = c1(batch_size=3)
    m2 = c2(batch_size=3)
    for a, b in zip(m1, m2):
        np.testing.assert_array_equal(a.enc, b.enc)
        np.testing.assert_array_equal(a.pred, b.pred)
    # different step -> different masks
    m3 = c1(batch_size=3)
    assert any(not np.array_equal(a.enc, b.enc) for a, b in zip(m1, m3))
    # fast-forward matches stepping
    c3 = AVMaskCollator(CFGS, LAYOUT, base_seed=5)
    c3.set_counter(0)
    m4 = c3(batch_size=3)
    for a, b in zip(m3, m4):
        np.testing.assert_array_equal(a.enc, b.enc)


def test_video_only_collator():
    lo = TokenLayout(audio_enabled=False)
    coll = MaskCollator(CFGS, lo, base_seed=0)
    for ms in coll(batch_size=2):
        assert ms.enc.shape == (2, lo.num_video_tokens)
        assert not np.any(ms.enc & ms.pred)


def test_max_keep_cap():
    cfg = [dict(CFGS[0], max_keep=100)]
    coll = AVMaskCollator(cfg, LAYOUT, base_seed=0)
    (ms,) = coll(batch_size=3)
    nv = LAYOUT.num_video_tokens
    assert ms.enc[:, :nv].sum(1).max() <= 100


def test_max_temporal_keep_clamps_context():
    cfg = [dict(CFGS[0], max_temporal_keep=0.5)]
    coll = AVMaskCollator(cfg, LAYOUT, base_seed=0)
    (ms,) = coll(batch_size=2)
    lo = LAYOUT
    # no context tokens in the second temporal half
    half = (lo.t_grid // 2) * lo.h_grid * lo.w_grid
    assert ms.enc[:, half : lo.num_video_tokens].sum() == 0


def test_random_tube_collator():
    coll = RandomTubeCollator([{"ratio": 0.9}], LAYOUT, base_seed=0)
    (ms,) = coll(batch_size=2)
    lo = LAYOUT
    keep = ms.enc[0, : lo.num_video_tokens].reshape(lo.t_grid, -1)
    # same spatial pattern at every time step
    assert np.all(keep == keep[0])
    assert keep[0].sum() == int(lo.h_grid * lo.w_grid * 0.1)


def test_dispatch():
    assert isinstance(
        make_mask_collator("multiblock3d", CFGS, LAYOUT), AVMaskCollator
    )
    lo = TokenLayout(audio_enabled=False)
    assert isinstance(make_mask_collator("multiblock3d", CFGS, lo), MaskCollator)
    assert isinstance(
        make_mask_collator("random", [{"ratio": 0.5}], lo), RandomTubeCollator
    )


def test_degenerate_full_coverage_config_terminates():
    """A block size that covers the entire raster must not hang the sampler
    (the reference's rejection loop spins forever on such configs); the
    bounded loop force-keeps one position."""
    from avjepa_tpu.layout import TokenLayout
    from avjepa_tpu.masks.multiblock3d import make_mask_collator

    lo = TokenLayout(num_frames=4, crop_size=32, patch_size=16, tubelet_size=2,
                     audio_enabled=False)
    coll = make_mask_collator(
        "multiblock3d",
        [{"aspect_ratio": [1.0, 1.0], "num_blocks": 2,
          "spatial_scale": [1.0, 1.0], "temporal_scale": [1.0, 1.0]}],
        lo, base_seed=0,
    )
    masks = coll(3)  # must return, not hang
    m = masks[0]
    assert (m.enc.sum(axis=1) >= 1).all()
    assert not np.logical_and(m.enc, m.pred).any()


def test_sticky_bucket_converges_to_one_shape():
    """OPT-IN sticky buckets: once a draw needs a larger bucket, every later
    batch pads to it, so steady-state mask churn compiles ONE step variant
    per config. Off by default — measured 16% SLOWER than per-draw buckets
    on the headline config (the monotone floor ratchets to the p99 draw's
    shape; BENCH.md round 4). Indices stay valid and pad lanes carry the
    sentinel n."""
    from avjepa_tpu.layout import DEFAULT_AV_LAYOUT
    from avjepa_tpu.masks.multiblock3d import make_mask_collator

    lo = DEFAULT_AV_LAYOUT
    coll = make_mask_collator(
        "multiblock3d",
        [{"aspect_ratio": [0.75, 1.5], "num_blocks": 8,
          "spatial_scale": [0.15, 0.15], "temporal_scale": [1.0, 1.0]},
         {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
          "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]}],
        lo, base_seed=0, sticky_buckets=True,
    )
    n = lo.num_tokens
    shapes = []
    for _ in range(20):
        msets = coll(4)
        shapes.append(tuple(m.union_idx.shape[1] for m in msets))
        for m in msets:
            # sentinel-padded, ascending real indices within [0, n]
            assert m.union_idx.max() <= n
            assert m.enc_idx.max() <= n
    # monotone non-decreasing per config, and the tail is constant
    for ci in range(2):
        ks = [s[ci] for s in shapes]
        assert all(a <= b for a, b in zip(ks, ks[1:])), ks
    assert shapes[-1] == shapes[-5] == shapes[-10], shapes
