"""The extract app (frozen-encoder feature extraction / serving path).

TPU-build extension — the reference has no inference entry point; these
tests cover: end-to-end CLI-shaped runs (synthetic + real media files),
determinism of the eval transform path, wrap-padded-tail dedup, checkpoint
loading into the extractor, and the 'tokens' chunked output mode.
"""

import json
import os

import numpy as np
import pytest


from avjepa_tpu.registry import app_main


def _cfg(folder, **over):
    d = {
        "app": "extract",
        "meta": {"seed": 11, "dtype": "float32"},
        "data": {
            "source": "synthetic",
            "dataset_type": "audiovideodataset",
            "batch_size": 4,
            "num_frames": 4,
            "tubelet_size": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 2,
        },
        "model": {"model_name": "vit_tiny"},
        "extract": {"pooling": "mean", "allow_random": True, "limit": 10},
        "logging": {"folder": folder, "write_tag": "x"},
    }
    for k, v in over.items():
        d[k] = {**d.get(k, {}), **v} if isinstance(v, dict) else v
    return d


def test_extract_synthetic_mean(tmp_path):
    out = app_main("extract", _cfg(str(tmp_path)))
    # limit=10 with batch 4 -> 3 batches (12 rows incl. 2 wrap-padded dups),
    # but exactly 10 unique rows written
    assert out["rows_written"] == 10 and out["rows_total"] == 10
    z = np.load(os.path.join(out["output"], "features_r0.npz"))
    assert z["embeddings"].shape == (10, 192)  # vit_tiny embed_dim
    assert sorted(z["indices"].tolist()) == list(range(10))
    assert np.all(np.isfinite(z["embeddings"]))
    # mean-pooled + feature-LN'd embeddings are not degenerate
    assert z["embeddings"].std() > 0
    idx_csv = open(os.path.join(out["output"], "index_r0.csv")).read()
    assert idx_csv.count("\n") == 11  # header + 10 rows
    summary = json.load(open(os.path.join(out["output"], "summary_r0.json")))
    assert summary["pooling"] == "mean" and summary["dim"] == 192


def test_extract_tokens_chunks(tmp_path):
    d = _cfg(str(tmp_path))
    d["extract"] = {
        "pooling": "tokens", "allow_random": True, "limit": 6, "chunk_rows": 4,
    }
    out = app_main("extract", d)
    assert out["rows_written"] == 6
    files = sorted(
        f for f in os.listdir(out["output"]) if f.startswith("tokens_r0_")
    )
    assert len(files) == 2  # 4 + 2 rows
    rows = 0
    for f in files:
        z = np.load(os.path.join(out["output"], f))
        n_tok = z["embeddings"].shape[1]
        assert z["embeddings"].shape[2] == 192
        rows += len(z["indices"])
    # 2x2 spatial x 2 temporal video grid + 8x12 audio grid
    assert n_tok == 8 + 96
    assert rows == 6


def test_extract_requires_checkpoint(tmp_path):
    d = _cfg(str(tmp_path))
    d["extract"] = {"pooling": "mean"}  # no allow_random, no checkpoint
    with pytest.raises(ValueError, match="read_checkpoint"):
        app_main("extract", d)


def test_extract_real_files_deterministic(tmp_path):
    from avjepa_tpu.data.video_decoder import write_test_video

    media = tmp_path / "media"
    media.mkdir()
    csv = tmp_path / "list.csv"
    with open(csv, "w") as f:
        for i in range(3):
            p = str(media / f"clip{i}.avi")
            # vary geometry so the clips have genuinely different content
            # (the test-pattern generator's frames don't depend on n_frames)
            write_test_video(p, n_frames=24 + 8 * i, w=64 + 16 * i, h=48,
                             fps=25.0, with_audio=True)
            f.write(f"{p} {i}\n")

    d = _cfg(str(tmp_path / "run1"))
    d["data"] = {
        "source": "files",
        "dataset_type": "audiovideodataset",
        "datasets": [str(csv)],
        "batch_size": 2,
        "num_frames": 4,
        "tubelet_size": 2,
        "sampling_rate": 2,
        "crop_size": 32,
        "patch_size": 16,
        "num_workers": 1,
    }
    d["extract"] = {"pooling": "mean", "allow_random": True}
    out1 = app_main("extract", d)
    d2 = dict(d)
    d2["logging"] = {"folder": str(tmp_path / "run2"), "write_tag": "x"}
    out2 = app_main("extract", d2)
    z1 = np.load(os.path.join(out1["output"], "features_r0.npz"))
    z2 = np.load(os.path.join(out2["output"], "features_r0.npz"))
    assert z1["embeddings"].shape == (3, 192)
    # deterministic transform + encoder -> identical embeddings run-to-run
    np.testing.assert_array_equal(z1["embeddings"], z2["embeddings"])
    # distinct clips -> distinct embeddings
    assert not np.allclose(z1["embeddings"][0], z1["embeddings"][1])
    idx = open(os.path.join(out1["output"], "index_r0.csv")).read().splitlines()
    assert idx[1].endswith(",0") and "clip0.avi" in idx[1]


def test_extract_from_pretrain_checkpoint(tmp_path):
    """A pretrain checkpoint's target encoder loads into the extractor and
    changes the embeddings vs a random encoder."""
    from avjepa_tpu.train import pretrain

    pcfg = (
        {
            "app": "avjepa",
            "meta": {"seed": 5, "dtype": "float32"},
            "data": {
                "source": "synthetic",
                "batch_size": 2,
                "num_frames": 4,
                "tubelet_size": 2,
                "crop_size": 32,
                "patch_size": 16,
                "num_workers": 1,
            },
            "model": {
                "model_name": "vit_tiny", "pred_depth": 2, "pred_embed_dim": 48,
            },
            "optimization": {"ipe": 2, "epochs": 1, "warmup": 1},
            "mask": [
                {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
                 "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]},
            ],
            "logging": {"folder": str(tmp_path / "pt"), "write_tag": "t"},
        }
    )
    pretrain.main(pcfg)
    ckpt = os.path.join(str(tmp_path / "pt"), "t-ckpt")
    assert os.path.isdir(ckpt)

    base = _cfg(str(tmp_path / "rand"))
    base["extract"]["limit"] = 4
    out_rand = app_main("extract", base)

    loaded = _cfg(str(tmp_path / "loaded"))
    loaded["extract"] = {"pooling": "mean", "limit": 4}
    loaded["meta"] = {"seed": 11, "dtype": "float32", "read_checkpoint": ckpt}
    out_ck = app_main("extract", loaded)

    zr = np.load(os.path.join(out_rand["output"], "features_r0.npz"))
    zc = np.load(os.path.join(out_ck["output"], "features_r0.npz"))
    assert zr["embeddings"].shape == zc["embeddings"].shape
    assert not np.allclose(zr["embeddings"], zc["embeddings"])


def test_extract_mean_spills_chunks_beyond_chunk_rows(tmp_path):
    """Mean mode must not accumulate the whole run in host memory: a run
    larger than one chunk spills features_r0_{k}.npz chunks (and does NOT
    write the single-file name); all rows still covered exactly once."""
    d = _cfg(str(tmp_path))
    d["extract"] = {
        "pooling": "mean", "allow_random": True, "limit": 10, "chunk_rows": 4,
    }
    out = app_main("extract", d)
    assert out["rows_written"] == 10
    assert not os.path.exists(os.path.join(out["output"], "features_r0.npz"))
    files = sorted(
        f for f in os.listdir(out["output"]) if f.startswith("features_r0_")
    )
    assert len(files) == 3  # 4 + 4 + 2 rows
    idxs = []
    for f in files:
        z = np.load(os.path.join(out["output"], f))
        assert z["embeddings"].shape[1] == 192
        assert len(z["indices"]) <= 4
        idxs.extend(z["indices"].tolist())
    assert sorted(idxs) == list(range(10))


def test_extract_mean_exact_chunk_keeps_single_file(tmp_path):
    """A run that fits exactly one chunk keeps the documented single-file
    features_r0.npz format (sorted indices)."""
    d = _cfg(str(tmp_path))
    d["extract"] = {
        "pooling": "mean", "allow_random": True, "limit": 8, "chunk_rows": 8,
    }
    out = app_main("extract", d)
    assert out["rows_written"] == 8
    z = np.load(os.path.join(out["output"], "features_r0.npz"))
    assert z["indices"].tolist() == list(range(8))
    assert z["embeddings"].shape == (8, 192)


def test_extract_reports_dropped_rows(tmp_path):
    """A permanently undecodable file must not vanish silently: the loader's
    retry-resample substitutes a different clip (deduplicated on write), and
    extract names the dropped row in missing_r{rank}.csv + the summary."""
    from avjepa_tpu.data.video_decoder import write_test_video

    media = tmp_path / "media"
    media.mkdir()
    csv = tmp_path / "list.csv"
    with open(csv, "w") as f:
        for i in range(3):
            p = str(media / f"clip{i}.avi")
            if i == 1:
                with open(p, "wb") as g:
                    g.write(b"garbage, not a container")
            else:
                write_test_video(p, n_frames=24, w=64, h=48, fps=25.0,
                                 with_audio=True)
            f.write(f"{p} {i}\n")

    d = _cfg(str(tmp_path / "run"))
    d["data"] = {
        "source": "files",
        "dataset_type": "audiovideodataset",
        "datasets": [str(csv)],
        "batch_size": 2,
        "num_frames": 4,
        "tubelet_size": 2,
        "sampling_rate": 2,
        "crop_size": 32,
        "patch_size": 16,
        "num_workers": 1,
    }
    d["extract"] = {"pooling": "mean", "allow_random": True}
    out = app_main("extract", d)
    assert out["rows_written"] == 2 and out["rows_missing"] == 1
    missing = open(os.path.join(out["output"], "missing_r0.csv")).read()
    assert "clip1.avi" in missing
    z = np.load(os.path.join(out["output"], "features_r0.npz"))
    assert sorted(z["indices"].tolist()) == [0, 2]
