"""tools/convert_reference_checkpoint.py: a reference-style .pth.tar becomes
an Orbax checkpoint our pretrain resume path loads, with weights identical to
the golden-parity bridge conversion."""

import functools
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_bridge import import_reference

FRAMES, CROP, PATCH, TUBELET = 4, 64, 16, 2
# vit_tiny geometry (VIT_SPECS): embed 192, depth 12, heads 3
EMBED, DEPTH, HEADS = 192, 12, 3
PRED_EMBED, PRED_DEPTH = 96, 2


def _make_cfg(tmp_path):
    from avjepa_tpu.config import load_config

    return load_config(
        {
            "app": "avjepa",
            "data": {
                "dataset_type": "audiovideodataset",
                "source": "synthetic",
                "batch_size": 2,
                "num_frames": FRAMES,
                "tubelet_size": TUBELET,
                "crop_size": CROP,
                "patch_size": PATCH,
                "num_workers": 0,
            },
            "mask": [
                {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
                 "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]},
            ],
            "meta": {"seed": 0, "dtype": "float32"},
            "model": {
                "model_name": "vit_tiny",
                "pred_depth": PRED_DEPTH,
                "pred_embed_dim": PRED_EMBED,
                "uniform_power": True,
                "use_mask_tokens": True,
            },
            "optimization": {"ipe": 5, "epochs": 4, "warmup": 1},
            "logging": {"folder": str(tmp_path / "logs"), "write_tag": "conv"},
            "tpu": {"remat": False, "attn_impl": "xla"},
        }
    )


def test_convert_reference_checkpoint(tmp_path):
    import torch.nn as tnn

    ref_avt, ref_avp = import_reference()
    torch.manual_seed(0)
    enc = ref_avt.AudioVisionTransformer(
        img_size=CROP, patch_size=PATCH, num_frames=FRAMES, tubelet_size=TUBELET,
        embed_dim=EMBED, depth=DEPTH, num_heads=HEADS, uniform_power=True,
        norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6),
    )
    tgt = ref_avt.AudioVisionTransformer(
        img_size=CROP, patch_size=PATCH, num_frames=FRAMES, tubelet_size=TUBELET,
        embed_dim=EMBED, depth=DEPTH, num_heads=HEADS, uniform_power=True,
        norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6),
    )
    pred = ref_avp.AudioVisionTransformerPredictor(
        img_size=CROP, patch_size=PATCH, num_frames=FRAMES, tubelet_size=TUBELET,
        embed_dim=EMBED, predictor_embed_dim=PRED_EMBED, depth=PRED_DEPTH,
        num_heads=HEADS, uniform_power=True, use_mask_tokens=True,
        num_mask_tokens=1,
        norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6),
    )

    ckpt_path = str(tmp_path / "ref-latest.pth.tar")
    torch.save(
        {
            # DataParallel-style prefixes must be stripped by the converter
            "encoder": {"module." + k: v for k, v in enc.state_dict().items()},
            "predictor": pred.state_dict(),
            "target_encoder": tgt.state_dict(),
            "epoch": 3,
            "loss": 0.5,
            "batch_size": 2,
            "world_size": 1,
        },
        ckpt_path,
    )

    cfg = _make_cfg(tmp_path)
    import yaml

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {
                "app": "avjepa",
                "data": {
                    "dataset_type": "audiovideodataset", "source": "synthetic",
                    "batch_size": 2, "num_frames": FRAMES,
                    "tubelet_size": TUBELET, "crop_size": CROP,
                    "patch_size": PATCH, "num_workers": 0,
                },
                "mask": [
                    {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
                     "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]},
                ],
                "meta": {"seed": 0, "dtype": "float32"},
                "model": {
                    "model_name": "vit_tiny", "pred_depth": PRED_DEPTH,
                    "pred_embed_dim": PRED_EMBED, "uniform_power": True,
                    "use_mask_tokens": True,
                },
                "optimization": {"ipe": 5, "epochs": 4, "warmup": 1},
                "logging": {"folder": str(tmp_path / "logs"), "write_tag": "conv"},
                "tpu": {"remat": False, "attn_impl": "xla"},
            },
            f,
        )

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_reference_checkpoint import convert

    ckpt_dir = convert(ckpt_path, cfg_path, None, None)
    assert os.path.isdir(os.path.join(ckpt_dir, "15"))  # epoch 3 * ipe 5

    # restore through the framework's own manager and compare against the
    # golden-parity bridge conversion of the same torch modules
    import jax
    from avjepa_tpu.train import pretrain
    from avjepa_tpu.utils.checkpoint import CheckpointManager
    from reference_bridge import torch_encoder_to_params, torch_predictor_to_params

    handles = pretrain.setup(cfg)
    like = jax.device_get(handles.state)
    mngr = CheckpointManager(ckpt_dir)
    restored = mngr.restore(like)
    mngr.close()
    assert int(restored.step) == 15

    want_enc = torch_encoder_to_params(enc, DEPTH)
    want_tgt = torch_encoder_to_params(tgt, DEPTH)
    want_pred = torch_predictor_to_params(pred, PRED_DEPTH)

    def assert_trees_equal(a, b, path=""):
        if isinstance(b, dict):
            for k in b:
                assert_trees_equal(a[k], b[k], f"{path}.{k}")
        else:
            b = np.asarray(b, np.float32)
            # the framework allocates max(2, len(mask)) mask tokens; the
            # reference checkpoint's rows land first, extras stay at init
            a = np.asarray(a, np.float32)[tuple(slice(s) for s in b.shape)]
            np.testing.assert_array_equal(a, b, err_msg=path)

    assert_trees_equal(restored.enc_params, want_enc)
    assert_trees_equal(restored.target_params, want_tgt)
    assert_trees_equal(restored.pred_params, want_pred)


def test_export_roundtrip():
    """params -> reference state dict -> params is the identity."""
    from avjepa_tpu.utils.torch_import import (
        encoder_params_from_state_dict,
        encoder_params_to_state_dict,
        predictor_params_from_state_dict,
        predictor_params_to_state_dict,
    )
    import jax
    from avjepa_tpu.layout import TokenLayout
    from avjepa_tpu.models import init_encoder_params, make_encoder, make_predictor

    layout = TokenLayout(
        num_frames=FRAMES, crop_size=CROP, patch_size=PATCH, tubelet_size=TUBELET
    )
    enc = make_encoder("vit_tiny", layout, uniform_power=True)
    params = jax.device_get(init_encoder_params(enc, jax.random.key(0)))
    rt = encoder_params_from_state_dict(encoder_params_to_state_dict(params))
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, rt)

    pred = make_predictor(
        "vit_tiny", layout, pred_depth=PRED_DEPTH, pred_embed_dim=PRED_EMBED,
        num_mask_tokens=1,
    )
    import jax.numpy as jnp

    d = jnp.zeros((1, layout.num_tokens, enc.embed_dim))
    m = jnp.ones((1, layout.num_tokens), bool)
    midx = jnp.zeros((1,), jnp.int32)  # per-sample mask-token index
    pp = jax.device_get(
        jax.jit(pred.init)(jax.random.key(1), d, m, m, midx)["params"]
    )
    rt = predictor_params_from_state_dict(predictor_params_to_state_dict(pp))
    jax.tree_util.tree_map(np.testing.assert_array_equal, pp, rt)
