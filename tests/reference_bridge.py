"""Golden-parity bridge: load the reference PyTorch models (read-only from
/root/reference) and convert their weights into our JAX param pytrees.

This is a *test harness only* — the framework itself never imports torch or the
reference code.
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"


def import_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models.audiovision_transformer as ref_avt  # noqa
    import src.models.audiovisionpredictor as ref_avp  # noqa

    return ref_avt, ref_avp


def disable_sdpa(module):
    """Force the manual softmax path (the CUDA SDPA context fails on CPU)."""
    for m in module.modules():
        if hasattr(m, "use_sdpa"):
            m.use_sdpa = False


def t2n(t):
    return t.detach().cpu().numpy()


def torch_encoder_to_params(ref_model, depth: int) -> dict:
    """Map reference AudioVisionTransformer weights -> our Encoder params."""
    sd = ref_model.state_dict()

    def stack(fmt, post=lambda x: x):
        return np.stack([post(t2n(sd[fmt.format(i=i)])) for i in range(depth)])

    params = {
        "patch_embed_v": {
            "proj": {
                # torch Conv3d [D, C, t, kh, kw] -> flax [t, kh, kw, C, D]
                "kernel": t2n(sd["patch_embed.proj.weight"]).transpose(2, 3, 4, 1, 0),
                "bias": t2n(sd["patch_embed.proj.bias"]),
            }
        },
        "patch_embed_a": {
            "proj": {
                # torch Conv2d [D, 1, kh, kw] -> flax [kh, kw, 1, D]
                "kernel": t2n(sd["patch_embed.audio_proj.weight"]).transpose(2, 3, 1, 0),
                "bias": t2n(sd["patch_embed.audio_proj.bias"]),
            }
        },
        "blocks": {
            "layers": {
                "norm1": {
                    "scale": stack("blocks.{i}.norm1.weight"),
                    "bias": stack("blocks.{i}.norm1.bias"),
                },
                "attn": {
                    "qkv": {
                        "kernel": stack("blocks.{i}.attn.qkv.weight", lambda x: x.T),
                        "bias": stack("blocks.{i}.attn.qkv.bias"),
                    },
                    "proj": {
                        "kernel": stack("blocks.{i}.attn.proj.weight", lambda x: x.T),
                        "bias": stack("blocks.{i}.attn.proj.bias"),
                    },
                },
                "norm2": {
                    "scale": stack("blocks.{i}.norm2.weight"),
                    "bias": stack("blocks.{i}.norm2.bias"),
                },
                "mlp": {
                    "fc1": {
                        "kernel": stack("blocks.{i}.mlp.fc1.weight", lambda x: x.T),
                        "bias": stack("blocks.{i}.mlp.fc1.bias"),
                    },
                    "fc2": {
                        "kernel": stack("blocks.{i}.mlp.fc2.weight", lambda x: x.T),
                        "bias": stack("blocks.{i}.mlp.fc2.bias"),
                    },
                },
            }
        },
        "norm": {"scale": t2n(sd["norm.weight"]), "bias": t2n(sd["norm.bias"])},
    }
    return params


def torch_predictor_to_params(ref_model, depth: int) -> dict:
    sd = ref_model.state_dict()

    def stack(fmt, post=lambda x: x):
        return np.stack([post(t2n(sd[fmt.format(i=i)])) for i in range(depth)])

    num_mt = ref_model.num_mask_tokens
    params = {
        "embed_v": {
            "kernel": t2n(sd["predictor_embed_v.weight"]).T,
            "bias": t2n(sd["predictor_embed_v.bias"]),
        },
        "embed_a": {
            "kernel": t2n(sd["predictor_embed_a.weight"]).T,
            "bias": t2n(sd["predictor_embed_a.bias"]),
        },
        "mask_tokens_v": np.concatenate(
            [t2n(sd[f"mask_tokens_v.{j}"]).reshape(1, -1) for j in range(num_mt)]
        ),
        "mask_tokens_a": np.concatenate(
            [t2n(sd[f"mask_tokens_a.{j}"]).reshape(1, -1) for j in range(num_mt)]
        ),
        "blocks": {
            "layers": {
                "norm1": {
                    "scale": stack("predictor_blocks.{i}.norm1.weight"),
                    "bias": stack("predictor_blocks.{i}.norm1.bias"),
                },
                "attn": {
                    "qkv": {
                        "kernel": stack(
                            "predictor_blocks.{i}.attn.qkv.weight", lambda x: x.T
                        ),
                        "bias": stack("predictor_blocks.{i}.attn.qkv.bias"),
                    },
                    "proj": {
                        "kernel": stack(
                            "predictor_blocks.{i}.attn.proj.weight", lambda x: x.T
                        ),
                        "bias": stack("predictor_blocks.{i}.attn.proj.bias"),
                    },
                },
                "norm2": {
                    "scale": stack("predictor_blocks.{i}.norm2.weight"),
                    "bias": stack("predictor_blocks.{i}.norm2.bias"),
                },
                "mlp": {
                    "fc1": {
                        "kernel": stack(
                            "predictor_blocks.{i}.mlp.fc1.weight", lambda x: x.T
                        ),
                        "bias": stack("predictor_blocks.{i}.mlp.fc1.bias"),
                    },
                    "fc2": {
                        "kernel": stack(
                            "predictor_blocks.{i}.mlp.fc2.weight", lambda x: x.T
                        ),
                        "bias": stack("predictor_blocks.{i}.mlp.fc2.bias"),
                    },
                },
            }
        },
        "norm": {
            "scale": t2n(sd["predictor_norm.weight"]),
            "bias": t2n(sd["predictor_norm.bias"]),
        },
        "proj": {
            "kernel": t2n(sd["predictor_proj.weight"]).T,
            "bias": t2n(sd["predictor_proj.bias"]),
        },
    }
    return params
