"""Model factory: named ViT sizes, parameter init, and the per-layer rescale.

Size table matches the reference constructors
(reference: src/models/audiovision_transformer.py:313-371):

    vit_tiny 192/12/3 · vit_small 384/12/6 · vit_base 768/12/12 ·
    vit_large 1024/24/16 · vit_huge 1280/32/16 · vit_giant 1408/40/16 (mlp 48/11) ·
    vit_gigantic 1664/48/16 (mlp 64/13, patch 14)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models.encoder import Encoder
from avjepa_tpu.models.predictor import Predictor


@dataclasses.dataclass(frozen=True)
class VitSpec:
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    patch_size: int = 16


VIT_SPECS: dict[str, VitSpec] = {
    "vit_tiny": VitSpec(192, 12, 3),
    "vit_small": VitSpec(384, 12, 6),
    "vit_base": VitSpec(768, 12, 12),
    "vit_large": VitSpec(1024, 24, 16),
    "vit_huge": VitSpec(1280, 32, 16),
    "vit_giant": VitSpec(1408, 40, 16, mlp_ratio=48 / 11),
    "vit_gigantic": VitSpec(1664, 48, 16, mlp_ratio=64 / 13, patch_size=14),
}

VIT_EMBED_DIMS = {k: v.embed_dim for k, v in VIT_SPECS.items()}


def make_encoder(
    model_name: str,
    layout: TokenLayout,
    uniform_power: bool = False,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    remat: bool = False,
    gelu: str = "tanh",
) -> Encoder:
    spec = VIT_SPECS[model_name]
    return Encoder(
        layout=layout,
        embed_dim=spec.embed_dim,
        depth=spec.depth,
        num_heads=spec.num_heads,
        mlp_ratio=spec.mlp_ratio,
        uniform_power=uniform_power,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        gelu=gelu,
    )


def make_predictor(
    model_name: str,
    layout: TokenLayout,
    pred_depth: int = 6,
    pred_embed_dim: int = 384,
    uniform_power: bool = False,
    use_mask_tokens: bool = True,
    num_mask_tokens: int = 2,
    zero_init_mask_tokens: bool = True,
    dtype: jnp.dtype = jnp.float32,
    attn_impl: str = "xla",
    remat: bool = False,
    gelu: str = "tanh",
) -> Predictor:
    spec = VIT_SPECS[model_name]
    return Predictor(
        layout=layout,
        embed_dim=spec.embed_dim,
        predictor_embed_dim=pred_embed_dim,
        depth=pred_depth,
        num_heads=spec.num_heads,
        mlp_ratio=4.0,
        uniform_power=uniform_power,
        use_mask_tokens=use_mask_tokens,
        num_mask_tokens=num_mask_tokens,
        zero_init_mask_tokens=zero_init_mask_tokens,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        gelu=gelu,
    )


def _rescale_block_stack(params: dict) -> dict:
    """Divide attn-out and mlp-out kernels of layer i by sqrt(2·(i+1)).

    Reference: _rescale_blocks (audiovision_transformer.py:172-178). Our block
    params are depth-stacked (leading axis = layer), so this is one broadcasted
    divide per kernel.
    """
    layers = params["blocks"]["layers"]
    depth = layers["attn"]["proj"]["kernel"].shape[0]
    factors = jnp.sqrt(2.0 * (jnp.arange(depth, dtype=jnp.float32) + 1.0))
    shape = (depth,) + (1,) * (layers["attn"]["proj"]["kernel"].ndim - 1)
    f = factors.reshape(shape)
    layers["attn"]["proj"]["kernel"] = layers["attn"]["proj"]["kernel"] / f
    layers["mlp"]["fc2"]["kernel"] = layers["mlp"]["fc2"]["kernel"] / f
    return params


def init_encoder_params(module: Encoder, rng: jax.Array) -> Any:
    lo = module.layout
    if lo.num_frames > 1:
        video = jnp.zeros((1, lo.num_frames, lo.crop_size, lo.crop_size, 3), jnp.float32)
    else:
        video = jnp.zeros((1, lo.crop_size, lo.crop_size, 3), jnp.float32)
    audio = (
        jnp.zeros((1, lo.spec_height, lo.spec_width, 1), jnp.float32)
        if lo.audio_enabled
        else None
    )
    def init_fn(rng):
        p = module.init(rng, video, audio)["params"]
        return _rescale_block_stack(p)

    return jax.jit(init_fn)(rng)


def init_predictor_params(module: Predictor, rng: jax.Array) -> Any:
    lo = module.layout
    ctx = jnp.zeros((1, lo.num_tokens, module.embed_dim), jnp.float32)
    mask = jnp.ones((1, lo.num_tokens), bool)
    kwargs = {}
    if not module.use_mask_tokens:
        # diffusion-fallback predictor traces the target/noise path at init
        kwargs = {"target": ctx, "noise_rng": jax.random.key(0)}

    def init_fn(rng):
        p = module.init(rng, ctx, mask, mask, 0, **kwargs)["params"]
        return _rescale_block_stack(p)

    return jax.jit(init_fn)(rng)


def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
