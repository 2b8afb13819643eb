"""Patchification (tokenizer) modules.

TPU-native: channels-last convolutions (XLA maps these onto the MXU), raster
order (t, h, w) for video and (h, w) for audio — matching the reference's
flatten order (reference: src/models/utils/patch_embed.py:51-102).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from avjepa_tpu.models.modules import clipped_normal_init


class VideoPatchEmbed3D(nn.Module):
    """Conv3d tubelet embed: [B, T, H, W, 3] -> [B, T'·H'·W', D]."""

    embed_dim: int
    patch_size: int = 16
    tubelet_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.tubelet_size, self.patch_size, self.patch_size),
            strides=(self.tubelet_size, self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=clipped_normal_init(),
            name="proj",
        )(x)
        return x.reshape(b, -1, self.embed_dim)


class ImagePatchEmbed(nn.Module):
    """Conv2d patch embed: [B, H, W, C] -> [B, H'·W', D]."""

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=clipped_normal_init(),
            name="proj",
        )(x)
        return x.reshape(b, -1, self.embed_dim)


class AudioPatchEmbed(nn.Module):
    """Conv2d spectrogram embed: [B, Hs, Ws, 1] -> [B, Hs'·Ws', D].

    Reference: AudioVisionPatchEmbed3D's audio stream
    (src/models/utils/patch_embed.py:85-102).
    """

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        b = y.shape[0]
        y = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=clipped_normal_init(),
            name="proj",
        )(y)
        return y.reshape(b, -1, self.embed_dim)
