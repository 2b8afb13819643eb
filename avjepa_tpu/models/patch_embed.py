"""Patchification (tokenizer) modules.

TPU-native: non-overlapping (stride == kernel) patch convs are expressed as
an explicit patchify (reshape/transpose) followed by ONE large matmul on the
MXU. XLA's conv lowering for channels-last 3-channel inputs pads the input
channel dim to the 128-lane tile (43x waste for RGB) and implements the
filter-gradient as a giant spatial convolution — the matmul form makes the
forward, dX and dW all plain [BN, K] x [K, D] dots (measured: the conv form
was ~12% of the ViT-L train step; see BENCH.md).

Raster order is (t, h, w) for video and (h, w) for audio — matching the
reference's flatten order (reference: src/models/utils/patch_embed.py:51-102).
Param trees are identical to the previous nn.Conv modules (`proj/kernel` of
shape [t, ph, pw, c, D]), so checkpoints are interchangeable.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from avjepa_tpu.models.modules import clipped_normal_init


class _PatchProj(nn.Module):
    """Dense over flattened patches with a conv-shaped kernel param.

    kernel: [*patch_dims, in_ch, D] (identical to nn.Conv) reshaped row-major
    to [K, D] — this matches the row-major flattening of each patch below, so
    weights are bit-for-bit interchangeable with the conv formulation.
    """

    kernel_shape: tuple
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xf):  # xf: [B, N, K]
        kernel = self.param("kernel", clipped_normal_init(), self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(-1, self.features).astype(self.dtype)
        return xf.astype(self.dtype) @ w + bias.astype(self.dtype)


def _patchify_2d(x, p):
    """[B, H, W, C] -> [B, H/p * W/p, p*p*C] (row-major within each patch)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def _patchify_3d(x, t, p):
    """[B, T, H, W, C] -> [B, T/t * H/p * W/p, t*p*p*C]."""
    b, T, h, w, c = x.shape
    x = x.reshape(b, T // t, t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (T // t) * (h // p) * (w // p), t * p * p * c)


class VideoPatchEmbed3D(nn.Module):
    """Tubelet embed: [B, T, H, W, 3] -> [B, T'·H'·W', D]."""

    embed_dim: int
    patch_size: int = 16
    tubelet_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        xf = _patchify_3d(x, self.tubelet_size, self.patch_size)
        return _PatchProj(
            kernel_shape=(self.tubelet_size, self.patch_size, self.patch_size,
                          c, self.embed_dim),
            features=self.embed_dim,
            dtype=self.dtype,
            name="proj",
        )(xf)


class ImagePatchEmbed(nn.Module):
    """Patch embed: [B, H, W, C] -> [B, H'·W', D]."""

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        xf = _patchify_2d(x, self.patch_size)
        return _PatchProj(
            kernel_shape=(self.patch_size, self.patch_size, c, self.embed_dim),
            features=self.embed_dim,
            dtype=self.dtype,
            name="proj",
        )(xf)


class AudioPatchEmbed(nn.Module):
    """Spectrogram embed: [B, Hs, Ws, 1] -> [B, Hs'·Ws', D].

    Reference: AudioVisionPatchEmbed3D's audio stream
    (src/models/utils/patch_embed.py:85-102).
    """

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y):
        c = y.shape[-1]
        yf = _patchify_2d(y, self.patch_size)
        return _PatchProj(
            kernel_shape=(self.patch_size, self.patch_size, c, self.embed_dim),
            features=self.embed_dim,
            dtype=self.dtype,
            name="proj",
        )(yf)
