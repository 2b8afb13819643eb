"""Fixed sinusoidal positional embeddings (numpy, computed once at trace time).

Behavioral parity with the reference generators
(reference: src/models/utils/pos_embs.py:11-117):

- 1D sincos
- 2D square grid (``[h, w]`` meshgrid order, h-emb then w-emb halves)
- 2D rectangular grid (the 8x12 audio raster)
- 3D grid with either a D/4-D/4-D/2 split or ``uniform_power`` split of
  ``ceil(D/6)*2`` per axis, truncated to ``embed_dim``

plus JAX trilinear/bicubic interpolation for off-native resolutions
(reference: src/models/audiovision_transformer.py:241-290).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sincos_1d_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] sin/cos features."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_1d(embed_dim: int, grid_size: int) -> np.ndarray:
    return sincos_1d_from_grid(embed_dim, np.arange(grid_size, dtype=np.float64))


def sincos_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    """Square grid, row-major [h, w] order."""
    return sincos_2d_rect(embed_dim, grid_size, grid_size)


def sincos_2d_rect(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Rectangular grid (used for the audio spectrogram raster).

    Matches reference get_2d_sincos_pos_embed_xy (pos_embs.py:65-81): first half
    of channels encode the row coordinate, second half the column coordinate.
    """
    h = np.arange(grid_h, dtype=np.float64)
    w = np.arange(grid_w, dtype=np.float64)
    ww, hh = np.meshgrid(w, h)  # index as [h, w]
    emb_h = sincos_1d_from_grid(embed_dim // 2, hh)
    emb_w = sincos_1d_from_grid(embed_dim // 2, ww)
    return np.concatenate([emb_h, emb_w], axis=1)


def sincos_3d(
    embed_dim: int,
    grid_size: int,
    grid_depth: int,
    uniform_power: bool = False,
) -> np.ndarray:
    """[T*H*W, embed_dim] with [d, h, w] raster order.

    Matches reference get_3d_sincos_pos_embed (pos_embs.py:11-44) including the
    channel concat order (depth, height, width) and the truncation to embed_dim
    when uniform_power rounds the per-axis dims up.
    """
    d = np.arange(grid_depth, dtype=np.float64)
    h = np.arange(grid_size, dtype=np.float64)
    w = np.arange(grid_size, dtype=np.float64)
    hh, dd, ww = np.meshgrid(h, d, w)  # index as [d, h, w]

    if not uniform_power:
        h_dim = embed_dim // 4
        w_dim = embed_dim // 4
        d_dim = embed_dim // 2
    else:
        h_dim = w_dim = d_dim = int(np.ceil(embed_dim / 6) * 2)

    emb_h = sincos_1d_from_grid(h_dim, hh)
    emb_w = sincos_1d_from_grid(w_dim, ww)
    emb_d = sincos_1d_from_grid(d_dim, dd)
    pos = np.concatenate([emb_d, emb_h, emb_w], axis=1)
    return pos[:, :embed_dim]


def interpolate_video_pos_embed(
    pos_embed: jnp.ndarray,
    src_grid: tuple[int, int, int],
    dst_grid: tuple[int, int, int],
) -> jnp.ndarray:
    """Trilinear resize of a [N, D] video pos-embed between (T, H, W) grids.

    TPU-native equivalent of the torch F.interpolate(trilinear) path
    (reference: src/models/audiovision_transformer.py:241-272); uses
    jax.image.resize which XLA lowers to gathers/matmuls.
    """
    if src_grid == dst_grid:
        return pos_embed
    d = pos_embed.shape[-1]
    grid = pos_embed.reshape(*src_grid, d)
    out = jax.image.resize(grid, (*dst_grid, d), method="trilinear")
    return out.reshape(-1, d)


def interpolate_image_pos_embed(
    pos_embed: jnp.ndarray,
    src_grid: tuple[int, int],
    dst_grid: tuple[int, int],
) -> jnp.ndarray:
    """Bicubic resize of a [N, D] image pos-embed between (H, W) grids."""
    if src_grid == dst_grid:
        return pos_embed
    d = pos_embed.shape[-1]
    grid = pos_embed.reshape(*src_grid, d)
    out = jax.image.resize(grid, (*dst_grid, d), method="bicubic")
    return out.reshape(-1, d)
