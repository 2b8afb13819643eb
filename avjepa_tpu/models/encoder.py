"""The unified encoder: one class covers the reference's AudioVisionTransformer,
VisionTransformer (video-only), and image ViT
(reference: src/models/audiovision_transformer.py:25-371,
src/models/vision_transformer.py).

Masking is dense: ``key_mask`` is a ``[B, N]`` bool of tokens the encoder may
attend to; tokens outside the mask are excluded from every softmax, which is
mathematically identical to the reference's token removal (LN and MLP are
per-token) while keeping all shapes static for XLA.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp
import flax.linen as nn

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models import pos_embed as pe
from avjepa_tpu.models.modules import Block
from avjepa_tpu.models.patch_embed import (
    AudioPatchEmbed,
    ImagePatchEmbed,
    VideoPatchEmbed3D,
)


class _ScanBlock(Block):
    """Block with a scan-compatible (carry, output) signature.

    The carry rides FLAT ([B*N, C]): the scan's per-layer residual stack is
    saved for the backward pass, and XLA stores a 3D [B, N, C] stack
    physically transposed (minor dim = B) to suit the backward dW dots —
    whose T(8,128) padding inflated a 351 MB predictor stack to 1.83 GB
    (observed HBM OOM). In 2D both orientations are 128-aligned.
    """

    seq_len: int = 0

    @nn.compact
    def __call__(self, x, key_mask=None):  # type: ignore[override]
        c = x.shape[-1]
        x = x.reshape(-1, self.seq_len, c)
        out = super().__call__(x, key_mask=key_mask)
        return out.reshape(-1, c), None


class BlockStack(nn.Module):
    """Depth-stacked transformer blocks via nn.scan (fast compiles, remat-able).

    Params are stacked along a leading depth axis — this is the TPU-idiomatic
    layout (one compiled block body, XLA loops over layers), unlike the
    reference's ModuleList of distinct layers.
    """

    depth: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    ln_eps: float = 1e-6
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x, key_mask=None):
        block_cls = _ScanBlock
        if self.remat:
            import os

            import jax

            names = ["attn_out", "attn_lse"]
            # extended policies: also save the fc1 ("mlp") and/or qkv
            # ("dots") projections so the backward recomputes fewer dots
            # (only LN/gelu VPU sweeps remain under "dots"). Costs 4*D /
            # 7*D bytes/token/layer of HBM ("dots" OOMs the ViT-L b24
            # pretrain step: 16.9G > 15.75G — see BENCH.md).
            extra = os.environ.get("AVJEPA_REMAT_SAVE", "")
            if extra in ("mlp", "dots"):
                names += ["mlp_pre"]
            if extra in ("qkv", "dots"):
                names += ["qkv_out"]
            block_cls = nn.remat(
                _ScanBlock,
                prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(*names),
            )
        import os

        # Perf experiment knobs (see BENCH.md): partially unrolling the layer
        # scan lets XLA fuse the backward's per-layer dW dynamic-update-slice
        # writes across iterations; _split_transpose runs the scan transpose
        # as two loops, decoupling dW stacking from activation-grad flow.
        unroll = int(os.environ.get("AVJEPA_SCAN_UNROLL", "1"))
        split_t = os.environ.get("AVJEPA_SCAN_SPLIT_TRANSPOSE", "0") == "1"
        scanned = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=self.depth,
            unroll=unroll,
            _split_transpose=split_t,
        )(
            dim=self.dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ln_eps=self.ln_eps,
            gelu=self.gelu,
            seq_len=x.shape[1],
            name="layers",
        )
        b, n, c = x.shape
        x2, _ = scanned(x.reshape(b * n, c), key_mask)
        return x2.reshape(b, n, c)


class Encoder(nn.Module):
    """JEPA encoder over a (video, audio) token sequence.

    Modes (by layout):
      - AV:          video tokens + audio tokens        (avjepa app)
      - video-only:  layout.audio_enabled = False        (vjepa app, video evals)
      - image:       layout.num_frames == 1              (image evals)
    """

    layout: TokenLayout
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    uniform_power: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    ln_eps: float = 1e-6
    gelu: str = "exact"

    def _video_pos_embed(self) -> np.ndarray:
        lo = self.layout
        if lo.num_frames > 1:
            return pe.sincos_3d(
                self.embed_dim, lo.h_grid, lo.t_grid, uniform_power=self.uniform_power
            )
        return pe.sincos_2d(self.embed_dim, lo.h_grid)

    def _audio_pos_embed(self) -> np.ndarray:
        lo = self.layout
        return pe.sincos_2d_rect(self.embed_dim, lo.ha_grid, lo.wa_grid)

    @nn.compact
    def __call__(
        self,
        video: jnp.ndarray,
        audio: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        gather_idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """video: [B, T, H, W, 3] (or [B, H, W, C] image); audio: [B, Hs, Ws, 1].

        key_mask: [B, N] bool over the combined token sequence (or over the
        *compacted* sequence when gather_idx is given), or None (all tokens
        valid — the target-encoder path).

        gather_idx: optional [B, K] int32 — compacted-context mode: after
        patchification + pos embed, only these token positions enter the
        transformer (K is bucket-padded; out-of-range sentinel entries are
        clamped for the gather and must be marked invalid in key_mask). This
        is the performance analog of the reference's physical token removal
        (reference: src/masks/utils.py apply_masks gather), with static
        bucketed shapes.

        Returns [B, N, D] (dense) or [B, K, D] (compacted); invalid positions
        contain finite garbage that callers must mask out.
        """
        lo = self.layout
        is_video = lo.num_frames > 1

        if is_video:
            tokens_v = VideoPatchEmbed3D(
                embed_dim=self.embed_dim,
                patch_size=lo.patch_size,
                tubelet_size=lo.tubelet_size,
                dtype=self.dtype,
                name="patch_embed_v",
            )(video)
        else:
            tokens_v = ImagePatchEmbed(
                embed_dim=self.embed_dim,
                patch_size=lo.patch_size,
                dtype=self.dtype,
                name="patch_embed_v",
            )(video)

        vpe = jnp.asarray(self._video_pos_embed(), dtype=self.dtype)
        if tokens_v.shape[1] != vpe.shape[0]:
            # off-native resolution: trilinear/bicubic pos-embed interpolation
            # (reference: audiovision_transformer.py:241-290)
            t_in = video.shape[1] // lo.tubelet_size if is_video else 1
            h_in = video.shape[2 if is_video else 1] // lo.patch_size
            w_in = video.shape[3 if is_video else 2] // lo.patch_size
            if is_video:
                vpe = pe.interpolate_video_pos_embed(
                    vpe, (lo.t_grid, lo.h_grid, lo.w_grid), (t_in, h_in, w_in)
                )
            else:
                vpe = pe.interpolate_image_pos_embed(
                    vpe, (lo.h_grid, lo.w_grid), (h_in, w_in)
                )
        tokens_v = tokens_v + vpe[None]

        if lo.audio_enabled:
            assert audio is not None, "layout has audio enabled but no audio given"
            tokens_a = AudioPatchEmbed(
                embed_dim=self.embed_dim,
                patch_size=lo.patch_size,
                dtype=self.dtype,
                name="patch_embed_a",
            )(audio)
            ape = jnp.asarray(self._audio_pos_embed(), dtype=self.dtype)
            tokens_a = tokens_a + ape[None]
            x = jnp.concatenate([tokens_v, tokens_a], axis=1)
        else:
            x = tokens_v

        if gather_idx is not None:
            safe = jnp.minimum(gather_idx, x.shape[1] - 1)
            x = jnp.take_along_axis(x, safe[..., None], axis=1)

        x = BlockStack(
            depth=self.depth,
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            ln_eps=self.ln_eps,
            gelu=self.gelu,
            name="blocks",
        )(x, key_mask=key_mask)

        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm")(x)
        return x
