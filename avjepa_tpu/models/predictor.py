"""The narrow JEPA predictor (dense-mask formulation).

Covers the reference's AudioVisionTransformerPredictor and the video-only
VisionTransformerPredictor (reference: src/models/audiovisionpredictor.py:18-308,
src/models/predictor.py:176-246).

Dense formulation: the predictor runs over the *full* token raster. Each
position is either
  - a context token (encoder output projected to predictor width),
  - a prediction target (learnable per-mask-config mask token), or
  - invalid (excluded from attention; possible because the collator's
    min-keep truncation drops indices — reference: src/masks/avmultiblock3d.py:222-232).
Positional embeddings are added to every position. Attention uses the
enc|pred validity key-mask, so valid outputs equal the reference's compacted
[ctx_v, pred_v, ctx_a, pred_a] sequence (attention is permutation-equivariant
and the reference's Block ignores its mask argument — masking there is by
token removal).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models import pos_embed as pe
from avjepa_tpu.models.encoder import BlockStack
from avjepa_tpu.models.modules import clipped_normal_init


class Predictor(nn.Module):
    layout: TokenLayout
    embed_dim: int = 768  # encoder width
    predictor_embed_dim: int = 384
    depth: int = 6
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    uniform_power: bool = False
    use_mask_tokens: bool = True
    num_mask_tokens: int = 2
    zero_init_mask_tokens: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    ln_eps: float = 1e-6
    gelu: str = "exact"

    @nn.compact
    def __call__(
        self,
        ctx: jnp.ndarray,
        enc_mask: jnp.ndarray,
        pred_mask: jnp.ndarray,
        mask_index: int = 0,
        target: Optional[jnp.ndarray] = None,
        noise_rng: Optional[jnp.ndarray] = None,
        gather_idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """ctx: [B, N, D] dense encoder output; enc_mask/pred_mask: [B, N] bool.

        With ``use_mask_tokens=False`` the target positions are seeded from
        noised target embeddings instead of learnable mask tokens (the
        reference's forward-diffusion fallback,
        src/models/audiovisionpredictor.py:182-200,244-249): ``target`` is the
        dense [B, N, D] target-encoder output and ``noise_rng`` a PRNG key.

        gather_idx: optional [B, Ku] int32 ascending enc∪pred indices
        (sentinel N padding) — the compacted-predictor fast path. The dense
        head (embed, mask-token fill, pos embeds — ~1% of predictor FLOPs)
        still runs at full N; the transformer blocks and output projection
        (everything expensive) run only over the Ku kept positions, and the
        result is scattered back to the dense raster. Identical math: tokens
        outside enc∪pred are excluded from attention by key_mask on the dense
        path anyway, and attention is permutation-equivariant.

        Returns [B, N, D] dense predictions (valid only at pred_mask positions).
        """
        lo = self.layout
        nv = lo.num_video_tokens
        dp = self.predictor_embed_dim

        mt_init = (
            nn.initializers.zeros if self.zero_init_mask_tokens else clipped_normal_init()
        )

        def pick_token(table, index):
            # mask_index may be a static int (one config) or a per-sample
            # [B] array (both mask configs batched through one predictor
            # call — see train/step.py); returns a broadcastable fill value
            if isinstance(index, int):
                return table[index % self.num_mask_tokens].astype(self.dtype)[None, None, :]
            return table[index % self.num_mask_tokens].astype(self.dtype)[:, None, :]

        def _diffuse(x, rng, steps=1000, noise_beta=(0.5, 1.0)):
            # forward-diffusion target noising (reference :182-200)
            b1, b2 = noise_beta
            betas = b1 + jnp.arange(steps, dtype=jnp.float32) * (b2 - b1) / steps
            alphas = jnp.cumprod(1.0 - betas)
            rt, rn = jax.random.split(rng)
            t = jax.random.randint(rt, (x.shape[0],), 0, steps)
            alpha = alphas[t][:, None, None]
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            noise = jax.random.normal(rn, x.shape, jnp.float32).astype(x.dtype)
            return jnp.sqrt(alpha) * xn + jnp.sqrt(1.0 - alpha) * noise

        # --- video stream ---
        embed_v = nn.Dense(
            dp, dtype=self.dtype, kernel_init=clipped_normal_init(), name="embed_v"
        )
        x_v = embed_v(ctx[:, :nv])
        if self.use_mask_tokens:
            mask_tokens_v = self.param(
                "mask_tokens_v", mt_init, (self.num_mask_tokens, dp), jnp.float32
            )
            x_v = jnp.where(
                pred_mask[:, :nv, None], pick_token(mask_tokens_v, mask_index), x_v
            )
        else:
            assert target is not None and noise_rng is not None, (
                "use_mask_tokens=False requires target embeddings + noise_rng "
                "(diffusion fallback)"
            )
            rv, ra = jax.random.split(noise_rng)
            noised_v = _diffuse(embed_v(target[:, :nv]), rv)
            x_v = jnp.where(pred_mask[:, :nv, None], noised_v, x_v)
        vpe = (
            pe.sincos_3d(dp, lo.h_grid, lo.t_grid, uniform_power=self.uniform_power)
            if lo.num_frames > 1
            else pe.sincos_2d(dp, lo.h_grid)
        )
        x_v = x_v + jnp.asarray(vpe, dtype=self.dtype)[None]

        # --- audio stream ---
        if lo.audio_enabled:
            embed_a = nn.Dense(
                dp, dtype=self.dtype, kernel_init=clipped_normal_init(), name="embed_a"
            )
            x_a = embed_a(ctx[:, nv:])
            if self.use_mask_tokens:
                mask_tokens_a = self.param(
                    "mask_tokens_a", mt_init, (self.num_mask_tokens, dp), jnp.float32
                )
                x_a = jnp.where(
                    pred_mask[:, nv:, None], pick_token(mask_tokens_a, mask_index), x_a
                )
            else:
                noised_a = _diffuse(embed_a(target[:, nv:]), ra)
                x_a = jnp.where(pred_mask[:, nv:, None], noised_a, x_a)
            ape = pe.sincos_2d_rect(dp, lo.ha_grid, lo.wa_grid)
            x_a = x_a + jnp.asarray(ape, dtype=self.dtype)[None]
            x = jnp.concatenate([x_v, x_a], axis=1)
        else:
            x = x_v

        key_mask = jnp.logical_or(enc_mask, pred_mask)

        n = x.shape[1]
        if gather_idx is not None:
            # compact: keep only enc∪pred positions for the block stack
            safe = jnp.minimum(gather_idx, n - 1)
            x = jnp.take_along_axis(x, safe[..., None], axis=1)
            key_mask = jnp.logical_and(
                jnp.take_along_axis(key_mask, safe, axis=1), gather_idx < n
            )

        x = BlockStack(
            depth=self.depth,
            dim=dp,
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
        x = nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=clipped_normal_init(), name="proj"
        )(x)
        if gather_idx is not None:
            b = x.shape[0]
            dense = jnp.zeros((b, n, self.embed_dim), x.dtype)
            # vmapped per-row scatter (NOT dense.at[iota[:,None], idx]): the
            # explicit-iota form hides the batch dim in the index *values*,
            # which GSPMD cannot partition — it replicated this [B,N,D]
            # buffer on every chip and all-reduced it (2.6 GB/step/device at
            # ViT-L data=8). The vmap form lowers to a scatter with operand
            # batching dims, which stays batch-sharded.
            x = jax.vmap(lambda d, i, u: d.at[i].set(u, mode="drop"))(
                dense, gather_idx, x
            )
        return x
