"""Transformer primitives shared by every model in the framework.

One implementation of Attention / MLP / Block / CrossAttention serves the AV
encoder, the video-only encoder, both predictors, and the probes — the
reference instead carries four near-identical ViT copies
(reference: src/models/utils/modules.py:13-183).

Design notes (TPU-first):
- ``key_mask`` (dense ``[B, N]`` bool) replaces the reference's token-removal
  masking: invalid keys are excluded from the softmax, which is mathematically
  identical to running attention on the compacted sequence, but keeps all
  shapes static for XLA.
- compute dtype is configurable (bf16 by default on TPU); params stay f32.
- attention dispatches to a Pallas flash kernel via ``attn_impl='flash'``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from avjepa_tpu.ops.attention import attention
from avjepa_tpu.ops.flash_attention import flash_attention_qkv, packed_qkv_eligible
from avjepa_tpu.ops.layer_norm import layer_norm


class FastLayerNorm(nn.Module):
    """nn.LayerNorm-compatible module backed by the Pallas LN kernel
    (avjepa_tpu/ops/layer_norm.py): same param tree ("scale"/"bias"), f32
    statistics, fixed row-major operand layouts.

    Not used by the flagship Block: profiled on the ViT-L pretrain step, the
    XLA-fused LN is marginally faster there (the round-1 42%-MFU fc-dot layout
    problem was fixed by the packed-qkv kernel, so the layout barrier buys
    nothing). Available for models whose LN regions do get bad layouts."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, self.epsilon)


def clipped_normal_init(std: float = 0.02, lo: float = -2.0, hi: float = 2.0):
    """Normal(0, std) clipped to absolute bounds [lo, hi].

    Matches the reference trunc_normal_ semantics (timm convention: bounds are
    absolute, i.e. +/-100 sigma at std=0.02 — effectively a plain normal).
    """

    def init(key, shape, dtype=jnp.float32):
        import jax

        x = jax.random.normal(key, shape, jnp.float32) * std
        return jnp.clip(x, lo, hi).astype(dtype)

    return init


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = clipped_normal_init()
    # 'exact' bit-matches torch nn.GELU (default); 'tanh' is the TPU-fast
    # approximation (XLA expands erf into a long branchy f32 polynomial)
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, kernel_init=self.kernel_init, name="fc1"
        )(x)
        # named so an extended remat policy ("mlp_pre") can save the fc1
        # output: the backward then skips the fc1 dot recompute and gets the
        # gelu-bwd input for free (gelu itself is one cheap VPU recompute)
        x = checkpoint_name(x, "mlp_pre")
        x = nn.gelu(x, approximate=self.gelu == "tanh")
        x = nn.Dense(
            out_dim, dtype=self.dtype, kernel_init=self.kernel_init, name="fc2"
        )(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    kernel_init: Callable = clipped_normal_init()

    @nn.compact
    def __call__(self, x, key_mask=None):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            self.dim * 3,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="qkv",
        )(x)
        # named so an extended remat policy ("qkv_out") can save the fused
        # qkv projection — it is also the flash kernel's vjp residual, so
        # saving it removes the qkv dot recompute from the backward
        qkv = checkpoint_name(qkv, "qkv_out")
        if self.attn_impl == "flash" and packed_qkv_eligible(self.num_heads, head_dim):
            # packed path: the kernel reads the fused qkv output in place and
            # emits [B, N, C] straight into the projection — no moveaxis
            # relayouts, and no transposed layouts leaking into the MLP dots
            out = flash_attention_qkv(
                qkv, self.num_heads, key_mask=key_mask, scale=self.qk_scale
            ).astype(self.dtype)
        else:
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
            q, k, v = (
                jnp.moveaxis(qkv[:, :, 0], 1, 2),
                jnp.moveaxis(qkv[:, :, 1], 1, 2),
                jnp.moveaxis(qkv[:, :, 2], 1, 2),
            )  # [B, H, N, Dh]
            out = attention(
                q, k, v, key_mask=key_mask, scale=self.qk_scale, impl=self.attn_impl
            )
            # named for the remat policy: saving attention outputs means the
            # backward pass never recomputes the (VPU-bound) softmax
            out = checkpoint_name(out, "attn_out")
            out = jnp.moveaxis(out, 1, 2).reshape(b, n, c).astype(self.dtype)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=self.kernel_init, name="proj"
        )(out)
        return out


class Block(nn.Module):
    """Pre-LN residual transformer block (reference: modules.py:81-120)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    ln_eps: float = 1e-6
    gelu: str = "exact"

    @nn.compact
    def __call__(self, x, key_mask=None):
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(y, key_mask=key_mask)
        x = x + y
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=int(self.dim * self.mlp_ratio),
            dtype=self.dtype,
            gelu=self.gelu,
            name="mlp",
        )(y)
        return x + y


class CrossAttention(nn.Module):
    """Query tokens attend over a context sequence (reference: modules.py:123-159)."""

    dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, q, x, key_mask=None):
        b, nq, c = q.shape
        nk = x.shape[1]
        head_dim = self.dim // self.num_heads
        qp = nn.Dense(
            self.dim,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=clipped_normal_init(),
            name="q",
        )(q)
        kv = nn.Dense(
            self.dim * 2,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=clipped_normal_init(),
            name="kv",
        )(x)
        qp = jnp.moveaxis(qp.reshape(b, nq, self.num_heads, head_dim), 1, 2)
        kv = kv.reshape(b, nk, 2, self.num_heads, head_dim)
        k, v = jnp.moveaxis(kv[:, :, 0], 1, 2), jnp.moveaxis(kv[:, :, 1], 1, 2)
        out = attention(qp, k, v, key_mask=key_mask, impl=self.attn_impl)
        out = jnp.moveaxis(out, 1, 2).reshape(b, nq, c).astype(self.dtype)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=clipped_normal_init(), name="proj"
        )(out)
        return out


class CrossAttentionBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, q, x, key_mask=None):
        y = CrossAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="xattn",
        )(q, nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x), key_mask=key_mask)
        q = q + y
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(q)
        q = q + Mlp(hidden_dim=int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return q
