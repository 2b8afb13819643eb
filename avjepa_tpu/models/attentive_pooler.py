"""Attentive pooler / classifier — the frozen-backbone eval probe.

Reference: src/models/attentive_pooler.py:21-136. Learnable query token(s)
cross-attend over the frozen encoder's token sequence; optional extra
self-attention depth; linear head.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from avjepa_tpu.models.modules import (
    Block,
    CrossAttention,
    CrossAttentionBlock,
    clipped_normal_init,
)


class AttentivePooler(nn.Module):
    embed_dim: int = 768
    num_queries: int = 1
    num_heads: int = 12
    mlp_ratio: float = 4.0
    depth: int = 1
    qkv_bias: bool = True
    complete_block: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_mask: Optional[jnp.ndarray] = None):
        b = x.shape[0]
        q = self.param(
            "query_tokens",
            clipped_normal_init(),
            (1, self.num_queries, self.embed_dim),
            jnp.float32,
        )
        q = jnp.broadcast_to(q, (b, self.num_queries, self.embed_dim)).astype(self.dtype)
        if self.complete_block:
            q = CrossAttentionBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name="cross_attention_block",
            )(q, x, key_mask=key_mask)
        else:
            q = CrossAttention(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name="cross_attention",
            )(q, x, key_mask=key_mask)
        for i in range(self.depth - 1):
            q = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )(q)
        return q


class AttentiveClassifier(nn.Module):
    embed_dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    depth: int = 1
    qkv_bias: bool = True
    num_classes: int = 1000
    complete_block: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_mask: Optional[jnp.ndarray] = None):
        q = AttentivePooler(
            embed_dim=self.embed_dim,
            num_queries=1,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            depth=self.depth,
            qkv_bias=self.qkv_bias,
            complete_block=self.complete_block,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="pooler",
        )(x, key_mask=key_mask)
        q = q[:, 0]
        return nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=clipped_normal_init(),
            name="linear",
        )(q)
