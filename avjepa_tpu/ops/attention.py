"""Attention dispatch: XLA reference path and Pallas flash path.

The reference uses torch SDPA / cuDNN flash kernels
(reference: src/models/utils/modules.py:61-78). Here attention is a pure
function over ``[B, H, N, Dh]`` tensors with an optional *key validity mask*
``[B, N]`` — the dense-mask equivalent of the reference's token removal:
masked keys are excluded from the softmax, so outputs at valid query positions
are bit-for-bit the same math as running on the compacted sequence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Masked scaled-dot-product attention, XLA path.

    Args:
      q, k, v: ``[B, H, N, Dh]`` (q may have different N than k/v).
      key_mask: optional ``[B, Nk]`` bool; False keys are excluded.
      scale: softmax scale; defaults to ``Dh ** -0.5``.
    """
    dh = q.shape[-1]
    if scale is None:
        scale = dh**-0.5
    # accumulate logits in f32 for bf16 inputs (matches torch SDPA behavior)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """Dispatch between the XLA einsum path and the Pallas flash kernel."""
    if impl == "flash":
        from avjepa_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, key_mask=key_mask, scale=scale)
    return xla_attention(q, k, v, key_mask=key_mask, scale=scale)
