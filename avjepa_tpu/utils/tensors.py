"""Small tensor utilities shared across the framework."""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp


def trunc_normal_np(
    rng: np.random.Generator,
    shape: tuple[int, ...],
    std: float = 0.02,
    mean: float = 0.0,
    a: float = -2.0,
    b: float = 2.0,
) -> np.ndarray:
    """Inverse-CDF truncated normal, matching the reference init semantics
    (reference: src/utils/tensors.py:17-50): ``a``/``b`` are *absolute* bounds,
    not multiples of ``std`` (timm convention).
    """

    def norm_cdf(x):
        return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

    lo = norm_cdf((a - mean) / std)
    hi = norm_cdf((b - mean) / std)
    u = rng.uniform(2 * lo - 1, 2 * hi - 1, size=shape)
    # inverse CDF via erfinv
    from scipy.special import erfinv

    x = erfinv(u)
    x = x * std * math.sqrt(2.0) + mean
    return np.clip(x, a, b).astype(np.float32)


def repeat_interleave_batch(x: jnp.ndarray, batch_size: int, repeat: int) -> jnp.ndarray:
    """Tile each consecutive batch-sized block `repeat` times along dim 0.

    Equivalent to the reference helper (src/utils/tensors.py:65-71) used to
    reuse one mask set across multiple clips per sample.
    """
    n = x.shape[0] // batch_size
    chunks = [
        jnp.concatenate([x[i * batch_size : (i + 1) * batch_size]] * repeat, axis=0)
        for i in range(n)
    ]
    return jnp.concatenate(chunks, axis=0)


def apply_masks(x: jnp.ndarray, masks, concat_batch: bool = True):
    """Index-gather masking for API parity with the reference
    (src/masks/utils.py:14-34): gather token dim by each [B, K] index array.

    concat_batch=True concatenates the per-mask results along batch (the
    reference's ``concat=True``); otherwise returns a list. The framework's
    hot path uses dense masks instead — this utility serves eval-style gathers
    and porting code written against the reference API.
    """
    if not isinstance(masks, (list, tuple)):
        masks = [masks]
    outs = [
        jnp.take_along_axis(x, m[..., None].astype(jnp.int32), axis=1)
        for m in masks
    ]
    if concat_batch:
        return jnp.concatenate(outs, axis=0)
    return outs


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None):
    """Mean of ``x`` over elements where ``mask`` (broadcastable) is True.

    The mask is broadcast to x's full shape before counting, so a [B, N, 1]
    token mask over [B, N, D] features divides by tokens*D (a true element
    mean), matching ``torch.mean`` over gathered tokens.

    An all-False mask yields 0, not NaN (an empty prediction set contributes
    zero loss instead of poisoning the step).
    """
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, 1.0)


def masked_var(x: jnp.ndarray, mask: jnp.ndarray, axis):
    """Unbiased variance over masked positions along ``axis``.

    Matches ``torch.Tensor.var`` (correction=1) applied to the compacted
    (mask-selected) elements.
    """
    m = mask.astype(x.dtype)
    count = jnp.sum(m, axis=axis, keepdims=True)
    mean = jnp.sum(x * m, axis=axis, keepdims=True) / jnp.maximum(count, 1.0)
    sq = jnp.sum((x - mean) ** 2 * m, axis=axis, keepdims=True)
    var = sq / jnp.maximum(count - 1.0, 1.0)
    return jnp.squeeze(var, axis=axis)
