"""Flash-attention kernel numerics vs the XLA reference path (interpret mode
on CPU; the same kernels compile on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avjepa_tpu.ops.attention import xla_attention
from avjepa_tpu.ops.flash_attention import flash_attention

B, H, N, D = 2, 3, 256, 32


def make_qkv(seed=0, n=N, d=D):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, n, d)), jnp.float32)
    return q, k, v


def test_forward_matches_xla_unmasked():
    q, k, v = make_qkv()
    ref = xla_attention(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_matches_xla_masked():
    q, k, v = make_qkv(1)
    rng = np.random.default_rng(2)
    mask = rng.random((B, N)) < 0.6
    mask[:, :4] = True  # guarantee some valid keys
    # make one whole 128-block invalid to exercise block skipping
    mask[0, 128:256] = False
    mj = jnp.asarray(mask)
    ref = xla_attention(q, k, v, key_mask=mj)
    out = jax.jit(flash_attention)(q, k, v, key_mask=mj)
    valid = np.asarray(mask)
    # compare only at valid query rows (invalid rows are don't-care)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, valid[b]], np.asarray(ref)[b, :, valid[b]],
            rtol=2e-5, atol=2e-5,
        )


def test_gradients_match_xla():
    q, k, v = make_qkv(3)
    rng = np.random.default_rng(4)
    mask = rng.random((B, N)) < 0.7
    mask[:, :8] = True
    mj = jnp.asarray(mask)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, key_mask=mj)
        return jnp.sum(jnp.where(mj[:, None, :, None], out, 0.0) ** 2)

    def loss_xla(q, k, v):
        out = xla_attention(q, k, v, key_mask=mj)
        return jnp.sum(jnp.where(mj[:, None, :, None], out, 0.0) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_fallback_odd_shapes():
    # N=100 not divisible by 128 -> must silently use the XLA path
    q, k, v = make_qkv(5, n=100)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_bf16_forward():
    q, k, v = make_qkv(6)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    ref = xla_attention(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )
