"""Pallas LayerNorm kernel and matmul-patchify numerics (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from avjepa_tpu.ops.layer_norm import layer_norm


def _ref_ln(x, g, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


@pytest.mark.parametrize("shape", [(16, 256), (2, 24, 128), (8, 384)])
def test_layer_norm_forward(shape):
    key = jax.random.key(0)
    x = jax.random.normal(key, shape, jnp.float32) * 3 + 1
    g = jax.random.normal(jax.random.key(1), (shape[-1],)) * 0.1 + 1
    b = jax.random.normal(jax.random.key(2), (shape[-1],)) * 0.1
    np.testing.assert_allclose(
        layer_norm(x, g, b), _ref_ln(x, g, b), rtol=1e-5, atol=1e-5
    )


def test_layer_norm_grad():
    x = jax.random.normal(jax.random.key(3), (32, 256), jnp.float32)
    g = jnp.ones((256,)) * 1.3
    b = jnp.zeros((256,)) + 0.2
    co = jax.random.normal(jax.random.key(4), (32, 256))

    def f_kernel(x, g, b):
        return jnp.sum(layer_norm(x, g, b) * co)

    def f_ref(x, g, b):
        return jnp.sum(_ref_ln(x, g, b) * co)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, g, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(a, e, rtol=2e-4, atol=2e-5)


def test_layer_norm_fallback_odd_width():
    # C not a multiple of 128 -> jnp fallback path
    x = jax.random.normal(jax.random.key(5), (8, 100))
    g, b = jnp.ones((100,)), jnp.zeros((100,))
    np.testing.assert_allclose(layer_norm(x, g, b), _ref_ln(x, g, b), rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_flax_module():
    x = jax.random.normal(jax.random.key(6), (4, 16, 128), jnp.float32)
    m = nn.LayerNorm(epsilon=1e-6)
    p = m.init(jax.random.key(7), x)
    y_flax = m.apply(p, x)
    y_k = layer_norm(x, p["params"]["scale"], p["params"]["bias"], 1e-6)
    np.testing.assert_allclose(y_k, y_flax, rtol=1e-5, atol=1e-5)


def test_patchify_matches_conv3d():
    from avjepa_tpu.models.patch_embed import VideoPatchEmbed3D

    x = jax.random.normal(jax.random.key(8), (2, 4, 32, 32, 3))
    m = VideoPatchEmbed3D(embed_dim=64, patch_size=16, tubelet_size=2)
    p = m.init(jax.random.key(9), x)
    y = m.apply(p, x)
    conv = nn.Conv(features=64, kernel_size=(2, 16, 16), strides=(2, 16, 16),
                   padding="VALID")
    cp = {"params": dict(p["params"]["proj"])}
    yc = conv.apply(cp, x).reshape(2, -1, 64)
    np.testing.assert_allclose(y, yc, rtol=1e-4, atol=1e-5)


def test_patchify_matches_conv2d():
    from avjepa_tpu.models.patch_embed import AudioPatchEmbed

    a = jax.random.normal(jax.random.key(10), (2, 32, 48, 1))
    m = AudioPatchEmbed(embed_dim=64, patch_size=16)
    p = m.init(jax.random.key(11), a)
    y = m.apply(p, a)
    conv = nn.Conv(features=64, kernel_size=(16, 16), strides=(16, 16),
                   padding="VALID")
    yc = conv.apply({"params": dict(p["params"]["proj"])}, a).reshape(2, -1, 64)
    np.testing.assert_allclose(y, yc, rtol=1e-4, atol=1e-5)
