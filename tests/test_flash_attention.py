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


def test_packed_qkv_matches_classic():
    """flash_attention_qkv (packed lanes, fused qkv input) vs the reference
    XLA attention: same math, both masked and unmasked, fwd and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from avjepa_tpu.ops.attention import xla_attention
    from avjepa_tpu.ops.flash_attention import flash_attention_qkv

    rng = np.random.default_rng(3)
    b, n, h, d = 2, 256, 4, 32  # hpb = 4
    c = h * d
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * c)), jnp.float32)
    mask = rng.random((b, n)) < 0.8
    mask[:, 0] = True
    mask_j = jnp.asarray(mask)

    def split(qkv):
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        to4 = lambda t: jnp.moveaxis(t.reshape(b, n, h, d), 1, 2)
        return to4(q), to4(k), to4(v)

    def packed(qkv, m):
        return flash_attention_qkv(qkv, h, key_mask=m)

    def classic(qkv, m):
        q, k, v = split(qkv)
        out = xla_attention(q, k, v, key_mask=m)
        return jnp.moveaxis(out, 1, 2).reshape(b, n, c)

    for m in (None, mask_j):
        out_p = jax.jit(lambda x: packed(x, m))(qkv)
        out_c = jax.jit(lambda x: classic(x, m))(qkv)
        valid = np.ones((b, n, 1), bool) if m is None else np.asarray(m)[..., None]
        diff = np.abs(np.asarray(out_p - out_c)) * valid
        assert diff.max() < 2e-5, diff.max()

        # the loss reads only valid query rows, as real callers do: outputs
        # at invalid rows are don't-care (XLA produces uniform-attention
        # garbage there, the packed kernel produces exact zeros), so no
        # gradient may flow from them
        vj = jnp.asarray(valid)
        g_p = jax.jit(jax.grad(lambda x: jnp.sum(jnp.where(vj, packed(x, m), 0.0) ** 2)))(qkv)
        g_c = jax.jit(jax.grad(lambda x: jnp.sum(jnp.where(vj, classic(x, m), 0.0) ** 2)))(qkv)
        gdiff = np.abs(np.asarray(g_p - g_c))
        assert gdiff.max() < 2e-4, gdiff.max()


def test_packed_qkv_saturated_logits():
    """Logits above SOFTMAX_CLAMP: the forward saturates (clamped softmax)
    and the backward must match the gradient of that clamped function —
    clamped logits get zero gradient, unclamped ones the standard formula
    with the actual (clamp-normalized) probabilities."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from avjepa_tpu.ops.flash_attention import SOFTMAX_CLAMP, flash_attention_qkv

    b, n, h, d = 1, 128, 4, 32
    c = h * d
    rng = np.random.default_rng(7)
    qkv = np.asarray(rng.normal(size=(b, n, 3 * c)), np.float32)
    # blow up a few q rows so several logits per row cross the clamp
    qkv[:, :8, :c] *= 40.0
    qkv = jnp.asarray(qkv)

    def ref_np(qkv64):
        """float64 numpy reference: saturated rows (one p ~ 1) make the f32
        autodiff softmax-quotient backward catastrophically cancel, so the
        comparison baseline must be f64 (verified: the kernel's
        ds = p*(dp - dO.O) formulation matches f64 autodiff to ~1e-6 in f32,
        while f32 autodiff of this same function is off by O(10))."""
        q = qkv64[..., :c].reshape(b, n, h, d)
        k = qkv64[..., c:2 * c].reshape(b, n, h, d)
        v = qkv64[..., 2 * c:].reshape(b, n, h, d)
        s = np.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
        s = np.minimum(s, SOFTMAX_CLAMP)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        o = np.einsum("bhqk,bkhd->bqhd", p, v)
        # gradient of sum(o**2)
        do = 2 * o
        dp = np.einsum("bqhd,bkhd->bhqk", do, v)
        dv = np.einsum("bhqk,bqhd->bkhd", p, do)
        delta = (p * dp).sum(-1, keepdims=True)
        ds = np.where(s < SOFTMAX_CLAMP, p * (dp - delta), 0.0) * (d ** -0.5)
        dq = np.einsum("bhqk,bkhd->bqhd", ds, k)
        dk = np.einsum("bhqk,bqhd->bkhd", ds, q)
        grad = np.concatenate(
            [dq.reshape(b, n, c), dk.reshape(b, n, c), dv.reshape(b, n, c)], -1
        )
        return o.reshape(b, n, c), grad

    exp_out, exp_grad = ref_np(np.asarray(qkv, np.float64))
    out = flash_attention_qkv(qkv, h)
    assert np.abs(np.asarray(out, np.float64) - exp_out).max() < 5e-5

    g1 = np.asarray(
        jax.grad(lambda x: jnp.sum(flash_attention_qkv(x, h) ** 2))(qkv),
        np.float64,
    )
    # relative tolerance: boosted rows make gradient magnitudes O(100)
    gerr = np.abs(g1 - exp_grad) / (1.0 + np.abs(exp_grad))
    assert gerr.max() < 1e-3, gerr.max()


def test_packed_qkv_pads_n():
    import jax.numpy as jnp
    import numpy as np
    from avjepa_tpu.ops.attention import xla_attention
    from avjepa_tpu.ops.flash_attention import flash_attention_qkv

    rng = np.random.default_rng(4)
    b, n, h, d = 1, 200, 2, 64  # n not a multiple of 128
    c = h * d
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * c)), jnp.float32)
    out = flash_attention_qkv(qkv, h)
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    to4 = lambda t: jnp.moveaxis(t.reshape(b, n, h, d), 1, 2)
    ref = jnp.moveaxis(xla_attention(to4(q), to4(k), to4(v)), 1, 2).reshape(b, n, c)
    assert np.abs(np.asarray(out - ref)).max() < 2e-5


def test_packed_qkv_odd_head_dim():
    """head_dim 24 (the ViT-L predictor: 384 wide, 16 heads) packs into
    384-lane head groups."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from avjepa_tpu.ops.attention import xla_attention
    from avjepa_tpu.ops.flash_attention import flash_attention_qkv, packed_qkv_eligible

    b, n, h, d = 2, 256, 16, 24
    assert packed_qkv_eligible(h, d)
    c = h * d
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * c)), jnp.float32)
    m = rng.random((b, n)) < 0.8
    m[:, 0] = True
    mask = jnp.asarray(m)

    out = flash_attention_qkv(qkv, h, key_mask=mask)
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    to4 = lambda t: jnp.moveaxis(t.reshape(b, n, h, d), 1, 2)
    ref = jnp.moveaxis(
        xla_attention(to4(q), to4(k), to4(v), key_mask=mask), 1, 2
    ).reshape(b, n, c)
    diff = np.abs(np.asarray(out - ref)) * np.asarray(m)[..., None]
    assert diff.max() < 2e-5, diff.max()

    # loss over valid query rows only (invalid rows are don't-care; see
    # test_packed_qkv_matches_classic)
    vj = jnp.asarray(m)[..., None]
    g1 = jax.grad(lambda x: jnp.sum(
        jnp.where(vj, flash_attention_qkv(x, h, key_mask=mask), 0.0) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(jnp.where(
        vj,
        jnp.moveaxis(xla_attention(to4(x[..., :c]), to4(x[..., c:2*c]), to4(x[..., 2*c:]),
                                   key_mask=mask), 1, 2).reshape(b, n, c), 0.0) ** 2))(qkv)
    gdiff = np.abs(np.asarray(g1 - g2))
    assert gdiff.max() < 2e-4, gdiff.max()
