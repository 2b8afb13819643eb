"""Pallas TPU LayerNorm (forward + backward custom VJP).

Why a kernel for something XLA fuses anyway: the LN's feature-dim reduction
makes XLA's layout assignment prefer tokens-in-lanes (transposed) layouts for
the fused LN region, and that layout propagates into the surrounding Dense
dots — measured 42% vs 76% MFU on the MLP fc dots of the ViT-L train step
(BENCH.md). A pallas_call is a custom call with fixed row-major operand
layouts, so it acts as a layout barrier: every dot touching its inputs or
outputs sees the standard [tokens, features] orientation.

Semantics match flax nn.LayerNorm(dtype=bf16): statistics and the affine are
computed in f32, the output is cast to the input dtype. The backward
recomputes mean/rstd from the saved input instead of saving [R, 1] statistics
(whose 128-lane tile padding would inflate them 128x as bwd residuals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _block_rows(r: int, c: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest divisor-of-r row block (multiple of 8) whose f32 tile fits."""
    budget = max(budget_bytes // (4 * c), 8)
    best = 8
    for k in range(1, r // 8 + 1):
        if r % k:
            continue
        br = r // k
        if br % 8 == 0 and br <= budget:
            return br
    return best


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # [br, C]
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)  # [1, C]
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    g = dy * gamma
    a = jnp.mean(g, axis=1, keepdims=True)
    bterm = jnp.mean(g * xhat, axis=1, keepdims=True)
    dx_ref[...] = (rstd * (g - a - xhat * bterm)).astype(dx_ref.dtype)

    dg_part = jnp.sum(dy * xhat, axis=0, keepdims=True)  # [1, C] f32
    db_part = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = dg_part
        db_ref[...] = db_part

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dg_ref[...] += dg_part
        db_ref[...] += db_part


def _ln_fwd_2d(x2, gamma, beta, eps):
    r, c = x2.shape
    br = _block_rows(r, c)
    g2 = gamma.reshape(1, c)
    b2 = beta.reshape(1, c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(x2, g2, b2)


def _ln_bwd_2d(x2, gamma, dy2, eps):
    r, c = x2.shape
    br = _block_rows(r, c, budget_bytes=3 * 1024 * 1024)
    g2 = gamma.reshape(1, c)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(x2, g2, dy2)
    return dx, dg.reshape(c), db.reshape(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln(x2, gamma, beta, eps):
    return _ln_fwd_2d(x2, gamma, beta, eps)


def _ln_fwd(x2, gamma, beta, eps):
    y = _ln_fwd_2d(x2, gamma, beta, eps)
    return y, (x2, gamma)


def _ln_bwd(eps, res, dy2):
    x2, gamma = res
    dx, dg, db = _ln_bwd_2d(x2, gamma, dy2, eps)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_ln.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last dim of [..., C]; f32 statistics, output in
    x.dtype. Falls back to plain jnp for shapes the kernel can't tile."""
    c = x.shape[-1]
    lead = x.shape[:-1]
    r = 1
    for s in lead:
        r *= s
    if c % 128 != 0 or r % 8 != 0:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)
    y2 = _ln(x.reshape(r, c), gamma, beta, eps)
    return y2.reshape(*lead, c)
