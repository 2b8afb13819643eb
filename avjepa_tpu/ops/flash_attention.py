"""Pallas TPU flash attention with dense key-mask support.

FlashAttention-2-style streaming softmax, forward and backward as Pallas
kernels (custom VJP). The key mask is the framework's dense token-validity
vector: masked keys are excluded from the softmax, and **fully-masked key
blocks are skipped entirely** — this recovers the compute the reference saves
by physically removing tokens (reference: cuDNN SDPA via
src/models/utils/modules.py:66-68), while keeping shapes static.

TPU structure notes:
- grid is (batch*heads,) with the q/k block loops *inside* the kernel — for
  JEPA-size sequences (1664 tokens, head_dim 64) per-block program launches
  dominate, and full Q/K/V rows fit VMEM comfortably (~0.2 MB each).
- every ref access is a value-level load/store (Mosaic cannot build ref views
  whose last dim, head_dim 64, is under the 128-lane tile).
- the mask rides as an f32 additive bias (0 valid / -1e30 invalid): one VPU
  add per score element instead of compare+select.
- sequences are zero-padded to a multiple of the block size; padded keys are
  invalid (always masked), padded query rows are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BLOCK = 128
# logit clamp for the no-max softmax (packed kernels): N * exp(80) ~ 9e37
# stays inside f32 range (max 3.4e38). Trained ViTs can grow attention
# logits into the tens, so the clamp sits well above that; beyond it the
# softmax saturates (and the backward zeroes the clamped logits' gradient
# to match the function actually computed).
SOFTMAX_CLAMP = 80.0

# v5e has 128 MiB of VMEM; the compiler's default scoped-vmem budget is a
# conservative 16 MiB. Our kernels hold full K/V rows plus several score
# tiles, so give them a bigger window (leaving room for XLA's own scoped
# use). 64 MiB was tried and is NOT enough: the packed bwd kernel's unrolled
# 16-head loop (d=24 predictor) allocates a 75.4 MiB Mosaic stack.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret() -> bool:
    # pallas TPU kernels run in interpreter mode on CPU (tests / dev)
    return jax.devices()[0].platform != "tpu"


def _pick_blocks(n_pad: int, s_budget_bytes: int = 3 * 1024 * 1024) -> tuple[int, int]:
    """(block_q, block_k) for a padded seq length.

    Measured on v5e at N=1664/d=64: a full-width K block with the largest
    q-block whose f32 score tile fits ~3 MB of VMEM is ~2x faster end-to-end
    than 128-wide streaming (fewer VPU softmax sweeps, fill-amortized MXU
    passes). Falls back to 128x128 streaming when the score tile cannot fit
    (very long sequences), which also re-enables per-block mask skipping.
    """
    budget_rows = s_budget_bytes // (4 * n_pad)
    for k in range(1, n_pad // 8 + 1):
        if n_pad % k:
            continue
        bq = n_pad // k
        if bq % 8 == 0 and bq <= max(budget_rows, 8):
            return (bq, n_pad)
    return (BLOCK, BLOCK)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                *, scale, block_q, block_k, nq, nk):
    # q/k/v/o: [1, N, d]; mask: [1, 1, N] f32 additive bias or None; lse: [1, N, 1] f32
    def q_block(qi, _):
        # keep dot operands in the input dtype (bf16 MXU passes); accumulate
        # and keep softmax statistics in f32
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]

        if nk == 1:
            # single full-width K block (the common JEPA-size configuration):
            # plain softmax, no streaming-correction sweeps over the score tile
            s = jax.lax.dot_general(
                q, k_ref[0, :, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if mask_ref is not None:
                s = s + mask_ref[0, 0:1, :]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(q.dtype), v_ref[0, :, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_safe = jnp.maximum(l, 1e-30)
            o_ref[0, pl.ds(qi * block_q, block_q), :] = (acc / l_safe).astype(o_ref.dtype)
            lse_ref[0, pl.ds(qi * block_q, block_q), :] = m + jnp.log(l_safe)
            return 0

        m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, q.shape[1]), jnp.float32)

        def body(i, carry):
            m, l, acc = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [bq, bk] f32
            if mask_ref is not None:
                s = s + mask_ref[0, 0:1, pl.ds(i * block_k, block_k)]  # [1, bk]
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * corr + jax.lax.dot_general(
                p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        def maybe_body(i, carry):
            if mask_ref is None:
                return body(i, carry)
            any_valid = jnp.max(mask_ref[0, 0:1, pl.ds(i * block_k, block_k)]) > -1.0
            return jax.lax.cond(any_valid, lambda c: body(i, c), lambda c: c, carry)

        m, l, acc = jax.lax.fori_loop(0, nk, maybe_body, (m0, l0, acc0))
        l_safe = jnp.maximum(l, 1e-30)
        o_ref[0, pl.ds(qi * block_q, block_q), :] = (acc / l_safe).astype(o_ref.dtype)
        lse_ref[0, pl.ds(qi * block_q, block_q), :] = m + jnp.log(l_safe)
        return 0

    jax.lax.fori_loop(0, nq, q_block, 0)


def _flash_fwd(q, k, v, key_mask, scale, block_q, block_k, h):
    bh, n, d = q.shape
    nq, nk = n // block_q, n // block_k

    in_specs = [
        pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if key_mask is not None:
        # per-batch bias [B, 1, N], shared across heads via the index map
        in_specs.append(
            pl.BlockSpec((1, 1, n), lambda b: (b // h, 0, 0), memory_space=pltpu.VMEM)
        )

    def kernel(*refs):
        if key_mask is not None:
            q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, lse_ref = refs
            m_ref = None
        _fwd_kernel(
            q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref,
            scale=scale, block_q=block_q, block_k=block_k, nq=nq, nk=nk,
        )

    args = [q, k, v]
    if key_mask is not None:
        args.append(key_mask)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, dq_acc,
                *, scale, block_q, block_k, nq, nk):
    """Fused dq/dk/dv backward: one pass over (k-block, q-block) pairs computes
    the score/probability tile ONCE and derives all three gradients from it
    (the classic split dq-kernel + dkv-kernel formulation pays the q@k^T matmul
    and the exp sweep twice). dq contributions accumulate in an f32 VMEM
    scratch across k-blocks. Invalid keys get p = 0 via the additive mask, so
    their dk/dv stay zero; fully-masked k-blocks are skipped."""

    def k_block(ki, _):
        ksl = pl.ds(ki * block_k, block_k)
        k = k_ref[0, ksl, :]
        v = v_ref[0, ksl, :]
        own = mask_ref[0, 0:1, ksl] if mask_ref is not None else None  # [1, bk]
        dk0 = jnp.zeros((block_k, k.shape[1]), jnp.float32)
        dv0 = jnp.zeros((block_k, k.shape[1]), jnp.float32)

        def q_block(qi, carry):
            dk, dv = carry
            qsl = pl.ds(qi * block_q, block_q)
            q = q_ref[0, qsl, :]
            do = do_ref[0, qsl, :]
            o = o_ref[0, qsl, :]
            lse = lse_ref[0, qsl, :]
            delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                            axis=1, keepdims=True)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if own is not None:
                s = s + own
            p = jnp.exp(s - lse)
            p_lo = p.astype(q.dtype)
            dv_new = dv + jax.lax.dot_general(
                p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - delta) * scale
            ds_lo = ds.astype(q.dtype)
            dk_new = dk + jax.lax.dot_general(
                ds_lo, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_part = jax.lax.dot_general(
                ds_lo, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if nk == 1:
                dq_acc[qsl, :] = dq_part
            else:
                dq_acc[qsl, :] += dq_part
            return dk_new, dv_new

        def run(carry):
            return jax.lax.fori_loop(0, nq, q_block, carry)

        if own is not None and nk > 1:
            # NOTE: skipping is only safe when dq_acc was pre-zeroed (nk > 1
            # initializes below); with nk == 1 a skip would leave dq garbage,
            # and a fully-masked full-width block cannot occur for real rows.
            any_valid = jnp.max(own) > -1.0
            dk, dv = jax.lax.cond(any_valid, run, lambda c: c, (dk0, dv0))
        else:
            dk, dv = run((dk0, dv0))
        dk_ref[0, ksl, :] = dk.astype(dk_ref.dtype)
        dv_ref[0, ksl, :] = dv.astype(dv_ref.dtype)
        return 0

    if nk > 1:
        dq_acc[...] = jnp.zeros_like(dq_acc)
    jax.lax.fori_loop(0, nk, k_block, 0)

    def write_dq(qi, _):
        qsl = pl.ds(qi * block_q, block_q)
        dq_ref[0, qsl, :] = dq_acc[qsl, :].astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, write_dq, 0)


def _bwd_block_q(n_pad: int, block_k: int, s_budget_bytes: int = 5_000_000) -> int:
    """The fused backward holds ~4 f32 + 2 bf16 [bq, bk] tiles live at once
    (s, p, dp, ds + the two bf16 dot operands), so its q-block is smaller
    than the forward's to bound live-tile VMEM (~15 MB at the 2.5 MB cap)."""
    budget_rows = max(s_budget_bytes // (4 * block_k), 8)
    best = 8
    for k in range(1, n_pad // 8 + 1):
        if n_pad % k:
            continue
        bq = n_pad // k
        if bq % 8 == 0 and bq <= budget_rows:
            return bq
    return best


def _flash_bwd(q, k, v, key_mask, o, lse, do, scale, block_q, block_k, h):
    bh, n, d = q.shape
    block_q = min(block_q, _bwd_block_q(n, block_k))
    nq, nk = n // block_q, n // block_k

    # the additive mask bias is stored once per *batch* row ([B, 1, N]) and
    # shared by all H heads via the index map — not repeated H times in HBM
    mask_spec = (
        [pl.BlockSpec((1, 1, n), lambda b: (b // h, 0, 0), memory_space=pltpu.VMEM)]
        if key_mask is not None
        else []
    )
    row_spec = pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, n, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    def kernel(*refs):
        if key_mask is not None:
            (q_ref, k_ref, v_ref, m_ref, do_ref, o_ref, lse_ref,
             dq_ref, dk_ref, dv_ref, dq_acc) = refs
        else:
            (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
             dq_ref, dk_ref, dv_ref, dq_acc) = refs
            m_ref = None
        _bwd_kernel(
            q_ref, k_ref, v_ref, m_ref, do_ref, o_ref, lse_ref,
            dq_ref, dk_ref, dv_ref, dq_acc,
            scale=scale, block_q=block_q, block_k=block_k, nq=nq, nk=nk,
        )

    args = [q, k, v] + ([key_mask] if key_mask is not None else []) + [do, o, lse]
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[row_spec, row_spec, row_spec, *mask_spec, row_spec, row_spec, lse_spec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((n, d), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_masked(q3, k3, v3, mask3, scale, blocks):
    out, _ = _flash_fwd(q3, k3, v3, mask3, scale, *blocks)
    return out


def _flash_masked_fwd(q3, k3, v3, mask3, scale, blocks):
    out, lse = _flash_fwd(q3, k3, v3, mask3, scale, *blocks)
    # name the softmax statistics so the remat policy can save them — without
    # this, rematerialized backward passes re-run the whole forward kernel
    # just to regenerate lse (measured: +50% attention time per bwd layer).
    # lse is stored 2D: a saved [bh, n, 1] tensor gets a T(8,128) layout whose
    # trailing-dim padding inflates it 128x (observed as an HBM OOM).
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "attn_out")
    lse2 = checkpoint_name(lse[..., 0], "attn_lse")
    return out, (q3, k3, v3, mask3, out, lse2)


def _flash_masked_bwd(scale, blocks, res, g):
    q3, k3, v3, mask3, out, lse2 = res
    lse = lse2[..., None]
    dq, dk, dv = _flash_bwd(q3, k3, v3, mask3, out, lse, g, scale, *blocks)
    if mask3 is None:
        return dq, dk, dv, None
    import numpy as np

    dmask = np.zeros(mask3.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_flash_masked.defvjp(_flash_masked_fwd, _flash_masked_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """[B, H, N, Dh] attention; pads N to the block size; falls back to the
    XLA path only for head dims that defeat the 8-sublane tile."""
    b, h, n, d = q.shape
    if d % 8 != 0 or n < BLOCK:
        from avjepa_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, key_mask=key_mask, scale=scale)
    if scale is None:
        scale = d**-0.5

    n_pad = -(-n // BLOCK) * BLOCK
    if key_mask is None and n_pad != n:
        # padded keys must be excluded from the softmax
        key_mask = jnp.ones((b, n), bool)
    if n_pad != n:
        pad = [(0, 0), (0, 0), (0, n_pad - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_mask = jnp.pad(key_mask, [(0, 0), (0, n_pad - n)])

    blocks = (*_pick_blocks(n_pad), h)
    q3 = q.reshape(b * h, n_pad, d)
    k3 = k.reshape(b * h, n_pad, d)
    v3 = v.reshape(b * h, n_pad, d)
    if key_mask is None:
        mask3 = None  # fully-unmasked path (target encoder): no bias adds
    else:
        # additive bias: 0 for valid keys, NEG_INF for invalid — stored once
        # per batch row [B, 1, N] and shared across heads inside the kernels
        mask3 = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    out = _flash_masked(q3, k3, v3, mask3, scale, blocks)
    out = out.reshape(b, h, n_pad, d)
    if n_pad != n:
        out = out[:, :, :n]
    return out


# ---------------------------------------------------------------------------
# packed-qkv path: attention straight off the fused qkv projection
# ---------------------------------------------------------------------------
#
# The classic path above wants [B*H, N, d] operands, which forces
# moveaxis/reshape relayouts between the qkv Dense and the kernel — and, far
# worse, lets XLA's layout assignment propagate transposed layouts into the
# surrounding dots (measured: fc2 at 42% MFU, plus a saved activation stack
# stored [dp, N, B]-transposed whose minor-dim padding wasted 1.49 GB HBM).
#
# Here the kernel reads the qkv Dense output [B, N, 3C] *in place* via three
# BlockSpec views (q at lane-block g, k at C/128 + g, v at 2C/128 + g) and
# writes [B, N, C] that feeds the output projection directly. Heads are packed
# into 128-lane groups (hpb = 128 // head_dim heads per program) to satisfy
# the Mosaic lane-tile constraint without any transposes anywhere.

LANE = 128


def _heads_per_block(head_dim: int) -> int:
    """Smallest head-group size whose packed width is lane-aligned
    (lcm(d, 128) / d). d=64 -> 2 (width 128); d=32 -> 4 (128); d=24 -> 16
    (384, the ViT-L predictor); d=80 -> 8 (640, ViT-H)."""
    import math

    return LANE // math.gcd(LANE, head_dim)


def packed_qkv_eligible(num_heads: int, head_dim: int) -> bool:
    hpb = _heads_per_block(head_dim)
    return head_dim <= LANE and hpb <= num_heads and num_heads % hpb == 0


def _fwd_packed_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                       *, scale, d, hpb, block_q, nq):
    # q/k/v/o refs: [1, N, 128] (one group of hpb heads, lane-packed);
    # mask: [1, 1, N] additive bias or None; lse: [1, 1, N, hpb] f32.
    # Mosaic only allows dynamic store offsets on SUBLANE dims (multiples of
    # 8), so lse is emitted [N, hpb] (heads in lanes) — the wrapper transposes
    # it once, outside the kernel, into the padding-friendly [hpb, N] form.
    #
    # VPU-sweep economy (the kernels are sweep-bound, not MXU-bound, at JEPA
    # head dims — every elementwise op over the [bq, N] f32 score tile costs
    # a full VPU sweep):
    #  - the softmax scale is folded into the TINY q tile ([bq, d] work)
    #    instead of multiplying the score tile;
    #  - no-max softmax: clamp only the TOP at +SOFTMAX_CLAMP
    #    (exp(SOFTMAX_CLAMP)*N is far below f32 overflow); very negative logits underflow to 0 on
    #    their own, so no lower clamp — masked keys (s = -1e30) get exactly
    #    p = 0, and a fully-masked row outputs exactly 0 (the XLA path
    #    returns garbage there; callers treat those rows as don't-care).
    k_all = k_ref[0, :, :]
    v_all = v_ref[0, :, :]
    bias = mask_ref[0, 0:1, :] if mask_ref is not None else None  # [1, N]

    def q_block(qi, _):
        qsl = pl.ds(qi * block_q, block_q)
        q2 = q_ref[0, qsl, :]  # [bq, 128]
        o_parts = []
        lse_parts = []
        for hi in range(hpb):
            hs = slice(hi * d, (hi + 1) * d)
            q = (q2[:, hs].astype(jnp.float32) * scale).astype(q2.dtype)
            s = jax.lax.dot_general(
                q, k_all[:, hs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bq, N] f32, pre-scaled via q
            if bias is not None:
                s = s + bias
            p = jnp.exp(jnp.minimum(s, SOFTMAX_CLAMP))
            l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
            acc = jax.lax.dot_general(
                p.astype(q2.dtype), v_all[:, hs], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_parts.append(acc / l)
            lse_parts.append(jnp.log(l))  # [bq, 1]
        o_ref[0, qsl, :] = jnp.concatenate(o_parts, axis=1).astype(o_ref.dtype)
        lse_ref[0, 0, qsl, :] = jnp.concatenate(lse_parts, axis=1)  # [bq, hpb]
        return 0

    jax.lax.fori_loop(0, nq, q_block, 0)


def _bwd_packed_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                       delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                       *, scale, d, hpb, block_q, nq):
    # lse/delta arrive [1, 1, N, hpb] (heads in lanes) so per-q-block reads
    # only need dynamic SUBLANE offsets; per-head columns are static lane
    # slices.
    #
    # The softmax-correction term delta_i = sum_j p_ij * dp_ij == do_i . o_i
    # is precomputed OUTSIDE the kernel from the attention output (which is
    # already a saved residual for the projection dW) — N*d work in a fused
    # XLA op replaces a multiply + reduce sweep over every [bq, N] f32 score
    # tile. The scale is folded into the tiny q/k tiles the same way as the
    # forward: s is pre-scaled via q, and dk = ds^T @ (scale*q),
    # dq = ds @ (scale*k) use pre-scaled operands, so ds itself never needs
    # a scale sweep.
    #
    # dk/dv accumulate in [N, w] f32 VMEM *scratch* refs with static lane
    # slices per head — NOT as fori_loop-carried tuples of [N, d] arrays: the
    # carried-tuple form kept every unrolled head's temporaries live and blew
    # the Mosaic stack to 75 MiB at hpb=16 (d=24 predictor).
    k_all = k_ref[0, :, :]
    v_all = v_ref[0, :, :]
    ks_all = (k_all.astype(jnp.float32) * scale).astype(k_all.dtype)
    bias = mask_ref[0, 0:1, :] if mask_ref is not None else None

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def q_block(qi, _):
        qsl = pl.ds(qi * block_q, block_q)
        q2 = q_ref[0, qsl, :]
        do2 = do_ref[0, qsl, :]
        lse2 = lse_ref[0, 0, qsl, :]  # [bq, hpb] f32
        delta2 = delta_ref[0, 0, qsl, :]  # [bq, hpb] f32
        dq_parts = []
        for hi in range(hpb):
            hs = slice(hi * d, (hi + 1) * d)
            qs = (q2[:, hs].astype(jnp.float32) * scale).astype(q2.dtype)
            do = do2[:, hs]
            lse = lse2[:, hi:hi + 1]  # [bq, 1]
            delta = delta2[:, hi:hi + 1]  # [bq, 1]
            s = jax.lax.dot_general(
                qs, k_all[:, hs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                s = s + bias
            p = jnp.exp(jnp.minimum(s, SOFTMAX_CLAMP) - lse)  # match the fwd
            p_lo = p.astype(q2.dtype)
            dv_acc[:, hs] += jax.lax.dot_general(
                p_lo, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do, v_all[:, hs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # clamped logits are flat in the forward -> zero gradient
            ds = jnp.where(s < SOFTMAX_CLAMP, p * (dp - delta), 0.0)
            ds_lo = ds.astype(q2.dtype)
            dk_acc[:, hs] += jax.lax.dot_general(
                ds_lo, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq_parts.append(jax.lax.dot_general(
                ds_lo, ks_all[:, hs], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dq_ref[0, qsl, :] = jnp.concatenate(dq_parts, axis=1).astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, q_block, 0)
    dk_ref[0, :, :] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0, :, :] = dv_acc[...].astype(dv_ref.dtype)


def _packed_specs(b, n, c, w, g_total, with_mask):
    """(in_specs for qkv-as-three-views [+ mask], grid) for grid (b, G);
    w = head-group width in lanes (hpb * head_dim, a multiple of 128)."""
    G = c // w
    q_spec = pl.BlockSpec((1, n, w), lambda bi, g: (bi, 0, g),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, n, w), lambda bi, g: (bi, 0, G + g),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, n, w), lambda bi, g: (bi, 0, 2 * G + g),
                          memory_space=pltpu.VMEM)
    specs = [q_spec, k_spec, v_spec]
    if with_mask:
        specs.append(pl.BlockSpec((1, 1, n), lambda bi, g: (bi, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs, (b, g_total)


def _flash_packed_fwd_impl(qkv, mask3, scale, h, d):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hpb = _heads_per_block(d)
    w = hpb * d
    G = h // hpb
    # one head's f32 score tile lives at a time; 12 MB admits a full-width
    # q-block at JEPA sizes (N=1664 -> one sweep, no q-loop). Budgets are
    # tuned for bf16 rows: at f32 the q/k/v/o row refs double, so drop the
    # score budget to a QUARTER (12 MB -> 3 MB) to keep the Mosaic stack
    # inside the 100 MB scoped window (used by the f32 comparator path of
    # tools/parity_bf16.py; the bwd path below uses the same quartering).
    f32_rows = qkv.dtype == jnp.float32
    block_q, _ = _pick_blocks(
        n, s_budget_bytes=(3 if f32_rows else 12) * 1024 * 1024)
    nq = n // block_q

    in_specs, grid = _packed_specs(b, n, c, w, G, mask3 is not None)

    def kernel(*refs):
        if mask3 is not None:
            q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref, lse_ref = refs
            m_ref = None
        _fwd_packed_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, lse_ref,
                           scale=scale, d=d, hpb=hpb, block_q=block_q, nq=nq)

    args = [qkv, qkv, qkv] + ([mask3] if mask3 is not None else [])
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, n, w), lambda bi, g: (bi, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, hpb), lambda bi, g: (bi, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, G, n, hpb), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    # transpose the statistics to n-minor OUTSIDE the kernel: a [.., n, hpb]
    # tensor saved as a bwd residual would be lane-padded hpb -> 128 (64x)
    return out, jnp.swapaxes(lse, 2, 3)  # [b, G, hpb, n]


def _flash_packed_bwd_impl(qkv, mask3, lse, delta, g, scale, h, d):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hpb = _heads_per_block(d)
    w = hpb * d
    G = h // hpb
    # the scratch-accumulator formulation keeps only ONE head's score tiles
    # live, so the q-block can be twice the classic bwd's (10 MB f32 tile
    # budget -> 832 at N=1664): fewer, larger VPU sweeps per score tile.
    # (A 23 MB/full-width budget was tried: Mosaic compile time explodes.)
    # Budgets assume bf16 rows; f32 rows double the ref footprint (measured:
    # 123.9 MB stack vs the 100 MB scoped-vmem window at Ku=1408 f32), and
    # at the high-unroll predictor geometry (hpb=16, N=1536) Mosaic's
    # register allocator additionally spilled 92 MB at block_q=768, so the
    # f32 budget is a quarter of bf16's (block_q 256 at N=1536), not half.
    f32_rows = qkv.dtype == jnp.float32
    block_q = _bwd_block_q(n, n, s_budget_bytes=2_000_000 if f32_rows
                           else 10_000_000)
    nq = n // block_q

    in_specs, grid = _packed_specs(b, n, c, w, G, mask3 is not None)
    row_spec = pl.BlockSpec((1, n, w), lambda bi, gi: (bi, 0, gi),
                            memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, n, hpb), lambda bi, gi: (bi, gi, 0, 0),
                            memory_space=pltpu.VMEM)
    lse = jnp.swapaxes(lse, 2, 3)  # residual [b,G,hpb,n] -> kernel [b,G,n,hpb]

    def kernel(*refs):
        if mask3 is not None:
            (q_ref, k_ref, v_ref, m_ref, do_ref, lse_ref, delta_ref,
             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
        else:
            (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs
            m_ref = None
        _bwd_packed_kernel(q_ref, k_ref, v_ref, m_ref, do_ref, lse_ref,
                           delta_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                           scale=scale, d=d, hpb=hpb, block_q=block_q, nq=nq)

    args = ([qkv, qkv, qkv] + ([mask3] if mask3 is not None else [])
            + [g, lse, delta])
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + [row_spec, lse_spec, lse_spec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, w), jnp.float32),
            pltpu.VMEM((n, w), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _flash_packed(qkv, mask3, scale, h, d):
    out, _ = _flash_packed_fwd_impl(qkv, mask3, scale, h, d)
    return out


def _flash_packed_fwd(qkv, mask3, scale, h, d):
    out, lse = _flash_packed_fwd_impl(qkv, mask3, scale, h, d)
    from jax.ad_checkpoint import checkpoint_name

    # the residual is saved 2D ([B*N, C]): XLA stores the stacked residual
    # physically TRANSPOSED (minor dim = batch) to suit the proj-dW dot in
    # the backward pass, and the 3D transpose's T(8,128) padding inflates a
    # 351 MB stack to 1.83 GB (observed OOM). In 2D both orientations are
    # 128-aligned, so whichever XLA picks is padding-free.
    b, n, c = out.shape
    # out is named so the proj-dW consumer reuses it under remat; the same
    # saved tensor feeds the backward's softmax-correction term
    # (delta = rowsum(dO . O)), so carrying it as a kernel residual costs no
    # extra HBM
    out2 = checkpoint_name(out.reshape(b * n, c), "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    out3 = out2.reshape(b, n, c)
    return out3, (qkv, mask3, lse, out3)


def _flash_packed_bwd(scale, h, d, res, g):
    qkv, mask3, lse, out = res
    b, n, c = out.shape
    hpb = _heads_per_block(d)
    G = (c // d) // hpb
    # softmax-correction term delta_i = dO_i . O_i per head: N*d work fused
    # by XLA, replacing a multiply+reduce VPU sweep pair over every [bq, N]
    # f32 score tile inside the kernel. Shaped/transposed like lse so the
    # kernel reads per-head columns as static lane slices.
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, n, G, hpb, d
    ).sum(-1)
    delta = delta.transpose(0, 2, 1, 3)  # [b, G, n, hpb]
    dqkv = _flash_packed_bwd_impl(qkv, mask3, lse, delta, g, scale, h, d)
    if mask3 is None:
        return dqkv, None
    import numpy as np

    dmask = np.zeros(mask3.shape, dtype=jax.dtypes.float0)
    return dqkv, dmask


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention straight off the fused qkv projection.

    qkv: [B, N, 3*C] (feature packing [q | k | v], heads contiguous within
    each C — exactly the layout a single Dense(3C) produces). Returns
    [B, N, C]. Requires packed_qkv_eligible(num_heads, C // num_heads) and
    pads N to a multiple of 128.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert packed_qkv_eligible(num_heads, d), (num_heads, d)
    if scale is None:
        scale = d**-0.5

    n_pad = -(-n // LANE) * LANE
    if key_mask is None and n_pad != n:
        key_mask = jnp.ones((b, n), bool)
    if n_pad != n:
        qkv = jnp.pad(qkv, [(0, 0), (0, n_pad - n), (0, 0)])
        key_mask = jnp.pad(key_mask, [(0, 0), (0, n_pad - n)])
    mask3 = (
        None
        if key_mask is None
        else jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    )
    out = _flash_packed(qkv, mask3, scale, num_heads, d)
    if n_pad != n:
        out = out[:, :n]
    return out
