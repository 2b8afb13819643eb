"""The jitted JEPA train step: forward (target / context / predictor), masked
L1 + variance regularizer, AdamW, grad clip, and the EMA target update — all
fused into one XLA program (the reference drives EMA with a Python per-param
loop and separate scheduler objects; reference: app/avjepa/train.py:435-537).

Every schedule is a function of ``state.step``; masks are dense bools.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from avjepa_tpu.masks.multiblock3d import MaskSet
from avjepa_tpu.models.encoder import Encoder
from avjepa_tpu.models.predictor import Predictor
from avjepa_tpu.train.optim import (
    ScheduleConfig,
    adamw_update,
    clip_by_global_norm,
    ema_at_step,
    global_norm,
    lr_at_step,
    wd_at_step,
    wd_mask,
)
from avjepa_tpu.train.state import JepaState
from avjepa_tpu.utils.tensors import masked_mean, masked_var


@dataclasses.dataclass(frozen=True)
class StepConfig:
    loss_exp: float = 1.0
    reg_coeff: float = 0.0
    clip_grad: float | None = 10.0
    warmup_epochs: int = 40  # grad clip enabled only after this many epochs
    ipe: int = 300
    # AdamW moments/epsilon (reference: cfgs_opt betas/eps, train.py:141-142)
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8


def cast_dense_params(tree, dtype):
    """Pre-cast the block-stack Dense params (qkv/proj/fc1/fc2, under
    attn/mlp/xattn module segments) to the compute dtype.

    flax's ``promote_dtype`` casts Dense kernels/biases to the module compute
    dtype at every use anyway, so the FORWARD is bit-identical (tested) —
    doing it ONCE on the stacked ``[L, ...]`` arrays hoists the f32->bf16
    converts (and, in the backward, the bf16->f32 grad converts) out of the
    layer scan: the scan's per-layer dW dynamic-update-slice writes then move
    half the bytes (bf16) and the f32 convert runs once on the whole stack.
    GRADIENTS gain one bf16 rounding of each dW (XLA previously fused the f32
    convert into the dW dot) — torch-AMP-equivalent, NOT bit-identical; the
    f32 parity path is untouched (the cast is a no-op at dtype float32).
    LayerNorm params are excluded: flax LN multiplies scale/bias at their
    stored dtype inside the f32 normalization, so casting those WOULD change
    the forward too.
    """
    if dtype == jnp.float32:
        return tree

    def leaf(path, x):
        keys = {str(getattr(k, "key", k)) for k in path}
        if x.dtype == jnp.float32 and keys & {"attn", "mlp", "xattn"}:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map_with_path(leaf, tree)


def feature_layer_norm(h: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free LN over the feature dim (torch F.layer_norm default eps).

    Applied to target-encoder outputs (reference: app/avjepa/train.py:448).
    """
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps)


def jepa_loss(
    z: jnp.ndarray,
    h: jnp.ndarray,
    pred_mask: jnp.ndarray,
    loss_exp: float,
) -> jnp.ndarray:
    """Masked ``mean(|z-h|^loss_exp)/loss_exp`` over target positions
    (reference: app/avjepa/train.py:490-495)."""
    diff = jnp.abs(z.astype(jnp.float32) - h.astype(jnp.float32)) ** loss_exp
    return masked_mean(diff, pred_mask[..., None]) / loss_exp


def make_train_step(
    encoder: Encoder,
    predictor: Predictor,
    sched: ScheduleConfig,
    step_cfg: StepConfig,
    full_metrics: bool = True,
):
    """Build the pure train step:

    (state, video, audio, enc_masks [M,B,N], pred_masks [M,B,N]) ->
        (state', metrics)

    The number of mask configs M is static (python loop, unrolled in XLA).

    ``full_metrics=False`` builds the hot-loop variant that skips the
    diagnostic reductions consumed only at log boundaries — per-layer grad
    norms over every leaf (reference grad_logger), optimizer-moment |.|
    means (adamw_logger) and the two per-sample input-variance reductions
    (reference: app/avjepa/train.py:526-531,560-563 compute these every
    iteration; here the training loop runs the full variant only every
    ``log_freq`` steps). Loss/schedule/grad-norm metrics are identical in
    both variants (the global norms are already computed for clipping).
    """

    def loss_fn(enc_params, pred_params, target_params, video, audio, enc_masks,
                pred_masks, enc_idx, union_idx, step):
        num_cfgs = enc_masks.shape[0]
        n = enc_masks.shape[2]

        # hoist the block-stack Dense casts out of the layer scans (see
        # cast_dense_params — forward bit-identical, gradients AMP-equivalent
        # with one extra bf16 dW rounding; halves the scan-bwd dW traffic)
        enc_params = cast_dense_params(enc_params, encoder.dtype)
        pred_params = cast_dense_params(pred_params, predictor.dtype)
        target_params = cast_dense_params(target_params, encoder.dtype)

        # target: full-sequence EMA encoder, feature-dim LN, no gradients
        h = encoder.apply({"params": target_params}, video, audio)
        h = feature_layer_norm(h)
        h = jax.lax.stop_gradient(h)

        # diffusion-fallback predictor (use_mask_tokens=False) needs the
        # target embeddings + a per-step noise key
        pred_kwargs = {}
        if not predictor.use_mask_tokens:
            pred_kwargs = {
                "target": h,
                "noise_rng": jax.random.fold_in(jax.random.key(0), step),
            }

        def encode_ctx(i):
            if enc_idx is not None:
                # compacted context path: encode only kept tokens (bucketed
                # static K), scatter back to the dense layout for the
                # predictor — identical math, a fraction of the compute
                idx = enc_idx[i]
                cmask = idx < n
                ctx_c = encoder.apply(
                    {"params": enc_params}, video, audio,
                    key_mask=cmask, gather_idx=idx,
                )
                b = ctx_c.shape[0]
                ctx = jnp.zeros((b, n, ctx_c.shape[-1]), ctx_c.dtype)
                # vmapped per-row scatter — the iota-index form is
                # unpartitionable under GSPMD (see models/predictor.py)
                return jax.vmap(lambda d, i, u: d.at[i].set(u, mode="drop"))(
                    ctx, idx, ctx_c
                )
            return encoder.apply(
                {"params": enc_params}, video, audio, key_mask=enc_masks[i]
            )

        if predictor.use_mask_tokens and num_cfgs > 1:
            # batch every mask config through ONE predictor pass (stacked
            # along batch, per-sample mask-token index): one kernel grid
            # instead of num_cfgs sequential full-N passes. The merge is
            # BATCH-major ([b0cfg0, b0cfg1, b1cfg0, ...]): merging (B, M) with
            # B leading keeps the batch sharding representable under SPMD —
            # config-major ordering forced an involuntary full remat of the
            # mask tensors on multi-chip meshes.
            b = video.shape[0]
            ctx_all = jnp.stack([encode_ctx(i) for i in range(num_cfgs)], 1)
            ctx_all = ctx_all.reshape(b * num_cfgs, n, ctx_all.shape[-1])
            enc_all = jnp.swapaxes(enc_masks, 0, 1).reshape(b * num_cfgs, n)
            pred_all = jnp.swapaxes(pred_masks, 0, 1).reshape(b * num_cfgs, n)
            midx = jnp.tile(jnp.arange(num_cfgs, dtype=jnp.int32), b)
            u_all = None
            if union_idx is not None:
                # [M, B, Ku] -> batch-major [B*M, Ku], matching ctx_all
                u_all = jnp.swapaxes(union_idx, 0, 1).reshape(
                    b * num_cfgs, union_idx.shape[-1]
                )
            z_all = predictor.apply(
                {"params": pred_params}, ctx_all, enc_all, pred_all, midx,
                gather_idx=u_all,
            )
            # split via reshape (major dim stays batch-sharded), NOT the
            # strided slice z_all[i::num_cfgs] — GSPMD cannot partition a
            # stride-M slice of a sharded dim, so the strided form replicated
            # the per-config cotangents (2 all-reduces of [B,N,D]/step)
            z_r = z_all.reshape(b, num_cfgs, n, z_all.shape[-1])
            zs = [z_r[:, i] for i in range(num_cfgs)]
        else:
            zs = [
                predictor.apply(
                    {"params": pred_params}, encode_ctx(i), enc_masks[i],
                    pred_masks[i], i,
                    gather_idx=None if union_idx is None else union_idx[i],
                    **pred_kwargs
                )
                for i in range(num_cfgs)
            ]

        loss_jepa = 0.0
        pstd_sum = 0.0
        for i, z in enumerate(zs):
            pred_m = pred_masks[i]
            loss_jepa = loss_jepa + jepa_loss(z, h, pred_m, step_cfg.loss_exp)
            # predictor variance across target tokens (reference reg_fn,
            # train.py:497-498): sqrt(var_tokens(z) + 1e-4), averaged over cfgs
            zv = masked_var(z.astype(jnp.float32), pred_m[..., None], axis=1)
            pstd_sum = pstd_sum + jnp.sqrt(zv + 1e-4)

        loss_jepa = loss_jepa / num_cfgs
        pstd = pstd_sum / num_cfgs
        loss_reg = jnp.mean(jax.nn.relu(1.0 - pstd))
        loss = loss_jepa + step_cfg.reg_coeff * loss_reg
        return loss, (loss_jepa, loss_reg)

    def train_step(state: JepaState, video, audio, enc_masks, pred_masks,
                   enc_idx=None, union_idx=None):
        step = state.step
        lr = lr_at_step(sched, step)
        wd = wd_at_step(sched, step)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (loss_jepa, loss_reg)), (enc_g, pred_g) = grad_fn(
            state.enc_params,
            state.pred_params,
            state.target_params,
            video,
            audio,
            enc_masks,
            pred_masks,
            enc_idx,
            union_idx,
            step,
        )

        # grad clip only after warmup epochs (reference: train.py:518-520)
        enc_norm = global_norm(enc_g)
        pred_norm = global_norm(pred_g)
        if step_cfg.clip_grad is not None:
            epoch = step // step_cfg.ipe
            enabled = (epoch > step_cfg.warmup_epochs).astype(jnp.float32)
            def clip(tree, norm):
                scale = jnp.minimum(1.0, step_cfg.clip_grad / (norm + 1e-6))
                scale = enabled * scale + (1.0 - enabled)
                return jax.tree_util.tree_map(lambda g: g * scale, tree)
            enc_g = clip(enc_g, enc_norm)
            pred_g = clip(pred_g, pred_norm)

        b1, b2 = step_cfg.betas
        enc_params, enc_opt = adamw_update(
            enc_g, state.enc_opt, state.enc_params, lr, wd,
            wd_mask(state.enc_params), b1=b1, b2=b2, eps=step_cfg.eps,
        )
        pred_params, pred_opt = adamw_update(
            pred_g, state.pred_opt, state.pred_params, lr, wd,
            wd_mask(state.pred_params), b1=b1, b2=b2, eps=step_cfg.eps,
        )

        # EMA target update fused into the step (reference: train.py:533-537)
        m = ema_at_step(sched, step)
        target_params = jax.tree_util.tree_map(
            lambda k, q: m * k + (1.0 - m) * q, state.target_params, enc_params
        )

        new_state = JepaState(
            step=step + 1,
            enc_params=enc_params,
            pred_params=pred_params,
            target_params=target_params,
            enc_opt=enc_opt,
            pred_opt=pred_opt,
        )

        metrics = {
            "loss": loss,
            "loss_jepa": loss_jepa,
            "loss_reg": loss_reg,
            "lr": lr,
            "wd": wd,
            "ema": m,
            "enc_grad_norm": enc_norm,
            "pred_grad_norm": pred_norm,
            "mask_sizes": jnp.sum(enc_masks[:, 0, :], axis=1).astype(jnp.float32),
        }
        if full_metrics:
            # per-layer gradient statistics (reference grad_logger,
            # src/utils/logging.py:91-105)
            enc_gavg, enc_gfirst, enc_glast = grad_stats(enc_g)
            pred_gavg, _, _ = grad_stats(pred_g)
            metrics.update({
                "enc_grad_avg": enc_gavg,
                "enc_grad_first_qkv": enc_gfirst,
                "enc_grad_last_qkv": enc_glast,
                "pred_grad_avg": pred_gavg,
                # optimizer moment magnitudes (reference adamw_logger,
                # src/utils/logging.py:108-118)
                "opt_mu_abs": _tree_abs_mean(enc_opt.mu),
                "opt_nu_abs": _tree_abs_mean(enc_opt.nu),
                # input-variance diagnostics (reference: train.py:560-563);
                # f32 accumulation — the video itself may arrive as bf16.
                # Reduce over the trailing axes directly (no flatten:
                # reshaping the tiled video layout forced a 4 ms relayout
                # copy of the f32 batch)
                "input_var": jnp.mean(_per_sample_var(video)),
                "input_var_min": jnp.min(_per_sample_var(video)),
            })
        return new_state, metrics

    return train_step


def _per_sample_var(video: jnp.ndarray) -> jnp.ndarray:
    """Per-sample variance over all non-batch axes, f32 accumulation, without
    flattening (XLA fuses the convert into the multi-axis reduce; a reshape
    would force a relayout copy of the whole f32 batch)."""
    axes = tuple(range(1, video.ndim))
    v = video.astype(jnp.float32)
    return jnp.var(v, axis=axes)


def _named_leaves(tree):
    for path, x in jax.tree_util.tree_leaves_with_path(tree):
        yield "/".join(str(getattr(k, "key", k)) for k in path), x


def grad_stats(tree):
    """Per-parameter gradient statistics, reference grad_logger semantics
    (src/utils/logging.py:91-105): mean of per-param grad norms over non-bias
    >=2D params, plus the first/last transformer layer's qkv-kernel norm.

    Our block params are depth-stacked ([L, ...] under blocks/layers), so
    "per param" means per layer there — one vectorized reduction per leaf.
    """
    norms = []
    first = last = None
    for name, g in _named_leaves(tree):
        if g.ndim <= 1 or name.endswith("bias"):
            continue
        g32 = g.astype(jnp.float32)
        if "blocks/layers" in name:
            per_layer = jnp.sqrt(
                jnp.sum(jnp.square(g32), axis=tuple(range(1, g.ndim)))
            )  # [L]
            norms.append(per_layer)
            if "qkv/kernel" in name:
                first, last = per_layer[0], per_layer[-1]
        else:
            norms.append(jnp.linalg.norm(g32)[None])
    z = jnp.zeros(())
    avg = jnp.mean(jnp.concatenate(norms)) if norms else z
    return avg, (z if first is None else first), (z if last is None else last)


def _tree_abs_mean(tree) -> jnp.ndarray:
    """Mean over params of per-param |x| means (reference adamw_logger,
    src/utils/logging.py:108-118) — stacked leaves count once per layer."""
    vals = []
    for name, x in _named_leaves(tree):
        x32 = jnp.abs(x.astype(jnp.float32))
        if "blocks/layers" in name:
            vals.append(jnp.mean(x32, axis=tuple(range(1, x.ndim))))
        else:
            vals.append(jnp.mean(x32)[None])
    return jnp.mean(jnp.concatenate(vals)) if vals else jnp.zeros(())


def stack_masksets(masksets: Sequence[MaskSet], with_idx: bool = False):
    """Host-side: list[MaskSet] -> (enc [M,B,N], pred [M,B,N]) numpy bools,
    plus (with_idx) the per-config compact context index tuple ([B, K_i]
    each) and the [M, B, Ku] union-index stack for the compacted predictor
    (configs padded with the sentinel N to a common bucketed Ku)."""
    import numpy as np

    enc = np.stack([m.enc for m in masksets])
    pred = np.stack([m.pred for m in masksets])
    if not with_idx:
        return enc, pred
    idx = tuple(m.enc_idx for m in masksets)
    if any(i is None for i in idx):
        idx = None
    unions = [m.union_idx for m in masksets]
    union = None
    if all(u is not None for u in unions):
        n = enc.shape[2]
        ku = max(u.shape[1] for u in unions)
        union = np.full((len(unions), unions[0].shape[0], ku), n, np.int32)
        for i, u in enumerate(unions):
            union[i, :, : u.shape[1]] = u
    return enc, pred, idx, union
