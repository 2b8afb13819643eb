"""Schedules and optimizer (step-derived, resume-friendly).

Unlike the reference's stateful scheduler objects that must be replayed
``start_epoch * ipe`` times on resume (reference: app/avjepa/train.py:326-330),
every schedule here is a pure function of the global step, evaluated *inside*
the jitted train step. Semantics match reference src/utils/schedulers.py:11-76
(including the increment-before-evaluate convention and the max/min clamps).

AdamW matches torch.optim.AdamW: decoupled weight decay applied only to
parameters with ndim >= 2 and names not containing 'bias'
(reference: app/avjepa/utils.py:245-263 builds exactly these groups with
WD_exclude for the rest).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    ipe: int
    num_epochs: int
    ipe_scale: float = 1.25
    warmup_epochs: float = 40.0
    start_lr: float = 2e-4
    ref_lr: float = 6.25e-4
    final_lr: float = 1e-6
    ref_wd: float = 0.04
    final_wd: float = 0.4
    ema_start: float = 0.998
    ema_end: float = 1.0

    @property
    def warmup_steps(self) -> int:
        return int(self.warmup_epochs * self.ipe)

    @property
    def total_steps(self) -> int:
        return int(self.ipe_scale * self.num_epochs * self.ipe)


def lr_at_step(cfg: ScheduleConfig, step: jnp.ndarray) -> jnp.ndarray:
    """LR used on iteration ``step`` (0-based). Matches WarmupCosineSchedule
    (schedulers.py:31-45): internal counter is step+1."""
    s = step.astype(jnp.float32) + 1.0
    warm = jnp.asarray(cfg.warmup_steps, jnp.float32)
    t_max = jnp.asarray(cfg.total_steps - cfg.warmup_steps, jnp.float32)
    warm_lr = cfg.start_lr + (s / jnp.maximum(warm, 1.0)) * (cfg.ref_lr - cfg.start_lr)
    progress = (s - warm) / jnp.maximum(t_max, 1.0)
    cos_lr = cfg.final_lr + (cfg.ref_lr - cfg.final_lr) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * progress)
    )
    cos_lr = jnp.maximum(cfg.final_lr, cos_lr)
    return jnp.where(s < warm, warm_lr, cos_lr)


def wd_at_step(cfg: ScheduleConfig, step: jnp.ndarray) -> jnp.ndarray:
    """WD on iteration ``step``. Matches CosineWDSchedule (schedulers.py:48-76)."""
    s = step.astype(jnp.float32) + 1.0
    progress = s / jnp.asarray(cfg.total_steps, jnp.float32)
    wd = cfg.final_wd + (cfg.ref_wd - cfg.final_wd) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * progress)
    )
    if cfg.final_wd <= cfg.ref_wd:
        wd = jnp.maximum(cfg.final_wd, wd)
    else:
        wd = jnp.minimum(cfg.final_wd, wd)
    return wd


def ema_at_step(cfg: ScheduleConfig, step: jnp.ndarray) -> jnp.ndarray:
    """EMA momentum on iteration ``step`` — linear over total_steps
    (reference: app/avjepa/train.py:304-306)."""
    s = step.astype(jnp.float32)
    frac = s / jnp.asarray(cfg.total_steps, jnp.float32)
    return cfg.ema_start + frac * (cfg.ema_end - cfg.ema_start)


def wd_mask(params: Any) -> Any:
    """True where decoupled weight decay applies (2D+ non-bias params)."""

    def keep(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        is_bias = any("bias" in str(n) for n in names)
        return (x.ndim >= 2) and not is_bias

    return jax.tree_util.tree_map_with_path(keep, params)


class AdamWState(NamedTuple):
    mu: Any
    nu: Any
    count: jnp.ndarray


def adamw_init(params: Any) -> AdamWState:
    zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    return AdamWState(mu=zeros(params), nu=zeros(params), count=jnp.zeros((), jnp.int32))


def adamw_update(
    grads: Any,
    state: AdamWState,
    params: Any,
    lr: jnp.ndarray,
    wd: jnp.ndarray,
    mask: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[Any, AdamWState]:
    """One AdamW step with dynamic lr/wd (torch.optim.AdamW semantics:
    p <- p - lr*wd*p - lr * m_hat / (sqrt(v_hat) + eps))."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

    def upd(p, m, v, use_wd):
        step_ = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        decay = jnp.where(use_wd, wd, 0.0)
        return p * (1.0 - lr * decay) - lr * step_

    new_params = jax.tree_util.tree_map(upd, params, mu, nu, mask)
    return new_params, AdamWState(mu=mu, nu=nu, count=count)


def global_norm(tree: Any) -> jnp.ndarray:
    return optax.global_norm(tree)


def clip_by_global_norm(tree: Any, max_norm: float) -> tuple[Any, jnp.ndarray]:
    """torch.nn.utils.clip_grad_norm_ semantics (per-model global norm)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, tree), norm
