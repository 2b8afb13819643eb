"""Golden scheduler parity vs the reference scheduler objects."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from avjepa_tpu.train.optim import ScheduleConfig, ema_at_step, lr_at_step, wd_at_step


def make_ref_schedulers(cfg: ScheduleConfig):
    sys.path.insert(0, "/root/reference")
    from src.utils.schedulers import CosineWDSchedule, WarmupCosineSchedule

    class _FakeOpt:
        param_groups = [{}, {"WD_exclude": True, "weight_decay": 0}]

    opt = _FakeOpt()
    lr = WarmupCosineSchedule(
        opt,
        warmup_steps=cfg.warmup_steps,
        start_lr=cfg.start_lr,
        ref_lr=cfg.ref_lr,
        final_lr=cfg.final_lr,
        T_max=cfg.total_steps,
    )
    wd = CosineWDSchedule(
        opt, ref_wd=cfg.ref_wd, final_wd=cfg.final_wd, T_max=cfg.total_steps
    )
    return lr, wd


@pytest.mark.parametrize("ref_wd,final_wd", [(0.04, 0.4), (0.4, 0.04)])
def test_lr_wd_schedules_match_reference(ref_wd, final_wd):
    cfg = ScheduleConfig(
        ipe=50, num_epochs=10, ipe_scale=1.25, warmup_epochs=2,
        start_lr=2e-4, ref_lr=6.25e-4, final_lr=1e-6,
        ref_wd=ref_wd, final_wd=final_wd,
    )
    ref_lr, ref_wd_s = make_ref_schedulers(cfg)
    steps = cfg.total_steps + 50  # include beyond-T_max behavior
    ref_lrs = [ref_lr.step() for _ in range(steps)]
    ref_wds = [ref_wd_s.step() for _ in range(steps)]
    ours_lr = [float(lr_at_step(cfg, jnp.asarray(s))) for s in range(steps)]
    ours_wd = [float(wd_at_step(cfg, jnp.asarray(s))) for s in range(steps)]
    np.testing.assert_allclose(ours_lr, ref_lrs, rtol=1e-5)
    np.testing.assert_allclose(ours_wd, ref_wds, rtol=1e-5)


def test_ema_schedule():
    cfg = ScheduleConfig(ipe=10, num_epochs=4, ipe_scale=1.25,
                         ema_start=0.996, ema_end=1.0)
    total = cfg.total_steps
    ref = [0.996 + i * (1.0 - 0.996) / total for i in range(total)]
    ours = [float(ema_at_step(cfg, jnp.asarray(i))) for i in range(total)]
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
