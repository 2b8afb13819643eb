"""Preemption handling: SIGTERM mid-epoch checkpoints and the restarted run
resumes from that step (reference requeues via submitit+SLURM,
app/main_distributed.py:65-67; the TPU runbook is COVERAGE.md's
supervisor-restart + AVJEPA_RESUME_PREEMPT=1)."""

import os
import re
import signal
import subprocess
import sys
import time

import yaml


def _tiny_cfg(folder: str) -> dict:
    return {
        "app": "avjepa",
        "meta": {"seed": 3, "dtype": "float32"},
        "data": {
            "source": "synthetic",
            "batch_size": 2,
            "num_frames": 4,
            "tubelet_size": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 1,
        },
        "model": {"model_name": "vit_tiny", "pred_depth": 2, "pred_embed_dim": 48},
        # many steps per epoch so SIGTERM lands MID-epoch
        "optimization": {"ipe": 2000, "epochs": 2, "warmup": 1,
                         "lr": 1e-3, "start_lr": 2e-4, "final_lr": 0.0},
        "mask": [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
             "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]},
        ],
        "logging": {"folder": folder, "write_tag": "preempt", "log_freq": 1},
    }


def test_sigterm_checkpoints_and_resume(tmp_path):
    folder = str(tmp_path)
    cfg_path = os.path.join(folder, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_tiny_cfg(folder), f)

    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"

    proc = subprocess.Popen(
        [sys.executable, "-m", "avjepa_tpu.app.main", "--fname", cfg_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    # wait for a few training iterations, then preempt. Count DISTINCT
    # iteration indices, not raw "loss:" matches — a duplicated log handler
    # (root-logger propagation) once double-printed each step line and made
    # 3 matches ≈ 1.5 completed steps
    seen_itrs = set()
    deadline = time.time() + 1200
    for line in proc.stdout:
        # iteration tag is the "[epoch, itr]" prefix before "loss:"
        m = re.search(r"\[(\d+),\s*(\d+)\] loss:", line)
        if m:
            seen_itrs.add((m.group(1), m.group(2)))
        if len(seen_itrs) >= 3:
            break
        if time.time() > deadline:
            proc.kill()
            raise AssertionError("run never reached 3 iterations")
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    proc.wait(timeout=300)
    assert proc.returncode == 0, out[-3000:]
    assert "preempted: checkpoint saved at step" in out, out[-3000:]

    ckpt_dir = os.path.join(folder, "preempt-ckpt")
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps and max(steps) >= 3, steps
    # mid-epoch: step is NOT an epoch multiple (ipe=2000, stopped at ~3)
    assert max(steps) < 2000

    # restart with the preemption env: must resume from the saved step
    env["AVJEPA_RESUME_PREEMPT"] = "1"
    proc2 = subprocess.Popen(
        [sys.executable, "-m", "avjepa_tpu.app.main", "--fname", cfg_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    resumed = False
    deadline = time.time() + 1200
    for line in proc2.stdout:
        if f"resumed from step {max(steps)}" in line:
            resumed = True
            proc2.send_signal(signal.SIGTERM)
        if time.time() > deadline:
            break
    proc2.wait(timeout=300)
    assert resumed, "restart did not resume from the SIGTERM checkpoint"
