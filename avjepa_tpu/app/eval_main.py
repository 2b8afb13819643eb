"""Eval CLI: ``python -m avjepa_tpu.app.eval_main --fname eval_cfg.yaml``.

Reference parity: evals/main.py (--fname, eval_name key dispatch). Setting
``AVJEPA_RESUME_PREEMPT=1`` resumes the probe classifier from its own
checkpoint (the reference's submitit resume_preempt,
evals/main_distributed.py).
"""

from __future__ import annotations

import argparse
import os

import yaml


def launch(fname: str) -> None:
    from avjepa_tpu.parallel.mesh import init_distributed
    from avjepa_tpu.registry import eval_main
    from avjepa_tpu.utils.logging import get_logger

    init_distributed()
    import jax

    logger = get_logger(rank=jax.process_index())
    with open(fname) as f:
        params = yaml.safe_load(f)
    eval_name = params.get("eval_name")
    from avjepa_tpu.utils import env_flag

    resume_preempt = env_flag("AVJEPA_RESUME_PREEMPT")
    if resume_preempt:
        logger.info("AVJEPA_RESUME_PREEMPT=1: resuming probe classifier")
    logger.info(f"running eval '{eval_name}'")
    eval_main(eval_name, params, resume_preempt=resume_preempt)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--fname", type=str, required=True)
    args = parser.parse_args()
    launch(args.fname)
