"""CLI launcher: ``python -m avjepa_tpu.app.main --fname cfg.yaml``.

Reference parity (reference: app/main.py:28-71) minus the per-GPU process
spawning — on TPU one process per host drives all local chips through the
jitted mesh program; multi-host runs launch this same entry on every host
(``AVJEPA_MULTIHOST=1`` triggers jax.distributed.initialize).
"""

from __future__ import annotations

import argparse
import os

import yaml


def launch(fname: str, dump_dir: str | None = None) -> None:
    from avjepa_tpu.config import load_config
    from avjepa_tpu.parallel.mesh import init_distributed
    from avjepa_tpu.registry import app_main
    from avjepa_tpu.utils.logging import get_logger

    init_distributed()
    import jax

    logger = get_logger(rank=jax.process_index())
    logger.info(f"loading config {fname}")
    with open(fname) as f:
        params = yaml.safe_load(f)

    cfg = load_config(params)
    # dump effective params next to logs for reproducibility
    folder = dump_dir or cfg.logging.folder
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "params-pretrain.yaml"), "w") as f:
        yaml.safe_dump(params, f)

    logger.info(f"launching app '{cfg.app}' on {jax.device_count()} devices")
    # preemption restart: the supervisor (or operator) sets this env and the
    # run resumes from the SIGTERM checkpoint (see COVERAGE.md runbook;
    # reference requeues via submitit, app/main_distributed.py:65-67)
    from avjepa_tpu.utils import env_flag

    resume_preempt = env_flag("AVJEPA_RESUME_PREEMPT")
    if resume_preempt:
        logger.info("AVJEPA_RESUME_PREEMPT=1: resuming from latest checkpoint")
    app_main(cfg.app, params, resume_preempt=resume_preempt)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--fname", type=str, required=True, help="yaml config path")
    parser.add_argument(
        "--folder", type=str, default=None, help="override log/dump folder"
    )
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    launch(args.fname, args.folder)
