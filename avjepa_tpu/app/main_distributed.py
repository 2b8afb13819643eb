"""Multi-host / batch launcher.

Reference parity: app/main_distributed.py (submitit SLURM launcher with
batch-launch of many configs and preemption requeue). On TPU pods there is no
SLURM layer — the TPU runtime starts one process per host and
``jax.distributed.initialize()`` performs the rendezvous — so this launcher
keeps the *capabilities*:

- ``--batch-launch``: run a list of YAML configs sequentially;
- preemption safety: every run writes Orbax checkpoints each epoch and
  ``--resume-preempt`` (or the AVJEPA_RESUME_PREEMPT env the operator's
  supervisor can set on requeue) restarts from the latest checkpoint;
- ``--folder`` overrides the log/dump folder per config.

Usage (on every host of the pod, e.g. via `gcloud compute tpus tpu-vm ssh
--worker=all`):
    AVJEPA_MULTIHOST=1 python -m avjepa_tpu.app.main_distributed \
        --fname cfg1.yaml cfg2.yaml --batch-launch
"""

from __future__ import annotations

import argparse
import os

import yaml


def launch_one(fname: str, folder: str | None, resume_preempt: bool) -> None:
    from avjepa_tpu.registry import app_main, eval_main
    from avjepa_tpu.utils.logging import get_logger

    import jax

    logger = get_logger(rank=jax.process_index())
    with open(fname) as f:
        params = yaml.safe_load(f)
    if folder:
        # a bare 'logging:' key parses to None — setdefault would return it
        if params.get("logging") is None:
            params["logging"] = {}
        params["logging"]["folder"] = folder
    if "eval_name" in params:
        # eval configs batch-launch through the same entry
        # (reference: evals/main_distributed.py)
        logger.info(
            f"[host {jax.process_index()}/{jax.process_count()}] launching eval "
            f"'{params['eval_name']}' from {fname}"
        )
        eval_main(params["eval_name"], params, resume_preempt=resume_preempt)
        return
    app = params.get("app", "avjepa")
    logger.info(
        f"[host {jax.process_index()}/{jax.process_count()}] launching '{app}' "
        f"from {fname} (resume_preempt={resume_preempt})"
    )
    app_main(app, params, resume_preempt=resume_preempt)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--fname", type=str, nargs="+", required=True,
                        help="one or more yaml configs")
    parser.add_argument("--folder", type=str, default=None)
    parser.add_argument("--batch-launch", action="store_true",
                        help="run all configs sequentially (reference batch mode)")
    parser.add_argument("--resume-preempt", action="store_true")
    args = parser.parse_args(argv)

    from avjepa_tpu.parallel.mesh import init_distributed

    init_distributed()
    from avjepa_tpu.utils import env_flag

    resume = args.resume_preempt or env_flag("AVJEPA_RESUME_PREEMPT")
    configs = args.fname if args.batch_launch else args.fname[:1]
    for fname in configs:
        launch_one(fname, args.folder, resume)


if __name__ == "__main__":
    main()
