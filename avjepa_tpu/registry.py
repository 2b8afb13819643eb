"""App registry: string key -> app main callable.

Replaces the reference's importlib string-dispatch scaffold
(reference: app/scaffold.py:16-21) with an explicit, typo-checked registry.
Each app main takes (config-dict, resume_preempt) like the reference's.
"""

from __future__ import annotations

from typing import Callable


def _avjepa(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.train.pretrain import main

    return main(args, resume_preempt)


def _vjepa(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.train.pretrain import main

    return main(args, resume_preempt)


def _avprediction(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.train.avprediction import main

    return main(args, resume_preempt)


def _avprediction_example(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.train.avprediction import example_main

    return example_main(args, resume_preempt)


def _extract(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.serve.extract import main

    return main(args, resume_preempt)


APPS: dict[str, Callable] = {
    "avjepa": _avjepa,
    "vjepa": _vjepa,
    "avprediction": _avprediction,
    "avprediction_example": _avprediction_example,
    # TPU-build extension: frozen-encoder feature extraction / serving
    # (the reference has no inference entry point)
    "extract": _extract,
}


def app_main(app: str, args: dict, resume_preempt: bool = False):
    if app not in APPS:
        raise KeyError(f"unknown app '{app}'; available: {sorted(APPS)}")
    return APPS[app](args, resume_preempt)


def eval_main(eval_name: str, args: dict, resume_preempt: bool = False):
    """Eval registry (reference: evals/scaffold.py:16-24)."""
    from avjepa_tpu.evals import EVALS

    if eval_name not in EVALS:
        raise KeyError(f"unknown eval '{eval_name}'; available: {sorted(EVALS)}")
    return EVALS[eval_name](args, resume_preempt)
