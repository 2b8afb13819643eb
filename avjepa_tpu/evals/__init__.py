"""Eval registry (reference: evals/scaffold.py)."""

from typing import Callable


def _video(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.evals.video_classification import main

    return main(args, resume_preempt)


def _image(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.evals.image_classification import main

    return main(args, resume_preempt)


def _av_prediction(args: dict, resume_preempt: bool = False):
    from avjepa_tpu.evals.av_prediction import main

    return main(args, resume_preempt)


EVALS: dict[str, Callable] = {
    "video_classification_frozen": _video,
    "image_classification_frozen": _image,
    "av_prediction": _av_prediction,
}
