"""Every YAML shipped in configs/ must parse and validate."""

import glob
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "configs", "pretrain", "*.yaml")))
)
def test_pretrain_config_valid(path):
    from avjepa_tpu.config import load_config

    cfg = load_config(path)
    cfg.validate()
    # the layout must be constructible and produce a positive token count
    assert cfg.layout().num_tokens > 0


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(REPO, "configs", "evals", "*.yaml")))
)
def test_eval_config_valid(path):
    with open(path) as f:
        d = yaml.safe_load(f)
    name = d.get("eval_name", "")
    if "video_classification" in name:
        from avjepa_tpu.evals.video_classification import config_from_yaml
    elif "image_classification" in name:
        from avjepa_tpu.evals.image_classification import config_from_yaml
    elif "av_prediction" in name:
        from avjepa_tpu.evals.av_prediction import config_from_yaml
    else:
        raise AssertionError(f"{path}: unknown eval_name {name!r}")
    cfg = config_from_yaml(d)
    from avjepa_tpu.models.factory import VIT_SPECS

    assert cfg.model_name in VIT_SPECS
    assert cfg.batch_size > 0 and cfg.num_epochs > 0


def test_eval_config_tolerates_bare_sections():
    """A bare YAML section key ('logging:' with no body) parses to None;
    config_from_yaml must fall back to defaults, not AttributeError."""
    from avjepa_tpu.evals import image_classification, video_classification

    d = {"data": None, "optimization": None, "pretrain": None,
         "logging": None, "tpu": None}
    icfg = image_classification.config_from_yaml(d)
    assert icfg.folder == "./eval_logs" and icfg.resolution == 224
    vcfg = video_classification.config_from_yaml(d)
    assert vcfg.folder == "./eval_logs"
