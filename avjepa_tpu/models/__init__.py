from avjepa_tpu.models.encoder import Encoder
from avjepa_tpu.models.predictor import Predictor
from avjepa_tpu.models.factory import (
    VIT_EMBED_DIMS,
    VIT_SPECS,
    count_parameters,
    init_encoder_params,
    init_predictor_params,
    make_encoder,
    make_predictor,
)

__all__ = [
    "Encoder",
    "Predictor",
    "VIT_EMBED_DIMS",
    "VIT_SPECS",
    "count_parameters",
    "init_encoder_params",
    "init_predictor_params",
    "make_encoder",
    "make_predictor",
]
