"""Golden-parity bridge: load the reference PyTorch models (read-only from
/root/reference) and convert their weights into our JAX param pytrees.

This is a *test harness only* — the framework itself never imports torch or the
reference code.
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"


def import_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.models.audiovision_transformer as ref_avt  # noqa
    import src.models.audiovisionpredictor as ref_avp  # noqa

    return ref_avt, ref_avp


def disable_sdpa(module):
    """Force the manual softmax path (the CUDA SDPA context fails on CPU)."""
    for m in module.modules():
        if hasattr(m, "use_sdpa"):
            m.use_sdpa = False


def t2n(t):
    # copy=True is load-bearing: .numpy() shares memory with the torch
    # parameter storage, and jnp.asarray on the CPU backend is zero-copy for
    # aligned arrays — without the copy, a jax state built from these views
    # ALIASES the live torch weights, and any later torch opt.step() mutates
    # the "initial" jax params in place (this silently polluted long-horizon
    # parity runs that train the torch side first).
    return np.array(t.detach().cpu().numpy(), copy=True)


def _numpy_sd(ref_model) -> dict:
    return {k: t2n(v) for k, v in ref_model.state_dict().items()}


def torch_encoder_to_params(ref_model, depth: int) -> dict:
    """Map reference AudioVisionTransformer weights -> our Encoder params
    (thin wrapper over the product converter in utils/torch_import.py)."""
    from avjepa_tpu.utils.torch_import import encoder_params_from_state_dict

    return encoder_params_from_state_dict(_numpy_sd(ref_model), depth)


def torch_predictor_to_params(ref_model, depth: int) -> dict:
    from avjepa_tpu.utils.torch_import import predictor_params_from_state_dict

    return predictor_params_from_state_dict(_numpy_sd(ref_model), depth)
