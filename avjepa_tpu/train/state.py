"""Train-state pytree for JEPA pretraining."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from avjepa_tpu.train.optim import AdamWState, adamw_init


@struct.dataclass
class JepaState:
    step: jnp.ndarray  # int32 global step
    enc_params: Any
    pred_params: Any
    target_params: Any  # EMA copy of enc_params
    enc_opt: AdamWState
    pred_opt: AdamWState


def init_state(enc_params, pred_params) -> JepaState:
    import jax

    return JepaState(
        step=jnp.zeros((), jnp.int32),
        enc_params=enc_params,
        pred_params=pred_params,
        # real copy (deepcopy in the reference, app/avjepa/train.py:224) — an
        # alias would make jit donation see the same buffer twice
        target_params=jax.tree_util.tree_map(jnp.copy, enc_params),
        enc_opt=adamw_init(enc_params),
        pred_opt=adamw_init(pred_params),
    )
