"""Long-horizon loss-curve parity vs the reference's training math.

Reuses the step-parity harness (tests/test_step_parity.py): reference torch
models' weights are copied into our state, then BOTH frameworks train for N
steps on identical data and masks. Prints the per-step losses and the
running max relative deviation — the evidence behind BASELINE.md's
"loss curve within 1% of reference" target.

Usage: python tools/parity_curve.py [steps=40]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# CPU: the reference side is torch-CPU; keep both sides on the same host math
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def main(steps: int = 40):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    import test_step_parity as h
    from avjepa_tpu.masks import AVMaskCollator
    from avjepa_tpu.models.encoder import Encoder
    from avjepa_tpu.models.predictor import Predictor
    from avjepa_tpu.train.optim import ScheduleConfig
    from avjepa_tpu.train.state import init_state
    from avjepa_tpu.train.step import StepConfig, make_train_step, stack_masksets
    from reference_bridge import torch_encoder_to_params, torch_predictor_to_params

    enc_t, pred_t, target_t = h.make_ref_models()
    encoder = Encoder(layout=h.LAYOUT, embed_dim=h.EMBED, depth=h.DEPTH,
                      num_heads=h.HEADS, uniform_power=True)
    predictor = Predictor(layout=h.LAYOUT, embed_dim=h.EMBED,
                          predictor_embed_dim=h.PRED_EMBED, depth=h.PRED_DEPTH,
                          num_heads=h.HEADS, uniform_power=True,
                          use_mask_tokens=True, num_mask_tokens=2,
                          zero_init_mask_tokens=True)
    state = init_state(
        jax.tree_util.tree_map(jnp.asarray, torch_encoder_to_params(enc_t, h.DEPTH)),
        jax.tree_util.tree_map(
            jnp.asarray, torch_predictor_to_params(pred_t, h.PRED_DEPTH)
        ),
    )
    S = dict(h.SCHED)
    S["ipe"] = steps  # keep the whole run inside the schedule's first epochs
    sched = ScheduleConfig(
        ipe=S["ipe"], num_epochs=S["num_epochs"], ipe_scale=S["ipe_scale"],
        warmup_epochs=S["warmup_epochs"], start_lr=S["start_lr"],
        ref_lr=S["ref_lr"], final_lr=S["final_lr"], ref_wd=S["ref_wd"],
        final_wd=S["final_wd"], ema_start=S["ema_start"], ema_end=S["ema_end"],
    )
    step_cfg = StepConfig(loss_exp=1.0, reg_coeff=0.0, clip_grad=None,
                          warmup_epochs=S["warmup_epochs"], ipe=S["ipe"])
    step_fn = jax.jit(make_train_step(encoder, predictor, sched, step_cfg))

    rng = np.random.default_rng(42)
    videos = [
        rng.normal(size=(h.BATCH, h.FRAMES, h.CROP, h.CROP, 3)).astype(np.float32)
        for _ in range(steps)
    ]
    audios = [
        rng.normal(size=(h.BATCH, 128, 192, 1)).astype(np.float32)
        for _ in range(steps)
    ]
    coll = AVMaskCollator(
        [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
             "spatial_scale": [0.2, 0.2], "temporal_scale": [1.0, 1.0]},
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 1,
             "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]},
        ],
        h.LAYOUT, base_seed=9,
    )
    all_masks = [coll(h.BATCH) for _ in range(steps)]
    mask_lists = [h.masks_to_index_lists(m) for m in all_masks]

    # the reference schedule objects need the matching horizon too
    h.SCHED["ipe"] = steps
    ref_losses = h.ref_train_steps(
        enc_t, pred_t, target_t, videos, audios, mask_lists
    )

    jax_losses = []
    worst = 0.0
    print(f"{'step':>5} {'reference':>12} {'avjepa_tpu':>12} {'rel dev':>10}")
    for stp in range(steps):
        enc_m, pred_m = stack_masksets(all_masks[stp])
        state, metrics = step_fn(
            state, jnp.asarray(videos[stp]), jnp.asarray(audios[stp]),
            jnp.asarray(enc_m), jnp.asarray(pred_m),
        )
        lj = float(jax.device_get(metrics["loss"]))
        jax_losses.append(lj)
        dev = abs(lj - ref_losses[stp]) / max(abs(ref_losses[stp]), 1e-9)
        worst = max(worst, dev)
        print(f"{stp:>5} {ref_losses[stp]:>12.6f} {lj:>12.6f} {dev:>10.2e}")
    print(f"max relative deviation over {steps} steps: {worst:.3e}"
          f" ({'WITHIN' if worst < 0.01 else 'OUTSIDE'} the 1% target)")
    return worst


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
