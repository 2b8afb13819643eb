"""Few-step ViT-L torch-vs-jax training parity (b1, f32, CPU).

The small-model parity tests (tests/test_step_parity.py) don't cover
large-model numerics: the 24-layer depth-rescaled init, uniform-power 3D pos
embeds at the 224/16 grid, and the d=24 predictor heads. This tool runs the
SAME harness at full ViT-L AV geometry (16x224^2, N=1664 tokens, batch 1) for
a few steps on CPU and reports the per-step loss deviation. Slow (~minutes
per step per side on one core) — run on demand; the result is recorded in
BENCH.md.

Usage: python tools/parity_vitl.py [steps=2]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def main(steps: int = 2):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    import test_step_parity as h
    from avjepa_tpu.layout import TokenLayout
    from avjepa_tpu.masks import AVMaskCollator
    from avjepa_tpu.models.encoder import Encoder
    from avjepa_tpu.models.predictor import Predictor
    from avjepa_tpu.train.optim import ScheduleConfig
    from avjepa_tpu.train.state import init_state
    from avjepa_tpu.train.step import StepConfig, make_train_step, stack_masksets
    from reference_bridge import torch_encoder_to_params, torch_predictor_to_params

    # retarget the shared harness at ViT-L AV geometry (the helper functions
    # read these module globals at call time)
    h.FRAMES, h.CROP, h.PATCH, h.TUBELET = 16, 224, 16, 2
    h.EMBED, h.DEPTH, h.HEADS = 1024, 24, 16
    h.PRED_EMBED, h.PRED_DEPTH = 384, 12
    h.BATCH = 1
    h.LAYOUT = TokenLayout(
        num_frames=h.FRAMES, crop_size=h.CROP, patch_size=h.PATCH,
        tubelet_size=h.TUBELET,
    )
    h.SCHED = dict(h.SCHED, ipe=max(2, steps))

    print("building reference ViT-L models (torch, CPU)...", flush=True)
    enc_t, pred_t, target_t = h.make_ref_models()

    encoder = Encoder(layout=h.LAYOUT, embed_dim=h.EMBED, depth=h.DEPTH,
                      num_heads=h.HEADS, uniform_power=True)
    predictor = Predictor(layout=h.LAYOUT, embed_dim=h.EMBED,
                          predictor_embed_dim=h.PRED_EMBED, depth=h.PRED_DEPTH,
                          num_heads=h.HEADS, uniform_power=True,
                          use_mask_tokens=True, num_mask_tokens=2,
                          zero_init_mask_tokens=True)
    print("copying weights into jax state...", flush=True)
    state = init_state(
        jax.tree_util.tree_map(jnp.asarray, torch_encoder_to_params(enc_t, h.DEPTH)),
        jax.tree_util.tree_map(
            jnp.asarray, torch_predictor_to_params(pred_t, h.PRED_DEPTH)
        ),
    )
    S = h.SCHED
    sched = ScheduleConfig(
        ipe=S["ipe"], num_epochs=S["num_epochs"], ipe_scale=S["ipe_scale"],
        warmup_epochs=S["warmup_epochs"], start_lr=S["start_lr"],
        ref_lr=S["ref_lr"], final_lr=S["final_lr"], ref_wd=S["ref_wd"],
        final_wd=S["final_wd"], ema_start=S["ema_start"], ema_end=S["ema_end"],
    )
    step_cfg = StepConfig(loss_exp=1.0, reg_coeff=0.1, clip_grad=None,
                          warmup_epochs=S["warmup_epochs"], ipe=S["ipe"])
    step_fn = jax.jit(make_train_step(encoder, predictor, sched, step_cfg))

    rng = np.random.default_rng(7)
    videos = [
        rng.normal(size=(1, h.FRAMES, h.CROP, h.CROP, 3)).astype(np.float32)
        for _ in range(steps)
    ]
    audios = [
        rng.normal(size=(1, 128, 192, 1)).astype(np.float32) for _ in range(steps)
    ]
    coll = AVMaskCollator(
        [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 8,
             "spatial_scale": [0.15, 0.15], "temporal_scale": [1.0, 1.0]},
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
             "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]},
        ],
        h.LAYOUT, base_seed=9,
    )
    all_masks = [coll(1) for _ in range(steps)]
    mask_lists = [h.masks_to_index_lists(m) for m in all_masks]

    print("running reference torch steps...", flush=True)
    ref_losses = h.ref_train_steps(
        enc_t, pred_t, target_t, videos, audios, mask_lists, reg_coeff=0.1
    )

    print("running avjepa_tpu jax steps...", flush=True)
    worst = 0.0
    for stp in range(steps):
        enc_m, pred_m, idx, union = stack_masksets(all_masks[stp], with_idx=True)
        state, metrics = step_fn(
            state, jnp.asarray(videos[stp]), jnp.asarray(audios[stp]),
            jnp.asarray(enc_m), jnp.asarray(pred_m),
            tuple(jnp.asarray(i) for i in idx), jnp.asarray(union),
        )
        lj = float(jax.device_get(metrics["loss"]))
        dev = abs(lj - ref_losses[stp]) / max(abs(ref_losses[stp]), 1e-9)
        worst = max(worst, dev)
        print(
            f"step {stp}: ref {ref_losses[stp]:.6f} jax {lj:.6f} "
            f"rel dev {dev:.2e}",
            flush=True,
        )
    print(
        f"ViT-L parity over {steps} steps: max rel dev {worst:.3e} "
        f"({'WITHIN' if worst < 0.01 else 'OUTSIDE'} the 1% target)"
    )
    return worst


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
