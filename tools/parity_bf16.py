"""Training fidelity of the SHIPPED bf16 path vs f32 — the production-dtype
drift bound behind BASELINE.md's "loss curve within 1%" target.

Every other parity artifact (tools/parity_curve.py, tools/parity_vitl.py,
tests/test_step_parity.py) runs f32 on CPU, while production trains bf16
with the Pallas flash kernels, tanh GELU, and the scan cast hoist's extra
bf16 dW rounding (train/step.py::cast_dense_params). This tool measures the
drift of that exact path two ways:

  --mode chip   (run on the TPU chip) the full north-star geometry: two runs
                of the SAME framework from the SAME seed/weights on the SAME
                per-step data (generated on-device from per-step PRNG keys,
                cast to each run's dtype) and the SAME mask draws — one at
                meta.dtype=bfloat16 (production: flash kernels, cast hoist,
                remat), one at float32. Prints per-step losses, the running
                max relative deviation, and the first step (if any) where
                the curves diverge past 1%.
  --mode torch  (CPU) cross-FRAMEWORK check at the tiny step-parity geometry:
                the reference's torch models under torch.autocast(bf16) —
                the reference's own mixed-precision semantics
                (reference: app/avjepa/train.py:83-91,502-524) — vs our
                bf16 step (XLA attention on CPU; the flash kernel's bf16
                forward is separately tested bit-identical to XLA), both
                from identical weights/data/masks.
  --mode dtype-control
                (CPU) the REFERENCE compared against ITSELF: torch f32 vs
                torch autocast(bf16) from identical weights/data/masks.
                This isolates how much loss-curve drift the bf16 dtype
                *intrinsically* causes in the reference's own training
                math, independent of any framework difference — the
                yardstick for judging the chip-mode bf16-vs-f32 number.

Usage:
  python tools/parity_bf16.py --mode chip  [--model vit_large] [--batch 24] [--steps 200]
  python tools/parity_bf16.py --mode torch [--steps 60] [--reg-coeff 0.1]
  python tools/parity_bf16.py --mode dtype-control [--steps 200] [--reg-coeff 0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def _deviation_report(losses_ref, losses_test, label_ref, label_test,
                      print_every: int = 1):
    worst = 0.0
    first_over_1pct = None
    print(f"{'step':>5} {label_ref:>14} {label_test:>14} {'rel dev':>10}")
    for i, (lr, lt) in enumerate(zip(losses_ref, losses_test)):
        dev = abs(lt - lr) / max(abs(lr), 1e-9)
        worst = max(worst, dev)
        if dev > 0.01 and first_over_1pct is None:
            first_over_1pct = i
        if i % print_every == 0 or dev > 0.01:
            print(f"{i:>5} {lr:>14.6f} {lt:>14.6f} {dev:>10.2e}")
    n = len(losses_ref)
    print(f"max relative deviation over {n} steps: {worst:.3e}"
          f" ({'WITHIN' if worst < 0.01 else 'OUTSIDE'} the 1% target)")
    if first_over_1pct is not None:
        print(f"first step past 1%: {first_over_1pct}")
    print(json.dumps({
        "steps": n, "max_rel_dev": worst,
        "first_step_over_1pct": first_over_1pct,
        "ref": label_ref, "test": label_test,
    }))
    return worst, first_over_1pct


def mode_chip(model: str, batch: int, steps: int):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from avjepa_tpu.config import load_config
    from avjepa_tpu.masks.multiblock3d import make_mask_collator
    from avjepa_tpu.train import pretrain
    from avjepa_tpu.train.step import stack_masksets
    from bench import north_star_config

    # one collator, all mask draws up front: both runs replay the identical
    # sequence (per-draw K buckets repeat across runs, bounding compiles)
    base = load_config(north_star_config(model, batch))
    layout = base.layout()
    coll = make_mask_collator("multiblock3d", base.mask, layout, base_seed=7)
    drawn = [coll(batch) for _ in range(steps)]
    stacked = [stack_masksets(m, with_idx=True) for m in drawn]
    buckets = sorted({s[0].shape[-1] for s in stacked} |
                     {s[1].shape[-1] for s in stacked})
    print(f"mask K buckets across {steps} draws: {buckets}")

    vshape = (batch, layout.num_frames, layout.crop_size, layout.crop_size, 3)
    ashape = (batch, layout.spec_height, layout.spec_width, 1)

    def run(dtype: str):
        cfgd = north_star_config(model, batch)
        cfgd["meta"]["dtype"] = dtype
        # both runs use the flash kernels (f32 rows get halved VMEM block
        # budgets inside ops/flash_attention.py), so the comparison isolates
        # dtype, not kernel. XLA attention at f32 was tried and OOMs HBM
        # (materialized [B,H,N,N] scores: 17.7G vs 15.75G).
        cfg = load_config(cfgd)
        handles = pretrain.setup(cfg)
        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        @jax.jit
        def gen(key):
            kv, ka = jax.random.split(key)
            # generate in f32 so both runs see the same sample values, cast
            # to the run's dtype exactly as the loader ships pixels
            v = jax.random.normal(kv, vshape, jnp.float32).astype(dt)
            a = jax.random.normal(ka, ashape, jnp.float32).astype(dt)
            return v, a

        state = handles.state
        step_light = handles.step_fn_light or handles.step_fn
        step_full = handles.step_fn
        losses = []
        for i in range(steps):
            video, audio = gen(jax.random.key(1000 + i))
            enc_m, pred_m, idx, union = stacked[i]
            fn = step_full if i % 10 == 0 else step_light
            state, metrics = fn(
                state, video, audio, jnp.asarray(enc_m), jnp.asarray(pred_m),
                tuple(jnp.asarray(x) for x in idx), jnp.asarray(union),
            )
            losses.append(float(jax.device_get(metrics["loss"])))
        del state, handles
        return losses

    print(f"== {model} b{batch} {steps} steps, production bf16 "
          "(flash kernels, cast hoist, remat) ==")
    cache = os.path.join("/tmp", f"parity_bf16_{model}_b{batch}_s{steps}")

    def cached_run(dtype: str):
        path = f"{cache}_{dtype}.json"
        if os.path.exists(path):
            with open(path) as f:
                print(f"(reusing cached {dtype} losses from {path})")
                return json.load(f)
        losses = run(dtype)
        with open(path, "w") as f:
            json.dump(losses, f)
        return losses

    l_bf16 = cached_run("bfloat16")
    print(f"== {model} b{batch} {steps} steps, float32 (same framework, "
          "same data/masks/weights) ==")
    l_f32 = cached_run("float32")
    return _deviation_report(
        l_f32, l_bf16, "f32", "bf16(prod)",
        print_every=max(1, steps // 40),
    )


def mode_torch(steps: int, reg_coeff: float):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    import test_step_parity as h
    from avjepa_tpu.masks import AVMaskCollator
    from avjepa_tpu.models.encoder import Encoder
    from avjepa_tpu.models.predictor import Predictor
    from avjepa_tpu.train.optim import ScheduleConfig
    from avjepa_tpu.train.state import init_state
    from avjepa_tpu.train.step import StepConfig, make_train_step, stack_masksets
    from reference_bridge import torch_encoder_to_params, torch_predictor_to_params

    enc_t, pred_t, target_t = h.make_ref_models()
    # our side at the SHIPPED compute dtype (bf16) + tanh GELU; torch side
    # keeps its exact-GELU f32 modules under autocast, which is precisely the
    # reference's production configuration
    common = dict(layout=h.LAYOUT, uniform_power=True, dtype=jnp.bfloat16,
                  gelu="tanh")
    encoder = Encoder(embed_dim=h.EMBED, depth=h.DEPTH, num_heads=h.HEADS,
                      **common)
    predictor = Predictor(embed_dim=h.EMBED, predictor_embed_dim=h.PRED_EMBED,
                          depth=h.PRED_DEPTH, num_heads=h.HEADS,
                          use_mask_tokens=True, num_mask_tokens=2,
                          zero_init_mask_tokens=True, **common)
    state = init_state(
        jax.tree_util.tree_map(jnp.asarray, torch_encoder_to_params(enc_t, h.DEPTH)),
        jax.tree_util.tree_map(
            jnp.asarray, torch_predictor_to_params(pred_t, h.PRED_DEPTH)),
    )
    S = dict(h.SCHED)
    S["ipe"] = max(2, steps // 4)
    sched = ScheduleConfig(
        ipe=S["ipe"], num_epochs=S["num_epochs"], ipe_scale=S["ipe_scale"],
        warmup_epochs=S["warmup_epochs"], start_lr=S["start_lr"],
        ref_lr=S["ref_lr"], final_lr=S["final_lr"], ref_wd=S["ref_wd"],
        final_wd=S["final_wd"], ema_start=S["ema_start"], ema_end=S["ema_end"],
    )
    step_cfg = StepConfig(loss_exp=1.0, reg_coeff=reg_coeff, clip_grad=None,
                          warmup_epochs=S["warmup_epochs"], ipe=S["ipe"])
    step_fn = jax.jit(make_train_step(encoder, predictor, sched, step_cfg))

    rng = np.random.default_rng(42)
    videos = [rng.normal(size=(h.BATCH, h.FRAMES, h.CROP, h.CROP, 3))
              .astype(np.float32) for _ in range(steps)]
    audios = [rng.normal(size=(h.BATCH, 128, 192, 1)).astype(np.float32)
              for _ in range(steps)]
    coll = AVMaskCollator(
        [{"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
          "spatial_scale": [0.2, 0.2], "temporal_scale": [1.0, 1.0]},
         {"aspect_ratio": [0.75, 1.5], "num_blocks": 1,
          "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]}],
        h.LAYOUT, base_seed=9,
    )
    all_masks = [coll(h.BATCH) for _ in range(steps)]
    mask_lists = [h.masks_to_index_lists(m) for m in all_masks]

    h.SCHED["ipe"] = S["ipe"]
    ref_losses = h.ref_train_steps(
        enc_t, pred_t, target_t, videos, audios, mask_lists,
        reg_coeff=reg_coeff, autocast_dtype=torch.bfloat16,
    )

    jax_losses = []
    for stp in range(steps):
        enc_m, pred_m, idx, union = stack_masksets(all_masks[stp], with_idx=True)
        state, metrics = step_fn(
            state,
            jnp.asarray(videos[stp], jnp.bfloat16),
            jnp.asarray(audios[stp], jnp.bfloat16),
            jnp.asarray(enc_m), jnp.asarray(pred_m),
            tuple(jnp.asarray(i) for i in idx), jnp.asarray(union),
        )
        jax_losses.append(float(jax.device_get(metrics["loss"])))
    return _deviation_report(ref_losses, jax_losses,
                             "torch-AMP(bf16)", "jax-bf16")


def mode_dtype_control(steps: int, reg_coeff: float):
    """Reference-vs-itself: torch f32 vs torch autocast(bf16), same
    weights/data/masks.  make_ref_models() reseeds torch.manual_seed(0), so
    two calls give bit-identical initial weights; ref_train_steps mutates
    its models in place, so each run gets a fresh triple."""
    import numpy as np
    import torch

    import test_step_parity as h
    from avjepa_tpu.masks import AVMaskCollator

    rng = np.random.default_rng(42)
    videos = [rng.normal(size=(h.BATCH, h.FRAMES, h.CROP, h.CROP, 3))
              .astype(np.float32) for _ in range(steps)]
    audios = [rng.normal(size=(h.BATCH, 128, 192, 1)).astype(np.float32)
              for _ in range(steps)]
    coll = AVMaskCollator(
        [{"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
          "spatial_scale": [0.2, 0.2], "temporal_scale": [1.0, 1.0]},
         {"aspect_ratio": [0.75, 1.5], "num_blocks": 1,
          "spatial_scale": [0.6, 0.6], "temporal_scale": [1.0, 1.0]}],
        h.LAYOUT, base_seed=9,
    )
    mask_lists = [h.masks_to_index_lists(m) for m in
                  [coll(h.BATCH) for _ in range(steps)]]
    h.SCHED["ipe"] = max(2, steps // 4)

    print(f"== reference torch f32, {steps} steps ==")
    enc, pred, target = h.make_ref_models()
    f32_losses = h.ref_train_steps(enc, pred, target, videos, audios,
                                   mask_lists, reg_coeff=reg_coeff)
    print(f"== reference torch autocast(bf16), {steps} steps, same "
          "weights/data/masks ==")
    enc, pred, target = h.make_ref_models()
    bf16_losses = h.ref_train_steps(enc, pred, target, videos, audios,
                                    mask_lists, reg_coeff=reg_coeff,
                                    autocast_dtype=torch.bfloat16)
    return _deviation_report(f32_losses, bf16_losses,
                             "torch-f32", "torch-bf16",
                             print_every=max(1, steps // 40))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--mode", choices=["chip", "torch", "dtype-control"],
                    default="chip")
    ap.add_argument("--model", default="vit_large")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--reg-coeff", type=float, default=0.1)
    args = ap.parse_args()
    if args.mode == "chip":
        mode_chip(args.model, args.batch, args.steps)
    elif args.mode == "dtype-control":
        mode_dtype_control(args.steps, args.reg_coeff)
    else:
        mode_torch(min(args.steps, 60) if args.steps == 200 else args.steps,
                   args.reg_coeff)
