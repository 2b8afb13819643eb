"""One-command full-pipeline chain on real media files, through the real CLIs.

Reproduces the reference's end-to-end user journey (SURVEY §3 call stacks)
as ONE driver so the whole framework is exercised as a system, not as parts:

  1. media      — generate N real AV clips (native libav encoder,
                  avjepa_tpu/data/video_decoder.py::write_test_video) plus
                  train/val index CSVs ("path label" lines, the reference's
                  CSV layout, src/datasets/audiovideo_dataset.py)
  2. pretrain   — `python -m avjepa_tpu.app.main --fname pretrain.yaml`
                  (AV JEPA, process-worker loader over the real files)
  3. roundtrip  — export the fresh Orbax checkpoint to a reference-format
                  .pth.tar and re-import it
                  (tools/convert_reference_checkpoint.py both directions);
                  assert the re-imported encoder weights match bit-exactly
  4. video_eval — `python -m avjepa_tpu.app.eval_main` frozen
                  video-classification probe ON the pretrained checkpoint,
                  real files, multi-segment/multi-view
  5. avpred     — avprediction probe app on the frozen pretrained JEPA
  6. example    — avprediction_example: reconstruction .npz (+ PNG when
                  matplotlib is available)

Each stage is a subprocess of the real CLI with its log under
<workdir>/logs/; the driver prints one summary JSON line at the end
(recorded in BENCH.md). Tiny geometry by default so CI can run it; pass
--model vit_large --crop 224 --frames 16 --batch 24 for the flagship chain
on a real chip (`make chain` does).

Usage: python tools/run_chain.py [--workdir DIR] [--clips N] [--model M] ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np
import yaml

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def sh(stage: str, argv: list[str], workdir: str, env=None) -> float:
    log = os.path.join(workdir, "logs", f"{stage}.log")
    os.makedirs(os.path.dirname(log), exist_ok=True)
    t0 = time.perf_counter()
    with open(log, "w") as f:
        rc = subprocess.call(argv, stdout=f, stderr=subprocess.STDOUT,
                             cwd=_REPO, env=env)
    dt = time.perf_counter() - t0
    if rc != 0:
        tail = open(log).read()[-4000:]
        raise RuntimeError(f"stage {stage} failed (rc={rc}):\n{tail}")
    print(f"[chain] {stage}: ok ({dt:.1f}s, log {log})", flush=True)
    return dt


def class_av_content(label: int, rng: np.random.Generator, n_frames: int,
                     w: int, h: int, fps: float = 25.0, sr: int = 22050):
    """Author one clip with genuinely class-separable AV statistics.

    The class signal is SPATIO-TEMPORAL (motion direction), not a static cue
    a random frozen encoder could trivially carry to the probe, and it is
    present in both modalities:
      class 0: grating drifts RIGHT;  tone ~420 Hz
      class 1: grating drifts LEFT;   tone ~950 Hz
      class 2: grating drifts DOWN;   tone ~2100 Hz
    Per-clip randomness (spatial frequency, phase, contrast, speed, texture
    noise, tone jitter/AM) keeps individual clips distinct within a class.
    """
    y, x = np.meshgrid(
        np.linspace(0, 2 * np.pi, h, dtype=np.float32),
        np.linspace(0, 2 * np.pi, w, dtype=np.float32),
        indexing="ij",
    )
    fx = rng.uniform(2.0, 4.0)
    fy = rng.uniform(0.0, 1.0)
    phase0 = rng.uniform(0, 2 * np.pi)
    speed = rng.uniform(0.5, 0.9)  # radians/frame — several px/frame drift
    contrast = rng.uniform(80, 120)
    # sin(fx*x + d*s*t) drifts RIGHT when d<0 (phase x_shift = -d*s*t/fx)
    dir_v = {0: -1.0, 1: +1.0, 2: 0.0}[label]
    texture = rng.normal(0, 12, (h, w, 1)).astype(np.float32)  # static, per clip
    frames_u8 = np.empty((n_frames, h, w, 3), np.uint8)
    for t in range(n_frames):
        if label < 2:  # horizontal drift, sign = class
            arg = fx * x + fy * y + phase0 + dir_v * speed * t
        else:  # vertical drift
            arg = fx * y + fy * x + phase0 + speed * t
        img = 127.5 + contrast * np.sin(arg)[..., None] + texture
        img = img + rng.normal(0, 6, (h, w, 1))
        frames_u8[t] = np.clip(img, 0, 255).astype(np.uint8)

    n_samp = int(n_frames / fps * sr)
    tt = np.arange(n_samp, dtype=np.float32) / sr
    f0 = {0: 420.0, 1: 950.0, 2: 2100.0}[label] * rng.uniform(0.92, 1.08)
    am = 1.0 + 0.3 * np.sin(2 * np.pi * rng.uniform(1.0, 3.0) * tt)
    pcm = 0.4 * am * np.sin(2 * np.pi * f0 * tt + rng.uniform(0, 2 * np.pi))
    pcm = pcm + rng.normal(0, 0.02, n_samp)
    return frames_u8, pcm.astype(np.float32), sr


def class_av_content_envelope(label: int, rng: np.random.Generator,
                              n_frames: int, w: int, h: int,
                              fps: float = 25.0, sr: int = 22050):
    """Drift-balanced (second-order motion) class media.

    The round-5 control measurement showed the first-order `class_av_content`
    task is INVALID as a learning discriminator: an attentive probe is a
    quadratic function of the tokens, first-order motion direction is a
    quadratic statistic of the pixels (spatiotemporal motion energy), and a
    random frozen ViT preserves pixels well enough that the control probe
    hits 100% val top-1 even from 2 train clips per class. This task buries
    the class signal one nonlinearity deeper (Chubb-Sperling drift-balanced
    stimuli): a STATIC noise carrier is multiplied by a drifting CONTRAST
    envelope. For every carrier realization the two first-order sidebands
    carry equal energy in opposite directions, so no quadratic statistic of
    the pixels sees the envelope's direction — extracting it needs
    rectification first (4th order in pixels). A global camera-jitter random
    walk adds classless first-order motion on top to poison motion-energy
    shortcuts. JEPA pretraining, by contrast, must represent the envelope
    phase trajectory to predict masked target features, making the class
    signal linearly salient to the probe only AFTER learning:
      class 0: envelope phase drifts +omega / frame; tone ~420 Hz
      class 1: envelope phase drifts -omega / frame; tone ~950 Hz
      class 2: envelope phase random-walks (+-omega steps); tone ~2100 Hz
    Per-clip nuisance: carrier realization, envelope orientation (+-40 deg
    of horizontal so the drift sign is well-defined), spatial frequency,
    speed, modulation depth, jitter path, sensor noise.
    """
    jmax = 8  # camera-jitter bound, px at generation resolution
    yy, xx = np.meshgrid(
        np.arange(h, dtype=np.float32) / w,  # shared scale: cycles-per-width
        np.arange(w, dtype=np.float32) / w,
        indexing="ij",
    )
    theta = rng.uniform(-0.7, 0.7)  # envelope wavevector angle off +x
    kf = rng.uniform(1.5, 2.5)      # envelope cycles across the width
    kx = 2 * np.pi * kf * np.cos(theta)
    ky = 2 * np.pi * kf * np.sin(theta)
    omega = rng.uniform(0.35, 0.6)  # rad/frame of envelope phase
    m = rng.uniform(0.7, 0.9)       # modulation depth
    amp = rng.uniform(32, 44)       # carrier amplitude (gray levels)
    phase0 = rng.uniform(0, 2 * np.pi)
    # static noise carrier, lightly smoothed, oversized by the jitter bound
    big = rng.normal(0, 1, (h + 2 * jmax, w + 2 * jmax)).astype(np.float32)
    big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) / 2.0
    if label == 0:
        dphi = np.full(n_frames, omega, np.float32)
    elif label == 1:
        dphi = np.full(n_frames, -omega, np.float32)
    else:
        dphi = (omega * rng.choice([-1.0, 1.0], n_frames)).astype(np.float32)
    phases = phase0 + np.concatenate([[0.0], np.cumsum(dphi[:-1])])
    # integer camera-jitter random walk, clamped to the oversize margin
    steps = rng.integers(-3, 4, size=(n_frames, 2))
    jit = np.clip(np.cumsum(steps, 0), -jmax, jmax) + jmax
    frames_u8 = np.empty((n_frames, h, w, 3), np.uint8)
    grating = kx * xx + ky * yy
    for t in range(n_frames):
        jy, jx = int(jit[t, 0]), int(jit[t, 1])
        carrier = big[jy:jy + h, jx:jx + w]
        env = 1.0 + m * np.cos(grating - phases[t])
        img = 127.5 + amp * carrier * env
        img = img[..., None] + rng.normal(0, 5, (h, w, 1))
        frames_u8[t] = np.clip(img, 0, 255).astype(np.uint8)

    n_samp = int(n_frames / fps * sr)
    tt = np.arange(n_samp, dtype=np.float32) / sr
    f0 = {0: 420.0, 1: 950.0, 2: 2100.0}[label] * rng.uniform(0.92, 1.08)
    am = 1.0 + 0.3 * np.sin(2 * np.pi * rng.uniform(1.0, 3.0) * tt)
    pcm = 0.4 * am * np.sin(2 * np.pi * f0 * tt + rng.uniform(0, 2 * np.pi))
    pcm = pcm + rng.normal(0, 0.02, n_samp)
    return frames_u8, pcm.astype(np.float32), sr


def make_media(workdir: str, n_clips: int, w: int, h: int, frames: int,
               task: str = "envelope"):
    """N class-separable AV clips + train/val CSVs (3 balanced classes)."""
    from avjepa_tpu.data.video_decoder import write_av_clip

    gen = {"grating": class_av_content,
           "envelope": class_av_content_envelope}[task]
    # task+geometry-suffixed dir: generation is resumable per file, so runs
    # that differ in task OR clip geometry must never share a directory (a
    # 160² CI run and a 256² flagship run in one workdir would otherwise
    # silently mix resolutions via the exists-check). "media" stays the
    # legacy grating location for warm round-3 workdirs.
    d = os.path.join(workdir, "media" if task == "grating"
                     else f"media_{task}_s{w}_f{frames}")
    os.makedirs(d, exist_ok=True)
    paths, labels = [], []
    for i in range(n_clips):
        label = i % 3
        p = os.path.join(d, f"clip{i:04d}_c{label}.avi")
        if not os.path.exists(p):  # media generation is resumable
            rng = np.random.default_rng([20260819, i])
            fr, pcm, sr = gen(label, rng, frames + (i % 5) * 8, w, h)
            write_av_clip(p, fr, 25.0, pcm, sr)
        paths.append(p)
        labels.append(label)
    n_train = max(1, int(0.8 * n_clips))
    train_csv = os.path.join(d, "train.csv")
    val_csv = os.path.join(d, "val.csv")
    with open(train_csv, "w") as f:
        f.write("".join(
            f"{p} {l}\n" for p, l in zip(paths[:n_train], labels[:n_train])
        ))
    with open(val_csv, "w") as f:
        f.write("".join(
            f"{p} {l}\n" for p, l in zip(paths[n_train:], labels[n_train:])
        ))
    return train_csv, val_csv


def last_csv_value(path: str, column: str) -> float:
    with open(path) as f:
        header = f.readline().strip().split(",")
        col = header.index(column)
        val = None
        for line in f:
            parts = line.strip().split(",")
            if len(parts) > col and parts[col]:
                val = float(parts[col])
    return val


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--workdir", default="/tmp/avjepa_chain")
    ap.add_argument("--clips", type=int, default=100)
    ap.add_argument("--model", default="vit_tiny")
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ipe", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--eval-epochs", type=int, default=300,
                    help="attentive-probe epochs for the frozen eval stages "
                    "(the probe is the learning-gap discriminator). The "
                    "evals run cache_features=True, so epochs after the "
                    "one-time encode cost device-speed probe steps only — "
                    "hundreds of epochs are the intended scale (measured "
                    "round 5 at ViT-L: a 10-epoch loader-bound probe sat "
                    "at chance on features a 300-epoch cached probe "
                    "decodes at 100% val top-1)")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--clip-size", type=int, default=160,
                    help="generated clip frame w=h (transforms resize)")
    ap.add_argument("--pred-depth", type=int, default=None)
    ap.add_argument("--pred-embed", type=int, default=None)
    ap.add_argument("--reg-coeff", type=float, default=0.0,
                    help="variance-regularizer weight for the chain's "
                    "pretrain (same knob the reference exposes, "
                    "app/avjepa/train.py:497-508; it ships 0.0). Round 5 "
                    "first blamed 'collapse at reg 0.0' for a chance-level "
                    "probe, but the encoder had NOT collapsed (input_var "
                    "1.4-1.7 across pretrain; the same checkpoint probes "
                    "100% val top-1 once the probe itself is trained to "
                    "convergence via cache_features + hundreds of epochs) — "
                    "so the default stays at the reference's 0.0.")
    ap.add_argument("--task", choices=["grating", "envelope"],
                    default="envelope",
                    help="class-media family. 'envelope' (default) is the "
                    "drift-balanced second-order-motion task — the round-5 "
                    "control measurement showed 'grating' (first-order "
                    "drift) is decodable at 100%% val top-1 from a RANDOM "
                    "frozen encoder (quadratic probe x quadratic signal), "
                    "so it cannot discriminate learning")
    ap.add_argument("--eval-shots", type=int, default=None,
                    help="if set, the frozen-probe stages train on only N "
                    "clips PER CLASS (balanced prefix of the train CSV; "
                    "val unchanged). Low-shot probing raises the sample "
                    "complexity bar for the random-encoder control arm "
                    "(same protocol for both arms)")
    ap.add_argument("--sticky", action="store_true",
                    help="set tpu.sticky_mask_buckets for the pretrain stage: "
                    "bucket sizes ratchet instead of tracking each mask draw, "
                    "so a cold compile cache pays ~2 step compiles instead of "
                    "one per (K,Ku) pair. Identical numerics; ~15% slower "
                    "steady-state steps — right for short chain runs only.")
    ap.add_argument("--stages", default="all",
                    help="comma list of stages to run: "
                    "media,pretrain,roundtrip,eval,control,avpred,example,"
                    "extract (default all). Later stages assume earlier "
                    "ones' outputs exist in --workdir")
    ap.add_argument("--out-json", default=None,
                    help="also write the summary JSON to this path")
    ap.add_argument("--assert-learning", action="store_true",
                    help="fail unless pretrained val top-1 beats both "
                    "chance and the random-encoder control by >5 points")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    py = sys.executable
    timings, summary = {}, {}
    all_stages = ["media", "pretrain", "roundtrip", "eval", "control",
                  "avpred", "example", "extract"]
    stages = set(all_stages) if args.stages == "all" else {
        s.strip() for s in args.stages.split(",")}
    unknown = stages - set(all_stages)
    assert not unknown, f"unknown stages {sorted(unknown)}"

    # -- 1. media (always: cheap, idempotent, later stages need the CSVs) ---
    t0 = time.perf_counter()
    train_csv, val_csv = make_media(
        wd, args.clips, args.clip_size, args.clip_size,
        max(32, 2 * args.frames), task=args.task,
    )
    timings["media"] = time.perf_counter() - t0
    print(f"[chain] media: {args.clips} real AV clips, task={args.task} "
          f"({timings['media']:.1f}s)", flush=True)

    probe_train_csv = train_csv
    if args.eval_shots:
        # labels are interleaved i%3 in the CSV, so a 3N-line prefix is a
        # balanced N-per-class low-shot probe-train set
        with open(train_csv) as f:
            lines = f.readlines()
        assert len(lines) >= 3 * args.eval_shots, "not enough train clips"
        probe_train_csv = train_csv.replace(
            ".csv", f"_{args.eval_shots}shot.csv")
        with open(probe_train_csv, "w") as f:
            f.writelines(lines[: 3 * args.eval_shots])
        summary["eval_shots"] = args.eval_shots

    # -- 2. pretrain -------------------------------------------------------
    pred_depth = args.pred_depth or (12 if args.model == "vit_large" else 2)
    # 96 divides every backbone head count (vit_tiny has 3 heads and the
    # predictor reuses the backbone head count)
    pred_embed = args.pred_embed or (384 if args.model == "vit_large" else 96)
    pre_folder = os.path.join(wd, "pretrain")
    pretrain_cfg = {
        "app": "avjepa",
        "data": {
            "dataset_type": "audiovideodataset",
            "datasets": [train_csv],
            "batch_size": args.batch,
            "num_frames": args.frames,
            "tubelet_size": 2,
            "sampling_rate": 2,
            "crop_size": args.crop,
            "patch_size": 16,
            "num_workers": args.workers,
        },
        "mask": [
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 8,
             "spatial_scale": [0.15, 0.15], "temporal_scale": [1.0, 1.0]},
            {"aspect_ratio": [0.75, 1.5], "num_blocks": 2,
             "spatial_scale": [0.7, 0.7], "temporal_scale": [1.0, 1.0]},
        ],
        "loss": {"loss_exp": 1.0, "reg_coeff": args.reg_coeff},
        "meta": {"seed": 0, "dtype": "bfloat16"},
        "model": {"model_name": args.model, "pred_depth": pred_depth,
                  "pred_embed_dim": pred_embed, "uniform_power": True,
                  "use_mask_tokens": True, "zero_init_mask_tokens": True},
        "optimization": {"ipe": args.ipe, "epochs": args.epochs, "warmup": 1},
        "logging": {"folder": pre_folder, "write_tag": "chain"},
        "tpu": {"remat": True, "attn_impl": "flash",
                "sticky_mask_buckets": bool(args.sticky)},
    }
    cfg_path = os.path.join(wd, "pretrain.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(pretrain_cfg, f)
    ckpt_dir = os.path.join(pre_folder, "chain-ckpt")
    if "pretrain" in stages:
        timings["pretrain"] = sh(
            "pretrain",
            [py, "-m", "avjepa_tpu.app.main", "--fname", cfg_path], wd,
        )
    pre_csv = os.path.join(pre_folder, "chain_r0.csv")
    if os.path.exists(pre_csv):
        summary["pretrain_loss"] = last_csv_value(pre_csv, "loss")

    # -- 3. checkpoint roundtrip (ours -> .pth.tar -> ours) ----------------
    if "roundtrip" in stages:
        pth = os.path.join(wd, "chain_export.pth.tar")
        timings["export"] = sh("export", [
            py,
            os.path.join(_REPO, "tools", "convert_reference_checkpoint.py"),
            "--export", ckpt_dir, pth, "--ipe", str(args.ipe),
        ], wd)
        timings["reimport"] = sh("reimport", [
            py,
            os.path.join(_REPO, "tools", "convert_reference_checkpoint.py"),
            pth, cfg_path, "--out-folder", os.path.join(wd, "reimport"),
            "--tag", "chain",
        ], wd)
        # bit-exact roundtrip check on the target encoder
        from avjepa_tpu.evals.video_classification import _leaf_paths
        from avjepa_tpu.utils.checkpoint import CheckpointManager
        import jax

        def _target_leaves(d):
            m = CheckpointManager(d)
            s = m.latest_step()
            meta = m.mngr.item_metadata(s)
            template = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), meta
            )
            out = _leaf_paths(m.restore(template, s)["target_params"])
            m.close()
            return out

        ours = _target_leaves(ckpt_dir)
        back = _target_leaves(os.path.join(wd, "reimport", "chain-ckpt"))
        assert set(ours) == set(back), "roundtrip changed the param set"
        for k in ours:
            np.testing.assert_array_equal(
                np.asarray(ours[k]), np.asarray(back[k]),
                err_msg=f"roundtrip mismatch at {k}")
        summary["roundtrip_leaves_exact"] = len(ours)
        print(f"[chain] roundtrip: {len(ours)} target-encoder leaves "
              "bit-exact", flush=True)

    # -- 4. frozen video-classification eval on the pretrained ckpt --------
    eval_folder = os.path.join(wd, "video_eval")
    eval_cfg = {
        "eval_name": "video_classification_frozen",
        "tag": "chain-eval",
        "data": {
            "dataset_train": probe_train_csv,
            "dataset_val": val_csv,
            "num_classes": 3,
            "frames_per_clip": args.frames,
            "num_segments": 2,
            "num_views_per_segment": 1,
            "frame_step": 2,
            "num_workers": args.workers,
        },
        "optimization": {
            "num_epochs": args.eval_epochs,
            "resolution": args.crop,
            "batch_size": args.batch,
            "attend_across_segments": True,
            "use_bfloat16": True,
            # frozen encoder -> encode each train clip once, probe at device
            # speed: the probe gets ipe*num_epochs real updates instead of
            # being host-decode-bound (round 5: 50 loader-bound updates left
            # the probe at chance on BOTH arms)
            "cache_features": True,
        },
        "pretrain": {
            "model_name": args.model,
            "patch_size": 16,
            "tubelet_size": 2,
            "uniform_power": True,
            "folder": pre_folder,
            "checkpoint": "chain-ckpt",
        },
        "folder": eval_folder,
    }
    eval_path = os.path.join(wd, "video_eval.yaml")
    with open(eval_path, "w") as f:
        yaml.safe_dump(eval_cfg, f)
    if "eval" in stages:
        timings["video_eval"] = sh(
            "video_eval",
            [py, "-m", "avjepa_tpu.app.eval_main", "--fname", eval_path], wd,
        )
        summary["eval_train_acc"] = last_csv_value(
            os.path.join(eval_folder, "chain-eval_r0.csv"), "acc"
        )
    import re

    def _val_top1(stage):
        log_path = os.path.join(wd, "logs", f"{stage}.log")
        if not os.path.exists(log_path):
            return None
        m = re.findall(r"val top-1: ([\d.]+)", open(log_path).read())
        return float(m[-1]) if m else None

    summary["eval_val_top1_pretrained"] = _val_top1("video_eval")
    summary["eval_val_top1"] = summary["eval_val_top1_pretrained"]

    # -- 4b. random-encoder control: same probe on an UNtrained encoder -----
    # The media classes are AV-separable by construction (class_av_content);
    # the pretrained encoder's probe must beat both chance (33.3%) and this
    # control for the chain to demonstrate LEARNING, not just plumbing
    # (reference: evals/video_classification_frozen/eval.py:303-385).
    ctrl_folder = os.path.join(wd, "video_eval_random")
    ctrl_cfg = dict(eval_cfg)
    ctrl_cfg["folder"] = ctrl_folder
    ctrl_cfg["tag"] = "chain-ctrl"
    ctrl_cfg["pretrain"] = dict(
        eval_cfg["pretrain"],
        folder=os.path.join(wd, "no_such_pretrain"),
        allow_missing_checkpoint=True,
    )
    ctrl_path = os.path.join(wd, "video_eval_random.yaml")
    with open(ctrl_path, "w") as f:
        yaml.safe_dump(ctrl_cfg, f)
    if "control" in stages:
        timings["video_eval_random"] = sh(
            "video_eval_random",
            [py, "-m", "avjepa_tpu.app.eval_main", "--fname", ctrl_path], wd,
        )
    summary["eval_val_top1_random_encoder"] = _val_top1("video_eval_random")

    # -- 5. avprediction probe on the frozen pretrained JEPA ---------------
    ap_folder = os.path.join(wd, "avpred")
    ap_cfg = dict(pretrain_cfg)
    ap_cfg["app"] = "avprediction"
    ap_cfg["data"] = dict(pretrain_cfg["data"], batch_size=max(2, args.batch // 2))
    ap_cfg["meta"] = dict(pretrain_cfg["meta"], read_checkpoint=ckpt_dir)
    ap_cfg["optimization"] = {"ipe": max(4, args.ipe // 4), "epochs": 1,
                              "warmup": 1}
    ap_cfg["logging"] = {"folder": ap_folder, "write_tag": "chain"}
    ap_path = os.path.join(wd, "avpred.yaml")
    with open(ap_path, "w") as f:
        yaml.safe_dump(ap_cfg, f)
    if "avpred" in stages:
        timings["avpred"] = sh(
            "avpred",
            [py, "-m", "avjepa_tpu.app.main", "--fname", ap_path], wd,
        )
        summary["avpred_loss"] = last_csv_value(
            os.path.join(ap_folder, "chain_probe_r0.csv"), "loss"
        )

    # -- 6. avprediction_example (reconstruction npz/PNG) -------------------
    ex_cfg = dict(ap_cfg)
    ex_cfg["app"] = "avprediction_example"
    ex_path = os.path.join(wd, "example.yaml")
    with open(ex_path, "w") as f:
        yaml.safe_dump(ex_cfg, f)
    if "example" in stages:
        timings["example"] = sh(
            "example",
            [py, "-m", "avjepa_tpu.app.main", "--fname", ex_path], wd,
        )
        npz = os.path.join(ap_folder, "avprediction_example.npz")
        assert os.path.exists(npz), "example stage produced no npz"
        summary["example_npz"] = npz
        png = os.path.join(ap_folder, "avprediction_example.png")
        if os.path.exists(png):
            summary["example_png"] = png

    # -- 7. extract: serve the pretrained encoder (embeddings + index) -----
    x_folder = os.path.join(wd, "extract")
    x_cfg = {
        "app": "extract",
        "data": dict(pretrain_cfg["data"], datasets=[val_csv]),
        "meta": {"seed": 0, "dtype": "bfloat16", "read_checkpoint": ckpt_dir},
        "model": pretrain_cfg["model"],
        "extract": {"pooling": "mean"},
        "logging": {"folder": x_folder, "write_tag": "chain"},
        "tpu": {"attn_impl": pretrain_cfg["tpu"]["attn_impl"]},
    }
    x_path = os.path.join(wd, "extract.yaml")
    with open(x_path, "w") as f:
        yaml.safe_dump(x_cfg, f)
    if "extract" in stages:
        timings["extract"] = sh(
            "extract",
            [py, "-m", "avjepa_tpu.app.main", "--fname", x_path], wd,
        )
        feats = np.load(
            os.path.join(x_folder, "chain-features", "features_r0.npz")
        )
        assert len(feats["indices"]) == len(set(feats["indices"].tolist()))
        summary["extract_rows"] = int(len(feats["indices"]))
        summary["extract_dim"] = int(feats["embeddings"].shape[1])

    summary["timings_s"] = {k: round(v, 1) for k, v in timings.items()}
    summary["model"] = args.model
    summary["clips"] = args.clips
    summary["task"] = args.task

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"chain": summary}, f, indent=1)
    if args.assert_learning:
        # the chain demonstrates LEARNING only if the pretrained encoder's
        # probe beats both chance (3 balanced classes) and the same probe on
        # a random frozen encoder (reference's reason to exist:
        # evals/video_classification_frozen/eval.py:303-385)
        pre = summary["eval_val_top1_pretrained"]
        ctl = summary["eval_val_top1_random_encoder"]
        chance = 100.0 / 3
        assert pre is not None and ctl is not None, summary
        assert pre > chance + 5.0, (
            f"pretrained probe {pre:.1f}% does not beat chance {chance:.1f}%")
        assert pre > ctl + 5.0, (
            f"pretrained probe {pre:.1f}% does not beat the random-encoder "
            f"control {ctl:.1f}%")
        print(f"[chain] learning gap OK: pretrained {pre:.1f}% > "
              f"control {ctl:.1f}% > chance {chance:.1f}%", flush=True)
    print(json.dumps({"chain": summary}), flush=True)


if __name__ == "__main__":
    main()
