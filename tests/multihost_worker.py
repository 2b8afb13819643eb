"""Subprocess worker for the TRUE multi-process jax.distributed tests.

Each worker is one "host": its own Python process, its own JAX runtime with
``jax_num_cpu_devices`` local CPU devices, connected to the others through
``jax.distributed.initialize`` with gloo cross-process collectives — the CPU
stand-in for a real multi-host TPU pod (reference analog: one NCCL rank per
GPU, src/utils/distributed.py:18-47).

Run as:  python tests/multihost_worker.py <pid> <nprocs> <port> <outdir>

With nprocs > 1 this executes the real ``process_count > 1`` branches:
  - TrainHandles.step's make_array_from_process_local_data batch placement
    (train/pretrain.py) via the full run() loop,
  - distributed Orbax save (every host participates) + restore-and-resume,
  - per-host ShardedSampler shards and cross-host mask-collator agreement.

With nprocs == 1 it produces the single-process golden for the same GLOBAL
computation: it assembles the global batch exactly as the 2-host run does
(concat of the per-host sampler shards; per-config masks duplicated, since
identically-seeded per-host collators draw identical local masks) and drives
TrainHandles.step directly. Losses must match the multi-process run.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _configure_jax(nprocs: int, pid: int, port: str):
    # the parent test strips XLA_FLAGS' forced device count; local device
    # count comes from jax_num_cpu_devices so each "host" owns its own slice
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nprocs)
    if nprocs > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nprocs, process_id=pid
        )
    # same host-fingerprinted persistent compile cache as tests/conftest.py
    from avjepa_tpu.utils.cache_dir import compile_cache_dir

    cache = compile_cache_dir(os.path.join(os.path.dirname(__file__), ".."), "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return jax


# NOTE: on the 2x2 spatial grid of crop 32 / patch 16, spatial_scale must
# stay well below 1.0 — a block that rounds up to the full 2x2 raster leaves
# no context to sample (the collator force-keeps one cell after bounded
# rejection, but the masks would be degenerate). These match the known-good
# dryrun config (__graft_entry__.py).
MASKS = [
    {
        "aspect_ratio": [0.75, 1.5],
        "num_blocks": 2,
        "spatial_scale": [0.15, 0.15],
        "temporal_scale": [1.0, 1.0],
        "max_keep": None,
    },
    {
        "aspect_ratio": [0.75, 1.5],
        "num_blocks": 1,
        "spatial_scale": [0.7, 0.7],
        "temporal_scale": [1.0, 1.0],
        "max_keep": None,
    },
]


def _cfg_dict(outdir: str, epochs: int, load_checkpoint: bool) -> dict:
    return {
        "app": "avjepa",
        "meta": {
            "seed": 11,
            "dtype": "float32",
            "load_checkpoint": load_checkpoint,
        },
        "data": {
            "source": "synthetic",
            "dataset_type": "audiovideodataset",
            "batch_size": 1,  # per chip; global = 4 over the 2x2 data/fsdp axes
            "num_frames": 4,
            "tubelet_size": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 1,
        },
        "model": {
            "model_name": "vit_tiny",
            "pred_depth": 2,
            "pred_embed_dim": 192,
        },
        "optimization": {
            "epochs": epochs,
            "ipe": 2,
            "warmup": 1,
            "lr": 1e-3,
            "start_lr": 2e-4,
            "final_lr": 0.0,
        },
        "mask": MASKS,
        "logging": {"folder": os.path.join(outdir, "logs"), "write_tag": "mh"},
        "tpu": {"mesh_data": 2, "mesh_fsdp": 2, "mesh_tensor": 2},
    }


def _read_losses(csv_path: str):
    import numpy as np

    rows = np.genfromtxt(csv_path, delimiter=",", names=True)
    rows = np.atleast_1d(rows)
    return [float(r["loss"]) for r in rows]


def _agreement_info(cfg, pid: int, nprocs: int) -> dict:
    """Hashes proving cross-host sampler/collator discipline (the multi-host
    half of tests/test_data_pipeline.py's single-process assertions)."""
    import hashlib

    import numpy as np

    from avjepa_tpu.data.loader import ShardedSampler
    from avjepa_tpu.masks.multiblock3d import make_mask_collator

    collator = make_mask_collator("multiblock3d", MASKS, cfg.layout(), base_seed=123)
    h = hashlib.sha256()
    for _ in range(3):
        for m in collator(4):
            h.update(np.ascontiguousarray(m.enc).tobytes())
            h.update(np.ascontiguousarray(m.pred).tobytes())
            if m.enc_idx is not None:
                h.update(np.ascontiguousarray(m.enc_idx).tobytes())
    sampler = ShardedSampler(
        dataset_len=32,
        batch_size=2,
        seed=5,
        num_shards=nprocs,
        shard_index=pid,
    )
    sampler.set_epoch(1)
    indices = [int(i) for batch in sampler for i in batch]
    return {"collator_sha": h.hexdigest(), "sampler_indices": indices}


def run_multiproc(jax, pid: int, nprocs: int, outdir: str) -> dict:
    from avjepa_tpu.config import load_config
    from avjepa_tpu.train.pretrain import run

    # phase 1: fresh 4-step run through the real loop (2 epochs x ipe 2),
    # ending in a distributed Orbax save on every epoch boundary
    cfg = load_config(_cfg_dict(outdir, epochs=2, load_checkpoint=False))
    run(cfg, max_steps=4)
    csv = os.path.join(outdir, "logs", f"mh_r{pid}.csv")
    losses = _read_losses(csv)
    os.replace(csv, csv + ".phase1")

    # phase 2: restore from the distributed checkpoint and continue
    cfg2 = load_config(_cfg_dict(outdir, epochs=3, load_checkpoint=True))
    run(cfg2, max_steps=2)
    resume_losses = _read_losses(csv)

    return {
        "pid": pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "losses": losses,
        "resume_losses": resume_losses,
        **_agreement_info(cfg, pid, nprocs),
    }


def run_golden(jax, outdir: str) -> dict:
    """Single-process emulation of the exact 2-host global computation."""
    import numpy as np

    from avjepa_tpu.config import load_config
    from avjepa_tpu.data.loader import ShardedSampler
    from avjepa_tpu.masks.multiblock3d import MaskSet
    from avjepa_tpu.train.pretrain import build_dataset, setup

    cfg = load_config(_cfg_dict(outdir, epochs=2, load_checkpoint=False))
    handles = setup(cfg)
    dataset = build_dataset(cfg, cfg.layout())
    local_batch = 2  # global 4 over 2 emulated hosts

    # per-host sampler shards, epoch 0 (run() consumes only the first-epoch
    # producer for a 4-step run — the data_iter is created before the epoch
    # loop and keeps its epoch-0 order)
    shard_iters = []
    for host in range(2):
        s = ShardedSampler(
            dataset_len=len(dataset),
            batch_size=local_batch,
            shuffle=True,
            seed=cfg.meta.seed,
            num_shards=2,
            shard_index=host,
        )
        s.set_epoch(0)
        shard_iters.append(iter(s))

    # one collator, stepped once per LOCAL batch like each host's loader;
    # both hosts draw identical masks (identically-seeded), so the global
    # mask stack is the local draw duplicated along batch
    handles.mask_collator.set_counter(-1)

    state = handles.state
    losses = []
    for _ in range(4):
        host_batches = [
            [dataset[int(i)] for i in next(it)] for it in shard_iters
        ]
        video = np.concatenate(
            [np.stack([s[0] for s in hb]) for hb in host_batches]
        )
        audio = np.concatenate(
            [np.stack([s[1] for s in hb])[..., None] for hb in host_batches]
        )
        local_masks = handles.mask_collator(local_batch)
        global_masks = [
            MaskSet(
                enc=np.concatenate([m.enc] * 2, axis=0),
                pred=np.concatenate([m.pred] * 2, axis=0),
                enc_idx=(
                    np.concatenate([m.enc_idx] * 2, axis=0)
                    if m.enc_idx is not None
                    else None
                ),
                # union_idx must ride along too: without it the golden step
                # silently falls back to the DENSE predictor while the
                # 2-host run it is compared against runs the COMPACTED one —
                # the comparison would span two numeric paths
                union_idx=(
                    np.concatenate([m.union_idx] * 2, axis=0)
                    if m.union_idx is not None
                    else None
                ),
            )
            for m in local_masks
        ]
        state, metrics = handles.step(state, video, audio, global_masks)
        losses.append(float(jax.device_get(metrics["loss"])))
    return {"pid": 0, "losses": losses}


def run_extract(jax, pid: int, nprocs: int, outdir: str) -> dict:
    """The extract (serving) app's ``process_count > 1`` branch: per-process
    batch contribution via put_batch, replicated (embedding, index) outputs,
    per-host output shards."""
    from avjepa_tpu.registry import app_main

    d = {
        "app": "extract",
        "meta": {"seed": 3, "dtype": "float32"},
        "data": {
            "source": "synthetic",
            "dataset_type": "audiovideodataset",
            "batch_size": 1,  # per chip; global 8 over 2 hosts x 4 devices
            "num_frames": 4,
            "tubelet_size": 2,
            "crop_size": 32,
            "patch_size": 16,
            "num_workers": 1,
        },
        "model": {"model_name": "vit_tiny"},
        "extract": {
            "pooling": "mean",
            "allow_random": True,
            # ODD on purpose: the sampler wrap-pads the order to a shard
            # multiple, so row 0's pad copy lands in the OTHER host's shard —
            # the row-ownership filter must keep exactly one writer
            "limit": 11,
            "output": os.path.join(outdir, "features"),
        },
        "logging": {"folder": os.path.join(outdir, "logs"), "write_tag": "xmh"},
    }
    summary = app_main("extract", d)
    return {
        "pid": pid,
        "process_count": jax.process_count(),
        **summary,
    }


def run_eval(jax, pid: int, nprocs: int, outdir: str) -> dict:
    """The frozen video-classification eval under TRUE process_count == 2:
    per-host train/val sampler shards, put_batch global assembly, in-jit
    global metric reduction (count_correct psum), per-host CSVs, and the
    all-process-participating classifier checkpoint save (Orbax syncs
    globally; a proc-0-only guard deadlocks multi-host).

    Phase 1 (num_epochs=0) validates the init classifier: per-sample math is
    batch-independent, so the sharded run's global top-1 must equal the
    single-process run's exactly. Phase 2 trains 2 probe steps: the loss is
    a replicated global scalar, so both hosts must log identical values.
    """
    import dataclasses

    from avjepa_tpu.evals.video_classification import VideoEvalConfig, run

    cfg = VideoEvalConfig(
        folder=os.path.join(outdir, "eval_logs"),
        num_classes=3,
        frames_per_clip=4,
        num_segments=2,
        num_views_per_segment=1,
        frame_step=2,
        attend_across_segments=True,
        num_epochs=0,  # phase 1: validation only
        resolution=32,
        batch_size=1,  # per chip; global 8 over all devices
        num_workers=1,
        use_bfloat16=False,
        model_name="vit_tiny",
        patch_size=16,
        tubelet_size=2,
        source="synthetic",
        seed=3,
        tag="mh-eval-val",
    )
    val_only = run(cfg)

    cfg_train = dataclasses.replace(cfg, num_epochs=1, tag="mh-eval-train")
    trained = run(cfg_train, max_steps=2)
    losses = _read_losses(
        os.path.join(outdir, "eval_logs", f"mh-eval-train_r{pid}.csv")
    )
    return {
        "pid": pid,
        "process_count": jax.process_count(),
        "val_top1_untrained": val_only["val_top1"],
        "val_top1_trained": trained["val_top1"],
        "train_losses": losses,
    }


def run_preempt(jax, pid: int, nprocs: int, outdir: str) -> dict:
    """Cross-host SIGTERM agreement: ONLY host 0 is signaled mid-run; the
    per-step agreement collective (train/pretrain.py::_preempt_agreed) must
    make BOTH hosts break at the SAME step boundary and both participate in
    the distributed checkpoint save. A host breaking alone is the deadlock
    class the agreement exists for: it enters the Orbax save barrier while
    the other host launches the next step's collectives.
    """
    import signal
    import threading
    import time as _time

    from avjepa_tpu.config import load_config
    from avjepa_tpu.train.pretrain import run

    d = _cfg_dict(outdir, epochs=3, load_checkpoint=False)
    d["optimization"]["ipe"] = 20  # 60-step full run; preemption cuts it short
    d["logging"]["write_tag"] = "mhpre"
    cfg = load_config(d)
    csv = os.path.join(outdir, "logs", f"mhpre_r{pid}.csv")

    if pid == 0:
        def _sigterm_after_rows(n: int = 3):
            # CSVLogger opens/closes per row, so the file length tracks steps
            while True:
                try:
                    with open(csv) as f:
                        if sum(1 for _ in f) > n:  # header + n step rows
                            break
                except OSError:
                    pass
                _time.sleep(0.2)
            os.kill(os.getpid(), signal.SIGTERM)

        threading.Thread(target=_sigterm_after_rows, daemon=True).start()

    summary = run(cfg)
    losses = _read_losses(csv)
    return {
        "pid": pid,
        "process_count": jax.process_count(),
        "preempted": bool(summary.get("preempted")),
        "steps_logged": len(losses),
        "losses": losses,
    }


def main():
    # watchdog: if a phase wedges, dump all thread stacks every 5 min so the
    # parent's captured output shows WHERE (compile, collective, loader, ...)
    import faulthandler

    faulthandler.dump_traceback_later(300, repeat=True)

    pid, nprocs, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    jax = _configure_jax(nprocs, pid, port)
    if mode == "golden":
        result = run_golden(jax, outdir)
    elif mode == "extract":
        result = run_extract(jax, pid, nprocs, outdir)
    elif mode == "eval":
        result = run_eval(jax, pid, nprocs, outdir)
    elif mode == "preempt":
        result = run_preempt(jax, pid, nprocs, outdir)
    else:
        result = run_multiproc(jax, pid, nprocs, outdir)
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, f"result_{mode}_{pid}.json")
    with open(out, "w") as f:
        json.dump(result, f)
    print(f"WORKER_DONE {out}", flush=True)


if __name__ == "__main__":
    main()
