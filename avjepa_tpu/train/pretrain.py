"""JEPA pretraining runner — the avjepa / vjepa apps.

One loop serves both modalities (the reference carries two 600-line
near-identical train.py files; reference: app/avjepa/train.py, app/vjepa/train.py
— the latter abandoned mid-debug with print(1/0) crash lines at :487,:503,
which we obviously do not reproduce).

Loop shape mirrors the reference: epochs x iterations-per-epoch over a
(re-initialized-on-exhaustion) loader, per-iteration mask sampling via the
stepped collator, CSV + console metrics, per-epoch checkpoints. All device
work is one jitted train step over the mesh.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from avjepa_tpu.config import ExperimentConfig
from avjepa_tpu.data.loader import JepaLoader, ShardedSampler
from avjepa_tpu.data.synthetic import SyntheticAVDataset
from avjepa_tpu.masks.multiblock3d import make_mask_collator
from avjepa_tpu.models import (
    count_parameters,
    init_encoder_params,
    init_predictor_params,
    make_encoder,
    make_predictor,
)
from avjepa_tpu.parallel.mesh import make_mesh, state_shardings
from avjepa_tpu.train.optim import ScheduleConfig
from avjepa_tpu.train.state import JepaState, init_state
from avjepa_tpu.train.step import StepConfig, make_train_step, stack_masksets
from avjepa_tpu.utils.checkpoint import CheckpointManager
from avjepa_tpu.utils.logging import AverageMeter, CSVLogger, StepTimer, get_logger

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.bfloat16}


def build_models(cfg: ExperimentConfig, layout):
    dtype = DTYPES[cfg.meta.dtype]
    if cfg.meta.dtype == "float16":
        # reference configs may say float16 (torch AMP + GradScaler); TPU has
        # no fp16 compute path, and bf16's range needs no loss scaling —
        # reference: app/avjepa/train.py mixed-precision setup
        get_logger().warning(
            "meta.dtype float16 runs as bfloat16 on TPU (no GradScaler "
            "needed; see COVERAGE.md)"
        )
    encoder = make_encoder(
        cfg.model.model_name,
        layout,
        uniform_power=cfg.model.uniform_power,
        dtype=dtype,
        attn_impl=cfg.tpu.attn_impl,
        remat=cfg.tpu.remat,
        gelu=cfg.tpu.gelu,
    )
    predictor = make_predictor(
        cfg.model.model_name,
        layout,
        pred_depth=cfg.model.pred_depth,
        pred_embed_dim=cfg.model.pred_embed_dim,
        uniform_power=cfg.model.uniform_power,
        use_mask_tokens=cfg.model.use_mask_tokens,
        num_mask_tokens=max(2, len(cfg.mask)),
        zero_init_mask_tokens=cfg.model.zero_init_mask_tokens,
        dtype=dtype,
        attn_impl=cfg.tpu.attn_impl,
        remat=cfg.tpu.remat,
        gelu=cfg.tpu.gelu,
    )
    return encoder, predictor


def build_dataset(cfg: ExperimentConfig, layout):
    if cfg.data.source == "synthetic" or not cfg.data.datasets:
        return SyntheticAVDataset(layout, length=max(10_000, cfg.data.batch_size * 4))
    from avjepa_tpu.data.av_dataset import AVFileDataset

    return AVFileDataset(
        csv_paths=list(cfg.data.datasets),
        layout=layout,
        frames_per_clip=cfg.data.num_frames,
        frame_step=cfg.data.sampling_rate,
        num_clips=cfg.data.num_clips,
        random_clip_sampling=True,
        filter_short_videos=cfg.data.filter_short_videos,
        filter_long_videos=cfg.data.filter_long_videos,
        duration=cfg.data.clip_duration,
        crop_size=cfg.data.crop_size,
        random_resize_scale=tuple(cfg.data_aug.random_resize_scale),
        random_resize_aspect_ratio=tuple(cfg.data_aug.random_resize_aspect_ratio),
        motion_shift=cfg.data_aug.motion_shift,
        horizontal_flip=cfg.data_aug.horizontal_flip,
        reprob=cfg.data_aug.reprob,
        auto_augment=cfg.data_aug.auto_augment,
    )


@dataclasses.dataclass
class TrainHandles:
    """Everything a driver needs to run/inspect training programmatically."""

    cfg: ExperimentConfig
    mesh: object
    encoder: object
    predictor: object
    state: JepaState
    step_fn: object
    loader: JepaLoader
    mask_collator: object
    compact: bool = True
    compact_pred: bool = True
    # hot-loop variant skipping the log-boundary-only diagnostic reductions
    # (same jit signature as step_fn; see make_train_step full_metrics)
    step_fn_light: object = None

    def step(self, state, video, audio, masks, full_metrics: bool = True):
        """Run one train step from host-side numpy batch + MaskSets.

        With num_clips > 1 the loader delivers clips stacked along time
        ([B, C*T, H, W, 3]); following the reference's semantics
        (app/avjepa/train.py:397-423) clips concatenate along *batch* and each
        sample's mask set is reused for all of its clips.
        """
        c = self.cfg.data.num_clips
        if c > 1:
            video = np.concatenate(np.split(np.asarray(video), c, axis=1), axis=0)
            if audio is not None:
                audio = np.concatenate([np.asarray(audio)] * c, axis=0)
            masks = [
                type(m)(
                    enc=np.concatenate([m.enc] * c, axis=0),
                    pred=np.concatenate([m.pred] * c, axis=0),
                    enc_idx=(
                        np.concatenate([m.enc_idx] * c, axis=0)
                        if m.enc_idx is not None
                        else None
                    ),
                    union_idx=(
                        np.concatenate([m.union_idx] * c, axis=0)
                        if getattr(m, "union_idx", None) is not None
                        else None
                    ),
                )
                for m in masks
            ]
        out = stack_masksets(masks, with_idx=True)
        enc_m, pred_m, idx, union = out
        if not self.compact:
            idx = None
        if not self.compact_pred:
            union = None
        # ship pixels at the model's compute dtype: halves host->device bytes
        # and avoids keeping an f32 copy of the video in HBM (the models cast
        # to bf16 at the patch embed anyway)
        dt = DTYPES[self.cfg.meta.dtype]
        if jax.process_count() > 1:
            # multi-host: each process contributes its LOCAL shard of the
            # global batch (jax.make_array_from_process_local_data) — a bare
            # jnp.asarray of the local batch would be taken as the full
            # global array and shrink the effective batch by process_count
            from jax.sharding import NamedSharding, PartitionSpec as P
            from avjepa_tpu.parallel.mesh import batch_sharding, put_batch

            mesh = self.mesh
            b_sh = batch_sharding(mesh)
            m_sh = NamedSharding(mesh, P(None, ("data", "fsdp")))
            video = put_batch(mesh, np.asarray(video, dt), b_sh)
            audio = (
                put_batch(mesh, np.asarray(audio, dt), b_sh)
                if audio is not None
                else None
            )
            enc_m = put_batch(mesh, np.asarray(enc_m), m_sh)
            pred_m = put_batch(mesh, np.asarray(pred_m), m_sh)
            if idx is not None:
                idx = tuple(put_batch(mesh, np.asarray(i), b_sh) for i in idx)
            if union is not None:
                union = put_batch(mesh, np.asarray(union), m_sh)
            fn = self._pick_step(full_metrics)
            return fn(state, video, audio, enc_m, pred_m, idx, union)
        if idx is not None:
            idx = tuple(jnp.asarray(i) for i in idx)
        fn = self._pick_step(full_metrics)
        return fn(
            state,
            jnp.asarray(video, dt),
            jnp.asarray(audio, dt) if audio is not None else None,
            jnp.asarray(enc_m),
            jnp.asarray(pred_m),
            idx,
            jnp.asarray(union) if union is not None else None,
        )

    def _pick_step(self, full_metrics: bool):
        if full_metrics or self.step_fn_light is None:
            return self.step_fn
        return self.step_fn_light


def setup(cfg: ExperimentConfig, mesh=None) -> TrainHandles:
    layout = cfg.layout()
    if mesh is None:
        mesh = make_mesh(cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor)

    encoder, predictor = build_models(cfg, layout)
    key = jax.random.key(cfg.meta.seed)
    ekey, pkey = jax.random.split(key)
    enc_params = init_encoder_params(encoder, ekey)
    pred_params = init_predictor_params(predictor, pkey)
    state = init_state(enc_params, pred_params)

    # place state on the mesh per sharding rules
    sh = state_shardings(mesh, state)
    state = jax.device_put(state, sh)

    sched = ScheduleConfig(
        ipe=cfg.optimization.ipe,
        num_epochs=cfg.optimization.epochs,
        ipe_scale=cfg.optimization.ipe_scale,
        warmup_epochs=cfg.optimization.warmup,
        start_lr=cfg.optimization.start_lr,
        ref_lr=cfg.optimization.lr,
        final_lr=cfg.optimization.final_lr,
        ref_wd=cfg.optimization.weight_decay,
        final_wd=cfg.optimization.final_weight_decay,
        ema_start=cfg.optimization.ema[0],
        ema_end=cfg.optimization.ema[1],
    )
    step_cfg = StepConfig(
        loss_exp=cfg.loss.loss_exp,
        reg_coeff=cfg.loss.reg_coeff,
        clip_grad=cfg.optimization.clip_grad,
        warmup_epochs=int(cfg.optimization.warmup),
        ipe=cfg.optimization.ipe,
        betas=tuple(cfg.optimization.betas),
        eps=cfg.optimization.eps,
    )
    raw_step = make_train_step(encoder, predictor, sched, step_cfg)
    raw_step_light = (
        make_train_step(encoder, predictor, sched, step_cfg, full_metrics=False)
        if cfg.tpu.light_metrics
        else None
    )

    compact = bool(cfg.tpu.compact_context)
    compact_pred = bool(cfg.tpu.compact_predictor)
    batch_sh = NamedSharding(mesh, P(("data", "fsdp")))
    mask_sh = NamedSharding(mesh, P(None, ("data", "fsdp")))
    idx_sh = (
        tuple(NamedSharding(mesh, P(("data", "fsdp"))) for _ in cfg.mask)
        if compact
        else None
    )
    union_sh = mask_sh if compact_pred else None
    repl = NamedSharding(mesh, P())
    in_sh = (
        sh,
        batch_sh,
        batch_sh if layout.audio_enabled else None,
        mask_sh,
        mask_sh,
        idx_sh,
        union_sh,
    )
    step_fn = jax.jit(
        raw_step, in_shardings=in_sh, out_shardings=(sh, repl),
        donate_argnums=(0,),
    )
    step_fn_light = (
        jax.jit(
            raw_step_light, in_shardings=in_sh, out_shardings=(sh, repl),
            donate_argnums=(0,),
        )
        if raw_step_light is not None
        else None
    )

    dataset = build_dataset(cfg, layout)
    collator = make_mask_collator(
        cfg.data.mask_type or cfg.tpu.mask_type, cfg.mask, layout,
        base_seed=cfg.meta.seed,
        sticky_buckets=cfg.tpu.sticky_mask_buckets,
    )
    weights = None
    if cfg.data.datasets_weights is not None and hasattr(dataset, "sample_weights"):
        # multi-dataset weighted sampling (reference DistributedWeightedSampler,
        # src/datasets/utils/weighted_sampler.py:36-97)
        weights = dataset.sample_weights(cfg.data.datasets_weights)
    # data.batch_size is PER-CHIP, matching the reference's per-GPU semantics
    # (configs/pretrain/av-vitt16.yaml: batch_size 24/rank): the global batch
    # is batch_size x (data x fsdp mesh axes), and each host loads its share.
    batch_chips = mesh.shape["data"] * mesh.shape["fsdp"]
    global_batch = cfg.data.batch_size * batch_chips
    assert global_batch % jax.process_count() == 0, (global_batch, jax.process_count())
    local_batch = global_batch // jax.process_count()
    sampler = ShardedSampler(
        dataset_len=len(dataset),
        batch_size=local_batch,
        shuffle=True,
        seed=cfg.meta.seed,
        weights=weights,
    )
    loader = JepaLoader(
        dataset,
        sampler,
        mask_collator=collator,
        num_workers=cfg.data.num_workers,
        use_processes=cfg.data.source != "synthetic" and cfg.data.num_workers > 1,
    )
    return TrainHandles(
        cfg=cfg,
        mesh=mesh,
        encoder=encoder,
        predictor=predictor,
        state=state,
        step_fn=step_fn,
        loader=loader,
        mask_collator=collator,
        compact=compact,
        compact_pred=compact_pred,
        step_fn_light=step_fn_light,
    )


def run(cfg: ExperimentConfig, max_steps: Optional[int] = None) -> dict:
    """Full pretraining loop. Returns summary metrics."""
    logger = get_logger(rank=jax.process_index())

    # preemption: SIGTERM requests a checkpoint-and-exit at the next step
    # boundary (TPU preemption / maintenance events deliver SIGTERM; the
    # reference requeues via submitit + SLURM instead,
    # app/main_distributed.py:65-67 — the TPU runbook is documented in
    # COVERAGE.md: restart with AVJEPA_RESUME_PREEMPT=1 or
    # meta.load_checkpoint: true and the run resumes from this save).
    import signal

    preempted = {"flag": False}  # raw per-host signal; control flow uses
    # the cross-host AGREED value below — SIGTERM delivery can straddle a
    # step boundary across hosts, and a host that breaks alone enters the
    # distributed-checkpoint barrier while the others launch the next step's
    # collectives: a deadlock at exactly the moment the handler exists for.

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        logger.warning("SIGTERM received: checkpointing at next step boundary")

    def _preempt_agreed() -> bool:
        """Global OR of the per-host SIGTERM flags — every host that calls
        this at the same loop point gets the SAME answer, so all hosts break
        at the same step boundary (single-host: the local flag)."""
        if jax.process_count() == 1:
            return preempted["flag"]
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(preempted["flag"], np.int32)
        )
        return bool(np.any(np.asarray(flags)))

    # in-loop poll cadence: the agreement collective is a blocking host
    # round-trip, so don't pay it every hot-loop step — every host polls at
    # the same `total % N` boundaries (total is lockstep across hosts, and
    # the local flag must NOT short-circuit the call or the collective
    # counts desync), trading <=N steps of checkpoint latency for a
    # collective-free steady state. Single-host polls every step (free).
    preempt_poll_steps = 8 if jax.process_count() > 1 else 1

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (tests drive run() directly)
        prev_handler = None

    ckpt = None
    monitor = None
    try:
        handles = setup(cfg)
        state = handles.state
        layout = cfg.layout()
        if cfg.data.log_resource_utilization:
            # host-resource CSV next to the metrics (reference carries this knob
            # but its monitor was dormant; ours samples /proc)
            from avjepa_tpu.utils.monitoring import ResourceMonitor

            os.makedirs(cfg.logging.folder, exist_ok=True)
            monitor = ResourceMonitor(
                log_path=os.path.join(
                    cfg.logging.folder,
                    f"{cfg.logging.write_tag}_resources_r{jax.process_index()}.csv",
                )
            ).start()

        folder = cfg.logging.folder
        os.makedirs(folder, exist_ok=True)
        tag = cfg.logging.write_tag
        csv_logger = CSVLogger(
            os.path.join(folder, f"{tag}_r{jax.process_index()}.csv"),
            ("%d", "epoch"),
            ("%d", "itr"),
            ("%.5f", "loss"),
            ("%.5f", "loss-jepa"),
            ("%.5f", "reg-loss"),
            ("%.2e", "enc-grad-norm"),
            ("%.2e", "pred-grad-norm"),
            ("%.2e", "grad-avg"),
            ("%.2e", "grad-first-qkv"),
            ("%.2e", "grad-last-qkv"),
            ("%.2e", "opt-mu-abs"),
            ("%.2e", "opt-nu-abs"),
            ("%.1f", "step-time-ms"),
            ("%.1f", "iter-time-ms"),
            # 1 when the diagnostic columns (grad-avg..opt-nu-abs) were
            # computed THIS step; 0 when tpu.light_metrics carried them
            # forward from the last full step (they'd otherwise be
            # indistinguishable from fresh per-step values)
            ("%d", "full-metrics"),
        )

        ckpt = CheckpointManager(os.path.join(folder, f"{tag}-ckpt"))

        def restore_freeing_init(mngr):
            """Restore directly into the mesh shardings via an ABSTRACT template,
            deleting the random-init state's device buffers first: keeping both
            full states alive while Orbax materializes the restored one OOMs
            ViT-L on a single chip (observed: first post-resume step
            RESOURCE_EXHAUSTED at 300 steps b24)."""
            nonlocal state
            like = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                state,
            )
            for leaf in jax.tree_util.tree_leaves(state):
                leaf.delete()
            return mngr.restore(like)

        restored = None
        if cfg.meta.load_checkpoint:
            if ckpt.latest_step() is not None:
                restored = restore_freeing_init(ckpt)
            elif cfg.meta.read_checkpoint:
                # init-from-named-checkpoint: the run's own folder has no
                # checkpoint yet, so seed from meta.read_checkpoint (reference:
                # r_file / load_checkpoint, app/avjepa/train.py:75,184-192)
                src = cfg.meta.read_checkpoint
                if os.path.isdir(src):
                    src_mngr = CheckpointManager(src)
                    if src_mngr.latest_step() is not None:
                        restored = restore_freeing_init(src_mngr)
                    src_mngr.close()
                    if restored is not None:
                        logger.info(f"initialized from checkpoint {src}")
                else:
                    logger.warning(f"read_checkpoint {src} not found; fresh init")
        if restored is not None:
            state = restored
            handles.state = state
            logger.info(f"resumed from step {int(jax.device_get(state.step))}")

        start_step = int(jax.device_get(state.step))
        ipe = cfg.optimization.ipe
        start_epoch = start_step // ipe
        # fast-forward the mask collator counter (reference: train.py:326-330)
        handles.mask_collator.set_counter(start_step - 1)

        logger.info(
            f"encoder params: {count_parameters(jax.device_get(state.enc_params)):,} | "
            f"predictor params: {count_parameters(jax.device_get(state.pred_params)):,}"
        )

        total = 0
        summary = {}
        last_full = {}
        loss_meter = AverageMeter()
        data_iter = iter(handles.loader)
        if cfg.data.skip_batches > 0:
            logger.info(f"skipping {cfg.data.skip_batches} batches")
            for _ in range(cfg.data.skip_batches):
                try:
                    next(data_iter)
                except StopIteration:
                    data_iter = iter(handles.loader)
        for epoch in range(start_epoch, cfg.optimization.epochs):
            handles.loader.set_epoch(epoch)
            loss_meter.reset()
            time_meter = AverageMeter()
            for itr in range(ipe):
                t_iter = time.perf_counter()
                try:
                    video, audio, _, masks = next(data_iter)
                except StopIteration:
                    data_iter = iter(handles.loader)
                    video, audio, _, masks = next(data_iter)
                # diagnostic reductions only at log boundaries when
                # tpu.light_metrics (the default); loss/schedules/grad norms
                # come from every step either way
                full = (not cfg.tpu.light_metrics) or (
                    itr % cfg.logging.log_freq == 0
                )
                with StepTimer() as t:
                    state, metrics = handles.step(
                        state, video, audio, masks, full_metrics=full
                    )
                    metrics = jax.device_get(metrics)
                if full:
                    last_full = metrics
                iter_ms = (time.perf_counter() - t_iter) * 1000
                loss = float(metrics["loss"])
                loss_meter.update(loss)
                time_meter.update(t.elapsed_ms)

                def _stat(key):
                    # light steps carry the most recent full-step diagnostics
                    return float(metrics.get(key, last_full.get(key, np.nan)))

                csv_logger.log(
                    epoch + 1, itr, loss, float(metrics["loss_jepa"]),
                    float(metrics["loss_reg"]), float(metrics["enc_grad_norm"]),
                    float(metrics["pred_grad_norm"]), _stat("enc_grad_avg"),
                    _stat("enc_grad_first_qkv"),
                    _stat("enc_grad_last_qkv"),
                    _stat("opt_mu_abs"), _stat("opt_nu_abs"),
                    t.elapsed_ms, iter_ms, int(full),
                )
                if itr % cfg.logging.log_freq == 0:
                    logger.info(
                        f"[{epoch + 1}, {itr:5d}] loss: {loss_meter.avg:.3f} "
                        f"| p{float(metrics['loss_jepa']):.3f} r{float(metrics['loss_reg']):.3f} "
                        f"| input_var: {float(metrics['input_var']):.3f} "
                        f"| masks: {np.array2string(metrics['mask_sizes'], precision=0)} "
                        f"[wd: {float(metrics['wd']):.2e}] [lr: {float(metrics['lr']):.2e}] "
                        f"[g: {float(metrics['enc_grad_avg']):.2e} "
                        f"f{float(metrics['enc_grad_first_qkv']):.2e} "
                        f"l{float(metrics['enc_grad_last_qkv']):.2e}] "
                        f"[step: {time_meter.avg:.1f} ms]"
                    )
                assert np.isfinite(loss), "loss is not finite"
                total += 1
                if max_steps is not None and total >= max_steps:
                    break
                if total % preempt_poll_steps == 0 and _preempt_agreed():
                    break
            # one agreed snapshot for ALL epoch-end control flow: the raw flag
            # can flip asynchronously mid-epilogue on one host only
            preempt_now = _preempt_agreed()
            if (
                epoch % cfg.logging.checkpoint_freq == 0
                or epoch == cfg.optimization.epochs - 1
                or (max_steps is not None and total >= max_steps)
                or preempt_now
            ):
                # distributed save: every host participates and Orbax writes each
                # shard from the host that owns it — a process-0 device_get would
                # fail on non-fully-addressable FSDP-sharded arrays (the folder
                # must be shared storage on real multi-host topologies).
                # Reference saved replicated state from rank 0 only
                # (app/avjepa/train.py:332-350).
                ckpt.save(int(jax.device_get(state.step)), state)
                # tagged archive copies every save_every_freq epochs
                # (reference: train.py:639-644) — kept forever, outside the
                # rolling latest window
                if (
                    cfg.logging.save_every_freq > 0
                    and epoch % cfg.logging.save_every_freq == 0
                ):
                    archive = CheckpointManager(
                        os.path.join(folder, f"{tag}-archive"), max_to_keep=10_000
                    )
                    archive.save(int(jax.device_get(state.step)), state)
                    archive.close()
            summary = {
                "epoch": epoch + 1,
                "avg_loss": loss_meter.avg,
                "avg_step_ms": time_meter.avg,
            }
            if max_steps is not None and total >= max_steps:
                break
            if preempt_now:
                saved = int(jax.device_get(state.step))
                logger.warning(
                    f"preempted: checkpoint saved at step {saved}; restart with "
                    "AVJEPA_RESUME_PREEMPT=1 (or meta.load_checkpoint: true) to resume"
                )
                summary["preempted"] = True
                break
    finally:
        # restore the previous handler even if setup()/the loop raised,
        # so a later SIGTERM is not silently absorbed by a stale handler;
        # close the Orbax manager and stop the /proc sampler thread likewise
        # (an exception mid-loop, e.g. the non-finite-loss assert, must not
        # leak the sampler thread or an unflushed checkpoint manager)
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        if ckpt is not None:
            ckpt.close()
        if monitor is not None:
            monitor.stop()
    return summary


def main(args: dict, resume_preempt: bool = False):
    """Scaffold-compatible entry (reference: app/avjepa/train.py main)."""
    from avjepa_tpu.config import load_config

    cfg = load_config(args)
    if resume_preempt:
        cfg.meta.load_checkpoint = True
    return run(cfg)
