"""The avprediction app: frozen-JEPA pixel/spectrogram reconstruction.

Reference: app/avprediction/train.py + utils.py — load a pretrained AV-JEPA
checkpoint, freeze encoder + predictor, rebuild the full token sequence from
context embeddings + predicted embeddings, and train an AttentionProbe to
reconstruct raw video pixels and the mel spectrogram with MSE.

Dense-mask formulation makes the reference's ``rebuild_tokens`` scatter
(app/avprediction/utils.py:206-232) a single ``jnp.where`` over the static
layout. The reference's use-before-def bugs (loader/optimizer at
train.py:311-330,406) are not reproduced.

The avprediction_example app (inference + visualization twin) is
``example_main`` below.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from avjepa_tpu.config import ExperimentConfig, load_config
from avjepa_tpu.models.prediction_probes import AttentionProbe
from avjepa_tpu.parallel.mesh import make_mesh
from avjepa_tpu.train import pretrain
from avjepa_tpu.train.optim import (
    AdamWState,
    ScheduleConfig,
    adamw_init,
    adamw_update,
    lr_at_step,
    wd_at_step,
    wd_mask,
)
from avjepa_tpu.train.step import stack_masksets
from avjepa_tpu.utils.checkpoint import CheckpointManager
from avjepa_tpu.utils.logging import AverageMeter, CSVLogger, get_logger


@struct.dataclass
class ProbeState:
    step: jnp.ndarray
    probe_params: object
    opt: AdamWState


def make_probe_step(encoder, predictor, probe, sched: ScheduleConfig):
    """(probe_state, frozen_params, batch, masks) -> (probe_state, metrics)."""

    def frozen_tokens(enc_params, pred_params, video, audio, enc_m, pred_m, idx):
        ctx = encoder.apply({"params": enc_params}, video, audio, key_mask=enc_m)
        z = predictor.apply({"params": pred_params}, ctx, enc_m, pred_m, idx)
        # rebuild: context positions take encoder embeddings, target positions
        # take predictor outputs, others zero
        full = jnp.where(enc_m[..., None], ctx, jnp.where(pred_m[..., None], z, 0.0))
        return jax.lax.stop_gradient(full)

    def loss_fn(probe_params, enc_params, pred_params, video, audio, enc_masks, pred_masks):
        # use the first mask config (reference trains the probe on one mask set)
        full = frozen_tokens(
            enc_params, pred_params, video, audio, enc_masks[0], pred_masks[0], 0
        )
        video_recon, audio_recon = probe.apply({"params": probe_params}, full)
        loss_v = jnp.mean((video_recon.astype(jnp.float32) - video.astype(jnp.float32)) ** 2)
        # video-only configs (vjepa prediction): no audio branch
        if audio is None or audio_recon is None:
            loss_a = jnp.zeros(())
        else:
            loss_a = jnp.mean(
                (audio_recon.astype(jnp.float32) - audio.astype(jnp.float32)) ** 2
            )
        loss = loss_v + loss_a
        return loss, (loss_v, loss_a)

    def step_fn(state: ProbeState, enc_params, pred_params, video, audio, enc_masks, pred_masks):
        lr = lr_at_step(sched, state.step)
        wd = wd_at_step(sched, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss_v, loss_a)), grads = grad_fn(
            state.probe_params, enc_params, pred_params, video, audio,
            enc_masks, pred_masks,
        )
        probe_params, opt = adamw_update(
            grads, state.opt, state.probe_params, lr, wd, wd_mask(state.probe_params)
        )
        new_state = ProbeState(step=state.step + 1, probe_params=probe_params, opt=opt)
        return new_state, {"loss": loss, "loss_video": loss_v, "loss_audio": loss_a, "lr": lr}

    return step_fn


def setup_probe(cfg: ExperimentConfig, mesh=None):
    handles = pretrain.setup(cfg, mesh=mesh)
    layout = cfg.layout()
    probe = AttentionProbe(layout=layout, emb_dim=handles.encoder.embed_dim)
    key = jax.random.key(cfg.meta.seed + 1)
    dummy = jnp.zeros((1, layout.num_tokens, handles.encoder.embed_dim), jnp.float32)
    probe_params = jax.jit(probe.init)(key, dummy)["params"]
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
    )
    probe_state = ProbeState(
        step=jnp.zeros((), jnp.int32),
        probe_params=probe_params,
        opt=adamw_init(probe_params),
    )
    # shard over the pretrain mesh: probe state + frozen params follow the
    # param rules, batches shard over (data, fsdp), donate the probe state
    from jax.sharding import NamedSharding, PartitionSpec as P
    from avjepa_tpu.parallel.mesh import param_shardings, state_shardings

    mesh = handles.mesh
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(("data", "fsdp")))
    mask_sh = NamedSharding(mesh, P(None, ("data", "fsdp")))
    layout = cfg.layout()
    probe_sh = jax.tree_util.tree_map(lambda _: repl, probe_state)
    step_fn = jax.jit(
        make_probe_step(handles.encoder, handles.predictor, probe, sched),
        in_shardings=(
            probe_sh,
            param_shardings(mesh, handles.state.target_params),
            param_shardings(mesh, handles.state.pred_params),
            batch_sh,
            batch_sh if layout.audio_enabled else None,
            mask_sh,
            mask_sh,
        ),
        out_shardings=(probe_sh, repl),
        donate_argnums=(0,),
    )
    return handles, probe, probe_state, step_fn


def restore_jepa_weights(handles, cfg: ExperimentConfig, logger,
                         require: bool = False) -> bool:
    """Restore the frozen pretrained JEPA state from cfg.meta.read_checkpoint
    into handles.state (in place). Returns True when weights were restored.

    When the checkpoint is missing/empty this warns loudly (the frozen
    encoder would silently be the random init otherwise) and, with
    ``require=True`` (set by evals/av_prediction.run, mirroring its strict
    probe restore), raises instead of no-op."""
    jepa_ckpt_dir = cfg.meta.read_checkpoint
    state = handles.state
    if jepa_ckpt_dir and os.path.isdir(jepa_ckpt_dir):
        ck = CheckpointManager(jepa_ckpt_dir)
        try:
            if ck.latest_step() is not None:
                # restore into an abstract template AFTER freeing the init
                # state's device buffers — keeping both full states alive OOMs
                # large models on one chip (see train/pretrain.py resume)
                like = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                   sharding=x.sharding),
                    state,
                )
                for leaf in jax.tree_util.tree_leaves(state):
                    leaf.delete()
                handles.state = ck.restore(like)
                logger.info("restored frozen JEPA weights")
                return True
        finally:
            ck.close()
    msg = (
        f"no pretrained JEPA checkpoint at meta.read_checkpoint="
        f"{jepa_ckpt_dir!r}; the frozen encoder/predictor are RANDOMLY "
        "INITIALIZED"
    )
    if require:
        raise FileNotFoundError(msg)
    logger.warning(msg)
    return False


def run(
    cfg: ExperimentConfig,
    max_steps: Optional[int] = None,
    resume_preempt: bool = False,
) -> dict:
    logger = get_logger(rank=jax.process_index())
    handles, probe, probe_state, step_fn = setup_probe(cfg)

    folder = cfg.logging.folder
    os.makedirs(folder, exist_ok=True)
    tag = cfg.logging.write_tag

    # restore pretrained encoder/predictor/target from the JEPA checkpoint
    restore_jepa_weights(handles, cfg, logger)
    state = handles.state

    # the frozen path uses the *target* encoder weights (reference freezes the
    # loaded encoder; target is the EMA, the canonical representation)
    enc_params = state.target_params
    pred_params = state.pred_params

    csv_logger = CSVLogger(
        os.path.join(folder, f"{tag}_probe_r{jax.process_index()}.csv"),
        ("%d", "epoch"), ("%d", "itr"), ("%.5f", "loss"),
        ("%.5f", "loss-video"), ("%.5f", "loss-audio"),
    )
    ckpt = CheckpointManager(os.path.join(folder, f"{tag}-probe-ckpt"))
    last_saved = -1
    start_epoch = 0
    if resume_preempt and ckpt.latest_step() is not None:
        # resume the PROBE itself (the frozen JEPA weights above are
        # deterministic); saves are per-epoch, so completed epochs are
        # recovered from the restored optimizer step
        restored = ckpt.restore(jax.device_get(probe_state))
        if restored is not None:
            probe_state = restored
            last_saved = int(np.asarray(probe_state.step))
            start_epoch = min(
                last_saved // max(cfg.optimization.ipe, 1),
                cfg.optimization.epochs,
            )
            logger.info(
                f"resumed probe from step {last_saved} (epoch {start_epoch})"
            )

    total = 0
    summary = {}
    data_iter = iter(handles.loader)
    for epoch in range(start_epoch, cfg.optimization.epochs):
        handles.loader.set_epoch(epoch)
        meter = AverageMeter()
        for itr in range(cfg.optimization.ipe):
            try:
                video, audio, _, masks = next(data_iter)
            except StopIteration:
                data_iter = iter(handles.loader)
                video, audio, _, masks = next(data_iter)
            enc_m, pred_m = stack_masksets(masks)
            if jax.process_count() > 1:
                # contribute the process-local shard of the global batch
                # (see train/pretrain.py TrainHandles.step)
                from jax.sharding import NamedSharding, PartitionSpec as P
                from avjepa_tpu.parallel.mesh import batch_sharding, put_batch

                mesh = handles.mesh
                b_sh = batch_sharding(mesh)
                m_sh = NamedSharding(mesh, P(None, ("data", "fsdp")))
                video_g = put_batch(mesh, video, b_sh)
                audio_g = None if audio is None else put_batch(mesh, audio, b_sh)
                enc_g = put_batch(mesh, enc_m, m_sh)
                pred_g = put_batch(mesh, pred_m, m_sh)
            else:
                video_g = jnp.asarray(video)
                audio_g = None if audio is None else jnp.asarray(audio)
                enc_g, pred_g = jnp.asarray(enc_m), jnp.asarray(pred_m)
            probe_state, metrics = step_fn(
                probe_state, enc_params, pred_params,
                video_g, audio_g, enc_g, pred_g,
            )
            metrics = jax.device_get(metrics)
            meter.update(float(metrics["loss"]))
            csv_logger.log(
                epoch + 1, itr, float(metrics["loss"]),
                float(metrics["loss_video"]), float(metrics["loss_audio"]),
            )
            if itr % cfg.logging.log_freq == 0:
                logger.info(
                    f"[probe {epoch + 1}, {itr:5d}] loss {meter.avg:.4f} "
                    f"(v {float(metrics['loss_video']):.4f} a {float(metrics['loss_audio']):.4f})"
                )
            total += 1
            if max_steps is not None and total >= max_steps:
                break
        # all processes participate (Orbax save syncs globally; a proc-0-only
        # guard deadlocks multi-host — see evals/video_classification.py);
        # the probe state is replicated, Orbax writes once from the primary.
        # Skip unadvanced steps; force=True overwrites ids left by a
        # previous non-resumed run in the same folder.
        step_now = int(jax.device_get(probe_state.step))
        if step_now != last_saved:
            ckpt.save(step_now, jax.device_get(probe_state), force=True)
            last_saved = step_now
        summary = {"epoch": epoch + 1, "avg_loss": meter.avg}
        if max_steps is not None and total >= max_steps:
            break
    ckpt.close()
    return summary


def main(args: dict, resume_preempt: bool = False):
    cfg = load_config(args)
    return run(cfg, resume_preempt=resume_preempt)


def example_main(args: dict, resume_preempt: bool = False):
    """Inference/visualization twin (reference: app/avprediction_example/):
    loads the trained probe, reconstructs one batch, writes side-by-side
    original vs reconstruction arrays (PNG when matplotlib is available,
    .npz always)."""
    cfg = load_config(args)
    logger = get_logger()
    handles, probe, probe_state, step_fn = setup_probe(cfg)

    folder = cfg.logging.folder
    os.makedirs(folder, exist_ok=True)
    probe_dir = os.path.join(folder, f"{cfg.logging.write_tag}-probe-ckpt")
    if os.path.isdir(probe_dir):
        ck = CheckpointManager(probe_dir)
        restored = ck.restore(jax.device_get(probe_state))
        if restored is not None:
            probe_state = restored
            logger.info("loaded trained probe")
        ck.close()

    video, audio, _, masks = next(iter(handles.loader))
    enc_m, pred_m = stack_masksets(masks)
    state = handles.state
    ctx = handles.encoder.apply(
        {"params": state.target_params}, jnp.asarray(video),
        None if audio is None else jnp.asarray(audio),
        key_mask=jnp.asarray(enc_m[0]),
    )
    z = handles.predictor.apply(
        {"params": state.pred_params}, ctx, jnp.asarray(enc_m[0]),
        jnp.asarray(pred_m[0]), 0,
    )
    full = jnp.where(
        jnp.asarray(enc_m[0])[..., None], ctx,
        jnp.where(jnp.asarray(pred_m[0])[..., None], z, 0.0),
    )
    video_recon, audio_recon = probe.apply({"params": probe_state.probe_params}, full)

    out_path = os.path.join(folder, "avprediction_example.npz")
    np.savez(
        out_path,
        video=np.asarray(video[0]),
        video_recon=np.asarray(video_recon[0]),
        audio=np.asarray(audio[0]) if audio is not None else np.zeros(1),
        audio_recon=(
            np.asarray(audio_recon[0]) if audio_recon is not None else np.zeros(1)
        ),
    )
    logger.info(f"wrote {out_path}")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        with_audio = audio is not None and audio_recon is not None
        fig, axes = plt.subplots(2 if with_audio else 1, 2, figsize=(10, 8),
                                 squeeze=False)
        axes[0, 0].imshow(np.clip(np.asarray(video[0, 0]), 0, 1))
        axes[0, 0].set_title("original frame")
        axes[0, 1].imshow(np.clip(np.asarray(video_recon[0, 0]), 0, 1))
        axes[0, 1].set_title("reconstructed frame")
        if with_audio:
            axes[1, 0].imshow(np.asarray(audio[0, :, :, 0]), aspect="auto")
            axes[1, 0].set_title("original spectrogram")
            axes[1, 1].imshow(np.asarray(audio_recon[0, :, :, 0]), aspect="auto")
            axes[1, 1].set_title("reconstructed spectrogram")
        png = os.path.join(folder, "avprediction_example.png")
        fig.savefig(png, dpi=100, bbox_inches="tight")
        logger.info(f"wrote {png}")
    except ImportError:
        logger.info("matplotlib unavailable; skipped PNG")
    return out_path
