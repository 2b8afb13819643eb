"""Frozen-backbone video classification eval (attentive probe).

Reference: evals/video_classification_frozen/eval.py + utils.py — load
pretrained target-encoder weights into a video-only ViT, wrap in clip
aggregation (multi-segment / multi-view; optional attend-across-segments
temporal concat with 1D pos-embed), train an AttentiveClassifier with
cross-entropy, report softmax-averaged top-1.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from avjepa_tpu.data.av_dataset import load_index, sample_clip_indices
from avjepa_tpu.data.loader import JepaLoader, ShardedSampler, exact_val_collate
from avjepa_tpu.data.transforms import EvalVideoTransform, VideoTransform
from avjepa_tpu.data.video_decoder import VideoFile
from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models import make_encoder
from avjepa_tpu.models.attentive_pooler import AttentiveClassifier
from avjepa_tpu.models.factory import VIT_SPECS
from avjepa_tpu.models import pos_embed as pe
from avjepa_tpu.train.optim import (
    AdamWState,
    ScheduleConfig,
    adamw_init,
    adamw_update,
    clip_by_global_norm,
    lr_at_step,
    wd_mask,
)
from avjepa_tpu.utils.checkpoint import CheckpointManager
from avjepa_tpu.utils.logging import AverageMeter, CSVLogger, get_logger


@dataclasses.dataclass
class VideoEvalConfig:
    dataset_train: str = ""
    dataset_val: str = ""
    num_classes: int = 400
    frames_per_clip: int = 16
    num_segments: int = 1
    num_views_per_segment: int = 1
    frame_step: int = 4
    attend_across_segments: bool = True
    use_pos_embed: bool = False
    # frame aggregation: encode every frame independently with an image-mode
    # encoder and concatenate all frame tokens (reference FrameAggregation,
    # evals/video_classification_frozen/utils.py:23-83 — for image-pretrained
    # backbones evaluated on video)
    frame_aggregation: bool = False
    num_epochs: int = 20
    resolution: int = 224
    batch_size: int = 4
    num_workers: int = 8
    weight_decay: float = 0.01
    lr: float = 1e-3
    start_lr: float = 1e-3
    final_lr: float = 0.0
    warmup: float = 0.0
    use_bfloat16: bool = True
    # pretrain section
    model_name: str = "vit_large"
    patch_size: int = 16
    tubelet_size: int = 2
    uniform_power: bool = True
    checkpoint: str = ""  # our Orbax ckpt dir from pretraining
    # a configured-but-absent/mismatched checkpoint is an ERROR unless
    # this is set: silently probing a random encoder wastes the run
    allow_missing_checkpoint: bool = False
    # resume the probe classifier from its own checkpoint — opt-in like the
    # reference (eval.py:116), or forced by preemption resume
    resume_checkpoint: bool = False
    # cached-feature probe mode: the encoder is FROZEN, so encode every train
    # clip ONCE (deterministic eval views) and keep the features resident on
    # device, then run ipe*num_epochs probe updates at device speed with no
    # per-epoch host decode. This is the standard fixed-feature linear-probe
    # protocol; the reference instead re-decodes + re-augments every epoch
    # (evals/video_classification_frozen/eval.py:303-385), which on a slow
    # host caps the probe at a handful of updates. Off by default (parity);
    # turn on when probe updates, not augmentation variety, are the
    # bottleneck (e.g. small datasets / many-epoch probes).
    cache_features: bool = False
    checkpoint_key: str = "target_encoder"
    folder: str = "./eval_logs"
    tag: str = "video-eval"
    seed: int = 0
    # tpu build extension
    source: str = "files"  # 'synthetic' for tests
    # must match the GELU the checkpoint was PRETRAINED with (tpu.gelu in the
    # pretrain config; 'tanh' is the pretrain default) — a mismatch is a
    # silent forward-numerics divergence in the frozen encoder
    gelu: str = "tanh"


def config_from_yaml(d: dict) -> VideoEvalConfig:
    # a bare section key ("logging:" with no body) parses to None, not {} —
    # same guard as app/main_distributed.py
    sec = lambda k: d.get(k) or {}
    data = sec("data")
    opt = sec("optimization")
    pre = sec("pretrain")
    return VideoEvalConfig(
        dataset_train=data.get("dataset_train", ""),
        dataset_val=data.get("dataset_val", ""),
        num_classes=data.get("num_classes", 400),
        frames_per_clip=data.get("frames_per_clip", 16),
        num_segments=data.get("num_segments", 1),
        num_views_per_segment=data.get("num_views_per_segment", 1),
        frame_step=data.get("frame_step", 4),
        num_workers=data.get("num_workers", 8),
        attend_across_segments=opt.get("attend_across_segments", True),
        # 1D temporal pos-embed across segments (reference ClipAggregation
        # exposes the flag, utils.py:96-113, but never wires it to YAML; here
        # it is reachable from the config)
        use_pos_embed=opt.get("use_pos_embed", False),
        frame_aggregation=opt.get("frame_aggregation", False),
        num_epochs=opt.get("num_epochs", 20),
        resolution=opt.get("resolution", 224),
        batch_size=opt.get("batch_size", 4),
        weight_decay=opt.get("weight_decay", 0.01),
        lr=opt.get("lr", 1e-3),
        start_lr=opt.get("start_lr", 1e-3),
        final_lr=opt.get("final_lr", 0.0),
        warmup=opt.get("warmup", 0.0),
        use_bfloat16=opt.get("use_bfloat16", True),
        cache_features=opt.get("cache_features", False),
        model_name=pre.get("model_name", "vit_large"),
        patch_size=pre.get("patch_size", 16),
        tubelet_size=pre.get("tubelet_size", 2),
        uniform_power=pre.get("uniform_power", True),
        checkpoint=os.path.join(pre.get("folder", ""), pre.get("checkpoint", "")),
        checkpoint_key=pre.get("checkpoint_key", "target_encoder"),
        allow_missing_checkpoint=pre.get("allow_missing_checkpoint", False),
        resume_checkpoint=opt.get("resume_checkpoint", False),
        folder=d.get("folder", (d.get("logging") or {}).get("folder", "./eval_logs")),
        tag=d.get("tag", "video-eval"),
        source=data.get("source", "files"),
        gelu=(d.get("tpu") or {}).get("gelu", pre.get("gelu", "tanh")),
    )


class VideoClassificationDataset:
    """Multi-segment / multi-view eval dataset (video-only)."""

    def __init__(self, cfg: VideoEvalConfig, train: bool,
                 eval_views: bool = False):
        self.cfg = cfg
        self.train = train
        # eval_views forces the deterministic eval transform (multi-segment
        # center views) on the TRAIN file list — the cached-feature probe
        # mode encodes each train clip once with val-identical geometry
        self.eval_views = eval_views
        csv = cfg.dataset_train if train else cfg.dataset_val
        self.paths, self.labels, _ = load_index([csv])
        self.train_tf = VideoTransform(
            crop_size=cfg.resolution,
            random_resize_scale=(0.08, 1.0),
            random_resize_aspect_ratio=(0.75, 4 / 3),
        )
        self.eval_tf = EvalVideoTransform(
            num_views=cfg.num_views_per_segment,
            short_side=cfg.resolution,
            crop_size=cfg.resolution,
        )

    def __len__(self):
        return len(self.paths)

    def set_epoch(self, epoch: int) -> None:
        # fresh train-time crops/clip positions every epoch
        self._epoch_salt = int(epoch)

    def __getitem__(self, idx: int):
        cfg = self.cfg
        vf = VideoFile(self.paths[idx])
        rng = np.random.default_rng(
            [cfg.seed, int(self.train), getattr(self, "_epoch_salt", 0), idx]
        )
        as_train = self.train and not self.eval_views
        segs = sample_clip_indices(
            vf.num_frames, cfg.frames_per_clip, cfg.frame_step,
            1 if as_train else cfg.num_segments,
            rng, random_clip_sampling=as_train,
        )
        all_idx = np.concatenate(segs)
        frames = vf.decode_frames(np.sort(all_idx))
        order = np.argsort(np.argsort(all_idx, kind="stable"), kind="stable")
        frames = frames[order]
        fpc = cfg.frames_per_clip
        clips = [frames[i * fpc : (i + 1) * fpc] for i in range(len(segs))]
        if as_train:
            views = [[self.train_tf(clips[0], rng)]]
        else:
            views = [self.eval_tf(c) for c in clips]  # [seg][view]
        return views, segs, int(self.labels[idx])


class SyntheticVideoClsDataset:
    def __init__(self, cfg: VideoEvalConfig, train: bool, length: int = 64):
        self.cfg = cfg
        self.train = train
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        cfg = self.cfg
        rng = np.random.default_rng([7, int(self.train), idx])
        label = idx % cfg.num_classes
        n_seg = 1 if self.train else cfg.num_segments
        n_view = 1 if self.train else cfg.num_views_per_segment
        base = rng.normal(label / cfg.num_classes, 0.5)
        views = [
            [
                (base + rng.normal(0, 0.1, (cfg.frames_per_clip, cfg.resolution,
                                            cfg.resolution, 3))).astype(np.float32)
                for _ in range(n_view)
            ]
            for _ in range(n_seg)
        ]
        segs = [
            np.arange(cfg.frames_per_clip) * cfg.frame_step + s
            for s in range(n_seg)
        ]
        return views, segs, label


def _leaf_paths(tree):
    import jax.tree_util as jtu

    out = {}
    for path, leaf in jtu.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out[name] = leaf
    return out


def load_target_encoder_params(
    ckpt_dir: str, video_params_like, strict: bool = False,
    prefer: str = "target_params",
):
    """Load the pretraining checkpoint's target-encoder subtree into a
    video-only encoder param tree.

    Per-leaf shape-tolerant merge with loud logging, like the reference's
    load_pretrained (evals/video_classification_frozen/eval.py:419-444):
    leaves whose name+shape match are taken from the checkpoint; mismatched
    or missing leaves keep their init values and are logged; checkpoint-only
    leaves (e.g. the audio patch embed of an AV pretrain) are counted and
    dropped. The restore goes through an ABSTRACT template built from the
    checkpoint's own metadata (no raw untyped restore).

    strict=True turns a missing checkpoint or any mismatched/missing leaf
    into an error — a silent random encoder makes the whole probe run
    meaningless.
    """
    logger = get_logger(rank=jax.process_index())
    mngr = CheckpointManager(ckpt_dir)
    step = mngr.latest_step()
    if step is None:
        mngr.close()
        if strict:
            raise FileNotFoundError(
                f"no checkpoint found under {ckpt_dir!r}; pass "
                "pretrain.allow_missing_checkpoint: true to probe a random "
                "encoder anyway"
            )
        return None
    meta = mngr.mngr.item_metadata(step)
    template = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta
    )
    restored = mngr.restore(template, step)
    mngr.close()
    src = (
        restored[prefer]
        if isinstance(restored, dict) and prefer in restored
        else restored
    )

    src_leaves = _leaf_paths(src)
    like_leaves = _leaf_paths(video_params_like)
    taken, mismatched, missing = [], [], []
    merged = {}
    for name, init_leaf in like_leaves.items():
        ck = src_leaves.get(name)
        if ck is None:
            missing.append(name)
            merged[name] = init_leaf
        elif tuple(ck.shape) != tuple(init_leaf.shape):
            mismatched.append((name, tuple(ck.shape), tuple(init_leaf.shape)))
            merged[name] = init_leaf
        else:
            taken.append(name)
            merged[name] = np.asarray(ck).astype(init_leaf.dtype)
    dropped = sorted(set(src_leaves) - set(like_leaves))

    for name in missing:
        logger.warning(f"checkpoint merge: {name} NOT in checkpoint; keeping init")
    for name, cs, ls in mismatched:
        logger.warning(
            f"checkpoint merge: {name} shape {cs} != model {ls}; keeping init"
        )
    logger.info(
        f"checkpoint merge: {len(taken)} leaves loaded, {len(missing)} missing, "
        f"{len(mismatched)} shape-mismatched, {len(dropped)} checkpoint-only "
        f"dropped (e.g. audio patch embed on a video-only eval)"
    )
    if strict and (missing or mismatched):
        raise ValueError(
            f"checkpoint {ckpt_dir!r} does not cover the encoder: "
            f"{len(missing)} missing + {len(mismatched)} mismatched leaves "
            "(see log); pass pretrain.allow_missing_checkpoint: true to "
            "keep init values for them"
        )

    # rebuild the nested structure from the flat names
    import jax.tree_util as jtu

    paths_and_leaves = jtu.tree_leaves_with_path(video_params_like)
    flat_merged = [
        merged["/".join(str(getattr(k, "key", k)) for k in path)]
        for path, _ in paths_and_leaves
    ]
    treedef = jtu.tree_structure(video_params_like)
    return jtu.tree_unflatten(treedef, flat_merged)


def run(cfg: VideoEvalConfig, max_steps: Optional[int] = None) -> dict:
    logger = get_logger(rank=jax.process_index())
    dtype = jnp.bfloat16 if cfg.use_bfloat16 else jnp.float32
    layout = TokenLayout(
        num_frames=1 if cfg.frame_aggregation else cfg.frames_per_clip,
        crop_size=cfg.resolution,
        patch_size=cfg.patch_size,
        tubelet_size=cfg.tubelet_size,
        audio_enabled=False,
    )
    encoder = make_encoder(
        cfg.model_name, layout, uniform_power=cfg.uniform_power, dtype=dtype,
        gelu=cfg.gelu,
    )
    from avjepa_tpu.models import init_encoder_params

    enc_params = init_encoder_params(encoder, jax.random.key(cfg.seed))
    if cfg.checkpoint:
        strict = not cfg.allow_missing_checkpoint
        if not os.path.isdir(cfg.checkpoint):
            msg = f"pretrain checkpoint dir {cfg.checkpoint!r} does not exist"
            if strict:
                raise FileNotFoundError(
                    msg + "; pass pretrain.allow_missing_checkpoint: true "
                    "to probe a random encoder anyway"
                )
            logger.warning(msg + "; evaluating a RANDOM encoder")
        else:
            loaded = load_target_encoder_params(
                cfg.checkpoint, enc_params, strict=strict
            )
            if loaded is not None:
                enc_params = loaded
                logger.info(f"loaded pretrained encoder from {cfg.checkpoint}")
            else:
                logger.warning(
                    f"no checkpoint step under {cfg.checkpoint!r}; "
                    "evaluating a RANDOM encoder"
                )

    spec = VIT_SPECS[cfg.model_name]
    classifier = AttentiveClassifier(
        embed_dim=spec.embed_dim,
        num_heads=spec.num_heads,
        depth=1,
        num_classes=cfg.num_classes,
        dtype=dtype,
    )
    n_tok = layout.num_tokens * (cfg.num_segments if cfg.attend_across_segments else 1)
    cls_params = jax.jit(classifier.init)(
        jax.random.key(cfg.seed + 1),
        jnp.zeros((1, n_tok, spec.embed_dim), jnp.float32),
    )["params"]

    # data
    if cfg.source == "synthetic" or not cfg.dataset_train:
        train_ds = SyntheticVideoClsDataset(cfg, train=True)
        val_ds = SyntheticVideoClsDataset(cfg, train=False, length=32)
    else:
        train_ds = VideoClassificationDataset(cfg, train=True)
        val_ds = VideoClassificationDataset(cfg, train=False)

    # batch_size is per-chip (reference: per-GPU); scale by mesh size
    global_batch = cfg.batch_size * jax.device_count()
    local_batch = global_batch // jax.process_count()
    ipe = max(1, len(train_ds) // global_batch)
    sched = ScheduleConfig(
        ipe=ipe,
        num_epochs=cfg.num_epochs,
        ipe_scale=1.0,
        warmup_epochs=cfg.warmup,
        start_lr=cfg.start_lr,
        ref_lr=cfg.lr,
        final_lr=cfg.final_lr,
        ref_wd=cfg.weight_decay,
        final_wd=cfg.weight_decay,
    )

    t_grid = layout.t_grid
    n_spatial = layout.h_grid * layout.w_grid

    # eval parallelism: batch-shard every jitted function over a pure-DP mesh
    # so all local chips work (reference evals are DDP,
    # evals/video_classification_frozen/eval.py:353-365); metrics computed
    # inside jit reduce over the GLOBAL batch.
    from avjepa_tpu.parallel.mesh import batch_sharding, eval_mesh, put_batch, replicated

    mesh = eval_mesh()
    batch_sh = batch_sharding(mesh)
    repl = replicated(mesh)

    def encode(enc_params, clips):  # clips: [Beff, T, H, W, 3]
        if cfg.frame_aggregation:
            # image-mode encoder per frame; concat all frame tokens
            b, t = clips.shape[0], clips.shape[1]
            frames = clips.reshape(b * t, *clips.shape[2:])
            out = encoder.apply({"params": enc_params}, frames)
            return out.reshape(b, t * out.shape[1], out.shape[2])
        return encoder.apply({"params": enc_params}, clips)

    encode = jax.jit(encode, in_shardings=(repl, batch_sh))

    def aggregate(outputs_by_seg: list, clip_indices: Optional[np.ndarray]):
        """attend-across-segments: temporal concat + optional 1D pos embed
        (reference ClipAggregation, utils.py:138-159)."""
        if not cfg.attend_across_segments:
            return outputs_by_seg
        out = jnp.concatenate(outputs_by_seg, axis=1)
        if cfg.use_pos_embed and clip_indices is not None:
            d = out.shape[-1]
            max_t = 10000 // cfg.tubelet_size
            pos = jnp.asarray(pe.sincos_1d(d, max_t), out.dtype)
            idx = clip_indices[:, :, :: cfg.tubelet_size]  # [S, B, T]
            chunks = []
            for s in range(idx.shape[0]):
                p = pos[idx[s]]  # [B, T, D]
                p = jnp.repeat(p[:, :, None, :], n_spatial, axis=2).reshape(
                    p.shape[0], -1, d
                )
                chunks.append(p)
            out = out + jnp.concatenate(chunks, axis=1)
        return [out]

    def cls_loss(cls_params, feats, labels):
        logits = classifier.apply({"params": cls_params}, feats)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
        return loss, logits

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, batch_sh, batch_sh),
        out_shardings=repl,
    )
    def train_step(cls_params, opt: AdamWState, step, feats, labels):
        lr = lr_at_step(sched, step)
        (loss, logits), grads = jax.value_and_grad(cls_loss, has_aux=True)(
            cls_params, feats, labels
        )
        grads, gnorm = clip_by_global_norm(grads, 1.0)
        cls_params, opt = adamw_update(
            grads, opt, cls_params, lr, jnp.asarray(cfg.weight_decay),
            wd_mask(cls_params),
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return cls_params, opt, {"loss": loss, "acc": acc, "lr": lr}

    @functools.partial(jax.jit, in_shardings=(repl, batch_sh))
    def predict(cls_params, feats):
        logits = classifier.apply({"params": cls_params}, feats)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    from avjepa_tpu.parallel.mesh import count_correct, count_valid

    def collate(samples):
        # [seg][view] sample lists -> stacked [seg][view][B, T, H, W, 3]
        views = [s[0] for s in samples]
        segs = [s[1] for s in samples]
        labels = [s[2] for s in samples]
        n_seg = len(views[0])
        n_view = len(views[0][0])
        batched = [
            [np.stack([views[b][s][v] for b in range(len(views))]) for v in range(n_view)]
            for s in range(n_seg)
        ]
        seg_idx = np.stack(
            [np.stack([segs[b][s] for b in range(len(views))]) for s in range(n_seg)]
        )  # [S, B, T]
        return batched, seg_idx, np.asarray(labels)

    opt = adamw_init(cls_params)
    step = jnp.zeros((), jnp.int32)

    # classifier-only checkpointing (reference: eval.py:250-261)
    os.makedirs(cfg.folder, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(cfg.folder, f"{cfg.tag}-cls-ckpt"))
    start_epoch = 0
    template = {"cls": jax.device_get(cls_params), "opt": jax.device_get(opt),
                "step": np.zeros((), np.int32), "epoch": np.zeros((), np.int32)}
    restored = None
    if cfg.resume_checkpoint:  # opt-in / preemption resume (reference :116)
        try:
            restored = ckpt.restore(template)
        except Exception:
            # stale/shape-mismatched checkpoint (e.g. different num_classes):
            # start fresh, like the reference's shape-tolerant load
            restored = None
    if restored is not None:
        cls_params = jax.device_put(restored["cls"])
        opt = jax.device_put(restored["opt"])
        step = jnp.asarray(restored["step"], jnp.int32)
        start_epoch = int(restored["epoch"])
        logger.info(f"resumed classifier at epoch {start_epoch}")
    last_saved = int(jax.device_get(step)) if restored is not None else -1

    csv_logger = CSVLogger(
        os.path.join(cfg.folder, f"{cfg.tag}_r{jax.process_index()}.csv"),
        ("%d", "epoch"), ("%d", "itr"), ("%.5f", "loss"), ("%.3f", "acc"),
        ("%.2e", "lr"),
    )
    summary = {}
    total = 0
    train_loader = None

    def save_probe(epoch: int) -> None:
        # EVERY process calls save: Orbax's save runs a global sync barrier,
        # so a process_index()==0 guard deadlocks multi-host runs (proc 0
        # waits in the barrier, the others move on — caught by the true
        # 2-process eval test). The state is replicated numpy after
        # device_get; Orbax writes it once, from the primary host. Skip
        # zero-step epochs (re-saving a step id raises); force=True
        # overwrites ids left by a previous non-resumed run.
        nonlocal last_saved
        step_now = int(jax.device_get(step))
        if step_now != last_saved:
            ckpt.save(
                step_now,
                {"cls": jax.device_get(cls_params), "opt": jax.device_get(opt),
                 "step": np.asarray(step_now, np.int32),
                 "epoch": np.asarray(epoch + 1, np.int32)},
                force=True,
            )
            last_saved = step_now

    if cfg.cache_features:
        # -- cached-feature probe: encode each train clip ONCE, then run the
        # full ipe*num_epochs probe updates at device speed. The encoder is
        # frozen, so fixed features lose only augmentation variety — the
        # standard fixed-feature probe protocol. Features stay resident on
        # device (no per-step H2D); the gather rides inside the jitted step.
        assert jax.process_count() == 1, (
            "cache_features currently supports single-host runs")
        if cfg.source == "synthetic":
            cache_ds = SyntheticVideoClsDataset(cfg, train=True)
        else:
            cache_ds = VideoClassificationDataset(
                cfg, train=True, eval_views=True)
        seq = ShardedSampler(
            len(cache_ds), local_batch, shuffle=False, seed=0, drop_last=False)
        cache_loader = JepaLoader(
            cache_ds, seq, num_workers=cfg.num_workers,
            collate=exact_val_collate(collate), retry_resample=False,
        )
        chunks, lab_chunks, ok_chunks = [], [], []
        for (batched, seg_idx, labels, ok), valid in zip(
            cache_loader, seq.batch_valid_masks()
        ):
            outs = [encode(enc_params, put_batch(mesh, batched[s][0]))
                    for s in range(len(batched))]
            chunks.append(aggregate(outs, seg_idx)[0])
            lab_chunks.append(labels)
            ok_chunks.append(valid & ok)
        cache_loader.close()
        keep = np.flatnonzero(np.concatenate(ok_chunks))
        cache = jnp.concatenate(chunks, axis=0)[jnp.asarray(keep)]
        cache_labels = jnp.asarray(np.concatenate(lab_chunks)[keep])
        n_cache = int(cache.shape[0])
        logger.info(
            f"[eval] feature cache: {n_cache} clips x {cache.shape[1]} tokens"
            f" x {cache.shape[2]} dims ({cache.nbytes / 2**20:.0f} MiB)")

        @jax.jit
        def cached_probe_step(cls_params, opt, step, cache, cache_labels, idx):
            feats = jnp.take(cache, idx, axis=0)
            labels = jnp.take(cache_labels, idx, axis=0)
            lr = lr_at_step(sched, step)
            (loss, logits), grads = jax.value_and_grad(
                cls_loss, has_aux=True)(cls_params, feats, labels)
            grads, _ = clip_by_global_norm(grads, 1.0)
            cls_params, opt = adamw_update(
                grads, opt, cls_params, lr, jnp.asarray(cfg.weight_decay),
                wd_mask(cls_params),
            )
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return cls_params, opt, {"loss": loss, "acc": acc, "lr": lr}

        draw = np.random.default_rng([cfg.seed, 17])
        bsz = min(global_batch, n_cache)
        for epoch in range(start_epoch, cfg.num_epochs):
            meter = AverageMeter()
            for _ in range(ipe):
                idx = jnp.asarray(
                    draw.choice(n_cache, size=bsz, replace=False))
                cls_params, opt, m = cached_probe_step(
                    cls_params, opt, step, cache, cache_labels, idx)
                step = step + 1
                m = jax.device_get(m)
                meter.update(float(m["acc"]) * 100)
                csv_logger.log(
                    epoch + 1, total, float(m["loss"]),
                    float(m["acc"]) * 100, float(m["lr"]),
                )
                total += 1
            if (epoch + 1) % max(1, cfg.num_epochs // 10) == 0:
                logger.info(
                    f"[eval-train {epoch + 1}] top1(train) {meter.avg:.2f}%")
            summary["train_acc"] = meter.avg
            if (epoch + 1) % 10 == 0 or epoch + 1 == cfg.num_epochs:
                save_probe(epoch)
            if max_steps is not None and total >= max_steps:
                break
    else:
        # worker-pool + prefetch + retry-resample batch pipeline — the
        # pretrain loader's machinery (a corrupt clip is resampled, not
        # fatal; decode overlaps device steps). Reference: 8-12-worker eval
        # DataLoaders, evals/video_classification_frozen/eval.py:447-493.
        sampler = ShardedSampler(len(train_ds), local_batch, seed=cfg.seed)
        train_loader = JepaLoader(
            train_ds, sampler, num_workers=cfg.num_workers, collate=collate
        )
        for epoch in range(start_epoch, cfg.num_epochs):
            train_loader.set_epoch(epoch)
            meter = AverageMeter()
            for batched, seg_idx, labels in train_loader:
                outs = [encode(enc_params, put_batch(mesh, batched[s][0]))
                        for s in range(len(batched))]
                feats = aggregate(outs, seg_idx)[0]
                cls_params, opt, m = train_step(
                    cls_params, opt, step, feats, put_batch(mesh, labels)
                )
                step = step + 1
                m = jax.device_get(m)
                meter.update(float(m["acc"]) * 100)
                csv_logger.log(
                    epoch + 1, total, float(m["loss"]), float(m["acc"]) * 100,
                    float(m["lr"]),
                )
                total += 1
                if max_steps is not None and total >= max_steps:
                    break
            logger.info(f"[eval-train {epoch + 1}] top1(train) {meter.avg:.2f}%")
            summary["train_acc"] = meter.avg
            save_probe(epoch)
            if max_steps is not None and total >= max_steps:
                break
    ckpt.close()

    # validation: average softmax over segments x views
    val_sampler = ShardedSampler(
        len(val_ds), local_batch, shuffle=False, seed=0, drop_last=False
    )
    # exact accounting: decode failures are EXCLUDED from top-1 (no
    # silent resample-substitution on the val set)
    val_loader = JepaLoader(
        val_ds, val_sampler, num_workers=cfg.num_workers,
        collate=exact_val_collate(collate), retry_resample=False,
    )
    correct = 0
    count = 0
    # zip per-batch validity: wrap-padded duplicate rows must not count
    # toward top-1 (the reference's ragged torch loader scores each val
    # sample exactly once)
    for (batched, seg_idx, labels, ok), valid in zip(
        val_loader, val_sampler.batch_valid_masks()
    ):
        valid = valid & ok  # decode failures excluded from the exact metric
        n_view = len(batched[0])
        probs = 0.0
        for v in range(n_view):
            outs = [encode(enc_params, put_batch(mesh, batched[s][v]))
                    for s in range(len(batched))]
            feats_list = aggregate(outs, seg_idx)
            pv = sum(predict(cls_params, f) for f in feats_list) / len(feats_list)
            probs = probs + pv
        labels_g = put_batch(mesh, labels)
        valid_g = put_batch(mesh, valid)
        correct += int(jax.device_get(count_correct(probs, labels_g, valid_g)))
        count += int(jax.device_get(count_valid(valid_g)))
    if train_loader is not None:
        train_loader.close()
    val_loader.close()
    top1 = 100.0 * correct / max(count, 1)
    logger.info(f"[eval] val top-1: {top1:.2f}%")
    summary["val_top1"] = top1
    return summary


def main(args: dict, resume_preempt: bool = False):
    cfg = config_from_yaml(args)
    if resume_preempt:
        cfg = dataclasses.replace(cfg, resume_checkpoint=True)
    return run(cfg)
