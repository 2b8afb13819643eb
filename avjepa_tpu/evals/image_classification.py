"""Frozen-backbone image classification eval.

Reference: evals/image_classification_frozen/eval.py — the same attentive
probe on single images; video-pretrained encoders see the image replicated
across ``frames_per_clip`` frames (the reference does this with a
forward_pre_hook, eval.py:451-457; here it is a plain broadcast).

Datasets: class-per-subdirectory image folders (the reference's torchvision
ImageFolder convention) or a ``path label`` CSV; image decode goes through the
same native libav decoder (mjpeg/png are libavcodec decoders).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from avjepa_tpu.data.av_dataset import load_index
from avjepa_tpu.data.loader import JepaLoader, ShardedSampler, exact_val_collate
from avjepa_tpu.data.randaugment import auto_augment_original
from avjepa_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _bilinear_resize,
    random_erasing,
    sample_crop_box,
)
from avjepa_tpu.data.video_decoder import VideoFile
from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models import init_encoder_params, make_encoder
from avjepa_tpu.models.attentive_pooler import AttentiveClassifier
from avjepa_tpu.models.factory import VIT_SPECS
from avjepa_tpu.train.optim import (
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
class ImageEvalConfig:
    image_folder: str = ""
    dataset_train: str = ""  # CSV alternative
    dataset_val: str = ""
    num_classes: int = 1000
    resolution: int = 224
    batch_size: int = 16
    num_workers: int = 8
    num_epochs: int = 20
    lr: float = 1e-3
    start_lr: float = 1e-3
    final_lr: float = 0.0
    warmup: float = 0.0
    weight_decay: float = 0.01
    use_bfloat16: bool = True
    model_name: str = "vit_large"
    patch_size: int = 16
    frames_per_clip: int = 16  # video encoder: image replicated to this many
    tubelet_size: int = 2
    uniform_power: bool = True
    checkpoint: str = ""
    allow_missing_checkpoint: bool = False
    # resume the probe classifier from its own checkpoint — opt-in like the
    # reference (eval.py:106), or forced by preemption resume
    resume_checkpoint: bool = False
    folder: str = "./eval_logs"
    tag: str = "image-eval"
    seed: int = 0
    source: str = "files"
    # must match the GELU the checkpoint was pretrained with (tpu.gelu)
    gelu: str = "tanh"


def config_from_yaml(d: dict) -> ImageEvalConfig:
    # a bare section key ("logging:" with no body) parses to None, not {} —
    # same guard as app/main_distributed.py
    sec = lambda k: d.get(k) or {}
    data = sec("data")
    opt = sec("optimization")
    pre = sec("pretrain")
    return ImageEvalConfig(
        image_folder=data.get("image_folder", ""),
        dataset_train=data.get("dataset_train", ""),
        dataset_val=data.get("dataset_val", ""),
        num_classes=data.get("num_classes", 1000),
        resolution=opt.get("resolution", 224),
        batch_size=opt.get("batch_size", 16),
        num_workers=data.get("num_workers", 8),
        num_epochs=opt.get("num_epochs", 20),
        lr=opt.get("lr", 1e-3),
        start_lr=opt.get("start_lr", 1e-3),
        final_lr=opt.get("final_lr", 0.0),
        warmup=opt.get("warmup", 0.0),
        weight_decay=opt.get("weight_decay", 0.01),
        use_bfloat16=opt.get("use_bfloat16", True),
        model_name=pre.get("model_name", "vit_large"),
        patch_size=pre.get("patch_size", 16),
        frames_per_clip=pre.get("frames_per_clip", 16),
        tubelet_size=pre.get("tubelet_size", 2),
        uniform_power=pre.get("uniform_power", True),
        checkpoint=os.path.join(pre.get("folder", ""), pre.get("checkpoint", "")),
        allow_missing_checkpoint=pre.get("allow_missing_checkpoint", False),
        resume_checkpoint=opt.get("resume_checkpoint", False),
        folder=d.get("folder", (d.get("logging") or {}).get("folder", "./eval_logs")),
        tag=d.get("tag", "image-eval"),
        source=data.get("source", "files"),
        gelu=(d.get("tpu") or {}).get("gelu", pre.get("gelu", "tanh")),
    )


def _folder_index(root: str):
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            paths.append(os.path.join(cdir, f))
            labels.append(ci)
    return paths, np.asarray(labels)


class ImageDataset:
    def __init__(self, cfg: ImageEvalConfig, train: bool):
        self.cfg = cfg
        self.train = train
        if cfg.image_folder:
            sub = "train" if train else "val"
            self.paths, self.labels = _folder_index(os.path.join(cfg.image_folder, sub))
        else:
            csv = cfg.dataset_train if train else cfg.dataset_val
            self.paths, self.labels, _ = load_index([csv])

    def __len__(self):
        return len(self.paths)

    def set_epoch(self, epoch: int) -> None:
        # fresh train-time crops/flips every epoch
        self._epoch_salt = int(epoch)

    def __getitem__(self, idx: int):
        cfg = self.cfg
        vf = VideoFile(self.paths[idx])
        img = vf.decode_frames(np.array([0]))[0].astype(np.float32)  # [H, W, 3]
        rng = np.random.default_rng(
            [3, int(self.train), getattr(self, "_epoch_salt", 0), idx]
        )
        r = cfg.resolution
        if self.train:
            # timm make_transforms pipeline the reference trains with
            # (eval.py:393-403): RandomResizedCrop -> hflip ->
            # auto_augment='original' -> Normalize -> RandomErasing
            # (re_prob=0.25, pixel mode, after normalization so the fill is
            # standard-normal, matching timm)
            top, left, ch, cw = sample_crop_box(
                img.shape[0], img.shape[1], (0.08, 1.0), (0.75, 4 / 3), rng
            )
            img = _bilinear_resize(img[top : top + ch, left : left + cw], r, r)
            if rng.random() < 0.5:
                img = img[:, ::-1]
            img = auto_augment_original(img, rng)
            img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            img = random_erasing(
                np.ascontiguousarray(img, np.float32)[None], rng, prob=0.25
            )[0]
        else:
            # short side scales WITH the eval resolution — resolution*256/224,
            # not a fixed 256 (reference eval.py:406); a fixed 256 underflows
            # the center crop at resolution 384
            h, w = img.shape[:2]
            s = r * 256 / 224 / min(h, w)
            img = _bilinear_resize(img, int(round(h * s)), int(round(w * s)))
            h, w = img.shape[:2]
            top, left = (h - r) // 2, (w - r) // 2
            img = img[top : top + r, left : left + r]
            img = (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return np.ascontiguousarray(img, np.float32), int(self.labels[idx])


class SyntheticImageDataset:
    def __init__(self, cfg: ImageEvalConfig, train: bool, length: int = 64):
        self.cfg = cfg
        self.train = train
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int):
        cfg = self.cfg
        rng = np.random.default_rng([5, int(self.train), idx])
        label = idx % cfg.num_classes
        img = (label / cfg.num_classes + rng.normal(
            0, 0.1, (cfg.resolution, cfg.resolution, 3)
        )).astype(np.float32)
        return img, label


def run(cfg: ImageEvalConfig, max_steps: Optional[int] = None) -> dict:
    logger = get_logger(rank=jax.process_index())
    dtype = jnp.bfloat16 if cfg.use_bfloat16 else jnp.float32
    layout = TokenLayout(
        num_frames=cfg.frames_per_clip,
        crop_size=cfg.resolution,
        patch_size=cfg.patch_size,
        tubelet_size=cfg.tubelet_size,
        audio_enabled=False,
    )
    encoder = make_encoder(
        cfg.model_name, layout, uniform_power=cfg.uniform_power, dtype=dtype,
        gelu=cfg.gelu,
    )
    enc_params = init_encoder_params(encoder, jax.random.key(cfg.seed))
    if cfg.checkpoint:
        from avjepa_tpu.evals.video_classification import load_target_encoder_params

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
    cls_params = jax.jit(classifier.init)(
        jax.random.key(cfg.seed + 1),
        jnp.zeros((1, layout.num_tokens, spec.embed_dim), jnp.float32),
    )["params"]

    if cfg.source == "synthetic" or (not cfg.image_folder and not cfg.dataset_train):
        train_ds = SyntheticImageDataset(cfg, True)
        val_ds = SyntheticImageDataset(cfg, False, length=32)
    else:
        train_ds = ImageDataset(cfg, True)
        val_ds = ImageDataset(cfg, False)

    # batch_size is per-chip (reference: per-GPU); scale by mesh size and
    # batch-shard all jitted work over a pure-DP mesh (reference evals are
    # DDP; metric sums/means inside jit reduce over the GLOBAL batch)
    from avjepa_tpu.parallel.mesh import batch_sharding, eval_mesh, put_batch, replicated

    mesh = eval_mesh()
    batch_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    global_batch = cfg.batch_size * jax.device_count()
    local_batch = global_batch // jax.process_count()
    ipe = max(1, len(train_ds) // global_batch)
    sched = ScheduleConfig(
        ipe=ipe, num_epochs=cfg.num_epochs, ipe_scale=1.0,
        warmup_epochs=cfg.warmup, start_lr=cfg.start_lr, ref_lr=cfg.lr,
        final_lr=cfg.final_lr, ref_wd=cfg.weight_decay, final_wd=cfg.weight_decay,
    )

    @functools.partial(jax.jit, in_shardings=(repl, batch_sh))
    def encode(enc_params, images):
        # replicate the image across frames for the video tokenizer
        clips = jnp.repeat(images[:, None], cfg.frames_per_clip, axis=1)
        return encoder.apply({"params": enc_params}, clips)

    def cls_loss(cls_params, feats, labels):
        logits = classifier.apply({"params": cls_params}, feats)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1)), logits

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, batch_sh, batch_sh),
        out_shardings=repl,
    )
    def train_step(cls_params, opt, step, feats, labels):
        lr = lr_at_step(sched, step)
        (loss, logits), grads = jax.value_and_grad(cls_loss, has_aux=True)(
            cls_params, feats, labels
        )
        grads, _ = clip_by_global_norm(grads, 1.0)
        cls_params, opt = adamw_update(
            grads, opt, cls_params, lr, jnp.asarray(cfg.weight_decay),
            wd_mask(cls_params),
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return cls_params, opt, {"loss": loss, "acc": acc}

    @functools.partial(jax.jit, in_shardings=(repl, batch_sh))
    def predict(cls_params, feats):
        logits = classifier.apply({"params": cls_params}, feats)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    from avjepa_tpu.parallel.mesh import count_correct, count_valid

    def collate(samples):
        imgs = np.stack([s[0] for s in samples])
        labels = np.asarray([s[1] for s in samples])
        return imgs, labels

    opt = adamw_init(cls_params)
    step = jnp.zeros((), jnp.int32)

    # classifier-only checkpointing + resume (reference saves the probe every
    # epoch and resumes it, evals/image_classification_frozen/eval.py:216-259)
    os.makedirs(cfg.folder, exist_ok=True)
    ckpt = CheckpointManager(os.path.join(cfg.folder, f"{cfg.tag}-cls-ckpt"))
    start_epoch = 0
    template = {"cls": jax.device_get(cls_params), "opt": jax.device_get(opt),
                "step": np.zeros((), np.int32), "epoch": np.zeros((), np.int32)}
    restored = None
    if cfg.resume_checkpoint:  # opt-in / preemption resume (reference :106)
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
    )
    sampler = ShardedSampler(len(train_ds), local_batch, seed=cfg.seed)
    # worker-pool + prefetch + retry-resample pipeline (pretrain loader
    # machinery; a corrupt image is resampled, decode overlaps device steps)
    train_loader = JepaLoader(
        train_ds, sampler, num_workers=cfg.num_workers, collate=collate
    )
    summary = {}
    total = 0
    for epoch in range(start_epoch, cfg.num_epochs):
        train_loader.set_epoch(epoch)
        meter = AverageMeter()
        for imgs, labels in train_loader:
            feats = encode(enc_params, put_batch(mesh, imgs))
            cls_params, opt, m = train_step(
                cls_params, opt, step, feats, put_batch(mesh, labels)
            )
            step = step + 1
            m = jax.device_get(m)
            meter.update(float(m["acc"]) * 100)
            csv_logger.log(epoch + 1, total, float(m["loss"]), float(m["acc"]) * 100)
            total += 1
            if max_steps is not None and total >= max_steps:
                break
        logger.info(f"[image-eval {epoch + 1}] top1(train) {meter.avg:.2f}%")
        summary["train_acc"] = meter.avg
        # every process calls save: Orbax syncs globally (a proc-0-only guard
        # deadlocks multi-host); replicated numpy is written once, by primary.
        # Skip epochs that advanced zero steps (train set < one batch) —
        # re-saving an existing step id raises StepAlreadyExistsError;
        # force=True overwrites ids left by a previous non-resumed run.
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
        if max_steps is not None and total >= max_steps:
            break
    ckpt.close()

    val_sampler = ShardedSampler(
        len(val_ds), local_batch, shuffle=False, drop_last=False
    )
    # exact accounting: decode failures are EXCLUDED from top-1 (no
    # silent resample-substitution on the val set)
    val_loader = JepaLoader(
        val_ds, val_sampler, num_workers=cfg.num_workers,
        collate=exact_val_collate(collate), retry_resample=False,
    )
    correct = count = 0
    # zip per-batch validity: the static-shape sampler wrap-pads duplicates
    # which must not count toward top-1 (the reference's ragged torch loader
    # scores each val sample exactly once)
    for (imgs, labels, ok), valid in zip(val_loader, val_sampler.batch_valid_masks()):
        valid = valid & ok  # decode failures excluded from the exact metric
        probs = predict(cls_params, encode(enc_params, put_batch(mesh, imgs)))
        labels_g = put_batch(mesh, labels)
        valid_g = put_batch(mesh, valid)
        correct += int(jax.device_get(count_correct(probs, labels_g, valid_g)))
        count += int(jax.device_get(count_valid(valid_g)))
    train_loader.close()
    val_loader.close()
    top1 = 100.0 * correct / max(count, 1)
    logger.info(f"[image-eval] val top-1: {top1:.2f}%")
    summary["val_top1"] = top1
    return summary


def main(args: dict, resume_preempt: bool = False):
    cfg = config_from_yaml(args)
    if resume_preempt:
        cfg = dataclasses.replace(cfg, resume_checkpoint=True)
    return run(cfg)
