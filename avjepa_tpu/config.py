"""Typed, validated experiment configuration.

Consumes the same YAML schema as the reference
(reference: configs/pretrain/av-vitt16.yaml; parsed ad hoc into ~40 locals at
app/avjepa/train.py:68-159) but into dataclasses with defaults and validation.
Extra TPU-only knobs live under the ``tpu:`` section (mesh shape, remat,
attention impl) and default sensibly when absent, so reference configs load
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import yaml

from avjepa_tpu.layout import TokenLayout


@dataclasses.dataclass
class DataConfig:
    dataset_type: str = "audiovideodataset"
    datasets: Sequence[str] = ()
    batch_size: int = 24
    num_clips: int = 1
    num_frames: int = 16
    tubelet_size: int = 2
    sampling_rate: int = 4
    crop_size: int = 224
    patch_size: int = 16
    num_workers: int = 4
    # INERT (accepted for reference-config compatibility, see COVERAGE.md):
    # pin_mem is torch DataLoader pinned host staging — JAX owns its own
    # host->device transfer path; decode_one_clip is dead in the reference
    # itself (data_manager.py:40 accepts it and forwards it to no dataset).
    # load_config logs a notice when either is set to a non-default value.
    pin_mem: bool = True
    decode_one_clip: bool = True
    filter_short_videos: bool = False
    filter_long_videos: int = int(1e9)  # bytes (reference filters by file size)
    clip_duration: Optional[float] = None
    datasets_weights: Optional[Sequence[float]] = None
    # fast-forward the data stream by N batches at startup
    # (reference: app/avjepa/train.py:356-366)
    skip_batches: int = 0
    # the reference reads mask_type from the data section
    # (app/avjepa/train.py:108); takes precedence over tpu.mask_type
    mask_type: Optional[str] = None
    # TPU build extension: held-out CSVs for reconstruction/classification
    # evals. When unset, file-backed evals fall back to `datasets` (the
    # training split) and say so loudly.
    val_datasets: Optional[Sequence[str]] = None
    # start the /proc resource sampler (reference carries the knob but its
    # monitor is dormant; ours works — utils/monitoring.py)
    log_resource_utilization: bool = False
    # TPU build extension: 'synthetic' generates deterministic fake AV clips
    # (for tests/benches without media files).
    source: str = "files"


@dataclasses.dataclass
class DataAugConfig:
    auto_augment: bool = False
    motion_shift: bool = False
    random_resize_aspect_ratio: Sequence[float] = (0.75, 1.35)
    random_resize_scale: Sequence[float] = (0.3, 1.0)
    reprob: float = 0.0
    horizontal_flip: bool = True


@dataclasses.dataclass
class LossConfig:
    loss_exp: float = 1.0
    reg_coeff: float = 0.0


@dataclasses.dataclass
class MetaConfig:
    seed: int = 234
    dtype: str = "bfloat16"
    load_checkpoint: bool = False
    read_checkpoint: Optional[str] = None
    # INERT: eval_freq appears in every reference pretrain YAML but no
    # reference code path reads it (vestigial from I-JEPA); kept so reference
    # configs load unchanged. See COVERAGE.md.
    eval_freq: int = 100
    use_sdpa: bool = True  # accepted for config parity; attention impl is tpu.attn_impl


@dataclasses.dataclass
class ModelConfig:
    model_name: str = "vit_base"
    pred_depth: int = 6
    pred_embed_dim: int = 384
    uniform_power: bool = False
    use_mask_tokens: bool = True
    zero_init_mask_tokens: bool = True


@dataclasses.dataclass
class OptimizationConfig:
    ipe: int = 300
    ipe_scale: float = 1.25
    clip_grad: Optional[float] = 10.0
    weight_decay: float = 0.04
    final_weight_decay: float = 0.4
    epochs: int = 300
    warmup: float = 40
    start_lr: float = 2e-4
    lr: float = 6.25e-4
    final_lr: float = 1e-6
    ema: Sequence[float] = (0.998, 1.0)
    # AdamW moments/epsilon (reference: app/avjepa/train.py cfgs_opt)
    betas: Sequence[float] = (0.9, 0.999)
    eps: float = 1e-8


@dataclasses.dataclass
class LoggingConfig:
    folder: str = "./logs"
    write_tag: str = "jepa"
    checkpoint_freq: int = 1
    save_every_freq: int = -1
    log_freq: int = 10


@dataclasses.dataclass
class TpuConfig:
    """TPU-native extensions (absent from reference configs; defaulted)."""

    mesh_data: int = -1  # -1: all remaining devices
    mesh_fsdp: int = 1
    mesh_tensor: int = 1
    remat: bool = False
    attn_impl: str = "xla"  # 'xla' | 'flash'
    mask_type: str = "multiblock3d"
    # compacted context encoding: run the context encoder only on kept tokens
    # (bucketed to 128); identical numerics, large speedup. Disable to force
    # the fully-dense single-compilation path.
    compact_context: bool = True
    # compacted predictor: run the predictor blocks only on enc∪pred tokens
    # (bucketed to 128, ~23% fewer at the north-star masks -> ~41% fewer
    # attention FLOPs); identical numerics (excluded tokens were key-masked
    # out of attention anyway).
    compact_predictor: bool = True
    # GELU flavor: 'tanh' (TPU-fast approximation, the ViT/PaLM standard) or
    # 'exact' (erf, bit-matches torch nn.GELU default — XLA expands erf into a
    # long branchy f32 polynomial, measured ~100 ms/step on the ViT-L step)
    gelu: str = "tanh"
    # sticky mask buckets: the collator's compact-token bucket sizes only
    # ratchet upward (running max) instead of tracking each draw, so the
    # fused step specializes a handful of times instead of once per distinct
    # (K, Ku) pair. Identical numerics (padded tokens are key-masked out);
    # steady-state throughput is ~15% lower from the extra padded compute
    # (BENCH.md round 4: 25.4 vs 29.8 clips/s), so this is OFF by default and
    # worth turning on only for short compile-dominated runs (e.g. the
    # end-to-end chain on a cold compile cache).
    sticky_mask_buckets: bool = False
    # hot-loop metrics cadence: True runs the diagnostic reductions (per-layer
    # grad norms, optimizer-moment means, input variance) only on log_freq
    # steps; False computes them every step like the reference
    # (app/avjepa/train.py:526-531,560-563). Loss/LR/grad-norm metrics are
    # identical either way.
    light_metrics: bool = True


@dataclasses.dataclass
class ExtractConfig:
    """Frozen-encoder feature-extraction app (``app: extract``) — a TPU-build
    extension; the reference ships NO inference entry point (using a
    pretrained checkpoint downstream means hand-writing a torch script
    against its model classes)."""

    output: Optional[str] = None  # default: <logging.folder>/<write_tag>-features
    pooling: str = "mean"  # 'mean' -> one [D] vector per clip; 'tokens' -> [N, D]
    use_target_encoder: bool = True  # read target_params (EMA) vs enc_params
    layer_norm: bool = True  # feature-dim LN, matching the target path
    limit: Optional[int] = None  # cap extracted rows (debug/CI)
    allow_random: bool = False  # permit running without a checkpoint
    chunk_rows: int = 2048  # rows per output chunk (both pooling modes)


@dataclasses.dataclass
class ExperimentConfig:
    app: str = "avjepa"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    data_aug: DataAugConfig = dataclasses.field(default_factory=DataAugConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    meta: MetaConfig = dataclasses.field(default_factory=MetaConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optimization: OptimizationConfig = dataclasses.field(default_factory=OptimizationConfig)
    logging: LoggingConfig = dataclasses.field(default_factory=LoggingConfig)
    tpu: TpuConfig = dataclasses.field(default_factory=TpuConfig)
    extract: ExtractConfig = dataclasses.field(default_factory=ExtractConfig)
    mask: Sequence[dict] = dataclasses.field(default_factory=list)
    raw: dict = dataclasses.field(default_factory=dict, repr=False)

    # ---- derived ----
    def layout(self, audio: Optional[bool] = None) -> TokenLayout:
        if audio is None:
            audio = self.data.dataset_type.lower() in (
                "audiovideodataset",
                "avdataset",
            )
        return TokenLayout(
            num_frames=self.data.num_frames,
            crop_size=self.data.crop_size,
            patch_size=self.data.patch_size,
            tubelet_size=self.data.tubelet_size,
            audio_enabled=audio,
        )

    def validate(self) -> None:
        lo = self.layout()
        assert lo.crop_size % lo.patch_size == 0, "crop_size % patch_size != 0"
        assert lo.num_frames % lo.tubelet_size == 0, "num_frames % tubelet != 0"
        from avjepa_tpu.models.factory import VIT_SPECS

        assert self.model.model_name in VIT_SPECS, (
            f"unknown model {self.model.model_name}; options: {list(VIT_SPECS)}"
        )
        heads = VIT_SPECS[self.model.model_name].num_heads
        assert self.model.pred_embed_dim % heads == 0, (
            f"pred_embed_dim {self.model.pred_embed_dim} not divisible by "
            f"{self.model.model_name}'s {heads} heads (the predictor reuses "
            f"the backbone head count; reference: predictor num_heads)"
        )
        assert self.meta.dtype in ("float32", "bfloat16", "float16")
        assert len(self.optimization.ema) == 2
        if self.app in ("avjepa", "vjepa"):
            assert len(self.mask) >= 1, "pretraining requires >=1 mask config"
        if self.app == "extract":
            assert self.extract.pooling in ("mean", "tokens"), (
                f"extract.pooling must be 'mean' or 'tokens', "
                f"got {self.extract.pooling!r}"
            )
            assert self.data.num_clips == 1, (
                "extract supports num_clips == 1 (one embedding per clip); "
                "run multiple passes with different sampling for segments"
            )


def _build(cls, d: dict):
    if d is None:
        d = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k in fields:
            kwargs[k] = v
    return cls(**kwargs)


def load_config(source: str | dict) -> ExperimentConfig:
    """Load from a YAML path, YAML string, or dict (reference key schema)."""
    if isinstance(source, dict):
        d = source
    else:
        try:
            with open(source) as f:
                d = yaml.safe_load(f)
        except (OSError, ValueError):
            d = yaml.safe_load(source)
    assert isinstance(d, dict), "config must be a mapping"

    opt = dict(d.get("optimization") or {})

    # section aliases: the reference reads these keys from meta:
    # (app/avjepa/train.py:75-84); our schema files them under data/logging
    meta_d = dict(d.get("meta") or {})
    data_d = dict(d.get("data") or {})
    logging_d = dict(d.get("logging") or {})
    if "skip_batches" in meta_d and "skip_batches" not in data_d:
        data_d["skip_batches"] = meta_d["skip_batches"]
    if "save_every_freq" in meta_d and "save_every_freq" not in logging_d:
        logging_d["save_every_freq"] = meta_d["save_every_freq"]

    cfg = ExperimentConfig(
        app=d.get("app", "avjepa"),
        data=_build(DataConfig, data_d),
        data_aug=_build(DataAugConfig, d.get("data_aug")),
        loss=_build(LossConfig, d.get("loss")),
        meta=_build(MetaConfig, d.get("meta")),
        model=_build(ModelConfig, d.get("model")),
        optimization=_build(OptimizationConfig, opt),
        logging=_build(LoggingConfig, logging_d),
        tpu=_build(TpuConfig, d.get("tpu")),
        extract=_build(ExtractConfig, d.get("extract")),
        mask=list(d.get("mask") or []),
        raw=d,
    )
    cfg.validate()

    # surface intentionally-inert keys loudly instead of silently accepting a
    # non-default value the run will never honor (rationale in COVERAGE.md:
    # all three are dead or torch-only in the reference itself)
    import logging as _logging

    _log = _logging.getLogger("avjepa_tpu")
    if not cfg.data.pin_mem:
        _log.info(
            "config: data.pin_mem is inert on TPU (torch pinned-memory knob)"
        )
    if not cfg.data.decode_one_clip:
        _log.info(
            "config: data.decode_one_clip is inert (dead in the reference "
            "data_manager too); exactly the sampled clips are decoded"
        )
    return cfg


def dump_config(cfg: ExperimentConfig, path: str) -> None:
    """Dump the effective config next to the logs (reference: app/main.py:51-53)."""
    with open(path, "w") as f:
        yaml.safe_dump(cfg.raw or dataclasses.asdict(cfg), f)
