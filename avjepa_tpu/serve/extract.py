"""Frozen-encoder batch feature extraction — the inference/serving app.

Config-driven, like every app (reference CLI shape: app/main.py --fname):

    python -m avjepa_tpu.app.main --fname configs/extract/vitl16_extract.yaml

A config names a pretraining checkpoint (``meta.read_checkpoint``, an Orbax
directory; convert a reference ``.pth.tar`` first with
tools/convert_reference_checkpoint.py) and a CSV of media files
(``data.datasets``); the app streams every clip through the frozen (by
default EMA/target) encoder and writes embeddings plus an index CSV.

TPU-first design:
  - ONE jitted bf16 encoder forward, batch-sharded over a pure-DP mesh of
    all local chips (the same layout the frozen evals use);
  - static shapes: the final partial batch is wrap-padded by the sampler and
    deduplicated on write, so a ragged tail never forces a recompile;
  - host ingest through the same JepaLoader as pretraining (process workers,
    bounded prefetch, retry-resample on decode failure) with a DETERMINISTIC
    transform (short-side resize + fixed crop + normalize, uniform clip
    window) so embeddings are reproducible run-to-run;
  - multi-host: each process contributes its local batch shard
    (jax.make_array_from_process_local_data) and writes its own output shard.

Outputs under ``extract.output`` (default <logging.folder>/<tag>-features):
  - pooling 'mean':   features_r{rank}.npz  {indices, embeddings [n, D]}
    when the shard fits in one ``extract.chunk_rows`` chunk; larger runs
    spill features_r{rank}_{k}.npz chunks (bounded host memory)
  - pooling 'tokens': tokens_r{rank}_{k}.npz chunks {indices, embeddings
    [n, N, D]} (``extract.chunk_rows`` rows per chunk)
  - index_r{rank}.csv: global row -> media path, label
  - missing_r{rank}.csv: owned rows that produced NO embedding (permanently
    undecodable files — retry-resample substitutes a different clip, which
    dedup discards), plus a logged warning and summary rows_missing count
  - summary_r{rank}.json: row counts (written/missing/total), dim, clips/sec

The reference has no analog (no inference entry point at all); the closest
reference machinery reused here is the frozen-eval encoder loading
(evals/video_classification_frozen/eval.py:419-444 — shape-tolerant merge)
and its eval transform (utils.py:286-323 — short-side resize + crops).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from avjepa_tpu.config import ExperimentConfig, dump_config, load_config
from avjepa_tpu.data.loader import JepaLoader, ShardedSampler
from avjepa_tpu.data.synthetic import SyntheticAVDataset
from avjepa_tpu.data.transforms import EvalVideoTransform
from avjepa_tpu.models import init_encoder_params, make_encoder
from avjepa_tpu.models.factory import VIT_SPECS
from avjepa_tpu.parallel.mesh import (
    batch_sharding,
    eval_mesh,
    put_batch,
    replicated,
)
from avjepa_tpu.train.pretrain import DTYPES  # one dtype map (float16->bf16)
from avjepa_tpu.train.step import cast_dense_params, feature_layer_norm
from avjepa_tpu.utils.logging import get_logger


class DeterministicClipTransform:
    """Short-side resize + single fixed crop + normalize.

    Replaces the training VideoTransform's random crop/flip so extraction is
    reproducible (same file -> same embedding). Accepts the dataset's
    ``(clip, rng)`` calling convention and ignores the rng.
    """

    def __init__(self, crop_size: int):
        self._t = EvalVideoTransform(
            num_views=1, short_side=crop_size, crop_size=crop_size
        )

    def __call__(self, clip: np.ndarray, rng=None) -> np.ndarray:
        return np.asarray(self._t(clip)[0], np.float32)


class _IndexedView:
    """Dataset wrapper: caps length and returns the dataset INDEX in the
    label slot, so the loader's label batch maps rows back to files even
    through retry-resample (a failed decode resamples a different index and
    reports THAT index)."""

    def __init__(self, ds, limit=None):
        self.ds = ds
        self.n = len(ds) if limit is None else min(int(limit), len(ds))

    def __len__(self):
        return self.n

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)

    def __getitem__(self, idx: int):
        video, mel, _label = self.ds[idx]
        return video, mel, int(idx)


def _build_dataset(cfg: ExperimentConfig, layout):
    if cfg.data.source == "synthetic" or not cfg.data.datasets:
        ds = SyntheticAVDataset(
            layout, length=max(64, cfg.data.batch_size * 4)
        )
        paths = [f"synthetic://{i}" for i in range(len(ds))]
        labels = np.zeros(len(ds), np.int64)
        return ds, paths, labels
    from avjepa_tpu.data.av_dataset import AVFileDataset

    ds = AVFileDataset(
        csv_paths=list(cfg.data.datasets),
        layout=layout,
        frames_per_clip=cfg.data.num_frames,
        frame_step=cfg.data.sampling_rate,
        num_clips=1,
        random_clip_sampling=False,  # deterministic uniform clip window
        filter_short_videos=cfg.data.filter_short_videos,
        filter_long_videos=cfg.data.filter_long_videos,
        duration=cfg.data.clip_duration,
        crop_size=cfg.data.crop_size,
        transform=DeterministicClipTransform(cfg.data.crop_size),
        seed=cfg.meta.seed,
    )
    return ds, list(ds.paths), np.asarray(ds.labels)


def main(args: dict, resume_preempt: bool = False) -> dict:
    cfg = args if isinstance(args, ExperimentConfig) else load_config(args)
    ex = cfg.extract
    rank = jax.process_index()
    logger = get_logger(rank=rank)
    layout = cfg.layout()
    dtype = DTYPES[cfg.meta.dtype]
    if cfg.meta.dtype == "float16":
        logger.warning(
            "meta.dtype float16 runs as bfloat16 on TPU — embeddings are "
            "bf16-precision (same mapping and warning as pretrain)"
        )

    os.makedirs(cfg.logging.folder, exist_ok=True)
    dump_config(cfg, os.path.join(cfg.logging.folder, "params-extract.yaml"))

    encoder = make_encoder(
        cfg.model.model_name,
        layout,
        uniform_power=cfg.model.uniform_power,
        dtype=dtype,
        attn_impl=cfg.tpu.attn_impl,
        gelu=cfg.tpu.gelu,
    )
    enc_params = init_encoder_params(encoder, jax.random.key(cfg.meta.seed))

    if cfg.meta.read_checkpoint:
        from avjepa_tpu.evals.video_classification import (
            load_target_encoder_params,
        )

        prefer = "target_params" if ex.use_target_encoder else "enc_params"
        loaded = load_target_encoder_params(
            cfg.meta.read_checkpoint,
            enc_params,
            strict=not ex.allow_random,
            prefer=prefer,
        )
        if loaded is not None:
            enc_params = loaded
            logger.info(
                f"extract: loaded {prefer} from {cfg.meta.read_checkpoint}"
            )
        else:
            logger.warning("extract: checkpoint empty; RANDOM encoder")
    elif not ex.allow_random:
        raise ValueError(
            "app: extract needs meta.read_checkpoint (or set "
            "extract.allow_random: true to embed with a random encoder)"
        )

    mesh = eval_mesh()
    repl = replicated(mesh)
    batch_sh = batch_sharding(mesh)
    enc_params = jax.device_put(enc_params, repl)

    spec = VIT_SPECS[cfg.model.model_name]
    dim = spec.embed_dim

    audio_sh = batch_sh if layout.audio_enabled else None

    # the row indices ride through the jit with the SAME batch sharding as
    # the pixels and come back replicated next to the embeddings — so
    # (index, embedding) pairs stay aligned under any multi-host shard
    # layout without assuming process-contiguous global batch rows
    @partial(
        jax.jit,
        in_shardings=(repl, batch_sh, audio_sh, batch_sh),
        out_shardings=repl,
    )
    def encode(params, video, audio, idx):
        params = cast_dense_params(params, encoder.dtype)
        h = encoder.apply({"params": params}, video, audio)
        h = h.astype(jnp.float32)
        if ex.layer_norm:
            h = feature_layer_norm(h)
        if ex.pooling == "mean":
            h = jnp.mean(h, axis=1)
        return h, idx

    ds, paths, labels = _build_dataset(cfg, layout)
    view = _IndexedView(ds, ex.limit)
    n_total = len(view)

    global_batch = cfg.data.batch_size * jax.device_count()
    local_batch = global_batch // jax.process_count()
    sampler = ShardedSampler(
        dataset_len=n_total,
        batch_size=local_batch,
        shuffle=False,
        seed=cfg.meta.seed,
        drop_last=False,
    )
    loader = JepaLoader(
        view,
        sampler,
        mask_collator=None,
        num_workers=cfg.data.num_workers,
        use_processes=cfg.data.source != "synthetic"
        and cfg.data.num_workers > 1,
    )

    out_dir = ex.output or os.path.join(
        cfg.logging.folder, f"{cfg.logging.write_tag}-features"
    )
    os.makedirs(out_dir, exist_ok=True)

    written = np.zeros(n_total, bool)
    pending: list[tuple[int, np.ndarray]] = []
    emitted_files: list[str] = []
    chunk_id = 0
    is_mean = ex.pooling == "mean"
    prefix = "features" if is_mean else "tokens"

    def flush(force: bool = False):
        """Bounded-memory writer for BOTH pooling modes: at most
        ``extract.chunk_rows`` rows are ever held in host memory. A mean-mode
        run whose owned rows fit in ONE chunk keeps the documented
        single-file ``features_r{rank}.npz`` format (sorted by row); larger
        runs spill ``features_r{rank}_{k}.npz`` chunks like tokens mode —
        accumulating a whole multi-million-clip extract in RAM before one
        final write would OOM the host and lose the run."""
        nonlocal pending, chunk_id
        # mean holds until STRICTLY over a chunk so an exactly-chunk-sized
        # run still gets the compat single-file name at force time
        trigger = ex.chunk_rows + 1 if is_mean else ex.chunk_rows
        while (pending and force) or len(pending) >= trigger:
            if is_mean and force and chunk_id == 0 and len(pending) <= ex.chunk_rows:
                part, pending = sorted(pending, key=lambda t: t[0]), []
                name = f"features_r{rank}.npz"
            else:
                part, pending = pending[: ex.chunk_rows], pending[ex.chunk_rows:]
                name = f"{prefix}_r{rank}_{chunk_id:05d}.npz"
                chunk_id += 1
            np.savez(
                os.path.join(out_dir, name),
                indices=np.asarray([i for i, _ in part], np.int64),
                embeddings=np.stack([e for _, e in part]),
            )
            emitted_files.append(name)

    t0 = time.time()
    n_clips = 0
    for video, audio, idx_batch, _masks in loader:
        video = np.asarray(video, dtype)
        audio_np = np.asarray(audio, dtype) if audio is not None else None
        idx_np = np.asarray(idx_batch, np.int32)
        if jax.process_count() > 1:
            video = put_batch(mesh, video, batch_sh)
            if audio_np is not None:
                audio_np = put_batch(mesh, audio_np, batch_sh)
            idx_dev = put_batch(mesh, idx_np, batch_sh)
        else:
            idx_dev = jnp.asarray(idx_np)
        out, idx_out = encode(enc_params, video, audio_np, idx_dev)
        out, idx_out = np.asarray(out), np.asarray(idx_out)
        # the replicated outputs carry the GLOBAL batch; each host persists
        # only rows it OWNS. Ownership must be derived from the row id, not
        # from "rows in my shard": the sampler wrap-pads the arange order to
        # a shard multiple, so with n_total % num_shards != 0 a pad copy of
        # row r lands in a DIFFERENT host's shard than r's original and both
        # hosts would write it. The sampler deals position i of the padded
        # order to shard i % num_shards and extract is always shuffle=False
        # (order[i] == i for i < n_total), so row r's original belongs to
        # shard r % num_shards.
        shards, my_shard = sampler.num_shards, sampler.shard_index
        for row, emb in zip(idx_out, out):
            row = int(row)
            if row % shards != my_shard or row >= n_total or written[row]:
                continue  # other host's row or wrap-padded duplicate
            written[row] = True
            pending.append((row, emb))
        n_clips += len(idx_batch)
        flush()

    flush(force=True)
    if is_mean and chunk_id == 0 and not os.path.exists(
        os.path.join(out_dir, f"features_r{rank}.npz")
    ):
        # zero owned rows: still write the (empty) single file so consumers
        # that load features_r{rank}.npz per rank keep working
        np.savez(
            os.path.join(out_dir, f"features_r{rank}.npz"),
            indices=np.zeros(0, np.int64),
            embeddings=np.zeros((0, dim), np.float32),
        )
        emitted_files.append(f"features_r{rank}.npz")
    dt = time.time() - t0
    done_rows = np.nonzero(written)[0]
    with open(os.path.join(out_dir, f"index_r{rank}.csv"), "w") as f:
        f.write("row,path,label\n")
        for r in done_rows:
            f.write(f"{int(r)},{paths[int(r)]},{int(labels[int(r)])}\n")

    # owned rows that never arrived: the loader's retry-resample swallows a
    # failed decode by substituting a DIFFERENT index (right for training,
    # lossy for extraction) — name every dropped row so incomplete coverage
    # is loud and diagnosable, not a buried rows_written < rows_total
    owned = np.arange(sampler.shard_index, n_total, sampler.num_shards)
    missing = owned[~written[owned]]
    if missing.size:
        with open(os.path.join(out_dir, f"missing_r{rank}.csv"), "w") as f:
            f.write("row,path\n")
            for r in missing:
                f.write(f"{int(r)},{paths[int(r)]}\n")
        shown = ", ".join(paths[int(r)] for r in missing[:5])
        logger.warning(
            f"extract: {missing.size} owned row(s) produced no embedding "
            f"(decode failures; resampled substitutes are deduplicated) — "
            f"see missing_r{rank}.csv. First: {shown}"
        )

    summary = {
        "rows_written": int(written.sum()),
        "rows_missing": int(missing.size),
        "rows_total": n_total,
        "dim": dim,
        "tokens": layout.num_tokens if ex.pooling == "tokens" else 1,
        "pooling": ex.pooling,
        "clips_per_sec": round(n_clips / max(dt, 1e-9), 3),
        "output": out_dir,
        # mean mode switches from the single features_r{rank}.npz to chunked
        # features_r{rank}_{k}.npz exactly when this rank owns more than
        # chunk_rows rows — record the layout so consumers detect it
        # programmatically instead of globbing
        "chunked": chunk_id > 0,
        "files": emitted_files,
    }
    with open(os.path.join(out_dir, f"summary_r{rank}.json"), "w") as f:
        json.dump(summary, f)
    logger.info(f"extract: {summary}")
    loader.close()
    return summary
