"""End-to-end train-step tests on a tiny config over the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avjepa_tpu.config import load_config
from avjepa_tpu.train import pretrain
from avjepa_tpu.train.step import stack_masksets

TINY_CFG = {
    "app": "avjepa",
    "data": {
        "dataset_type": "audiovideodataset",
        "batch_size": 8,
        "num_frames": 4,
        "tubelet_size": 2,
        "crop_size": 32,
        "patch_size": 16,
        "num_workers": 2,
        "source": "synthetic",
    },
    "loss": {"loss_exp": 1.0, "reg_coeff": 0.1},
    "mask": [
        {"aspect_ratio": [0.75, 1.5], "num_blocks": 2, "spatial_scale": [0.15, 0.15],
         "temporal_scale": [1.0, 1.0], "max_temporal_keep": 1.0},
        {"aspect_ratio": [0.75, 1.5], "num_blocks": 1, "spatial_scale": [0.7, 0.7],
         "temporal_scale": [1.0, 1.0], "max_temporal_keep": 1.0},
    ],
    "meta": {"seed": 7, "dtype": "float32"},
    "model": {"model_name": "vit_tiny", "pred_depth": 2, "pred_embed_dim": 48,
              "uniform_power": True, "use_mask_tokens": True,
              "zero_init_mask_tokens": True},
    "optimization": {"ipe": 4, "epochs": 2, "warmup": 1, "clip_grad": 10.0,
                     "lr": 1e-3, "start_lr": 2e-4, "final_lr": 1e-6},
    "logging": {"folder": None, "write_tag": "test"},
}


def make_cfg(tmp_path, **over):
    import copy

    d = copy.deepcopy(TINY_CFG)
    d["logging"]["folder"] = str(tmp_path)
    for k, v in over.items():
        sect, key = k.split(".")
        d[sect][key] = v
    return load_config(d)


def test_single_step_runs(tmp_path):
    cfg = make_cfg(tmp_path)
    handles = pretrain.setup(cfg)
    it = iter(handles.loader)
    video, audio, _, masks = next(it)
    state, metrics = handles.step(handles.state, video, audio, masks)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["loss"])
    assert metrics["loss"] > 0
    assert int(jax.device_get(state.step)) == 1
    # loss should decrease over a few steps on the same batch
    losses = [float(metrics["loss"])]
    for _ in range(5):
        state, metrics = handles.step(state, video, audio, masks)
        losses.append(float(jax.device_get(metrics)["loss"]))
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_run_two_epochs_and_resume(tmp_path):
    cfg = make_cfg(tmp_path)
    summary = pretrain.run(cfg)
    assert summary["epoch"] == 2
    assert np.isfinite(summary["avg_loss"])
    # resume from checkpoint: runs remaining epochs (none) without error
    cfg2 = make_cfg(tmp_path)
    cfg2.meta.load_checkpoint = True
    summary2 = pretrain.run(cfg2)
    assert summary2 == {} or np.isfinite(summary2.get("avg_loss", 0.0))


def test_video_only_vjepa(tmp_path):
    # scale 0.15 on the tiny 2x2 spatial grid rounds the block to zero area ->
    # empty video targets; use scales that keep targets nonempty
    cfg = make_cfg(tmp_path, **{"data.dataset_type": "videodataset"})
    cfg.raw["mask"] = [
        {"aspect_ratio": [0.75, 1.5], "num_blocks": 1, "spatial_scale": [0.7, 0.7],
         "temporal_scale": [1.0, 1.0]},
        {"aspect_ratio": [0.75, 1.5], "num_blocks": 2, "spatial_scale": [0.5, 0.5],
         "temporal_scale": [1.0, 1.0]},
    ]
    cfg2 = load_config({**cfg.raw, "app": "vjepa"})
    cfg2.logging.folder = str(tmp_path / "v")
    handles = pretrain.setup(cfg2)
    it = iter(handles.loader)
    video, audio, _, masks = next(it)
    assert audio is None
    state, metrics = handles.step(handles.state, video, None, masks)
    assert np.isfinite(float(jax.device_get(metrics)["loss"]))


def test_mesh_sharding_multichip(tmp_path):
    """Full DP+FSDP+TP step over the 8-device virtual mesh."""
    from avjepa_tpu.parallel.mesh import make_mesh

    cfg = make_cfg(tmp_path, **{"data.batch_size": 2})  # per-chip -> loader 8
    cfg.tpu.mesh_data = 2
    cfg.tpu.mesh_fsdp = 2
    cfg.tpu.mesh_tensor = 2
    mesh = make_mesh(2, 2, 2)
    handles = pretrain.setup(cfg, mesh=mesh)
    it = iter(handles.loader)
    video, audio, _, masks = next(it)
    state, metrics = handles.step(handles.state, video, audio, masks)
    assert np.isfinite(float(jax.device_get(metrics)["loss"]))


def test_multichip_compile_no_involuntary_remat(tmp_path, capfd):
    """The AV step on the full 2x2x2 mesh must compile without an SPMD
    'Involuntary full rematerialization' (regression: fsdp-sharding the
    residual/contracting D dim of tensor-parallel kernels propagated a
    D-sharded layout into the activation stream, and the partitioner could
    only reconcile it by replicating a [B*M, Ku, D] predictor tensor —
    MULTICHIP_r03.json tail)."""
    from avjepa_tpu.parallel.mesh import make_mesh
    from avjepa_tpu.train.step import stack_masksets

    # distinctive geometry (crop 48) so no other test's in-process jit cache
    # entry can satisfy this compile; persistent cache disabled so the SPMD
    # partitioner genuinely runs and its warnings (fd 2) are observable
    cfg = make_cfg(tmp_path, **{"data.batch_size": 2, "data.crop_size": 48})
    cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor = 2, 2, 2
    mesh = make_mesh(2, 2, 2)
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        handles = pretrain.setup(cfg, mesh=mesh)
        video, audio, _, masks = next(iter(handles.loader))
        enc_m, pred_m, idx, union = stack_masksets(masks, with_idx=True)
        if not handles.compact:
            idx = None
        if not handles.compact_pred:
            union = None
        args = (
            handles.state,
            jnp.asarray(video, jnp.float32),
            jnp.asarray(audio, jnp.float32),
            jnp.asarray(enc_m),
            jnp.asarray(pred_m),
            None if idx is None else tuple(jnp.asarray(i) for i in idx),
            None if union is None else jnp.asarray(union),
        )
        capfd.readouterr()  # drain anything emitted during setup
        handles.step_fn.lower(*args).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]


def test_data8_compile_and_step(tmp_path, capfd):
    """Pure-DP deployment shape: the AV step over a data=8 mesh (all 8
    virtual devices on the data axis) compiles with a clean SPMD log and
    executes. Complements the 2x2x2 test above — data=8 is the shape the
    north-star throughput claim scales on (tools/multichip_data8.py measures
    its collective bytes at ViT-L geometry)."""
    from avjepa_tpu.parallel.mesh import make_mesh
    from avjepa_tpu.train.step import stack_masksets

    # distinctive geometry (crop 80) so no other test's jit-cache entry can
    # satisfy this compile; cache off so the partitioner genuinely runs
    cfg = make_cfg(tmp_path, **{"data.batch_size": 1, "data.crop_size": 80})
    cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor = 8, 1, 1
    mesh = make_mesh(8, 1, 1)
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        handles = pretrain.setup(cfg, mesh=mesh)
        video, audio, _, masks = next(iter(handles.loader))
        capfd.readouterr()
        state, metrics = handles.step(handles.state, video, audio, masks)
        loss = float(jax.device_get(metrics)["loss"])
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]
    assert np.isfinite(loss)
    # one loader batch feeds all 8 data shards
    assert video.shape[0] == 8


def test_compact_matches_dense(tmp_path):
    """Compacted context encoding AND compacted predictor must each produce
    the same loss as the fully-dense path."""
    cfg_d = make_cfg(tmp_path)
    cfg_d.tpu.compact_context = False
    cfg_d.tpu.compact_predictor = False
    h_dense = pretrain.setup(cfg_d)
    video, audio, _, masks = next(iter(h_dense.loader))
    _, m_dense = h_dense.step(h_dense.state, video, audio, masks)
    loss_dense = float(jax.device_get(m_dense["loss"]))

    cfg_c = make_cfg(tmp_path / "c")
    cfg_c.tpu.compact_context = True
    cfg_c.tpu.compact_predictor = False
    h_comp = pretrain.setup(cfg_c)
    _, m_comp = h_comp.step(h_comp.state, video, audio, masks)

    cfg_p = make_cfg(tmp_path / "p")
    cfg_p.tpu.compact_context = True
    cfg_p.tpu.compact_predictor = True
    h_pred = pretrain.setup(cfg_p)
    _, m_pred = h_pred.step(h_pred.state, video, audio, masks)

    np.testing.assert_allclose(
        loss_dense, float(jax.device_get(m_comp["loss"])), rtol=1e-5
    )
    np.testing.assert_allclose(
        loss_dense, float(jax.device_get(m_pred["loss"])), rtol=1e-5
    )


def test_diffusion_predictor_step(tmp_path):
    """use_mask_tokens: false exercises the diffusion-fallback predictor."""
    cfg = make_cfg(tmp_path, **{"model.use_mask_tokens": False})
    handles = pretrain.setup(cfg)
    video, audio, _, masks = next(iter(handles.loader))
    state, metrics = handles.step(handles.state, video, audio, masks)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_sharded_checkpoint_save_restore(tmp_path):
    """Orbax save/restore of the FSDP+TP-sharded state over the 8-device mesh
    (the multi-host-correct path: no process-0 device_get of sharded arrays)."""
    from avjepa_tpu.parallel.mesh import make_mesh, state_shardings
    from avjepa_tpu.utils.checkpoint import CheckpointManager

    cfg = make_cfg(tmp_path, **{"data.batch_size": 2})  # per-chip -> loader 8
    cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor = 2, 2, 2
    mesh = make_mesh(2, 2, 2)
    handles = pretrain.setup(cfg, mesh=mesh)
    video, audio, _, masks = next(iter(handles.loader))
    state, _ = handles.step(handles.state, video, audio, masks)

    ckpt = CheckpointManager(str(tmp_path / "shckpt"))
    ckpt.save(int(jax.device_get(state.step)), state)  # sharded, device-resident
    ckpt.close()

    # restore into a freshly-initialized (differently-valued) sharded state
    handles2 = pretrain.setup(cfg, mesh=mesh)
    ckpt2 = CheckpointManager(str(tmp_path / "shckpt"))
    restored = ckpt2.restore(handles2.state)
    ckpt2.close()
    assert int(jax.device_get(restored.step)) == 1

    want = jax.device_get(state.enc_params)
    got = jax.device_get(restored.enc_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        want, got,
    )
    # restored arrays carry the mesh shardings (ready to train on)
    leaf = jax.tree_util.tree_leaves(restored.enc_params)[0]
    assert leaf.sharding.mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2}

    # and training continues from the restored state
    state3, metrics = handles2.step(restored, video, audio, masks)
    assert np.isfinite(float(jax.device_get(metrics)["loss"]))
    assert int(jax.device_get(state3.step)) == 2


def test_batch_size_is_per_chip(tmp_path):
    """data.batch_size matches the reference's per-GPU meaning: the loader
    batch scales by the mesh's batch axes (data x fsdp)."""
    from avjepa_tpu.parallel.mesh import make_mesh

    cfg = make_cfg(tmp_path, **{"data.batch_size": 2})
    cfg.tpu.mesh_data, cfg.tpu.mesh_fsdp, cfg.tpu.mesh_tensor = 2, 2, 2
    mesh = make_mesh(2, 2, 2)
    handles = pretrain.setup(cfg, mesh=mesh)
    video, audio, _, masks = next(iter(handles.loader))
    assert video.shape[0] == 2 * 4  # 2/chip x (data=2 * fsdp=2)
    state, metrics = handles.step(handles.state, video, audio, masks)
    assert np.isfinite(float(jax.device_get(metrics)["loss"]))


def test_flash_step_matches_xla(tmp_path):
    """One full train step with the Pallas flash path (packed qkv kernels,
    interpret mode on CPU) produces the same loss/grads as the XLA path."""
    cfg_x = make_cfg(tmp_path, **{"data.batch_size": 1})
    cfg_f = make_cfg(tmp_path, **{"data.batch_size": 1})
    cfg_f.tpu.attn_impl = "flash"
    # vit_small: head_dim 64 -> packed path; vit_tiny's 3 heads fall back
    for c in (cfg_x, cfg_f):
        c.model.model_name = "vit_small"

    hx = pretrain.setup(cfg_x)
    hf = pretrain.setup(cfg_f)
    video, audio, _, masks = next(iter(hx.loader))
    _, mx = hx.step(hx.state, video, audio, masks)
    _, mf = hf.step(hf.state, video, audio, masks)
    lx = float(jax.device_get(mx["loss"]))
    lf = float(jax.device_get(mf["loss"]))
    assert abs(lx - lf) < 1e-4, (lx, lf)
    gx = float(jax.device_get(mx["enc_grad_norm"]))
    gf = float(jax.device_get(mf["enc_grad_norm"]))
    assert abs(gx - gf) / max(gx, 1e-9) < 1e-2, (gx, gf)


def test_cast_hoist_forward_bit_identical(tmp_path, monkeypatch):
    """The block-stack Dense pre-cast (train/step.py::cast_dense_params) is
    bit-identical on the FORWARD path to flax's internal per-layer
    promote_dtype casts on a bf16 model — it only moves WHERE the f32->bf16
    cast happens. Gradients may differ by bf16 rounding: with the hoist the
    dW stack is materialized in bf16 (matching torch-AMP, whose dot backward
    also rounds dW through bf16) where XLA previously fused the f32 convert
    into the per-layer dW dot."""
    import avjepa_tpu.train.step as step_mod

    cfg = make_cfg(tmp_path, **{"meta.dtype": "bfloat16", "data.batch_size": 2})
    h1 = pretrain.setup(cfg)
    video, audio, _, masks = next(iter(h1.loader))
    s1, m1 = h1.step(h1.state, video, audio, masks)

    monkeypatch.setattr(step_mod, "cast_dense_params", lambda tree, dtype: tree)
    h2 = pretrain.setup(cfg)
    s2, m2 = h2.step(h2.state, video, audio, masks)

    # identical forward: loss is a pure function of the (identically cast)
    # params and inputs
    assert float(jax.device_get(m1["loss"])) == float(jax.device_get(m2["loss"]))
    # params after one AdamW step agree to bf16-rounding of the gradients
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.enc_params)),
        jax.tree_util.tree_leaves(jax.device_get(s2.enc_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-4
        )
