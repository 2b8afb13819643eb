"""Device mesh and sharding rules.

TPU-native replacement for the reference's NCCL layer
(reference: src/utils/distributed.py:18-113 — init_process_group + 3 autograd
collectives). Here there is no hand-written collective code at all: we build a
`jax.sharding.Mesh` with axes

    ('data', 'fsdp', 'tensor')

annotate the batch and parameters with NamedShardings, and let XLA insert the
ICI all-reduces/all-gathers. The loss is a mean over the *global* batch, so
gradient averaging falls out of jit+sharding automatically (the reference fork
notably never all-reduced pretraining gradients — DataParallel-per-process,
see its app/avjepa/train.py:298-300; we implement true DP).

- 'data'  : batch dimension (pure DP)
- 'fsdp'  : parameter sharding (ZeRO-3 style, XLA all-gathers weights per-layer)
- 'tensor': intra-layer model parallelism (qkv/mlp features)
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host init (no-op on single host). Reference used SLURM env +
    NCCL rendezvous; jax.distributed discovers TPU topology natively.

    Also enables JAX's persistent compilation cache: mask churn re-specializes
    the step over K-bucket combinations, and without the disk cache every
    combination re-pays a full XLA compile on each NEW process (the first
    real-data chain run spent ~70% of its first epoch compiling). Opt out
    with AVJEPA_COMPILE_CACHE=0 or point it elsewhere via
    JAX_COMPILATION_CACHE_DIR."""
    from avjepa_tpu.utils import env_flag

    if env_flag("AVJEPA_MULTIHOST"):
        # must precede any backend initialization (default_backend below)
        jax.distributed.initialize()
    if env_flag("AVJEPA_COMPILE_CACHE", default=True):
        from avjepa_tpu.utils.cache_dir import (
            active_platform,
            compile_cache_dir,
            default_cache_root,
        )

        # source checkout → repo root; wheel install → XDG user cache
        # (never write into site-packages)
        root = default_cache_root()
        # positive backend detection: env vars alone miss the
        # defaulted-to-CPU case, which would share the ISA-unsafe .jax_cache
        plat = active_platform(
            os.environ.get("JAX_PLATFORM_NAME"),
            os.environ.get("JAX_PLATFORMS"),
            jax.default_backend,
        )
        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", compile_cache_dir(root, plat)
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (
        f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, axis_names=("data", "fsdp", "tensor"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data (and fsdp, which acts as extra DP for
    activations in ZeRO style)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# params below this element count are replicated rather than fsdp-sharded
# (a ViT-L qkv kernel is 3.1M elements; patch-embed kernels are ~0.4M for
# video, 49k for audio; biases/LN are tiny)
_FSDP_MIN_SIZE = 2**17


def _param_spec(path: tuple, x: Any, tensor_axis: bool, fsdp_axis: bool) -> P:
    """Sharding rule for one parameter.

    Tensor parallelism: qkv/fc1 kernels shard their output features, proj/fc2
    shard input features (Megatron layout -> one psum per block, over ICI).
    FSDP: remaining large axes shard over 'fsdp'.
    """
    names = [str(getattr(k, "key", k)) for k in path]
    name = "/".join(names)
    ndim = x.ndim
    spec: list = [None] * ndim

    td = None
    if tensor_axis and ndim >= 2:
        # depth-stacked kernels: [L, in, out]; plain kernels: [in, out]
        if any(s in name for s in ("qkv/kernel", "fc1/kernel", "q/kernel", "kv/kernel")):
            td = ndim - 1
        elif any(s in name for s in ("proj/kernel", "fc2/kernel")) and "patch_embed" not in name:
            td = ndim - 2
        if td is not None:
            spec[td] = "tensor"
    # FSDP: shard the largest remaining dim — but only for params that are
    # actually large. Sharding tiny tensors (patch-embed conv kernels, pos
    # embeds) saves nothing and makes XLA's sharding propagation reshard the
    # *input activations* to match (observed: the audio batch [B,128,192] was
    # involuntarily fully rematerialized to align with a 192-out-channel
    # fsdp-sharded patch-embed kernel).
    if fsdp_axis and ndim >= 2 and x.size >= _FSDP_MIN_SIZE and "patch_embed" not in name:
        if td is not None:
            # tensor-parallel kernels: stack fsdp ON the tensor dim. The
            # "largest free dim" here is the residual/contracting D axis, and
            # fsdp-sharding THAT propagates a D-sharded layout into the whole
            # activation stream — observed on the 2x2x2 mesh as an SPMD
            # involuntary full rematerialization of a [B*M, Ku, D] predictor
            # gather (the fused fsdp+tensor shard keeps activations' D
            # replicated; XLA all-gathers the kernel shard per layer instead,
            # plain ZeRO-3).
            spec[td] = ("tensor", "fsdp")
        else:
            free = [d for d in range(ndim) if spec[d] is None]
            if free:
                d = max(free, key=lambda i: x.shape[i])
                spec[d] = "fsdp"
    return P(*spec)


def _spec_axes_size(mesh: Mesh, ax) -> int:
    axes = ax if isinstance(ax, tuple) else (ax,)
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    return size


def param_shardings(
    mesh: Mesh, params: Any, tensor_parallel: bool = None, fsdp: bool = None
) -> Any:
    """NamedSharding pytree for a param (or param-shaped, e.g. opt moment) tree."""
    if tensor_parallel is None:
        tensor_parallel = mesh.shape["tensor"] > 1
    if fsdp is None:
        fsdp = mesh.shape["fsdp"] > 1

    def to_sharding(path, x):
        spec = _param_spec(path, x, tensor_parallel, fsdp)
        # drop axes that do not divide evenly (fall back to replication there)
        fixed = []
        for d, ax in enumerate(spec):
            if ax is None:
                fixed.append(None)
            elif x.shape[d] % _spec_axes_size(mesh, ax) == 0:
                fixed.append(ax)
            elif not isinstance(ax, tuple) or x.shape[d] % mesh.shape[ax[0]] != 0:
                fixed.append(None)
            else:
                # ('tensor','fsdp') dim too small for both: keep tensor only
                fixed.append(ax[0])
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def state_shardings(mesh: Mesh, state: Any) -> Any:
    """Shardings for a JepaState: params/opt trees sharded, scalars replicated."""

    def rule(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        if x.ndim == 0:
            return replicated(mesh)
        # strip the leading field name (enc_params / enc_opt / ...) for rules
        spec = _param_spec(
            tuple(names[1:]) or tuple(names),
            x,
            mesh.shape["tensor"] > 1,
            mesh.shape["fsdp"] > 1,
        )
        fixed = []
        for d, ax in enumerate(spec):
            if ax is not None and x.shape[d] % _spec_axes_size(mesh, ax) == 0:
                fixed.append(ax)
            elif (isinstance(ax, tuple)
                  and x.shape[d] % mesh.shape[ax[0]] == 0):
                fixed.append(ax[0])
            else:
                fixed.append(None)
        return NamedSharding(mesh, P(*fixed))

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(lambda p, x: rule(p, x), state)


def eval_mesh() -> Mesh:
    """Pure-DP mesh over every device — the eval parallelism layout
    (reference evals are DDP: evals/video_classification_frozen/eval.py:353-365)."""
    return make_mesh(jax.device_count(), 1, 1)


@jax.jit
def count_correct(probs: jax.Array, labels: jax.Array, valid=None) -> jax.Array:
    """Global-batch correct-prediction count for sharded eval batches.

    XLA reduces across the data mesh axis (and, with process-local shards
    from put_batch, across hosts) — the analog of the reference's eval
    accuracy AllReduce (evals/video_classification_frozen/eval.py:364).
    ``valid`` (optional [B] bool) excludes wrap-padded duplicate rows from
    the count (ShardedSampler.batch_valid_masks) so exact per-sample top-1
    matches the reference's ragged-final-batch loader.
    """
    import jax.numpy as jnp

    ok = jnp.argmax(probs, -1) == labels
    if valid is not None:
        ok = ok & valid
    return jnp.sum(ok.astype(jnp.int32))


@jax.jit
def count_valid(valid: jax.Array) -> jax.Array:
    """Global count of valid (non-pad) rows in a sharded eval batch."""
    import jax.numpy as jnp

    return jnp.sum(valid.astype(jnp.int32))


def put_batch(mesh: Mesh, x: Any, sharding: NamedSharding | None = None) -> jax.Array:
    """Place a host batch on the mesh, sharded over the batch axes (or a
    caller-supplied sharding, e.g. for [ncfg, B, N] mask stacks).

    Single-host: a plain sharded device_put. Multi-host: each process
    contributes its local shard of the global batch
    (jax.make_array_from_process_local_data), so jit-internal means/sums
    reduce across hosts — the analog of the reference's AllReduce on eval
    meters (evals/video_classification_frozen/eval.py:364).
    """
    sh = sharding if sharding is not None else batch_sharding(mesh)
    x = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, x)
    return jax.device_put(x, sh)
