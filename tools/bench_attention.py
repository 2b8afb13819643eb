"""Flash-attention kernel micro-bench on the step-relevant shapes.

Times fwd and fwd+bwd of `avjepa_tpu.ops.flash_attention.flash_attention`
(and optionally the XLA path) at the shapes the ViT-L AV pretrain step
actually runs:

  encoder-target  B24 H16 N1664 d64  (no mask)
  predictor       B24 H16 N1664 d24  (mask: enc|pred union, ~all valid)
  predictor-2cfg  B48 H16 N1664 d24  (both mask configs batched)
  context-K512    B24 H16 N512  d64  (bucketed compact tokens)
  context-K128    B24 H16 N128  d64

Timing syncs via scalar device_get (block_until_ready is a no-op on the
tunneled axon backend). Usage: python tools/bench_attention.py [impl...]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = [
    ("enc-target", 24, 16, 1664, 64, None),
    # ViT-L predictor: pred_embed_dim 384 / 16 heads -> head_dim 24
    ("predictor", 24, 16, 1664, 24, 0.98),
    ("pred-2cfg", 48, 16, 1664, 24, 0.98),
    ("ctx-K512", 24, 16, 512, 64, 1.0),
    ("ctx-K128", 24, 16, 128, 64, 1.0),
]


def sync(x):
    return float(jax.device_get(jnp.sum(x[..., 0, 0]).astype(jnp.float32)))


def run_one(fn, args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main(impls):
    from avjepa_tpu.ops.attention import attention

    rng = np.random.default_rng(0)
    print(f"{'shape':<12} {'impl':<8} {'fwd ms':>8} {'fwd+bwd ms':>11}")
    for name, b, h, n, d, valid_frac in SHAPES:
        q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        if valid_frac is None:
            mask = None
        else:
            m = rng.random((b, n)) < valid_frac
            m[:, 0] = True
            mask = jnp.asarray(m)

        for impl in impls:
            fwd = jax.jit(lambda q, k, v: attention(q, k, v, key_mask=mask, impl=impl))

            def loss(q, k, v):
                return jnp.sum(
                    attention(q, k, v, key_mask=mask, impl=impl).astype(jnp.float32) ** 2
                )

            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

            t_fwd = run_one(fwd, (q, k, v))
            gq = grad(q, k, v)
            sync(gq[0])
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                gq = grad(q, k, v)
            sync(gq[0])
            t_bwd = (time.perf_counter() - t0) / iters * 1000
            print(f"{name:<12} {impl:<8} {t_fwd:>8.2f} {t_bwd:>11.2f}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["flash"])
