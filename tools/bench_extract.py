"""Benchmark the extract (serving) path's device step: frozen-encoder
forward + feature LN + mean pool, ViT-L AV geometry by default.

Times the pure device computation the way bench.py does (scalar device_get
sync; this environment's block_until_ready is a no-op) — host ingest is
benched separately by tools/bench_loader.py.

Usage: python tools/bench_extract.py [model] [batch] [steps] [attn]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model="vit_large", batch=24, steps=20, attn="flash"):
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    from avjepa_tpu.config import load_config
    from avjepa_tpu.layout import TokenLayout
    from avjepa_tpu.models import init_encoder_params, make_encoder
    from avjepa_tpu.train.step import cast_dense_params, feature_layer_norm
    from bench import north_star_config

    cfg = load_config(north_star_config(model, batch, attn=attn, tag="xbench"))
    layout = cfg.layout()
    encoder = make_encoder(
        model, layout, uniform_power=True, dtype=jnp.bfloat16, attn_impl=attn,
        gelu=cfg.tpu.gelu,
    )
    params = init_encoder_params(encoder, jax.random.key(0))

    @jax.jit
    def encode(p, video, audio):
        p = cast_dense_params(p, encoder.dtype)
        h = encoder.apply({"params": p}, video, audio)
        h = feature_layer_norm(h.astype(jnp.float32))
        return jnp.mean(h, axis=1)

    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal(
            (batch, layout.num_frames, layout.crop_size, layout.crop_size, 3),
            np.float32,
        ),
        jnp.bfloat16,
    )
    audio = jnp.asarray(
        rng.standard_normal(
            (batch, layout.spec_height, layout.spec_width, 1), np.float32
        ),
        jnp.bfloat16,
    )

    out = encode(params, video, audio)
    float(jax.device_get(out[0, 0]))  # sync (compile + first step)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = encode(params, video, audio)
    float(jax.device_get(out[0, 0]))
    dt = (time.perf_counter() - t0) / steps
    print(
        {
            "model": model,
            "batch": batch,
            "attn": attn,
            "ms_per_step": round(dt * 1e3, 2),
            "clips_per_sec_device": round(batch / dt, 1),
        }
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if len(a) > 0 else "vit_large",
        int(a[1]) if len(a) > 1 else 24,
        int(a[2]) if len(a) > 2 else 20,
        a[3] if len(a) > 3 else "flash",
    )
