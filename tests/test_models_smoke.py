"""Shape/finite smoke tests for the model core on a tiny layout."""

import jax
import jax.numpy as jnp
import numpy as np

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models import (
    Encoder,
    Predictor,
    init_encoder_params,
    init_predictor_params,
)

TINY = TokenLayout(num_frames=4, crop_size=32, patch_size=16, tubelet_size=2,
                   spec_height=32, spec_width=48)
# -> video grid (2, 2, 2) = 8 tokens; audio grid (2, 3) = 6 tokens; N = 14


def tiny_encoder(layout=TINY, **kw):
    return Encoder(layout=layout, embed_dim=32, depth=2, num_heads=2, **kw)


def tiny_predictor(layout=TINY, **kw):
    return Predictor(
        layout=layout, embed_dim=32, predictor_embed_dim=16, depth=2, num_heads=2, **kw
    )


def test_encoder_av_forward():
    enc = tiny_encoder()
    params = init_encoder_params(enc, jax.random.key(0))
    video = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    audio = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 48, 1)), jnp.float32)
    out = jax.jit(enc.apply)({"params": params}, video, audio)
    assert out.shape == (2, 14, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_key_mask_excludes_masked_tokens():
    """Masked tokens must not influence valid outputs (token-removal parity)."""
    enc = tiny_encoder()
    params = init_encoder_params(enc, jax.random.key(0))
    rng = np.random.default_rng(2)
    video = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(1, 32, 48, 1)), jnp.float32)

    keep_v = np.array([0, 2, 5, 7])
    keep_a = np.array([1, 3])
    key_mask = np.zeros((1, 14), bool)
    key_mask[0, keep_v] = True
    key_mask[0, 8 + keep_a] = True

    apply = jax.jit(enc.apply)
    dense = apply({"params": params}, video, audio, key_mask=jnp.asarray(key_mask))

    # perturb the *content* of an invalid token; valid outputs must not move.
    video2 = np.asarray(video).copy()
    # token index 1 is invalid (t=0, h=0, w=1) -> pixels [0:2, 0:16, 16:32]
    video2[0, 0:2, 0:16, 16:32, :] += 100.0
    dense2 = apply(
        {"params": params}, jnp.asarray(video2), audio, key_mask=jnp.asarray(key_mask)
    )
    valid = key_mask[0]
    np.testing.assert_allclose(
        np.asarray(dense)[0, valid], np.asarray(dense2)[0, valid], rtol=1e-5, atol=1e-5
    )


def test_predictor_forward():
    enc = tiny_encoder()
    pred = tiny_predictor()
    eparams = init_encoder_params(enc, jax.random.key(0))
    pparams = init_predictor_params(pred, jax.random.key(1))
    rng = np.random.default_rng(3)
    video = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(2, 32, 48, 1)), jnp.float32)

    enc_mask = np.zeros((2, 14), bool)
    pred_mask = np.zeros((2, 14), bool)
    enc_mask[:, [0, 2, 5, 7, 8, 9]] = True
    pred_mask[:, [1, 3, 4, 6, 10, 11]] = True

    ctx = jax.jit(enc.apply)(
        {"params": eparams}, video, audio, key_mask=jnp.asarray(enc_mask)
    )
    out = jax.jit(pred.apply, static_argnums=(4,))(
        {"params": pparams}, ctx, jnp.asarray(enc_mask), jnp.asarray(pred_mask), 1
    )
    assert out.shape == (2, 14, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_video_only_encoder():
    lo = TokenLayout(num_frames=4, crop_size=32, patch_size=16, tubelet_size=2,
                     audio_enabled=False)
    enc = tiny_encoder(layout=lo)
    params = init_encoder_params(enc, jax.random.key(0))
    video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    out = jax.jit(enc.apply)({"params": params}, video)
    assert out.shape == (2, 8, 32)


def test_image_encoder():
    lo = TokenLayout(num_frames=1, crop_size=32, patch_size=16, audio_enabled=False)
    enc = tiny_encoder(layout=lo)
    params = init_encoder_params(enc, jax.random.key(0))
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    out = jax.jit(enc.apply)({"params": params}, img)
    assert out.shape == (2, 4, 32)


def test_rescale_applied():
    enc = tiny_encoder()
    params = init_encoder_params(enc, jax.random.key(0))
    k = params["blocks"]["layers"]["attn"]["proj"]["kernel"]
    assert k.shape[0] == 2  # depth-stacked
    # layer 1 kernels should be smaller in norm than layer 0 on average
    n0 = float(jnp.linalg.norm(k[0]))
    n1 = float(jnp.linalg.norm(k[1]))
    assert n1 < n0


def test_predictor_diffusion_fallback():
    """use_mask_tokens=False: target positions seeded from noised targets."""
    pred = Predictor(
        layout=TINY, embed_dim=32, predictor_embed_dim=16, depth=2, num_heads=2,
        use_mask_tokens=False,
    )
    rng = np.random.default_rng(5)
    ctx = jnp.asarray(rng.normal(size=(2, 14, 32)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(2, 14, 32)), jnp.float32)
    enc_mask = np.zeros((2, 14), bool)
    pred_mask = np.zeros((2, 14), bool)
    enc_mask[:, :7] = True
    pred_mask[:, 7:] = True
    params = jax.jit(
        lambda k: pred.init(
            k, ctx, jnp.asarray(enc_mask), jnp.asarray(pred_mask), 0,
            target=tgt, noise_rng=jax.random.key(1),
        )["params"]
    )(jax.random.key(0))
    out = jax.jit(
        lambda p: pred.apply(
            {"params": p}, ctx, jnp.asarray(enc_mask), jnp.asarray(pred_mask), 0,
            target=tgt, noise_rng=jax.random.key(2),
        )
    )(params)
    assert out.shape == (2, 14, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_all_prediction_probes_smoke():
    """All 8 reference probe families (reference src/models/prediction_probes.py
    has 8 classes) build and emit video-shaped output."""
    import jax
    import jax.numpy as jnp
    from avjepa_tpu.layout import TokenLayout
    from avjepa_tpu.models.prediction_probes import PROBES

    lo = TokenLayout(num_frames=4, crop_size=32, patch_size=16, tubelet_size=2)
    b, n, d = 2, lo.num_tokens, 48
    x = jnp.zeros((b, n, d), jnp.float32)
    assert len(PROBES) == 8
    for name, cls in PROBES.items():
        kw = {"layout": lo}
        if name in ("linear", "factorized", "convolutional", "progressive"):
            kw["seq_len"] = n
        if name in ("attention", "attentive"):
            kw["emb_dim"] = d
            if name == "attentive":
                kw["num_heads"] = 4
        probe = cls(**kw)
        params = probe.init(jax.random.key(0), x)["params"]
        out = probe.apply({"params": params}, x)
        if name == "attention":
            out = out[0]  # (video, audio) tuple
        assert out.shape == (b, lo.num_frames, lo.crop_size, lo.crop_size, 3), (
            name, out.shape)


def test_scan_knobs_bit_identical(monkeypatch):
    """AVJEPA_SCAN_UNROLL / AVJEPA_SCAN_SPLIT_TRANSPOSE are perf knobs only:
    the block-stack forward is bit-identical under them."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from avjepa_tpu.models.encoder import BlockStack

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 32)), jnp.float32)

    def fwd():
        stack = BlockStack(depth=3, dim=32, num_heads=4)
        params = stack.init(jax.random.key(1), x)
        return np.asarray(stack.apply(params, x))

    base = fwd()
    monkeypatch.setenv("AVJEPA_SCAN_UNROLL", "3")
    np.testing.assert_array_equal(fwd(), base)
    monkeypatch.setenv("AVJEPA_SCAN_UNROLL", "1")
    monkeypatch.setenv("AVJEPA_SCAN_SPLIT_TRANSPOSE", "1")
    np.testing.assert_array_equal(fwd(), base)
