"""Golden numerics parity vs the reference PyTorch implementation.

Loads the reference models from /root/reference (read-only), copies their
weights into our JAX modules, and asserts forward-pass equality:
  - encoder full-sequence forward (target-encoder path)
  - encoder masked forward: reference token-removal vs our dense key-mask
  - predictor forward at target positions
  - sincos positional embedding generators
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models.encoder import Encoder
from avjepa_tpu.models.predictor import Predictor
from avjepa_tpu.models import pos_embed as pe

from reference_bridge import (
    disable_sdpa,
    import_reference,
    torch_encoder_to_params,
    torch_predictor_to_params,
)

# Small but full-architecture config: 8 frames x 96px -> video grid (4, 6, 6)
# = 144 tokens; audio 128x192 spec -> 96 tokens (reference hardcodes the audio
# grid, so we keep its native spectrogram size).
FRAMES, CROP, PATCH, TUBELET = 8, 96, 16, 2
EMBED, DEPTH, HEADS = 96, 3, 3
PRED_EMBED, PRED_DEPTH = 48, 2

LAYOUT = TokenLayout(
    num_frames=FRAMES, crop_size=CROP, patch_size=PATCH, tubelet_size=TUBELET,
    spec_height=128, spec_width=192,
)


@pytest.fixture(scope="module")
def ref_modules():
    return import_reference()


@pytest.fixture(scope="module")
def ref_encoder(ref_modules):
    import functools

    import torch.nn as tnn

    ref_avt, _ = ref_modules
    torch.manual_seed(0)
    m = ref_avt.AudioVisionTransformer(
        img_size=CROP, patch_size=PATCH, num_frames=FRAMES, tubelet_size=TUBELET,
        embed_dim=EMBED, depth=DEPTH, num_heads=HEADS, uniform_power=True,
        norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6),
    )
    m.eval()
    disable_sdpa(m)
    return m


@pytest.fixture(scope="module")
def ref_predictor(ref_modules):
    import functools

    import torch.nn as tnn

    _, ref_avp = ref_modules
    torch.manual_seed(1)
    m = ref_avp.AudioVisionTransformerPredictor(
        img_size=CROP, patch_size=PATCH, num_frames=FRAMES, tubelet_size=TUBELET,
        embed_dim=EMBED, predictor_embed_dim=PRED_EMBED, depth=PRED_DEPTH,
        num_heads=HEADS, uniform_power=True, use_mask_tokens=True,
        num_mask_tokens=2, zero_init_mask_tokens=False,
        norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6),
    )
    m.eval()
    disable_sdpa(m)
    return m


def make_inputs(seed=0, batch=2):
    rng = np.random.default_rng(seed)
    video = rng.normal(size=(batch, FRAMES, CROP, CROP, 3)).astype(np.float32)
    audio = rng.normal(size=(batch, 128, 192, 1)).astype(np.float32)
    return video, audio


def to_torch(video, audio):
    # [B,T,H,W,C] -> [B,C,T,H,W]; [B,H,W,1] -> [B,1,H,W]
    tv = torch.from_numpy(video.transpose(0, 4, 1, 2, 3))
    ta = torch.from_numpy(audio.transpose(0, 3, 1, 2))
    return tv, ta


def test_pos_embed_parity():
    import sys

    sys.path.insert(0, "/root/reference")
    from src.models.utils import pos_embs as ref_pe

    np.testing.assert_allclose(
        pe.sincos_3d(96, 6, 4, uniform_power=True),
        ref_pe.get_3d_sincos_pos_embed(96, 6, 4, uniform_power=True),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        pe.sincos_3d(96, 6, 4, uniform_power=False),
        ref_pe.get_3d_sincos_pos_embed(96, 6, 4, uniform_power=False),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        pe.sincos_2d_rect(96, 8, 12),
        ref_pe.get_2d_sincos_pos_embed_xy(96, 8, 12),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        pe.sincos_2d(96, 14), ref_pe.get_2d_sincos_pos_embed(96, 14), atol=1e-12
    )
    np.testing.assert_allclose(
        pe.sincos_1d(96, 16), ref_pe.get_1d_sincos_pos_embed(96, 16), atol=1e-12
    )


def test_encoder_full_forward_parity(ref_encoder):
    video, audio = make_inputs()
    tv, ta = to_torch(video, audio)
    with torch.no_grad():
        ref_out = ref_encoder(tv, ta).numpy()

    enc = Encoder(
        layout=LAYOUT, embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
        uniform_power=True,
    )
    params = torch_encoder_to_params(ref_encoder, DEPTH)
    out = jax.jit(enc.apply)(
        {"params": params}, jnp.asarray(video), jnp.asarray(audio)
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4, atol=1e-4)


def test_encoder_masked_forward_parity(ref_encoder):
    """Reference token-removal vs our dense key-mask at kept positions."""
    video, audio = make_inputs(seed=3)
    tv, ta = to_torch(video, audio)

    nv, na = LAYOUT.num_video_tokens, LAYOUT.num_audio_tokens
    rng = np.random.default_rng(7)
    batch = video.shape[0]
    keep_v = np.stack([np.sort(rng.choice(nv, size=50, replace=False)) for _ in range(batch)])
    keep_a = np.stack([np.sort(rng.choice(na, size=30, replace=False)) for _ in range(batch)])

    with torch.no_grad():
        ref_out = ref_encoder(
            tv, ta,
            masks=(torch.from_numpy(keep_v), torch.from_numpy(keep_a)),
        ).numpy()  # [B, 50+30, D]

    key_mask = np.zeros((batch, nv + na), bool)
    for b in range(batch):
        key_mask[b, keep_v[b]] = True
        key_mask[b, nv + keep_a[b]] = True

    enc = Encoder(
        layout=LAYOUT, embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
        uniform_power=True,
    )
    params = torch_encoder_to_params(ref_encoder, DEPTH)
    dense = np.asarray(
        jax.jit(enc.apply)(
            {"params": params},
            jnp.asarray(video),
            jnp.asarray(audio),
            key_mask=jnp.asarray(key_mask),
        )
    )
    # gather our dense outputs at the reference's kept-token order
    ours = np.stack(
        [
            np.concatenate([dense[b, keep_v[b]], dense[b, nv + keep_a[b]]])
            for b in range(batch)
        ]
    )
    np.testing.assert_allclose(ours, ref_out, rtol=5e-4, atol=1e-4)


def test_predictor_forward_parity(ref_encoder, ref_predictor):
    video, audio = make_inputs(seed=11)
    tv, ta = to_torch(video, audio)
    nv, na = LAYOUT.num_video_tokens, LAYOUT.num_audio_tokens
    batch = video.shape[0]
    rng = np.random.default_rng(13)

    # disjoint ctx/tgt index sets per sample
    keep_v = np.stack([np.sort(rng.choice(nv, size=90, replace=False)) for _ in range(batch)])
    keep_a = np.stack([np.sort(rng.choice(na, size=60, replace=False)) for _ in range(batch)])
    pred_v = np.stack([
        np.sort(np.setdiff1d(np.arange(nv), keep_v[b])[:40]) for b in range(batch)
    ])
    pred_a = np.stack([
        np.sort(np.setdiff1d(np.arange(na), keep_a[b])[:20]) for b in range(batch)
    ])

    mask_index = 1

    with torch.no_grad():
        z = ref_encoder(
            tv, ta, masks=(torch.from_numpy(keep_v), torch.from_numpy(keep_a))
        )
        z_v, z_a = torch.split(z, [keep_v.shape[1], keep_a.shape[1]], dim=1)
        # target tokens: the predictor only uses their shapes when mask tokens
        # are enabled, but pass real tensors for faithfulness
        h_v = torch.zeros(batch, pred_v.shape[1], EMBED)
        h_a = torch.zeros(batch, pred_a.shape[1], EMBED)
        ref_out = ref_predictor(
            (z_v, z_a),
            (h_v, h_a),
            (torch.from_numpy(keep_v), torch.from_numpy(keep_a)),
            (torch.from_numpy(pred_v), torch.from_numpy(pred_a)),
            mask_index=mask_index,
        ).numpy()  # [B, 40+20, D]

    enc_mask = np.zeros((batch, nv + na), bool)
    tgt_mask = np.zeros((batch, nv + na), bool)
    for b in range(batch):
        enc_mask[b, keep_v[b]] = True
        enc_mask[b, nv + keep_a[b]] = True
        tgt_mask[b, pred_v[b]] = True
        tgt_mask[b, nv + pred_a[b]] = True

    enc = Encoder(
        layout=LAYOUT, embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
        uniform_power=True,
    )
    eparams = torch_encoder_to_params(ref_encoder, DEPTH)
    dense_ctx = jax.jit(enc.apply)(
        {"params": eparams},
        jnp.asarray(video),
        jnp.asarray(audio),
        key_mask=jnp.asarray(enc_mask),
    )

    pred = Predictor(
        layout=LAYOUT, embed_dim=EMBED, predictor_embed_dim=PRED_EMBED,
        depth=PRED_DEPTH, num_heads=HEADS, uniform_power=True,
        use_mask_tokens=True, num_mask_tokens=2, zero_init_mask_tokens=False,
    )
    pparams = torch_predictor_to_params(ref_predictor, PRED_DEPTH)
    dense_out = np.asarray(
        jax.jit(pred.apply, static_argnums=(4,))(
            {"params": pparams},
            dense_ctx,
            jnp.asarray(enc_mask),
            jnp.asarray(tgt_mask),
            mask_index,
        )
    )
    ours = np.stack(
        [
            np.concatenate([dense_out[b, pred_v[b]], dense_out[b, nv + pred_a[b]]])
            for b in range(batch)
        ]
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=2e-4)


def test_attentive_classifier_parity():
    """Frozen-eval probe: our AttentiveClassifier vs the reference's."""
    import functools
    import sys

    import torch.nn as tnn

    sys.path.insert(0, "/root/reference")
    from src.models.attentive_pooler import AttentiveClassifier as RefCls

    from avjepa_tpu.models.attentive_pooler import AttentiveClassifier

    dim, heads, classes, n = 96, 3, 7, 40
    torch.manual_seed(3)
    ref = RefCls(
        embed_dim=dim, num_heads=heads, num_classes=classes, depth=1,
        norm_layer=functools.partial(tnn.LayerNorm, eps=1e-6),
    )
    ref.eval()
    disable_sdpa(ref)
    sd = ref.state_dict()

    def t2n(t):
        return t.detach().numpy()

    params = {
        "pooler": {
            "query_tokens": t2n(sd["pooler.query_tokens"]),
            "cross_attention_block": {
                "norm1": {
                    "scale": t2n(sd["pooler.cross_attention_block.norm1.weight"]),
                    "bias": t2n(sd["pooler.cross_attention_block.norm1.bias"]),
                },
                "xattn": {
                    "q": {"kernel": t2n(sd["pooler.cross_attention_block.xattn.q.weight"]).T,
                          "bias": t2n(sd["pooler.cross_attention_block.xattn.q.bias"])},
                    "kv": {"kernel": t2n(sd["pooler.cross_attention_block.xattn.kv.weight"]).T,
                           "bias": t2n(sd["pooler.cross_attention_block.xattn.kv.bias"])},
                    "proj": {"kernel": t2n(sd["pooler.cross_attention_block.xattn.proj.weight"]).T,
                             "bias": t2n(sd["pooler.cross_attention_block.xattn.proj.bias"])},
                },
                "norm2": {
                    "scale": t2n(sd["pooler.cross_attention_block.norm2.weight"]),
                    "bias": t2n(sd["pooler.cross_attention_block.norm2.bias"]),
                },
                "mlp": {
                    "fc1": {"kernel": t2n(sd["pooler.cross_attention_block.mlp.fc1.weight"]).T,
                            "bias": t2n(sd["pooler.cross_attention_block.mlp.fc1.bias"])},
                    "fc2": {"kernel": t2n(sd["pooler.cross_attention_block.mlp.fc2.weight"]).T,
                            "bias": t2n(sd["pooler.cross_attention_block.mlp.fc2.bias"])},
                },
            },
        },
        "linear": {"kernel": t2n(sd["linear.weight"]).T, "bias": t2n(sd["linear.bias"])},
    }

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, n, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    cls = AttentiveClassifier(
        embed_dim=dim, num_heads=heads, num_classes=classes, depth=1,
        qkv_bias=True,
    )
    out = jax.jit(cls.apply)({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4, atol=5e-5)
