"""Pixel/spectrogram reconstruction probes for the avprediction app.

Reference: src/models/prediction_probes.py. The probe actually used in the
avprediction training loop is ``AttentionProbe`` (:278-348); the others are
research leftovers kept for capability parity. All probes here are
parameterized by the token layout instead of hardcoded 1568/848/16/224
constants (and the reference LinearProbe's broken duplicate ``forward`` at
:39-60 is not reproduced).

Shapes are channels-last (TPU-idiomatic): video out [B, T, H, W, 3],
audio out [B, Hs, Ws, 1].
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from avjepa_tpu.layout import TokenLayout
from avjepa_tpu.models.modules import clipped_normal_init
from avjepa_tpu.ops.attention import xla_attention


def _mha(q, kv, qkv_dense, out_dense, num_heads):
    """Bidirectional multi-head attention helper (torch nn.MultiheadAttention
    equivalent: shared in-proj for q/k/v, out-proj)."""
    b, nq, d = q.shape
    nk = kv.shape[1]
    dh = d // num_heads
    qp, kp, vp = qkv_dense(q), qkv_dense(kv), qkv_dense(kv)
    # qkv_dense produces 3*d features; slice per role
    qh = jnp.moveaxis(qp[..., :d].reshape(b, nq, num_heads, dh), 1, 2)
    kh = jnp.moveaxis(kp[..., d : 2 * d].reshape(b, nk, num_heads, dh), 1, 2)
    vh = jnp.moveaxis(vp[..., 2 * d :].reshape(b, nk, num_heads, dh), 1, 2)
    out = xla_attention(qh, kh, vh)
    return out_dense(jnp.moveaxis(out, 1, 2).reshape(b, nq, d))


class AttentionProbe(nn.Module):
    """Per-modality self-attention + learned-query cross-attention decoder
    (reference: prediction_probes.py:278-348).

    Note: the reference's final audio reshape ([B,12,128,16] -> [B,1,128,192])
    scrambles the segment layout; we implement the evident intent — 12 width
    segments of 128x16 concatenated along the time axis.
    """

    layout: TokenLayout
    emb_dim: int = 384
    hidden_dim: int = 256
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        nv = lo.num_video_tokens
        n_seg = lo.wa_grid  # 12 audio width segments
        seg_w = lo.spec_width // n_seg  # 16

        proj = nn.Dense(
            self.hidden_dim, dtype=self.dtype, kernel_init=clipped_normal_init(),
            name="input_proj",
        )
        vq = self.param(
            "video_query", nn.initializers.normal(1.0),
            (1, lo.num_frames, self.hidden_dim), jnp.float32,
        )
        aq = self.param(
            "audio_query", nn.initializers.normal(1.0),
            (1, n_seg, self.hidden_dim), jnp.float32,
        )

        v_inproj = nn.Dense(3 * self.hidden_dim, dtype=self.dtype, name="v_attn_in")
        v_outproj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="v_attn_out")
        a_inproj = nn.Dense(3 * self.hidden_dim, dtype=self.dtype, name="a_attn_in")
        a_outproj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="a_attn_out")

        vf = proj(x[:, :nv])
        af = proj(x[:, nv:])

        vf = _mha(vf, vf, v_inproj, v_outproj, self.num_heads)
        vqb = jnp.broadcast_to(vq, (b, lo.num_frames, self.hidden_dim)).astype(self.dtype)
        vf = _mha(vqb, vf, v_inproj, v_outproj, self.num_heads)

        af = _mha(af, af, a_inproj, a_outproj, self.num_heads)
        aqb = jnp.broadcast_to(aq, (b, n_seg, self.hidden_dim)).astype(self.dtype)
        af = _mha(aqb, af, a_inproj, a_outproj, self.num_heads)

        video_out = nn.Dense(
            3 * lo.crop_size * lo.crop_size, dtype=self.dtype, name="to_video"
        )(vf)
        video_out = video_out.reshape(b, lo.num_frames, 3, lo.crop_size, lo.crop_size)
        video_out = jnp.transpose(video_out, (0, 1, 3, 4, 2))  # [B,T,H,W,3]

        audio_out = nn.Dense(
            lo.spec_height * seg_w, dtype=self.dtype, name="to_audio"
        )(af)
        audio_out = audio_out.reshape(b, n_seg, lo.spec_height, seg_w)
        audio_out = jnp.transpose(audio_out, (0, 2, 1, 3)).reshape(
            b, lo.spec_height, lo.spec_width, 1
        )
        return video_out, audio_out


class LinearProbe(nn.Module):
    """3-layer MLP over flattened tokens -> full video (reference :8-37)."""

    layout: TokenLayout
    seq_len: int
    emb_dim: int = 384
    hidden_1: int = 2048
    hidden_2: int = 800
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        x = x.reshape(b, -1)
        x = nn.relu(nn.Dense(self.hidden_1, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_2, dtype=self.dtype, name="fc2")(x))
        x = nn.Dense(
            lo.num_frames * 3 * lo.crop_size * lo.crop_size, dtype=self.dtype, name="fc3"
        )(x)
        return x.reshape(b, lo.num_frames, lo.crop_size, lo.crop_size, 3)


class PoolingProbe(nn.Module):
    """Mean-pool tokens -> MLP -> video (reference :240-276)."""

    layout: TokenLayout
    emb_dim: int = 384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name="feat1")(x))
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name="feat2")(x))
        x = jnp.mean(x, axis=1)
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="proj1")(x))
        x = nn.Dense(
            lo.num_frames * 3 * lo.crop_size * lo.crop_size, dtype=self.dtype,
            name="proj2",
        )(x)
        return x.reshape(b, lo.num_frames, lo.crop_size, lo.crop_size, 3)


class FactorizedProbe(nn.Module):
    """Temporal compression then feature expansion (reference :125-156)."""

    layout: TokenLayout
    seq_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        x = jnp.swapaxes(x, 1, 2)
        x = nn.Dense(lo.num_frames, dtype=self.dtype, name="temporal_compress")(x)
        x = jnp.swapaxes(x, 1, 2)  # [B, T, D]
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name="ft1")(x))
        x = nn.Dense(lo.crop_size, dtype=self.dtype, name="ft2")(x)
        x = nn.Dense(3 * lo.crop_size, dtype=self.dtype, name="final")(x)
        return x.reshape(b, lo.num_frames, lo.crop_size, 3, lo.crop_size).transpose(
            0, 1, 2, 4, 3
        )


class ConvTemporalProbe(nn.Module):
    """1D temporal convs + adaptive pool -> per-frame projection
    (reference :352-381)."""

    layout: TokenLayout
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        x = nn.relu(nn.Conv(256, (3,), padding="SAME", dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(256, (3,), padding="SAME", dtype=self.dtype, name="conv2")(x))
        # adaptive average pool the sequence axis to num_frames
        n = x.shape[1]
        t = lo.num_frames
        # split into t nearly-equal chunks (AdaptiveAvgPool1d semantics)
        bounds = [(int(i * n / t), max(int(i * n / t) + 1, int((i + 1) * n / t))) for i in range(t)]
        pooled = jnp.stack([jnp.mean(x[:, s:e], axis=1) for s, e in bounds], axis=1)
        x = nn.Dense(3 * lo.crop_size * lo.crop_size, dtype=self.dtype, name="to_video")(pooled)
        return x.reshape(b, t, lo.crop_size, lo.crop_size, 3)


PROBES = {
    "attention": AttentionProbe,
    "linear": LinearProbe,
    "pooling": PoolingProbe,
    "factorized": FactorizedProbe,
    "conv_temporal": ConvTemporalProbe,
}
