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
        audio = lo.audio_enabled

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

        vf = proj(x[:, :nv])
        vf = _mha(vf, vf, v_inproj, v_outproj, self.num_heads)
        vqb = jnp.broadcast_to(vq, (b, lo.num_frames, self.hidden_dim)).astype(self.dtype)
        vf = _mha(vqb, vf, v_inproj, v_outproj, self.num_heads)

        if audio:
            a_inproj = nn.Dense(3 * self.hidden_dim, dtype=self.dtype, name="a_attn_in")
            a_outproj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="a_attn_out")
            af = proj(x[:, nv:])
            af = _mha(af, af, a_inproj, a_outproj, self.num_heads)
            aqb = jnp.broadcast_to(aq, (b, n_seg, self.hidden_dim)).astype(self.dtype)
            af = _mha(aqb, af, a_inproj, a_outproj, self.num_heads)

        video_out = nn.Dense(
            3 * lo.crop_size * lo.crop_size, dtype=self.dtype, name="to_video"
        )(vf)
        video_out = video_out.reshape(b, lo.num_frames, 3, lo.crop_size, lo.crop_size)
        video_out = jnp.transpose(video_out, (0, 1, 3, 4, 2))  # [B,T,H,W,3]

        if not audio:
            return video_out, None
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
        x = nn.Dense(lo.crop_size, dtype=self.dtype, name="ft2")(x)  # [B, T, H]
        # "expand to channels and other spatial dim" per H-row (the reference's
        # own final reshape at :153 is shape-inconsistent — [B,16,672] cannot
        # become [B,16,3,224,224]; this is the evident factored intent)
        x = nn.Dense(3 * lo.crop_size, dtype=self.dtype, name="final")(x[..., None])
        return x.reshape(
            b, lo.num_frames, lo.crop_size, 3, lo.crop_size
        ).transpose(0, 1, 2, 4, 3)


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


class ConvolutionalProbe(nn.Module):
    """Project tokens, reshape to an image-like plane, 2D convs, project to
    video (reference :157-196; its 32x32 plane generalizes to
    [sqrt-ish factorization of N*256/spatial]). Channels-last convs."""

    layout: TokenLayout
    seq_len: int
    dtype: jnp.dtype = jnp.float32
    plane: int = 32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        x = nn.Dense(256, dtype=self.dtype, name="initial_project")(x)  # [B, N, 256]
        # reshape to a [plane, M] single-channel map (reference: [B,1,32,-1])
        x = x.reshape(b, self.plane, -1, 1)
        x = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x))
        x = nn.Conv(48, (3, 3), padding="SAME", dtype=self.dtype, name="conv3")(x)
        # per-frame projection instead of the reference's single
        # 49k x 2.4M Linear (~120 GB of parameters — unusable as written;
        # the factored form keeps the same mapping family at sane size)
        x = x.reshape(b, -1)
        x = nn.Dense(lo.num_frames * 256, dtype=self.dtype, name="to_frames")(x)
        x = x.reshape(b, lo.num_frames, 256)
        x = nn.Dense(3 * lo.crop_size * lo.crop_size, dtype=self.dtype, name="to_video")(x)
        return x.reshape(b, lo.num_frames, lo.crop_size, lo.crop_size, 3)


class ProgressiveProbe(nn.Module):
    """Compress all tokens, seed a coarse plane, progressively conv+upsample
    x8 to full resolution, then broadcast over time (reference :198-239 —
    its ``return x[0]`` batch-dropping bug is not reproduced)."""

    layout: TokenLayout
    seq_len: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        b = x.shape[0]
        base = lo.crop_size // 8  # reference: 32 for 224->256-ish via x8 upsampling
        x = x.reshape(b, -1)
        x = nn.Dense(1024, dtype=self.dtype, name="compress")(x)
        x = nn.Dense(16 * base * base, dtype=self.dtype, name="to_4d")(x)
        x = x.reshape(b, base, base, 16)

        def up2(y):
            bb, h, w, c = y.shape
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            return y

        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="up1")(x))
        x = up2(x)
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="up2")(x))
        x = up2(x)
        x = nn.relu(nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype, name="up3")(x))
        x = up2(x)
        x = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype, name="to_rgb")(x)
        # broadcast the single frame across time (reference repeat)
        return jnp.broadcast_to(
            x[:, None], (b, lo.num_frames, *x.shape[1:])
        )


class AttentiveProbe(nn.Module):
    """Learned per-frame query tokens cross-attend over the embedding, then a
    per-frame projection to pixels (reference :62-121; its final Linear to
    num_frames*3*H*W from num_frames*emb is factored per-frame here for the
    same reason as ConvolutionalProbe)."""

    layout: TokenLayout
    emb_dim: int = 384
    num_heads: int = 12
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.layout
        if x.ndim == 2:
            x = x[:, None, :]  # reference unsqueezes pooled embeddings
        b = x.shape[0]
        d = self.emb_dim
        q0 = self.param(
            "query_tokens", clipped_normal_init(), (1, lo.num_frames, d), jnp.float32
        )
        q = jnp.broadcast_to(q0, (b, lo.num_frames, d)).astype(self.dtype)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")
        out = nn.Dense(d, dtype=self.dtype, name="out_proj")
        q = _mha(q, x.astype(self.dtype), qkv, out, self.num_heads)
        for i in range(self.depth - 1):
            # torch TransformerEncoderLayer: self-attn + FFN, post-LN
            y = _mha(
                q, q,
                nn.Dense(3 * d, dtype=self.dtype, name=f"blk{i}_in"),
                nn.Dense(d, dtype=self.dtype, name=f"blk{i}_out"),
                self.num_heads,
            )
            q = nn.LayerNorm(dtype=self.dtype, name=f"blk{i}_ln1")(q + y)
            y = nn.Dense(4 * d, dtype=self.dtype, name=f"blk{i}_ff1")(q)
            y = nn.Dense(d, dtype=self.dtype, name=f"blk{i}_ff2")(nn.relu(y))
            q = nn.LayerNorm(dtype=self.dtype, name=f"blk{i}_ln2")(q + y)
        x = nn.Dense(3 * lo.crop_size * lo.crop_size, dtype=self.dtype, name="linear")(q)
        return x.reshape(b, lo.num_frames, lo.crop_size, lo.crop_size, 3)


PROBES = {
    "attention": AttentionProbe,
    "linear": LinearProbe,
    "pooling": PoolingProbe,
    "factorized": FactorizedProbe,
    "conv_temporal": ConvTemporalProbe,
    "convolutional": ConvolutionalProbe,
    "progressive": ProgressiveProbe,
    "attentive": AttentiveProbe,
}
