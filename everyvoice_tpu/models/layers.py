"""Shared flax building blocks: Conformer, variance predictors, length
regulation, postnet.

These are new TPU-first implementations of the architecture the reference's
fs2 submodule uses (FastSpeech2 with Conformer encoder/decoder — see
SURVEY.md §2.3): static shapes everywhere, explicit padding masks, and
batched gather-based length regulation instead of per-item Python loops.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_positional_encoding(length: int, dim: int) -> np.ndarray:
    """Standard transformer sinusoidal table (length, dim), host-precomputed."""
    position = np.arange(length)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    table = np.zeros((length, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term)
    return table


def lengths_to_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths → (B, T) boolean validity mask."""
    return jnp.arange(max_length)[None, :] < lengths[:, None]


class FeedForwardModule(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float
    # Compute dtype for matmuls/convs (params stay float32; flax norm layers
    # compute their statistics in float32 regardless of dtype).
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, deterministic: bool):
        dt = jnp.dtype(self.dtype)
        x = nn.LayerNorm(dtype=dt)(x)
        x = nn.Dense(self.hidden_dim, dtype=dt)(x)
        x = nn.swish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=dt)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ConformerConvModule(nn.Module):
    dim: int
    kernel_size: int
    dropout: float
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        # x: (B, T, C); mask: (B, T)
        dt = jnp.dtype(self.dtype)
        residual_mask = mask[..., None]
        x = nn.LayerNorm(dtype=dt)(x)
        x = nn.Dense(2 * self.dim, dtype=dt)(x)  # pointwise expansion
        x = nn.glu(x, axis=-1)
        x = jnp.where(residual_mask, x, 0.0)
        x = nn.Conv(
            self.dim,
            kernel_size=(self.kernel_size,),
            feature_group_count=self.dim,  # depthwise
            padding="SAME",
            dtype=dt,
        )(x)
        # GroupNorm over channels stands in for the paper's BatchNorm: it is
        # batch-independent, so jit/sharding need no cross-device stats.
        x = nn.GroupNorm(num_groups=1, dtype=dt)(x)
        x = nn.swish(x)
        x = nn.Dense(self.dim, dtype=dt)(x)  # pointwise projection
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ConformerBlock(nn.Module):
    dim: int
    heads: int
    ff_dim: int
    conv_kernel_size: int
    dropout: float
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        dt = jnp.dtype(self.dtype)
        attn_mask = mask[:, None, None, :] & mask[:, None, :, None]
        x = x + 0.5 * FeedForwardModule(
            self.dim, self.ff_dim, self.dropout, dtype=self.dtype
        )(x, deterministic)
        y = nn.LayerNorm(dtype=dt)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=dt,
        )(y, y, mask=attn_mask)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = x + ConformerConvModule(
            self.dim, self.conv_kernel_size, self.dropout, dtype=self.dtype
        )(x, mask, deterministic)
        x = x + 0.5 * FeedForwardModule(
            self.dim, self.ff_dim, self.dropout, dtype=self.dtype
        )(x, deterministic)
        x = nn.LayerNorm(dtype=dt)(x)
        return jnp.where(mask[..., None], x, 0.0)


class ConformerStack(nn.Module):
    layers: int
    dim: int
    heads: int
    ff_dim: int
    conv_kernel_size: int
    dropout: float
    # bf16 compute runs the residual stream in bf16 too; the stack output is
    # cast back to float32 so heads/losses keep full precision.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        pos = sinusoidal_positional_encoding(x.shape[1], self.dim)
        x = x + jnp.asarray(pos)[None, :, :]
        x = x.astype(jnp.dtype(self.dtype))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for _ in range(self.layers):
            x = ConformerBlock(
                self.dim, self.heads, self.ff_dim, self.conv_kernel_size,
                self.dropout, dtype=self.dtype,
            )(x, mask, deterministic)
        return x.astype(jnp.float32)


class VariancePredictor(nn.Module):
    """Conv stack predicting one scalar per position (duration/pitch/energy).
    Depthwise-separable convolutions by default, matching the reference's
    `depthwise: true` (everyvoice/model/utils.py:5-48)."""

    n_layers: int
    kernel_size: int
    hidden_dim: int
    dropout: float
    depthwise: bool = True
    # Initial output bias: lets the duration predictor start at a sensible
    # prior (e.g. log1p(4) frames/token) instead of zero.
    out_bias_init: float = 0.0
    # Hidden convs may run in bf16; the scalar head always outputs float32.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        dt = jnp.dtype(self.dtype)
        for _ in range(self.n_layers):
            if self.depthwise:
                x = nn.Conv(
                    x.shape[-1],
                    kernel_size=(self.kernel_size,),
                    feature_group_count=x.shape[-1],
                    padding="SAME",
                    dtype=dt,
                )(x)
                x = nn.Conv(self.hidden_dim, kernel_size=(1,), dtype=dt)(x)
            else:
                x = nn.Conv(
                    self.hidden_dim, kernel_size=(self.kernel_size,),
                    padding="SAME", dtype=dt,
                )(x)
            x = nn.relu(x)
            x = nn.LayerNorm(dtype=dt)(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = nn.Dense(
            1, bias_init=nn.initializers.constant(self.out_bias_init)
        )(x.astype(jnp.float32))[..., 0]
        return jnp.where(mask, out, 0.0)


def regulate_length(
    encodings: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
) -> tuple:
    """Expand (B, N, C) phone encodings to (B, max_frames, C) frame encodings
    by repeating each position `durations` times — implemented as a batched
    gather from cumulative durations so it jits with static shapes (the one
    genuinely dynamic op in FastSpeech2; see SURVEY.md §7.4).

    Returns (frames, frame_mask, total_lengths)."""
    cum = jnp.cumsum(durations, axis=1)  # (B, N)
    total = cum[:, -1]
    t = jnp.arange(max_frames)
    # Frame t belongs to the first phone whose cumulative duration exceeds t:
    # idx[b, t] = Σ_n [t >= cum[b, n]] — a single (B, T, N) compare+reduce,
    # which compiles orders of magnitude faster on TPU than searchsorted's
    # sequential lowering and runs entirely on the VPU.
    idx = jnp.sum(
        t[None, :, None] >= cum[:, None, :], axis=-1, dtype=jnp.int32
    )
    idx = jnp.minimum(idx, encodings.shape[1] - 1)
    frames = jnp.take_along_axis(encodings, idx[..., None], axis=1)
    frame_mask = t[None, :] < total[:, None]
    frames = jnp.where(frame_mask[..., None], frames, 0.0)
    return frames, frame_mask, total


class Postnet(nn.Module):
    """5-layer conv postnet refining the mel output (Tacotron2-style)."""

    n_mels: int
    channels: int = 512
    kernel_size: int = 5
    n_layers: int = 5
    dropout: float = 0.5
    # Hidden convs may run in bf16; the residual refinement is added to the
    # float32 mel so the output keeps full precision.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, mel, mask, deterministic: bool = True):
        dt = jnp.dtype(self.dtype)
        x = mel.astype(dt)
        for i in range(self.n_layers - 1):
            x = nn.Conv(
                self.channels, kernel_size=(self.kernel_size,), padding="SAME",
                dtype=dt,
            )(x)
            x = nn.GroupNorm(num_groups=1, dtype=dt)(x)
            x = jnp.tanh(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Conv(
            self.n_mels, kernel_size=(self.kernel_size,), padding="SAME", dtype=dt
        )(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        out = mel + x.astype(jnp.float32)
        return jnp.where(mask[..., None], out, 0.0)


class GlobalStyleTokens(nn.Module):
    """GST module: a reference encoder over a mel spectrogram attends over a
    bank of learned style tokens; the resulting style embedding conditions
    the decoder (consumed by the reference demo at demo/app.py:410-427)."""

    n_tokens: int = 10
    token_dim: int = 256
    heads: int = 4
    ref_channels: tuple = (32, 32, 64, 64, 128, 128)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, ref_mel, deterministic: bool = True):
        dt = jnp.dtype(self.dtype)
        # ref_mel: (B, T, n_mels) → style embedding (B, token_dim)
        x = ref_mel[..., None].astype(dt)  # (B, T, M, 1)
        for ch in self.ref_channels:
            x = nn.Conv(
                ch, kernel_size=(3, 3), strides=(2, 2), padding="SAME", dtype=dt
            )(x)
            x = nn.GroupNorm(num_groups=1, dtype=dt)(x)
            x = nn.relu(x)
        b, t, m, c = x.shape
        x = x.reshape(b, t, m * c).astype(jnp.float32)
        x = nn.Dense(self.token_dim // 2)(x)
        # Temporal summary via a GRU-free mean+max pool (jit-friendly).
        summary = jnp.concatenate([x.mean(axis=1), x.max(axis=1)], axis=-1)
        query = nn.Dense(self.token_dim)(summary)[:, None, :]
        tokens = self.param(
            "style_tokens",
            nn.initializers.normal(0.5),
            (self.n_tokens, self.token_dim),
        )
        keys = jnp.tanh(tokens)[None, :, :].repeat(b, axis=0)
        style = nn.MultiHeadDotProductAttention(num_heads=self.heads)(
            query, keys, keys
        )
        return style[:, 0, :]
