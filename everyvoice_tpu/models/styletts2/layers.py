"""StyleTTS2 building blocks in flax
(architecture: StyleTTS2, arXiv:2306.07691, matching the hyperparameters the
reference pins in everyvoice-text-to-wav-0.5.json — style_dim 128,
hidden 512, iSTFT decoder with harmonic+noise source, AdaIN conditioning).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class AdaIN1d(nn.Module):
    """Adaptive instance norm: per-channel scale/shift predicted from style.

    Instance statistics are always reduced in float32 (matching flax's norm
    layers); only the normalized output is cast to `dtype`."""

    channels: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, style):
        # x: (B, T, C); style: (B, S)
        gamma_beta = nn.Dense(2 * self.channels)(style.astype(jnp.float32))
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=1, keepdims=True)
        var = jnp.var(x32, axis=1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        out = (1.0 + gamma[:, None, :]) * normed + beta[:, None, :]
        return out.astype(jnp.dtype(self.dtype))


class AdaINResBlock1(nn.Module):
    """HiFiGAN ResBlock1 with AdaIN + snake activations, as in the StyleTTS2
    decoder."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    # Conv compute dtype (params stay float32; AdaIN stats stay float32).
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, style):
        dt = jnp.dtype(self.dtype)
        for d in self.dilations:
            y = AdaIN1d(x.shape[-1], dtype=self.dtype)(x, style)
            alpha1 = self.param(
                f"alpha1_{d}", nn.initializers.ones, (1, 1, x.shape[-1])
            ).astype(dt)
            y = y + (1.0 / (alpha1 + 1e-9)) * jnp.sin(alpha1 * y) ** 2  # snake
            y = nn.WeightNorm(
                nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME", dtype=dt)
            )(y)
            y = AdaIN1d(self.channels, dtype=self.dtype)(y, style)
            alpha2 = self.param(
                f"alpha2_{d}", nn.initializers.ones, (1, 1, self.channels)
            ).astype(dt)
            y = y + (1.0 / (alpha2 + 1e-9)) * jnp.sin(alpha2 * y) ** 2
            y = nn.WeightNorm(
                nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=dt)
            )(y)
            x = x + y
        return x


class TextEncoder(nn.Module):
    """Symbol embedding → conv stack → BiLSTM (StyleTTS2's text encoder)."""

    n_symbols: int
    channels: int = 512
    kernel_size: int = 5
    n_convs: int = 3

    @nn.compact
    def __call__(self, tokens, mask, deterministic: bool = True):
        x = nn.Embed(self.n_symbols, self.channels)(tokens)
        x = jnp.where(mask[..., None], x, 0.0)
        for _ in range(self.n_convs):
            x = nn.WeightNorm(
                nn.Conv(self.channels, (self.kernel_size,), padding="SAME")
            )(x)
            x = nn.LayerNorm()(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(0.2)(x, deterministic=deterministic)
            x = jnp.where(mask[..., None], x, 0.0)
        lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(self.channels // 2))
        lstm_bwd = nn.RNN(nn.OptimizedLSTMCell(self.channels // 2), reverse=True)
        x = jnp.concatenate([lstm_fwd(x), lstm_bwd(x)], axis=-1)
        return jnp.where(mask[..., None], x, 0.0)


class StyleEncoder(nn.Module):
    """Mel (B, T, M) → style vector (B, style_dim): 2D conv pyramid + pooled
    linear head. Used for both acoustic and prosodic style extraction."""

    style_dim: int = 128
    base_channels: int = 64
    max_channels: int = 512
    n_downs: int = 4
    # Conv compute dtype (params stay float32; the pooled head and the
    # style vector it emits are float32).
    dtype: str = "float32"

    @nn.compact
    def __call__(self, mel):
        dt = jnp.dtype(self.dtype)
        x = mel[..., None].astype(dt)  # (B, T, M, 1)
        ch = self.base_channels
        x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt)(x)
        for _ in range(self.n_downs):
            out_ch = min(ch * 2, self.max_channels)
            y = nn.leaky_relu(x, 0.2)
            y = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt)(y)
            y = nn.leaky_relu(y, 0.2)
            y = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=dt)(y)
            skip = nn.Conv(out_ch, (1, 1), strides=(2, 2), dtype=dt)(x)
            x = (y + skip) / jnp.sqrt(2.0).astype(dt)
            ch = out_ch
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.max_channels, (3, 3), padding="SAME", dtype=dt)(x)
        # Pool and head in float32 so the style vector keeps full precision.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.style_dim)(x)


class ProsodyPredictor(nn.Module):
    """Duration + F0/energy prediction from text encodings and style
    (StyleTTS2's predictor: AdaIN-conditioned LSTM stacks)."""

    style_dim: int = 128
    hidden: int = 512
    max_dur: int = 50

    @nn.compact
    def __call__(self, text_enc, style, mask, deterministic: bool = True):
        s = jnp.tile(style[:, None, :], (1, text_enc.shape[1], 1))
        x = jnp.concatenate([text_enc, s], axis=-1)
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden // 2))
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden // 2), reverse=True)
        x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        # Duration head: logits over max_dur classes per token (the
        # reference's cross-entropy duration objective, lambda_ce 20).
        dur_logits = nn.Dense(self.max_dur)(x)
        dur_logits = jnp.where(mask[..., None], dur_logits, 0.0)

        # Prosody (F0/energy) head operates on style-conditioned features.
        y = AdaIN1d(x.shape[-1])(x, style)
        f0 = nn.Dense(1)(nn.leaky_relu(nn.Dense(self.hidden)(y), 0.2))[..., 0]
        energy = nn.Dense(1)(nn.leaky_relu(nn.Dense(self.hidden)(y), 0.2))[..., 0]
        f0 = jnp.where(mask, f0, 0.0)
        energy = jnp.where(mask, energy, 0.0)
        return dur_logits, f0, energy


def harmonic_noise_source(
    f0_frames: jnp.ndarray,  # (B, T) Hz per frame
    hop: int,
    sample_rate: int,
    n_harmonics: int = 8,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """NSF-style excitation: sum of harmonic sines where voiced plus noise
    (the source signal driving StyleTTS2's iSTFTNet decoder)."""
    b, t = f0_frames.shape
    n_samples = t * hop
    # Upsample F0 to sample rate (piecewise constant).
    f0_up = jnp.repeat(f0_frames, hop, axis=1)  # (B, n_samples)
    voiced = f0_up > 10.0
    phase = 2.0 * jnp.pi * jnp.cumsum(f0_up / sample_rate, axis=1)
    k = jnp.arange(1, n_harmonics + 1)[None, None, :]
    harmonics = jnp.sin(phase[..., None] * k)  # (B, S, H)
    amp = 0.1 * voiced[..., None]
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = 0.003 * jax.random.normal(key, (b, n_samples, 1))
    source = jnp.sum(harmonics * amp / n_harmonics, axis=-1, keepdims=True) + noise
    return source  # (B, S, 1)


class StyleDecoder(nn.Module):
    """AdaIN iSTFT-HiFiGAN decoder: (aligned text features, F0, energy,
    style) → waveform. Mirrors the schema's StyleTTS2DecoderConfig
    (upsample [8,8], gen_istft n_fft 16 hop 4)."""

    upsample_rates: Sequence[int] = (8, 8)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    style_dim: int = 128
    sample_rate: int = 22050
    hop: int = 256
    # Conv compute dtype for the upsampling/MRF stack (params stay float32;
    # the harmonic source's phase accumulation and the iSTFT head always run
    # in float32 — bf16 cumsum over thousands of samples would destroy
    # phase coherence).
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, features, f0_frames, energy, style, noise_key=None):
        # features: (B, T, C) frame-aligned; conditioning via AdaIN.
        from everyvoice_tpu.dsp.spectral import istft

        dt = jnp.dtype(self.compute_dtype)
        x = nn.WeightNorm(
            nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    dtype=dt)
        )(features.astype(dt))
        # Source excitation, downsampled back to feature resolution per
        # stage (computed in float32: sample-rate phase cumsum).
        source = harmonic_noise_source(
            f0_frames, self.hop, self.sample_rate, key=noise_key
        )[..., 0]  # (B, S)
        ch = self.upsample_initial_channel
        import math

        total_up = math.prod(self.upsample_rates)
        cur_up = 1
        for rate, kernel in zip(self.upsample_rates, self.upsample_kernel_sizes):
            ch //= 2
            cur_up *= rate
            x = nn.leaky_relu(x, 0.1)
            x = nn.WeightNorm(
                nn.ConvTranspose(ch, (kernel,), strides=(rate,),
                                 padding="SAME", dtype=dt)
            )(x)
            # Inject the downsampled source at this resolution.
            stride = self.hop // cur_up * self.gen_istft_hop_size
            # features frame rate is hop; stage sample rate = frames*cur_up
            src_len = x.shape[1]
            src_ds = jax.image.resize(
                source, (source.shape[0], src_len), method="linear"
            )
            src_feat = nn.Conv(ch, (7,), padding="SAME", dtype=dt)(
                src_ds[..., None].astype(dt)
            )
            x = x + src_feat
            acc = None
            for k, ds in zip(
                self.resblock_kernel_sizes, self.resblock_dilation_sizes
            ):
                y = AdaINResBlock1(ch, k, tuple(ds),
                                   dtype=self.compute_dtype)(x, style)
                acc = y if acc is None else acc + y
            x = acc / jnp.asarray(
                len(self.resblock_kernel_sizes), x.dtype
            )
        x = nn.leaky_relu(x, 0.1)
        n_bins = self.gen_istft_n_fft // 2 + 1
        x = nn.WeightNorm(nn.Conv(2 * n_bins, (7,), padding="SAME"))(
            x.astype(jnp.float32)
        )
        mag = jnp.exp(jnp.clip(x[..., :n_bins], -10.0, 8.0))
        phase = jnp.pi * jnp.sin(x[..., n_bins:])
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        expected = features.shape[1] * self.hop
        wav = istft(
            jnp.swapaxes(real, 1, 2), jnp.swapaxes(imag, 1, 2),
            self.gen_istft_n_fft, self.gen_istft_n_fft,
            self.gen_istft_hop_size, center=True, length=expected,
        )
        return wav


class DiffusionDenoiser(nn.Module):
    """Transformer denoiser for style-vector diffusion (EDM
    parameterization; schema: 3 layers, 8 heads, head_features 64)."""

    style_dim: int = 128
    num_layers: int = 3
    num_heads: int = 8
    head_features: int = 64
    multiplier: int = 2

    @nn.compact
    def __call__(self, noisy_style, sigma, text_embedding):
        # noisy_style: (B, S); sigma: (B,); text_embedding: (B, D)
        dim = self.num_heads * self.head_features
        # Fourier features of log-sigma.
        log_sigma = jnp.log(sigma)[:, None]
        freqs = jnp.asarray(
            np.exp(np.linspace(0, 6, 32)), dtype=noisy_style.dtype
        )[None, :]
        sigma_feat = jnp.concatenate(
            [jnp.sin(log_sigma * freqs), jnp.cos(log_sigma * freqs)], axis=-1
        )
        tokens = jnp.stack(
            [
                nn.Dense(dim)(noisy_style),
                nn.Dense(dim)(sigma_feat),
                nn.Dense(dim)(text_embedding),
            ],
            axis=1,
        )  # (B, 3, dim)
        x = tokens
        for _ in range(self.num_layers):
            y = nn.LayerNorm()(x)
            y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(y, y)
            x = x + y
            y = nn.LayerNorm()(x)
            y = nn.Dense(dim * self.multiplier)(y)
            y = nn.gelu(y)
            y = nn.Dense(dim)(y)
            x = x + y
        return nn.Dense(self.style_dim)(x[:, 0, :])
