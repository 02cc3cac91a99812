"""Fused log-mel spectrogram as a single Pallas TPU kernel.

One kernel pass per (batch, frame-block) computes, entirely in VMEM:

  frame → window → real-DFT (two MXU matmuls) → |·|² → √(+1e-9)
  → slaney-mel (MXU matmul) → log-compress

so the (n_bins × frames) power spectrum never round-trips through HBM.

Framing trick: with hop | n_fft, frame f's K = n_fft/hop hop-sized chunks
are rows f..f+K−1 of the hop-reshaped audio. The wrapper materializes the K
row-shifted views once (cheap dense slices), so every kernel operand is a
standard aligned block and Mosaic's automatic pipelining double-buffers the
HBM→VMEM streams — no gathers, no manual DMA, no layout hazards.

Semantics match the XLA path
(get_spectral_transform('mel-librosa') → dynamic_range_compression) to
float32 rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from everyvoice_tpu.dsp.spectral import (
    _rdft_basis,
    hann_window,
    librosa_mel_basis,
)

FRAME_BLOCK = 128  # frames per grid step


def _mel_kernel(
    *refs,
    hop: int,
    n_fft: int,
    clip_val: float,
):
    # refs = (part_0 ... part_{K-1}, cos, msin, melw, window, out)
    k_overlap = n_fft // hop
    parts = refs[:k_overlap]
    cos_ref, msin_ref, melw_ref, window_ref, out_ref = refs[k_overlap:]
    frames = jnp.concatenate(
        [p[0, :, :] for p in parts], axis=1
    )  # (FB, n_fft); every part is block-aligned at sublane 0
    frames = frames * window_ref[0, :][None, :]
    real = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    imag = jnp.dot(frames, msin_ref[:, :], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(real * real + imag * imag + 1e-9)
    mel = jnp.dot(mag, melw_ref[:, :], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[0, :, :] = jnp.log(jnp.maximum(mel, clip_val))


@partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "win_length", "hop_length",
                     "n_mels", "f_min", "f_max", "clip_val", "interpret"),
)
def fused_log_mel(
    audio: jnp.ndarray,        # (B, S)
    sample_rate: int = 22050,
    n_fft: int = 1024,
    win_length: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    clip_val: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused log-mel: (B, S) → (B, n_mels, S//hop + 1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_fft % hop_length == 0, "fused kernel requires hop | n_fft"
    k_overlap = n_fft // hop_length
    b, s = audio.shape
    n_frames = s // hop_length + 1  # center-padded frame count
    fb = FRAME_BLOCK
    n_blocks = -(-n_frames // fb)
    padded_frames = n_blocks * fb
    span_rows = padded_frames + k_overlap - 1
    pad_left = n_fft // 2
    total = span_rows * hop_length
    # Reflect-pad both sides (matching center=True STFT), then zero-pad the
    # remainder of the final frame block.
    x = jnp.pad(audio, ((0, 0), (pad_left, pad_left)), mode="reflect")
    pad_right = total - x.shape[1]
    x = jnp.pad(x, ((0, 0), (0, max(pad_right, 0))))[:, :total]
    rows = x.reshape(b, span_rows, hop_length)
    # K row-shifted views: part k, frame-block row f ↦ rows[f + k].
    parts = [
        rows[:, k : k + padded_frames, :] for k in range(k_overlap)
    ]

    cos_b, msin_b = _rdft_basis(n_fft)
    window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    melw = librosa_mel_basis(sample_rate, n_fft, n_mels, f_min, f_max).T
    n_bins = cos_b.shape[1]

    part_spec = pl.BlockSpec(
        (1, fb, hop_length), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(
            _mel_kernel, hop=hop_length, n_fft=n_fft, clip_val=clip_val
        ),
        grid=(b, n_blocks),
        in_specs=[part_spec] * k_overlap + [
            pl.BlockSpec((n_fft, n_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, fb, n_mels), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, padded_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(
        *parts,
        jnp.asarray(cos_b),
        jnp.asarray(msin_b),
        jnp.asarray(melw),
        jnp.asarray(window)[None, :],
    )
    # (B, frames, mels) → (B, mels, frames), trimmed to the true frame count.
    return jnp.swapaxes(out[:, :n_frames, :], 1, 2)
