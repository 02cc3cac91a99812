"""ITU-R BS.1770-4 integrated loudness (LKFS/LUFS) on device.

Replaces torchaudio.transforms.Loudness, which the reference uses to reject
clips quieter than −36 LUFS (everyvoice/preprocessor/preprocessor.py:131-218).

The K-weighting pre-filter is specified as two IIR biquads (a high-shelf and
a high-pass). Sequential IIRs are hostile to TPUs, so we apply the exact
biquad cascade as a truncated FIR approximation: the impulse response decays
below 1e-7 well within 4096 taps at the rates we care about, and an FIR is
one XLA convolution. Gating (400 ms blocks, 75% overlap, −70 LKFS absolute
then −10 LU relative) follows the standard.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_FIR_TAPS = 4096


def _biquad_coeffs(sample_rate: float) -> tuple:
    """BS.1770-4 pre-filter + RLB high-pass coefficients, re-derived for the
    target sample rate from the analogue prototypes (as in pyloudnorm)."""
    # Stage 1: spherical-head high shelf
    db = 3.999843853973347
    f0 = 1681.974450955533
    Q = 0.7071752369554196
    K = np.tan(np.pi * f0 / sample_rate)
    Vh = np.power(10.0, db / 20.0)
    Vb = np.power(Vh, 0.4996667741545416)
    denom = 1.0 + K / Q + K * K
    b0 = (Vh + Vb * K / Q + K * K) / denom
    b1 = 2.0 * (K * K - Vh) / denom
    b2 = (Vh - Vb * K / Q + K * K) / denom
    a1 = 2.0 * (K * K - 1.0) / denom
    a2 = (1.0 - K / Q + K * K) / denom
    shelf = ([b0, b1, b2], [1.0, a1, a2])
    # Stage 2: RLB high-pass
    f0 = 38.13547087602444
    Q = 0.5003270373238773
    K = np.tan(np.pi * f0 / sample_rate)
    denom = 1.0 + K / Q + K * K
    a1 = 2.0 * (K * K - 1.0) / denom
    a2 = (1.0 - K / Q + K * K) / denom
    hp = ([1.0, -2.0, 1.0], [1.0, a1, a2])
    return shelf, hp


@lru_cache(maxsize=8)
def _k_weighting_fir(sample_rate: int, n_taps: int = _FIR_TAPS) -> np.ndarray:
    """Truncated impulse response of the K-weighting biquad cascade."""
    from scipy.signal import lfilter

    impulse = np.zeros(n_taps)
    impulse[0] = 1.0
    (b1, a1), (b2, a2) = _biquad_coeffs(float(sample_rate))
    h = lfilter(b1, a1, impulse)
    h = lfilter(b2, a2, h)
    return h.astype(np.float32)


def integrated_loudness_host(audio: np.ndarray, sample_rate: int) -> float:
    """BS.1770-4 integrated loudness for one (T,) or (C, T) clip, computed
    on the host with the exact biquad cascade (scipy lfilter).

    The per-file validation gate in the preprocessor runs this instead of
    the device version: a scalar per arbitrary-length file is the XLA
    anti-pattern (every unique T would compile a fresh program and pay a
    host<->device round trip), while two IIR passes over a few hundred
    thousand samples cost ~1 ms in C. The device version remains the right
    tool for already-batched, bucket-padded audio."""
    from scipy.signal import lfilter

    x = np.asarray(audio, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    (b1, a1), (b2, a2) = _biquad_coeffs(float(sample_rate))
    weighted = lfilter(b2, a2, lfilter(b1, a1, x, axis=-1), axis=-1)

    block = int(round(0.400 * sample_rate))
    step = block // 4  # 75% overlap
    t = weighted.shape[-1]
    if t < block:
        weighted = np.pad(weighted, ((0, 0), (0, block - t)))
        t = block
    n_blocks = 1 + (t - block) // step
    # Mean-square per gating block without materializing the block matrix:
    # cumulative sum of squares, then windowed differences.
    csum = np.concatenate(
        [np.zeros((weighted.shape[0], 1)), np.cumsum(weighted**2, axis=-1)],
        axis=-1,
    )
    starts = np.arange(n_blocks) * step
    z = (csum[:, starts + block] - csum[:, starts]) / block  # (C, n_blocks)
    z_sum = z.sum(axis=0)  # (n_blocks,)
    loud_block = -0.691 + 10.0 * np.log10(np.maximum(z_sum, 1e-12))

    abs_mask = loud_block > -70.0
    if not abs_mask.any():
        return float("-inf")
    z_abs = z_sum[abs_mask].mean()
    gamma_rel = -0.691 + 10.0 * np.log10(max(z_abs, 1e-12)) - 10.0
    rel_mask = abs_mask & (loud_block > gamma_rel)
    if not rel_mask.any():
        return float("-inf")
    z_rel = z_sum[rel_mask].mean()
    return float(-0.691 + 10.0 * np.log10(max(z_rel, 1e-12)))


def integrated_loudness(audio: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """BS.1770-4 integrated loudness in LKFS for (..., T) mono or
    (..., C, T) multi-channel audio; returns shape (...,)."""
    if audio.ndim == 1:
        audio = audio[None, None, :]
        squeeze = 2
    elif audio.ndim == 2:
        audio = audio[None, :, :]
        squeeze = 1
    else:
        squeeze = 0

    fir = jnp.asarray(_k_weighting_fir(sample_rate))
    n_taps = fir.shape[0]
    batch, channels, t = audio.shape
    x = audio.reshape((-1, 1, t))
    # lax.conv is cross-correlation; flip the taps and left-pad so the
    # causal filter y[n] = sum_j h[j]·x[n-j] is applied causally (matching
    # lfilter/pyloudnorm transient placement), not time-reversed.
    weighted = jax.lax.conv_general_dilated(
        x, fir[::-1].reshape(1, 1, -1),
        window_strides=(1,),
        padding=[(n_taps - 1, 0)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )[..., :t].reshape(batch, channels, t)

    block = int(round(0.400 * sample_rate))
    step = block // 4  # 75% overlap
    if t < block:
        pad = block - t
        weighted = jnp.pad(weighted, ((0, 0), (0, 0), (0, pad)))
        t = block
    n_blocks = 1 + (t - block) // step
    idx = np.arange(n_blocks)[:, None] * step + np.arange(block)[None, :]
    # Mean-square energy per gating block, summed over channels
    # (G weights are 1.0 for the first 5 channels in practice).
    blocks = weighted[..., idx]  # (B, C, n_blocks, block)
    z = jnp.mean(blocks * blocks, axis=-1)  # (B, C, n_blocks)
    z_sum = jnp.sum(z, axis=1)  # (B, n_blocks)
    loud_block = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_sum, 1e-12))

    # Absolute gate at −70 LKFS
    abs_mask = loud_block > -70.0
    abs_count = jnp.maximum(jnp.sum(abs_mask, axis=-1), 1)
    z_abs = jnp.sum(jnp.where(abs_mask, z_sum, 0.0), axis=-1) / abs_count
    gamma_rel = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_abs, 1e-12)) - 10.0

    # Relative gate
    rel_mask = abs_mask & (loud_block > gamma_rel[..., None])
    rel_count = jnp.maximum(jnp.sum(rel_mask, axis=-1), 1)
    z_rel = jnp.sum(jnp.where(rel_mask, z_sum, 0.0), axis=-1) / rel_count
    lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_rel, 1e-12))
    # All-gated (silent) signals report -inf loudness
    any_blocks = jnp.any(abs_mask, axis=-1)
    lufs = jnp.where(any_blocks, lufs, -jnp.inf)

    if squeeze:  # (T,) or (C, T) input -> scalar output
        return lufs.reshape(())
    return lufs  # (B, C, T) input -> (B,)
