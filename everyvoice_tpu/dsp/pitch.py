"""Batched fundamental-frequency (F0) estimation on TPU.

Replaces the reference's per-file pyworld DIO+StoneMask CPU calls
(everyvoice/preprocessor/preprocessor.py:244-285). The estimator is a
batched normalized-difference (YIN/CMNDF) tracker:

- per-frame difference function computed from autocorrelation, which is a
  single MXU matmul / FFT over all frames of all utterances at once,
- cumulative-mean normalization + absolute-threshold lag pick,
- parabolic sub-sample refinement (the role StoneMask plays for DIO),
- voicing decision, then the reference's zero→NaN→linear-interpolation
  post-processing, re-expressed as fixed-shape cummax/gather ops so the
  whole pipeline jits.

Like the reference, output frames are z-score normalized later by corpus
statistics, so what matters is contour fidelity and voicing decisions, both
of which this estimator matches closely on speech.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

F0_FLOOR = 71.0   # pyworld default f0_floor (Hz)
F0_CEIL = 800.0   # pyworld default f0_ceil (Hz)
CMNDF_THRESHOLD = 0.1
VOICING_THRESHOLD = 0.45


def _difference_function(frames: jnp.ndarray, tau_max: int) -> jnp.ndarray:
    """d(τ) for τ in [0, tau_max) for each frame of shape (..., W + tau_max)."""
    w = frames.shape[-1] - tau_max
    # Cumulative energies: e(τ) = Σ_{j=τ}^{τ+w-1} x_j²
    sq = frames * frames
    csum = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros_like(csum[..., :1])
    csum = jnp.concatenate([zero, csum], axis=-1)
    idx = np.arange(tau_max)
    e_tau = csum[..., idx + w] - csum[..., idx]  # energy of x[τ:τ+w]
    e_0 = (csum[..., w] - csum[..., 0])[..., None]
    # Cross term Σ_{j=0}^{w-1} x_j x_{j+τ} for all τ at once, as a linear
    # correlation of the frame head x[0:w] against the whole segment. Zero
    # padding to n_fft ≥ seg guarantees no circular wrap-around.
    n_fft = int(2 ** np.ceil(np.log2(frames.shape[-1] + 1)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    spec_head = jnp.fft.rfft(
        jnp.where(jnp.arange(frames.shape[-1]) < w, frames, 0.0),
        n=n_fft,
        axis=-1,
    )
    cross = jnp.fft.irfft(jnp.conj(spec_head) * spec, n=n_fft, axis=-1)[
        ..., :tau_max
    ]
    # d(τ) = e(0) + e(τ) − 2·cross(τ)
    return e_0 + e_tau - 2.0 * cross


def _cmndf(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative-mean-normalized difference function."""
    tau = jnp.arange(d.shape[-1], dtype=d.dtype)
    csum = jnp.cumsum(d, axis=-1)
    out = d * tau / jnp.maximum(csum, 1e-9)
    return out.at[..., 0].set(1.0)


def _pick_lag(cmndf: jnp.ndarray, tau_min: int, tau_max: int) -> tuple:
    """First lag under threshold (else global min), with parabolic refine."""
    tau_idx = jnp.arange(cmndf.shape[-1])
    valid = (tau_idx >= tau_min) & (tau_idx < tau_max - 1)
    masked = jnp.where(valid, cmndf, jnp.inf)
    under = masked < CMNDF_THRESHOLD
    any_under = jnp.any(under, axis=-1)
    first_under = jnp.argmax(under, axis=-1)
    global_min = jnp.argmin(masked, axis=-1)
    # After the first under-threshold lag, walk to the local minimum: take
    # the min over a small forward window starting at first_under.
    base = jnp.where(any_under, first_under, global_min)
    WINDOW = 8
    offs = np.arange(WINDOW)
    cand = jnp.clip(base[..., None] + offs, 0, cmndf.shape[-1] - 1)
    cand_vals = jnp.take_along_axis(masked, cand, axis=-1)
    best_off = jnp.argmin(cand_vals, axis=-1)
    tau_star = jnp.take_along_axis(cand, best_off[..., None], axis=-1)[..., 0]

    # Parabolic interpolation around tau_star (sub-sample period estimate).
    tm1 = jnp.clip(tau_star - 1, 0, cmndf.shape[-1] - 1)
    tp1 = jnp.clip(tau_star + 1, 0, cmndf.shape[-1] - 1)
    y0 = jnp.take_along_axis(cmndf, tm1[..., None], axis=-1)[..., 0]
    y1 = jnp.take_along_axis(cmndf, tau_star[..., None], axis=-1)[..., 0]
    y2 = jnp.take_along_axis(cmndf, tp1[..., None], axis=-1)[..., 0]
    denom = y0 - 2.0 * y1 + y2
    # Sign-preserving guard: clamping with maximum() would flip the shift's
    # sign wherever the local curvature is negative.
    safe_denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    shift = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (y0 - y2) / safe_denom, 0.0
    )
    shift = jnp.clip(shift, -0.5, 0.5)
    refined_tau = tau_star.astype(jnp.float32) + shift
    dip = y1
    return refined_tau, dip


def _interpolate_unvoiced(f0: jnp.ndarray, voiced: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation across unvoiced gaps with edge extension —
    fixed-shape equivalent of the reference's np.interp post-processing
    (preprocessor.py:235-242). f0, voiced: (..., F)."""
    n = f0.shape[-1]
    idx = jnp.arange(n)
    # Index of the previous voiced frame (or -1), via cummax.
    prev = jax.lax.cummax(jnp.where(voiced, idx, -1), axis=f0.ndim - 1)
    # Index of the next voiced frame (or n), via reverse cummin.
    nxt = jnp.flip(
        jax.lax.cummin(
            jnp.flip(jnp.where(voiced, idx, n), axis=-1), axis=f0.ndim - 1
        ),
        axis=-1,
    )
    prev_c = jnp.clip(prev, 0, n - 1)
    nxt_c = jnp.clip(nxt, 0, n - 1)
    f_prev = jnp.take_along_axis(f0, prev_c, axis=-1)
    f_next = jnp.take_along_axis(f0, nxt_c, axis=-1)
    # Edge handling: before the first voiced frame use f_next, after the
    # last use f_prev (np.interp's constant extrapolation).
    has_prev = prev >= 0
    has_next = nxt < n
    span = jnp.maximum(nxt - prev, 1)
    w_next = (idx - prev) / span
    interp = f_prev * (1.0 - w_next) + f_next * w_next
    interp = jnp.where(has_prev & has_next, interp, 0.0)
    interp = jnp.where(has_prev & ~has_next, f_prev, interp)
    interp = jnp.where(~has_prev & has_next, f_next, interp)
    out = jnp.where(voiced, f0, interp)
    # No voiced frames at all -> zeros (reference sets NaN->0).
    any_voiced = jnp.any(voiced, axis=-1, keepdims=True)
    return jnp.where(any_voiced, out, 0.0)


@partial(jax.jit, static_argnames=("sample_rate", "hop_length", "interpolate"))
def estimate_f0(
    audio: jnp.ndarray,
    sample_rate: int,
    hop_length: int,
    interpolate: bool = True,
) -> jnp.ndarray:
    """Batched F0 track for (..., T) audio → (..., T//hop + 1) Hz values.

    Frame count matches the spectral frame count (center-padded STFT), so
    pitch rows align with mel rows as the reference requires
    (preprocessor.py:653-670).
    """
    tau_min = max(2, int(sample_rate / F0_CEIL))
    tau_max = int(sample_rate / F0_FLOOR) + 2
    w = 2 * tau_max  # analysis span: two periods of the lowest pitch
    seg = w + tau_max

    batch_shape = audio.shape[:-1]
    t = audio.shape[-1]
    n_frames = t // hop_length + 1
    x = audio.reshape((-1, t))
    pad = seg // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad + seg)))
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(seg)[None, :]
    frames = xp[:, idx]  # (B, F, seg)
    # Remove DC per frame (biases the difference function).
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    d = _difference_function(frames, tau_max)
    cm = _cmndf(d)
    refined_tau, dip = _pick_lag(cm, tau_min, tau_max)
    f0 = sample_rate / jnp.maximum(refined_tau, 1.0)
    # Frame energy gate plus CMNDF dip depth for voicing.
    energy = jnp.mean(frames * frames, axis=-1)
    peak_energy = jnp.max(energy, axis=-1, keepdims=True)
    voiced = (
        (dip < VOICING_THRESHOLD)
        & (f0 >= F0_FLOOR)
        & (f0 <= F0_CEIL)
        & (energy > 1e-6 * jnp.maximum(peak_energy, 1e-12))
    )
    f0 = jnp.where(voiced, f0, 0.0)
    if interpolate:
        f0 = _interpolate_unvoiced(f0, voiced)
    return f0.reshape(batch_shape + (n_frames,))
