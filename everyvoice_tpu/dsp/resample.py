"""Polyphase sinc resampling as an XLA convolution.

Replaces torchaudio.functional.resample (used by the reference at
everyvoice/preprocessor/preprocessor.py:177 for input/output-rate
conversion). The Kaiser-windowed sinc filter is built host-side in numpy and
applied with lax.conv_general_dilated using input dilation = upsample factor,
stride = downsample factor — the textbook polyphase structure expressed as a
single XLA op, which Mosaic lowers to MXU-friendly convolutions on TPU.
"""

from __future__ import annotations

from functools import lru_cache
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _sinc_kernel(
    up: int, down: int, lowpass_filter_width: int = 6, rolloff: float = 0.99,
    beta: float = 14.769656459379492,
) -> np.ndarray:
    """Kaiser-windowed sinc anti-aliasing/interpolation kernel for a rational
    rate change, designed at the intermediate rate ``orig·up``.

    The cutoff sits at ``rolloff · min(orig, new)/2`` Hz, i.e. a normalized
    frequency of ``rolloff / (2·max(up, down))`` cycles/sample at the
    intermediate rate."""
    f_c = rolloff / (2.0 * max(up, down))
    half_width = int(np.ceil(lowpass_filter_width / (2.0 * f_c)))
    t = np.arange(-half_width, half_width + 1, dtype=np.float64)
    sinc = 2.0 * f_c * np.sinc(2.0 * f_c * t)
    window_arg = t / half_width
    window = np.i0(beta * np.sqrt(np.clip(1 - window_arg**2, 0, None))) / np.i0(beta)
    return (sinc * window).astype(np.float32)


def resample_host(
    audio: np.ndarray, orig_freq: int, new_freq: int,
    lowpass_filter_width: int = 6, rolloff: float = 0.99,
) -> np.ndarray:
    """Numpy twin of :func:`resample` (same kernel, same trimming — tested
    for exact agreement). Used on the per-file preprocessing path, where a
    single arbitrary-length clip per call would force one fresh XLA compile
    per unique file length; scipy's polyphase C kernel is the right tool
    at that granularity."""
    if orig_freq == new_freq:
        return np.asarray(audio)
    from scipy.signal import upfirdn

    g = gcd(int(orig_freq), int(new_freq))
    up = new_freq // g
    down = orig_freq // g
    kernel = _sinc_kernel(up, down, lowpass_filter_width, rolloff) * up
    half = (len(kernel) - 1) // 2
    x = np.asarray(audio, dtype=np.float32)
    t_in = x.shape[-1]
    out_len = -(-t_in * up // down)  # ceil
    # upfirdn(h, x, up, 1) is full cross-correlation of the zero-stuffed
    # signal; the jitted path's (half, half+down) padding corresponds to
    # sampling it at n*down + half (the kernel is symmetric).
    y = upfirdn(kernel, x, up=up, down=1, axis=-1)
    y = y[..., half : half + out_len * down : down]
    if y.shape[-1] < out_len:  # upfirdn trims trailing flush samples
        pad = [(0, 0)] * (y.ndim - 1) + [(0, out_len - y.shape[-1])]
        y = np.pad(y, pad)
    return y[..., :out_len].astype(np.float32)


def resample(
    audio: jnp.ndarray, orig_freq: int, new_freq: int,
    lowpass_filter_width: int = 6, rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample (..., T) audio from orig_freq to new_freq.

    Output length is ceil(T * new / orig), matching torchaudio."""
    if orig_freq == new_freq:
        return audio
    g = gcd(int(orig_freq), int(new_freq))
    up = new_freq // g
    down = orig_freq // g
    kernel = _sinc_kernel(up, down, lowpass_filter_width, rolloff) * up
    half = (len(kernel) - 1) // 2

    batch_shape = audio.shape[:-1]
    t_in = audio.shape[-1]
    x = audio.reshape((-1, 1, t_in))  # NCW

    out_len = -(-t_in * up // down)  # ceil
    # lax.conv with lhs_dilation=up implements zero-stuffed upsampling; the
    # kernel then interpolates, and window_strides=down decimates.
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel).reshape(1, 1, -1),
        window_strides=(down,),
        padding=[(half, half + down)],
        lhs_dilation=(up,),
        rhs_dilation=(1,),
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = y[..., :out_len]
    return y.reshape(batch_shape + (y.shape[-1],))
