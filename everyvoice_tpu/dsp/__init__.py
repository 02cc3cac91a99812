"""Batched on-device DSP: the TPU-native replacement for the reference's
per-file torchaudio/pyworld/sox CPU passes."""

from everyvoice_tpu.dsp.audio_io import read_wav, write_wav  # noqa: F401
from everyvoice_tpu.dsp.loudness import (  # noqa: F401
    integrated_loudness,
    integrated_loudness_host,
)
from everyvoice_tpu.dsp.pitch import estimate_f0  # noqa: F401
from everyvoice_tpu.dsp.prior import (  # noqa: F401
    BetaBinomialInterpolator,
    beta_binomial_prior_distribution,
)
from everyvoice_tpu.dsp.resample import resample, resample_host  # noqa: F401
from everyvoice_tpu.dsp.segments import get_segment, get_segments_batched  # noqa: F401
from everyvoice_tpu.dsp.sox import apply_sox_effects  # noqa: F401
from everyvoice_tpu.dsp.spectral import (  # noqa: F401
    compute_energy,
    dynamic_range_compression,
    dynamic_range_decompression,
    get_spectral_transform,
    istft,
    librosa_mel_basis,
    stft_power,
    stft_real_imag,
)
