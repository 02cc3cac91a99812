"""Pallas kernel tests (interpret mode on CPU; compiled path covered by the
TPU benchmark)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from everyvoice_tpu.dsp.spectral import (
    dynamic_range_compression,
    get_spectral_transform,
)
from everyvoice_tpu.ops.mel_pallas import fused_log_mel

SR = 22050


class TestFusedLogMel:
    @pytest.mark.parametrize("n_samples", [256 * 100, 256 * 200])
    def test_matches_xla_path(self, n_samples):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, n_samples)) * 0.3).astype(np.float32)
        mel_fn = get_spectral_transform(
            "mel-librosa", 1024, 1024, 256, SR, 80, 0, 8000
        )
        ref = np.asarray(
            jax.jit(lambda a: dynamic_range_compression(mel_fn(a)))(
                jnp.asarray(x)
            )
        )
        out = np.asarray(fused_log_mel(jnp.asarray(x), interpret=True))
        assert out.shape == ref.shape == (2, 80, n_samples // 256 + 1)
        assert np.abs(out - ref).max() < 1e-4

    def test_speech_like_signal(self):
        t = np.arange(SR) / SR
        x = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
        x = x[:, : (x.shape[1] // 256) * 256]
        mel_fn = get_spectral_transform(
            "mel-librosa", 1024, 1024, 256, SR, 80, 0, 8000
        )
        ref = np.asarray(dynamic_range_compression(mel_fn(jnp.asarray(x))))
        out = np.asarray(fused_log_mel(jnp.asarray(x), interpret=True))
        assert np.abs(out - ref).max() < 1e-4
