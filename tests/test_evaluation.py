"""Evaluation metric tests (model: reference everyvoice/tests test coverage
for evaluation.py, adapted to the native SI-SDR/STOI implementations)."""

import numpy as np
import pytest

from everyvoice_tpu.dsp import write_wav
from everyvoice_tpu.evaluation import (
    calculate_objective_metrics_from_single_path,
    evaluate_directory,
    si_sdr,
    signal_report,
    stoi_proxy,
)

SR = 22050


@pytest.fixture
def speech_like():
    rng = np.random.default_rng(0)
    t = np.arange(SR * 2) / SR
    f0 = 150 + 30 * np.sin(2 * np.pi * 2 * t)
    sig = np.sin(2 * np.pi * np.cumsum(f0) / SR)
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    return (0.4 * sig * envelope + 0.01 * rng.standard_normal(len(t))).astype(
        np.float32
    )


class TestSiSdr:
    def test_identical_is_high(self, speech_like):
        assert si_sdr(speech_like, speech_like) > 60

    def test_scale_invariant(self, speech_like):
        assert si_sdr(0.3 * speech_like, speech_like) > 60

    def test_noise_lowers_score(self, speech_like):
        rng = np.random.default_rng(1)
        noisy = speech_like + 0.1 * rng.standard_normal(len(speech_like)).astype(
            np.float32
        )
        clean_score = si_sdr(speech_like, speech_like)
        noisy_score = si_sdr(noisy, speech_like)
        assert noisy_score < clean_score
        assert 2 < noisy_score < 30


class TestStoi:
    def test_identical_near_one(self, speech_like):
        assert stoi_proxy(speech_like, speech_like, SR) > 0.99

    def test_noise_degrades(self, speech_like):
        rng = np.random.default_rng(2)
        noisy = (speech_like + 0.5 * rng.standard_normal(len(speech_like))).astype(
            np.float32
        )
        assert stoi_proxy(noisy, speech_like, SR) < stoi_proxy(
            speech_like, speech_like, SR
        )


class TestReports:
    def test_signal_report_fields(self, speech_like):
        report = signal_report(speech_like, SR)
        assert report["duration_s"] == 2.0
        assert report["clipping_rate"] == 0.0
        assert report["loudness_lufs"] < 0

    def test_directory_evaluation(self, tmp_path, speech_like):
        ref_dir = tmp_path / "ref"
        est_dir = tmp_path / "est"
        ref_dir.mkdir()
        est_dir.mkdir()
        write_wav(ref_dir / "a.wav", speech_like, SR)
        write_wav(est_dir / "a.wav", speech_like * 0.5, SR)
        results = evaluate_directory(est_dir, reference_dir=ref_dir)
        assert len(results) == 1
        assert results[0]["si_sdr"] > 40
        assert "stoi" in results[0]

    def test_single_path_without_reference(self, tmp_path, speech_like):
        write_wav(tmp_path / "x.wav", speech_like, SR)
        metrics = calculate_objective_metrics_from_single_path(tmp_path / "x.wav")
        assert "si_sdr" not in metrics
        assert metrics["duration_s"] == 2.0


class TestSingleFile:
    def test_evaluate_accepts_one_wav(self, tmp_path):
        import jax.numpy as jnp

        from everyvoice_tpu.dsp import write_wav
        from everyvoice_tpu.evaluation import evaluate_directory

        t = np.arange(22050) / 22050
        wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        path = tmp_path / "one.wav"
        write_wav(path, jnp.asarray(wav), 22050)
        results = evaluate_directory(path)
        assert len(results) == 1
        assert results[0]["duration_s"] == 1.0
