"""Objective evaluation of synthesized audio
(role parity: everyvoice/evaluation.py — TorchAudio-SQUIM STOI/PESQ/SI-SDR).

The reference downloads pretrained SQUIM models from torchaudio; this
environment has no torchaudio and no network egress, so evaluation is split:

- `si_sdr` / `stoi_proxy`: intrusive metrics computed natively in numpy/jax
  when a reference wav is available (SI-SDR exactly per its definition; the
  STOI proxy follows the one-third-octave short-time correlation structure
  of STOI).
- `signal_report`: reference-free diagnostics (duration, integrated loudness,
  clipping rate, silence ratio, spectral flatness).
- `try_squim_objective`: when torchaudio (and its cached pretrained
  weights) are importable, the reference's exact SQUIM objective model runs
  and adds reference-free `squim_stoi`/`squim_pesq`/`squim_si_sdr` scores.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def resample_to_16k(audio: np.ndarray, sr: int) -> np.ndarray:
    if sr == 16000:
        return audio
    import jax.numpy as jnp

    from everyvoice_tpu.dsp import resample

    return np.asarray(resample(jnp.asarray(audio), sr, 16000))


def si_sdr(estimate: np.ndarray, reference: np.ndarray) -> float:
    """Scale-invariant signal-to-distortion ratio (dB)."""
    n = min(len(estimate), len(reference))
    est, ref = estimate[:n].astype(np.float64), reference[:n].astype(np.float64)
    est = est - est.mean()
    ref = ref - ref.mean()
    alpha = np.dot(est, ref) / max(np.dot(ref, ref), 1e-12)
    target = alpha * ref
    noise = est - target
    return float(
        10.0 * np.log10(max(np.dot(target, target), 1e-12) /
                        max(np.dot(noise, noise), 1e-12))
    )


def _third_octave_bands(sr: int, n_fft: int, n_bands: int = 15,
                        f_start: float = 150.0):
    cf = f_start * (2.0 ** (np.arange(n_bands) / 3.0))
    lo = cf / (2 ** (1 / 6))
    hi = cf * (2 ** (1 / 6))
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    bands = np.zeros((n_bands, len(freqs)), np.float32)
    for i in range(n_bands):
        bands[i, (freqs >= lo[i]) & (freqs < hi[i])] = 1.0
    return bands


def stoi_proxy(estimate: np.ndarray, reference: np.ndarray, sr: int) -> float:
    """Short-time objective intelligibility, computed per the published STOI
    structure (10 kHz resample → 1/3-octave bands → 384 ms segment
    correlations). Values correlate strongly with canonical STOI."""
    import jax.numpy as jnp

    from everyvoice_tpu.dsp import resample, stft_power

    target_sr = 10000
    n = min(len(estimate), len(reference))
    est = np.asarray(resample(jnp.asarray(estimate[:n]), sr, target_sr))
    ref = np.asarray(resample(jnp.asarray(reference[:n]), sr, target_sr))
    n_fft, hop = 512, 256
    spec_e = np.sqrt(np.asarray(stft_power(jnp.asarray(est), n_fft, n_fft, hop)) + 1e-12)
    spec_r = np.sqrt(np.asarray(stft_power(jnp.asarray(ref), n_fft, n_fft, hop)) + 1e-12)
    bands = _third_octave_bands(target_sr, n_fft)
    be = np.sqrt(bands @ (spec_e**2) + 1e-12)  # (bands, frames)
    br = np.sqrt(bands @ (spec_r**2) + 1e-12)
    seg = 30  # ~384 ms at 10 kHz / hop 256
    if be.shape[1] < seg:
        seg = be.shape[1]
    corrs = []
    for t in range(seg, be.shape[1] + 1):
        x = br[:, t - seg : t]
        y = be[:, t - seg : t]
        # normalize and clip per STOI
        alpha = np.sqrt((x**2).sum(1, keepdims=True) /
                        np.maximum((y**2).sum(1, keepdims=True), 1e-12))
        y_n = np.minimum(alpha * y, x * (1 + 10 ** (15 / 20)))
        xm = x - x.mean(1, keepdims=True)
        ym = y_n - y_n.mean(1, keepdims=True)
        c = (xm * ym).sum(1) / np.maximum(
            np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1), 1e-12
        )
        corrs.append(c)
    return float(np.mean(corrs)) if corrs else 0.0


def signal_report(audio: np.ndarray, sr: int) -> dict:
    import jax.numpy as jnp

    from everyvoice_tpu.dsp import integrated_loudness, stft_power

    lufs = float(integrated_loudness(jnp.asarray(audio), sr))
    power = np.asarray(stft_power(jnp.asarray(audio), 1024, 1024, 256)) + 1e-12
    flatness = float(
        np.mean(np.exp(np.mean(np.log(power), axis=0)) / np.mean(power, axis=0))
    )
    return {
        "duration_s": round(len(audio) / sr, 3),
        "loudness_lufs": round(lufs, 2) if np.isfinite(lufs) else None,
        "clipping_rate": float(np.mean(np.abs(audio) > 0.999)),
        "silence_ratio": float(np.mean(np.abs(audio) < 1e-4)),
        "spectral_flatness": round(flatness, 4),
    }


_SQUIM_MODEL = None


def try_squim_objective(audio_16k: np.ndarray) -> Optional[dict]:
    """True TorchAudio-SQUIM objective scores (STOI/PESQ/SI-SDR,
    reference-free) when torchaudio and its pretrained weights are present
    locally — the exact models the reference uses (evaluation.py:5-28).
    Returns None in environments without torchaudio/weights (no egress)."""
    global _SQUIM_MODEL
    if _SQUIM_MODEL is False:
        return None
    if _SQUIM_MODEL is None:
        try:
            import torch  # noqa: F401
            from torchaudio.pipelines import SQUIM_OBJECTIVE

            _SQUIM_MODEL = SQUIM_OBJECTIVE.get_model().eval()
        except Exception:
            # Only a failed *load* disables the metric for the run; per-file
            # inference errors below must not poison the remaining files.
            _SQUIM_MODEL = False
            return None
    try:
        import torch

        with torch.no_grad():
            wav = torch.from_numpy(
                np.ascontiguousarray(audio_16k, np.float32)
            )[None, :]
            stoi_v, pesq_v, sdr_v = _SQUIM_MODEL(wav)
        return {
            "squim_stoi": round(float(stoi_v[0]), 4),
            "squim_pesq": round(float(pesq_v[0]), 3),
            "squim_si_sdr": round(float(sdr_v[0]), 3),
        }
    except Exception:
        return None


_SQUIM_SUBJECTIVE = None


def try_squim_subjective(
    audio_16k: np.ndarray, non_matching_references_16k: list
) -> Optional[float]:
    """Subjective MOS via TorchAudio SQUIM-Subjective against non-matching
    reference recordings, averaged across references — the reference's
    subjective path (everyvoice/evaluation.py:18-28,58-67). Returns None
    when torchaudio/weights are unavailable (no egress here)."""
    global _SQUIM_SUBJECTIVE
    if _SQUIM_SUBJECTIVE is False or not non_matching_references_16k:
        return None
    if _SQUIM_SUBJECTIVE is None:
        try:
            from torchaudio.pipelines import SQUIM_SUBJECTIVE

            _SQUIM_SUBJECTIVE = SQUIM_SUBJECTIVE.get_model().eval()
        except Exception:
            # A failed load disables MOS for the run; per-file inference
            # errors below must not.
            _SQUIM_SUBJECTIVE = False
            return None
    try:
        import torch

        wav = torch.from_numpy(
            np.ascontiguousarray(audio_16k, np.float32)
        )[None, :]
        scores = []
        with torch.no_grad():
            for nmr in non_matching_references_16k:
                nmr_t = torch.from_numpy(
                    np.ascontiguousarray(nmr, np.float32)
                )[None, :]
                scores.append(float(_SQUIM_SUBJECTIVE(wav, nmr_t)[0]))
        return round(float(np.mean(scores)), 3)
    except Exception:
        return None


def calculate_objective_metrics_from_single_path(
    wav_path: Path | str,
    reference_path: Optional[Path | str] = None,
    non_matching_references_16k: Optional[list] = None,
) -> dict:
    from everyvoice_tpu.dsp import read_wav

    audio, sr = read_wav(wav_path)
    mono = audio.mean(axis=0)
    metrics = {"file": str(wav_path)}
    metrics.update(signal_report(mono, sr))
    est_mono = resample_to_16k(mono, sr)
    quality_metrics = False
    squim = try_squim_objective(est_mono)
    if squim is not None:
        metrics.update(squim)
        quality_metrics = True
    mos = try_squim_subjective(est_mono, non_matching_references_16k or [])
    if mos is not None:
        metrics["squim_mos"] = mos
        quality_metrics = True
    if reference_path is not None:
        ref_audio, ref_sr = read_wav(reference_path)
        ref_mono = resample_to_16k(ref_audio.mean(axis=0), ref_sr)
        metrics["si_sdr"] = round(si_sdr(est_mono, ref_mono), 3)
        metrics["stoi"] = round(stoi_proxy(est_mono, ref_mono, 16000), 4)
        quality_metrics = True
    metrics["has_quality_metrics"] = quality_metrics
    return metrics


def load_non_matching_references(
    nmr_dir: Optional[Path | str], limit: int = 5
) -> list:
    """Load up to `limit` 16 kHz mono non-matching reference recordings for
    subjective MOS estimation. Accepts a directory of wavs or a single wav
    (the reference's -r/--non-matching-reference takes one file,
    everyvoice/cli.py:264-272)."""
    if nmr_dir is None:
        return []
    from everyvoice_tpu.dsp import read_wav

    nmr_dir = Path(nmr_dir)
    paths = [nmr_dir] if nmr_dir.is_file() else sorted(nmr_dir.glob("**/*.wav"))
    refs = []
    for wav_path in paths[:limit]:
        audio, sr = read_wav(wav_path)
        refs.append(resample_to_16k(audio.mean(axis=0), sr))
    return refs


def evaluate_directory(
    wav_dir: Path | str,
    reference_dir: Optional[Path | str] = None,
    non_matching_reference_dir: Optional[Path | str] = None,
) -> list:
    wav_dir = Path(wav_dir)
    nmr = load_non_matching_references(non_matching_reference_dir)
    results = []
    # A single wav file works too (the reference's -f/--audio-file mode).
    wavs = [wav_dir] if wav_dir.is_file() else sorted(wav_dir.glob("**/*.wav"))
    for wav_path in wavs:
        ref = None
        if reference_dir is not None:
            candidate = Path(reference_dir) / wav_path.name
            ref = candidate if candidate.exists() else None
        results.append(
            calculate_objective_metrics_from_single_path(
                wav_path, ref, non_matching_references_16k=nmr
            )
        )
    return results
