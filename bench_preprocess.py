"""Benchmark: batched on-device preprocessing throughput
(BASELINE config #2: spectrogram/energy/pitch extraction over a synthetic
1k-utterance corpus).

Two modes, each printing ONE JSON line:

- default: the device-resident feature pipeline (fused Pallas log-mel +
  energy + batched YIN F0) — the chip's ceiling for the DSP core.
- `--end-to-end`: the REAL corpus pipeline, disk to artifacts — writes a
  synthetic wav corpus, then times `Preprocessor.preprocess()` end to end
  (audio load/filter/resample/save + text tokenization + spec/attn/energy/
  pitch artifacts + stats normalization + train/val split), including all
  host IO. This is the honest competitor to the reference's joblib CPU pool
  (reference preprocessor.py:1084-1209, tens of files/second on many cores).

Usage: python bench_preprocess.py [N_UTTS] [--end-to-end] [--cpus K]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_corpus(root, n_utts: int, sr: int = 22050, seed: int = 0):
    """Write a synthetic wav corpus + filelist.psv; returns total audio
    seconds. Utterances are 3-10 s of band-limited noise-modulated tone,
    loud enough to pass the -36 LUFS silence filter."""
    from everyvoice_tpu.dsp.audio_io import write_wav

    rng = np.random.default_rng(seed)
    wav_dir = root / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    words = ("the quick brown fox jumps over a lazy dog near my big red "
             "house and sings").split()
    rows = []
    total_seconds = 0.0
    for i in range(n_utts):
        seconds = float(rng.uniform(3.0, 10.0))
        total_seconds += seconds
        t = np.arange(int(seconds * sr)) / sr
        f0 = 110.0 * (1 + 0.3 * np.sin(2 * np.pi * 0.7 * t + i))
        tone = 0.3 * np.sin(2 * np.pi * np.cumsum(f0) / sr)
        noise = 0.05 * rng.standard_normal(t.size)
        envelope = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 1.3 * t))
        audio = ((tone + noise) * envelope).astype(np.float32)
        write_wav(wav_dir / f"utt{i:05d}.wav", audio, sr)
        text = " ".join(
            words[int(j) % len(words)]
            for j in rng.integers(0, len(words), 8)
        )
        rows.append(f"utt{i:05d}|{text}")
    with open(root / "filelist.psv", "w", encoding="utf8") as f:
        f.write("basename|text\n")
        f.write("\n".join(rows) + "\n")
    return total_seconds


#: Device-resident feature throughput (audio-sec/s) from this bench's
#: default mode, round-2 hardened measurement (BASELINE.md).
DEFAULT_DEVICE_AUDIO_RATE = 12800.0


def end_to_end(n_utts: int, cpus: int,
               device_audio_rate: float = DEFAULT_DEVICE_AUDIO_RATE,
               device_audio: bool = False) -> None:
    """Disk -> artifacts wall-clock over a real corpus via the public
    Preprocessor API (the BASELINE config #2 number)."""
    import shutil
    import tempfile
    from pathlib import Path

    from everyvoice_tpu.config import PreprocessingConfig, TextConfig
    from everyvoice_tpu.config.preprocessing_config import Dataset
    from everyvoice_tpu.models.fs2 import FastSpeech2Config
    from everyvoice_tpu.preprocessor import Preprocessor

    # Warm the device tunnel before the timed region: the first synchronous
    # device->host fetch in a process pays a one-time backend handshake
    # (measured 13-95 s on the axon relay, identical for a trivial matmul) —
    # per-process environment overhead, not pipeline cost. A long-lived
    # production process pays it once per boot.
    import jax
    import jax.numpy as jnp

    float(jax.jit(lambda x: x.sum())(jnp.ones(8)))

    root = Path(tempfile.mkdtemp(prefix="evtpu-bench-corpus-"))
    try:
        build_t0 = time.perf_counter()
        total_seconds = build_corpus(root, n_utts)
        print(
            f"# corpus: {n_utts} utts / {total_seconds:.0f} s audio "
            f"(built in {time.perf_counter() - build_t0:.1f} s)",
            file=sys.stderr,
        )
        config = FastSpeech2Config(
            contact={"contact_name": "bench", "contact_email": "b@e.ca"},
            preprocessing=PreprocessingConfig(
                save_dir=root / "preprocessed",
                source_data=[Dataset(
                    label="bench",
                    permissions_obtained=True,
                    data_dir=root / "wavs",
                    filelist=root / "filelist.psv",
                )],
            ),
            text=TextConfig(symbols={
                "letters": list("abcdefghijklmnopqrstuvwxyz"),
            }),
        )
        steps = ("audio", "text", "spec", "attn", "energy", "pitch")
        t0 = time.perf_counter()
        preprocessor = Preprocessor(config)
        preprocessor.preprocess(to_process=steps, overwrite=True, cpus=cpus,
                                device_audio=device_audio)
        elapsed = time.perf_counter() - t0
        save_dir = root / "preprocessed"
        n_specs = len(list((save_dir / "spec").glob("*.npy")))
        result = {
            "metric": ("end-to-end preprocessing (disk wavs -> artifacts + "
                       "stats + split), utterances/sec"),
            "value": round(n_utts / elapsed, 1),
            "unit": "utterances/s",
            "vs_baseline": None,
            "detail": {
                "corpus_utts": n_utts,
                "corpus_audio_seconds": round(total_seconds, 1),
                "wall_seconds": round(elapsed, 2),
                "audio_seconds_per_second": round(total_seconds / elapsed, 1),
                "spec_artifacts_written": n_specs,
                "host_cpus": cpus,
                "steps": list(steps) + ["stats", "split"],
                "step_seconds": getattr(
                    preprocessor, "last_step_seconds", {}
                ),
                "device_audio": device_audio,
                "audio_transfer_bytes": getattr(
                    preprocessor, "last_audio_transfer_bytes", None
                ),
            },
        }
        transfers = getattr(preprocessor, "last_transfer_bytes", None)
        if transfers:
            # Production projection (BASELINE.md methodology): on this dev
            # relay the feature step is transfer-bound at ~30 MB/s fetch; a
            # production host owns the accelerator over a local PCIe-class
            # link. Device compute, H2D, and D2H all overlap (the loop
            # double-buffers and PCIe is full-duplex), so the projected
            # feature-step wall is the max of the three. Compute time uses
            # the device-resident throughput from the default mode of this
            # bench (audio-sec/s on the same chip), passed via
            # --device-audio-rate (default: the round-2 hardened 12800).
            link_bw = 8e9  # bytes/s per direction, conservative PCIe gen3
            compute_s = total_seconds / device_audio_rate
            up_s = transfers["up"] / link_bw
            down_s = transfers["down"] / link_bw
            feature_wall = result["detail"]["step_seconds"].get("spec", 0.0)
            result["detail"]["feature_transfer_accounting"] = {
                "bytes_up": transfers["up"],
                "bytes_down": transfers["down"],
                "measured_feature_step_seconds": feature_wall,
                "device_compute_seconds_at_measured_rate": round(compute_s, 2),
                "projected_production_feature_seconds": round(
                    max(compute_s, up_s, down_s), 2
                ),
                "assumed_production_link_bytes_per_s": link_bw,
            }
        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from everyvoice_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from everyvoice_tpu.dsp import compute_energy
    from everyvoice_tpu.dsp.pitch import estimate_f0
    from everyvoice_tpu.ops.mel_pallas import fused_log_mel

    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("n_utts", nargs="?", type=int, default=1000)
    parser.add_argument("--end-to-end", action="store_true",
                        help="run the disk->artifacts corpus benchmark "
                        "instead of the device-resident feature chain")
    parser.add_argument("--cpus", type=int, default=4)
    parser.add_argument("--device-audio", action="store_true",
                        help="condition audio (loudness/resample/peak-norm) "
                        "on the accelerator instead of the host")
    parser.add_argument("--device-audio-rate", type=float,
                        default=DEFAULT_DEVICE_AUDIO_RATE,
                        help="device-resident feature throughput "
                        "(audio-sec/s) used for the production projection")
    opts = parser.parse_args()
    n_utts = opts.n_utts
    if opts.end_to_end:
        end_to_end(n_utts, opts.cpus,
                   device_audio_rate=opts.device_audio_rate,
                   device_audio=opts.device_audio)
        return
    sr, hop = 22050, 256
    batch = 16
    seconds_per_utt = 7.0  # typical corpus mean
    samples = int(seconds_per_utt * sr) // hop * hop

    @jax.jit
    def features(audio):
        spec = fused_log_mel(audio, sr, 1024, 1024, hop, 80, 0.0, 8000.0)
        energy = compute_energy(spec)
        f0 = estimate_f0(audio, sr, hop)
        return spec, energy, f0

    rng = np.random.default_rng(0)
    batch_audio = jnp.asarray(
        rng.standard_normal((batch, samples)).astype(np.float32) * 0.2
    )
    out = features(batch_audio)
    jax.block_until_ready(out)  # compile

    # Hardened methodology (docs/guides/tpu.md): each dispatch data-depends
    # on the previous result, the final scalar is actually fetched, and the
    # per-batch cost is the marginal slope between two chain lengths.
    def run_chain(n_batches: int) -> float:
        audio = batch_audio
        t0 = time.perf_counter()
        for _ in range(n_batches):
            spec, energy, f0 = features(audio)
            audio = batch_audio + spec[0, 0, 0] * 0
        float(spec[0, 0, 0])
        return time.perf_counter() - t0

    run_chain(2)
    n_batches = max(-(-n_utts // batch), 8)
    n_short = max(n_batches // 6, 2)
    t_short, t_long = run_chain(n_short), run_chain(n_batches)
    elapsed = t_long - t_short
    utts_per_s = (n_batches - n_short) * batch / elapsed
    result = {
        "metric": "preprocessing throughput (log-mel+energy+F0), utterances/sec/chip",
        "value": round(utts_per_s, 1),
        "unit": "utterances/s",
        "vs_baseline": None,
        "detail": {
            "corpus_size": n_batches * batch,
            "wall_seconds": round(elapsed, 3),
            "audio_seconds_per_second": round(
                utts_per_s * seconds_per_utt, 1
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
