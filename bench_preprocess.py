"""Benchmark: batched on-device preprocessing throughput
(BASELINE config #2: spectrogram/energy/pitch extraction over a synthetic
1k-utterance corpus).

Prints ONE JSON line with utterances/second and audio-seconds/second for the
full feature pipeline (fused Pallas log-mel + energy + batched YIN F0) on one
chip. The reference's equivalent is a joblib CPU pool running torchaudio +
pyworld per file (tens of files/second on many cores).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from everyvoice_tpu.dsp import compute_energy
    from everyvoice_tpu.dsp.pitch import estimate_f0
    from everyvoice_tpu.ops.mel_pallas import fused_log_mel

    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
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
