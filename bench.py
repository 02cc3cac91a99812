"""Benchmark: batched text→wav synthesis throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures real-time factor (seconds of synthesized audio per wall-clock
second per chip) for the flagship serving path — FastSpeech2 (default
4-layer/256-dim Conformer config) + HiFiGAN V1 — at 22.05 kHz.
The reference publishes no numbers (BASELINE.md); the north-star target is
≥10× real time per chip, so vs_baseline = value / 10.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from everyvoice_tpu.models.fs2.model import FastSpeech2
    from everyvoice_tpu.models.hifigan.model import HiFiGANGenerator

    # Default batch 128: the largest that fits v5e HBM (measured sweep
    # 16→1244x, 64→1675x, 128→2416x realtime; 160+ OOMs at ~27G/15.75G).
    # Single-utterance p50 latency is batch-independent (~22 ms).
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n_text = 128
    max_frames = 1000  # the reference's max_length (≈11.6 s of audio)
    sample_rate = 22050
    hop = 256

    # Serving config: bf16 conv/matmul compute for both stages (params f32),
    # as in the Synthesizer's deployment default on TPU.
    fs2 = FastSpeech2(
        n_symbols=100, max_frames=max_frames, compute_dtype="bfloat16"
    )
    gen = HiFiGANGenerator(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (batch, n_text), 2, 100)
    lengths = jnp.full((batch,), n_text, jnp.int32)
    fs2_params = jax.jit(fs2.init)({"params": rng, "dropout": rng}, text, lengths)
    gen_params = jax.jit(gen.init)(rng, jnp.zeros((1, max_frames, 80)))

    # Calibrate the duration head so synthesized utterances fill the frame
    # budget (~7.5 frames/token ≈ 960 of 1000 frames), making the quoted RTF
    # reflect full-length utterances rather than mostly-padding compute.
    import flax

    probe = jax.jit(lambda p, t, l: fs2.apply(p, t, l))(
        fs2_params, text, lengths
    )
    measured = float(np.mean(np.asarray(probe["log_duration_prediction"])))
    target = float(np.log1p(960.0 / n_text))
    fs2_params = flax.core.unfreeze(fs2_params)
    bias = fs2_params["params"]["duration_predictor"]["Dense_0"]["bias"]
    fs2_params["params"]["duration_predictor"]["Dense_0"]["bias"] = (
        bias + (target - measured)
    )

    # Params are jit arguments (not closure constants) so the compiled
    # executable stays small and the persistent compile cache is effective
    # across processes.
    @jax.jit
    def synthesize_p(fp, gp, text, lengths):
        out = fs2.apply(fp, text, lengths)
        wav = gen.apply(gp, out["postnet_mel"])
        return wav, out["predicted_frame_lengths"]

    import functools

    synthesize = functools.partial(synthesize_p, fs2_params, gen_params)

    # Warmup/compile
    wav, frames = synthesize(text, lengths)
    wav.block_until_ready()
    frames_per_utt = np.minimum(np.asarray(frames), max_frames)
    audio_seconds = float(frames_per_utt.sum() * hop / sample_rate)

    # Timing methodology (docs/guides/tpu.md "Benchmarking on shared dev
    # relays"): each dispatch consumes a batch that data-depends on the
    # previous result (so nothing can be acknowledged early or deduped), the
    # final scalar is actually fetched to the host, and the per-batch cost is
    # the marginal slope between a short and a long chain — which cancels the
    # fixed dispatch/fetch overhead of the transport.
    def run_chain(iters: int) -> float:
        tx = text
        t0 = time.perf_counter()
        for _ in range(iters):
            w, fr = synthesize(tx, lengths)
            tx = text + (w[0, 0] * 0).astype(jnp.int32)
        float(w[0, 0])
        return time.perf_counter() - t0

    run_chain(2)  # warm both programs (synthesize + the chaining add)
    n_short, n_long = 4, 24
    t_short, t_long = run_chain(n_short), run_chain(n_long)
    elapsed_per_batch = (t_long - t_short) / (n_long - n_short)

    rtf = audio_seconds / elapsed_per_batch

    # p50-equivalent per-utterance text→wav latency (batch of 1), same
    # chained marginal-slope methodology.
    one_text = text[:1]
    one_len = lengths[:1]

    def run_chain_one(iters: int) -> float:
        tx = one_text
        t0 = time.perf_counter()
        for _ in range(iters):
            w, _ = synthesize(tx, one_len)
            tx = one_text + (w[0, 0] * 0).astype(jnp.int32)
        float(w[0, 0])
        return time.perf_counter() - t0

    run_chain_one(2)
    p50_ms = float(
        (run_chain_one(24) - run_chain_one(4)) / 20.0 * 1000
    )

    # MFU: XLA's own flop count for the compiled serving program over the
    # measured marginal step time, against the chip's bf16 peak.
    from everyvoice_tpu.utils.flops import compiled_flops, mfu

    flops = compiled_flops(synthesize_p, fs2_params, gen_params, text, lengths)
    utilization = mfu(flops, elapsed_per_batch, jax.devices()[0])

    result = {
        "metric": "synthesized audio sec/sec/chip (RTF), FastSpeech2+HiFiGAN batched text-to-wav",
        "value": round(rtf, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtf / 10.0, 3),
        "detail": {
            "batch": batch,
            "audio_seconds_per_batch": round(audio_seconds, 2),
            "wall_seconds_per_batch": round(elapsed_per_batch, 4),
            "p50_single_utterance_latency_ms": round(p50_ms, 2),
            "tflops_per_batch": (
                round(flops / 1e12, 3) if flops else None
            ),
            "mfu": round(utilization, 4) if utilization else None,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
