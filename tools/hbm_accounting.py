"""HBM accounting for the serving path: why batch 128 is the ceiling.

Round-5 verdict item #6: the batch-160 OOM was a one-liner; this makes it
a measurement. For each batch size the full text→wav serving program
(bench.py's exact FastSpeech2+HiFiGAN bf16 configuration) is lowered and
compiled, and XLA's own memory analysis is reported: argument bytes
(weights + inputs), output bytes, and peak temp bytes (activations). For
batch sizes that exceed HBM, the compiler's OOM diagnostic is captured
instead. Also evaluates the two candidate remedies:

- donate_wav: request donation of the text/lengths input buffers
  (negligible by construction — inputs are ~100 KB; reported to close the
  question with a number).
- bf16 outputs: return the waveform in bf16, halving the output buffer.

Usage: python tools/hbm_accounting.py [BATCHES...]   (default 64 128 144 160)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build(batch: int):
    import jax
    import jax.numpy as jnp

    from everyvoice_tpu.models.fs2.model import FastSpeech2
    from everyvoice_tpu.models.hifigan.model import HiFiGANGenerator

    n_text, max_frames = 128, 1000
    fs2 = FastSpeech2(
        n_symbols=100, max_frames=max_frames, compute_dtype="bfloat16"
    )
    gen = HiFiGANGenerator(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    text = jax.random.randint(rng, (batch, n_text), 2, 100)
    lengths = jnp.full((batch,), n_text, jnp.int32)
    fs2_params = jax.jit(fs2.init)(
        {"params": rng, "dropout": rng}, text[:1], lengths[:1]
    )
    gen_params = jax.jit(gen.init)(rng, jnp.zeros((1, max_frames, 80)))

    def synthesize(fp, gp, text, lengths):
        out = fs2.apply(fp, text, lengths)
        wav = gen.apply(gp, out["postnet_mel"])
        return wav, out["predicted_frame_lengths"]

    def synthesize_bf16_out(fp, gp, text, lengths):
        wav, fr = synthesize(fp, gp, text, lengths)
        return wav.astype(jnp.bfloat16), fr

    return synthesize, synthesize_bf16_out, (fs2_params, gen_params,
                                             text, lengths)


def analyze(fn, args, donate=()):
    import jax

    try:
        compiled = jax.jit(fn, donate_argnums=donate).lower(*args).compile()
    except Exception as exc:  # XLA OOM diagnostics arrive as RuntimeError
        message = str(exc)
        return {"status": "OOM" if "emory" in message or "llocat" in message
                else "error",
                "diagnostic": message[:500]}
    try:
        mem = compiled.memory_analysis()
        return {
            "status": "fits",
            "argument_bytes": int(mem.argument_size_in_bytes),
            "output_bytes": int(mem.output_size_in_bytes),
            "peak_temp_bytes": int(mem.temp_size_in_bytes),
            "total_gib": round(
                (mem.argument_size_in_bytes + mem.output_size_in_bytes
                 + mem.temp_size_in_bytes) / 2**30, 2,
            ),
        }
    except Exception as exc:  # noqa: BLE001 — backend without the API
        return {"status": "fits", "memory_analysis": f"unavailable: {exc}"}


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 144, 160]
    results = {}
    for batch in batches:
        synthesize, synthesize_bf16, args = build(batch)
        row = {"plain": analyze(synthesize, args)}
        if row["plain"]["status"] == "fits":
            row["donated_inputs"] = analyze(synthesize, args, donate=(2, 3))
            row["bf16_output"] = analyze(synthesize_bf16, args)
        results[batch] = row
        print(f"# batch {batch}: {row['plain']}", file=sys.stderr)
    import jax

    print(json.dumps({
        "metric": "serving-path HBM accounting (XLA memory analysis)",
        "device": str(jax.devices()[0]),
        "per_batch": results,
    }))


if __name__ == "__main__":
    main()
