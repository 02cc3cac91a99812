"""Decompose the StyleTTS2 train step into component times on the chip.

Round-5 verdict item: the most expensive workload (13.2 days/chip for the
full LJ recipe) had a single MFU number and no attribution. This mirrors
tools/gan_component_times.py for StyleTTS2 stage 1/2 at the production
geometry (batch 8, 800-frame / 204,800-sample utterances), using the
hardened chained-dispatch methodology (docs/guides/tpu.md):

  model_fwd      full generator forward (text enc + styles + TMA attn +
                 prosody + decoder -> 204,800-sample wav)
  decoder_fwd    StyleDecoder alone (frames -> wav; the waveform-scale part)
  tma_fwd        align_text_mel forward (aligner attention)
  align_targets  the per-step gradient-free target pass (aligner fwd +
                 Viterbi scan + phone averaging [+ JDC])
  mel_fn         log-mel of one 204,800-sample waveform batch
  mpd_fwd        MultiPeriodDiscriminator forward on the full waveform
  msd_fwd        MultiScaleDiscriminator forward on the full waveform
  disc_grads     value_and_grad of the discriminator loss (no optimizer)
  gen_grads      value_and_grad of the generator loss (no optimizer)
  full_step      the production jitted train step (both optimizer updates)
  slm_fwd        (stage 2) WavLM forward on the 16-kHz-resampled waveform

Usage: python tools/styletts2_component_times.py [--stage first|second]
       [--batch N] [--frames N]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build(stage: str, batch_size: int, n_frames: int | None):
    """Trainer + production-geometry batch (mirrors bench_train.py)."""
    import jax.numpy as jnp
    import numpy as np

    from everyvoice_tpu.config import TextConfig
    from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
    from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
    from everyvoice_tpu.text import TextProcessor

    tmp = Path(tempfile.mkdtemp(prefix="styletts2_components_"))
    config = StyleTTS2Config(
        contact={"contact_name": "bench", "contact_email": "b@e.ca"},
        text=TextConfig(symbols={"letters": list("abcdefghijklmnopqrstuvwxyz")}),
    )
    config.preprocessing.save_dir = tmp / "preprocessed"
    if n_frames is not None:
        config.training.max_len = n_frames
    slm_staged = False
    if stage == "second":
        try:
            from transformers import WavLMConfig, WavLMModel

            slm_dir = tmp / "wavlm-base-plus-geometry"
            WavLMModel(WavLMConfig()).save_pretrained(slm_dir)
            config.model.slm.model = str(slm_dir)
            slm_staged = True
        except Exception as exc:  # noqa: BLE001
            print(f"# WavLM staging unavailable ({exc})", file=sys.stderr)
        ood_dir = config.preprocessing.save_dir / "ood"
        ood_dir.mkdir(parents=True, exist_ok=True)
        rows = ["basename|text"] + [
            f"ood{i}|the quick brown fox jumps over the lazy dog "
            f"sentence number {i} of the out of domain bank" for i in range(64)
        ]
        (ood_dir / "und.psv").write_text("\n".join(rows))

    class _BenchDataset:
        text_processor = TextProcessor(config.text)
        n_symbols = len(text_processor.symbols)
        level = config.model.target_text_representation_level
        max_text_len = 192

    trainer = StyleTTS2Trainer(
        config, _BenchDataset(), None, mode=stage, run_dir=tmp / "run"
    )
    trainer.build_steps()

    n_text = _BenchDataset.max_text_len
    frames = config.training.max_len
    a = config.preprocessing.audio
    hop = a.fft_hop_size * (a.output_sampling_rate // a.input_sampling_rate)
    n_samples = frames * hop
    np_rng = np.random.default_rng(0)
    durations = np.full((batch_size, n_text), frames // n_text, np.int32)
    durations[:, -1] += frames - durations[0].sum()
    batch = {
        "text": jnp.asarray(
            np_rng.integers(2, _BenchDataset.n_symbols, (batch_size, n_text)),
            jnp.int32,
        ),
        "text_lengths": jnp.full((batch_size,), n_text, jnp.int32),
        "mel": jnp.asarray(
            np_rng.standard_normal((batch_size, frames, a.n_mels)), jnp.float32
        ),
        "mel_lengths": jnp.full((batch_size,), frames, jnp.int32),
        "f0_frames": jnp.asarray(
            np.abs(np_rng.standard_normal((batch_size, frames))) * 100,
            jnp.float32,
        ),
        "energy_frames": jnp.asarray(
            np.abs(np_rng.standard_normal((batch_size, frames))), jnp.float32
        ),
        "f0_tokens": jnp.zeros((batch_size, n_text), jnp.float32),
        "energy_tokens": jnp.zeros((batch_size, n_text), jnp.float32),
        "durations": jnp.asarray(durations),
        "audio": jnp.asarray(
            np_rng.standard_normal((batch_size, n_samples)) * 0.2, jnp.float32
        ),
    }
    return trainer, config, batch, slm_staged


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", default="first", choices=["first", "second"])
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--frames", type=int, default=None,
                        help="override training.max_len (default 800)")
    parser.add_argument("--skip-full-step", action="store_true",
                        help="skip the production-step re-measurement "
                        "(bench_train.py already reports it; compiling it "
                        "on top of this process's components can OOM the "
                        "relay compile helper)")
    opts = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from everyvoice_tpu.train.loop import training_rng
    from everyvoice_tpu.utils import enable_compilation_cache
    from everyvoice_tpu.utils.flops import compiled_flops, mfu

    enable_compilation_cache()
    trainer, config, batch, slm_staged = build(
        opts.stage, opts.batch, opts.frames
    )
    model = trainer.model
    example = {k: np.asarray(v) for k, v in batch.items()}
    gen_params, disc_params = trainer.init_params(example)
    gen_opt_state = trainer.gen_opt.init(gen_params)
    disc_opt_state = trainer.disc_opt.init(disc_params)
    phase = (
        jnp.asarray([1.0, 0.0, 0.0]) if opts.stage == "first"
        else jnp.asarray([1.0, 1.0, 1.0])
    )
    flags = dict(ood_active=(opts.stage == "second" and slm_staged),
                 tma_active=True)

    def chain_time(fn, *args, feed=0, iters_short=3, iters_long=13):
        fn = jax.jit(fn)
        out = fn(*args)
        jax.block_until_ready(out)

        def leaf0(tree):
            return jax.tree_util.tree_leaves(tree)[0]

        def run(iters):
            xs = list(args)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*xs)
                probe = leaf0(out)
                xs[feed] = args[feed] + jnp.ravel(probe)[0] * 0
            float(jnp.ravel(leaf0(out))[0])
            return time.perf_counter() - t0

        run(2)
        t_short, t_long = run(iters_short), run(iters_long)
        sec = (t_long - t_short) / (iters_long - iters_short)
        flops = compiled_flops(fn, *args)
        return sec, flops

    results = {}

    def record(name, sec, flops):
        util = mfu(flops, sec, jax.devices()[0])
        results[name] = {
            "ms": round(sec * 1e3, 2),
            "tflops": round(flops / 1e12, 3) if flops else None,
            "mfu": round(util, 4) if util else None,
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    rng = training_rng(7)
    closures = trainer._step_closures
    mel_fn = closures["mel_fn"]

    # Full generator forward (teacher durations/F0, training style).
    def model_fwd(mel, p):
        return model.apply(
            p, batch["text"], batch["text_lengths"], mel,
            durations=batch["durations"], f0_frames=batch["f0_frames"],
            energy_frames=batch["energy_frames"],
            mel_lengths=batch["mel_lengths"], deterministic=False,
            rngs={"noise": rng, "dropout": rng},
        )["wav"]

    record("model_fwd", *chain_time(model_fwd, batch["mel"], gen_params))

    # StyleDecoder alone: frames -> wav, the waveform-scale generator part.
    hidden = model.hidden_dim
    frames_in = jnp.zeros((opts.batch, batch["mel"].shape[1], hidden))
    style = jnp.zeros((opts.batch, model.style_dim))

    def decoder_fwd(fr):
        return model.apply(
            gen_params, fr, batch["f0_frames"], batch["energy_frames"],
            style, None, method="decode",
        )

    record("decoder_fwd", *chain_time(decoder_fwd, frames_in))

    def tma_fwd(mel):
        return model.apply(
            gen_params, batch["text"], batch["text_lengths"], mel,
            batch["mel_lengths"], method="align_text_mel",
        )[1]

    record("tma_fwd", *chain_time(tma_fwd, batch["mel"]))

    def align_targets(mel, p):
        b = dict(batch, mel=mel)
        return closures["alignment_targets"](p, b, True)

    record("align_targets", *chain_time(align_targets, batch["mel"], gen_params))

    record("mel_fn", *chain_time(lambda w: mel_fn(w), batch["audio"]))
    record("mpd_fwd", *chain_time(
        lambda w: trainer.mpd.apply(disc_params["mpd"], w)[0], batch["audio"]))
    record("msd_fwd", *chain_time(
        lambda w: trainer.msd.apply(disc_params["msd"], w)[0], batch["audio"]))

    if opts.stage == "second" and trainer.slm_module is not None:
        from everyvoice_tpu.dsp.resample import resample
        from everyvoice_tpu.models.styletts2.slm import stack_hidden_states

        out_sr = config.preprocessing.audio.output_sampling_rate
        slm_sr = config.model.slm.sr

        def slm_fwd(w, sp):
            w16 = resample(w, out_sr, slm_sr)
            return stack_hidden_states(trainer.slm_module.apply(sp, w16))

        record("slm_fwd", *chain_time(slm_fwd, batch["audio"],
                                      trainer.slm_params))

    targets = closures["alignment_targets"](gen_params, batch, True)
    seg = trainer.model.segment_frames
    if seg is not None:
        # Mirror step_body's per-utterance random clip (production path).
        max_start = jnp.maximum(batch["mel_lengths"] - seg, 0)
        targets["segment_starts"] = jax.random.randint(
            rng, (opts.batch,), 0, max_start + 1
        )

    # Batch/targets travel as jit ARGUMENTS, not closure constants: constant
    # -embedded activations inflate the HLO proto past the relay's
    # remote-compile request limit (HTTP 413) on the stage-2 programs.
    rest = {k: v for k, v in batch.items() if k != "mel"}

    slm_params = trainer.slm_params  # argument, NOT closure: 376 MB of
    # WavLM weights as HLO constants also exceeds the compile limit

    def disc_grads(mel, rest, targets, gp, dp, sp):
        b = dict(rest, mel=mel)
        (_, m), g = jax.value_and_grad(
            closures["disc_loss_fn"], has_aux=True
        )(dp, gp, b, rng, sp, phase, targets, flags["ood_active"])
        return m["disc/total"], g

    record("disc_grads", *chain_time(disc_grads, batch["mel"], rest,
                                     targets, gen_params, disc_params,
                                     slm_params))

    def gen_grads(mel, rest, targets, gp, dp, sp):
        b = dict(rest, mel=mel)
        (_, m), g = jax.value_and_grad(
            closures["gen_loss_fn"], has_aux=True
        )(gp, dp, b, rng, sp, phase, targets, flags["ood_active"], True)
        return m["total"], g

    record("gen_grads", *chain_time(gen_grads, batch["mel"], rest,
                                    targets, gen_params, disc_params,
                                    slm_params))

    # Full production step (donates state; thread it through).
    if opts.skip_full_step:
        print(json.dumps({
            "metric": "StyleTTS2 train-step component times (chained, marginal)",
            "stage": opts.stage,
            "batch": opts.batch,
            "frames": int(batch["mel"].shape[1]),
            "slm_staged": slm_staged,
            "device": str(jax.devices()[0]),
            "components": results,
        }))
        return
    step = trainer._train_step
    state = (gen_params, disc_params, gen_opt_state, disc_opt_state)
    srng = training_rng(1)
    *state, metrics, srng = step(
        *state, batch, srng, trainer.slm_params, phase, **flags
    )
    jax.block_until_ready(metrics)

    def run_full(iters):
        nonlocal state, srng
        t0 = time.perf_counter()
        for _ in range(iters):
            *state, metrics, srng = step(
                *state, batch, srng, trainer.slm_params, phase, **flags
            )
        float(metrics["gen/total"])
        return time.perf_counter() - t0

    run_full(1)
    t_short, t_long = run_full(2), run_full(8)
    sec = (t_long - t_short) / 6
    flops = compiled_flops(
        step, *state, batch, srng, trainer.slm_params, phase, **flags
    )
    record("full_step", sec, flops)

    print(json.dumps({
        "metric": "StyleTTS2 train-step component times (chained, marginal)",
        "stage": opts.stage,
        "batch": opts.batch,
        "frames": int(batch["mel"].shape[1]),
        "slm_staged": slm_staged,
        "device": str(jax.devices()[0]),
        "components": results,
    }))


if __name__ == "__main__":
    main()
