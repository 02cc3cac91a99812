"""Benchmark: training throughput on one TPU chip.

Prints ONE JSON line with training steps/second.

- default (``python bench_train.py [BATCH]``): FastSpeech2 (4×256
  Conformer, alignment learning on, batch 16, 1000-frame budget) — the
  reference's qualitative baseline is "less than a day for most datasets"
  on one GPU at a 100k-step budget (BASELINE.md).
- ``--model hifigan``: the full HiFiGAN GAN step (MPD[2,3,5,7,11] +
  MSD×3, both optimizer updates, 8192-sample segments) via the production
  trainer's own jitted step — reference guidance "up to 2 weeks" on one
  GPU.
- ``--model styletts2 --stage first|second``: the full StyleTTS2 train
  step at default geometry via the production trainer's jitted step,
  with an LJ-scale wall-clock projection for the epochs_1st=200 /
  epochs_2nd=100 recipe — reference guidance "over a week on most
  datasets" on multiple GPUs. Stage 2 stages a WavLM-base-plus-geometry
  SLM locally (``--no-slm`` to skip) and activates the OOD slmadv path.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_hifigan(batch_size: int) -> None:
    import jax
    import jax.numpy as jnp

    from everyvoice_tpu.models.hifigan import HiFiGANConfig
    from everyvoice_tpu.train.loop import HiFiGANTrainer, training_rng

    config = HiFiGANConfig(
        contact={"contact_name": "bench", "contact_email": "b@e.ca"}
    )
    trainer = HiFiGANTrainer(config, dataset=None, val_dataset=None)
    trainer.build_steps()
    gen_params, disc_params = trainer.init_params()
    gen_opt_state = trainer.gen_opt.init(gen_params)
    disc_opt_state = trainer.disc_opt.init(disc_params)

    a = config.preprocessing.audio
    seg = a.vocoder_segment_size
    seg_frames = seg // a.fft_hop_size
    np_rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(
            np_rng.standard_normal((batch_size, seg_frames, a.n_mels)),
            jnp.float32,
        ),
        "audio": jnp.asarray(
            np_rng.standard_normal((batch_size, seg)) * 0.2, jnp.float32
        ),
    }
    rng = training_rng(1)
    gan_on = jnp.asarray(1.0)
    step = trainer._train_step

    state = (gen_params, disc_params, gen_opt_state, disc_opt_state)
    *state, metrics, rng = step(*state, batch, rng, gan_on)
    jax.block_until_ready(metrics)  # compile

    def run_chain(iters: int) -> float:
        nonlocal state, rng
        t0 = time.perf_counter()
        for _ in range(iters):
            *state, metrics, rng = step(*state, batch, rng, gan_on)
        float(metrics["gen/total"])
        return time.perf_counter() - t0

    run_chain(2)
    n_short, n_long = 4, 24
    t_short, t_long = run_chain(n_short), run_chain(n_long)
    elapsed, iters = t_long - t_short, n_long - n_short
    steps_per_s = iters / elapsed

    from everyvoice_tpu.utils.flops import compiled_flops, mfu

    flops = compiled_flops(step, *state, batch, rng, gan_on)
    utilization = mfu(flops, elapsed / iters, jax.devices()[0])
    print(json.dumps({
        "metric": ("HiFiGAN full GAN training steps/sec/chip "
                   "(MPD+MSD, both optimizer updates, 8192-sample segments)"),
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": None,
        "detail": {
            "batch": batch_size,
            "step_ms": round(elapsed / iters * 1000, 2),
            "hours_for_100k_steps": round(100_000 / steps_per_s / 3600, 2),
            "tflops_per_step": round(flops / 1e12, 3) if flops else None,
            "mfu": round(utilization, 4) if utilization else None,
            "device": str(jax.devices()[0]),
        },
    }))


def bench_styletts2(batch_size: int, stage: str, with_slm: bool = True) -> None:
    """StyleTTS2 train step at the default (production) geometry — the
    reference's most expensive workload ("over a week on most datasets" on
    multiple GPUs, reference docs/guides/custom.md:79). Stage 1 is measured
    in its steady-state post-tma_epoch phase; stage 2 with every loss
    active (diffusion + joint SLM-adversarial OOD synthesis) and a
    base-plus-geometry WavLM staged locally, i.e. the most expensive epochs
    of each stage. The PL-BERT/JDC/ASR stand-ins run at the framework's
    default geometry (the fetched external checkpoints are similar-sized
    encoders; the waveform-scale decoder + discriminators dominate)."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from everyvoice_tpu.config import TextConfig
    from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
    from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
    from everyvoice_tpu.text import TextProcessor
    from everyvoice_tpu.train.loop import training_rng

    tmp = Path(tempfile.mkdtemp(prefix="bench_styletts2_"))
    config = StyleTTS2Config(
        contact={"contact_name": "bench", "contact_email": "b@e.ca"},
        text=TextConfig(
            symbols={"letters": list("abcdefghijklmnopqrstuvwxyz")}
        ),
    )
    config.preprocessing.save_dir = tmp / "preprocessed"
    slm_staged = False
    if stage == "second" and with_slm:
        # Stage a random-init WavLM at microsoft/wavlm-base-plus geometry
        # (94M params): step FLOPs depend on geometry, not weight values.
        try:
            from transformers import WavLMConfig, WavLMModel

            slm_dir = tmp / "wavlm-base-plus-geometry"
            WavLMModel(WavLMConfig()).save_pretrained(slm_dir)
            config.model.slm.model = str(slm_dir)
            slm_staged = True
        except Exception as exc:  # noqa: BLE001 — bench stays runnable
            print(f"# WavLM staging unavailable ({exc}); SLM loss excluded",
                  file=sys.stderr)
        # OOD sentence bank so the joint-phase slmadv synthesis is traced.
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
    n_frames = config.training.max_len  # production frame budget (800)
    a = config.preprocessing.audio
    hop = a.fft_hop_size * (a.output_sampling_rate // a.input_sampling_rate)
    n_samples = n_frames * hop
    np_rng = np.random.default_rng(0)
    durations = np.full((batch_size, n_text), n_frames // n_text, np.int32)
    durations[:, -1] += n_frames - durations[0].sum()
    batch = {
        "text": jnp.asarray(
            np_rng.integers(2, _BenchDataset.n_symbols, (batch_size, n_text)),
            jnp.int32,
        ),
        "text_lengths": jnp.full((batch_size,), n_text, jnp.int32),
        "mel": jnp.asarray(
            np_rng.standard_normal((batch_size, n_frames, a.n_mels)),
            jnp.float32,
        ),
        "mel_lengths": jnp.full((batch_size,), n_frames, jnp.int32),
        "f0_frames": jnp.asarray(
            np.abs(np_rng.standard_normal((batch_size, n_frames))) * 100,
            jnp.float32,
        ),
        "energy_frames": jnp.asarray(
            np.abs(np_rng.standard_normal((batch_size, n_frames))),
            jnp.float32,
        ),
        "f0_tokens": jnp.zeros((batch_size, n_text), jnp.float32),
        "energy_tokens": jnp.zeros((batch_size, n_text), jnp.float32),
        "durations": jnp.asarray(durations),
        "audio": jnp.asarray(
            np_rng.standard_normal((batch_size, n_samples)) * 0.2, jnp.float32
        ),
    }
    example = {k: np.asarray(v) for k, v in batch.items()}
    gen_params, disc_params = trainer.init_params(example)
    gen_opt_state = trainer.gen_opt.init(gen_params)
    disc_opt_state = trainer.disc_opt.init(disc_params)
    slm_params = trainer.slm_params
    # Most expensive steady-state phase of each stage.
    phase = (
        jnp.asarray([1.0, 0.0, 0.0]) if stage == "first"
        else jnp.asarray([1.0, 1.0, 1.0])
    )
    flags = dict(ood_active=(stage == "second" and slm_staged),
                 tma_active=True)
    step = trainer._train_step

    state = (gen_params, disc_params, gen_opt_state, disc_opt_state)
    rng = training_rng(1)
    *state, metrics, rng = step(*state, batch, rng, slm_params, phase, **flags)
    jax.block_until_ready(metrics)  # compile

    def run_chain(iters: int) -> float:
        nonlocal state, rng
        t0 = time.perf_counter()
        for _ in range(iters):
            *state, metrics, rng = step(
                *state, batch, rng, slm_params, phase, **flags
            )
        float(metrics["gen/total"])
        return time.perf_counter() - t0

    run_chain(2)
    n_short, n_long = 2, 10
    t_short, t_long = run_chain(n_short), run_chain(n_long)
    elapsed, iters = t_long - t_short, n_long - n_short
    steps_per_s = iters / elapsed

    from everyvoice_tpu.utils.flops import compiled_flops, mfu

    flops = compiled_flops(step, *state, batch, rng, slm_params, phase, **flags)
    utilization = mfu(flops, elapsed / iters, jax.devices()[0])
    # Full-recipe projection at LJSpeech scale (13,100 utterances, 90%
    # train split): epochs_1st=200 / epochs_2nd=100 (schema defaults).
    steps_per_epoch = int(13_100 * 0.9) // batch_size
    epochs = 200 if stage == "first" else 100
    total_steps = steps_per_epoch * epochs
    print(json.dumps({
        "metric": (
            f"StyleTTS2 stage-{'1' if stage == 'first' else '2'} training "
            "steps/sec/chip (default geometry, "
            f"{n_frames}-frame/{n_samples}-sample utterances"
            + (", diffusion + SLM-adversarial OOD losses active"
               if stage == "second" else ", post-tma_epoch phase")
            + ")"
        ),
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": None,
        "detail": {
            "batch": batch_size,
            "step_ms": round(elapsed / iters * 1000, 2),
            "tflops_per_step": round(flops / 1e12, 3) if flops else None,
            "mfu": round(utilization, 4) if utilization else None,
            "slm_wavlm_staged": slm_staged,
            "lj_scale_projection": {
                "steps_per_epoch": steps_per_epoch,
                "epochs": epochs,
                "total_steps": total_steps,
                "hours": round(total_steps / steps_per_s / 3600, 2),
            },
            "device": str(jax.devices()[0]),
        },
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from everyvoice_tpu.models.fs2.loss import compute_fs2_losses
    from everyvoice_tpu.models.fs2.model import FastSpeech2

    argv = sys.argv[1:]
    model = "fs2"
    stage = "first"
    if "--model" in argv:
        i = argv.index("--model")
        model = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--stage" in argv:
        i = argv.index("--stage")
        stage = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    with_slm = "--no-slm" not in argv
    argv = [a for a in argv if a != "--no-slm"]
    args = [a for a in argv if not a.startswith("-")]
    if model == "hifigan":
        batch_size = int(args[0]) if args else 16
        bench_hifigan(batch_size)
        return
    if model == "styletts2":
        if stage not in ("first", "second"):
            raise SystemExit(f"--stage must be first|second, got {stage!r}")
        batch_size = int(args[0]) if args else 8
        bench_styletts2(batch_size, stage, with_slm=with_slm)
        return
    batch_size = int(args[0]) if args else 16
    n_text, n_frames, n_mels = 128, 1000, 80

    model = FastSpeech2(n_symbols=100, max_frames=n_frames)
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(
            np_rng.integers(2, 100, (batch_size, n_text)), jnp.int32
        ),
        "text_lengths": jnp.full((batch_size,), n_text, jnp.int32),
        "mel": jnp.asarray(
            np_rng.standard_normal((batch_size, n_frames, n_mels)), jnp.float32
        ),
        "mel_lengths": jnp.full((batch_size,), n_frames, jnp.int32),
        "pitch": jnp.zeros((batch_size, n_frames)),
        "energy": jnp.zeros((batch_size, n_frames)),
        "attn_prior": jnp.full(
            (batch_size, n_frames, n_text), 1.0 / n_text, jnp.float32
        ),
        "speaker_id": jnp.zeros((batch_size,), jnp.int32),
        "language_id": jnp.zeros((batch_size,), jnp.int32),
    }

    def kwargs(b):
        return dict(
            mel=b["mel"], mel_lengths=b["mel_lengths"],
            attn_prior=b["attn_prior"], pitch=b["pitch"], energy=b["energy"],
            speaker_id=b["speaker_id"], language_id=b["language_id"],
        )

    params = jax.jit(model.init)(
        {"params": rng, "dropout": rng},
        batch["text"], batch["text_lengths"], **kwargs(batch),
    )
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)

    def loss_fn(p, b, key):
        out = model.apply(
            p, b["text"], b["text_lengths"], deterministic=False,
            rngs={"dropout": key}, **kwargs(b),
        )
        losses = compute_fs2_losses(out, b, {}, learn_alignment=True)
        return losses["total"], losses

    @jax.jit
    def train_step(p, o, b, key):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, b, key)
        updates, o = optimizer.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, losses["total"]

    from everyvoice_tpu.train.loop import training_rng

    key = training_rng(1)  # the production trainers' hardware-RNG key
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    loss.block_until_ready()  # compile

    # Hardened methodology (docs/guides/tpu.md): the state chain already
    # data-depends step over step; fetch the final loss VALUE inside the
    # timed region (block_until_ready can be acknowledged early on
    # forwarding relays) and take the marginal slope of two chain lengths
    # to cancel the fixed dispatch/fetch overhead.
    def run_chain(iters: int) -> float:
        nonlocal params, opt_state
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = train_step(params, opt_state, batch, key)
        float(loss)
        return time.perf_counter() - t0

    run_chain(2)  # warm the fetch path too
    n_short, n_long = 4, 24
    t_short, t_long = run_chain(n_short), run_chain(n_long)
    elapsed, iters = t_long - t_short, n_long - n_short
    steps_per_s = iters / elapsed
    hours_for_100k = 100_000 / steps_per_s / 3600

    # MFU from XLA's flop count of the compiled train step (fwd+bwd+update).
    from everyvoice_tpu.utils.flops import compiled_flops, mfu

    flops = compiled_flops(train_step, params, opt_state, batch, key)
    utilization = mfu(flops, elapsed / iters, jax.devices()[0])

    result = {
        "metric": "FastSpeech2 training steps/sec/chip (alignment learning, batch 16, 1000 frames)",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": None,
        "detail": {
            "batch": batch_size,
            "step_ms": round(elapsed / iters * 1000, 2),
            "hours_for_100k_steps": round(hours_for_100k, 2),
            "tflops_per_step": round(flops / 1e12, 3) if flops else None,
            "mfu": round(utilization, 4) if utilization else None,
            "loss": float(loss),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
