"""The `everyvoice-tpu` command line interface
(surface parity: everyvoice/cli.py — new-project / preprocess / train /
synthesize / demo / export / segment / evaluate / check / checkpoint /
fetch-pretrained / g2p / update-schemas).

Heavy imports are deferred inside the command bodies so `--help` stays fast —
the same discipline the reference enforces in CI
(reference tests/test_cli.py:399 test_expensive_imports_are_tucked_away).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import click

MODEL_CONFIGS = {
    "text-to-spec": "everyvoice_tpu.models.fs2.config:FastSpeech2Config",
    "spec-to-wav": "everyvoice_tpu.models.hifigan.config:HiFiGANConfig",
    "text-to-wav": "everyvoice_tpu.models.styletts2.config:StyleTTS2Config",
}


def _load_config(model_kind: str, config_path: Path, overrides):
    import importlib

    module_name, _, class_name = MODEL_CONFIGS[model_kind].partition(":")
    config_cls = getattr(importlib.import_module(module_name), class_name)
    config = config_cls.load_config_from_path(config_path)
    if overrides:
        from everyvoice_tpu.utils import update_config_from_cli_args

        update_config_from_cli_args(list(overrides), config)
    return config


def _print_diagnostic(ctx, param, value):
    """--diagnostic: environment report (reference cli.py:150-205)."""
    if not value or ctx.resilient_parsing:
        return
    import importlib.metadata
    import platform

    click.echo("EveryVoice-TPU version: 0.1.0")
    click.echo(f"Python version: {platform.python_version()}")
    click.echo(f"Platform: {platform.platform()}")
    click.echo("Dependencies:")
    for package in ("jax", "jaxlib", "flax", "optax", "numpy", "pydantic",
                    "click", "torch", "transformers"):
        try:
            click.echo(f"  {package}=={importlib.metadata.version(package)}")
        except importlib.metadata.PackageNotFoundError:
            click.echo(f"  {package}: not installed")
    try:
        import jax

        devices = jax.devices()
        click.echo(
            f"jax devices: {[str(d) for d in devices]} "
            f"(default backend: {jax.default_backend()})"
        )
    except Exception as e:
        click.echo(f"jax devices: unavailable ({e})")
    ctx.exit(0)


class MainCommandOrder(click.Group):
    """Workflow-ordered help: the pipeline verbs first, the rest
    alphabetically (parity: reference cli.py:89 MainCommandOrder)."""

    ORDER = ("new-project", "preprocess", "train", "synthesize", "demo")

    def list_commands(self, ctx):
        rank = {name: i for i, name in enumerate(self.ORDER)}
        return sorted(
            self.commands, key=lambda name: (rank.get(name, 100), name)
        )


@click.group(name="everyvoice-tpu", cls=MainCommandOrder)
@click.version_option(package_name=None, version=_version
                      if (_version := None) else "0.1.0")
@click.option("--diagnostic", is_flag=True, callback=_print_diagnostic,
              expose_value=False, is_eager=True,
              help="Print versions of this package and its dependencies.")
def main():
    """EveryVoice-TPU: a TPU-native text-to-speech framework."""
    # EVERYVOICE_DEVICE=cpu forces computation onto the host CPU backend
    # (useful when the TPU is busy or for CI). Pinning jax_platforms (not
    # just the default device) keeps the accelerator backend from even
    # initializing — on single-tenant TPU links another process's claim
    # would otherwise block this one. This works even where JAX_PLATFORMS
    # is ineffective because a site hook already forced a platform.
    import os

    device = os.environ.get("EVERYVOICE_DEVICE")
    if device:
        import jax

        jax.config.update("jax_platforms", device)
        jax.config.update("jax_default_device", jax.devices(device)[0])
    # Persistent XLA compilation cache: repeat CLI invocations (preprocess,
    # train, synthesize) skip recompiling programs they have seen before.
    from everyvoice_tpu.utils import enable_compilation_cache

    enable_compilation_cache()


def _pin_device(accelerator: str) -> None:
    """Route serving onto the requested backend (the reference demo's
    --accelerator flag, cli.py:1042-1048). 'cpu' pins the whole process to
    the host platform (so a busy single-tenant TPU never blocks the demo);
    'auto'/'tpu' keep the default backend preference."""
    if accelerator in (None, "auto"):
        return
    import jax

    if accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # 'tpu' (or a vendor platform name) is the default preference already;
    # just fail fast if it is missing.
    from everyvoice_tpu.parallel.mesh import resolve_devices

    devs = resolve_devices(accelerator, "auto")
    if not devs:
        raise click.ClickException(f"No devices found for --accelerator {accelerator}")
    jax.config.update("jax_default_device", devs[0])


# ---------------------------------------------------------------------------
# new-project (wizard)


@main.command("new-project")
@click.option("-r", "--resume-from", type=click.Path(path_type=Path),
              default=None, help="Resume a saved wizard session.")
@click.option("--trace", is_flag=True, hidden=True,
              help="Enable question tree trace mode.")
@click.option("--debug-state", is_flag=True, hidden=True,
              help="Enable wizard state debug/trace mode.")
def new_project(resume_from, trace, debug_state):
    """Create a new project with a guided wizard."""
    from everyvoice_tpu.wizard.main_tour import get_main_wizard_tour

    tour = get_main_wizard_tour(trace=trace, debug_state=debug_state)
    tour.run(resume_from=resume_from)


# ---------------------------------------------------------------------------
# preprocess


@main.command()
@click.argument("model_kind", type=click.Choice(list(MODEL_CONFIGS)))
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
@click.option("-s", "--steps", multiple=True,
              type=click.Choice(["audio", "text", "pfs", "spec", "attn",
                                 "energy", "pitch", "ood"]),
              help="Steps to run (default: all relevant for the model kind; "
              "'ood' stages out-of-domain text for StyleTTS2 SLM-adversarial "
              "training).")
@click.option("-O", "--overwrite", is_flag=True,
              help="Redo all preprocessing even when artifacts exist.")
@click.option("-C", "--cpus", default=1, show_default=True,
              help="Host workers for audio IO.")
@click.option("-D", "--debug", is_flag=True, help="Enable debug logging.")
@click.option("--device-audio", is_flag=True,
              help="Run loudness/resample/peak-norm of the audio step as "
              "batched int16 transfers on the accelerator (wins on "
              "CPU-starved hosts with a local PCIe-class link; the default "
              "threaded host path is faster on many-core hosts or remote "
              "relays — see docs/guides/tpu.md).")
@click.option("-c", "--config-args", multiple=True,
              help="key.path=value config overrides")
def preprocess(model_kind, config_path, steps, overwrite, cpus, debug,
               device_audio, config_args):
    """Preprocess a dataset (batched, on-device DSP)."""
    from everyvoice_tpu.preprocessor import Preprocessor

    if debug:
        import logging

        from everyvoice_tpu.logger import logger as _logger

        _logger.setLevel(logging.DEBUG)
    config = _load_config(model_kind, config_path, config_args)
    if not steps:
        if model_kind == "spec-to-wav":
            steps = ("audio", "spec")
        elif model_kind == "text-to-wav":
            steps = ("audio", "text", "spec", "attn", "energy", "pitch", "ood")
        else:
            steps = ("audio", "text", "spec", "attn", "energy", "pitch")
    run_ood = "ood" in steps
    steps = tuple(s for s in steps if s != "ood")
    pre = Preprocessor(config)
    if steps:
        pre.preprocess(to_process=steps, overwrite=overwrite, cpus=cpus,
                       device_audio=device_audio)
    if run_ood:
        ood_texts = _gather_ood_texts(config)
        if ood_texts:
            pre.preprocess_ood(ood_texts)
            click.echo(
                "Wrote OOD text for languages: " + ", ".join(sorted(ood_texts))
            )
        elif model_kind == "text-to-wav":
            click.echo(
                "No OOD sources configured (training.ood_raw_data / "
                "use_validation_as_ood) — skipping the ood step."
            )


def _gather_ood_texts(config) -> dict:
    """Collect per-language OOD sentences from the config's sources
    (reference preprocessor.py:1242-1321: local file, HF download, or the
    validation split)."""
    texts: dict = {}
    training = config.training
    for lang, source in getattr(training, "ood_raw_data", {}).items():
        lines: list = []
        if source.local_path is not None and Path(source.local_path).is_file():
            raw = Path(source.local_path).read_text(
                encoding="utf8"
            ).splitlines()
            lines = _ood_lines_from_raw(raw)
        elif source.hf is not None and source.hf.repo_id:
            # Reached both when only hf is configured and when local_path
            # is configured but missing — a stale local path must not
            # shadow a working HF source.
            if source.local_path is not None:
                click.echo(
                    f"OOD source for '{lang}' points at a missing file "
                    f"({source.local_path}); trying the HuggingFace source.",
                    err=True,
                )
            try:
                from huggingface_hub import hf_hub_download

                local = hf_hub_download(
                    source.hf.repo_id, repo_type="dataset",
                    filename=source.hf.filename, revision=source.hf.revision,
                )
                raw = Path(local).read_text(encoding="utf8").splitlines()
                lines = _ood_lines_from_raw(raw)
            except Exception as e:
                click.echo(
                    f"Could not fetch OOD data for '{lang}' from HuggingFace "
                    f"({e}); skipping that language.", err=True,
                )
        elif source.local_path is not None:
            click.echo(
                f"OOD source for '{lang}' points at a missing file "
                f"({source.local_path}) and no HuggingFace source is "
                "configured; skipping that language.", err=True,
            )
        lines = _filter_ood_lines(lines, config)
        if lines:
            texts[lang] = lines
    if getattr(training, "use_validation_as_ood", False):
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        try:
            rows = generic_psv_filelist_reader(training.validation_filelist)
        except OSError:
            rows = []
        by_lang: dict = {}
        for row in rows:
            # Any text-bearing column works as OOD material — phones-only
            # filelists (target representation 'phones') must not silently
            # yield an empty harvest.
            text = (
                row.get("characters") or row.get("raw_text")
                or row.get("text") or row.get("phones") or ""
            )
            if text.strip():
                by_lang.setdefault(row.get("language") or "und", []).append(text)
        for lang, lines in by_lang.items():
            filtered = _filter_ood_lines(lines, config)
            if filtered:
                texts.setdefault(lang, filtered)
    return texts


def _filter_ood_lines(lines: list, config) -> list:
    """Drop sentences below training.OOD_min_length characters — short
    snippets give the SLM discriminator nothing to judge (schema
    OOD_min_length, default 50)."""
    min_length = getattr(config.training, "OOD_min_length", 0) or 0
    kept = [line for line in lines if len(line) >= min_length]
    if lines and not kept:
        click.echo(
            f"All {len(lines)} OOD sentences are shorter than "
            f"OOD_min_length={min_length}; keeping them anyway (lower "
            "OOD_min_length to silence this).", err=True,
        )
        return lines
    return kept


def _ood_lines_from_raw(raw_lines: list) -> list:
    """Plain text (one sentence per line) or a psv with a characters/phones
    column both work as OOD sources."""
    if not raw_lines:
        return []
    header = [f.strip() for f in raw_lines[0].split("|")]
    for column in ("phones", "characters", "text"):
        if column in header:
            # Parse with the project's own psv dialect (backslash-escaped
            # pipes) rather than a naive split.
            import csv

            reader = csv.DictReader(
                raw_lines, delimiter="|", quoting=csv.QUOTE_NONE,
                escapechar="\\"[0],
            )
            return [
                (row.get(column) or "").strip()
                for row in reader
                if (row.get(column) or "").strip()
            ]
    return [line.strip() for line in raw_lines if line.strip()]


# ---------------------------------------------------------------------------
# train


@main.group()
def train():
    """Train a model."""


def _common_train_options(fn):
    fn = click.option("-c", "--config-args", multiple=True)(fn)
    fn = click.option("-a", "--accelerator", default="auto",
                      type=click.Choice(["auto", "tpu", "cpu", "gpu"]))(fn)
    fn = click.option("-d", "--devices", default="auto")(fn)
    fn = click.option("-n", "--nodes", default=1)(fn)
    fn = click.option("-s", "--strategy", default="ddp",
                      help="'ddp' (default, data parallel — the reference "
                      "behavior), 'fsdp' (ZeRO-3 parameter + optimizer-state "
                      "sharding over the data axis), or 'tp<k>'/'ddp_tp<k>' "
                      "to add k-way tensor parallelism over the mesh's model "
                      "axis.")(fn)
    fn = click.option("--gradient-clip-val", default=None, type=float)(fn)
    fn = click.option("--profile-steps", default=0, type=int,
                      help="Capture a jax profiler trace of the first N steps "
                      "into the run dir.")(fn)
    fn = click.option("--steps-per-execution", default=1, type=int,
                      help="Run N optimizer steps per device dispatch "
                      "(lax.scan over stacked batches); amortizes host "
                      "overhead for small models.")(fn)
    fn = click.option("--compute-precision", default="auto",
                      type=click.Choice(["auto", "float32", "bfloat16"]),
                      help="Training conv/matmul compute dtype. 'auto' = "
                      "bfloat16 on TPU (parameters, losses, and optimizer "
                      "state always stay float32), float32 elsewhere.")(fn)
    return fn


@train.command("text-to-spec")
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
@_common_train_options
def train_text_to_spec(config_path, config_args, accelerator, devices, nodes,
                       strategy, gradient_clip_val, profile_steps,
                       steps_per_execution, compute_precision):
    """Train a FastSpeech2 feature-prediction model."""
    from everyvoice_tpu.dataloader import FastSpeech2Dataset
    from everyvoice_tpu.parallel import parse_strategy, setup_mesh
    from everyvoice_tpu.text.lookups import lookuptables_from_data
    from everyvoice_tpu.train import FastSpeech2Trainer

    config = _load_config("text-to-spec", config_path, config_args)
    train_list = config.training.filelist_loader(config.training.training_filelist)
    val_list = config.training.filelist_loader(config.training.validation_filelist)
    lang2id, speaker2id = lookuptables_from_data((train_list, val_list))
    ds = FastSpeech2Dataset(train_list, config, lang2id, speaker2id)
    vds = FastSpeech2Dataset(
        val_list, config, lang2id, speaker2id, text_processor=ds.text_processor
    )
    strat = parse_strategy(strategy)
    mesh = setup_mesh(accelerator, devices, nodes=nodes,
                      model_parallel=strat.model_parallel)
    stats_path = Path(config.preprocessing.save_dir) / "stats.json"
    stats = json.loads(stats_path.read_text()) if stats_path.exists() else {}
    trainer = FastSpeech2Trainer(
        config, ds, vds, lang2id, speaker2id, stats=stats, mesh=mesh,
        gradient_clip_val=gradient_clip_val, fsdp=strat.fsdp,
        compute_dtype=compute_precision,
    )
    trainer.fit(
        profile_steps=profile_steps, steps_per_execution=steps_per_execution
    )
    click.echo(f"Training complete; checkpoints at {trainer.ckpt_dir}")


@train.command("spec-to-wav")
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
@_common_train_options
def train_spec_to_wav(config_path, config_args, accelerator, devices, nodes,
                      strategy, gradient_clip_val, profile_steps,
                      steps_per_execution, compute_precision):
    """Train a HiFiGAN (or iSTFTNet) vocoder."""
    from everyvoice_tpu.dataloader import HiFiGANDataset
    from everyvoice_tpu.parallel import parse_strategy, setup_mesh
    from everyvoice_tpu.train import HiFiGANTrainer

    config = _load_config("spec-to-wav", config_path, config_args)
    train_list = config.training.filelist_loader(config.training.training_filelist)
    val_list = config.training.filelist_loader(config.training.validation_filelist)
    ds = HiFiGANDataset(train_list, config, finetune=config.training.finetune)
    vds = HiFiGANDataset(val_list, config, finetune=config.training.finetune)
    strat = parse_strategy(strategy)
    mesh = setup_mesh(accelerator, devices, nodes=nodes,
                      model_parallel=strat.model_parallel)
    trainer = HiFiGANTrainer(config, ds, vds, mesh=mesh,
                             gradient_clip_val=gradient_clip_val,
                             fsdp=strat.fsdp, compute_dtype=compute_precision)
    trainer.fit(profile_steps=profile_steps,
                steps_per_execution=steps_per_execution)
    click.echo(f"Training complete; checkpoints at {trainer.ckpt_dir}")


@train.command("text-to-wav")
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
@click.option("--mode", type=click.Choice(["first", "second"]), default="first")
@_common_train_options
def train_text_to_wav(config_path, mode, config_args, accelerator, devices,
                      nodes, strategy, gradient_clip_val, profile_steps,
                      steps_per_execution, compute_precision):
    """Train a StyleTTS2-class end-to-end model (two stages)."""
    from everyvoice_tpu.dataloader import StyleTTS2Dataset
    from everyvoice_tpu.models.styletts2.train import StyleTTS2Trainer
    from everyvoice_tpu.parallel import parse_strategy, setup_mesh
    from everyvoice_tpu.text.lookups import lookuptables_from_data

    config = _load_config("text-to-wav", config_path, config_args)
    train_list = config.training.filelist_loader(config.training.training_filelist)
    val_list = config.training.filelist_loader(config.training.validation_filelist)
    lang2id, _ = lookuptables_from_data((train_list, val_list))
    ds = StyleTTS2Dataset(train_list, config)
    vds = StyleTTS2Dataset(val_list, config, text_processor=ds.text_processor)
    strat = parse_strategy(strategy)
    mesh = setup_mesh(accelerator, devices, nodes=nodes,
                      model_parallel=strat.model_parallel)
    trainer = StyleTTS2Trainer(config, ds, vds, lang2id=lang2id, mesh=mesh,
                               mode=mode, gradient_clip_val=gradient_clip_val,
                               fsdp=strat.fsdp, compute_dtype=compute_precision)
    trainer.fit(profile_steps=profile_steps,
                steps_per_execution=steps_per_execution)
    click.echo(f"Stage {mode} training complete; checkpoints at {trainer.ckpt_dir}")


# ---------------------------------------------------------------------------
# synthesize


@main.group()
def synthesize():
    """Synthesize speech from text or spectrograms."""


@synthesize.command("from-text")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("-t", "--text", multiple=True, help="Text(s) to synthesize.")
@click.option("-f", "--filelist", type=click.Path(exists=True, path_type=Path),
              default=None, help="Filelist with texts to synthesize.")
@click.option("-l", "--language", default=None)
@click.option("-s", "--speaker", default=None)
@click.option("-D", "--duration-control", default=1.0)
@click.option("-O", "--output-type", "output_types", multiple=True,
              type=click.Choice(["wav", "spec", "textgrid", "readalong-xml",
                                 "readalong-html"]),
              default=("wav",))
@click.option("--vocoder-path", "--model", "vocoder_path",
              type=click.Path(exists=True, path_type=Path), default=None)
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              default=Path("synthesis_output"))
@click.option("--teacher-forcing-directory", type=click.Path(path_type=Path),
              default=None)
@click.option("--style-reference", type=click.Path(exists=True, path_type=Path),
              default=None, help="Reference wav for GST style conditioning.")
def synthesize_from_text(model_path, text, filelist, language, speaker,
                         duration_control, output_types, vocoder_path,
                         output_dir, teacher_forcing_directory,
                         style_reference):
    """Text → mel (→ wav with a vocoder)."""
    from everyvoice_tpu.models.fs2.synthesize import Synthesizer

    texts = list(text)
    basenames = None
    if filelist is not None:
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        rows = generic_psv_filelist_reader(filelist)
        texts += [r.get("characters") or r.get("text") or "" for r in rows]
        basenames = [r.get("basename") for r in rows]
    if not texts:
        raise click.ClickException("Provide --text or --filelist")
    # StyleTTS2 checkpoints synthesize waveforms directly (no vocoder).
    from everyvoice_tpu.train.checkpoint import load_checkpoint_header

    try:
        model_kind = load_checkpoint_header(model_path)["model_info"]["name"]
    except ValueError as e:  # not a checkpoint / newer format version
        raise click.ClickException(str(e)) from None
    if model_kind == "StyleTTS2Module":
        import numpy as np

        from everyvoice_tpu.dsp import write_wav
        from everyvoice_tpu.models.styletts2.synthesize import (
            load_styletts2_model,
            synthesize_text,
        )
        from everyvoice_tpu.utils import slugify, truncate_basename

        model, params, st2_config, tp, _ = load_styletts2_model(model_path)
        out = Path(output_dir) / "wav"
        out.mkdir(parents=True, exist_ok=True)
        sr = st2_config.preprocessing.audio.output_sampling_rate
        for i, t in enumerate(texts):
            wav = synthesize_text(model, params, st2_config, tp, t,
                                  language=language)
            base = (basenames[i] if basenames and i < len(basenames)
                    else truncate_basename(slugify(t)))
            path = out / f"{base}--{speaker or 'default'}--{language or 'default'}.wav"
            write_wav(path, np.asarray(wav), sr)
            click.echo(str(path))
        return
    synth = Synthesizer(model_path, vocoder_checkpoint=vocoder_path)
    if "wav" in output_types and vocoder_path is None:
        raise click.ClickException(
            "wav output requires --vocoder-path (or synthesize spec first)"
        )
    if teacher_forcing_directory is not None:
        # Vocoder-matching flow: write teacher-forced predicted mels for the
        # preprocessed corpus instead of free-running synthesis.
        from everyvoice_tpu.models.fs2.synthesize import (
            synthesize_teacher_forced_specs,
        )
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        rows = generic_psv_filelist_reader(filelist) if filelist else None
        if rows is None:
            raise click.ClickException(
                "--teacher-forcing-directory requires --filelist (the "
                "preprocessed training filelist)"
            )
        count = synthesize_teacher_forced_specs(
            model_path, rows, synth.config,
            output_dir=teacher_forcing_directory,
        )
        click.echo(
            f"Wrote {count} teacher-forced spectrograms to "
            f"{teacher_forcing_directory}/synthesized_spec"
        )
        return
    results = synth.synthesize(
        texts, language=language, speaker=speaker,
        duration_control=duration_control, style_reference=style_reference,
    )
    written = synth.write_outputs(
        results, output_dir, output_types, language=language, speaker=speaker,
        basenames=basenames,
    )
    for path in written:
        click.echo(str(path))


@synthesize.command("text-to-wav")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("-t", "--text", multiple=True, help="Text(s) to synthesize.")
@click.option("-f", "--filelist", type=click.Path(exists=True, path_type=Path),
              default=None, help="Filelist with texts to synthesize.")
@click.option("-l", "--language", default=None)
@click.option("-r", "--reference", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="Reference wav whose encoded style sets the speaker "
              "identity (blended with the diffusion-sampled style).")
@click.option("--diffusion-steps", default=5, show_default=True)
@click.option("--embedding-scale", default=1.0, show_default=True,
              help="Classifier-free guidance scale for the style diffusion.")
@click.option("--acoustic-blend", default=0.5, show_default=True,
              help="0=all reference acoustic style, 1=all sampled.")
@click.option("--prosody-blend", default=0.5, show_default=True,
              help="0=all reference prosodic style, 1=all sampled.")
@click.option("--seed", default=0, show_default=True)
@click.option("-O", "--output-type", "output_types", multiple=True,
              type=click.Choice(["wav"]), default=("wav",), show_default=True,
              help="StyleTTS2 is end-to-end; wav is the only output type.")
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              default=Path("synthesis_output"), show_default=True)
def synthesize_text_to_wav(model_path, text, filelist, language, reference,
                           diffusion_steps, embedding_scale, acoustic_blend,
                           prosody_blend, seed, output_types, output_dir):
    """End-to-end text → wav with a StyleTTS2 checkpoint
    (reference `everyvoice synthesize text-to-wav`,
    tests/regression/regression-test.sh:110)."""
    import jax
    import numpy as np

    from everyvoice_tpu.dsp import write_wav
    from everyvoice_tpu.models.styletts2.synthesize import (
        load_reference_style,
        load_styletts2_model,
        synthesize_text,
    )
    from everyvoice_tpu.train.checkpoint import load_checkpoint_header
    from everyvoice_tpu.utils import slugify, truncate_basename

    try:
        name = load_checkpoint_header(model_path)["model_info"]["name"]
    except ValueError as e:
        raise click.ClickException(str(e)) from None
    if name != "StyleTTS2Module":
        raise click.ClickException(
            f"synthesize text-to-wav takes a StyleTTS2 checkpoint, not {name}"
            " — use `synthesize from-text` for FastSpeech2 models."
        )
    texts = list(text)
    basenames = None
    if filelist is not None:
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        rows = generic_psv_filelist_reader(filelist)
        texts += [r.get("characters") or r.get("text") or "" for r in rows]
        basenames = [r.get("basename") for r in rows]
    if not texts:
        raise click.ClickException("Provide --text or --filelist")
    model, params, st2_config, tp, _ = load_styletts2_model(model_path)
    ref_styles = None
    if reference is not None:
        ref_styles = load_reference_style(model, params, reference, st2_config)
    out = Path(output_dir) / "wav"
    out.mkdir(parents=True, exist_ok=True)
    sr = st2_config.preprocessing.audio.output_sampling_rate
    for i, t in enumerate(texts):
        wav = synthesize_text(
            model, params, st2_config, tp, t, language=language,
            ref_styles=ref_styles, diffusion_steps=diffusion_steps,
            embedding_scale=embedding_scale, acoustic_blend=acoustic_blend,
            prosody_blend=prosody_blend, rng=jax.random.PRNGKey(seed),
        )
        base = (basenames[i] if basenames and i < len(basenames)
                else truncate_basename(slugify(t)))
        path = out / f"{base}--default--{language or 'default'}.wav"
        write_wav(path, np.asarray(wav), sr)
        click.echo(str(path))


@synthesize.command("from-spec")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("-i", "--input-dir", type=click.Path(exists=True, path_type=Path),
              default=Path("synthesis_output/synthesized_spec"))
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              default=Path("synthesis_output"))
def synthesize_from_spec(model_path, input_dir, output_dir):
    """Copy synthesis: mel spectrogram files → wav (vocoder only)."""
    import numpy as np

    from everyvoice_tpu.dsp import write_wav
    from everyvoice_tpu.models.fs2.synthesize import load_vocoder_from_checkpoint

    generator, params, config = load_vocoder_from_checkpoint(model_path)
    sr = config.preprocessing.audio.output_sampling_rate
    out = Path(output_dir) / "wav"
    out.mkdir(parents=True, exist_ok=True)
    import jax.numpy as jnp

    count = 0
    for spec_path in sorted(Path(input_dir).glob("*.npy")):
        mel = np.load(spec_path).T[None, ...]  # (1, T, M)
        wav = np.asarray(generator.apply(params, jnp.asarray(mel)))[0]
        stem = spec_path.stem.replace("--spec-pred", "")
        write_wav(out / f"{stem}.wav", wav, sr)
        count += 1
        click.echo(str(out / f"{stem}.wav"))
    if count == 0:
        raise click.ClickException(f"No .npy spectrograms found in {input_dir}")


# ---------------------------------------------------------------------------
# export


@main.group()
def export():
    """Export models for serving."""


@export.command("spec-to-wav")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.argument("output_path", type=click.Path(path_type=Path))
def export_spec_to_wav(model_path, output_path):
    """Strip discriminators/optimizer state from a vocoder checkpoint."""
    from everyvoice_tpu.models.fs2.synthesize import export_generator

    path = export_generator(model_path, output_path)
    click.echo(f"Exported generator to {path}")


# ---------------------------------------------------------------------------
# checkpoint inspection


@main.group()
def checkpoint():
    """Inspect or edit checkpoints."""


@checkpoint.command()
@click.argument("checkpoint_path", type=click.Path(exists=True, path_type=Path))
@click.option("--show-config/--no-show-config", default=True)
@click.option("--show-architecture", is_flag=True)
def inspect(checkpoint_path, show_config, show_architecture):
    """Print checkpoint metadata, config, and parameter counts."""
    from everyvoice_tpu.train.checkpoint import inspect_checkpoint

    try:
        report = inspect_checkpoint(checkpoint_path, show_config, show_architecture)
    except ValueError as e:
        raise click.ClickException(str(e)) from None
    click.echo(report)


@checkpoint.command("rename-speaker")
@click.argument("checkpoint_path", type=click.Path(exists=True, path_type=Path))
@click.argument("old_name")
@click.argument("new_name")
@click.argument("output_path", type=click.Path(path_type=Path))
def rename_speaker_cmd(checkpoint_path, old_name, new_name, output_path):
    """Rename a speaker in a checkpoint's speaker2id table."""
    from everyvoice_tpu.train.checkpoint import rename_speaker

    try:
        rename_speaker(checkpoint_path, old_name, new_name, output_path)
    except ValueError as e:
        raise click.ClickException(str(e)) from None
    click.echo(f"Wrote {output_path}")


# ---------------------------------------------------------------------------
# g2p


@main.command()
@click.argument("lang_id")
@click.argument("text")
def g2p(lang_id, text):
    """Convert text to phones with the G2P engine for LANG_ID."""
    from everyvoice_tpu.text.phonemizer import get_g2p_engine

    engine = get_g2p_engine(lang_id)
    click.echo(" ".join(engine(text)))


# ---------------------------------------------------------------------------
# check


@main.group()
def check():
    """Data and configuration checks."""


@check.command("text-config")
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
@click.option("-f", "--filelist", type=click.Path(exists=True, path_type=Path),
              required=True)
def check_text_config(config_path, filelist):
    """Report symbols found in the data but missing from the config."""
    from collections import Counter

    from everyvoice_tpu.config import TextConfig
    from everyvoice_tpu.text import TextProcessor
    from everyvoice_tpu.utils import generic_psv_filelist_reader, load_config_file

    data = load_config_file(config_path)
    config = TextConfig(**data)
    tp = TextProcessor(config)
    missing: Counter = Counter()
    for row in generic_psv_filelist_reader(filelist):
        text = row.get("characters") or row.get("text") or ""
        normalized = tp.normalize_text(text)
        for run in tp.get_missing_symbols(normalized, quiet=True):
            # Report individual missing graphemes, not whole unmatched
            # words, so each line maps to one symbol to declare (parity:
            # reference check_group.py:190-297).
            from everyvoice_tpu.text.utils import guess_graphemes_in_text

            for sym in guess_graphemes_in_text(run):
                missing[sym] += 1
    if not missing:
        click.echo("No missing symbols — your configuration covers the data.")
    else:
        click.echo("Missing symbols (symbol: count):")
        for sym, count in missing.most_common():
            click.echo(f"  {sym!r}: {count}")
        sys.exit(1)


@check.command("pretrained-symbols")
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
def check_pretrained_symbols(config_path):
    """Compare config symbols against a frozen pretrained symbol table and
    suggest substitutions (for StyleTTS2 finetuning)."""
    from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
    from everyvoice_tpu.text.utils_heavy import suggest_symbol_mapping

    config = StyleTTS2Config.load_config_from_path(config_path)
    pretrained = config.pretrained.pretrained_symbols
    if not pretrained:
        raise click.ClickException(
            "No pretrained_symbols declared in the config's pretrained section."
        )
    user_symbols = sorted(
        s for s in config.text.symbols.all_except_punctuation
        # Internal control tokens (<SIL> and friends) are handled by the
        # model's own tables, not the pretrained symbol inventory.
        if not (s.startswith("<") and s.endswith(">"))
    )
    missing = [s for s in user_symbols if s not in set(pretrained)]
    if not missing:
        click.echo("All your symbols exist in the pretrained symbol table.")
        return
    click.echo(f"{len(missing)} symbol(s) are not in the pretrained table.")
    mapping = suggest_symbol_mapping(user_symbols, pretrained)
    click.echo("Suggested substitutions (add as to_replace rules):")
    for user_sym, repl in sorted(mapping.items()):
        click.echo(f"  {user_sym!r} -> {repl!r}")
    sys.exit(1)


@check.command("data")
@click.argument("config_path", type=click.Path(exists=True, path_type=Path))
@click.option("--model-path", type=click.Path(exists=True, path_type=Path),
              required=True, help="A (partially) trained FastSpeech2 checkpoint.")
@click.option("-o", "--output", type=click.Path(path_type=Path),
              default=Path("checked-data.json"))
def check_data(config_path, model_path, output):
    """Score every item's losses with a trained model to find bad data
    (parity: fs2.cli.check_data via reference check_group.py:15-50)."""
    import numpy as np

    import jax.numpy as jnp

    from everyvoice_tpu.dataloader import FastSpeech2Dataset
    from everyvoice_tpu.models.fs2.loss import compute_fs2_losses
    from everyvoice_tpu.models.fs2.synthesize import load_fs2_from_checkpoint

    model, params, ckpt_config, tp, lang2id, speaker2id = (
        load_fs2_from_checkpoint(model_path)
    )
    config = _load_config("text-to-spec", config_path, ())
    train_list = config.training.filelist_loader(config.training.training_filelist)
    ds = FastSpeech2Dataset(train_list, config, lang2id, speaker2id,
                            text_processor=tp)
    rows = []
    for i in range(len(ds)):
        item = ds.load_item(i)
        batch = ds.pad_batch([item], len(item["text"]), model.max_frames)
        batch.pop("basenames")
        out = model.apply(
            params,
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
            mel=jnp.asarray(batch["mel"]),
            mel_lengths=jnp.asarray(batch["mel_lengths"]),
            attn_prior=(jnp.asarray(batch["attn_prior"])
                        if "attn_prior" in batch else None),
            pitch=jnp.asarray(batch["pitch"]),
            energy=jnp.asarray(batch["energy"]),
        )
        losses = compute_fs2_losses(
            out, {k: jnp.asarray(v) for k, v in batch.items()}, {},
            learn_alignment=config.model.learn_alignment,
        )
        rows.append(
            {"basename": item["basename"],
             **{k: float(v) for k, v in losses.items()}}
        )
    rows.sort(key=lambda r: -r["total"])
    Path(output).write_text(json.dumps(rows, indent=1), encoding="utf8")
    click.echo(f"Wrote per-item loss report to {output}")
    click.echo("Worst 5 items by total loss:")
    for row in rows[:5]:
        click.echo(f"  {row['basename']}: {row['total']:.4f}")


# ---------------------------------------------------------------------------
# update-schemas


@main.command("update-schemas")
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              default=Path("everyvoice_tpu/.schema"))
def update_schemas(output_dir):
    """Export versioned JSON schemas for every config type."""
    from everyvoice_tpu import CONFIG_SCHEMA_VERSION
    from everyvoice_tpu.config import PreprocessingConfig, TextConfig
    from everyvoice_tpu.models.fs2.config import FastSpeech2Config
    from everyvoice_tpu.models.hifigan.config import HiFiGANConfig
    from everyvoice_tpu.models.styletts2.config import StyleTTS2Config

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    schemas = {
        "everyvoice-shared-data": PreprocessingConfig,
        "everyvoice-shared-text": TextConfig,
        "everyvoice-text-to-spec": FastSpeech2Config,
        "everyvoice-spec-to-wav": HiFiGANConfig,
        "everyvoice-text-to-wav": StyleTTS2Config,
    }
    for name, cls in schemas.items():
        path = output_dir / f"{name}-{CONFIG_SCHEMA_VERSION}.json"
        path.write_text(
            json.dumps(cls.model_json_schema(), indent=2, ensure_ascii=False)
            + "\n",
            encoding="utf8",
        )
        click.echo(str(path))


# ---------------------------------------------------------------------------
# demo / evaluate / segment / fetch-pretrained


@main.command()
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("-V", "--vocoder", "--vocoder-path", "vocoder_path",
              type=click.Path(exists=True, path_type=Path), default=None,
              help="[FastSpeech2] Trained vocoder checkpoint; required when "
              "MODEL_PATH is a FastSpeech2 model.")
@click.option("-s", "--speaker", "speakers", multiple=True,
              help="[FastSpeech2] Speaker to expose in the demo UI (repeat "
              "for several; default: every speaker in the model).")
@click.option("-l", "--language", "languages", multiple=True,
              help="Language to expose in the demo UI (repeat for several; "
              "default: every language in the model).")
@click.option("-O", "--output-format", "output_formats", multiple=True,
              type=click.Choice(("all", "wav", "spec", "textgrid",
                                 "readalong-xml", "readalong-html")),
              help="[FastSpeech2] Output format to expose in the demo UI "
              "(repeat for several; default: all).")
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              default=Path("synthesis_output"), show_default=True,
              help="Directory where the demo writes synthesized files.")
@click.option("-R", "--ref-speaker", "ref_speakers", multiple=True,
              help="[StyleTTS2] Named reference speaker as "
              "'Display Name=path/to/audio.wav' (repeat for several); their "
              "style vectors are precomputed at startup.")
@click.option("-r", "--reference", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="[StyleTTS2] Default reference audio that sets the "
              "initial speaker style.")
@click.option("-p", "--port", default=7860, show_default=True)
@click.option("-n", "--server-name", default="0.0.0.0", show_default=True,
              help="Host/IP address to bind the demo server to.")
@click.option("-a", "--accelerator", default="auto", show_default=True,
              help="Device to serve on: auto, cpu, or tpu.")
@click.option("--share", is_flag=True, default=False,
              help="(Unsupported) The reference publishes via a Gradio "
              "tunnel; this server has no tunnel service.")
@click.option("--allowlist", type=click.Path(path_type=Path), default=None,
              help="Text file of allowed words/utterances (one per line); "
              "everything else is rejected. Mutually exclusive with "
              "--denylist.")
@click.option("--denylist", type=click.Path(path_type=Path), default=None,
              help="Text file of disallowed words (one per line). A denylist "
              "is easy to bypass; prefer --allowlist for real control.")
@click.option("--ref-audio-dir", type=click.Path(path_type=Path), default=None,
              help="[StyleTTS2] Directory of reference speaker wavs (each "
              "*.wav becomes a named speaker).")
@click.option("--ui-config", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="JSON with UI label overrides; 'speakers'/'languages' "
              "entries restrict the dropdowns to their keys and rename them "
              "to their values.")
def demo(model_path, vocoder_path, speakers, languages, output_formats,
         output_dir, ref_speakers, reference, port, server_name, accelerator,
         share, allowlist, denylist, ref_audio_dir, ui_config):
    """Serve an interactive synthesis demo over HTTP (model type is
    auto-detected from the checkpoint)."""
    if share:
        raise click.ClickException(
            "--share is not supported: there is no tunnel service here. "
            "Bind a public interface with --server-name 0.0.0.0 and expose "
            "the port instead."
        )
    if allowlist and denylist:
        raise click.ClickException(
            "Provide either --allowlist or --denylist, not both."
        )
    _pin_device(accelerator)
    from everyvoice_tpu.demo.app import create_demo_app_auto, parse_ref_speakers

    ui_labels = None
    if ui_config:
        try:
            ui_labels = json.loads(Path(ui_config).read_text(encoding="utf8"))
        except json.JSONDecodeError as e:
            raise click.ClickException(
                f"--ui-config {ui_config} is not valid JSON: {e}"
            ) from e
        if not isinstance(ui_labels, dict):
            raise click.ClickException(
                "--ui-config must contain a JSON object of label overrides"
            )
    try:
        app = create_demo_app_auto(
            model_path, vocoder_path=vocoder_path, ref_audio_dir=ref_audio_dir,
            allowlist=allowlist, denylist=denylist, ui_labels=ui_labels,
            speakers=list(speakers) or None,
            languages=list(languages) or None,
            output_formats=list(output_formats) or None,
            output_dir=output_dir,
            ref_speakers=parse_ref_speakers(ref_speakers),
            default_reference=reference,
        )
    except ValueError as e:
        raise click.ClickException(str(e)) from e
    click.echo(f"Serving demo at http://{server_name}:{port}")
    app.serve(host=server_name, port=port)


@main.command()
@click.argument("wav_dir", type=click.Path(exists=True, path_type=Path),
                metavar="[WAV_DIR_OR_FILE]", required=False, default=None)
@click.option("-f", "--audio-file", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="A single audio file to evaluate (reference -f spelling).")
@click.option("-d", "--audio-directory",
              type=click.Path(exists=True, path_type=Path), default=None,
              help="A directory of audio files to evaluate "
              "(reference -d spelling).")
@click.option("-g", "--reference-dir", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="Ground-truth wavs (same filenames) for intrusive metrics.")
@click.option("-r", "--non-matching-reference", "-n",
              "--non-matching-references", "non_matching_references",
              type=click.Path(exists=True, path_type=Path), default=None,
              help="A clean speech wav (or directory of wavs, any content) "
              "used as non-matching reference for subjective MOS estimation "
              "(requires torchaudio SQUIM weights).")
@click.option("-o", "--output", type=click.Path(path_type=Path),
              default=Path("evaluation.json"))
def evaluate(wav_dir, audio_file, audio_directory, reference_dir,
             non_matching_references, output):
    """Objective evaluation (SI-SDR/STOI + signal reports) and, when
    available, SQUIM objective/subjective-MOS scores of synthesized wavs;
    intrusive metrics require --reference-dir."""
    from everyvoice_tpu.evaluation import evaluate_directory

    # The reference requires exactly one of -f/-d (cli.py:293-300); we also
    # accept the positional spelling for either.
    targets = [p for p in (wav_dir, audio_file, audio_directory)
               if p is not None]
    if len(targets) != 1:
        raise click.ClickException(
            "Please choose to evaluate either a single file or an entire "
            "directory (one of WAV_DIR_OR_FILE, --audio-file, or "
            "--audio-directory)."
        )
    results = evaluate_directory(
        targets[0], reference_dir=reference_dir,
        non_matching_reference_dir=non_matching_references,
    )
    Path(output).write_text(json.dumps(results, indent=1), encoding="utf8")
    n_quality = sum(1 for r in results if r.get("has_quality_metrics"))
    click.echo(f"Wrote {output} ({len(results)} files)")
    # Mean +/- std summary over numeric metrics (the reference prints the
    # same aggregate table, cli.py:338-360).
    numeric: dict = {}
    for row in results:
        for key, value in row.items():
            if isinstance(value, (int, float)) and not isinstance(value, bool):
                numeric.setdefault(key, []).append(float(value))
    if numeric:
        click.echo("Averages:")
        for key in sorted(numeric):
            values = numeric[key]
            mean = sum(values) / len(values)
            std = (sum((v - mean) ** 2 for v in values) / len(values)) ** 0.5
            click.echo(f"  {key}: {mean:.4f} ± {std:.4f} (n={len(values)})")
    if results and n_quality == 0:
        click.echo(
            "WARNING: only signal diagnostics were produced — no quality "
            "scores. Pass --reference-dir for intrusive SI-SDR/STOI, or "
            "install torchaudio with cached SQUIM weights (and optionally "
            "--non-matching-references for subjective MOS).", err=True,
        )


@main.group()
def segment():
    """Align and segment long audio with a CTC aligner."""


@segment.command("align")
@click.argument("audio", type=click.Path(exists=True, path_type=Path))
@click.argument("transcript", type=click.Path(exists=True, path_type=Path))
@click.option("-o", "--output", type=click.Path(path_type=Path),
              default=Path("alignment.TextGrid"))
@click.option("--acoustic-model", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="Locally staged wav2vec2-CTC model directory "
                   "(default: $EVERYVOICE_WAV2VEC2_PATH). Runs TPU-native "
                   "after one-time weight conversion.")
def segment_align(audio, transcript, output, acoustic_model):
    """CTC-align a transcript against long audio, producing a TextGrid."""
    from everyvoice_tpu.models.aligner.segment import align_long_audio

    align_long_audio(
        audio, transcript, output,
        acoustic_model=str(acoustic_model) if acoustic_model else None,
    )
    click.echo(f"Wrote {output}")


@segment.command("extract")
@click.argument("audio", type=click.Path(exists=True, path_type=Path))
@click.argument("textgrid", type=click.Path(exists=True, path_type=Path))
@click.option("-o", "--output-dir", type=click.Path(path_type=Path),
              default=Path("segments"), show_default=True)
@click.option("--prefix", default="segment", show_default=True)
def segment_extract(audio, textgrid, output_dir, prefix):
    """Cut a TextGrid's aligned intervals out of long audio into per-segment
    wavs plus a metadata filelist (parity: `everyvoice segment extract`,
    reference cli.py:392-415)."""
    from everyvoice_tpu.models.aligner.segment import (
        extract_segments,
        parse_textgrid,
    )

    segments = parse_textgrid(textgrid)
    if not segments:
        raise click.ClickException(f"No non-empty intervals found in {textgrid}")
    rows = extract_segments(audio, segments, output_dir, prefix=prefix)
    click.echo(
        f"Wrote {len(rows)} segments to {output_dir}/wavs and "
        f"{output_dir}/metadata.psv"
    )


@main.command("fetch-pretrained")
@click.argument("model_kind", type=click.Choice(list(MODEL_CONFIGS)))
@click.option("--config-path", type=click.Path(exists=True, path_type=Path),
              default=None,
              help="Project text-to-wav config; defaults to the schema's "
              "standard repo ids.")
@click.option("--output-dir", type=click.Path(path_type=Path),
              default=Path.home() / ".cache" / "everyvoice_tpu" / "pretrained",
              show_default=True)
def fetch_pretrained(model_kind, config_path, output_dir):
    """Download the pretrained StyleTTS2 components — JDC F0 net, ASR
    aligner, multilingual PL-BERT, and the WavLM SLM — from HuggingFace
    into a local cache, then print the config overrides pointing at them
    (parity: reference cli.py:622-644 fetch-pretrained text-to-wav)."""
    if model_kind != "text-to-wav":
        raise click.ClickException(
            "Only text-to-wav (StyleTTS2) has pretrained components to fetch."
        )
    if config_path is not None:
        config = _load_config("text-to-wav", config_path, ())
    else:
        from everyvoice_tpu.models.styletts2.config import StyleTTS2Config

        config = StyleTTS2Config(
            contact={
                "contact_name": "fetch-pretrained",
                "contact_email": "noreply@everyvoice.ca",
            }
        )
    pre = config.pretrained
    slm_repo = config.model.slm.model
    output_dir = Path(output_dir).expanduser()
    output_dir.mkdir(parents=True, exist_ok=True)

    try:
        from huggingface_hub import hf_hub_download, snapshot_download

        fetched = {}
        fetched["pretrained.f0.local_path"] = hf_hub_download(
            pre.f0.repo_id, pre.f0.filename, cache_dir=output_dir
        )
        fetched["pretrained.asr.local_checkpoint"] = hf_hub_download(
            pre.asr.repo_id, pre.asr.checkpoint_filename, cache_dir=output_dir
        )
        fetched["pretrained.asr.local_config"] = hf_hub_download(
            pre.asr.repo_id, pre.asr.config_filename, cache_dir=output_dir
        )
        fetched["pretrained.plbert.local_checkpoint"] = hf_hub_download(
            pre.plbert.repo_id, pre.plbert.checkpoint_filename,
            cache_dir=output_dir,
        )
        fetched["pretrained.plbert.local_config"] = hf_hub_download(
            pre.plbert.repo_id, pre.plbert.config_filename,
            cache_dir=output_dir,
        )
        fetched["model.slm.model"] = snapshot_download(
            slm_repo, cache_dir=output_dir
        )
    except Exception as exc:
        raise click.ClickException(
            f"Download failed ({exc}). If this machine has no network "
            "egress, stage the files manually and set the "
            "pretrained.*.local_* / model.slm.model config fields."
        ) from exc
    click.echo(
        "Fetched pretrained components. Pass these overrides to "
        "`train text-to-wav` (or set them in the config) to train with "
        "them — the JDC F0 net provides frozen F0 targets, the ASR "
        "initializes the TMA aligner, PL-BERT initializes the text-context "
        "encoder, and WavLM enables SLM-adversarial training:"
    )
    for key, value in fetched.items():
        click.echo(f"  -c {key}={value}")


if __name__ == "__main__":
    main()
