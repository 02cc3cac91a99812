"""Training harness: jitted data-parallel train loops for the model zoo
(role parity: everyvoice/base_cli/helpers.py:173 train_base_command +
Lightning Trainer, rebuilt as explicit functional JAX loops).

Shared mechanics: mesh data parallelism (params replicated, batch sharded,
XLA-inserted gradient psum), checkpoint-last + top-k-monitored retention,
metrics JSONL + hparams.yaml in the reference's
`<save_dir>/<name>/<version>/<sub_dir>` layout, and three-way resume
semantics (fresh / finetune weights-only / full state).
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from everyvoice_tpu.logger import logger
from everyvoice_tpu.parallel.mesh import (
    compress_for_transfer,
    make_mesh,
    pad_batch_for_eval,
    pad_batch_to_devices,
    replicate_tree,
    shard_batch,
    shard_stacked_batch,
    stack_batches,
)


def _resolve_val_interval(value, steps_per_epoch: int) -> int:
    """Validation cadence in optimizer steps. Lightning semantics
    (reference base_cli: Trainer(val_check_interval=...)): an int is
    "every N steps"; a float <= 1.0 is a fraction of an epoch.

    >>> _resolve_val_interval(500, 1000)
    500
    >>> _resolve_val_interval(0.25, 1000)
    250
    >>> _resolve_val_interval(None, 1000)
    500
    >>> _resolve_val_interval(1.0, 7)
    7
    """
    if value is None:
        return 500
    if isinstance(value, float) and value <= 1.0:
        return max(1, int(value * max(steps_per_epoch, 1)))
    return max(1, int(value))


def _decompress(batch: dict) -> dict:
    """Undo compress_for_transfer inside jit (f16 -> f32, fused away)."""
    return {
        k: v.astype(jnp.float32)
        if getattr(v, "dtype", None) == jnp.float16
        else v
        for k, v in batch.items()
    }
from everyvoice_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from everyvoice_tpu.train.optim import build_optimizer



# Shared with the serving path; see utils/precision.py for the policy.
from everyvoice_tpu.utils.precision import (  # noqa: E402
    mesh_device as _mesh_device,
    resolve_compute_dtype,
)


def training_rng(seed: int):
    """Step rng for dropout/noise keys, using the TPU's hardware RNG
    ('rbg') instead of the default software threefry: generating dropout
    masks with threefry costs ~35% of an FS2 train step (measured
    47.5 -> 30.9 ms/step on v5e). Deterministic per backend; falls back to
    threefry where 'rbg' is unavailable."""
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:
        return jax.random.PRNGKey(seed)


class TrainerBase:
    model_name = "Base"
    monitor = "validation/total"
    # Filename of the always-current checkpoint; the StyleTTS2 trainer
    # overrides it per stage ("stage-1-last.ckpt"/"stage-2-last.ckpt",
    # reference tests/regression/regression-test.sh:99-105).
    last_checkpoint_name = "last.ckpt"

    def __init__(self, config, mesh=None, run_dir: Optional[Path] = None,
                 fsdp: bool = False):
        self.config = config
        # ZeRO-3 parameter/optimizer sharding over the data axis
        # (--strategy fsdp); False = reference-parity DDP replication.
        self.fsdp = fsdp
        self.training_config = config.training
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        if run_dir is None:
            lc = config.training.logger
            run_dir = Path(lc.save_dir) / lc.name / lc.version / lc.sub_dir
        self.run_dir = Path(run_dir)
        self.ckpt_dir = self.run_dir / "checkpoints"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_path = self.run_dir / "metrics.jsonl"
        self.global_step = 0
        self.epoch = 0
        self._topk: list = []  # (metric_value, path)
        self.save_hparams()
        from everyvoice_tpu.train.tensorboard import SummaryWriter

        self.tb_writer = SummaryWriter(self.run_dir)

    # -- bookkeeping -----------------------------------------------------
    def save_hparams(self):
        import yaml

        with open(self.run_dir / "hparams.yaml", "w", encoding="utf8") as f:
            yaml.safe_dump(self.config.model_checkpoint_dump(), f, allow_unicode=True)

    def log_metrics(self, metrics: dict, step: int):
        # One fused device→host transfer for all metric scalars (per-value
        # float() would pay one device round trip each).
        metrics = jax.device_get(metrics)
        record = {"step": step, "epoch": self.epoch, "time": time.time()}
        record.update(
            {k: float(v) for k, v in metrics.items() if np.isscalar(v) or hasattr(v, "item")}
        )
        with open(self.metrics_path, "a", encoding="utf8") as f:
            f.write(json.dumps(record) + "\n")
        self.tb_writer.add_scalars(metrics, step)
        self.tb_writer.flush()

    def maybe_checkpoint(self, metric_value: float, params, opt_state, extra=None):
        keep = self.training_config.save_top_k_ckpts
        last_path = self.ckpt_dir / self.last_checkpoint_name
        self._save(last_path, params, opt_state, extra)
        if keep <= 0:
            return
        if len(self._topk) >= keep and metric_value >= self._topk[-1][0]:
            # Would be evicted immediately — don't write it at all. (Also
            # avoids unlinking a file the async writer thread is still
            # about to create, which would leak it on disk.)
            return
        tagged = self.ckpt_dir / (
            f"epoch={self.epoch}-step={self.global_step}-"
            f"loss={metric_value:.4f}.ckpt"
        )
        self._save(tagged, params, opt_state, extra)
        self._topk.append((metric_value, tagged))
        self._topk.sort(key=lambda pair: pair[0])
        while len(self._topk) > keep:
            # Evicted checkpoints were written by earlier writer threads,
            # which _save joined before starting the current one — the file
            # exists, so the unlink really removes it.
            _, worst = self._topk.pop()
            worst.unlink(missing_ok=True)

    def _save(self, path, params, opt_state, extra=None):
        """Checkpoint asynchronously: device→host transfer happens here (so
        the state snapshot is consistent), serialization + disk IO run on a
        single background writer thread so the train loop keeps stepping —
        the role orbax's async checkpointer plays."""
        import threading

        import jax

        params_host = jax.device_get(params)
        opt_host = jax.device_get(opt_state) if opt_state is not None else None
        step, epoch = self.global_step, self.epoch

        def write():
            save_checkpoint(
                path,
                self.model_name,
                self.config,
                params_host,
                step=step,
                epoch=epoch,
                opt_state=opt_host,
                lang2id=getattr(self, "lang2id", None),
                speaker2id=getattr(self, "speaker2id", None),
                stats=getattr(self, "stats", None),
                extra=extra,
            )

        # Serialize writers: wait for any previous write before starting the
        # next so checkpoint files are never interleaved.
        prev = getattr(self, "_ckpt_thread", None)
        if prev is not None:
            prev.join()
        thread = threading.Thread(target=write, daemon=False)
        thread.start()
        self._ckpt_thread = thread

    def wait_for_checkpoints(self):
        prev = getattr(self, "_ckpt_thread", None)
        if prev is not None:
            prev.join()

    # -- profiling (new TPU-native work; the reference has none, SURVEY.md §5)
    _profile_remaining = 0

    def start_profile(self, profile_steps: int) -> None:
        """Capture a jax profiler trace of the next `profile_steps` train
        steps into <run_dir>/profile (viewable in TensorBoard/Perfetto/xprof)."""
        if profile_steps <= 0:
            return
        import jax

        jax.profiler.start_trace(str(self.run_dir / "profile"))
        self._profile_remaining = profile_steps

    def tick_profile(self) -> None:
        if self._profile_remaining > 0:
            self._profile_remaining -= 1
            if self._profile_remaining == 0:
                import jax

                jax.profiler.stop_trace()
                logger.info(f"Wrote profiler trace to {self.run_dir}/profile")

    def load_finetune_checkpoint(self, params):
        """Config-diff-gated restore from training.finetune_checkpoint
        (reference base_cli/helpers.py:278-375): an architecture diff is a
        hard error, an optimizer diff keeps the weights but restarts the
        optimizer and counters, and otherwise the full trainer state
        (weights + optimizer + step/epoch) resumes."""
        from everyvoice_tpu.train.checkpoint import resume_mode

        path = self.training_config.finetune_checkpoint
        if path is None:
            return params, None
        ckpt = load_checkpoint(path)
        if ckpt["model_info"]["name"] != self.model_name:
            raise ValueError(
                f"Checkpoint is a {ckpt['model_info']['name']}; expected "
                f"{self.model_name}"
            )
        old_config = ckpt.get("hyper_parameters", {}).get("config", {})
        new_config = (
            self.config.model_checkpoint_dump()
            if hasattr(self.config, "model_checkpoint_dump")
            else self.config
        )
        mode = resume_mode(old_config, new_config, self.model_name)
        if mode == "fresh_optimizer":
            logger.warning(
                f"Optimizer hyperparameters changed since '{path}' — keeping "
                "the checkpoint weights but restarting the optimizer, so "
                "training logs will start again from step 0/epoch 0."
            )
            return ckpt["state_dict"], None
        self.global_step = ckpt.get("global_step", 0)
        self.epoch = ckpt.get("epoch", 0)
        return ckpt["state_dict"], ckpt.get("optimizer_states")


class FastSpeech2Trainer(TrainerBase):
    model_name = "FastSpeech2"

    def __init__(self, config, dataset, val_dataset, lang2id, speaker2id,
                 stats=None, mesh=None, run_dir=None, gradient_clip_val=None,
                 fsdp=False, compute_dtype="auto"):
        super().__init__(config, mesh=mesh, run_dir=run_dir, fsdp=fsdp)
        from everyvoice_tpu.models.fs2.model import FastSpeech2

        self.dataset = dataset
        self.val_dataset = val_dataset
        self.lang2id = lang2id
        self.speaker2id = speaker2id
        self.stats = stats or {}
        # bf16 Conformer/conv compute on TPU (params, alignment encoder,
        # heads, and losses stay float32). See resolve_compute_dtype.
        self.compute_dtype = resolve_compute_dtype(
            compute_dtype, _mesh_device(self.mesh)
        )
        self.model = FastSpeech2.from_config(
            config,
            n_symbols=len(dataset.text_processor.symbols),
            n_speakers=max(len(speaker2id), 1),
            n_langs=max(len(lang2id), 1),
            compute_dtype=self.compute_dtype,
        )
        self.optimizer = build_optimizer(
            config.training.optimizer, self.model.dim,
            gradient_clip_val=gradient_clip_val,
        )
        self._viz_step = None
        self._vocoder = None  # lazy (generator, params) for audio logging
        self._train_step = None
        self._eval_step = None

    # -- jitted steps -----------------------------------------------------
    def _loss_weights(self) -> dict:
        t = self.training_config
        return {
            "mel": t.mel_loss_weight,
            "postnet": t.postnet_loss_weight,
            "pitch": t.pitch_loss_weight,
            "energy": t.energy_loss_weight,
            "duration": t.duration_loss_weight,
            "attn_ctc": t.attn_ctc_loss_weight,
            "attn_bin": t.attn_bin_loss_weight,
        }

    def _model_kwargs(self, batch: dict) -> dict:
        kwargs = dict(
            mel=batch["mel"],
            mel_lengths=batch["mel_lengths"],
            pitch=batch["pitch"],
            energy=batch["energy"],
            speaker_id=batch["speaker_id"],
            language_id=batch["language_id"],
        )
        if "attn_prior" in batch:
            kwargs["attn_prior"] = batch["attn_prior"]
        if "durations" in batch:
            kwargs["durations"] = batch["durations"]
        return kwargs

    def build_steps(self):
        from everyvoice_tpu.models.fs2.loss import compute_fs2_losses

        model = self.model
        optimizer = self.optimizer
        weights = self._loss_weights()
        learn_alignment = self.config.model.learn_alignment
        mel_kind = self.config.model.mel_loss.value
        model_kwargs = self._model_kwargs

        def loss_fn(params, batch, rng, bin_ramp, deterministic):
            batch = _decompress(batch)
            out = model.apply(
                params,
                batch["text"],
                batch["text_lengths"],
                deterministic=deterministic,
                rngs=None if deterministic else {"dropout": rng},
                **model_kwargs(batch),
            )
            losses = compute_fs2_losses(
                out, batch, weights, mel_loss_kind=mel_kind,
                learn_alignment=learn_alignment, bin_loss_ramp=bin_ramp,
            )
            return losses["total"], losses

        def step_body(params, opt_state, batch, rng, bin_ramp):
            rng, step_rng = jax.random.split(rng)
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, step_rng, bin_ramp, False
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses, rng

        train_step = jax.jit(step_body, donate_argnums=(0, 1))

        @partial(jax.jit, donate_argnums=(0, 1))
        def multi_train_step(params, opt_state, batches, rng, bin_ramp):
            # K optimizer steps in one dispatch: batches is a (K, batch, ...)
            # stacked super-batch, scanned on axis 0. Amortizes per-step
            # host/RPC overhead that dominates small-model training loops.
            def body(carry, batch):
                params, opt_state, rng = carry
                params, opt_state, losses, rng = step_body(
                    params, opt_state, batch, rng, bin_ramp
                )
                return (params, opt_state, rng), losses

            (params, opt_state, rng), losses = jax.lax.scan(
                body, (params, opt_state, rng), batches
            )
            # Report the last step's losses (matches per-step logging).
            losses = jax.tree_util.tree_map(lambda x: x[-1], losses)
            return params, opt_state, losses, rng

        @jax.jit
        def eval_step(params, batch):
            _, losses = loss_fn(params, batch, jax.random.PRNGKey(0), 1.0, True)
            return losses

        self._train_step = train_step
        self._multi_train_step = multi_train_step
        self._eval_step = eval_step

    def init_params(self, rng=None):
        rng = rng or jax.random.PRNGKey(0)
        try:
            batch = next(self.dataset.batches(2, shuffle=False))
        except StopIteration:
            raise RuntimeError(
                "The training dataset is empty — no usable items survived "
                "filtering (check filelists and preprocessed artifacts)."
            ) from None
        # jit the init: eager init dispatches hundreds of tiny ops, which is
        # prohibitively slow through remote-dispatch TPU runtimes.
        params = jax.jit(self.model.init)(
            {"params": rng, "dropout": rng},
            jnp.asarray(batch["text"]),
            jnp.asarray(batch["text_lengths"]),
            **{
                k: jnp.asarray(v)
                for k, v in self._model_kwargs(batch).items()
            },
        )
        return params

    def fit(self, max_steps: Optional[int] = None, log_every: int = 10,
            profile_steps: int = 0, steps_per_execution: int = 1):
        t = self.training_config
        max_steps = max_steps if max_steps is not None else t.max_steps
        spe = max(int(steps_per_execution), 1)
        self.build_steps()
        params = self.init_params()
        params, opt_restore = self.load_finetune_checkpoint(params)
        opt_state = self.optimizer.init(params)
        if opt_restore is not None:
            from flax import serialization

            opt_state = serialization.from_state_dict(opt_state, opt_restore)
        # DP layout by default; Megatron-style TP over the mesh's `model`
        # axis when it is non-trivial (--strategy tp<k>). Optimizer-state
        # layouts mirror the parameters via XLA sharding propagation.
        from everyvoice_tpu.parallel import shard_opt_state_like, shard_params

        params = shard_params(params, self.mesh, fsdp=self.fsdp)
        opt_state = shard_opt_state_like(
            jax.device_get(opt_state), self.optimizer.init, params
        )
        import zlib

        # crc32, not hash(): str.__hash__ is salted per process
        # (PYTHONHASHSEED), which would make runs non-reproducible.
        rng = training_rng(zlib.crc32(t.logger.name.encode("utf8")))

        val_interval = _resolve_val_interval(
            t.val_check_interval, len(self.dataset.items) // max(t.batch_size, 1)
        )
        stop = False
        dispatches = 0
        last_val_step = -1
        while not stop and self.epoch < t.max_epochs:
            steps_at_epoch_start = self.global_step
            seed = self.epoch
            weights = None
            if t.use_weighted_sampler:
                from everyvoice_tpu.dataloader import imbalanced_sample_weights

                labels = [
                    f'{it.get("language")}/{it.get("speaker")}'
                    for it in self.dataset.items
                ]
                weights = imbalanced_sample_weights(labels)
            from everyvoice_tpu.dataloader.prefetch import prefetch

            def device_batches():
                # Padding + host->device transfer happen on the prefetch
                # thread, overlapping the device step. With spe > 1, K
                # batches are stacked into one super-batch so one dispatch
                # runs K optimizer steps (lax.scan inside jit).
                group: list = []
                for host_batch in self.dataset.batches(
                    t.batch_size, shuffle=True, seed=seed, drop_last=True,
                    weights=weights,
                ):
                    host_batch.pop("basenames", None)
                    host_batch = pad_batch_to_devices(host_batch, self.n_devices)
                    host_batch = compress_for_transfer(
                        host_batch, ("mel", "attn_prior")
                    )
                    if spe <= 1:
                        yield 1, shard_batch(host_batch, self.mesh)
                    else:
                        group.append(host_batch)
                        if len(group) == spe:
                            yield spe, shard_stacked_batch(
                                stack_batches(group), self.mesh
                            )
                            group = []
                # Epoch leftovers run as single steps.
                for host_batch in group:
                    yield 1, shard_batch(host_batch, self.mesh)

            for n_steps, sharded in prefetch(device_batches()):
                bin_ramp = min(
                    1.0,
                    (self.epoch + 1) / max(t.attn_bin_loss_warmup_epochs, 1),
                )
                # Profile from the second dispatch (the first one compiles),
                # counted in dispatches so multi-step execution and resumed
                # runs (global_step > 0) still trigger it.
                if dispatches == 1 and profile_steps:
                    self.start_profile(profile_steps)
                step_fn = (
                    self._train_step if n_steps == 1 else self._multi_train_step
                )
                params, opt_state, losses, rng = step_fn(
                    params, opt_state, sharded, rng, bin_ramp
                )
                dispatches += 1
                prev_step = self.global_step
                self.global_step += n_steps
                self.tick_profile()
                if self.global_step // log_every > prev_step // log_every:
                    from everyvoice_tpu.train.optim import learning_rate_at

                    metrics = {f"training/{k}": v for k, v in losses.items()}
                    metrics["training/lr"] = learning_rate_at(
                        t.optimizer, self.global_step, self.model.dim
                    )
                    self.log_metrics(metrics, self.global_step)
                if self.global_step // val_interval > prev_step // val_interval:
                    val = self.validate(params)
                    last_val_step = self.global_step
                    self.log_metrics(
                        {f"validation/{k}": v for k, v in val.items()},
                        self.global_step,
                    )
                    self.maybe_checkpoint(val["total"], params, opt_state)
                if self.global_step >= max_steps:
                    stop = True
                    break
            if self.global_step == steps_at_epoch_start and not stop:
                raise RuntimeError(
                    "Epoch produced no training batches — the dataset is "
                    "empty (check filelists and preprocessed artifacts)."
                )
            self.epoch += 1
        # Always leave a final checkpoint behind — unless the last in-loop
        # validation already checkpointed this exact step.
        if last_val_step != self.global_step:
            val = self.validate(params)
            self.maybe_checkpoint(val["total"], params, opt_state)
        self.wait_for_checkpoints()
        return params

    def validate(self, params) -> dict:
        totals: dict = {}
        rows = 0
        # Validate at the training batch size; the trailing partial batch is
        # padded up to the SAME size (a smaller batch would give the jitted
        # eval step a second batch shape, costing an extra 20-40s XLA compile
        # per run on TPU), with pad rows 0-weighted in every loss term and in
        # the aggregation so duplicated items never bias the monitored loss.
        batch_size = max(self.training_config.batch_size, self.n_devices, 1)
        for batch in self.val_dataset.batches(batch_size, shuffle=False):
            batch.pop("basenames", None)
            batch, n_true = pad_batch_for_eval(
                batch, self.n_devices, batch_size
            )
            batch = compress_for_transfer(batch, ("mel", "attn_prior"))
            losses = jax.device_get(
                self._eval_step(params, shard_batch(batch, self.mesh))
            )
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v) * n_true
            rows += n_true
        self.log_validation_media(params)
        return {k: v / max(rows, 1) for k, v in totals.items()}

    # -- validation media (spectrogram images + vocoded audio, the role of
    # the reference's TensorBoard audio logging when training.vocoder_path
    # is set — docs/guides/fastspeech2.md:53)
    def log_validation_media(self, params) -> None:
        try:
            batch = next(self.val_dataset.batches(1, shuffle=False))
        except StopIteration:
            return
        batch.pop("basenames", None)
        if self._viz_step is None:
            model = self.model
            model_kwargs = self._model_kwargs

            @jax.jit
            def viz(p, b):
                out = model.apply(
                    p, b["text"], b["text_lengths"], **model_kwargs(b)
                )
                mel = out.get("postnet_mel", out["mel"])
                return mel

            self._viz_step = viz
        device_batch = {
            k: jnp.asarray(v) for k, v in batch.items() if hasattr(v, "shape")
        }
        pred = np.asarray(self._viz_step(params, device_batch))
        n_frames = int(batch["mel_lengths"][0])
        step = self.global_step
        self.tb_writer.add_mel(
            "validation/mel_predicted", pred[0][:n_frames], step
        )
        self.tb_writer.add_mel(
            "validation/mel_target", np.asarray(batch["mel"])[0][:n_frames], step
        )
        vocoder = self._maybe_vocoder()
        if vocoder is not None:
            generator, vparams, sample_rate = vocoder
            wav = np.asarray(
                generator.apply(vparams, jnp.asarray(pred[:1]))
            )[0]
            # Samples per input-rate frame: hop scaled by the output/input
            # rate ratio (the vocoder emits at output_sampling_rate).
            audio_cfg = self.config.preprocessing.audio
            hop = audio_cfg.fft_hop_size * max(
                audio_cfg.output_sampling_rate
                // audio_cfg.input_sampling_rate,
                1,
            )
            self.tb_writer.add_audio(
                "validation/audio_predicted",
                wav[: n_frames * hop],
                sample_rate,
                step,
            )
        self.tb_writer.flush()

    def _maybe_vocoder(self):
        if self._vocoder is None and self.training_config.vocoder_path:
            from everyvoice_tpu.models.fs2.synthesize import (
                load_vocoder_from_checkpoint,
            )

            generator, vparams, vconfig = load_vocoder_from_checkpoint(
                self.training_config.vocoder_path
            )
            self._vocoder = (
                generator, vparams,
                vconfig.preprocessing.audio.output_sampling_rate,
            )
        return self._vocoder


class HiFiGANTrainer(TrainerBase):
    model_name = "HiFiGAN"

    def __init__(self, config, dataset, val_dataset, mesh=None, run_dir=None,
                 gradient_clip_val=None, fsdp=False, compute_dtype="auto"):
        super().__init__(config, mesh=mesh, run_dir=run_dir, fsdp=fsdp)
        from everyvoice_tpu.models.hifigan.model import (
            HiFiGANGenerator,
            MultiPeriodDiscriminator,
            MultiScaleDiscriminator,
        )

        self.dataset = dataset
        self.val_dataset = val_dataset
        # bf16 conv compute on TPU (params/losses/opt state stay float32);
        # the GAN objective needs no loss scaling in bf16. See
        # resolve_compute_dtype.
        self.compute_dtype = resolve_compute_dtype(
            compute_dtype, _mesh_device(self.mesh)
        )
        self.generator = HiFiGANGenerator.from_config(
            config, compute_dtype=self.compute_dtype
        )
        self.mpd = MultiPeriodDiscriminator(
            periods=tuple(config.model.mpd_layers),
            compute_dtype=self.compute_dtype,
        )
        self.msd = MultiScaleDiscriminator(
            n_scales=config.model.msd_layers, compute_dtype=self.compute_dtype
        )
        self.gen_opt = build_optimizer(
            config.training.optimizer, gradient_clip_val=gradient_clip_val
        )
        self.disc_opt = build_optimizer(
            config.training.optimizer, gradient_clip_val=gradient_clip_val
        )
        self.gan_type = config.training.gan_type.value
        self.wgan_clip = config.training.wgan_clip_value
        self.audio_config = config.preprocessing.audio
        self._train_step = None

    def build_steps(self):
        from everyvoice_tpu.dsp import get_spectral_transform
        from everyvoice_tpu.dsp.spectral import dynamic_range_compression
        from everyvoice_tpu.models.hifigan.loss import (
            FEATURE_MATCHING_WEIGHT,
            MEL_LOSS_WEIGHT,
            discriminator_loss,
            feature_matching_loss,
            generator_adversarial_loss,
            mel_l1_loss,
        )

        a = self.audio_config
        rate_ratio = a.output_sampling_rate // a.input_sampling_rate
        hop = a.fft_hop_size * rate_ratio  # output-rate samples per mel frame
        segment = a.vocoder_segment_size
        seg_frames = segment // hop
        spec_type = a.spec_type if isinstance(a.spec_type, str) else a.spec_type.value
        mel_fn = get_spectral_transform(
            spec_type, a.n_fft, a.fft_window_size, hop,
            a.output_sampling_rate, a.n_mels, a.f_min, a.f_max,
        )
        del hop, seg_frames, segment  # segments are pre-cut by the dataloader
        generator, mpd, msd = self.generator, self.mpd, self.msd
        gen_opt, disc_opt = self.gen_opt, self.disc_opt
        gan_type, wgan_clip = self.gan_type, self.wgan_clip

        def gen_loss_fn(gen_params, disc_params, mel_segs, audio_segs, gan_on):
            fake = generator.apply(gen_params, mel_segs)
            mel_fake = dynamic_range_compression(mel_fn(fake))
            mel_real = dynamic_range_compression(mel_fn(audio_segs))
            loss_mel = mel_l1_loss(mel_real, mel_fake)
            mpd_r, mpd_fr = mpd.apply(disc_params["mpd"], audio_segs)
            mpd_f, mpd_ff = mpd.apply(disc_params["mpd"], fake)
            msd_r, msd_fr = msd.apply(disc_params["msd"], audio_segs)
            msd_f, msd_ff = msd.apply(disc_params["msd"], fake)
            loss_adv = generator_adversarial_loss(mpd_f + msd_f, gan_type)
            loss_fm = feature_matching_loss(mpd_fr + msd_fr, mpd_ff + msd_ff)
            total = MEL_LOSS_WEIGHT * loss_mel + gan_on * (
                loss_adv + FEATURE_MATCHING_WEIGHT * loss_fm
            )
            return total, {
                "gen/mel": loss_mel, "gen/adv": loss_adv, "gen/fm": loss_fm,
                "gen/total": total,
            }

        def disc_loss_fn(disc_params, gen_params, mel_segs, audio_segs):
            fake = jax.lax.stop_gradient(generator.apply(gen_params, mel_segs))
            mpd_r, _ = mpd.apply(disc_params["mpd"], audio_segs)
            mpd_f, _ = mpd.apply(disc_params["mpd"], fake)
            msd_r, _ = msd.apply(disc_params["msd"], audio_segs)
            msd_f, _ = msd.apply(disc_params["msd"], fake)
            loss = discriminator_loss(mpd_r + msd_r, mpd_f + msd_f, gan_type)
            return loss, {"disc/total": loss}

        def step_body(gen_params, disc_params, gen_opt_state, disc_opt_state,
                      batch, rng, gan_on):
            batch = _decompress(batch)
            mel_segs, audio_segs = batch["mel"], batch["audio"]
            # --- discriminator step. During generator warmup (gan_on=0)
            # the WHOLE update is discarded — zeroing only the gradients
            # would still let AdamW's decoupled weight decay (and the wgan
            # clip) drift the discriminator from its initialization.
            (d_loss, d_metrics), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(disc_params, gen_params, mel_segs, audio_segs)
            d_updates, new_disc_opt_state = disc_opt.update(
                d_grads, disc_opt_state, disc_params
            )
            new_disc_params = optax.apply_updates(disc_params, d_updates)
            if gan_type == "wgan":
                new_disc_params = jax.tree.map(
                    lambda p: jnp.clip(p, -wgan_clip, wgan_clip),
                    new_disc_params,
                )
            disc_on = gan_on > 0
            disc_params = jax.tree.map(
                lambda new, old: jnp.where(disc_on, new, old),
                new_disc_params, disc_params,
            )
            disc_opt_state = jax.tree.map(
                lambda new, old: jnp.where(disc_on, new, old),
                new_disc_opt_state, disc_opt_state,
            )
            # --- generator step
            (g_loss, g_metrics), g_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(gen_params, disc_params, mel_segs, audio_segs, gan_on)
            g_updates, gen_opt_state = gen_opt.update(
                g_grads, gen_opt_state, gen_params
            )
            gen_params = optax.apply_updates(gen_params, g_updates)
            metrics = {**d_metrics, **g_metrics}
            return (gen_params, disc_params, gen_opt_state, disc_opt_state,
                    metrics, rng)

        train_step = jax.jit(step_body, donate_argnums=(0, 1, 2, 3))

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def multi_train_step(gen_params, disc_params, gen_opt_state,
                             disc_opt_state, batches, rng, gan_on):
            # K GAN steps per dispatch over a (K, batch, ...) super-batch.
            def body(carry, batch):
                gen_params, disc_params, gen_opt_state, disc_opt_state, rng = carry
                (gen_params, disc_params, gen_opt_state, disc_opt_state,
                 metrics, rng) = step_body(
                    gen_params, disc_params, gen_opt_state, disc_opt_state,
                    batch, rng, gan_on,
                )
                return (gen_params, disc_params, gen_opt_state,
                        disc_opt_state, rng), metrics

            carry, metrics = jax.lax.scan(
                body,
                (gen_params, disc_params, gen_opt_state, disc_opt_state, rng),
                batches,
            )
            gen_params, disc_params, gen_opt_state, disc_opt_state, rng = carry
            metrics = jax.tree_util.tree_map(lambda x: x[-1], metrics)
            return (gen_params, disc_params, gen_opt_state, disc_opt_state,
                    metrics, rng)

        @jax.jit
        def eval_step(gen_params, batch):
            batch = _decompress(batch)
            mel_segs, audio_segs = batch["mel"], batch["audio"]
            fake = generator.apply(gen_params, mel_segs)
            mel_fake = dynamic_range_compression(mel_fn(fake))
            mel_real = dynamic_range_compression(mel_fn(audio_segs))
            row_weights = batch.get("row_weights")
            if row_weights is None:
                return {"total": mel_l1_loss(mel_real, mel_fake)}
            # Weight out pad-duplicated rows (pad_batch_for_eval).
            per_row = jnp.mean(
                jnp.abs(mel_real - mel_fake),
                axis=tuple(range(1, mel_real.ndim)),
            )
            total = jnp.sum(per_row * row_weights) / jnp.maximum(
                jnp.sum(row_weights), 1.0
            )
            return {"total": total}

        self._train_step = train_step
        self._multi_train_step = multi_train_step
        self._eval_step = eval_step

    def init_params(self, rng=None):
        rng = rng or jax.random.PRNGKey(0)
        a = self.audio_config
        seg_frames = a.vocoder_segment_size // a.fft_hop_size
        mel = jnp.zeros((2, seg_frames, a.n_mels))
        wav = jnp.zeros((2, a.vocoder_segment_size))
        gen_params = jax.jit(self.generator.init)(rng, mel)
        disc_params = {
            "mpd": jax.jit(self.mpd.init)(rng, wav),
            "msd": jax.jit(self.msd.init)(rng, wav),
        }
        return gen_params, disc_params

    def fit(self, max_steps: Optional[int] = None, log_every: int = 10,
            profile_steps: int = 0, steps_per_execution: int = 1):
        t = self.training_config
        max_steps = max_steps if max_steps is not None else t.max_steps
        spe = max(int(steps_per_execution), 1)
        self.build_steps()
        gen_params, disc_params = self.init_params()
        state, opt_restore = self.load_finetune_checkpoint(
            {"generator": gen_params, "discriminators": disc_params}
        )
        gen_params = state.get("generator", gen_params)
        disc_params = state.get("discriminators", disc_params)
        gen_opt_state = self.gen_opt.init(gen_params)
        disc_opt_state = self.disc_opt.init(disc_params)
        if opt_restore is not None:
            from flax import serialization

            if opt_restore.get("gen") is not None:
                gen_opt_state = serialization.from_state_dict(
                    gen_opt_state, opt_restore["gen"]
                )
            if opt_restore.get("disc") is not None:
                disc_opt_state = serialization.from_state_dict(
                    disc_opt_state, opt_restore["disc"]
                )
        if self.fsdp:
            from everyvoice_tpu.parallel import (
                shard_opt_state_like,
                shard_params,
            )

            gen_params = shard_params(gen_params, self.mesh, fsdp=True)
            disc_params = shard_params(disc_params, self.mesh, fsdp=True)
            # These states may carry restored finetune values, so transfer
            # them into the sharded layouts rather than re-initializing.
            gen_opt_state = shard_opt_state_like(
                jax.device_get(gen_opt_state), self.gen_opt.init, gen_params
            )
            disc_opt_state = shard_opt_state_like(
                jax.device_get(disc_opt_state), self.disc_opt.init,
                disc_params,
            )
        else:
            gen_params = replicate_tree(gen_params, self.mesh)
            disc_params = replicate_tree(disc_params, self.mesh)
            gen_opt_state = replicate_tree(gen_opt_state, self.mesh)
            disc_opt_state = replicate_tree(disc_opt_state, self.mesh)
        rng = training_rng(42)

        val_interval = _resolve_val_interval(
            t.val_check_interval, len(self.dataset.items) // max(t.batch_size, 1)
        )
        stop = False
        dispatches = 0
        last_val_step = -1
        while not stop and self.epoch < t.max_epochs:
            steps_at_epoch_start = self.global_step
            from everyvoice_tpu.dataloader.prefetch import prefetch

            def device_batches():
                group: list = []
                for host_batch in self.dataset.segment_batches(
                    t.batch_size, self.audio_config.vocoder_segment_size,
                    shuffle=True, seed=self.epoch, drop_last=True,
                ):
                    host_batch.pop("basenames", None)
                    host_batch = pad_batch_to_devices(host_batch, self.n_devices)
                    host_batch = compress_for_transfer(host_batch, ("mel",))
                    if spe <= 1:
                        yield 1, shard_batch(host_batch, self.mesh)
                    else:
                        group.append(host_batch)
                        if len(group) == spe:
                            yield spe, shard_stacked_batch(
                                stack_batches(group), self.mesh
                            )
                            group = []
                for host_batch in group:
                    yield 1, shard_batch(host_batch, self.mesh)

            for n_steps, sharded in prefetch(device_batches()):
                gan_on = 1.0 if self.global_step >= t.generator_warmup_steps else 0.0
                if dispatches == 1 and profile_steps:
                    # Second dispatch: the first compiled. Counted in
                    # dispatches so spe > 1 and resumed runs still trigger.
                    self.start_profile(profile_steps)
                step_fn = (
                    self._train_step if n_steps == 1 else self._multi_train_step
                )
                (gen_params, disc_params, gen_opt_state, disc_opt_state,
                 metrics, rng) = step_fn(
                    gen_params, disc_params, gen_opt_state, disc_opt_state,
                    sharded, rng, gan_on,
                )
                dispatches += 1
                prev_step = self.global_step
                self.global_step += n_steps
                self.tick_profile()
                if self.global_step // log_every > prev_step // log_every:
                    from everyvoice_tpu.train.optim import learning_rate_at

                    logged = {f"training/{k}": v for k, v in metrics.items()}
                    logged["training/lr"] = learning_rate_at(
                        t.optimizer, self.global_step
                    )
                    self.log_metrics(logged, self.global_step)
                if self.global_step // val_interval > prev_step // val_interval:
                    val = self.validate(gen_params)
                    last_val_step = self.global_step
                    self.log_metrics(
                        {f"validation/{k}": v for k, v in val.items()},
                        self.global_step,
                    )
                    self.maybe_checkpoint(
                        val["total"],
                        {"generator": gen_params, "discriminators": disc_params},
                        {"gen": gen_opt_state, "disc": disc_opt_state},
                    )
                if self.global_step >= max_steps:
                    stop = True
                    break
            if self.global_step == steps_at_epoch_start and not stop:
                raise RuntimeError(
                    "Epoch produced no training batches — the dataset is "
                    "empty (check filelists and preprocessed artifacts)."
                )
            self.epoch += 1
        if last_val_step != self.global_step:
            val = self.validate(gen_params)
            self.maybe_checkpoint(
                val["total"],
                {"generator": gen_params, "discriminators": disc_params},
                {"gen": gen_opt_state, "disc": disc_opt_state},
            )
        self.wait_for_checkpoints()
        return gen_params, disc_params

    def validate(self, gen_params) -> dict:
        totals: dict = {}
        rows = 0
        # Validate at the training batch size so the jitted eval step reuses
        # the training batch shape instead of compiling a second program;
        # the trailing partial batch pads up to it with 0-weighted rows.
        batch_size = max(self.training_config.batch_size, self.n_devices, 1)
        for batch in self.val_dataset.segment_batches(
            batch_size, self.audio_config.vocoder_segment_size, shuffle=False,
        ):
            batch.pop("basenames", None)
            batch, n_true = pad_batch_for_eval(
                batch, self.n_devices, batch_size
            )
            batch = compress_for_transfer(batch, ("mel",))
            losses = jax.device_get(
                self._eval_step(gen_params, shard_batch(batch, self.mesh))
            )
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v) * n_true
            rows += n_true
        return {k: v / max(rows, 1) for k, v in totals.items()}
