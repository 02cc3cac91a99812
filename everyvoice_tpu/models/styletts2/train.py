"""StyleTTS2 two-stage trainer
(role parity: styletts2.cli.train --mode first|second, SURVEY.md §2.5).

Stage 1: acoustic pretraining — waveform reconstruction from ground-truth
durations/F0/energy with mel + adversarial (MPD/MSD) + feature-matching
losses, plus duration/F0/energy predictor losses.
Stage 2: joint training — style diffusion (EDM loss), style reconstruction,
and (when local WavLM weights are supplied) SLM-adversarial training. The
first-stage checkpoint is picked up automatically from
`training.first_stage_path`.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from everyvoice_tpu.logger import logger
from everyvoice_tpu.parallel.mesh import (
    pad_batch_for_eval,
    pad_batch_to_devices,
    replicate_tree,
    shard_batch,
    shard_stacked_batch,
    stack_batches,
)
from everyvoice_tpu.train.loop import TrainerBase


class StyleTTS2Trainer(TrainerBase):
    model_name = "StyleTTS2Module"

    def __init__(self, config, dataset, val_dataset, lang2id=None,
                 mesh=None, run_dir=None, mode: str = "first",
                 gradient_clip_val=None, fsdp=False, compute_dtype="auto"):
        super().__init__(config, mesh=mesh, run_dir=run_dir, fsdp=fsdp)
        from everyvoice_tpu.models.hifigan.model import (
            MultiPeriodDiscriminator,
            MultiScaleDiscriminator,
        )
        from everyvoice_tpu.models.styletts2.model import StyleTTS2Module
        from everyvoice_tpu.utils.precision import (
            mesh_device,
            resolve_compute_dtype,
        )

        self.mode = mode
        # Stage-tagged "last" checkpoint, matching the reference layout the
        # regression harness checks (stage-1-last.ckpt / stage-2-last.ckpt,
        # reference tests/regression/regression-test.sh:99-105) and letting
        # stage 2's default first_stage_path pickup find stage 1's output.
        self.last_checkpoint_name = (
            "stage-1-last.ckpt" if mode == "first" else "stage-2-last.ckpt"
        )
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.lang2id = lang2id or {}
        # bf16 conv compute on TPU for the waveform-scale hot path (decoder
        # MRF stack, style encoders, MPD/MSD discriminators) and the FROZEN
        # WavLM SLM tower (params cast in-step, features returned f32);
        # LSTMs, diffusion, aligners, PL-BERT, and all losses stay float32.
        self.compute_dtype = resolve_compute_dtype(
            compute_dtype, mesh_device(self.mesh)
        )
        (
            self.plbert_geometry,
            self.asr_geometry,
            self._plbert_pretrained,
            self._asr_pretrained,
            self.jdc_module,
            self.jdc_params,
        ) = self._load_pretrained_components()
        self.model = StyleTTS2Module.from_config(
            config,
            n_symbols=dataset.n_symbols,
            n_langs=max(len(self.lang2id), 1),
            plbert_geometry=self.plbert_geometry,
            asr_geometry=self.asr_geometry,
            compute_dtype=self.compute_dtype,
        )
        self.mpd = MultiPeriodDiscriminator(
            periods=tuple(config.model.decoder.mpd_layers),
            compute_dtype=self.compute_dtype,
        )
        self.msd = MultiScaleDiscriminator(
            n_scales=config.model.decoder.msd_layers,
            compute_dtype=self.compute_dtype,
        )
        # SLM-adversarial training (stage 2, reference styletts2 slmadv):
        # activates when model.slm.model points at locally available WavLM
        # weights (a HF directory staged via `everyvoice fetch-pretrained`).
        self.slm_module = None
        self.slm_head = None
        self.slm_params = None
        if mode == "second" and Path(config.model.slm.model).exists():
            from everyvoice_tpu.models.styletts2.slm import (
                SLMDiscriminator,
                load_wavlm_params,
            )

            self.slm_module, self.slm_params = load_wavlm_params(
                config.model.slm.model
            )
            self.slm_head = SLMDiscriminator(config.model.slm.initial_channel)
            logger.info(
                f"SLM-adversarial training enabled "
                f"(WavLM from {config.model.slm.model})"
            )
        opt = config.training.optimizer

        def _clip(base):
            if gradient_clip_val is not None and gradient_clip_val > 0:
                # Reference parity: Trainer(gradient_clip_val=...) global-norm
                # clipping (base_cli/helpers.py:193,269).
                return optax.chain(
                    optax.clip_by_global_norm(gradient_clip_val), base
                )
            return base

        if self._plbert_pretrained is not None or self._asr_pretrained is not None:
            # Pretrained components fine-tune at their own learning rates
            # (schema StyleTTS2OptimizerConfig: bert_lr for PL-BERT, ft_lr
            # for the fine-tuned aligner), everything else at `lr`.
            pretrained_labels = {}
            if self._plbert_pretrained is not None:
                pretrained_labels["plbert_encoder"] = "bert"
            if self._asr_pretrained is not None:
                pretrained_labels["text_aligner"] = "ft"

            def label_tree(tree):
                def label(path, _):
                    for entry in path:
                        key = getattr(entry, "key", None)
                        if key in pretrained_labels:
                            return pretrained_labels[key]
                    return "base"

                return jax.tree_util.tree_map_with_path(label, tree)

            self.gen_opt = _clip(
                optax.multi_transform(
                    {
                        "base": optax.adamw(opt.lr),
                        "bert": optax.adamw(opt.bert_lr),
                        "ft": optax.adamw(opt.ft_lr),
                    },
                    label_tree,
                )
            )
        else:
            self.gen_opt = _clip(optax.adamw(opt.lr))
        self.disc_opt = _clip(optax.adamw(opt.lr))
        self.losses_cfg = config.training.losses
        self._train_step = None

    def _load_pretrained_components(self):
        """Stage the fetched pretrained components (config `pretrained.*`,
        reference docs/guides/styletts2.md:7-13): PL-BERT and the ASR
        aligner return (geometry, converted flax params) for grafting into
        the generator tree; JDC returns a frozen (module, params) pair held
        by the trainer. Symbol-table remapping uses the frozen
        `pretrained.pretrained_symbols` table (reference
        check_group.py:299-439)."""
        pre = self.config.pretrained
        project_symbols = list(self.dataset.text_processor.symbols)
        pretrained_symbols = list(pre.pretrained_symbols)

        def _present(path, what):
            if path is None:
                return False
            if Path(path).exists():
                return True
            logger.warning(
                f"pretrained.{what} is set to {path} but no such file "
                "exists — using the trainable in-framework stand-in. Run "
                "`everyvoice-tpu fetch-pretrained text-to-wav` to stage it."
            )
            return False

        jdc_module = jdc_params = None
        if _present(pre.f0.local_path, "f0.local_path"):
            from everyvoice_tpu.models.styletts2.jdc import load_jdc_params

            jdc_module, jdc_params = load_jdc_params(pre.f0.local_path)
            logger.info(
                f"Loaded pretrained JDC F0 network from {pre.f0.local_path} "
                "(frozen; F0 targets now come from it)."
            )
        plbert_geometry = plbert_params = None
        if _present(pre.plbert.local_checkpoint, "plbert.local_checkpoint"):
            from everyvoice_tpu.models.styletts2.plbert import (
                load_plbert_params,
            )

            module, plbert_params = load_plbert_params(
                pre.plbert.local_checkpoint,
                config_path=(
                    pre.plbert.local_config
                    if pre.plbert.local_config
                    and Path(pre.plbert.local_config).exists()
                    else None
                ),
                project_symbols=project_symbols,
                pretrained_symbols=pretrained_symbols,
            )
            plbert_geometry = {
                field: getattr(module, field)
                for field in (
                    "vocab_size", "hidden_size", "num_layers", "num_heads",
                    "intermediate_size", "embedding_size",
                    "max_position_embeddings",
                )
            }
            logger.info(
                "Loaded pretrained PL-BERT from "
                f"{pre.plbert.local_checkpoint} (text-context encoder; "
                f"fine-tuning at bert_lr={self.config.training.optimizer.bert_lr})."
            )
        asr_geometry = asr_params = None
        if _present(pre.asr.local_checkpoint, "asr.local_checkpoint"):
            from everyvoice_tpu.models.styletts2.asr import load_asr_params

            module, asr_params = load_asr_params(
                pre.asr.local_checkpoint,
                config_path=(
                    pre.asr.local_config
                    if pre.asr.local_config
                    and Path(pre.asr.local_config).exists()
                    else None
                ),
                project_symbols=project_symbols,
                pretrained_symbols=pretrained_symbols,
            )
            asr_geometry = {
                field: getattr(module, field)
                for field in (
                    "n_token", "input_dim", "hidden_dim", "n_layers",
                    "token_embedding_dim",
                )
            }
            logger.info(
                "Loaded pretrained ASR text-aligner from "
                f"{pre.asr.local_checkpoint} (TMA aligner; fine-tuning at "
                f"ft_lr={self.config.training.optimizer.ft_lr})."
            )
        return (
            plbert_geometry, asr_geometry, plbert_params, asr_params,
            jdc_module, jdc_params,
        )

    def build_steps(self):
        from everyvoice_tpu.dsp import get_spectral_transform
        from everyvoice_tpu.dsp.spectral import dynamic_range_compression
        from everyvoice_tpu.models.hifigan.loss import (
            discriminator_loss,
            feature_matching_loss,
            generator_adversarial_loss,
        )
        from everyvoice_tpu.models.fs2.alignment import (
            binarization_loss,
            durations_from_hard_attention,
            forward_sum_loss,
            phone_average,
            phone_average_by_durations,
            viterbi_alignment,
        )
        from everyvoice_tpu.models.styletts2.loss import (
            asr_s2s_loss,
            diffusion_edm_loss,
            duration_ce_loss,
            duration_l1_loss,
            f0_loss,
            norm_loss,
            style_reconstruction_loss,
        )

        a = self.config.preprocessing.audio
        spec_type = a.spec_type if isinstance(a.spec_type, str) else a.spec_type.value
        mel_fn = get_spectral_transform(
            spec_type, a.n_fft, a.fft_window_size, a.fft_hop_size,
            a.output_sampling_rate, a.n_mels, a.f_min, a.f_max,
        )
        model, mpd, msd = self.model, self.mpd, self.msd

        # Activation rematerialization for the waveform-scale blocks: the
        # decoder + MPD/MSD forwards at the schema defaults (batch 8,
        # ~800-frame utterances -> ~240k-sample waveforms) need ~27 GB of
        # stored activations for the backward pass — 1.7x a v5e chip's HBM.
        # jax.checkpoint recomputes them during the backward instead
        # (~1/3 more FLOPs), the standard TPU memory/compute trade.
        decode_rm = jax.checkpoint(
            lambda p, text, tl, mel, ml, dur, f0f, enf, lid, kn, kd, starts:
            model.apply(
                p, text, tl, mel, durations=dur, f0_frames=f0f,
                energy_frames=enf, language_id=lid, mel_lengths=ml,
                deterministic=False, rngs={"noise": kn, "dropout": kd},
                segment_starts=starts,
            )
        )
        # Random-clip GAN training (decoder_segment_frames): the decoder,
        # MPD/MSD, and mel/adversarial/SLM losses see a per-utterance random
        # clip; upstream StyleTTS2 trains the same way, and the clip bounds
        # the waveform-scale work that dominates this step
        # (tools/styletts2_component_times.py).
        seg_frames = model.segment_frames
        hop_samples = a.fft_hop_size * (
            a.output_sampling_rate // a.input_sampling_rate
        )

        def clip_wav_real(audio, starts, n_samples):
            if starts is None:
                return audio[:, :n_samples]

            def clip(x, s):
                return jax.lax.dynamic_slice_in_dim(
                    x, s * hop_samples, n_samples, axis=0
                )

            return jax.vmap(clip)(audio, starts)
        mpd_rm = jax.checkpoint(lambda p, w: mpd.apply(p, w))
        msd_rm = jax.checkpoint(lambda p, w: msd.apply(p, w))
        align_rm = jax.checkpoint(
            lambda p, text, tl, mel, ml, lid, kd: model.apply(
                p, text, tl, mel, ml, language_id=lid,
                deterministic=False, rngs={"dropout": kd},
                method="align_text_mel",
            )
        )
        lc = self.losses_cfg
        max_dur = self.config.model.max_dur
        stage2 = self.mode == "second"
        slm_on = self.slm_head is not None
        if slm_on:
            from everyvoice_tpu.dsp.resample import resample
            from everyvoice_tpu.models.styletts2.slm import (
                slm_discriminator_loss,
                slm_generator_loss,
                stack_hidden_states,
            )

            slm_module, slm_head = self.slm_module, self.slm_head
            slm_sr = self.config.model.slm.sr
            out_sr = a.output_sampling_rate
            # The WavLM encoder is FROZEN (only the SLM head trains), so its
            # forward/backward can run in the trainer's bf16 compute dtype on
            # TPU: params+input cast to bf16, stacked features returned as
            # f32 for the head and the LSGAN losses. The generator gradient
            # flows through the bf16 tower; adversarial losses tolerate the
            # reduced mantissa (measured: see docs/guides/tpu.md). Pass
            # compute_dtype="float32" to the trainer (or set
            # EVERYVOICE_SLM_DTYPE=float32) to restore f32 SLM.
            import os as _os

            slm_dt = jnp.dtype(
                _os.environ.get("EVERYVOICE_SLM_DTYPE", self.compute_dtype)
            )

            def slm_feats(slm_params, wav):
                wav16 = resample(wav, out_sr, slm_sr)
                if slm_dt == jnp.bfloat16:
                    p16 = jax.tree.map(
                        lambda t: t.astype(slm_dt)
                        if jnp.issubdtype(t.dtype, jnp.floating) else t,
                        slm_params,
                    )
                    feats = stack_hidden_states(
                        slm_module.apply(p16, wav16.astype(slm_dt))
                    )
                    return feats.astype(jnp.float32)
                return stack_hidden_states(slm_module.apply(slm_params, wav16))
        sigma_data = self.config.model.diffusion.dist.sigma_data

        # Out-of-domain text bank for SLM-adversarial generation
        # (reference slmadv; only meaningful when the SLM is active).
        ood_bank = self._load_ood_bank() if slm_on else None
        if ood_bank is not None:
            ood_tokens = jnp.asarray(ood_bank["tokens"])
            ood_lengths = jnp.asarray(ood_bank["lengths"])
            logger.info(
                f"SLM-adversarial OOD bank: {ood_tokens.shape[0]} sentences"
            )

            def synthesize_ood(gen_params, batch, rng):
                rng_pick, rng_noise, rng_drop = jax.random.split(rng, 3)
                idx = jax.random.randint(
                    rng_pick, (batch["text"].shape[0],), 0,
                    ood_tokens.shape[0],
                )
                # Decode only the leading decoder_segment_frames clip when
                # random-clip training is on: the SLM discriminator needs a
                # few seconds of synthesized speech, not the full padded
                # max_len decode (which dominated the stage-2 step).
                starts = (
                    jnp.zeros((batch["text"].shape[0],), jnp.int32)
                    if model.segment_frames is not None else None
                )
                out = model.apply(
                    gen_params,
                    ood_tokens[idx], ood_lengths[idx], batch["mel"],
                    mel_lengths=batch["mel_lengths"],
                    deterministic=False,
                    rngs={"noise": rng_noise, "dropout": rng_drop},
                    segment_starts=starts,
                )
                return out["wav"]
        else:
            synthesize_ood = None

        jdc_on = self.jdc_module is not None
        asr_on = self._asr_pretrained is not None
        if jdc_on:
            from everyvoice_tpu.models.styletts2.jdc import jdc_f0

            jdc_module, jdc_params = self.jdc_module, self.jdc_params

        def target_f0_frames(batch):
            """Frame-level F0 targets: the frozen pretrained JDC network on
            the mel (reference pitch_extractor) when staged, the
            preprocessor's batched estimator otherwise."""
            if not jdc_on:
                return batch["f0_frames"]
            f0 = jax.lax.stop_gradient(
                jdc_f0(jdc_module, jdc_params, batch["mel"])
            )
            mel_valid = jnp.arange(batch["mel"].shape[1])[None, :] < (
                batch["mel_lengths"][:, None]
            )
            return jnp.where(mel_valid, f0, 0.0)

        def tma_durations(attn_logprob, batch):
            """Monotonic (Viterbi) durations from the aligner attention —
            used as joint targets once the TMA phase begins."""
            hard = viterbi_alignment(
                jax.lax.stop_gradient(attn_logprob),
                batch["text_lengths"], batch["mel_lengths"],
            )
            return hard, durations_from_hard_attention(hard)

        def alignment_targets(gen_params, batch, tma_active):
            """Gradient-free duration and token-prosody targets, computed
            ONCE per step and shared by both loss functions. `tma_active`
            is STATIC (one recompile at tma_epoch): the aligner forward is
            only traced when its output is used — after tma_epoch, or from
            epoch 0 when the pretrained ASR aligner is staged (whose
            attention is usable immediately, the reason the reference ships
            it). When active, Viterbi durations replace teacher durations
            and f0/energy token targets are re-averaged over the SAME hard
            alignment (the dataloader's token averages were computed over
            the stale teacher/uniform durations)."""
            f0_frames = target_f0_frames(batch)
            if tma_active or asr_on:
                _, attn_logprob, _ = model.apply(
                    jax.lax.stop_gradient(gen_params),
                    batch["text"], batch["text_lengths"], batch["mel"],
                    batch["mel_lengths"],
                    language_id=batch.get("language_id"),
                    deterministic=True,
                    method="align_text_mel",
                )
                hard, aligned = tma_durations(attn_logprob, batch)
                return {
                    "durations": aligned,
                    "f0_tokens": phone_average(f0_frames, hard),
                    "energy_tokens": phone_average(
                        batch["energy_frames"], hard
                    ),
                    "f0_frames": f0_frames,
                }
            return {
                "durations": batch["durations"],
                "f0_tokens": (
                    phone_average_by_durations(f0_frames, batch["durations"])
                    if jdc_on
                    else batch["f0_tokens"]
                ),
                "energy_tokens": batch["energy_tokens"],
                "f0_frames": f0_frames,
            }

        def gen_loss_fn(gen_params, disc_params, batch, rng, slm_params,
                        phase, targets, ood_active, tma_active):
            # phase = [tma_on, diff_on, joint_on] as 0/1 floats; diff/joint
            # stay dynamic, tma_active is STATIC so the pre-tma_epoch steps
            # never even trace the gradient-carrying aligner pass
            # (reference: TMA losses phase in at tma_epoch).
            diff_on, joint_on = phase[1], phase[2]
            rng_noise, rng_diff, rng_drop, rng_ood = jax.random.split(rng, 4)
            src_mask = jnp.arange(batch["text"].shape[1])[None, :] < (
                batch["text_lengths"][:, None]
            )
            losses = {}
            if tma_active:
                # The TMA attention with gradients (for the mono/s2s
                # losses); duration/prosody TARGETS come pre-computed in
                # `targets`.
                attn_soft, attn_logprob, attn_aux = align_rm(
                    gen_params,
                    batch["text"], batch["text_lengths"], batch["mel"],
                    batch["mel_lengths"], batch.get("language_id"), rng_drop,
                )
                attn_hard, _ = tma_durations(attn_logprob, batch)
                # TMA losses (schema lambda_s2s / lambda_mono). With the
                # pretrained ASR aligner, s2s is the reference's seq2seq CE
                # on the ASR decoder's text predictions; with the
                # in-framework aligner, forward-sum is the
                # alignment-likelihood analog. Binarization against the
                # Viterbi path is the monotonicity term in both cases.
                if "s2s_logits" in attn_aux:
                    losses["s2s"] = asr_s2s_loss(
                        attn_aux["s2s_logits"], batch["text"], src_mask
                    )
                else:
                    losses["s2s"] = forward_sum_loss(
                        attn_logprob, batch["text_lengths"],
                        batch["mel_lengths"],
                    )
                losses["mono"] = binarization_loss(attn_soft, attn_hard)
            else:
                losses["s2s"] = jnp.asarray(0.0)
                losses["mono"] = jnp.asarray(0.0)
            dur_targets = targets["durations"]
            seg_starts = targets.get("segment_starts")
            out = decode_rm(
                gen_params,
                batch["text"], batch["text_lengths"], batch["mel"],
                batch["mel_lengths"], dur_targets,
                targets["f0_frames"], batch["energy_frames"],
                batch.get("language_id"), rng_noise, rng_drop, seg_starts,
            )
            wav_fake = out["wav"]
            wav_real = clip_wav_real(
                batch["audio"], seg_starts, wav_fake.shape[1]
            )
            mel_fake = dynamic_range_compression(mel_fn(wav_fake))
            mel_real = dynamic_range_compression(mel_fn(wav_real))
            losses["mel"] = jnp.mean(jnp.abs(mel_fake - mel_real))
            losses["ce"] = duration_ce_loss(
                out["duration_logits"], dur_targets, src_mask, max_dur
            )
            losses["dur"] = duration_l1_loss(
                out["duration_logits"], dur_targets, src_mask
            )
            # Token-level prosody targets, re-averaged over the current
            # alignment once TMA takes over.
            losses["f0"] = f0_loss(
                out["f0_prediction"],
                targets["f0_tokens"],
                src_mask,
            )
            losses["norm"] = norm_loss(
                out["energy_prediction"], targets["energy_tokens"], src_mask
            )
            mpd_r, mpd_fr = mpd_rm(disc_params["mpd"], wav_real)
            mpd_f, mpd_ff = mpd_rm(disc_params["mpd"], wav_fake)
            msd_r, msd_fr = msd_rm(disc_params["msd"], wav_real)
            msd_f, msd_ff = msd_rm(disc_params["msd"], wav_fake)
            losses["gen"] = generator_adversarial_loss(mpd_f + msd_f)
            losses["fm"] = feature_matching_loss(mpd_fr + msd_fr, mpd_ff + msd_ff)
            total = (
                lc.lambda_mel * losses["mel"]
                + lc.lambda_ce * losses["ce"]
                + lc.lambda_dur * losses["dur"]
                + lc.lambda_f0 * losses["f0"]
                + lc.lambda_norm * losses["norm"]
                + lc.lambda_gen * (losses["gen"] + losses["fm"])
                + lc.lambda_s2s * losses["s2s"]
                + lc.lambda_mono * losses["mono"]
            )
            if stage2:
                joint_style = jnp.concatenate(
                    [out["acoustic_style"], out["prosodic_style"]], axis=-1
                )
                text_emb = model.apply(
                    gen_params, batch["text"], src_mask,
                    method="text_context_embedding",
                )

                def denoiser_apply(noisy, sigma, emb):
                    return model.apply(
                        gen_params, noisy, sigma, emb, method="denoise_style"
                    )

                losses["diff"] = diffusion_edm_loss(
                    denoiser_apply, rng_diff,
                    jax.lax.stop_gradient(joint_style), text_emb, sigma_data,
                )
                denoised = denoiser_apply(
                    jax.lax.stop_gradient(joint_style)
                    + 0.1 * jax.random.normal(rng_diff, joint_style.shape),
                    jnp.full((joint_style.shape[0],), 0.1),
                    text_emb,
                )
                losses["sty"] = style_reconstruction_loss(denoised, joint_style)
                # Diffusion losses phase in at diff_epoch (schema diff_epoch).
                total = total + diff_on * (
                    lc.lambda_diff * losses["diff"]
                    + lc.lambda_sty * losses["sty"]
                )
            if slm_on:
                feats_fake = slm_feats(slm_params, wav_fake)
                losses["slm"] = slm_generator_loss(
                    slm_head.apply(disc_params["slm"], feats_fake)
                )
                total = total + lc.lambda_slm * losses["slm"]
            if slm_on and ood_bank is not None and ood_active:
                # SLM-adversarial generation on out-of-domain text (the
                # reference's slmadv, fed by preprocessor.py:1242-1321's ood/
                # artifacts): synthesize OOD sentences end-to-end (predicted
                # durations/F0/energy, style from in-domain references) and
                # ask the SLM discriminator to call them real. ood_active is
                # STATIC (one recompile at joint_epoch) so the extra
                # generator forward + WavLM pass is not even traced — let
                # alone paid — during the epochs where its weight is zero.
                ood_wav = synthesize_ood(gen_params, batch, rng_ood)
                feats_ood = slm_feats(slm_params, ood_wav)
                losses["slm_ood"] = slm_generator_loss(
                    slm_head.apply(disc_params["slm"], feats_ood)
                )
                total = total + joint_on * lc.lambda_slm * losses["slm_ood"]
            losses["total"] = total
            return total, losses

        def disc_loss_fn(disc_params, gen_params, batch, rng, slm_params,
                         phase, targets, ood_active):
            rng_noise, rng_drop, rng_ood = jax.random.split(rng, 3)
            # Fakes must come from the same duration source the generator
            # uses (shared pre-computed targets), or the discriminator
            # trains against a distribution the generator no longer
            # produces once TMA durations take over.
            dur_used = targets["durations"]
            out = decode_rm(
                gen_params,
                batch["text"], batch["text_lengths"], batch["mel"],
                batch["mel_lengths"], dur_used,
                targets["f0_frames"], batch["energy_frames"],
                batch.get("language_id"), rng_noise, rng_drop,
                targets.get("segment_starts"),
            )
            wav_fake = jax.lax.stop_gradient(out["wav"])
            wav_real = clip_wav_real(
                batch["audio"], targets.get("segment_starts"),
                wav_fake.shape[1],
            )
            mpd_r, _ = mpd_rm(disc_params["mpd"], wav_real)
            mpd_f, _ = mpd_rm(disc_params["mpd"], wav_fake)
            msd_r, _ = msd_rm(disc_params["msd"], wav_real)
            msd_f, _ = msd_rm(disc_params["msd"], wav_fake)
            loss = discriminator_loss(mpd_r + msd_r, mpd_f + msd_f)
            metrics = {"disc/total": loss}
            if slm_on:
                feats_r = jax.lax.stop_gradient(slm_feats(slm_params, wav_real))
                feats_f = jax.lax.stop_gradient(slm_feats(slm_params, wav_fake))
                slm_loss = slm_discriminator_loss(
                    slm_head.apply(disc_params["slm"], feats_r),
                    slm_head.apply(disc_params["slm"], feats_f),
                )
                loss = loss + slm_loss
                metrics = {"disc/total": loss, "disc/slm": slm_loss}
                if ood_bank is not None and ood_active:
                    # Real = in-domain recordings; fake = OOD-text synthesis
                    # (the slmadv discriminator side), from joint_epoch on
                    # (ood_active is static — see gen_loss_fn).
                    ood_wav = jax.lax.stop_gradient(
                        synthesize_ood(gen_params, batch, rng_ood)
                    )
                    feats_ood = jax.lax.stop_gradient(
                        slm_feats(slm_params, ood_wav)
                    )
                    slm_ood = slm_discriminator_loss(
                        slm_head.apply(disc_params["slm"], feats_r),
                        slm_head.apply(disc_params["slm"], feats_ood),
                    )
                    loss = loss + phase[2] * slm_ood
                    metrics["disc/slm_ood"] = slm_ood
                    metrics["disc/total"] = loss
            return loss, metrics

        gen_opt, disc_opt = self.gen_opt, self.disc_opt

        # Donating the old params/opt-state buffers lets XLA write the
        # updated ones in place — without it the step holds two full copies
        # of each (the last ~134 MB that kept batch 8 from fitting on v5e).
        def step_body(gen_params, disc_params, gen_opt_state, disc_opt_state,
                      batch, rng, slm_params, phase, ood_active, tma_active):
            rng, rng_d, rng_g, rng_seg = jax.random.split(rng, 4)
            targets = alignment_targets(gen_params, batch, tma_active)
            if seg_frames is not None:
                # One random clip per utterance, shared by the disc and gen
                # losses (upstream StyleTTS2 uses the same y_rec clip for
                # both updates within a step).
                max_start = jnp.maximum(
                    batch["mel_lengths"] - seg_frames, 0
                )
                targets["segment_starts"] = jax.random.randint(
                    rng_seg, (batch["mel"].shape[0],), 0, max_start + 1
                )
            (d_loss, d_metrics), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(disc_params, gen_params, batch, rng_d, slm_params, phase,
              targets, ood_active)
            d_updates, disc_opt_state = disc_opt.update(
                d_grads, disc_opt_state, disc_params
            )
            disc_params = optax.apply_updates(disc_params, d_updates)
            (g_loss, g_metrics), g_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(gen_params, disc_params, batch, rng_g, slm_params, phase,
              targets, ood_active, tma_active)
            g_updates, gen_opt_state = gen_opt.update(
                g_grads, gen_opt_state, gen_params
            )
            gen_params = optax.apply_updates(gen_params, g_updates)
            metrics = {**d_metrics, **{f"gen/{k}": v for k, v in g_metrics.items()}}
            return (gen_params, disc_params, gen_opt_state, disc_opt_state,
                    metrics, rng)

        # Donating the old params/opt-state buffers lets XLA write the
        # updated ones in place — without it the step holds two full copies
        # of each (the last ~134 MB that kept batch 8 from fitting on v5e).
        @partial(jax.jit, static_argnames=("ood_active", "tma_active"),
                 donate_argnums=(0, 1, 2, 3))
        def train_step(gen_params, disc_params, gen_opt_state, disc_opt_state,
                       batch, rng, slm_params, phase, ood_active=False,
                       tma_active=True):
            return step_body(
                gen_params, disc_params, gen_opt_state, disc_opt_state,
                batch, rng, slm_params, phase, ood_active, tma_active,
            )

        self._train_step = train_step
        # Unjitted internals for tools/styletts2_component_times.py —
        # the per-component roofline attribution (docs/guides/tpu.md).
        self._step_closures = {
            "gen_loss_fn": gen_loss_fn,
            "disc_loss_fn": disc_loss_fn,
            "alignment_targets": alignment_targets,
            "mel_fn": mel_fn,
        }

        # Multi-step dispatch (--steps-per-execution): lax.scan over a
        # (steps, batch, ...) stacked super-batch — one host dispatch for N
        # optimizer steps, like HiFiGAN's multi_train_step. The per-epoch
        # phase/ood/tma flags are constants across a scan group because
        # groups never span epochs.
        @partial(jax.jit, static_argnames=("ood_active", "tma_active"),
                 donate_argnums=(0, 1, 2, 3))
        def multi_train_step(gen_params, disc_params, gen_opt_state,
                             disc_opt_state, batches, rng, slm_params, phase,
                             ood_active=False, tma_active=True):
            def body(carry, batch):
                gp, dp, gos, dos, rng_c = carry
                gp, dp, gos, dos, metrics, rng_c = step_body(
                    gp, dp, gos, dos, batch, rng_c, slm_params, phase,
                    ood_active, tma_active,
                )
                return (gp, dp, gos, dos, rng_c), metrics

            (gen_params, disc_params, gen_opt_state, disc_opt_state, rng), \
                metrics = jax.lax.scan(
                    body,
                    (gen_params, disc_params, gen_opt_state, disc_opt_state,
                     rng),
                    batches,
                )
            last = jax.tree.map(lambda m: m[-1], metrics)
            return (gen_params, disc_params, gen_opt_state, disc_opt_state,
                    last, rng)

        self._multi_train_step = multi_train_step

        @jax.jit
        def val_step(gen_params, batch):
            """Held-out reconstruction metrics, deterministic forward.
            Prosody targets come from the same source as training (JDC F0
            when staged) so the monitored loss ranks checkpoints against
            consistent targets."""
            f0_frames = target_f0_frames(batch)
            f0_tokens = (
                phone_average_by_durations(f0_frames, batch["durations"])
                if jdc_on
                else batch["f0_tokens"]
            )
            out = model.apply(
                gen_params,
                batch["text"], batch["text_lengths"], batch["mel"],
                durations=batch["durations"],
                f0_frames=f0_frames,
                energy_frames=batch["energy_frames"],
                mel_lengths=batch["mel_lengths"],
                deterministic=True,
            )
            wav_fake = out["wav"]
            wav_real = batch["audio"][:, : wav_fake.shape[1]]
            mel_fake = dynamic_range_compression(mel_fn(wav_fake))
            mel_real = dynamic_range_compression(mel_fn(wav_real))
            src_mask = jnp.arange(batch["text"].shape[1])[None, :] < (
                batch["text_lengths"][:, None]
            )
            row_weights = batch.get("row_weights")
            if row_weights is not None:
                # Weight out pad-duplicated rows (pad_batch_for_eval): the
                # 0/1 weights zero the token masks and the mel term.
                src_mask = src_mask & (row_weights > 0.5)[:, None]
                mel_per_row = jnp.mean(jnp.abs(mel_fake - mel_real), axis=(1, 2))
                mel_loss = jnp.sum(mel_per_row * row_weights) / jnp.maximum(
                    jnp.sum(row_weights), 1.0
                )
            else:
                mel_loss = jnp.mean(jnp.abs(mel_fake - mel_real))
            losses = {
                "mel": mel_loss,
                "ce": duration_ce_loss(
                    out["duration_logits"], batch["durations"], src_mask,
                    max_dur,
                ),
                "dur": duration_l1_loss(
                    out["duration_logits"], batch["durations"], src_mask
                ),
                "f0": f0_loss(
                    out["f0_prediction"], f0_tokens, src_mask
                ),
                "norm": norm_loss(
                    out["energy_prediction"], batch["energy_tokens"], src_mask
                ),
            }
            losses["total"] = (
                lc.lambda_mel * losses["mel"]
                + lc.lambda_ce * losses["ce"]
                + lc.lambda_dur * losses["dur"]
                + lc.lambda_f0 * losses["f0"]
                + lc.lambda_norm * losses["norm"]
            )
            return losses

        self._val_step = val_step

    def _load_ood_bank(self, max_sentences: int = 512):
        """Tokenize the preprocessed OOD sentences ({save_dir}/ood/<lang>.psv,
        written by `everyvoice-tpu preprocess ... -s ood`) into a fixed-shape
        token bank for in-jit sampling. Returns None when no OOD data exists."""
        ood_dir = Path(self.config.preprocessing.save_dir) / "ood"
        files = sorted(ood_dir.glob("*.psv")) if ood_dir.is_dir() else []
        if not files:
            logger.warning(
                "SLM-adversarial training is on but no OOD sentences were "
                "found — run `everyvoice-tpu preprocess text-to-wav <config> "
                "-s ood` to stage them; continuing with in-domain SLM loss "
                "only."
            )
            return None
        from everyvoice_tpu.utils import generic_psv_filelist_reader

        tp = self.dataset.text_processor
        level = self.dataset.level.value
        max_len = self.dataset.max_text_len
        min_chars = getattr(self.training_config, "OOD_min_length", 0) or 0
        rows_by_lang = []
        for path in files:
            for row in generic_psv_filelist_reader(path):
                text = row.get("text") or row.get("characters") or ""
                if text.strip():
                    rows_by_lang.append((path.stem, text))
        long_enough = [r for r in rows_by_lang if len(r[1]) >= min_chars]
        if rows_by_lang and not long_enough:
            logger.warning(
                f"All {len(rows_by_lang)} OOD sentences are shorter than "
                f"OOD_min_length={min_chars}; using them anyway."
            )
            long_enough = rows_by_lang
        tokens, lengths = [], []
        for lang, text in long_enough:
            try:
                ids = tp.encode_text(
                    text,
                    apply_g2p=(level == "phones"),
                    lang_id=lang if level == "phones" else None,
                    quiet=True,
                )
            except Exception:
                ids = tp.encode_text(text, quiet=True)
            if not ids:
                continue
            ids = ids[:max_len]
            lengths.append(len(ids))
            tokens.append(ids + [0] * (max_len - len(ids)))
            if len(tokens) >= max_sentences:
                break
        if not tokens:
            return None
        return {
            "tokens": np.asarray(tokens, np.int32),
            "lengths": np.asarray(lengths, np.int32),
        }

    def phase_weights(self, epoch: int) -> "jnp.ndarray":
        """[tma_on, diff_on, joint_on] for this epoch (schema tma_epoch /
        diff_epoch / joint_epoch). Stage 1 phases the TMA joint durations in
        at tma_epoch; stage 2 keeps TMA on and phases diffusion and
        SLM-adversarial OOD training in at diff_epoch / joint_epoch."""
        t = self.training_config
        if self.mode == "first":
            tma_on = float(epoch >= t.losses.tma_epoch)
            return jnp.asarray([tma_on, 0.0, 0.0], jnp.float32)
        return jnp.asarray(
            [
                1.0,
                float(epoch >= t.losses.diff_epoch),
                float(epoch >= t.losses.joint_epoch),
            ],
            jnp.float32,
        )

    def validate(self, gen_params, max_batches: int = 8) -> dict:
        t = self.training_config
        totals: dict = {}
        rows = 0
        count = 0
        batch_size = max(t.batch_size, self.n_devices, 1)
        for host_batch in self.val_dataset.batches(
            batch_size, shuffle=False, drop_last=False
        ):
            host_batch.pop("basenames", None)
            # Full-batch-size padding keeps one eval compile shape; pad rows
            # are 0-weighted in the losses and in this aggregation.
            host_batch, n_true = pad_batch_for_eval(
                host_batch, self.n_devices, batch_size
            )
            losses = jax.device_get(
                self._val_step(gen_params, shard_batch(host_batch, self.mesh))
            )
            for key, value in losses.items():
                totals[key] = totals.get(key, 0.0) + float(value) * n_true
            rows += n_true
            count += 1
            if count >= max_batches:
                break
        if rows == 0:
            return {}
        return {f"validation/{k}": v / rows for k, v in totals.items()}

    def _graft_pretrained(self, gen_params, name, pretrained, what):
        """Replace the freshly initialized `params/<name>` subtree with the
        converted pretrained weights, verifying tree structure and shapes
        (a mismatch means the staged checkpoint's geometry disagrees with
        the module the config built)."""
        params = gen_params["params"]
        if name not in params:
            raise ValueError(
                f"Model has no '{name}' subtree to graft {what} into — "
                "the module was built without it."
            )
        fresh_leaves = jax.tree.leaves(params[name])
        pre_leaves = jax.tree.leaves(pretrained)
        if jax.tree.structure(params[name]) != jax.tree.structure(pretrained):
            raise ValueError(
                f"The converted {what} parameter tree does not match the "
                f"model's '{name}' structure — check the staged checkpoint "
                "and its config.yml."
            )
        for fresh, pre in zip(fresh_leaves, pre_leaves):
            if fresh.shape != pre.shape:
                raise ValueError(
                    f"Shape mismatch grafting {what}: expected "
                    f"{fresh.shape}, checkpoint has {pre.shape}."
                )
        params[name] = jax.tree.map(jnp.asarray, pretrained)
        return gen_params

    def init_params(self, example_batch, rng=None):
        from flax.core import unfreeze

        rng = rng or jax.random.PRNGKey(0)
        gen_params = jax.jit(
            self.model.init, static_argnames=("deterministic",)
        )(
            {"params": rng, "dropout": rng, "noise": rng},
            jnp.asarray(example_batch["text"]),
            jnp.asarray(example_batch["text_lengths"]),
            jnp.asarray(example_batch["mel"]),
            durations=jnp.asarray(example_batch["durations"]),
            f0_frames=jnp.asarray(example_batch["f0_frames"]),
            energy_frames=jnp.asarray(example_batch["energy_frames"]),
            deterministic=False,
        )
        gen_params = unfreeze(gen_params)
        if self._plbert_pretrained is not None:
            gen_params = self._graft_pretrained(
                gen_params, "plbert_encoder", self._plbert_pretrained,
                "PL-BERT",
            )
        if self._asr_pretrained is not None:
            gen_params = self._graft_pretrained(
                gen_params, "text_aligner", self._asr_pretrained,
                "the ASR aligner",
            )
        wav = jnp.zeros((2, 4096))
        disc_params = {
            "mpd": jax.jit(self.mpd.init)(rng, wav),
            "msd": jax.jit(self.msd.init)(rng, wav),
        }
        if self.slm_head is not None:
            n_feat = (self.slm_module.num_layers + 1) * self.slm_module.hidden_size
            disc_params["slm"] = jax.jit(self.slm_head.init)(
                rng, jnp.zeros((2, 16, n_feat))
            )
        return gen_params, disc_params

    def _ckpt_extra(self) -> dict:
        """Checkpoint header extras: the stage tag plus the pretrained-
        component geometry, so inference rebuilds the exact module
        structure (plbert/asr submodules) the weights were trained with."""
        return {
            "stage": self.mode,
            "pretrained_components": {
                "plbert": self.plbert_geometry,
                "asr": self.asr_geometry,
            },
        }

    def _resolve_first_stage_path(self, configured) -> Optional[Path]:
        """Locate the stage-1 checkpoint stage 2 grows from. The configured
        path (default ``checkpoints/stage-1-last.ckpt``) is tried as given,
        then relative to this run's directory, then — because each run gets
        a fresh timestamped sub_dir — against every sibling run of the same
        experiment (newest first), matching the reference's
        "automatically picks up stage 1's checkpoint via
        training.first_stage_path" contract
        (reference tests/regression/regression-test.sh:102-104)."""
        configured = Path(configured)
        candidates = [configured]
        if not configured.is_absolute():
            candidates.append(self.run_dir / configured)
            lc = self.training_config.logger
            version_dir = Path(lc.save_dir) / lc.name / lc.version
            # Sibling-run scan root: when run_dir was placed explicitly
            # outside the logger's save_dir/name/version layout, scanning
            # that layout could silently pick up a stale checkpoint from an
            # unrelated run of the same experiment name — scan the actual
            # run_dir's parent instead.
            try:
                self.run_dir.resolve().relative_to(version_dir.resolve())
            except (ValueError, OSError):
                version_dir = self.run_dir.parent
            siblings = [
                p for p in version_dir.glob(f"*/{configured.as_posix()}")
                if p.is_file()
            ]
            candidates.extend(
                sorted(siblings, key=lambda p: p.stat().st_mtime,
                       reverse=True)
            )
        return next((c for c in candidates if c.is_file()), None)

    def fit(self, max_steps: Optional[int] = None, log_every: int = 10,
            profile_steps: int = 0, steps_per_execution: int = 1):
        t = self.training_config
        max_steps = max_steps if max_steps is not None else t.max_steps
        max_epochs = t.epochs_1st if self.mode == "first" else t.epochs_2nd
        spe = max(int(steps_per_execution), 1)
        self.build_steps()
        try:
            example = next(self.dataset.batches(t.batch_size, shuffle=False))
        except StopIteration:
            raise RuntimeError(
                "The training dataset is empty — no usable items survived "
                "filtering (check filelists and preprocessed artifacts)."
            ) from None
        example.pop("basenames", None)
        gen_params, disc_params = self.init_params(example)
        # Three-way resume within a stage (reference
        # base_cli/helpers.py:278-375): training.finetune_checkpoint resumes
        # weights (+ optimizer state and step/epoch counters when the config
        # allows). It takes precedence over the stage-1 pickup — a stage-2
        # resume checkpoint already contains the stage-1 weights it grew
        # from.
        state, opt_restore = self.load_finetune_checkpoint(
            {"generator": gen_params, "discriminators": disc_params}
        )
        gen_params = state.get("generator", gen_params)
        disc_params = state.get("discriminators", disc_params)
        resumed = t.finetune_checkpoint is not None
        if self.mode == "second" and not resumed:
            first_stage = self._resolve_first_stage_path(t.first_stage_path)
            if first_stage is not None:
                from everyvoice_tpu.train.checkpoint import load_checkpoint

                ckpt = load_checkpoint(first_stage)
                gen_params = ckpt["state_dict"].get("generator", gen_params)
                disc_params = ckpt["state_dict"].get(
                    "discriminators", disc_params
                )
                logger.info(f"Loaded stage-1 checkpoint from {first_stage}")
            else:
                logger.warning(
                    f"Stage-1 checkpoint {t.first_stage_path} not found; "
                    "training stage 2 from scratch."
                )
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
            # The opt states may carry restored resume values, so transfer
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
        slm_params = (
            replicate_tree(self.slm_params, self.mesh)
            if self.slm_params is not None
            else None
        )
        from everyvoice_tpu.train.loop import training_rng

        rng = training_rng(17)
        stop = False
        val_metrics: dict = {}
        metrics: dict = {}
        dispatches = 0
        checkpointed_at = -1
        while not stop and self.epoch < max_epochs:
            steps_at_epoch_start = self.global_step
            phase = self.phase_weights(self.epoch)
            # Static per-epoch flags — one recompile at each phase boundary
            # instead of dead compute every earlier step: OOD slmadv
            # synthesis is only traced from joint_epoch on, and the
            # gradient-carrying TMA aligner pass + mono/s2s losses only from
            # tma_epoch on (always on in stage 2).
            ood_active = (
                self.mode == "second"
                and self.epoch >= t.losses.joint_epoch
            )
            tma_active = (
                self.mode == "second"
                or self.epoch >= t.losses.tma_epoch
            )
            from everyvoice_tpu.dataloader.prefetch import prefetch

            def device_batches():
                group: list = []
                for host_batch in self.dataset.batches(
                    t.batch_size, shuffle=True, seed=self.epoch, drop_last=True
                ):
                    host_batch.pop("basenames", None)
                    host_batch = pad_batch_to_devices(host_batch, self.n_devices)
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
                if dispatches == 1 and profile_steps:
                    self.start_profile(profile_steps)
                step_fn = (
                    self._train_step if n_steps == 1 else self._multi_train_step
                )
                (gen_params, disc_params, gen_opt_state, disc_opt_state,
                 metrics, rng) = step_fn(
                    gen_params, disc_params, gen_opt_state, disc_opt_state,
                    sharded, rng, slm_params, phase,
                    ood_active=ood_active, tma_active=tma_active,
                )
                dispatches += 1
                prev_step = self.global_step
                self.global_step += n_steps
                self.tick_profile()
                if self.global_step // log_every > prev_step // log_every:
                    self.log_metrics(
                        {f"training/{k}": v for k, v in metrics.items()},
                        self.global_step,
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
            # Held-out validation each epoch, then save_last + top-k ranked
            # on the validation loss — crash recovery and checkpoint
            # selection at every epoch, not just at end of fit (reference
            # base_cli/helpers.py:234-251; the longest-running model must
            # survive a crash at epoch 190/200).
            val_metrics = self.validate(gen_params)
            if val_metrics:
                self.log_metrics(val_metrics, self.global_step)
            monitored = val_metrics.get(
                "validation/total",
                float(metrics["gen/total"]) if metrics else float("inf"),
            )
            self.maybe_checkpoint(
                float(monitored),
                {"generator": gen_params, "discriminators": disc_params},
                {"gen": gen_opt_state, "disc": disc_opt_state},
                extra=self._ckpt_extra(),
            )
            checkpointed_at = self.global_step
        if checkpointed_at != self.global_step:
            # Zero-epoch runs (e.g. smoke configs) and mid-epoch max_steps
            # stops still leave a final checkpoint behind.
            if "validation/total" in val_metrics:
                monitored = val_metrics["validation/total"]
            elif metrics:
                monitored = float(metrics["gen/total"])
            else:
                monitored = float("inf")
            self.maybe_checkpoint(
                float(monitored),
                {"generator": gen_params, "discriminators": disc_params},
                {"gen": gen_opt_state, "disc": disc_opt_state},
                extra=self._ckpt_extra(),
            )
        self.wait_for_checkpoints()
        return gen_params, disc_params
