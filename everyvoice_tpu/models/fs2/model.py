"""FastSpeech2 feature-prediction model in flax
(architecture parity: the reference's fs2 submodule — Conformer
encoder/decoder, variance adaptor, length regulator, postnet; SURVEY.md §2.3).

The module is shape-static end to end: text is padded to `max_text_length`,
mel frames to `max_frames`, and the length regulator is a batched gather —
so one XLA compilation serves every batch and the step shards over a device
mesh with plain data parallelism.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from everyvoice_tpu.models.fs2.alignment import AlignmentEncoder
from everyvoice_tpu.models.fs2.config import FastSpeech2Config
from everyvoice_tpu.models.layers import (
    ConformerStack,
    GlobalStyleTokens,
    Postnet,
    VariancePredictor,
    lengths_to_mask,
    regulate_length,
)


class FastSpeech2(nn.Module):
    # text/frontend
    n_symbols: int
    use_phonological_feats: bool = False
    pfs_dim: int = 43
    # encoder/decoder
    enc_layers: int = 4
    enc_heads: int = 2
    dim: int = 256
    enc_ff_dim: int = 1024
    enc_kernel: int = 9
    enc_dropout: float = 0.2
    dec_layers: int = 4
    dec_heads: int = 2
    dec_ff_dim: int = 1024
    dec_kernel: int = 9
    dec_dropout: float = 0.2
    # variance adaptor
    vp_layers: int = 5
    vp_kernel: int = 3
    vp_dropout: float = 0.5
    vp_depthwise: bool = True
    n_bins: int = 256
    pitch_level: str = "phone"
    energy_level: str = "phone"
    # heads / conditioning
    n_mels: int = 80
    use_postnet: bool = True
    learn_alignment: bool = True
    multispeaker: bool = False
    multilingual: bool = False
    n_speakers: int = 1
    n_langs: int = 1
    use_gst: bool = False
    max_frames: int = 1000
    # normalization stats ranges for variance bins (z-scored values)
    variance_range: float = 6.0
    # Conv/matmul compute dtype for the Conformer stacks, variance
    # predictors, postnet, and GST (params stay float32; the alignment
    # encoder, heads, and losses always run in float32).
    compute_dtype: str = "float32"

    @classmethod
    def from_config(
        cls, config: FastSpeech2Config, n_symbols: int,
        n_speakers: int = 1, n_langs: int = 1,
        compute_dtype: str = "float32",
    ) -> "FastSpeech2":
        m = config.model
        vp = m.variance_predictors
        return cls(
            n_symbols=n_symbols,
            use_phonological_feats=(
                m.target_text_representation_level.value == "phonological_features"
            ),
            enc_layers=m.encoder.layers, enc_heads=m.encoder.heads,
            dim=m.encoder.input_dim, enc_ff_dim=m.encoder.feedforward_dim,
            enc_kernel=m.encoder.conv_kernel_size, enc_dropout=m.encoder.dropout,
            dec_layers=m.decoder.layers, dec_heads=m.decoder.heads,
            dec_ff_dim=m.decoder.feedforward_dim,
            dec_kernel=m.decoder.conv_kernel_size, dec_dropout=m.decoder.dropout,
            vp_layers=vp.pitch.n_layers, vp_kernel=vp.pitch.kernel_size,
            vp_dropout=vp.pitch.dropout, vp_depthwise=vp.pitch.depthwise,
            n_bins=vp.pitch.n_bins,
            pitch_level=vp.pitch.level.value, energy_level=vp.energy.level.value,
            n_mels=config.preprocessing.audio.n_mels,
            use_postnet=m.use_postnet,
            learn_alignment=m.learn_alignment,
            multispeaker=m.multispeaker, multilingual=m.multilingual,
            n_speakers=max(n_speakers, 1), n_langs=max(n_langs, 1),
            use_gst=m.use_global_style_token_module,
            max_frames=m.max_length,
            compute_dtype=compute_dtype,
        )

    def _bin_embed(self, values, mask, name):
        """Quantize z-scored variance values into n_bins and embed them.
        Uniform bins mean quantization is one affine + clip — no
        searchsorted/digitize (slow sequential lowering on TPU)."""
        half = self.variance_range
        scale = (self.n_bins - 1) / (2.0 * half)
        ids = jnp.clip(
            jnp.floor((values + half) * scale + 0.5), 0, self.n_bins - 1
        ).astype(jnp.int32)
        emb = nn.Embed(self.n_bins, self.dim, name=name)(ids)
        return jnp.where(mask[..., None], emb, 0.0)

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,               # (B, N) int ids or (B, N, 43) pfs
        text_lengths: jnp.ndarray,       # (B,)
        mel: Optional[jnp.ndarray] = None,          # (B, T, n_mels) target
        mel_lengths: Optional[jnp.ndarray] = None,  # (B,)
        attn_prior: Optional[jnp.ndarray] = None,   # (B, T, N)
        durations: Optional[jnp.ndarray] = None,    # (B, N) ground truth
        pitch: Optional[jnp.ndarray] = None,        # target (phone/frame level)
        energy: Optional[jnp.ndarray] = None,
        speaker_id: Optional[jnp.ndarray] = None,   # (B,)
        language_id: Optional[jnp.ndarray] = None,  # (B,)
        style_reference: Optional[jnp.ndarray] = None,  # (B, T, n_mels) for GST
        duration_control: float = 1.0,
        deterministic: bool = True,
        teacher_forcing: bool = False,
    ) -> dict:
        n_text = text.shape[1]
        src_mask = lengths_to_mask(text_lengths, n_text)

        # ----- text embedding + encoder
        if self.use_phonological_feats:
            x = nn.Dense(self.dim, name="pfs_proj")(text.astype(jnp.float32))
        else:
            x = nn.Embed(self.n_symbols, self.dim, name="symbol_embed")(text)
        x = jnp.where(src_mask[..., None], x, 0.0)
        x = ConformerStack(
            self.enc_layers, self.dim, self.enc_heads, self.enc_ff_dim,
            self.enc_kernel, self.enc_dropout, name="encoder",
            dtype=self.compute_dtype,
        )(x, src_mask, deterministic)

        # ----- conditioning
        if self.multispeaker:
            sid = speaker_id if speaker_id is not None else jnp.zeros(
                (text.shape[0],), jnp.int32
            )
            x = x + nn.Embed(self.n_speakers, self.dim, name="speaker_embed")(sid)[
                :, None, :
            ]
        if self.multilingual:
            lid = language_id if language_id is not None else jnp.zeros(
                (text.shape[0],), jnp.int32
            )
            x = x + nn.Embed(self.n_langs, self.dim, name="language_embed")(lid)[
                :, None, :
            ]
        if self.use_gst:
            ref = style_reference if style_reference is not None else mel
            if ref is not None:
                style = GlobalStyleTokens(
                    token_dim=self.dim, name="gst", dtype=self.compute_dtype
                )(ref, deterministic)
                x = x + style[:, None, :]
        x = jnp.where(src_mask[..., None], x, 0.0)

        out: dict = {"encoder_output": x, "src_mask": src_mask}

        # ----- alignment (learned or given)
        training_with_mel = mel is not None and mel_lengths is not None
        if self.learn_alignment and training_with_mel:
            attn_soft, attn_logprob = AlignmentEncoder(
                dim=self.dim, name="alignment"
            )(x, mel, src_mask, lengths_to_mask(mel_lengths, mel.shape[1]), attn_prior)
            out["attn_soft"] = attn_soft
            out["attn_logprob"] = attn_logprob
            if durations is None:
                # Hard monotonic path → teacher-forcing durations for this
                # step (gradients blocked through the discrete search).
                from everyvoice_tpu.models.fs2.alignment import (
                    durations_from_hard_attention,
                    viterbi_alignment,
                )

                attn_hard = jax.lax.stop_gradient(
                    viterbi_alignment(attn_logprob, text_lengths, mel_lengths)
                )
                out["attn_hard"] = attn_hard
                durations = durations_from_hard_attention(attn_hard)
                out["duration_target"] = durations

        # ----- variance adaptor: duration (bias-initialized at ~4
        # frames/token so free-running synthesis starts sane)
        log_duration_pred = VariancePredictor(
            self.vp_layers, self.vp_kernel, self.dim, self.vp_dropout,
            self.vp_depthwise, out_bias_init=1.6, name="duration_predictor",
            dtype=self.compute_dtype,
        )(x, src_mask, deterministic)
        out["log_duration_prediction"] = log_duration_pred

        if durations is not None and (training_with_mel or teacher_forcing):
            dur_for_regulation = durations
        else:
            dur_for_regulation = jnp.round(
                jnp.clip(jnp.expm1(log_duration_pred), 0.0, None)
                * duration_control
            ).astype(jnp.int32)
            dur_for_regulation = jnp.where(src_mask, dur_for_regulation, 0)
        out["duration_used"] = dur_for_regulation

        # ----- variance adaptor: pitch & energy (phone level before
        # regulation, frame level after)
        def add_variance(feat_x, targets, mask_lvl, name):
            pred = VariancePredictor(
                self.vp_layers, self.vp_kernel, self.dim, self.vp_dropout,
                self.vp_depthwise, name=f"{name}_predictor",
                dtype=self.compute_dtype,
            )(feat_x, mask_lvl, deterministic)
            use = targets if (targets is not None and training_with_mel) else pred
            emb = self._bin_embed(use, mask_lvl, f"{name}_embed")
            return pred, emb

        def to_phone_level(values):
            # Frame-level targets are averaged into phones using the hard
            # alignment (learned) or the provided durations (reference
            # average_data_by_durations, preprocessor.py:288-300).
            if values is None or values.shape[1] == n_text:
                return values
            if "attn_hard" in out:
                from everyvoice_tpu.models.fs2.alignment import phone_average

                return phone_average(values, out["attn_hard"])
            if dur_for_regulation is not None:
                from everyvoice_tpu.models.fs2.alignment import (
                    phone_average_by_durations,
                )

                return phone_average_by_durations(values, dur_for_regulation)
            return values

        if self.pitch_level == "phone":
            pitch = to_phone_level(pitch)
            pitch_pred, pitch_emb = add_variance(x, pitch, src_mask, "pitch")
            out["pitch_target_used"] = pitch
            x = x + pitch_emb
        if self.energy_level == "phone":
            energy = to_phone_level(energy)
            energy_pred, energy_emb = add_variance(x, energy, src_mask, "energy")
            out["energy_target_used"] = energy
            x = x + energy_emb

        # ----- length regulation
        frames, frame_mask, total = regulate_length(
            x, dur_for_regulation, self.max_frames
        )
        if training_with_mel:
            frame_mask = lengths_to_mask(mel_lengths, self.max_frames)
        out["frame_mask"] = frame_mask
        out["predicted_frame_lengths"] = total

        if self.pitch_level == "frame":
            pitch_pred, pitch_emb = add_variance(frames, pitch, frame_mask, "pitch")
            out["pitch_target_used"] = pitch
            frames = frames + pitch_emb
        if self.energy_level == "frame":
            energy_pred, energy_emb = add_variance(
                frames, energy, frame_mask, "energy"
            )
            out["energy_target_used"] = energy
            frames = frames + energy_emb
        out["pitch_prediction"] = pitch_pred
        out["energy_prediction"] = energy_pred

        # ----- decoder + heads
        dec = ConformerStack(
            self.dec_layers, self.dim, self.dec_heads, self.dec_ff_dim,
            self.dec_kernel, self.dec_dropout, name="decoder",
            dtype=self.compute_dtype,
        )(frames, frame_mask, deterministic)
        mel_out = nn.Dense(self.n_mels, name="mel_head")(dec)
        mel_out = jnp.where(frame_mask[..., None], mel_out, 0.0)
        out["mel"] = mel_out
        if self.use_postnet:
            out["postnet_mel"] = Postnet(
                self.n_mels, name="postnet", dtype=self.compute_dtype
            )(mel_out, frame_mask, deterministic)
        return out
