"""StyleTTS2 end-to-end text→wav model in flax
(architecture parity: the styletts2 submodule per SURVEY.md §2.5 — text
encoder, reference-audio style encoders, AdaIN iSTFT decoder with
harmonic+noise source, prosody predictor, style diffusion).

Pretrained-component policy: the reference downloads PL-BERT / JDC-F0 /
ASR-aligner / WavLM from HuggingFace (`fetch-pretrained`,
reference cli.py:622-644; docs/guides/styletts2.md:7-13). All four are
consumed when their `pretrained.*.local_*` / `model.slm.model` config fields
point at locally staged torch checkpoints:

- PL-BERT (`plbert_geometry` set): a flax ALBERT (`plbert.py`) becomes the
  text-context encoder conditioning the prosody predictor and the style
  diffusion, fine-tuned at `optimizer.bert_lr`.
- ASR aligner (`asr_geometry` set): a flax CNN+attention-seq2seq ASR
  (`asr.py`) becomes the TMA aligner (its decoder attention feeds the
  mono/s2s losses and joint durations), fine-tuned at `optimizer.ft_lr`.
- JDC F0 (trainer-held, frozen): per-frame F0 targets from the mel.
- WavLM (trainer-held, frozen): the SLM-adversarial discriminator backbone.

Without local weights, trainable in-framework stand-ins are used: a conv
text-context encoder for PL-BERT, the FastSpeech2 alignment learner for the
ASR, the framework's batched F0 estimator for JDC; SLM-adversarial training
stays off.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from everyvoice_tpu.models.layers import lengths_to_mask, regulate_length
from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
from everyvoice_tpu.models.styletts2.layers import (
    DiffusionDenoiser,
    ProsodyPredictor,
    StyleDecoder,
    StyleEncoder,
    TextEncoder,
)


class StyleTTS2Module(nn.Module):
    """The full generator stack (discriminators live in models.hifigan)."""

    n_symbols: int
    hidden_dim: int = 512
    style_dim: int = 128
    max_dur: int = 50
    max_frames: int = 800
    # Training-time random-clip length for the waveform decoder (frames);
    # active only when __call__ receives segment_starts. The published
    # StyleTTS2 recipe trains its GAN losses on random clips — see
    # StyleTTS2TrainingConfig.decoder_segment_frames.
    segment_frames: Optional[int] = None
    n_mels: int = 80
    sample_rate: int = 22050
    hop: int = 256
    multilingual: bool = False
    n_langs: int = 1
    language_embedding_dim: int = 64
    upsample_rates: tuple = (8, 8)
    upsample_kernel_sizes: tuple = (16, 16)
    gen_istft_n_fft: int = 16
    gen_istft_hop_size: int = 4
    diff_layers: int = 3
    diff_heads: int = 8
    diff_head_features: int = 64
    # Pretrained-component geometry, as hashable tuples of (field, value)
    # pairs (None = use the trainable in-framework stand-in). Set by the
    # trainer when local checkpoints are staged; recorded in the checkpoint
    # header so inference rebuilds the same module structure.
    plbert_geometry: Optional[tuple] = None
    asr_geometry: Optional[tuple] = None
    # Conv compute dtype for the waveform-scale hot path (decoder MRF stack,
    # style encoders). Everything precision-sensitive stays float32
    # regardless: LSTM text encoders, prosody predictor, diffusion denoiser,
    # TMA aligner, PL-BERT, the harmonic source's phase accumulation, the
    # iSTFT head, and all losses.
    compute_dtype: str = "float32"

    @classmethod
    def from_config(
        cls,
        config: StyleTTS2Config,
        n_symbols: int,
        n_langs: int = 1,
        plbert_geometry: Optional[dict] = None,
        asr_geometry: Optional[dict] = None,
        compute_dtype: str = "float32",
    ) -> "StyleTTS2Module":
        m = config.model
        return cls(
            compute_dtype=compute_dtype,
            plbert_geometry=(
                tuple(sorted(plbert_geometry.items()))
                if plbert_geometry else None
            ),
            asr_geometry=(
                tuple(sorted(asr_geometry.items()))
                if asr_geometry else None
            ),
            n_symbols=n_symbols,
            hidden_dim=m.hidden_dim,
            style_dim=m.style_dim,
            max_dur=m.max_dur,
            max_frames=config.training.max_len,
            segment_frames=(
                config.training.decoder_segment_frames
                if (config.training.decoder_segment_frames or 0)
                < config.training.max_len
                else None
            ),
            n_mels=config.preprocessing.audio.n_mels,
            sample_rate=config.preprocessing.audio.output_sampling_rate,
            hop=config.preprocessing.audio.fft_hop_size,
            multilingual=m.multilingual,
            n_langs=max(n_langs, 1),
            language_embedding_dim=m.language_embedding_dim,
            upsample_rates=tuple(m.decoder.upsample_rates),
            upsample_kernel_sizes=tuple(m.decoder.upsample_kernel_sizes),
            gen_istft_n_fft=m.decoder.gen_istft_n_fft,
            gen_istft_hop_size=m.decoder.gen_istft_hop_size,
            diff_layers=m.diffusion.transformer.num_layers,
            diff_heads=m.diffusion.transformer.num_heads,
            diff_head_features=m.diffusion.transformer.head_features,
        )

    def setup(self):
        from everyvoice_tpu.models.fs2.alignment import AlignmentEncoder

        self.text_encoder = TextEncoder(self.n_symbols, self.hidden_dim)
        if self.plbert_geometry is not None:
            # Pretrained PL-BERT (ALBERT) text-context encoder — the
            # reference's bert + bert_encoder pair (fine-tuned at bert_lr).
            from everyvoice_tpu.models.styletts2.plbert import PLBERT

            self.plbert_encoder = PLBERT(**dict(self.plbert_geometry))
            self.plbert_proj = nn.Dense(self.hidden_dim)
        else:
            # Trainable context encoder standing in for PL-BERT
            # (see module doc).
            self.context_encoder = TextEncoder(
                self.n_symbols, self.hidden_dim, n_convs=2
            )
        if self.asr_geometry is not None:
            # Pretrained ASR text-aligner — the reference's text_aligner,
            # whose decoder attention is the TMA source (fine-tuned at
            # ft_lr).
            from everyvoice_tpu.models.styletts2.asr import ASRCNN

            self.text_aligner = ASRCNN(**dict(self.asr_geometry))
        else:
            # TPU-native TMA (text-mel aligner): where the reference
            # fine-tunes a pretrained ASR's attention (styletts2
            # text_aligner; losses mono/s2s, schema
            # everyvoice-text-to-wav-0.5.json lambda_mono/lambda_s2s), this
            # learns the alignment directly with the fixed-shape
            # soft-attention + forward-sum + Viterbi machinery shared with
            # FastSpeech2 — no torch ASR checkpoint needed, and every DP is
            # a lax.scan.
            self.tma_aligner = AlignmentEncoder(dim=self.hidden_dim // 2)
        self.acoustic_style_encoder = StyleEncoder(
            self.style_dim, dtype=self.compute_dtype
        )
        self.prosodic_style_encoder = StyleEncoder(
            self.style_dim, dtype=self.compute_dtype
        )
        self.predictor = ProsodyPredictor(
            self.style_dim, self.hidden_dim, self.max_dur
        )
        self.decoder = StyleDecoder(
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            gen_istft_n_fft=self.gen_istft_n_fft,
            gen_istft_hop_size=self.gen_istft_hop_size,
            style_dim=self.style_dim,
            sample_rate=self.sample_rate,
            hop=self.hop,
            compute_dtype=self.compute_dtype,
        )
        self.denoiser = DiffusionDenoiser(
            self.style_dim * 2,  # joint acoustic+prosodic style
            self.diff_layers,
            self.diff_heads,
            self.diff_head_features,
        )
        self.frame_proj = nn.Dense(self.hidden_dim)
        self.f0_embed = nn.Dense(self.hidden_dim)
        if self.multilingual:
            self.language_embed = nn.Embed(
                self.n_langs, self.language_embedding_dim
            )
            self.language_proj = nn.Dense(self.hidden_dim)

    # -- pieces -------------------------------------------------------------
    def encode_text(self, tokens, mask, language_id=None, deterministic=True):
        enc = self.text_encoder(tokens, mask, deterministic)
        if self.multilingual and language_id is not None:
            lang = self.language_proj(self.language_embed(language_id))
            enc = enc + lang[:, None, :]
        return enc

    def extract_styles(self, ref_mel):
        return (
            self.acoustic_style_encoder(ref_mel),
            self.prosodic_style_encoder(ref_mel),
        )

    def text_context_states(self, tokens, mask, deterministic=True):
        """(B, N, hidden) contextual text states — PL-BERT (projected) when
        pretrained weights are wired, the conv stand-in otherwise."""
        if self.plbert_geometry is not None:
            return self.plbert_proj(self.plbert_encoder(tokens, mask))
        return self.context_encoder(tokens, mask, deterministic)

    def text_context_embedding(self, tokens, mask, deterministic=True):
        ctx = self.text_context_states(tokens, mask, deterministic)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
        return jnp.sum(ctx * mask[..., None], axis=1) / denom

    def prosody_encoding(self, tokens, mask, text_enc, deterministic=True):
        """The prosody predictor's text input: with PL-BERT wired, the
        projected PL-BERT states (the reference predictor consumes
        bert_encoder(bert(texts)), not the acoustic text encoder); without
        it, the acoustic text encoding."""
        if self.plbert_geometry is not None:
            return self.text_context_states(tokens, mask, deterministic)
        return text_enc

    def denoise_style(self, noisy, sigma, text_embedding):
        return self.denoiser(noisy, sigma, text_embedding)

    def predict_prosody(self, text_enc, prosodic_style, mask, deterministic=True):
        return self.predictor(text_enc, prosodic_style, mask, deterministic)

    def align_text_mel(
        self, tokens, text_lengths, mel, mel_lengths,
        language_id=None, deterministic=True,
    ):
        """TMA attention between text and mel: (attn_soft, attn_logprob) of
        shape (B, T_mel, N_text) plus an aux dict — with the pretrained ASR
        wired, aux carries its seq2seq logits (B, N+1, n_token) for the
        reference's s2s CE loss; without it, aux is empty and the losses use
        the forward-sum alignment likelihood instead."""
        mask = lengths_to_mask(text_lengths, tokens.shape[1])
        mel_mask = lengths_to_mask(mel_lengths, mel.shape[1])
        if self.asr_geometry is not None:
            text_enc = None
        else:
            text_enc = self.encode_text(
                tokens, mask, language_id, deterministic
            )
        return self._tma(
            text_enc, tokens, mel, mel_lengths, mask, mel_mask, deterministic
        )

    def _tma(self, text_enc, tokens, mel, mel_lengths, mask, mel_mask,
             deterministic):
        if self.asr_geometry is not None:
            from everyvoice_tpu.models.styletts2.asr import (
                asr_attention_to_tma,
            )
            from everyvoice_tpu.models.styletts2.jdc import (
                REFERENCE_MEL_MEAN,
                REFERENCE_MEL_STD,
            )

            normalized = (mel - REFERENCE_MEL_MEAN) / REFERENCE_MEL_STD
            _, s2s_logits, attn = self.text_aligner(
                normalized, mel_lengths, tokens, deterministic
            )
            attn_soft, attn_logprob = asr_attention_to_tma(
                attn, mel.shape[1], mask, mel_mask
            )
            return attn_soft, attn_logprob, {"s2s_logits": s2s_logits}
        attn_soft, attn_logprob = self.tma_aligner(
            text_enc, mel, mask, mel_mask
        )
        return attn_soft, attn_logprob, {}

    def decode(
        self, frames, f0_frames, energy_frames, acoustic_style, noise_key=None
    ):
        return self.decoder(
            frames, f0_frames, energy_frames, acoustic_style, noise_key
        )

    # -- full paths -----------------------------------------------------------
    def __call__(
        self,
        tokens: jnp.ndarray,          # (B, N)
        text_lengths: jnp.ndarray,    # (B,)
        ref_mel: jnp.ndarray,         # (B, T, M) style reference / target
        durations: Optional[jnp.ndarray] = None,   # (B, N) frames per token
        f0_frames: Optional[jnp.ndarray] = None,   # (B, T)
        energy_frames: Optional[jnp.ndarray] = None,
        language_id: Optional[jnp.ndarray] = None,
        mel_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        segment_starts: Optional[jnp.ndarray] = None,  # (B,) frame starts
    ) -> dict:
        """Training-style forward with teacher durations/F0 (stage 1)."""
        mask = lengths_to_mask(text_lengths, tokens.shape[1])
        text_enc = self.encode_text(tokens, mask, language_id, deterministic)
        acoustic_style, prosodic_style = self.extract_styles(ref_mel)
        # TMA attention over the reference mel (also guarantees the aligner
        # parameters exist from init).
        if mel_lengths is None:
            mel_lengths = jnp.full(
                (tokens.shape[0],), ref_mel.shape[1], jnp.int32
            )
        mel_mask = lengths_to_mask(mel_lengths, ref_mel.shape[1])
        attn_soft, attn_logprob, _ = self._tma(
            text_enc, tokens, ref_mel, mel_lengths, mask, mel_mask,
            deterministic,
        )
        dur_logits, f0_pred, energy_pred = self.predict_prosody(
            self.prosody_encoding(tokens, mask, text_enc, deterministic),
            prosodic_style, mask, deterministic,
        )
        # The context embedding and denoiser also run here (they're needed by
        # the stage-2 losses), which guarantees their parameters exist from
        # init even when training starts at stage 1.
        text_embedding = self.text_context_embedding(tokens, mask, deterministic)
        joint_style = jnp.concatenate([acoustic_style, prosodic_style], axis=-1)
        _ = self.denoiser(
            joint_style, jnp.ones((tokens.shape[0],)), text_embedding
        )
        out = {
            "text_encoding": text_enc,
            "text_embedding": text_embedding,
            "duration_logits": dur_logits,
            "f0_prediction": f0_pred,
            "energy_prediction": energy_pred,
            "acoustic_style": acoustic_style,
            "prosodic_style": prosodic_style,
            "attn_soft": attn_soft,
            "attn_logprob": attn_logprob,
        }
        if durations is None:
            durations = jnp.clip(
                jnp.argmax(dur_logits, axis=-1), 1, self.max_dur
            ) * mask
        frames, frame_mask, total = regulate_length(
            text_enc, durations, self.max_frames
        )
        frames = self.frame_proj(frames)
        if f0_frames is None:
            # Expand token-level predictions to frames.
            f0_tokens = f0_pred
            f0_frames_used, _, _ = regulate_length(
                f0_tokens[..., None], durations, self.max_frames
            )
            f0_frames = f0_frames_used[..., 0]
        if energy_frames is None:
            e_frames, _, _ = regulate_length(
                energy_pred[..., None], durations, self.max_frames
            )
            energy_frames = e_frames[..., 0]
        frames = frames + self.f0_embed(f0_frames[..., None])
        noise_key = self.make_rng("noise") if not deterministic else None
        if segment_starts is not None and self.segment_frames is not None:
            # Decode only a random clip per utterance (training): the
            # waveform-scale decoder + downstream discriminator work
            # dominates the train step, and the published StyleTTS2 recipe
            # trains its GAN losses on random clips, not padded full
            # utterances. Prosody/duration/TMA outputs above remain
            # full-length.
            seg = self.segment_frames

            def clip(x, start):
                return jax.lax.dynamic_slice_in_dim(x, start, seg, axis=0)

            frames = jax.vmap(clip)(frames, segment_starts)
            f0_frames = jax.vmap(clip)(f0_frames, segment_starts)
            energy_frames = jax.vmap(clip)(energy_frames, segment_starts)
        wav = self.decode(
            frames, f0_frames, energy_frames, acoustic_style, noise_key
        )
        out.update(
            {"wav": wav, "frame_mask": frame_mask, "frame_lengths": total,
             "duration_used": durations}
        )
        return out


# ---------------------------------------------------------------------------
# EDM-style diffusion sampling for inference (style vectors)


def sample_style_diffusion(
    apply_denoiser,
    key: jax.Array,
    text_embedding: jnp.ndarray,  # (B, D)
    style_dim: int,
    steps: int = 5,
    embedding_scale: float = 1.0,
    sigma_min: float = 0.002,
    sigma_max: float = 3.0,
    rho: float = 9.0,
) -> jnp.ndarray:
    """Karras-schedule ancestral sampling of a style vector conditioned on
    the text embedding (classifier-free-guidance-style scaling via
    embedding_scale, matching the reference's inference knobs)."""
    b = text_embedding.shape[0]
    steps_idx = jnp.arange(steps)
    sigmas = (
        sigma_max ** (1 / rho)
        + steps_idx / max(steps - 1, 1)
        * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
    ) ** rho
    x = jax.random.normal(key, (b, style_dim)) * sigmas[0]
    null_embedding = jnp.zeros_like(text_embedding)
    for i in range(steps):
        sigma = jnp.full((b,), sigmas[i])
        denoised_cond = apply_denoiser(x, sigma, text_embedding)
        if embedding_scale != 1.0:
            denoised_null = apply_denoiser(x, sigma, null_embedding)
            denoised = denoised_null + embedding_scale * (
                denoised_cond - denoised_null
            )
        else:
            denoised = denoised_cond
        sigma_next = sigmas[i + 1] if i + 1 < steps else 0.0
        d = (x - denoised) / jnp.maximum(sigmas[i], 1e-8)
        x = x + d * (sigma_next - sigmas[i])
    return x
