"""StyleTTS2 inference (role parity: styletts2's load_styletts2_model /
load_reference_style / _synthesize_text, consumed by the reference demo at
demo/app.py:477-568 with diffusion_steps / embedding_scale / blend knobs)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def load_styletts2_model(ckpt_path: Path | str):
    from everyvoice_tpu.models.styletts2.config import StyleTTS2Config
    from everyvoice_tpu.models.styletts2.model import StyleTTS2Module
    from everyvoice_tpu.text import TextProcessor
    from everyvoice_tpu.train.checkpoint import load_checkpoint

    ckpt = load_checkpoint(ckpt_path)
    if ckpt["model_info"]["name"] != "StyleTTS2Module":
        raise ValueError(
            f"Expected a StyleTTS2 checkpoint, got {ckpt['model_info']['name']}"
        )
    hp = ckpt["hyper_parameters"]
    config = StyleTTS2Config(**hp["config"])
    text_processor = TextProcessor(
        config.text,
        target_text_representation_level=config.model.target_text_representation_level,
    )
    model = StyleTTS2Module.from_config(
        config, n_symbols=len(text_processor.symbols),
        n_langs=max(len(hp.get("lang2id", {})), 1),
    )
    params = ckpt["state_dict"].get("generator", ckpt["state_dict"])
    return model, params, config, text_processor, hp.get("lang2id", {})


def load_reference_style(model, params, ref_wav_path: Path | str, config):
    """Reference wav → (acoustic_style, prosodic_style) vectors."""
    from everyvoice_tpu.dsp import get_spectral_transform, read_wav, resample
    from everyvoice_tpu.dsp.spectral import dynamic_range_compression

    a = config.preprocessing.audio
    audio, sr = read_wav(ref_wav_path)
    mono = jnp.asarray(audio.mean(axis=0))
    if sr != a.input_sampling_rate:
        mono = resample(mono, sr, a.input_sampling_rate)
    spec_type = a.spec_type if isinstance(a.spec_type, str) else a.spec_type.value
    mel_fn = get_spectral_transform(
        spec_type, a.n_fft, a.fft_window_size, a.fft_hop_size,
        a.input_sampling_rate, a.n_mels, a.f_min, a.f_max,
    )
    mel = dynamic_range_compression(mel_fn(mono)).T[None, ...]  # (1, T, M)
    acoustic, prosodic = model.apply(params, mel, method="extract_styles")
    return np.asarray(acoustic)[0], np.asarray(prosodic)[0]


def synthesize_text(
    model,
    params,
    config,
    text_processor,
    text: str,
    language: Optional[str] = None,
    ref_styles: Optional[tuple] = None,
    diffusion_steps: int = 5,
    embedding_scale: float = 1.0,
    acoustic_blend: float = 0.5,
    prosody_blend: float = 0.5,
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Text → waveform. Styles come from diffusion sampling, optionally
    blended with reference-audio styles (the reference's acoustic/prosody
    blend sliders)."""
    from everyvoice_tpu.models.styletts2.model import sample_style_diffusion

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    level = config.model.target_text_representation_level.value
    ids = text_processor.encode_text(
        text, apply_g2p=(level != "characters"), lang_id=language, quiet=True,
    )
    if not ids:
        raise ValueError(f"No valid symbols found in {text!r}")
    tokens = jnp.asarray([ids], jnp.int32)
    lengths = jnp.asarray([len(ids)], jnp.int32)
    mask = jnp.ones_like(tokens, dtype=bool)

    text_emb = model.apply(
        params, tokens, mask, method="text_context_embedding"
    )

    def denoiser(noisy, sigma, emb):
        return model.apply(params, noisy, sigma, emb, method="denoise_style")

    joint = sample_style_diffusion(
        denoiser, rng, text_emb, model.style_dim * 2,
        steps=diffusion_steps, embedding_scale=embedding_scale,
    )
    acoustic = joint[:, : model.style_dim]
    prosodic = joint[:, model.style_dim :]
    if ref_styles is not None:
        ref_acoustic = jnp.asarray(ref_styles[0])[None, :]
        ref_prosodic = jnp.asarray(ref_styles[1])[None, :]
        acoustic = acoustic_blend * acoustic + (1 - acoustic_blend) * ref_acoustic
        prosodic = prosody_blend * prosodic + (1 - prosody_blend) * ref_prosodic

    text_enc = model.apply(
        params, tokens, mask, method="encode_text"
    )
    dur_logits, f0_tok, energy_tok = model.apply(
        params, text_enc, prosodic, mask, method="predict_prosody"
    )
    durations = jnp.clip(jnp.argmax(dur_logits, axis=-1), 1, model.max_dur)
    from everyvoice_tpu.models.layers import regulate_length

    frames, frame_mask, total = regulate_length(
        text_enc, durations, model.max_frames
    )
    frames = model.apply(params, frames, method=lambda m, x: m.frame_proj(x))
    f0_frames, _, _ = regulate_length(
        f0_tok[..., None], durations, model.max_frames
    )
    f0_frames = f0_frames[..., 0]
    energy_frames, _, _ = regulate_length(
        energy_tok[..., None], durations, model.max_frames
    )
    energy_frames = energy_frames[..., 0]
    frames = frames + model.apply(
        params, f0_frames[..., None], method=lambda m, x: m.f0_embed(x)
    )
    wav = model.apply(
        params, frames, f0_frames, energy_frames, acoustic, None,
        method="decode",
    )
    n_frames = int(np.asarray(total)[0])
    hop = config.preprocessing.audio.fft_hop_size
    return np.asarray(wav)[0, : max(n_frames, 1) * hop]
