"""StyleTTS2 training objectives (stage 1 + stage 2)
(loss weights per the schema's StyleTTS2LossConfig: λ mel 5 / gen 1 / slm 1 /
mono 1 / s2s 1 / F0 1 / norm 1 / dur 1 / ce 20 / sty 1 / diff 1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mel_reconstruction_loss(wav_fake, wav_real, mel_fn, compress_fn):
    mel_fake = compress_fn(mel_fn(wav_fake))
    mel_real = compress_fn(mel_fn(wav_real))
    return jnp.mean(jnp.abs(mel_fake - mel_real))


def duration_ce_loss(dur_logits, dur_targets, mask, max_dur: int):
    """Cross-entropy over quantized durations (λ_ce 20)."""
    targets = jnp.clip(dur_targets, 0, max_dur - 1)
    logp = jax.nn.log_softmax(dur_logits, axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1)


def duration_l1_loss(dur_logits, dur_targets, mask):
    """Soft expected-duration L1 (λ_dur 1): E[d] under the softmax vs target."""
    probs = jax.nn.softmax(dur_logits, axis=-1)
    support = jnp.arange(dur_logits.shape[-1], dtype=probs.dtype)
    expected = jnp.sum(probs * support, axis=-1)
    per = jnp.abs(expected - dur_targets.astype(probs.dtype))
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1)


def f0_loss(f0_pred, f0_target, mask):
    per = jnp.abs(f0_pred - f0_target)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1)


def norm_loss(energy_pred, energy_target, mask):
    per = jnp.abs(energy_pred - energy_target)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1)


def asr_s2s_loss(s2s_logits, text, mask):
    """The reference's seq2seq TMA loss (λ_s2s): cross-entropy of the
    pretrained ASR decoder's text predictions under teacher forcing. The
    decoder emits N+1 steps (sos step first); step i predicts token i, and
    the final step's EOS prediction is unsupervised (the pretrained table's
    EOS row has no project symbol ID)."""
    logp = jax.nn.log_softmax(s2s_logits[:, :-1], axis=-1)  # (B, N, n_token)
    picked = jnp.take_along_axis(logp, text[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1)


def style_reconstruction_loss(style_pred, style_target):
    """λ_sty: L1 between diffusion-sampled and encoder-extracted styles."""
    return jnp.mean(jnp.abs(style_pred - style_target))


def diffusion_edm_loss(
    denoiser_apply, key, clean_style, text_embedding, sigma_data: float = 0.2
):
    """EDM denoising loss on style vectors (λ_diff)."""
    b = clean_style.shape[0]
    key_sigma, key_noise = jax.random.split(key)
    # Log-normal sigma sampling (schema dist: mean -3.0, std 1.0 in log space
    # is heavy; use the configured values upstream).
    log_sigma = jax.random.normal(key_sigma, (b,)) * 1.0 + (-3.0)
    sigma = jnp.exp(log_sigma)
    noise = jax.random.normal(key_noise, clean_style.shape)
    noisy = clean_style + sigma[:, None] * noise
    denoised = denoiser_apply(noisy, sigma, text_embedding)
    weight = (sigma**2 + sigma_data**2) / ((sigma * sigma_data) ** 2 + 1e-12)
    per = jnp.mean((denoised - clean_style) ** 2, axis=-1)
    return jnp.mean(weight * per)
