"""FastSpeech2 training losses
(parity: fs2 submodule loss weights in everyvoice-text-to-spec-0.5.json:
mel 1.0 / postnet 1.0 / pitch 0.1 / energy 0.1 / duration 0.1 /
attn_ctc 0.1 / attn_bin 0.1 with a warmup ramp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from everyvoice_tpu.models.fs2.alignment import (
    binarization_loss,
    durations_from_hard_attention,
    forward_sum_loss,
    viterbi_alignment,
)


def masked_loss(pred, target, mask, kind: str = "mse"):
    diff = pred - target
    if kind == "mae":
        per = jnp.abs(diff)
    else:
        per = diff * diff
    if mask.ndim < per.ndim:
        mask = mask[..., None]
    per = jnp.where(mask, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(mask) * (per.size // mask.size), 1)


def compute_fs2_losses(
    outputs: dict,
    batch: dict,
    weights: dict,
    mel_loss_kind: str = "mse",
    variance_loss_kind: str = "mse",
    learn_alignment: bool = True,
    bin_loss_ramp: float = 1.0,
) -> dict:
    """Returns a dict of individual losses plus 'total'.

    When the batch carries `row_weights` (0/1 per row, from
    pad_batch_for_eval), pad-duplicated rows are masked out of every term so
    they never bias the monitored loss."""
    losses = {}
    frame_mask = outputs["frame_mask"]
    src_mask = outputs["src_mask"]
    row_weights = batch.get("row_weights")
    if row_weights is not None:
        real = row_weights > 0.5
        frame_mask = frame_mask & real[:, None]
        src_mask = src_mask & real[:, None]
    mel_target = batch["mel"]

    losses["mel"] = masked_loss(
        outputs["mel"], mel_target, frame_mask, mel_loss_kind
    )
    if "postnet_mel" in outputs:
        losses["postnet"] = masked_loss(
            outputs["postnet_mel"], mel_target, frame_mask, mel_loss_kind
        )

    # ----- durations
    if learn_alignment and "attn_logprob" in outputs:
        attn_logprob = outputs["attn_logprob"]
        attn_soft = outputs["attn_soft"]
        src_lengths = batch["text_lengths"]
        mel_lengths = batch["mel_lengths"]
        losses["attn_ctc"] = forward_sum_loss(
            attn_logprob, src_lengths, mel_lengths, row_weights=row_weights
        )
        if "attn_hard" in outputs:
            attn_hard = outputs["attn_hard"]
        else:
            attn_hard = jax.lax.stop_gradient(
                viterbi_alignment(attn_logprob, src_lengths, mel_lengths)
            )
        if row_weights is not None:
            # Zeroed hard paths drop pad rows from the binarization mean.
            attn_hard = attn_hard * row_weights[:, None, None]
        losses["attn_bin"] = bin_loss_ramp * binarization_loss(
            attn_soft, attn_hard
        )
        duration_target = outputs.get(
            "duration_target", durations_from_hard_attention(attn_hard)
        )
    else:
        duration_target = batch["durations"]

    log_duration_target = jnp.log1p(duration_target.astype(jnp.float32))
    losses["duration"] = masked_loss(
        outputs["log_duration_prediction"],
        log_duration_target,
        src_mask,
        variance_loss_kind,
    )

    # ----- pitch / energy: compare against the (possibly phone-averaged)
    # targets the model actually consumed
    pitch_target = outputs.get("pitch_target_used")
    if pitch_target is None:
        pitch_target = batch["pitch"]
    energy_target = outputs.get("energy_target_used")
    if energy_target is None:
        energy_target = batch["energy"]
    pitch_mask = src_mask if pitch_target.shape == src_mask.shape else frame_mask
    energy_mask = src_mask if energy_target.shape == src_mask.shape else frame_mask
    losses["pitch"] = masked_loss(
        outputs["pitch_prediction"],
        jax.lax.stop_gradient(pitch_target),
        pitch_mask,
        variance_loss_kind,
    )
    losses["energy"] = masked_loss(
        outputs["energy_prediction"],
        jax.lax.stop_gradient(energy_target),
        energy_mask,
        variance_loss_kind,
    )

    total = (
        weights.get("mel", 1.0) * losses["mel"]
        + weights.get("postnet", 1.0) * losses.get("postnet", 0.0)
        + weights.get("duration", 0.1) * losses["duration"]
        + weights.get("pitch", 0.1) * losses["pitch"]
        + weights.get("energy", 0.1) * losses["energy"]
        + weights.get("attn_ctc", 0.1) * losses.get("attn_ctc", 0.0)
        + weights.get("attn_bin", 0.1) * losses.get("attn_bin", 0.0)
    )
    losses["total"] = total
    return losses
