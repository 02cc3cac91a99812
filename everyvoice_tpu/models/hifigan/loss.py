"""HiFi-GAN training objectives (paper arXiv:2010.05646 §2.4; the reference's
hfgl submodule uses the same: LSGAN adversarial + feature matching (λ=2) +
L1 mel (λ=45), with an optional wgan variant per HiFiGANTrainTypes)."""

from __future__ import annotations

import jax.numpy as jnp


def discriminator_loss(real_scores, fake_scores, gan_type: str = "original"):
    # Scores may arrive in a reduced compute dtype (bf16 discriminators on
    # TPU); losses always reduce in float32.
    loss = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        if gan_type == "wgan":
            loss += -jnp.mean(dr) + jnp.mean(dg)
        else:  # LSGAN
            loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
    return loss


def generator_adversarial_loss(fake_scores, gan_type: str = "original"):
    loss = 0.0
    for dg in fake_scores:
        dg = dg.astype(jnp.float32)
        if gan_type == "wgan":
            loss += -jnp.mean(dg)
        else:
            loss += jnp.mean((1.0 - dg) ** 2)
    return loss


def feature_matching_loss(real_feats, fake_feats):
    loss = 0.0
    for dr_layers, dg_layers in zip(real_feats, fake_feats):
        for fr, fg in zip(dr_layers, dg_layers):
            loss += jnp.mean(
                jnp.abs(fr.astype(jnp.float32) - fg.astype(jnp.float32))
            )
    return loss


def mel_l1_loss(mel_real: jnp.ndarray, mel_fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(mel_real - mel_fake))


MEL_LOSS_WEIGHT = 45.0
FEATURE_MATCHING_WEIGHT = 2.0
