"""Optimizer factory: pydantic optimizer configs → optax transforms
(parity: the reference's Adam/AdamW/RMS/Noam options,
config/shared_types.py:276-316)."""

from __future__ import annotations

import optax

from everyvoice_tpu.config.shared_types import (
    AdamOptimizer,
    AdamWOptimizer,
    NoamOptimizer,
    RMSOptimizer,
)


def noam_schedule(
    base_lr: float, warmup_steps: int, model_dim: int = 256
) -> optax.Schedule:
    """Noam LR shape (linear warmup → inverse-sqrt decay), normalized so the
    configured learning_rate is the PEAK value reached at `warmup_steps` —
    matching how the reference's Noam config is used (its 1e-3 default is a
    real peak lr, not a multiplier on the d_model^-0.5 factor)."""
    scale = base_lr * (warmup_steps**0.5)

    def schedule(step):
        step = step + 1  # 1-indexed to avoid 0^-0.5
        import jax.numpy as jnp

        return scale * jnp.minimum(
            step ** -0.5, step * (warmup_steps ** -1.5)
        )

    return schedule


def learning_rate_at(optimizer_config, step: int, model_dim: int = 256) -> float:
    """Current learning rate for logging (the reference's
    LearningRateMonitor role, base_cli/helpers.py:234-251). Pure host math —
    no device dispatch on the logging path."""
    cfg = optimizer_config
    if isinstance(cfg, NoamOptimizer):
        s = step + 1  # matches noam_schedule's 1-indexing
        scale = cfg.learning_rate * (cfg.warmup_steps**0.5)
        return float(scale * min(s**-0.5, s * cfg.warmup_steps**-1.5))
    # StyleTTS2's optimizer config names the field `lr`.
    return float(getattr(cfg, "learning_rate", None) or getattr(cfg, "lr", 0.0))


def build_optimizer(
    optimizer_config,
    model_dim: int = 256,
    gradient_clip_val: float | None = None,
) -> optax.GradientTransformation:
    """`gradient_clip_val` applies global-norm clipping before the update —
    the role of the reference's Trainer(gradient_clip_val=...) flag
    (base_cli/helpers.py:193,269)."""
    base = _base_optimizer(optimizer_config, model_dim)
    if gradient_clip_val is not None and gradient_clip_val > 0:
        return optax.chain(
            optax.clip_by_global_norm(gradient_clip_val), base
        )
    return base


def _base_optimizer(optimizer_config, model_dim: int = 256) -> optax.GradientTransformation:
    cfg = optimizer_config
    if isinstance(cfg, NoamOptimizer):
        return optax.adamw(
            learning_rate=noam_schedule(cfg.learning_rate, cfg.warmup_steps, model_dim),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    if isinstance(cfg, AdamWOptimizer):
        return optax.adamw(
            learning_rate=cfg.learning_rate,
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    if isinstance(cfg, AdamOptimizer):
        return optax.adam(
            learning_rate=cfg.learning_rate,
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
        )
    if isinstance(cfg, RMSOptimizer):
        return optax.rmsprop(
            learning_rate=cfg.learning_rate, decay=cfg.alpha, eps=cfg.eps,
        )
    raise ValueError(f"Unknown optimizer config: {type(cfg)}")
