"""Speech-language-model (WavLM) feature encoder + SLM discriminator for
StyleTTS2 SLM-adversarial training.

The reference (styletts2 submodule; schema `everyvoice-text-to-wav-0.5.json`
`slm`/`slmadv` sections) discriminates real vs generated speech through the
frozen hidden states of microsoft/wavlm-base-plus (16 kHz, 13 layers) with a
small convolutional head, weighted by `lambda_slm`. This module provides:

- `WavLM`: a from-scratch flax implementation of the WavLM architecture
  (conv feature encoder -> gated relative-position-bias transformer) whose
  parameters can be converted from a locally available HuggingFace torch
  checkpoint with `convert_torch_wavlm_state` / `load_wavlm_params`.
  Numerical parity with the torch implementation is asserted in
  tests/test_styletts2.py (random-init tiny model, no download needed).
- `SLMDiscriminator`: the trainable head over stacked WavLM hidden states
  (`slm.nlayers` x `slm.hidden` features, `slm.initial_channel` width).
- `slm_generator_loss` / `slm_discriminator_loss`: LSGAN objectives.

Everything is jit-friendly: static shapes, no data-dependent control flow.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# wavlm-base-plus geometry (HF WavLMConfig defaults).
BASE_PLUS = dict(
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=3072,
    conv_dim=(512,) * 7,
    conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2),
    num_buckets=320,
    max_distance=800,
    num_conv_pos_embeddings=128,
    num_conv_pos_embedding_groups=16,
)


def _gelu(x):
    # torch nn.GELU default is the exact (erf) form.
    return nn.gelu(x, approximate=False)


def relative_position_buckets(
    length: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """T5-style bidirectional log-bucketing of relative positions, matching
    WavLM's `_relative_positions_bucket` exactly (host-side, static)."""
    half = num_buckets // 2
    context = np.arange(length)[:, None]
    memory = np.arange(length)[None, :]
    rel = memory - context
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / np.log(max_distance / max_exact)
    large = (max_exact + large * (half - max_exact)).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


class WavLMAttention(nn.Module):
    """Self-attention with WavLM's gated relative position bias."""

    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, position_bias: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h = self.num_heads
        hd = self.hidden_size // h
        q = nn.Dense(self.hidden_size, name="q_proj")(x)
        k = nn.Dense(self.hidden_size, name="k_proj")(x)
        v = nn.Dense(self.hidden_size, name="v_proj")(x)

        # Gate the shared position bias from the (pre-projection) hidden
        # states: per head, project head_dim -> 8, fold to 2 gates.
        gate_const = self.param(
            "gru_rel_pos_const", nn.initializers.ones, (1, h, 1, 1)
        )
        gated = x.reshape(b, t, h, hd).transpose(0, 2, 1, 3)  # (B,H,T,hd)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(gated)
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
        gate = gate_a * (gate_b * gate_const - 1.0) + 2.0  # (B,H,T,1)
        gated_bias = gate * position_bias[None]  # (B,H,T,T)

        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + gated_bias
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.hidden_size)
        return nn.Dense(self.hidden_size, name="out_proj")(out)


class WavLMLayer(nn.Module):
    """Post-norm transformer layer (WavLM base is not stable-layer-norm)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, position_bias: jnp.ndarray) -> jnp.ndarray:
        x = x + WavLMAttention(
            self.hidden_size, self.num_heads, name="attention"
        )(x, position_bias)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        ff = nn.Dense(self.intermediate_size, name="intermediate_dense")(x)
        ff = _gelu(ff)
        ff = nn.Dense(self.hidden_size, name="output_dense")(ff)
        x = x + ff
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


class WavLM(nn.Module):
    """WavLM feature encoder: 16 kHz waveform -> (num_layers+1) hidden
    states at 50 Hz. Matches HF `transformers.WavLMModel` numerically
    (inference path; masking/layerdrop are train-time-only there)."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    num_buckets: int = 320
    max_distance: int = 800
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        # --- conv feature extractor (GroupNorm on the first layer) -------
        x = wav[:, :, None]
        for i, (ch, k, s) in enumerate(
            zip(self.conv_dim, self.conv_kernel, self.conv_stride)
        ):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, name="conv0_norm")(x)
            x = _gelu(x)

        # --- feature projection ------------------------------------------
        x = nn.LayerNorm(epsilon=1e-5, name="fp_norm")(x)
        x = nn.Dense(self.hidden_size, name="fp_proj")(x)

        # --- convolutional positional embedding --------------------------
        kp = self.num_conv_pos_embeddings
        pos = nn.Conv(
            self.hidden_size, (kp,), padding=[(kp // 2, kp // 2)],
            feature_group_count=self.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(x)
        if kp % 2 == 0:
            pos = pos[:, :-1]
        x = x + _gelu(pos)
        x = nn.LayerNorm(epsilon=1e-5, name="enc_norm")(x)

        # --- shared relative position bias (computed by layer 0) ---------
        t = x.shape[1]
        buckets = jnp.asarray(
            relative_position_buckets(t, self.num_buckets, self.max_distance)
        )
        rel_embed = self.param(
            "rel_attn_embed",
            nn.initializers.normal(0.02),
            (self.num_buckets, self.num_heads),
        )
        position_bias = rel_embed[buckets].transpose(2, 0, 1)  # (H,T,T)

        hidden_states = [x]
        for i in range(self.num_layers):
            x = WavLMLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                name=f"layer{i}",
            )(x, position_bias)
            hidden_states.append(x)
        return tuple(hidden_states)


class SLMDiscriminator(nn.Module):
    """Trainable head over stacked frozen WavLM hidden states (the
    reference's WavLMDiscriminator shape: slm.hidden x slm.nlayers inputs,
    slm.initial_channel width)."""

    initial_channel: int = 64

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        # feats: (B, T, nlayers*hidden)
        ch = self.initial_channel
        x = nn.Conv(ch, (1,), name="pre")(feats)
        for i, mult in enumerate((2, 4)):
            x = nn.Conv(ch * mult, (3,), name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(1, (3,), name="post")(x)
        return x[..., 0]  # (B, T)


def stack_hidden_states(hidden_states: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """(num_layers+1) x (B,T,H) -> (B,T,(num_layers+1)*H)."""
    return jnp.concatenate(list(hidden_states), axis=-1)


def slm_generator_loss(fake_scores: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((fake_scores - 1.0) ** 2)


def slm_discriminator_loss(
    real_scores: jnp.ndarray, fake_scores: jnp.ndarray
) -> jnp.ndarray:
    return jnp.mean((real_scores - 1.0) ** 2) + jnp.mean(fake_scores ** 2)


# ---------------------------------------------------------------------------
# torch -> flax weight conversion (for locally available HF checkpoints)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_wavlm_state(state_dict: dict, num_layers: int) -> dict:
    """Convert a HuggingFace `WavLMModel.state_dict()` into this module's
    flax parameter tree. Dense kernels transpose (out,in)->(in,out); conv
    kernels (out,in,K)->(K,in,out); the weight-normed positional conv is
    fused into a plain kernel."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: dict = {}

    n_convs = len([k for k in sd if k.endswith(".conv.weight")
                   and k.startswith("feature_extractor")])
    for i in range(n_convs):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        p[f"conv{i}"] = {"kernel": w.transpose(2, 1, 0)}
    p["conv0_norm"] = {
        "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
        "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
    }
    p["fp_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["fp_proj"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }

    # Weight-normed positional conv: w = g * v / ||v|| with the norm taken
    # over all dims except the kernel axis (torch weight_norm dim=2).
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    else:  # older torch: weight_g / weight_v
        g = sd[f"{pc}.weight_g"]
        v = sd[f"{pc}.weight_v"]
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / norm  # (out, in/groups, K)
    p["pos_conv"] = {"kernel": w.transpose(2, 1, 0), "bias": sd[f"{pc}.bias"]}

    p["enc_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }
    p["rel_attn_embed"] = sd["encoder.layers.0.attention.rel_attn_embed.weight"]

    for i in range(num_layers):
        pre = f"encoder.layers.{i}"
        attn = {
            "q_proj": {"kernel": sd[f"{pre}.attention.q_proj.weight"].T,
                       "bias": sd[f"{pre}.attention.q_proj.bias"]},
            "k_proj": {"kernel": sd[f"{pre}.attention.k_proj.weight"].T,
                       "bias": sd[f"{pre}.attention.k_proj.bias"]},
            "v_proj": {"kernel": sd[f"{pre}.attention.v_proj.weight"].T,
                       "bias": sd[f"{pre}.attention.v_proj.bias"]},
            "out_proj": {"kernel": sd[f"{pre}.attention.out_proj.weight"].T,
                         "bias": sd[f"{pre}.attention.out_proj.bias"]},
            "gru_rel_pos_linear": {
                "kernel": sd[f"{pre}.attention.gru_rel_pos_linear.weight"].T,
                "bias": sd[f"{pre}.attention.gru_rel_pos_linear.bias"],
            },
            "gru_rel_pos_const": sd[f"{pre}.attention.gru_rel_pos_const"],
        }
        p[f"layer{i}"] = {
            "attention": attn,
            "layer_norm": {"scale": sd[f"{pre}.layer_norm.weight"],
                           "bias": sd[f"{pre}.layer_norm.bias"]},
            "intermediate_dense": {
                "kernel": sd[f"{pre}.feed_forward.intermediate_dense.weight"].T,
                "bias": sd[f"{pre}.feed_forward.intermediate_dense.bias"],
            },
            "output_dense": {
                "kernel": sd[f"{pre}.feed_forward.output_dense.weight"].T,
                "bias": sd[f"{pre}.feed_forward.output_dense.bias"],
            },
            "final_layer_norm": {
                "scale": sd[f"{pre}.final_layer_norm.weight"],
                "bias": sd[f"{pre}.final_layer_norm.bias"],
            },
        }
    return {"params": p}


def load_wavlm_params(model_path: str) -> tuple:
    """Load a locally available WavLM checkpoint (a HF model directory or a
    .bin/.safetensors state dict) and return (WavLM module, params).
    Requires the weights to already be on disk — this environment has no
    network egress; `everyvoice fetch-pretrained` documents how to stage
    them."""
    from pathlib import Path

    path = Path(model_path)
    if not path.exists():
        raise FileNotFoundError(
            f"WavLM weights not found at {model_path}. Download "
            "microsoft/wavlm-base-plus with `everyvoice fetch-pretrained` "
            "on a machine with network access and point slm.model at the "
            "local directory."
        )
    import torch

    if path.is_dir():
        from transformers import WavLMModel

        torch_model = WavLMModel.from_pretrained(str(path))
        state = torch_model.state_dict()
        cfg = torch_model.config
        geometry = dict(
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            conv_dim=tuple(cfg.conv_dim),
            conv_kernel=tuple(cfg.conv_kernel),
            conv_stride=tuple(cfg.conv_stride),
            num_buckets=cfg.num_buckets,
            max_distance=cfg.max_bucket_distance,
            num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        )
    else:
        state = torch.load(str(path), map_location="cpu")
        geometry = dict(BASE_PLUS)
    module = WavLM(**geometry)
    params = convert_torch_wavlm_state(state, geometry["num_layers"])
    return module, jax.tree_util.tree_map(jnp.asarray, params)
