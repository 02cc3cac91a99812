"""JDC pitch network: the StyleTTS2 F0 extractor, in flax.

The reference's StyleTTS2 extracts per-frame F0 targets with a frozen
pretrained JDCNet (joint detection-and-classification pitch network;
schema `StyleTTS2JDCConfig`, checkpoint `bst.t7` from
everyvoice/styletts2-jdc-f0 — see
/root/reference/everyvoice/.schema/everyvoice-text-to-wav-0.5.json and
/root/reference/docs/guides/styletts2.md:7-13). This module provides:

- `JDCNet`: a from-scratch flax implementation of the classifier path the
  reference actually uses at train time (conv stem -> three pooling
  res-blocks -> BiLSTM -> linear F0 regression; the unused voicing-detector
  branch is not reproduced). Frozen inference path: BatchNorm uses the
  checkpoint's running statistics (the reference calls it under no_grad).
- `convert_torch_jdc_state`: torch `JDCNet.state_dict()` (or the published
  `{'net': ...}` checkpoint) -> flax parameter tree.
- `load_jdc_params`: stage `pretrained.f0.local_path` into (module, params).
- `jdc_f0`: mel (framework convention, natural-log compressed) -> per-frame
  F0 in Hz, applying the reference pipeline's mel normalization
  ((log_mel - (-4)) / 4) before the network.

TPU notes: the convs are small but batched 2-D convs that XLA tiles onto
the MXU directly; the BiLSTM is two `lax.scan`s (sequential by nature, but
it runs once per step on stop-gradient targets, off the backward path).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _FrozenBN(nn.Module):
    """Inference-mode BatchNorm: y = scale * (x - mean) / sqrt(var+eps) + bias
    with the running statistics stored as (non-updated) parameters."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return scale * (x - mean) * jax.lax.rsqrt(var + self.eps) + bias


def _lstm_scan(x, w_ih, w_hh, b):
    """One-direction LSTM over (B, T, F) with torch's [i, f, g, o] gate
    layout; kernels stored pre-transposed as (F, 4H) / (H, 4H)."""
    batch = x.shape[0]
    hidden = w_hh.shape[0]
    h0 = jnp.zeros((batch, hidden), x.dtype)

    def step(carry, x_t):
        h, c = carry
        gates = x_t @ w_ih + h @ w_hh + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


class _BiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        shapes = {
            "w_ih_fwd": (feat, 4 * self.hidden),
            "w_hh_fwd": (self.hidden, 4 * self.hidden),
            "b_fwd": (4 * self.hidden,),
            "w_ih_bwd": (feat, 4 * self.hidden),
            "w_hh_bwd": (self.hidden, 4 * self.hidden),
            "b_bwd": (4 * self.hidden,),
        }
        p = {
            name: self.param(
                name,
                nn.initializers.zeros if name.startswith("b")
                else nn.initializers.lecun_normal(),
                shape,
            )
            for name, shape in shapes.items()
        }
        fwd = _lstm_scan(x, p["w_ih_fwd"], p["w_hh_fwd"], p["b_fwd"])
        bwd = _lstm_scan(
            x[:, ::-1], p["w_ih_bwd"], p["w_hh_bwd"], p["b_bwd"]
        )[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class _ResBlock(nn.Module):
    """JDC res-block: BN/LeakyReLU/bin-axis-MaxPool pre-stage, then a
    two-conv residual with a 1x1 shortcut."""

    in_ch: int
    out_ch: int
    slope: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _FrozenBN(self.in_ch, name="pre_bn")(x)
        x = nn.leaky_relu(x, self.slope)
        x = nn.max_pool(x, (1, 2), strides=(1, 2))
        y = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False,
                    name="conv1")(x)
        y = _FrozenBN(self.out_ch, name="mid_bn")(y)
        y = nn.leaky_relu(y, self.slope)
        y = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        shortcut = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                           name="shortcut")(x)
        return y + shortcut


class JDCNet(nn.Module):
    """Mel (B, T, n_mels) -> per-frame F0 (B, T), classifier path only.

    At the published geometry (the default), `n_mels` must be 80: the three
    res-block pools (80->40->20->10) and the final (1,4) pool (10->2)
    produce exactly the 2*256=512 BiLSTM features the pretrained weights
    expect. The geometry knobs exist so a reduced-size mirror can be pinned
    by a small committed golden fixture
    (tests/data/golden_pretrained/jdc.npz)."""

    num_class: int = 1
    slope: float = 0.01
    channels: Tuple[int, int, int, int] = (64, 128, 192, 256)
    lstm_hidden: int = 256

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = mel.shape
        c0, c1, c2, c3 = self.channels
        x = mel[..., None]  # (B, T, bins, 1)
        x = nn.Conv(c0, (3, 3), padding="SAME", use_bias=False,
                    name="stem_conv1")(x)
        x = _FrozenBN(c0, name="stem_bn")(x)
        x = nn.leaky_relu(x, self.slope)
        x = nn.Conv(c0, (3, 3), padding="SAME", use_bias=False,
                    name="stem_conv2")(x)
        x = _ResBlock(c0, c1, name="res1")(x)
        x = _ResBlock(c1, c2, name="res2")(x)
        x = _ResBlock(c2, c3, name="res3")(x)
        x = _FrozenBN(c3, name="pool_bn")(x)
        x = nn.leaky_relu(x, self.slope)
        x = nn.max_pool(x, (1, 4), strides=(1, 4))  # bins 10 -> 2
        # torch flattens (C, bins) channel-major: (B,T,bins,C)->(B,T,C,bins).
        x = x.transpose(0, 1, 3, 2).reshape(b, t, -1)  # (B, T, 512)
        x = _BiLSTM(self.lstm_hidden, name="bilstm")(x)
        x = nn.Dense(self.num_class, name="classifier")(x)
        return jnp.abs(x[..., 0])


# ---------------------------------------------------------------------------
# torch -> flax conversion


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv(w: np.ndarray) -> dict:
    return {"kernel": w.transpose(2, 3, 1, 0)}  # (O,I,kh,kw) -> (kh,kw,I,O)


def _bn(sd: dict, prefix: str) -> dict:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _res(sd: dict, prefix: str) -> dict:
    # conv1by1 is a bare Conv2d in the published model, a one-element
    # Sequential in some forks.
    short_key = (
        f"{prefix}.conv1by1.weight"
        if f"{prefix}.conv1by1.weight" in sd
        else f"{prefix}.conv1by1.0.weight"
    )
    return {
        "pre_bn": _bn(sd, f"{prefix}.pre_conv.0"),
        "conv1": _conv(sd[f"{prefix}.conv.0.weight"]),
        "mid_bn": _bn(sd, f"{prefix}.conv.1"),
        "conv2": _conv(sd[f"{prefix}.conv.3.weight"]),
        "shortcut": _conv(sd[short_key]),
    }


def convert_torch_jdc_state(state_dict: dict) -> dict:
    """Convert a torch `JDCNet.state_dict()` (or the published checkpoint's
    `{'net': ...}` payload) into this module's parameter tree. The unused
    detector branch (maxpools/detector_conv/bilstm_detector/detector) is
    ignored."""
    if "net" in state_dict and isinstance(state_dict["net"], dict):
        state_dict = state_dict["net"]
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): _t(v)
        for k, v in state_dict.items()
    }
    lstm = "bilstm_classifier"
    return {
        "stem_conv1": _conv(sd["conv_block.0.weight"]),
        "stem_bn": _bn(sd, "conv_block.1"),
        "stem_conv2": _conv(sd["conv_block.3.weight"]),
        "res1": _res(sd, "res_block1"),
        "res2": _res(sd, "res_block2"),
        "res3": _res(sd, "res_block3"),
        "pool_bn": _bn(sd, "pool_block.0"),
        "bilstm": {
            "w_ih_fwd": sd[f"{lstm}.weight_ih_l0"].T,
            "w_hh_fwd": sd[f"{lstm}.weight_hh_l0"].T,
            "b_fwd": sd[f"{lstm}.bias_ih_l0"] + sd[f"{lstm}.bias_hh_l0"],
            "w_ih_bwd": sd[f"{lstm}.weight_ih_l0_reverse"].T,
            "w_hh_bwd": sd[f"{lstm}.weight_hh_l0_reverse"].T,
            "b_bwd": sd[f"{lstm}.bias_ih_l0_reverse"]
            + sd[f"{lstm}.bias_hh_l0_reverse"],
        },
        "classifier": {
            "kernel": sd["classifier.weight"].T,
            "bias": sd["classifier.bias"],
        },
    }


def load_jdc_params(path) -> Tuple[JDCNet, dict]:
    """Load `pretrained.f0.local_path` (the bst.t7 checkpoint staged by
    `everyvoice-tpu fetch-pretrained`, or an .npz with the same keys) into
    (JDCNet module, params)."""
    from everyvoice_tpu.models.styletts2.plbert import load_torch_or_npz_state

    state = load_torch_or_npz_state(path)
    params = convert_torch_jdc_state(state)
    return JDCNet(), jax.tree_util.tree_map(jnp.asarray, params)


# StyleTTS2's mel normalization (meldataset: (log_mel - mean) / std).
REFERENCE_MEL_MEAN = -4.0
REFERENCE_MEL_STD = 4.0


def jdc_f0(module: JDCNet, params: dict, mel: jnp.ndarray) -> jnp.ndarray:
    """Per-frame F0 (Hz) from a framework-convention mel (natural-log
    compressed, `dsp.spectral.dynamic_range_compression`), re-normalized to
    the statistics the pretrained JDC weights were trained with."""
    normalized = (mel - REFERENCE_MEL_MEAN) / REFERENCE_MEL_STD
    return module.apply({"params": params}, normalized)
