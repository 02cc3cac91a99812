"""TPU-native wav2vec2-CTC acoustic model for long-audio segmentation.

Role parity: the wav2vec2aligner submodule's acoustic scorer (reference
`everyvoice segment align`, cli.py:25-37,392-415) runs a torch
`Wav2Vec2ForCTC` per utterance on CPU/GPU. Here the same architecture is a
flax module whose parameters convert from any locally staged HuggingFace
wav2vec2-CTC checkpoint (`convert_torch_wav2vec2_state`), so per-frame label
log-probabilities are produced by one jitted XLA program on the TPU.

Long recordings are scored in fixed-shape overlapping windows
(`windowed_log_probs`): one compilation serves any audio length, and each
frame is taken from the window where it sits farthest from an edge, so
attention-context truncation only ever affects frames that have a
deeper-context duplicate. Numerical parity with
`transformers.Wav2Vec2ForCTC` is asserted in tests/test_segment.py on a
random-init tiny model (no download needed).

Both HF encoder variants are supported: post-norm (`do_stable_layer_norm=
False`, e.g. facebook/wav2vec2-base-960h) and pre-norm stable-layer-norm
(`True`, e.g. the large-robust/voxpopuli alignment models), and both
feature-extractor norms ("group" / "layer").
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _gelu(x):
    # torch nn.GELU default is the exact (erf) form.
    return nn.gelu(x, approximate=False)


class _SelfAttention(nn.Module):
    """Plain multi-head self-attention (HF Wav2Vec2Attention)."""

    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h = self.num_heads
        hd = self.hidden_size // h
        q = nn.Dense(self.hidden_size, name="q_proj")(x)
        k = nn.Dense(self.hidden_size, name="k_proj")(x)
        v = nn.Dense(self.hidden_size, name="v_proj")(x)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.hidden_size)
        return nn.Dense(self.hidden_size, name="out_proj")(out)


class _EncoderLayer(nn.Module):
    """One transformer layer; post-norm or pre-norm ("stable layer norm")."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    stable_layer_norm: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attention = _SelfAttention(
            self.hidden_size, self.num_heads, name="attention"
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")

        def feed_forward(y):
            y = nn.Dense(self.intermediate_size, name="intermediate_dense")(y)
            y = _gelu(y)
            return nn.Dense(self.hidden_size, name="output_dense")(y)

        if self.stable_layer_norm:
            x = x + attention(norm1(x))
            return x + feed_forward(norm2(x))
        x = norm1(x + attention(x))
        return norm2(x + feed_forward(x))


class Wav2Vec2CTC(nn.Module):
    """16 kHz waveform (B, S) -> per-frame CTC log-probabilities (B, T, V)."""

    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_extract_norm: str = "group"  # "group" | "layer"
    do_stable_layer_norm: bool = False
    conv_bias: bool = False

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[:, :, None]
        for i, (ch, k, s) in enumerate(
            zip(self.conv_dim, self.conv_kernel, self.conv_stride)
        ):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding="VALID",
                use_bias=self.conv_bias, name=f"conv{i}",
            )(x)
            if self.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(num_groups=ch, epsilon=1e-5, name="conv0_norm")(x)
            elif self.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=1e-5, name=f"conv{i}_norm")(x)
            x = _gelu(x)

        x = nn.LayerNorm(epsilon=1e-5, name="fp_norm")(x)
        x = nn.Dense(self.hidden_size, name="fp_proj")(x)

        kp = self.num_conv_pos_embeddings
        pos = nn.Conv(
            self.hidden_size, (kp,), padding=[(kp // 2, kp // 2)],
            feature_group_count=self.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(x)
        if kp % 2 == 0:
            pos = pos[:, :-1]
        x = x + _gelu(pos)
        if not self.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="enc_norm")(x)

        for i in range(self.num_layers):
            x = _EncoderLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.do_stable_layer_norm, name=f"layer{i}",
            )(x)
        if self.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="enc_norm")(x)

        logits = nn.Dense(self.vocab_size, name="lm_head")(x)
        return jax.nn.log_softmax(logits, axis=-1)

    def output_frames(self, n_samples: int) -> int:
        """Number of encoder frames produced for an input of n_samples."""
        t = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t

    @property
    def total_stride(self) -> int:
        stride = 1
        for s in self.conv_stride:
            stride *= s
        return stride


# ---------------------------------------------------------------------------
# torch -> flax weight conversion (for locally staged HF checkpoints)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_wav2vec2_state(
    state_dict: dict,
    num_layers: int,
    feat_extract_norm: str = "group",
    do_stable_layer_norm: bool = False,
) -> dict:
    """Convert a HuggingFace `Wav2Vec2ForCTC.state_dict()` into this module's
    flax parameter tree. Dense kernels transpose (out,in)->(in,out); conv
    kernels (out,in,K)->(K,in,out); the weight-normed positional conv is
    fused into a plain kernel."""
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: dict = {}

    fe = "wav2vec2.feature_extractor.conv_layers"
    n_convs = len({k.split(".")[3] for k in sd if k.startswith(fe)})
    for i in range(n_convs):
        w = sd[f"{fe}.{i}.conv.weight"]
        p[f"conv{i}"] = {"kernel": w.transpose(2, 1, 0)}
        if f"{fe}.{i}.conv.bias" in sd:
            p[f"conv{i}"]["bias"] = sd[f"{fe}.{i}.conv.bias"]
        if feat_extract_norm == "layer":
            p[f"conv{i}_norm"] = {
                "scale": sd[f"{fe}.{i}.layer_norm.weight"],
                "bias": sd[f"{fe}.{i}.layer_norm.bias"],
            }
    if feat_extract_norm == "group":
        p["conv0_norm"] = {
            "scale": sd[f"{fe}.0.layer_norm.weight"],
            "bias": sd[f"{fe}.0.layer_norm.bias"],
        }
    p["fp_norm"] = {
        "scale": sd["wav2vec2.feature_projection.layer_norm.weight"],
        "bias": sd["wav2vec2.feature_projection.layer_norm.bias"],
    }
    p["fp_proj"] = {
        "kernel": sd["wav2vec2.feature_projection.projection.weight"].T,
        "bias": sd["wav2vec2.feature_projection.projection.bias"],
    }

    # Weight-normed positional conv: w = g * v / ||v|| with the norm over
    # all dims except the kernel axis (torch weight_norm dim=2).
    pc = "wav2vec2.encoder.pos_conv_embed.conv"
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
        "scale": sd["wav2vec2.encoder.layer_norm.weight"],
        "bias": sd["wav2vec2.encoder.layer_norm.bias"],
    }

    for i in range(num_layers):
        pre = f"wav2vec2.encoder.layers.{i}"
        p[f"layer{i}"] = {
            "attention": {
                name: {"kernel": sd[f"{pre}.attention.{name}.weight"].T,
                       "bias": sd[f"{pre}.attention.{name}.bias"]}
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
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
    p["lm_head"] = {
        "kernel": sd["lm_head.weight"].T,
        "bias": sd["lm_head.bias"],
    }
    return {"params": p}


def load_wav2vec2_ctc(
    model_path: str,
) -> Tuple[Wav2Vec2CTC, dict, dict, bool]:
    """Load a locally staged HF wav2vec2-CTC model directory and return
    (flax module, converted params, vocab, do_normalize). The torch weights
    are read once for conversion; all inference then runs in JAX.
    `do_normalize` mirrors the model's feature extractor: when set, the
    caller must zero-mean/unit-variance normalize each utterance before
    scoring (as `Wav2Vec2Processor` does)."""
    from pathlib import Path

    path = Path(model_path)
    if not path.is_dir():
        raise FileNotFoundError(
            f"wav2vec2 model directory not found at {model_path}. Stage a "
            "CTC checkpoint (e.g. facebook/wav2vec2-base-960h) locally on a "
            "machine with network access."
        )
    from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor

    torch_model = Wav2Vec2ForCTC.from_pretrained(str(path))
    cfg = torch_model.config
    module = Wav2Vec2CTC(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=tuple(cfg.conv_dim),
        conv_kernel=tuple(cfg.conv_kernel),
        conv_stride=tuple(cfg.conv_stride),
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        feat_extract_norm=cfg.feat_extract_norm,
        do_stable_layer_norm=cfg.do_stable_layer_norm,
        conv_bias=cfg.conv_bias,
    )
    params = convert_torch_wav2vec2_state(
        torch_model.state_dict(), cfg.num_hidden_layers,
        cfg.feat_extract_norm, cfg.do_stable_layer_norm,
    )
    params = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    processor = Wav2Vec2Processor.from_pretrained(str(path))
    vocab = processor.tokenizer.get_vocab()
    do_normalize = bool(
        getattr(processor.feature_extractor, "do_normalize", False)
    )
    return module, params, vocab, do_normalize


def windowed_log_probs(
    module: Wav2Vec2CTC,
    params: dict,
    audio_16k: np.ndarray,
    window_s: float = 20.0,
    overlap_s: float = 2.0,
    sample_rate: int = 16000,
) -> np.ndarray:
    """Score arbitrarily long audio with ONE fixed-shape jitted program.

    The audio is cut into `window_s`-second windows that overlap by
    `overlap_s`; each output frame is taken from the window in which it lies
    farthest from a window edge (so every emitted frame has at least
    overlap/2 of real attention context on each side, except at the audio's
    own boundaries). Returns (T, V) with T = the frame count the model would
    produce for the full audio in one pass.
    """
    stride = module.total_stride
    win = int(window_s * sample_rate) // stride * stride
    hop_frames = module.output_frames(win) - int(
        overlap_s * sample_rate / stride
    )
    assert hop_frames > 0, "overlap must be smaller than the window"
    hop = hop_frames * stride

    audio_16k = np.asarray(audio_16k, np.float32)
    total_frames = max(module.output_frames(len(audio_16k)), 1)
    frames_per_win = module.output_frames(win)

    apply = jax.jit(lambda p, w: module.apply(p, w))
    if len(audio_16k) <= win:
        # Fits in one window: score the unpadded audio directly (zero-pad
        # would perturb the tail frames for no benefit).
        return np.asarray(apply(params, jnp.asarray(audio_16k)[None]))[0]
    out = np.zeros((total_frames, module.vocab_size), np.float32)
    filled = np.full(total_frames, -1.0)  # edge distance of current value

    start = 0
    while True:
        chunk = audio_16k[start : start + win]
        pad = win - len(chunk)
        if pad:
            chunk = np.pad(chunk, (0, pad))
        lp = np.asarray(apply(params, jnp.asarray(chunk)[None]))[0]
        first_global = start // stride
        last = start + win >= len(audio_16k)

        # Per-frame distance from the nearer window edge; the audio's own
        # boundaries don't count as edges (there is no deeper context there),
        # and frames past the real-audio end count distance to that end.
        f = np.arange(frames_per_win)
        real_frames = min(frames_per_win, module.output_frames(len(audio_16k) - start))
        right = np.maximum(real_frames - 1 - f, 0)
        if start == 0 and last:
            edge_dist = np.full(frames_per_win, float(frames_per_win))
        elif start == 0:
            edge_dist = right.astype(float)
        elif last:
            edge_dist = f.astype(float)
        else:
            edge_dist = np.minimum(f, right).astype(float)

        g = first_global + f
        valid = g < total_frames
        g, edge_dist, lp = g[valid], edge_dist[valid], lp[valid]
        better = edge_dist > filled[g]
        out[g[better]] = lp[better]
        filled[g[better]] = edge_dist[better]
        if last:
            break
        start += hop
    return out
