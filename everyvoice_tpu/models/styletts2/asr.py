"""ASR text-aligner (TMA) for StyleTTS2, in flax.

The reference's StyleTTS2 aligns text to mel by fine-tuning a pretrained
CNN+attention-seq2seq ASR ("text aligner"; schema `StyleTTS2ASRConfig`,
checkpoint `epoch_00080.pth` + `config.yml` from
everyvoice/styletts2-asr-aligner — see
/root/reference/everyvoice/.schema/everyvoice-text-to-wav-0.5.json and
/root/reference/docs/guides/styletts2.md:7-13). Its decoder attention is the
alignment source for the mono/s2s TMA losses and the joint durations.

This module provides:

- `ASRCNN`: from-scratch flax implementation — MFCC front-end (DCT over mel
  bins), strided conv stem (2x frame downsampling), dilated residual conv
  blocks, a CTC head, and `ASRS2S`, a location-sensitive-attention LSTM
  decoder (`lax.scan` over text steps).
- `convert_torch_asr_state`: torch `ASRCNN.state_dict()` -> flax tree, with
  the token embedding / output rows remapped from the pretrained symbol
  table onto project symbol IDs (no per-step translation on device).
- `load_asr_params`: stage `pretrained.asr.local_checkpoint`/`local_config`
  into (module, params).
- `asr_attention_to_tma`: adapt the decoder attention (B, N+1, L) into the
  framework's TMA interface — `attn_soft`/`attn_logprob` of shape
  (B, T_mel, N_text) — by dropping the sos step and repeating the 2x
  frame-downsampled attention back to full mel resolution. The forward-sum /
  Viterbi machinery (models/fs2/alignment.py) applies its own text-axis
  log-softmax, so mel-normalized attention is a valid score field.

TPU notes: the decoder is inherently sequential over text steps, so it is a
single `lax.scan` whose body is all batched matmuls (MXU) — the location
convolution is one `lax.conv_general_dilated` per step. Everything is
static-shape; train-time-only stochasticity (teacher-token unk-masking,
logit dropout) is gated on `deterministic`.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# everyvoice/styletts2-asr-aligner config.yml model_params defaults.
ASR_GEOMETRY = dict(
    input_dim=80,
    hidden_dim=256,
    n_token=178,
    n_layers=6,
    token_embedding_dim=512,
)


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Ortho-normalized DCT-II basis, (n_mels, n_mfcc) — what torchaudio's
    create_dct produces for the reference MFCC front-end."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    basis = np.cos(math.pi / n_mels * (n + 0.5) * k)
    basis *= np.where(k == 0, math.sqrt(1.0 / n_mels),
                      math.sqrt(2.0 / n_mels))
    return basis.astype(np.float32)


class _ConvBlock(nn.Module):
    """Three dilated residual conv stages (dilation 3**i), relu/GroupNorm(8),
    followed by the outer GroupNorm(1)."""

    hidden_dim: int
    n_inner: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.n_inner):
            res = x
            d = 3 ** i
            x = nn.Conv(self.hidden_dim, (3,), kernel_dilation=(d,),
                        padding=[(d, d)], name=f"dilated{i}")(x)
            x = nn.relu(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name=f"norm{i}")(x)
            x = nn.Conv(self.hidden_dim, (3,), padding=[(1, 1)],
                        name=f"pointwise{i}")(x)
            x = nn.relu(x)
            x = x + res
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, name="out_norm")(x)


class ASRS2S(nn.Module):
    """Location-sensitive-attention LSTM decoder over text tokens.

    Returns (hidden (B,N+1,H), logits (B,N+1,n_token),
    attention (B,N+1,L)) — step 0 is the sos step, as in the reference."""

    n_token: int
    embedding_dim: int = 512
    hidden_dim: int = 128
    location_filters: int = 32
    location_kernel: int = 63

    def setup(self):
        h, e, a = self.hidden_dim, self.embedding_dim, self.hidden_dim
        init = nn.initializers.lecun_normal()
        self.embedding = self.param(
            "embedding", nn.initializers.uniform(2 * math.sqrt(6 / h)),
            (self.n_token, e),
        )
        # Dedicated start-of-sequence embedding: under the project-symbol
        # remap the pretrained table's internal <sos> row has no project ID,
        # so it is carried as its own parameter.
        self.sos_embedding = self.param(
            "sos_embedding", nn.initializers.uniform(2 * math.sqrt(6 / h)),
            (e,),
        )
        self.w_ih = self.param("w_ih", init, (e + h, 4 * h))
        self.w_hh = self.param("w_hh", init, (h, 4 * h))
        self.b_lstm = self.param("b_lstm", nn.initializers.zeros, (4 * h,))
        self.query_kernel = self.param("query_kernel", init, (h, a))
        self.memory_kernel = self.param("memory_kernel", init, (h, a))
        self.v_kernel = self.param("v_kernel", init, (a, 1))
        self.loc_conv = self.param(
            "loc_conv", init, (self.location_kernel, 2, self.location_filters)
        )
        self.loc_dense = self.param(
            "loc_dense", init, (self.location_filters, a)
        )
        self.proj_hidden_kernel = self.param(
            "proj_hidden_kernel", init, (2 * h, h)
        )
        self.proj_hidden_bias = self.param(
            "proj_hidden_bias", nn.initializers.zeros, (h,)
        )
        self.proj_symbols_kernel = self.param(
            "proj_symbols_kernel", init, (h, self.n_token)
        )
        self.proj_symbols_bias = self.param(
            "proj_symbols_bias", nn.initializers.zeros, (self.n_token,)
        )

    def __call__(
        self,
        memory: jnp.ndarray,        # (B, L, H) projected acoustic memory
        memory_valid: jnp.ndarray,  # (B, L) True where valid
        text: jnp.ndarray,          # (B, N)
        deterministic: bool = True,
    ):
        b, length, h = memory.shape
        n = text.shape[1]
        processed_memory = memory @ self.memory_kernel  # (B, L, A)

        inputs = self.embedding[text]  # (B, N, E)
        if not deterministic:
            # Reference teacher regularization: 10% of teacher tokens are
            # replaced — here by the (held-out) sos embedding rather than the
            # pretrained table's internal <unk>, which has no project ID.
            rng = self.make_rng("dropout")
            rng_mask, rng_drop = jax.random.split(rng)
            unk = jax.random.bernoulli(rng_mask, 0.1, (b, n))
            inputs = jnp.where(unk[..., None], self.sos_embedding, inputs)
            drop_keep = jax.random.bernoulli(
                rng_drop, 0.5, (n + 1, b, self.hidden_dim)
            ).astype(memory.dtype) / 0.5
        else:
            drop_keep = jnp.ones((n + 1, b, self.hidden_dim), memory.dtype)
        sos = jnp.broadcast_to(self.sos_embedding, (b, 1, inputs.shape[-1]))
        inputs = jnp.concatenate([sos, inputs], axis=1)  # (B, N+1, E)

        def step(carry, xs):
            h_prev, c_prev, w_prev, w_cum, ctx = carry
            emb_t, drop_t = xs
            cell_in = jnp.concatenate([emb_t, ctx], axis=-1)
            gates = cell_in @ self.w_ih + h_prev @ self.w_hh + self.b_lstm
            gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(gf) * c_prev + jax.nn.sigmoid(gi) * jnp.tanh(gg)
            h_new = jax.nn.sigmoid(go) * jnp.tanh(c)
            # Location-sensitive attention (tacotron2-style).
            w_cat = jnp.stack([w_prev, w_cum], axis=-1)  # (B, L, 2)
            loc = jax.lax.conv_general_dilated(
                w_cat, self.loc_conv, window_strides=(1,),
                padding=[(self.location_kernel // 2,
                          self.location_kernel // 2)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) @ self.loc_dense  # (B, L, A)
            q = (h_new @ self.query_kernel)[:, None, :]
            energies = (jnp.tanh(q + loc + processed_memory)
                        @ self.v_kernel)[..., 0]  # (B, L)
            energies = jnp.where(memory_valid, energies, -1e9)
            w = jax.nn.softmax(energies, axis=-1)
            ctx_new = jnp.einsum("bl,blh->bh", w, memory)
            hidden = jnp.tanh(
                jnp.concatenate([h_new, ctx_new], axis=-1)
                @ self.proj_hidden_kernel + self.proj_hidden_bias
            )
            logit = (hidden * drop_t) @ self.proj_symbols_kernel \
                + self.proj_symbols_bias
            return (
                (h_new, c, w, w_cum + w, ctx_new),
                (hidden, logit, w),
            )

        zeros_h = jnp.zeros((b, self.hidden_dim), memory.dtype)
        zeros_w = jnp.zeros((b, length), memory.dtype)
        ctx0 = jnp.zeros((b, h), memory.dtype)
        carry0 = (zeros_h, zeros_h, zeros_w, zeros_w, ctx0)
        _, (hidden, logits, attn) = jax.lax.scan(
            step, carry0, (jnp.swapaxes(inputs, 0, 1), drop_keep)
        )
        return (
            jnp.swapaxes(hidden, 0, 1),
            jnp.swapaxes(logits, 0, 1),
            jnp.swapaxes(attn, 0, 1),
        )


class ASRCNN(nn.Module):
    """Mel (B, T, n_mels) + text (B, N) -> (ctc_logits (B, ceil(T/2), n_token),
    s2s_logits (B, N+1, n_token), attention (B, N+1, ceil(T/2)))."""

    n_token: int
    input_dim: int = 80
    hidden_dim: int = 256
    n_layers: int = 6
    token_embedding_dim: int = 512

    def setup(self):
        self.dct = jnp.asarray(dct_matrix(self.input_dim // 2, self.input_dim))
        self.init_cnn = nn.Conv(
            self.hidden_dim, (7,), strides=(2,), padding=[(3, 3)],
            name="init_cnn",
        )
        self.blocks = [
            _ConvBlock(self.hidden_dim, name=f"block{i}")
            for i in range(self.n_layers)
        ]
        self.projection = nn.Conv(self.hidden_dim // 2, (1,), name="projection")
        self.ctc_dense1 = nn.Dense(self.hidden_dim, name="ctc_dense1")
        self.ctc_dense2 = nn.Dense(self.n_token, name="ctc_dense2")
        self.s2s = ASRS2S(
            n_token=self.n_token,
            embedding_dim=self.token_embedding_dim,
            hidden_dim=self.hidden_dim // 2,
            name="s2s",
        )

    def encode(self, mel: jnp.ndarray, deterministic: bool = True):
        x = mel @ self.dct            # MFCC front-end, (B, T, n_mels//2)
        x = self.init_cnn(x)          # (B, ceil(T/2), H)
        for block in self.blocks:
            x = block(x, deterministic)
        return self.projection(x)     # (B, ceil(T/2), H/2)

    def __call__(
        self,
        mel: jnp.ndarray,
        mel_lengths: jnp.ndarray,
        text: jnp.ndarray,
        deterministic: bool = True,
    ):
        memory = self.encode(mel, deterministic)
        ctc = self.ctc_dense2(nn.relu(self.ctc_dense1(memory)))
        down_lengths = (mel_lengths + 1) // 2
        valid = (
            jnp.arange(memory.shape[1])[None, :] < down_lengths[:, None]
        )
        hidden, s2s_logits, attn = self.s2s(
            memory, valid, text, deterministic
        )
        return ctc, s2s_logits, attn


def asr_attention_to_tma(
    attn: jnp.ndarray,       # (B, N+1, L) decoder attention, sos step first
    t_mel: int,
    src_mask: jnp.ndarray,   # (B, N) True where text valid
    mel_mask: jnp.ndarray,   # (B, T_mel) True where mel valid
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adapt ASR decoder attention to the framework TMA interface:
    (attn_soft, attn_logprob) of shape (B, T_mel, N_text) — the reference's
    `s2s_attn[..., 1:]` slice plus upsampling from the ASR's 2x frame
    downsampling back to mel resolution."""
    attn = attn[:, 1:, :]                     # drop the sos step -> (B,N,L)
    attn = jnp.swapaxes(attn, 1, 2)           # (B, L, N)
    attn = jnp.repeat(attn, 2, axis=1)        # (B, 2L, N)
    t_have = attn.shape[1]
    if t_have < t_mel:
        attn = jnp.pad(attn, ((0, 0), (0, t_mel - t_have), (0, 0)))
    else:
        attn = attn[:, :t_mel]
    attn_logprob = jnp.log(attn + 1e-8)
    attn_logprob = jnp.where(src_mask[:, None, :], attn_logprob, -1e9)
    attn_soft = jnp.where(mel_mask[:, :, None], attn, 0.0)
    attn_soft = jnp.where(src_mask[:, None, :], attn_soft, 0.0)
    return attn_soft, attn_logprob


# ---------------------------------------------------------------------------
# torch -> flax conversion


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv1d(w: np.ndarray, b: Optional[np.ndarray] = None) -> dict:
    out = {"kernel": w.transpose(2, 1, 0)}  # (O,I,K) -> (K,I,O)
    if b is not None:
        out["bias"] = b
    return out


def convert_torch_asr_state(
    state_dict: dict,
    n_layers: int = 6,
    symbol_rows: Optional[np.ndarray] = None,
    vocab_size: Optional[int] = None,
    sos_index: int = 1,
) -> dict:
    """Convert a torch `ASRCNN.state_dict()` into this module's parameter
    tree. With `symbol_rows` (entry i = pretrained row for project symbol i,
    -1 = fresh), the token embedding and both output heads are remapped onto
    project symbol IDs, and the pretrained table's `sos_index` row becomes
    the dedicated sos embedding."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): _t(v)
        for k, v in state_dict.items()
    }

    def remap_rows(mat: np.ndarray) -> np.ndarray:
        if symbol_rows is None:
            return mat
        rows = np.asarray(symbol_rows)
        n = vocab_size if vocab_size is not None else len(rows)
        out = np.zeros((n,) + mat.shape[1:], mat.dtype)
        valid = rows >= 0
        out[np.nonzero(valid)[0]] = mat[rows[valid]]
        return out

    p: dict = {
        "init_cnn": _conv1d(sd["init_cnn.conv.weight"],
                            sd["init_cnn.conv.bias"]),
        "projection": _conv1d(sd["projection.conv.weight"],
                              sd["projection.conv.bias"]),
        "ctc_dense1": {"kernel": sd["ctc_linear.0.linear_layer.weight"].T,
                       "bias": sd["ctc_linear.0.linear_layer.bias"]},
        "ctc_dense2": {
            "kernel": remap_rows(sd["ctc_linear.2.linear_layer.weight"]).T,
            "bias": remap_rows(sd["ctc_linear.2.linear_layer.bias"]),
        },
    }
    for i in range(n_layers):
        block: dict = {}
        for j in range(3):
            inner = f"cnns.{i}.0.blocks.{j}"
            block[f"dilated{j}"] = _conv1d(sd[f"{inner}.0.conv.weight"],
                                           sd[f"{inner}.0.conv.bias"])
            block[f"norm{j}"] = {"scale": sd[f"{inner}.2.weight"],
                                 "bias": sd[f"{inner}.2.bias"]}
            block[f"pointwise{j}"] = _conv1d(sd[f"{inner}.4.conv.weight"],
                                             sd[f"{inner}.4.conv.bias"])
        block["out_norm"] = {"scale": sd[f"cnns.{i}.1.weight"],
                             "bias": sd[f"cnns.{i}.1.bias"]}
        p[f"block{i}"] = block

    a = "asr_s2s.attention_layer"
    emb = sd["asr_s2s.embedding.weight"]
    p["s2s"] = {
        "embedding": remap_rows(emb),
        "sos_embedding": emb[sos_index],
        "w_ih": sd["asr_s2s.decoder_rnn.weight_ih"].T,
        "w_hh": sd["asr_s2s.decoder_rnn.weight_hh"].T,
        "b_lstm": sd["asr_s2s.decoder_rnn.bias_ih"]
        + sd["asr_s2s.decoder_rnn.bias_hh"],
        "query_kernel": sd[f"{a}.query_layer.linear_layer.weight"].T,
        "memory_kernel": sd[f"{a}.memory_layer.linear_layer.weight"].T,
        "v_kernel": sd[f"{a}.v.linear_layer.weight"].T,
        "loc_conv": sd[f"{a}.location_layer.location_conv.conv.weight"]
        .transpose(2, 1, 0),
        "loc_dense": sd[f"{a}.location_layer.location_dense.linear_layer"
                        ".weight"].T,
        "proj_hidden_kernel": sd["asr_s2s.project_to_hidden.0.linear_layer"
                                 ".weight"].T,
        "proj_hidden_bias": sd["asr_s2s.project_to_hidden.0.linear_layer"
                               ".bias"],
        "proj_symbols_kernel":
            remap_rows(sd["asr_s2s.project_to_n_symbols.weight"]).T,
        "proj_symbols_bias":
            remap_rows(sd["asr_s2s.project_to_n_symbols.bias"]),
    }
    return p


def geometry_from_config_yml(config_path) -> dict:
    """Read ASRCNN geometry from the aligner repo's config.yml
    `model_params`."""
    import yaml

    raw = yaml.safe_load(Path(config_path).read_text(encoding="utf8")) or {}
    mp = raw.get("model_params", raw)
    geometry = dict(ASR_GEOMETRY)
    for key in geometry:
        if key in mp:
            geometry[key] = int(mp[key])
    return geometry


def load_asr_params(
    checkpoint_path,
    config_path=None,
    project_symbols: Optional[Sequence[str]] = None,
    pretrained_symbols: Optional[Sequence[str]] = None,
) -> Tuple[ASRCNN, dict]:
    """Load `pretrained.asr.local_checkpoint` (+ optional `local_config`)
    into (ASRCNN module, flax params), remapping token tables onto project
    symbol IDs when both symbol tables are given."""
    from everyvoice_tpu.models.styletts2.plbert import load_torch_or_npz_state

    state = load_torch_or_npz_state(checkpoint_path)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    geometry = (
        geometry_from_config_yml(config_path)
        if config_path is not None
        else dict(ASR_GEOMETRY)
    )
    rows = None
    if project_symbols is not None:
        from everyvoice_tpu.models.styletts2.plbert import symbol_row_map

        rows = symbol_row_map(project_symbols, pretrained_symbols or [])
        geometry["n_token"] = len(rows)
    params = convert_torch_asr_state(
        state,
        n_layers=geometry["n_layers"],
        symbol_rows=rows,
        vocab_size=geometry["n_token"],
    )
    module = ASRCNN(
        n_token=geometry["n_token"],
        input_dim=geometry["input_dim"],
        hidden_dim=geometry["hidden_dim"],
        n_layers=geometry["n_layers"],
        token_embedding_dim=geometry["token_embedding_dim"],
    )
    return module, jax.tree_util.tree_map(jnp.asarray, params)
