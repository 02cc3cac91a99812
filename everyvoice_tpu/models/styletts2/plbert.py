"""PL-BERT: phoneme-level ALBERT text encoder for StyleTTS2.

The reference's StyleTTS2 conditions its prosody predictor and style
diffusion on a pretrained multilingual PL-BERT (an `AlbertModel` with the
`model_params` from papercup-ai/multilingual-pl-bert's config.yml; see the
schema `StyleTTS2PLBERTConfig` in
/root/reference/everyvoice/.schema/everyvoice-text-to-wav-0.5.json and
/root/reference/docs/guides/styletts2.md:7-13). This module provides:

- `PLBERT`: a from-scratch flax ALBERT encoder (shared-parameter transformer
  layer applied `num_layers` times) numerically matching
  `transformers.AlbertModel`'s `last_hidden_state` on the inference path.
- `convert_torch_plbert_state`: torch `AlbertModel.state_dict()` (or the
  PL-BERT `step_*.t7` training checkpoint, whose keys carry
  `module.encoder.` prefixes) -> flax parameter tree.
- `load_plbert_params`: stage a local checkpoint + config.yml (downloaded by
  `everyvoice-tpu fetch-pretrained`) into (module, params), remapping the
  pretrained 178-symbol embedding table onto the project's symbol IDs so no
  per-step token translation is needed on device.

Everything is jit-friendly: static shapes, no data-dependent control flow;
the shared-layer loop is a Python loop over a single flax submodule, which
XLA unrolls into `num_layers` fused blocks on the MXU.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from everyvoice_tpu.logger import logger

# papercup-ai/multilingual-pl-bert model_params (its config.yml).
MULTILINGUAL_PLBERT = dict(
    vocab_size=178,
    hidden_size=768,
    num_layers=12,
    num_heads=12,
    intermediate_size=2048,
    embedding_size=128,
    max_position_embeddings=512,
)


def _gelu_new(x):
    # transformers "gelu_new" == tanh-approximated gelu.
    return nn.gelu(x, approximate=True)


class AlbertLayer(nn.Module):
    """One shared ALBERT block: post-norm MHSA + post-norm FFN
    (transformers `AlbertLayer`, eps 1e-12)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        h = self.num_heads
        hd = self.hidden_size // h
        q = nn.Dense(self.hidden_size, name="query")(x)
        k = nn.Dense(self.hidden_size, name="key")(x)
        v = nn.Dense(self.hidden_size, name="value")(x)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, self.hidden_size)
        ctx = nn.Dense(self.hidden_size, name="attn_out")(ctx)
        x = nn.LayerNorm(epsilon=1e-12, name="attn_norm")(x + ctx)
        ff = nn.Dense(self.intermediate_size, name="ffn")(x)
        ff = _gelu_new(ff)
        ff = nn.Dense(self.hidden_size, name="ffn_output")(ff)
        return nn.LayerNorm(epsilon=1e-12, name="full_norm")(x + ff)


class PLBERT(nn.Module):
    """ALBERT encoder: token IDs -> (B, T, hidden) contextual phone states.

    Parameter sharing makes ALBERT ideal for TPU: one set of block weights
    stays resident while the MXU re-runs it `num_layers` times."""

    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 2048
    embedding_size: int = 128
    max_position_embeddings: int = 512

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        t = tokens.shape[1]
        word = self.param(
            "word_embeddings",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.embedding_size),
        )
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (self.max_position_embeddings, self.embedding_size),
        )
        type_emb = self.param(
            "token_type_embeddings",
            nn.initializers.normal(0.02),
            (2, self.embedding_size),
        )
        x = word[tokens] + pos[None, :t] + type_emb[0][None, None]
        x = nn.LayerNorm(epsilon=1e-12, name="embed_norm")(x)
        x = nn.Dense(self.hidden_size, name="embedding_hidden_mapping_in")(x)
        layer = AlbertLayer(
            self.hidden_size, self.num_heads, self.intermediate_size,
            name="shared_layer",
        )
        for _ in range(self.num_layers):
            x = layer(x, mask)
        return x


# ---------------------------------------------------------------------------
# torch -> flax conversion


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def load_torch_or_npz_state(path) -> dict:
    """Load a flat {torch state_dict key: array} mapping from either a torch
    checkpoint (needs torch installed) or an `.npz` archive with the same
    keys (torch-free staging for converted/stripped checkpoints)."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(str(path)) as archive:
            return {key: archive[key] for key in archive.files}
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=False)


def strip_plbert_training_prefixes(state_dict: dict) -> dict:
    """PL-BERT `step_*.t7` checkpoints store {'net': state} where keys are
    `module.encoder.<albert key>` (DataParallel wrapper + the training
    harness's `encoder` attribute). Reduce to plain AlbertModel keys."""
    if "net" in state_dict and isinstance(state_dict["net"], dict):
        state_dict = state_dict["net"]
    out = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = value
    # A plain AlbertModel dict already has `embeddings.*` at the top level;
    # the PL-BERT harness wraps the whole model under one more `encoder.`
    # (so `encoder.embeddings.*` exists). Only unwrap in the latter case.
    if any(k.startswith("encoder.embeddings.") for k in out):
        out = {
            k[len("encoder."):]: v
            for k, v in out.items()
            if k.startswith("encoder.")
        }
    return out


def convert_torch_plbert_state(
    state_dict: dict,
    symbol_rows: Optional[np.ndarray] = None,
    vocab_size: Optional[int] = None,
) -> dict:
    """Convert a `transformers.AlbertModel.state_dict()` (single hidden
    group / single inner layer, ALBERT's default) into a `PLBERT` parameter
    tree. Dense kernels transpose (out,in)->(in,out).

    `symbol_rows` remaps the pretrained vocabulary onto project symbol IDs:
    entry i is the pretrained row for project symbol i, or -1 to keep a
    fresh (zero) row — the no-translation-on-device strategy described in
    the module docstring. `vocab_size` sets the output table size (defaults
    to len(symbol_rows) or the pretrained vocab)."""
    sd = {k: _t(v) for k, v in strip_plbert_training_prefixes(state_dict).items()}
    word = sd["embeddings.word_embeddings.weight"]
    if symbol_rows is not None:
        symbol_rows = np.asarray(symbol_rows)
        n = vocab_size if vocab_size is not None else len(symbol_rows)
        remapped = np.zeros((n, word.shape[1]), word.dtype)
        valid = symbol_rows >= 0
        remapped[np.nonzero(valid)[0]] = word[symbol_rows[valid]]
        word = remapped
    lp = "encoder.albert_layer_groups.0.albert_layers.0"
    params = {
        "word_embeddings": word,
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "embed_norm": {
            "scale": sd["embeddings.LayerNorm.weight"],
            "bias": sd["embeddings.LayerNorm.bias"],
        },
        "embedding_hidden_mapping_in": {
            "kernel": sd["encoder.embedding_hidden_mapping_in.weight"].T,
            "bias": sd["encoder.embedding_hidden_mapping_in.bias"],
        },
        "shared_layer": {
            "query": {"kernel": sd[f"{lp}.attention.query.weight"].T,
                      "bias": sd[f"{lp}.attention.query.bias"]},
            "key": {"kernel": sd[f"{lp}.attention.key.weight"].T,
                    "bias": sd[f"{lp}.attention.key.bias"]},
            "value": {"kernel": sd[f"{lp}.attention.value.weight"].T,
                      "bias": sd[f"{lp}.attention.value.bias"]},
            "attn_out": {"kernel": sd[f"{lp}.attention.dense.weight"].T,
                         "bias": sd[f"{lp}.attention.dense.bias"]},
            "attn_norm": {"scale": sd[f"{lp}.attention.LayerNorm.weight"],
                          "bias": sd[f"{lp}.attention.LayerNorm.bias"]},
            "ffn": {"kernel": sd[f"{lp}.ffn.weight"].T,
                    "bias": sd[f"{lp}.ffn.bias"]},
            "ffn_output": {"kernel": sd[f"{lp}.ffn_output.weight"].T,
                           "bias": sd[f"{lp}.ffn_output.bias"]},
            "full_norm": {"scale": sd[f"{lp}.full_layer_layer_norm.weight"],
                          "bias": sd[f"{lp}.full_layer_layer_norm.bias"]},
        },
    }
    return params


def symbol_row_map(
    project_symbols: Sequence[str], pretrained_symbols: Sequence[str]
) -> np.ndarray:
    """Row i = index of project symbol i in the pretrained symbol table, or
    -1 when absent (fresh row; `check pretrained-symbols` suggests
    substitutions for those — reference check_group.py:299-439)."""
    index = {s: i for i, s in enumerate(pretrained_symbols)}
    rows = np.asarray(
        [index.get(s, -1) for s in project_symbols], dtype=np.int64
    )
    missing = [s for s in project_symbols if s not in index]
    if missing and pretrained_symbols:
        logger.warning(
            f"{len(missing)} project symbols are not in the pretrained "
            f"symbol table (first few: {missing[:8]}); their embedding rows "
            "start fresh. Run `everyvoice-tpu check pretrained-symbols` for "
            "suggested substitutions."
        )
    return rows


def geometry_from_config_yml(config_path) -> dict:
    """Read PL-BERT geometry from the repo's config.yml `model_params`
    (AlbertConfig field names -> PLBERT field names)."""
    import yaml

    raw = yaml.safe_load(Path(config_path).read_text(encoding="utf8")) or {}
    mp = raw.get("model_params", raw)
    geometry = dict(MULTILINGUAL_PLBERT)
    renames = {
        "vocab_size": "vocab_size",
        "hidden_size": "hidden_size",
        "num_hidden_layers": "num_layers",
        "num_attention_heads": "num_heads",
        "intermediate_size": "intermediate_size",
        "embedding_size": "embedding_size",
        "max_position_embeddings": "max_position_embeddings",
    }
    for theirs, ours in renames.items():
        if theirs in mp:
            geometry[ours] = int(mp[theirs])
    return geometry


def load_plbert_params(
    checkpoint_path,
    config_path=None,
    project_symbols: Optional[Sequence[str]] = None,
    pretrained_symbols: Optional[Sequence[str]] = None,
) -> tuple:
    """Load a local PL-BERT torch checkpoint (`step_*.t7` or a plain
    AlbertModel state dict) into (PLBERT module, flax params). When both
    symbol tables are given, the embedding table is remapped onto project
    symbol IDs and the module vocab becomes len(project_symbols)."""
    state = load_torch_or_npz_state(checkpoint_path)
    geometry = (
        geometry_from_config_yml(config_path)
        if config_path is not None
        else dict(MULTILINGUAL_PLBERT)
    )
    rows = None
    if project_symbols is not None:
        rows = symbol_row_map(project_symbols, pretrained_symbols or [])
        geometry["vocab_size"] = len(rows)
    params = convert_torch_plbert_state(
        state, symbol_rows=rows, vocab_size=geometry["vocab_size"]
    )
    module = PLBERT(**geometry)
    return module, jax.tree_util.tree_map(jnp.asarray, params)
