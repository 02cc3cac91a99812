"""Single-file checkpoints carrying the same contract as the reference's
Lightning .ckpt files (SURVEY.md §2.9): `model_info.name` for dispatch,
`hyper_parameters.{config,lang2id,speaker2id,stats}` as plain
JSON-serializable types, plus the parameter/optimizer pytrees
(msgpack-serialized numpy, via flax.serialization).

File extension: `.ckpt` for drop-in familiarity. Layout:
  4-byte magic 'EVTP' | 8-byte LE header length | JSON header | msgpack body
The JSON header is readable without deserializing any tensors, which keeps
`inspect` and `rename_speaker` instant even for large models.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Optional

import numpy as np

MAGIC = b"EVTP"
KNOWN_MODELS = ("FastSpeech2", "HiFiGAN", "HiFiGANGenerator", "StyleTTS2Module")


def _to_numpy_tree(tree):
    import jax
    from flax import serialization

    # to_state_dict turns namedtuple/custom-node pytrees (e.g. optax states)
    # into plain nested dicts msgpack can handle.
    return jax.tree.map(lambda x: np.asarray(x), serialization.to_state_dict(tree))


def save_checkpoint(
    path: Path | str,
    model_name: str,
    config,
    params,
    step: int = 0,
    epoch: int = 0,
    opt_state: Any = None,
    lang2id: Optional[dict] = None,
    speaker2id: Optional[dict] = None,
    stats: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> Path:
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    config_dump = (
        config.model_checkpoint_dump() if hasattr(config, "model_checkpoint_dump")
        else config
    )
    header = {
        "model_info": {
            "name": model_name,
            "version": "1.0",
        },
        "hyper_parameters": {
            "config": config_dump,
            "lang2id": lang2id or {},
            "speaker2id": speaker2id or {},
            "stats": stats or {},
        },
        "global_step": int(step),
        "epoch": int(epoch),
    }
    if extra:
        header.update(extra)
    # Fail fast if anything non-JSON-safe sneaks into the header
    # (the reference enforces the same; tests/test_model.py:41-67).
    header_bytes = json.dumps(header, ensure_ascii=False).encode("utf8")

    body: dict = {"state_dict": _to_numpy_tree(params)}
    if opt_state is not None:
        body["optimizer_states"] = _to_numpy_tree(opt_state)
    body_bytes = serialization.msgpack_serialize(body)

    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        f.write(body_bytes)
    tmp.replace(path)
    return path


def _check_format_version(header: dict, path) -> None:
    """A checkpoint saved by a newer major format cannot be read — tell the
    user to upgrade instead of failing obscurely later (the reference gates
    `model_info.version` the same way, base_cli/checkpoint.py +
    tests/test_model.py:317-460). A missing version means 'oldest' and is
    accepted for back-compat."""
    version = str(header.get("model_info", {}).get("version", "0.0"))
    try:
        major = int(version.split(".")[0])
    except ValueError:
        raise ValueError(
            f"{path} declares an unparseable checkpoint version {version!r}"
        ) from None
    if major > 1:
        raise ValueError(
            f"{path} was saved by a newer everyvoice_tpu (checkpoint format "
            f"{version}); upgrade this installation to load it."
        )


def load_checkpoint_header(path: Path | str) -> dict:
    """Read only the JSON header (cheap; no tensor IO)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ValueError(f"{path} is not an everyvoice_tpu checkpoint")
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf8"))
    _check_format_version(header, path)
    return header


def load_checkpoint(path: Path | str) -> dict:
    """Full load: header dict + 'state_dict' (+ 'optimizer_states')."""
    from flax import serialization

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ValueError(f"{path} is not an everyvoice_tpu checkpoint")
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf8"))
        _check_format_version(header, path)
        body = serialization.msgpack_restore(f.read())
    out = dict(header)
    out.update(body)
    return out


def changed_config_values(old, new, prefix: str = "") -> list:
    """(path, old, new) triples where both configs define a key but disagree.

    Mirrors the reference's resume gate, which only acts on DeepDiff
    ``values_changed``/``types_changed`` (base_cli/helpers.py:308-317):
    keys or list items present on just one side are ignored, so adding a new
    config field never blocks a resume.
    """
    if isinstance(old, dict) and isinstance(new, dict):
        diffs = []
        for key in sorted(old.keys() & new.keys(), key=str):
            child = f"{prefix}.{key}" if prefix else str(key)
            diffs += changed_config_values(old[key], new[key], child)
        return diffs
    if isinstance(old, (list, tuple)) and isinstance(new, (list, tuple)):
        diffs = []
        for i, (a, b) in enumerate(zip(old, new)):
            diffs += changed_config_values(a, b, f"{prefix}[{i}]")
        return diffs
    if old != new or type(old) is not type(new):
        return [(prefix, old, new)]
    return []


def resume_mode(old_config: dict, new_config: dict, model_name: str) -> str:
    """Three-way resume gate (reference base_cli/helpers.py:278-375):

    - model-architecture diff  → raise InvalidConfiguration (weights would
      not even load, or would silently mean something different);
    - optimizer diff           → ``"fresh_optimizer"``: keep the weights,
      restart optimizer state and step/epoch counters;
    - otherwise                → ``"full"``: weights + optimizer + counters.

    StyleTTS2 skips the gate entirely (as the reference does), because its
    two-stage recipe changes the config between stages by design.
    """
    from everyvoice_tpu.exceptions import InvalidConfiguration

    if model_name == "StyleTTS2Module":
        return "full"
    model_diff = changed_config_values(
        (old_config or {}).get("model", {}), (new_config or {}).get("model", {})
    )
    if model_diff:
        pretty = "\n".join(f"  {p}: {a!r} -> {b!r}" for p, a, b in model_diff)
        raise InvalidConfiguration(
            "The model architecture in your configuration differs from the "
            "one this checkpoint was trained with — fine-tuning across "
            "architectures is not supported. Fix the configuration or pick "
            f"a matching checkpoint. Changed values:\n{pretty}"
        )
    optimizer_diff = changed_config_values(
        (old_config or {}).get("training", {}).get("optimizer", {}),
        (new_config or {}).get("training", {}).get("optimizer", {}),
    )
    return "fresh_optimizer" if optimizer_diff else "full"


def summarize_statedict(tree, prefix: str = "") -> list:
    """Flat (name, shape, n_params) listing
    (reference base_cli/checkpoint.py:18)."""
    rows = []
    if isinstance(tree, dict):
        for key, value in tree.items():
            rows.extend(
                summarize_statedict(value, f"{prefix}.{key}" if prefix else key)
            )
    else:
        arr = np.asarray(tree)
        rows.append((prefix, tuple(arr.shape), int(arr.size)))
    return rows


def inspect_checkpoint(
    path: Path | str, show_config: bool = True, show_architecture: bool = False
) -> str:
    """Human-readable checkpoint summary
    (reference base_cli/checkpoint.py:140)."""
    header = load_checkpoint_header(path)
    lines = [f"Checkpoint: {path}"]
    lines.append(f"Model: {header.get('model_info', {}).get('name', '<unknown>')}")
    lines.append(f"Global step: {header.get('global_step')}")
    lines.append(f"Epoch: {header.get('epoch')}")
    hp = header.get("hyper_parameters", {})
    if hp.get("lang2id"):
        lines.append(f"Languages: {sorted(hp['lang2id'])}")
    if hp.get("speaker2id"):
        lines.append(f"Speakers: {sorted(hp['speaker2id'])}")
    if show_architecture:
        ckpt = load_checkpoint(path)
        rows = summarize_statedict(ckpt.get("state_dict", {}))
        total = sum(r[2] for r in rows)
        lines.append(f"Total parameters: {total:,}")
        for name, shape, size in rows:
            lines.append(f"  {name}: {shape} ({size:,})")
    if show_config:
        lines.append("Config:")
        lines.append(json.dumps(hp.get("config", {}), indent=2)[:4000])
    return "\n".join(lines)


def rename_speaker(
    path: Path | str, old_name: str, new_name: str, out_path: Path | str
) -> None:
    """Rename a speaker in speaker2id without touching weights
    (reference base_cli/checkpoint.py:252)."""
    ckpt = load_checkpoint(path)
    speaker2id = ckpt["hyper_parameters"].get("speaker2id", {})
    if old_name not in speaker2id:
        raise ValueError(
            f"Speaker '{old_name}' not found; speakers: {sorted(speaker2id)}"
        )
    if new_name in speaker2id:
        raise ValueError(f"Speaker '{new_name}' already exists")
    speaker2id[new_name] = speaker2id.pop(old_name)
    save_checkpoint(
        out_path,
        ckpt["model_info"]["name"],
        ckpt["hyper_parameters"]["config"],
        ckpt["state_dict"],
        step=ckpt.get("global_step", 0),
        epoch=ckpt.get("epoch", 0),
        opt_state=ckpt.get("optimizer_states"),
        lang2id=ckpt["hyper_parameters"].get("lang2id"),
        speaker2id=speaker2id,
        stats=ckpt["hyper_parameters"].get("stats"),
    )
