"""Config field types and partial-config loading
(parity: everyvoice/config/utils.py:20-92)."""

from __future__ import annotations

from pathlib import Path
from typing import Annotated, Any, Callable

from pydantic import (
    BeforeValidator,
    PlainSerializer,
    ValidationInfo,
    WithJsonSchema,
)

from everyvoice_tpu.config.validation_helpers import (
    callable_to_string,
    relative_to_absolute_path,
    string_to_callable,
)

# A field that may hold a callable in memory but is always serialized as a
# dotted import string so configs stay JSON/YAML safe
# (reference config/utils.py:72-78).
PossiblySerializedCallable = Annotated[
    Callable,
    BeforeValidator(string_to_callable),
    PlainSerializer(callable_to_string, return_type=str),
    WithJsonSchema({"type": "string"}, mode="serialization"),
    WithJsonSchema({"type": "string"}, mode="validation"),
]

# Paths resolved against the directory of the config file being loaded
# (reference config/utils.py:80-92).
PossiblyRelativePath = Annotated[
    Path, BeforeValidator(relative_to_absolute_path)
]


def _relative_path_must_exist(value: Any, info: ValidationInfo) -> Path:
    path = relative_to_absolute_path(value, info)
    if path is not None and not path.exists():
        raise ValueError(f"Path '{path}' does not exist")
    return path


PossiblyRelativePathMustExist = Annotated[
    Path, BeforeValidator(_relative_path_must_exist)
]


def load_partials(
    pre_validated_model_dict: dict,
    partial_keys: tuple[str, ...],
    config_path: Path | None = None,
) -> dict:
    """Pull sibling partial-config files into a parent config dict.

    For each key K in ``partial_keys``, if ``path_to_K_config_file`` is set,
    load that YAML/JSON file and merge it under key K (inline values in the
    parent win over values from the partial file). Mirrors
    everyvoice/config/utils.py:20-69.
    """
    from everyvoice_tpu.utils import load_config_file

    for key in partial_keys:
        path_key = f"path_to_{key}_config_file"
        partial_path = pre_validated_model_dict.get(path_key)
        if not partial_path:
            continue
        partial_path = Path(partial_path)
        if not partial_path.is_absolute() and config_path is not None:
            partial_path = (Path(config_path) / partial_path).resolve()
        if not partial_path.exists():
            raise ValueError(
                f"Partial config file '{partial_path}' (from {path_key}) does not exist"
            )
        partial_dict = load_config_file(partial_path)
        inline = pre_validated_model_dict.get(key)
        if isinstance(inline, dict):
            merged = dict(partial_dict)
            merged.update(inline)
            pre_validated_model_dict[key] = merged
        else:
            pre_validated_model_dict[key] = partial_dict
    return pre_validated_model_dict
