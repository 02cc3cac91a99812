"""Validation helpers for the pydantic config layer
(parity: everyvoice/config/validation_helpers.py)."""

from __future__ import annotations

import importlib
from pathlib import Path
from typing import Any, Callable

from pydantic import ValidationInfo


def string_to_callable(value: Any) -> Callable:
    """Resolve a ``"module.submodule.func"`` string to the callable it names.

    Already-callable values pass through untouched. Mirrors
    everyvoice/config/validation_helpers.py:16.

    >>> string_to_callable("everyvoice_tpu.utils.lower")("ABC")
    'abc'
    """
    if callable(value):
        return value
    if not isinstance(value, str):
        raise ValueError(f"Expected a callable or an importable name, got {value!r}")
    if "." not in value:
        # Legacy configs may reference bare names of our generic loaders.
        value = f"everyvoice_tpu.utils.{value}"
    module_name, _, function_name = value.rpartition(".")
    # Accept names that referenced the original everyvoice package.
    if module_name.startswith("everyvoice.") or module_name == "everyvoice":
        module_name = module_name.replace("everyvoice", "everyvoice_tpu", 1)
    try:
        module = importlib.import_module(module_name)
    except ImportError as e:
        raise ImportError(
            f"Cannot import module {module_name} while resolving callable {value!r}"
        ) from e
    try:
        return getattr(module, function_name)
    except AttributeError as e:
        raise AttributeError(
            f"Module {module_name} has no attribute {function_name}"
        ) from e


def callable_to_string(function: Callable) -> str:
    """Serialize a callable back to its importable dotted name."""
    module = getattr(function, "__module__", None)
    name = getattr(function, "__name__", None)
    if module is None or name is None:
        # functools.partial of a known function
        func = getattr(function, "func", None)
        if func is not None:
            return callable_to_string(func)
        raise ValueError(f"Cannot serialize callable {function!r}")
    return f"{module}.{name}"


def directory_path_must_exist(value: Path, info: ValidationInfo) -> Path:
    """Create the directory if it does not exist (used for save_dir fields)."""
    path = _resolve_relative(value, info)
    path.mkdir(parents=True, exist_ok=True)
    return value


def path_is_a_directory(value: Path, info: ValidationInfo) -> Path:
    path = _resolve_relative(value, info)
    if not path.is_dir():
        raise ValueError(f"{path} is not a directory")
    return value


def relative_to_absolute_path(value: Any, info: ValidationInfo) -> Path | None:
    """Resolve a possibly-relative path against the config file's directory.

    The directory arrives through the pydantic validation context
    (see shared_types.init_context), mirroring the reference's
    ContextVar-based mechanism (shared_types.py:121-142).
    """
    if value is None:
        return None
    return _resolve_relative(Path(value), info)


def _resolve_relative(path: Path, info) -> Path:
    context = getattr(info, "context", None) if info is not None else None
    if context and not path.is_absolute():
        base = context.get("config_path")
        if base is not None:
            return (Path(base) / path).resolve()
    return path
