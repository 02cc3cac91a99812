"""Core config base classes shared by all models
(parity: everyvoice/config/shared_types.py)."""

from __future__ import annotations

import json
from contextlib import contextmanager
from contextvars import ContextVar
from pathlib import Path
from typing import Any, Iterator, List, Mapping, Optional, Sequence, Union

from pydantic import (
    BaseModel,
    ConfigDict,
    Field,
    ValidationInfo,
    model_validator,
)

from everyvoice_tpu.config.utils import (
    PossiblyRelativePath,
    PossiblySerializedCallable,
)
from everyvoice_tpu.exceptions import ConfigError

# Validation context plumbing: lets nested validators know the directory of
# the config file currently being loaded so relative paths resolve correctly
# (reference shared_types.py:31-45).
_init_context_var: ContextVar[Optional[dict]] = ContextVar(
    "_init_context_var", default=None
)


@contextmanager
def init_context(value: dict) -> Iterator[None]:
    token = _init_context_var.set(value)
    try:
        yield
    finally:
        _init_context_var.reset(token)


def get_init_context() -> Optional[dict]:
    return _init_context_var.get()


class ConfigModel(BaseModel):
    """Base for every config object: strict fields, checkpoint-safe dumping."""

    model_config = ConfigDict(
        extra="forbid",
        json_schema_extra={"$schema": "http://json-schema.org/draft-07/schema#"},
    )

    def __init__(self, /, **data: Any) -> None:
        # Route the ambient init context into pydantic's validation context so
        # relative-path validators can see the config file's directory even
        # when models are constructed directly (reference shared_types.py:48).
        self.__pydantic_validator__.validate_python(
            data, self_instance=self, context=_init_context_var.get()
        )

    def model_checkpoint_dump(self) -> dict:
        """Dump to a JSON-serializable dict with every Path field removed.

        Checkpoints cross machines, so no environment-specific path may be
        validated on load (reference shared_types.py:54-88).
        """
        dumped = self.model_dump()

        def strip_paths(node):
            if isinstance(node, dict):
                return {
                    k: strip_paths(v)
                    for k, v in node.items()
                    if not isinstance(v, Path)
                }
            if isinstance(node, (list, tuple)):
                cleaned = [strip_paths(x) for x in node if not isinstance(x, Path)]
                return cleaned if isinstance(node, list) else tuple(cleaned)
            return node

        stripped = strip_paths(dumped)
        # Round-trip through JSON to force plain types (enums -> str, etc.).
        return json.loads(json.dumps(stripped, default=_json_default))

    def update_config(self, new_config: dict) -> "ConfigModel":
        """Deep-merge ``new_config`` into this config and re-validate."""
        merged = combine_configs(self.model_dump(), new_config)
        self.__init__(**merged)
        return self

    @staticmethod
    def combine_configs(orig: Union[dict, Sequence], new: Mapping):
        return combine_configs(orig, new)


def _json_default(obj):
    if isinstance(obj, Path):
        return str(obj)
    if callable(obj):
        from everyvoice_tpu.config.validation_helpers import callable_to_string

        return callable_to_string(obj)
    raise TypeError(f"Cannot JSON-serialize {type(obj)}")


def combine_configs(orig: Union[dict, Sequence], new: Mapping):
    """Recursive deep-merge; values in ``new`` win. Integer keys index into
    sequences (reference shared_types.py:96-118)."""
    if isinstance(orig, Sequence) and not isinstance(orig, (str, bytes)):
        out_list = list(orig)
        for key, value in new.items():
            idx = int(key)
            if isinstance(value, Mapping):
                out_list[idx] = combine_configs(out_list[idx], value)
            else:
                out_list[idx] = value
        return out_list
    out = dict(orig) if isinstance(orig, Mapping) else {}
    for key, value in new.items():
        if (
            isinstance(value, Mapping)
            and key in out
            and isinstance(out[key], (Mapping, list))
        ):
            out[key] = combine_configs(out[key], value)
        else:
            out[key] = value
    return out


class PartialLoadConfig(ConfigModel):
    """A config that can be loaded from a file with sibling partial files
    (``path_to_*_config_file`` fields) and relative-path resolution
    (reference shared_types.py:121-142)."""

    VERSION: str = Field("1.0", init_var=False)

    @model_validator(mode="before")
    @classmethod
    def _check_version(cls, data: Any) -> Any:
        if isinstance(data, dict):
            version = data.get("VERSION")
            if version is not None:
                try:
                    major = int(str(version).split(".")[0])
                except ValueError:
                    raise ValueError(f"Invalid VERSION '{version}'") from None
                if major > 1:
                    raise ValueError(
                        f"Your config is version {version} but this version of "
                        "everyvoice_tpu only supports major version 1. "
                        "Please upgrade."
                    )
        return data

    @classmethod
    def path_relative_to_original(
        cls, value: Optional[Path], info: ValidationInfo
    ) -> Optional[Path]:
        if value is None:
            return None
        context = info.context or {}
        base = context.get("config_path")
        path = Path(value)
        if base is not None and not path.is_absolute():
            path = (Path(base) / path).resolve()
        return path

    @classmethod
    def load_config_from_path(
        cls, path: Path | str, config_dir: Optional[Path] = None
    ):
        """Load this config type from a YAML/JSON file, pulling in any
        sibling partial config files first."""
        from everyvoice_tpu.config.utils import load_partials
        from everyvoice_tpu.utils import load_config_file

        path = Path(path)
        if not path.exists():
            raise ConfigError(f"Config file '{path}' does not exist")
        data = load_config_file(path)
        if not isinstance(data, dict):
            raise ConfigError(f"Config file '{path}' did not contain a mapping")
        base_dir = config_dir or path.parent
        partial_keys = getattr(cls, "PARTIAL_KEYS", ())
        if partial_keys:
            data = load_partials(data, partial_keys, config_path=base_dir)
        with init_context({"config_path": base_dir, "writing_config": base_dir}):
            return cls(**data)


class ContactInformation(ConfigModel):
    """Attribution/contact block every model config carries
    (reference shared_types.py:260-274)."""

    contact_name: str = Field(
        description="The name of the contact person or organization responsible "
        "for answering questions related to this model."
    )
    contact_email: str = Field(
        description="The email address of the contact person or organization.",
        pattern=r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    )


class LoggerConfig(ConfigModel):
    """Experiment logging layout: ``<save_dir>/<name>/<version>/<sub_dir>``
    (reference shared_types.py:145-177)."""

    name: str = Field(
        "BaseExperiment", title="Experiment Name", description="The name of the experiment."
    )
    save_dir: PossiblyRelativePath = Field(
        Path("logs_and_checkpoints"),
        description="Root directory for logs and checkpoints.",
    )
    sub_dir_callable: PossiblySerializedCallable = Field(
        None, description="Callable producing the run sub-directory (timestamp)."
    )
    version: str = Field("base", description="The version of the experiment.")

    @model_validator(mode="before")
    @classmethod
    def _default_subdir(cls, data: Any) -> Any:
        if isinstance(data, dict) and not data.get("sub_dir_callable"):
            data["sub_dir_callable"] = "everyvoice_tpu.utils.get_current_time"
        return data

    @property
    def sub_dir(self) -> str:
        return str(self.sub_dir_callable())


class BaseOptimizer(ConfigModel):
    learning_rate: float = Field(1e-4, description="The initial learning rate.")
    eps: float = Field(1e-8, description="Optimizer epsilon for numerical stability.")
    weight_decay: float = Field(0.01, description="Decoupled weight decay.")


class AdamOptimizer(BaseOptimizer):
    betas: List[float] = Field([0.9, 0.98], description="Adam beta coefficients.")
    name: str = Field("adam", init_var=False)


class AdamWOptimizer(BaseOptimizer):
    betas: List[float] = Field([0.9, 0.98], description="AdamW beta coefficients.")
    name: str = Field("adamw", init_var=False)


class RMSOptimizer(BaseOptimizer):
    alpha: float = Field(0.99, description="RMSprop smoothing constant.")
    name: str = Field("rms", init_var=False)


class NoamOptimizer(AdamOptimizer):
    warmup_steps: int = Field(1000, description="Linear warmup steps for the Noam schedule.")
    name: str = Field("noam", init_var=False)


class BaseTrainingConfig(ConfigModel):
    """Shared trainer knobs (reference shared_types.py:180-257)."""

    batch_size: int = Field(16, description="Training batch size.")
    save_top_k_ckpts: int = Field(5, description="Number of best checkpoints to keep.")
    ckpt_steps: Union[int, None] = Field(
        None, description="Checkpoint every N steps (mutually exclusive with ckpt_epochs)."
    )
    ckpt_epochs: Union[int, None] = Field(
        1, description="Checkpoint every N epochs (mutually exclusive with ckpt_steps)."
    )
    val_check_interval: Union[int, float, None] = Field(
        500, description="How often to run validation (steps or fraction of an epoch)."
    )
    check_val_every_n_epoch: Optional[int] = Field(
        None, description="Run validation every N epochs."
    )
    max_epochs: int = Field(1000, description="Stop training after this many epochs.")
    max_steps: int = Field(100000, description="Stop training after this many steps.")
    finetune_checkpoint: Union[PossiblyRelativePath, None] = Field(
        None, description="Checkpoint to finetune from / resume (relative "
        "paths resolve against the config file's own directory)."
    )
    training_filelist: PossiblyRelativePath = Field(
        Path("path/to/your/preprocessed/training_filelist.psv"),
        description="Path to the preprocessed training filelist (relative "
        "paths resolve against the config file's own directory).",
    )
    validation_filelist: PossiblyRelativePath = Field(
        Path("path/to/your/preprocessed/validation_filelist.psv"),
        description="Path to the preprocessed validation filelist (relative "
        "paths resolve against the config file's own directory).",
    )
    filelist_loader: PossiblySerializedCallable = Field(
        None, description="Function used to load the filelists."
    )
    logger: LoggerConfig = Field(
        default_factory=LoggerConfig, description="Experiment logger configuration."
    )
    val_data_workers: int = Field(0, description="Host workers for validation data.")
    train_data_workers: int = Field(4, description="Host workers for training data.")

    @model_validator(mode="before")
    @classmethod
    def _default_loader(cls, data: Any) -> Any:
        if isinstance(data, dict) and not data.get("filelist_loader"):
            data["filelist_loader"] = (
                "everyvoice_tpu.utils.generic_psv_filelist_reader"
            )
        return data

    @model_validator(mode="after")
    def _mutually_exclusive_ckpt_freq(self):
        # reference shared_types.py:248-257
        if self.ckpt_steps is not None and self.ckpt_epochs is not None:
            raise ValueError(
                "ckpt_steps and ckpt_epochs are mutually exclusive; set one to null."
            )
        for name, v in (("ckpt_steps", self.ckpt_steps), ("ckpt_epochs", self.ckpt_epochs)):
            if v is not None and v < 0:
                raise ValueError(f"{name} must be a non-negative integer, got {v}")
        return self
