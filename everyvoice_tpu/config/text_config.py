"""Text-processing configuration (parity: everyvoice/config/text_config.py;
schema everyvoice-shared-text-0.5.json)."""

from __future__ import annotations

import importlib
from pathlib import Path
from typing import Annotated, Dict, List, Optional

from pydantic import BaseModel, ConfigDict, Field, field_validator, model_validator

from everyvoice_tpu.config.shared_types import ConfigModel, init_context
from everyvoice_tpu.config.type_definitions import TargetTrainingTextRepresentationLevel
from everyvoice_tpu.config.utils import PossiblySerializedCallable
from everyvoice_tpu.config.validation_helpers import string_to_callable
from everyvoice_tpu.logger import logger


class Punctuation(BaseModel):
    """Ten punctuation classes normalized into internal tokens during
    tokenization (reference text_config.py:18-77)."""

    exclamations: List[str] = Field(
        ["!", "¡"], description="Exclamation symbols, normalized to <EXCL>."
    )
    question_symbols: List[str] = Field(
        ["?", "¿"], description="Question symbols, normalized to <QINT>."
    )
    quotemarks: List[str] = Field(
        ['"', "'", "“", "”", "«", "»"],
        description="Quotation symbols, normalized to <QUOTE>.",
    )
    parentheses: List[str] = Field(
        ["(", ")", "[", "]", "{", "}"],
        description="Bracketing symbols, normalized to <PAREN>.",
    )
    periods: List[str] = Field(["."], description="Period symbols, normalized to <PERIOD>.")
    colons: List[str] = Field([":"], description="Colon symbols, normalized to <COLON>.")
    semi_colons: List[str] = Field(
        [";"], description="Semicolon symbols, normalized to <SEMICOL>."
    )
    hyphens: List[str] = Field(
        ["-", "—", "*"], description="Hyphen symbols, normalized to <HYPHEN>."
    )
    commas: List[str] = Field([","], description="Comma symbols, normalized to <COMMA>.")
    ellipses: List[str] = Field(["…"], description="Ellipsis symbols, normalized to <EPS>.")

    @property
    def all(self) -> set:
        out: set = set()
        for _, values in self:
            out |= set(values)
        return out


def get_label_from_symbol_key(key: str) -> Optional[str]:
    """Return the dataset label from a ``<label>_phones``/``<label>_characters``
    symbol key, else None (reference text_config.py:151-160)."""
    last = key.rfind("_")
    if last >= 1 and key[last + 1 :] in ("phones", "characters"):
        return key[:last]
    return None


class Symbols(BaseModel):
    """Open-ended symbol inventory: any extra field is a list of symbols
    (reference text_config.py:78-149)."""

    model_config = ConfigDict(extra="allow")

    silence: List[str] = Field(
        ["<SIL>"], description="The symbol(s) used to indicate silence."
    )
    punctuation: Punctuation = Field(
        default_factory=Punctuation,
        description="Punctuation inventory, normalized internally to a small "
        "set of classes to keep training tractable.",
    )

    @property
    def all_except_punctuation(self) -> set:
        return set(
            w for _, v in self if not isinstance(v, Punctuation) for w in v
        )

    def for_representation_level(
        self, level: Optional[TargetTrainingTextRepresentationLevel]
    ) -> set:
        """Symbols relevant to the given representation level; unlabeled
        fields are always included."""
        if level is None:
            return self.all_except_punctuation
        suffix = (
            "characters"
            if level == TargetTrainingTextRepresentationLevel.characters
            else "phones"
        )
        return set(
            w
            for k, v in self
            if not isinstance(v, Punctuation)
            and (get_label_from_symbol_key(k) is None or k.endswith(f"_{suffix}"))
            for w in v
        )

    @model_validator(mode="after")
    def _no_punctuation_overlap(self) -> "Symbols":
        overlap = self.punctuation.all & self.all_except_punctuation
        if overlap:
            raise ValueError(
                f"Symbol(s) {sorted(overlap)} occur in both your punctuation and "
                "your other symbol sets; please remove the duplicates."
            )
        return self

    @model_validator(mode="after")
    def _members_are_string_lists(self) -> "Symbols":
        for k, v in self:
            if isinstance(v, Punctuation) or k == "pad":
                continue
            if not isinstance(v, list) or not all(isinstance(e, str) for e in v):
                raise ValueError(f"{k} must be a list of strings")
        return self


class LanguageBoundaries(BaseModel):
    strong: str = Field(
        "!?.", description="Characters that constitute strong boundaries."
    )
    weak: str = Field(":;,", description="Characters that constitute weak boundaries.")


Language = Annotated[str, Field(title="Language ID", examples=["fr"])]
G2PModulePath = Annotated[str, Field(title="Module path")]


def validate_g2p_engine_signature(g2p_func):
    """A G2P plugin must be Callable[[str], List[str]]
    (reference text_config.py:181-205)."""
    import typing
    from inspect import signature

    sig = signature(g2p_func)
    assert len(sig.parameters) == 1, "G2P engine's signature should take a single argument"
    first = list(sig.parameters)[0]
    assert (
        sig.parameters[first].annotation is str
    ), "G2P Engine's signature should take a string"
    assert sig.return_annotation in (
        list[str],
        typing.List[str],  # noqa: UP006 — accepted for backwards compat
    ), "G2P Engine's signature should return a list of strings"
    return g2p_func


def load_custom_g2p_engine(lang_id: str, qualified_name: str):
    module_name, _, function_name = qualified_name.rpartition(".")
    try:
        module = importlib.import_module(module_name)
    except ModuleNotFoundError:
        message = f"Invalid G2P engine module `{module_name}` for `{lang_id}`"
        logger.error(message)
        raise ValueError(message) from None
    return validate_g2p_engine_signature(getattr(module, function_name))


DEFAULT_CLEANERS_S = [
    "everyvoice_tpu.utils.collapse_whitespace",
    "everyvoice_tpu.utils.strip_text",
]
DEFAULT_CLEANERS = [string_to_callable(c) for c in DEFAULT_CLEANERS_S]


class TextConfig(ConfigModel):
    symbols: Symbols = Field(default_factory=Symbols)
    to_replace: Dict[str, str] = Field(
        {}, title="Global text replacements",
        description="Match→replacement rules applied before cleaners.",
    )
    language_to_replace: Dict[str, Dict[str, str]] = Field(
        {}, title="Language-specific text replacements",
        description="Per-language replacement maps; supersede global rules.",
    )
    dataset_to_replace: Dict[str, Dict[str, str]] = Field(
        {}, title="Dataset-specific text replacements",
        description="Per-dataset replacement maps; supersede language and global rules.",
    )
    cleaners: List[PossiblySerializedCallable] = Field(
        DEFAULT_CLEANERS_S, validate_default=True, title="Global cleaners",
        description="Cleaner functions applied to all text.",
    )
    language_cleaners: Dict[str, List[PossiblySerializedCallable]] = Field(
        {}, title="Language-specific cleaners",
        description="Per-language cleaner lists; supersede global cleaners.",
    )
    dataset_cleaners: Dict[str, List[PossiblySerializedCallable]] = Field(
        {}, title="Dataset-specific cleaners",
        description="Per-dataset cleaner lists; supersede language and global cleaners.",
    )
    g2p_engines: Dict[Language, G2PModulePath] = Field(
        {}, title="External G2P",
        description="User-defined G2P engine plugins, lang id → dotted module path.",
    )
    split_text: bool = Field(
        True, title="Split Text",
        description="Chunk long text at inference time and re-combine after synthesis.",
    )
    boundaries: Dict[Language, LanguageBoundaries] = Field(
        {}, title="Boundaries",
        description="Per-language strong/weak boundary characters for text splitting.",
    )

    @field_validator("to_replace")
    @classmethod
    def _sort_to_replace_by_key_length(cls, to_replace: Dict[str, str]):
        # Longest match keys first so more specific rules win.
        return dict(sorted(to_replace.items(), key=lambda kv: len(kv[0]), reverse=True))

    def get_cleaners(
        self, *, lang_id: Optional[str] = None, dataset_label: Optional[str] = None
    ):
        """Precedence: dataset > language > global (reference text_config.py:293-305)."""
        if dataset_label is not None and dataset_label in self.dataset_cleaners:
            return self.dataset_cleaners[dataset_label]
        if lang_id is not None and lang_id in self.language_cleaners:
            return self.language_cleaners[lang_id]
        return self.cleaners

    def get_to_replace(
        self, *, lang_id: Optional[str] = None, dataset_label: Optional[str] = None
    ):
        if dataset_label is not None and dataset_label in self.dataset_to_replace:
            return self.dataset_to_replace[dataset_label]
        if lang_id is not None and lang_id in self.language_to_replace:
            return self.language_to_replace[lang_id]
        return self.to_replace

    @model_validator(mode="after")
    def _clean_symbols(self) -> "TextConfig":
        """Normalize the declared symbols with the applicable cleaners so the
        inventory matches what tokenization will see."""
        from everyvoice_tpu.text.utils import normalize_text_helper

        for k, v in self.symbols:
            if k in ("punctuation", "silence"):
                continue
            dataset_label = get_label_from_symbol_key(k)
            cleaners = self.get_cleaners(dataset_label=dataset_label)
            to_replace = self.get_to_replace(dataset_label=dataset_label)
            normalized = [normalize_text_helper(x, to_replace, cleaners) for x in v]
            if "" in normalized or len(normalized) != len(set(normalized)):
                logger.warning(
                    f"Normalization created a duplicate or an empty symbol in "
                    f"{k}={normalized}; please check your shared-text config."
                )
            setattr(self.symbols, k, [x for x in normalized if x])
        return self

    @model_validator(mode="after")
    def _register_g2p_engines(self) -> "TextConfig":
        from everyvoice_tpu.text.phonemizer import AVAILABLE_G2P_ENGINES

        for lang_id, name in self.g2p_engines.items():
            g2p_func = load_custom_g2p_engine(lang_id, name)
            if lang_id in AVAILABLE_G2P_ENGINES:
                logger.warning(
                    f"Overriding g2p for `{lang_id}` with user plugin `{name}`"
                )
            AVAILABLE_G2P_ENGINES[lang_id] = g2p_func
        return self

    @staticmethod
    def load_config_from_path(path: Path) -> "TextConfig":
        from everyvoice_tpu.utils import load_config_file

        data = load_config_file(path)
        with init_context({"config_path": Path(path).parent}):
            return TextConfig(**data)
