"""Wizard steps: project basics, per-dataset subtour, config writing
(condensed parity: everyvoice/wizard/basic.py:51-891 +
wizard/dataset.py:39-1192 — same questions and effects, including automatic
symbol-set discovery and the five-config-file output contract).
"""

from __future__ import annotations

import re
from pathlib import Path

from everyvoice_tpu.logger import logger
from everyvoice_tpu.wizard.tour import Step

CONFIG_FILES = {
    "text": "everyvoice-shared-text.yaml",
    "data": "everyvoice-shared-data.yaml",
    "text-to-spec": "everyvoice-text-to-spec.yaml",
    "spec-to-wav": "everyvoice-spec-to-wav.yaml",
    "text-to-wav": "everyvoice-text-to-wav.yaml",
}


class NameStep(Step):
    DEFAULT_NAME = "Name Step"

    def __init__(self, **kwargs):
        super().__init__(
            prompt_text="What would you like to call this project?", **kwargs
        )

    def validate(self, response) -> bool:
        return bool(response) and bool(re.match(r"^[\w\s\-]+$", str(response)))

    def effect(self):
        self.state["name"] = str(self.response).strip()


class ContactNameStep(Step):
    DEFAULT_NAME = "Contact Name Step"

    def __init__(self, **kwargs):
        super().__init__(prompt_text="What is your full name?", **kwargs)

    def validate(self, response) -> bool:
        return bool(str(response).strip()) and len(str(response).strip()) > 2

    def effect(self):
        self.state["contact_name"] = str(self.response).strip()


class ContactEmailStep(Step):
    DEFAULT_NAME = "Contact Email Step"

    def __init__(self, **kwargs):
        super().__init__(prompt_text="What is your email address?", **kwargs)

    def validate(self, response) -> bool:
        return bool(re.match(r"^[^@\s]+@[^@\s]+\.[^@\s]+$", str(response).strip()))

    def effect(self):
        self.state["contact_email"] = str(self.response).strip()


class OutputPathStep(Step):
    DEFAULT_NAME = "Output Path Step"

    def __init__(self, **kwargs):
        super().__init__(
            prompt_text="Where should the new project be created?",
            default=".", **kwargs,
        )

    def validate(self, response) -> bool:
        path = Path(str(response)).expanduser()
        if path.exists() and not path.is_dir():
            return False
        return True

    def effect(self):
        self.state["output_path"] = Path(str(self.response)).expanduser()


# ---------------------------------------------------------------------------
# dataset subtour


class FilelistStep(Step):
    DEFAULT_NAME = "Filelist Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Filelist Step {dataset_index}",
            prompt_text="Where is your data filelist?", **kwargs,
        )

    def validate(self, response) -> bool:
        return Path(str(response)).expanduser().is_file()

    def effect(self):
        from everyvoice_tpu.utils import sniff_and_return_filelist_data

        path = Path(str(self.response)).expanduser()
        ds = self.state.setdefault("datasets", [{}] * 0)
        while len(ds) <= self.dataset_index:
            ds.append({})
        ds[self.dataset_index]["filelist"] = path
        try:
            rows = sniff_and_return_filelist_data(path)
        except Exception as e:
            logger.warning(f"Could not sniff filelist format: {e}")
            rows = []
        ds[self.dataset_index]["rows"] = rows


class ColumnMappingStep(Step):
    """Map nonstandard filelist columns onto the expected names
    (parity: the reference wizard's header-selection steps,
    wizard/dataset.py header mapping)."""

    DEFAULT_NAME = "Column Mapping Step"
    TARGET = "characters"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Column Mapping Step {dataset_index}",
            prompt_text=(
                "Your filelist has no 'characters' column. Which column holds "
                "the text?"
            ),
            **kwargs,
        )

    def _columns(self) -> list:
        rows = self.state["datasets"][self.dataset_index].get("rows") or []
        return sorted(rows[0].keys()) if rows else []

    def looks_like_choice(self):
        return self._columns()

    def should_run(self) -> bool:
        rows = self.state["datasets"][self.dataset_index].get("rows") or []
        return bool(rows) and "characters" not in rows[0]

    def run(self):
        if not self.should_run():
            self.completed = True
            return
        super().run()

    def validate(self, response) -> bool:
        return str(response) in self._columns()

    def effect(self):
        column = str(self.response)
        rows = self.state["datasets"][self.dataset_index]["rows"]
        for row in rows:
            row["characters"] = row.get(column, "")


class PermissionsStep(Step):
    DEFAULT_NAME = "Dataset Permission Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Dataset Permission Step {self.dataset_index}",
            prompt_text=(
                "Do you have permission from the speaker(s) to use this data "
                "to build a text-to-speech model? (yes/no)"
            ),
            **kwargs,
        )

    def validate(self, response) -> bool:
        return str(response).strip().lower() in ("yes", "y", "true", "no", "n", "false")

    def effect(self):
        allowed = str(self.response).strip().lower() in ("yes", "y", "true")
        if not allowed:
            raise SystemExit(
                "You must have permission to use your data; the wizard cannot "
                "continue without it."
            )
        self.state["datasets"][self.dataset_index]["permissions_obtained"] = True


class TextRepresentationStep(Step):
    DEFAULT_NAME = "Filelist Text Representation Step"
    CHOICES = ["characters", "phones", "arpabet"]

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Filelist Text Representation Step {dataset_index}",
            prompt_text="Which text representation does your filelist use?",
            default="characters", **kwargs,
        )

    def looks_like_choice(self):
        return self.CHOICES

    def validate(self, response) -> bool:
        return str(response) in self.CHOICES

    def effect(self):
        self.state["datasets"][self.dataset_index]["text_representation"] = str(
            self.response
        )


class LanguageStep(Step):
    DEFAULT_NAME = "Language Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Language Step {dataset_index}",
            prompt_text="What is the ISO language code of this dataset "
            "(e.g. eng; 'und' if unsure)?",
            default="und", **kwargs,
        )

    def validate(self, response) -> bool:
        return bool(re.match(r"^[a-z]{2,3}$", str(response).strip()))

    def effect(self):
        self.state["datasets"][self.dataset_index]["language"] = str(
            self.response
        ).strip()


class WavsDirStep(Step):
    DEFAULT_NAME = "Wavs Dir Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Wavs Dir Step {dataset_index}",
            prompt_text="Where are your audio (wav) files?", **kwargs,
        )

    def validate(self, response) -> bool:
        return Path(str(response)).expanduser().is_dir()

    def effect(self):
        self.state["datasets"][self.dataset_index]["data_dir"] = Path(
            str(self.response)
        ).expanduser()


class SymbolSetStep(Step):
    """Automatic symbol discovery from the filelist text
    (parity: wizard/dataset.py:1103-1162)."""

    DEFAULT_NAME = "Symbol-Set Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Symbol-Set Step {dataset_index}",
            prompt_text="Discover the symbol set from your data now? (yes/no)",
            default="yes", **kwargs,
        )

    def validate(self, response) -> bool:
        return str(response).strip().lower() in ("yes", "y", "no", "n")

    def effect(self):
        if str(self.response).strip().lower() in ("no", "n"):
            return
        from everyvoice_tpu.text.utils import (
            guess_graphemes_in_text_lines,
            guess_ipa_phones_in_text_lines,
        )

        ds = self.state["datasets"][self.dataset_index]
        rows = ds.get("rows") or []
        texts = [
            r.get("characters") or r.get("text") or r.get("phones") or ""
            for r in rows
        ]
        rep = ds.get("text_representation", "characters")
        if rep == "phones":
            symbols = guess_ipa_phones_in_text_lines(texts)
        else:
            symbols = guess_graphemes_in_text_lines(texts)
        from everyvoice_tpu.config.text_config import Punctuation

        punctuation = Punctuation().all
        symbols = {s for s in symbols if s.strip() and s not in punctuation}
        ds["symbols"] = sorted(symbols)


class CustomG2PStep(Step):
    """Optionally register a custom G2P plugin for this dataset's language
    (parity: wizard/dataset.py custom-G2P step)."""

    DEFAULT_NAME = "Custom G2P Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Custom G2P Step {dataset_index}",
            prompt_text=(
                "If you have a custom G2P plugin for this language, enter its "
                "dotted module path (module.function); otherwise leave empty:"
            ),
            default="", **kwargs,
        )

    def validate(self, response) -> bool:
        response = str(response).strip()
        if not response:
            return True
        from everyvoice_tpu.config.text_config import load_custom_g2p_engine

        lang = self.state["datasets"][self.dataset_index].get("language", "und")
        try:
            load_custom_g2p_engine(lang, response)
            return True
        except Exception:
            return False

    def effect(self):
        response = str(self.response).strip()
        if response:
            self.state["datasets"][self.dataset_index]["g2p_engine"] = response


class SoxEffectsStep(Step):
    """Select audio effects applied before preprocessing
    (parity: wizard/dataset.py sox-effects step; effects run on device)."""

    DEFAULT_NAME = "Sox Effects Step"
    CHOICES = [
        "none",
        "resample to 22050 Hz",
        "normalize to -3 dB",
        "mixdown to mono",
    ]
    EFFECT_SPECS = {
        "none": [],
        "resample to 22050 Hz": [["rate", "22050"]],
        "normalize to -3 dB": [["norm", "-3"]],
        "mixdown to mono": [["channels", "1"]],
    }

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Sox Effects Step {dataset_index}",
            prompt_text="Which audio preprocessing effect should be applied?",
            default="mixdown to mono", **kwargs,
        )

    def looks_like_choice(self):
        return self.CHOICES

    def validate(self, response) -> bool:
        return str(response) in self.CHOICES

    def effect(self):
        self.state["datasets"][self.dataset_index]["sox_effects"] = (
            self.EFFECT_SPECS[str(self.response)]
        )


class OODDataStep(Step):
    """Out-of-domain text for StyleTTS2 SLM-adversarial training
    (parity: wizard/basic.py:212-466 OODDataStep)."""

    DEFAULT_NAME = "OOD Data Step"

    def __init__(self, **kwargs):
        super().__init__(
            prompt_text=(
                "StyleTTS2 training benefits from out-of-domain text. Enter a "
                "path to a text file (one sentence per line), 'validation' to "
                "reuse the validation set, or leave empty to skip:"
            ),
            default="", **kwargs,
        )

    def validate(self, response) -> bool:
        response = str(response).strip()
        if response in ("", "validation"):
            return True
        return Path(response).expanduser().is_file()

    def effect(self):
        response = str(self.response).strip()
        if response == "validation":
            self.state["ood_use_validation"] = True
        elif response:
            self.state["ood_local_path"] = Path(response).expanduser()


class DatasetNameStep(Step):
    DEFAULT_NAME = "Dataset Name Step"

    def __init__(self, dataset_index: int = 0, **kwargs):
        self.dataset_index = dataset_index
        super().__init__(
            name=f"Dataset Name Step {dataset_index}",
            prompt_text="Give this dataset a name:",
            default=f"dataset{dataset_index}", **kwargs,
        )

    def validate(self, response) -> bool:
        return bool(re.match(r"^[\w\d\-]+$", str(response)))

    def effect(self):
        self.state["datasets"][self.dataset_index]["label"] = str(self.response)


class MoreDatasetsStep(Step):
    DEFAULT_NAME = "More Datasets Step"

    def __init__(self, **kwargs):
        super().__init__(
            prompt_text="Do you have more datasets to add? (yes/no)",
            default="no", **kwargs,
        )

    def validate(self, response) -> bool:
        return str(response).strip().lower() in ("yes", "y", "no", "n")

    def effect(self):
        if str(self.response).strip().lower() in ("yes", "y"):
            next_index = len(self.state.get("datasets", []))
            assert self.tour is not None
            subtour = get_dataset_steps(next_index)
            another = MoreDatasetsStep(name=f"More Datasets Step {next_index}")
            self.tour.add_steps_right_after(subtour + [another], self)
        else:
            # Wrap up: write the project skeleton + configs.
            write_config_package(self.state)


def get_dataset_steps(dataset_index: int = 0) -> list:
    return [
        FilelistStep(dataset_index),
        ColumnMappingStep(dataset_index),  # auto-skips for standard columns
        PermissionsStep(dataset_index),
        TextRepresentationStep(dataset_index),
        LanguageStep(dataset_index),
        CustomG2PStep(dataset_index),
        WavsDirStep(dataset_index),
        SymbolSetStep(dataset_index),
        SoxEffectsStep(dataset_index),
        DatasetNameStep(dataset_index),
    ]


# ---------------------------------------------------------------------------
# config writing (parity: ConfigFormatStep.effect, wizard/basic.py:482-825)


def write_config_package(state: dict) -> Path:
    from everyvoice_tpu.utils import write_config_file, write_filelist

    name = state.get("name", "project")
    slug = re.sub(r"\s+", "-", name.strip())
    out_root = Path(state.get("output_path", ".")) / slug
    config_dir = out_root / "config"
    config_dir.mkdir(parents=True, exist_ok=True)
    (out_root / "preprocessed").mkdir(exist_ok=True)
    (out_root / "logs_and_checkpoints").mkdir(exist_ok=True)

    datasets = state.get("datasets", [])
    languages = sorted({d.get("language", "und") for d in datasets})
    multilingual = len(languages) > 1
    speakers = set()
    for d in datasets:
        for row in d.get("rows", []):
            speakers.add(row.get("speaker") or "default")
    multispeaker = len(speakers) > 1

    # --- shared text config
    symbols: dict = {}
    for d in datasets:
        label = d.get("label", "dataset")
        rep = d.get("text_representation", "characters")
        suffix = "phones" if rep in ("phones", "arpabet") else "characters"
        if d.get("symbols"):
            symbols[f"{label}_{suffix}"] = d["symbols"]
    text_config = {"symbols": symbols} if symbols else {}
    g2p_engines = {
        d["language"]: d["g2p_engine"]
        for d in datasets
        if d.get("g2p_engine") and d.get("language")
    }
    if g2p_engines:
        text_config["g2p_engines"] = g2p_engines
    write_config_file(config_dir / CONFIG_FILES["text"], text_config)

    # --- shared data config + per-dataset filelists
    source_data = []
    for d in datasets:
        label = d.get("label", "dataset")
        filelist_out = out_root / f"{label}-filelist.psv"
        rows = d.get("rows", [])
        if rows:
            write_filelist(rows, filelist_out)
        entry = {
            "label": label,
            "permissions_obtained": True,
            "data_dir": str(d.get("data_dir", ".")),
            "filelist": str(filelist_out if rows else d.get("filelist", "")),
        }
        if d.get("sox_effects") is not None:
            entry["sox_effects"] = d["sox_effects"]
        source_data.append(entry)
    data_config = {
        "dataset": slug,
        "save_dir": str(out_root / "preprocessed"),
        "source_data": source_data,
    }
    write_config_file(config_dir / CONFIG_FILES["data"], data_config)

    contact = {
        "contact_name": state.get("contact_name", ""),
        "contact_email": state.get("contact_email", ""),
    }
    preprocessed = out_root / "preprocessed"
    training_shared = {
        "training_filelist": str(preprocessed / "training_filelist.psv"),
        "validation_filelist": str(preprocessed / "validation_filelist.psv"),
        "logger": {"save_dir": str(out_root / "logs_and_checkpoints")},
    }

    # --- model configs referencing the shared partials
    fs2 = {
        "contact": contact,
        "path_to_preprocessing_config_file": CONFIG_FILES["data"],
        "path_to_text_config_file": CONFIG_FILES["text"],
        "model": {"multilingual": multilingual, "multispeaker": multispeaker},
        "training": dict(training_shared),
    }
    write_config_file(config_dir / CONFIG_FILES["text-to-spec"], fs2)
    hifigan = {
        "contact": contact,
        "path_to_preprocessing_config_file": CONFIG_FILES["data"],
        "training": dict(training_shared),
    }
    write_config_file(config_dir / CONFIG_FILES["spec-to-wav"], hifigan)
    styletts2 = {
        "contact": contact,
        "path_to_preprocessing_config_file": CONFIG_FILES["data"],
        "path_to_text_config_file": CONFIG_FILES["text"],
        "model": {"multilingual": multilingual, "multispeaker": multispeaker},
        "training": dict(training_shared),
    }
    if state.get("ood_use_validation"):
        styletts2["training"]["use_validation_as_ood"] = True
    elif state.get("ood_local_path"):
        langs = sorted({d.get("language", "und") for d in datasets})
        styletts2["training"]["ood_raw_data"] = {
            lang: {"local_path": str(state["ood_local_path"])} for lang in langs
        }
    write_config_file(config_dir / CONFIG_FILES["text-to-wav"], styletts2)

    logger.info(f"Wrote project '{name}' to {out_root}")
    state["project_dir"] = out_root
    return out_root
