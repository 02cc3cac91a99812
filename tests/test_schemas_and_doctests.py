"""Schema drift gate + doctest collection + CLI import hygiene
(model: reference tests/test_cli.py schema drift check, tests/test_doctests.py,
and test_expensive_imports_are_tucked_away, test_cli.py:399)."""

import doctest
import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SCHEMA_DIR = REPO / "everyvoice_tpu" / ".schema"

SCHEMA_CLASSES = {
    "everyvoice-shared-data-0.5.json": (
        "everyvoice_tpu.config", "PreprocessingConfig"),
    "everyvoice-shared-text-0.5.json": ("everyvoice_tpu.config", "TextConfig"),
    "everyvoice-text-to-spec-0.5.json": (
        "everyvoice_tpu.models.fs2.config", "FastSpeech2Config"),
    "everyvoice-spec-to-wav-0.5.json": (
        "everyvoice_tpu.models.hifigan.config", "HiFiGANConfig"),
    "everyvoice-text-to-wav-0.5.json": (
        "everyvoice_tpu.models.styletts2.config", "StyleTTS2Config"),
}


class TestSchemaDrift:
    """The committed .schema files must match the live config classes —
    the reference fails CI on drift (cli.py:1132-1200)."""

    @pytest.mark.parametrize("filename", sorted(SCHEMA_CLASSES))
    def test_schema_up_to_date(self, filename):
        import importlib

        module_name, class_name = SCHEMA_CLASSES[filename]
        cls = getattr(importlib.import_module(module_name), class_name)
        live = cls.model_json_schema()
        committed = json.loads((SCHEMA_DIR / filename).read_text())
        assert live == committed, (
            f"{filename} is stale; run `everyvoice-tpu update-schemas`"
        )


DOCTEST_MODULES = [
    "everyvoice_tpu.utils",
    "everyvoice_tpu.text.utils",
    "everyvoice_tpu.text.arpabet",
    "everyvoice_tpu.text.english_g2p",
    "everyvoice_tpu.text.english_lexicon",
    "everyvoice_tpu.text.textsplit",
    "everyvoice_tpu.text.text_processor",
    "everyvoice_tpu.text.features",
    "everyvoice_tpu.text.ipa",
    "everyvoice_tpu.text.utils_heavy",
    "everyvoice_tpu.config.validation_helpers",
]


class TestDoctests:
    """Docstring examples are executable specs
    (reference tests/test_doctests.py)."""

    @pytest.mark.parametrize("module_name", DOCTEST_MODULES)
    def test_module_doctests(self, module_name):
        import importlib

        module = importlib.import_module(module_name)
        results = doctest.testmod(module, verbose=False)
        assert results.failed == 0, f"{results.failed} doctest failures"


class TestCliStartup:
    """`--help` must not import the heavy ML stack — the reference gates CLI
    startup latency in CI (profile-help-ci.sh)."""

    def test_expensive_imports_are_tucked_away(self):
        code = (
            "import sys\n"
            "import everyvoice_tpu.cli\n"
            "heavy = [m for m in ('flax', 'optax', 'torch',"
            " 'everyvoice_tpu.models.fs2.model') if m in sys.modules]\n"
            "print(','.join(heavy) or 'CLEAN')\n"
        )
        result = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=REPO,
        )
        assert result.returncode == 0, result.stderr
        assert result.stdout.strip() == "CLEAN", (
            f"CLI import pulled in heavy modules: {result.stdout}"
        )
