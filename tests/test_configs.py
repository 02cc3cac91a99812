"""Config system tests (model: reference everyvoice/tests/test_configs.py)."""

import json
from pathlib import Path

import pytest
from pydantic import ValidationError

from everyvoice_tpu.config import (
    AudioConfig,
    ContactInformation,
    Dataset,
    LoggerConfig,
    PreprocessingConfig,
    TextConfig,
)
from everyvoice_tpu.config.shared_types import BaseTrainingConfig, init_context
from everyvoice_tpu.config.text_config import Punctuation, Symbols

CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


class TestAudioConfig:
    def test_defaults_match_reference_schema(self):
        """Defaults must match everyvoice-shared-data-0.5.json."""
        audio = AudioConfig()
        assert audio.min_audio_length == 0.4
        assert audio.max_audio_length == 11.0
        assert audio.max_wav_value == 32767.0
        assert audio.input_sampling_rate == 22050
        assert audio.output_sampling_rate == 22050
        assert audio.alignment_sampling_rate == 22050
        assert audio.n_fft == 1024
        assert audio.fft_window_size == 1024
        assert audio.fft_hop_size == 256
        assert audio.f_min == 0
        assert audio.f_max == 8000
        assert audio.n_mels == 80
        assert audio.spec_type == "mel-librosa"
        assert audio.vocoder_segment_size == 8192
        assert audio.target_bit_depth == 16

    def test_extra_fields_forbidden(self):
        with pytest.raises(ValidationError):
            AudioConfig(nonexistent_field=1)


class TestDataset:
    def test_permission_required(self):
        with pytest.raises(ValidationError, match="permission"):
            Dataset(permissions_obtained=False)
        ds = Dataset(permissions_obtained=True)
        assert ds.sox_effects == [["channels", "1"]]
        assert callable(ds.filelist_loader)


class TestTrainingConfig:
    def test_ckpt_freq_mutually_exclusive(self):
        with pytest.raises(ValidationError):
            BaseTrainingConfig(ckpt_steps=500, ckpt_epochs=2)
        cfg = BaseTrainingConfig(ckpt_steps=500, ckpt_epochs=None)
        assert cfg.ckpt_steps == 500
        cfg2 = BaseTrainingConfig()
        assert cfg2.ckpt_epochs == 1 and cfg2.ckpt_steps is None

    def test_defaults(self):
        cfg = BaseTrainingConfig()
        assert cfg.batch_size == 16
        assert cfg.save_top_k_ckpts == 5
        assert cfg.max_epochs == 1000
        assert cfg.max_steps == 100000
        assert cfg.val_check_interval == 500


class TestContact:
    def test_email_validation(self):
        with pytest.raises(ValidationError):
            ContactInformation(contact_name="x", contact_email="not-an-email")
        c = ContactInformation(**CONTACT)
        assert c.contact_email == "info@everyvoice.ca"


class TestCheckpointDump:
    def test_no_paths_in_checkpoint_dump(self):
        """Checkpoint dumps must be JSON-safe and path-free
        (reference tests/test_model.py:41-67)."""
        cfg = PreprocessingConfig()
        dumped = cfg.model_checkpoint_dump()
        # Round-trips through JSON
        as_json = json.dumps(dumped)
        restored = json.loads(as_json)

        def no_path_values(node):
            if isinstance(node, dict):
                return all(no_path_values(v) for v in node.values())
            if isinstance(node, list):
                return all(no_path_values(v) for v in node)
            return not isinstance(node, Path)

        assert no_path_values(restored)
        assert "save_dir" not in dumped  # Path fields stripped

    def test_callables_serialized_as_strings(self):
        cfg = BaseTrainingConfig()
        dumped = cfg.model_checkpoint_dump()
        assert (
            dumped["filelist_loader"]
            == "everyvoice_tpu.utils.generic_psv_filelist_reader"
        )


class TestUpdateConfig:
    def test_deep_update(self):
        cfg = PreprocessingConfig()
        cfg.update_config({"audio": {"n_mels": 96}})
        assert cfg.audio.n_mels == 96
        assert cfg.audio.n_fft == 1024  # untouched

    def test_cli_style_update(self):
        from everyvoice_tpu.utils import update_config_from_cli_args

        cfg = PreprocessingConfig()
        update_config_from_cli_args(["audio.fft_hop_size=128"], cfg)
        assert cfg.audio.fft_hop_size == 128


class TestTextConfig:
    def test_punctuation_overlap_forbidden(self):
        with pytest.raises(ValidationError, match="punctuation"):
            TextConfig(symbols=Symbols(letters=["!", "a"]))

    def test_symbols_cleaned(self):
        """Declared symbols are normalized with the configured cleaners."""
        cfg = TextConfig(
            cleaners=["everyvoice_tpu.utils.lower"],
            symbols=Symbols(letters=["A", "b"]),
        )
        assert cfg.symbols.letters == ["a", "b"]

    def test_to_replace_sorted_longest_first(self):
        cfg = TextConfig(to_replace={"a": "x", "aaa": "y", "aa": "z"})
        assert list(cfg.to_replace.keys()) == ["aaa", "aa", "a"]

    def test_cleaner_precedence(self):
        from everyvoice_tpu.utils import lower, strip_text

        cfg = TextConfig(
            cleaners=["everyvoice_tpu.utils.strip_text"],
            dataset_cleaners={"ds1": ["everyvoice_tpu.utils.lower"]},
        )
        assert cfg.get_cleaners(dataset_label="ds1") == [lower]
        assert cfg.get_cleaners() == [strip_text]

    def test_punctuation_all(self):
        p = Punctuation()
        assert "!" in p.all and "…" in p.all and len(p.all) >= 20


class TestPartialLoad:
    def test_load_with_partial_file(self, tmp_path):
        audio_file = tmp_path / "audio.yaml"
        audio_file.write_text("n_mels: 120\n")
        main_file = tmp_path / "preproc.yaml"
        main_file.write_text(
            "dataset: TestSet\npath_to_audio_config_file: audio.yaml\n"
        )
        cfg = PreprocessingConfig.load_config_from_path(main_file)
        assert cfg.audio.n_mels == 120
        assert cfg.dataset == "TestSet"

    def test_version_gate(self, tmp_path):
        f = tmp_path / "cfg.yaml"
        f.write_text("VERSION: '2.0'\n")
        with pytest.raises(Exception, match="version"):
            PreprocessingConfig.load_config_from_path(f)

    def test_relative_save_dir_created(self, tmp_path):
        with init_context({"writing_config": tmp_path}):
            PreprocessingConfig(save_dir=Path("preprocessed/sub"))
        assert (tmp_path / "preprocessed" / "sub").is_dir()


class TestLoggerConfig:
    def test_sub_dir_callable(self):
        cfg = LoggerConfig()
        assert cfg.name == "BaseExperiment"
        assert cfg.version == "base"
        assert cfg.sub_dir.isdigit()


class TestCliOverrideParity:
    """Reference test_configs.py: test_change_with_indices,
    test_correct_number_typing, test_changes."""

    def test_list_index_override(self, tmp_path):
        from everyvoice_tpu.utils import update_config_from_cli_args

        filelist = tmp_path / "fl.psv"
        filelist.write_text("basename|characters\nitem|hi\n")
        config = PreprocessingConfig(
            source_data=[Dataset(permissions_obtained=True, filelist=filelist)]
        )
        update_config_from_cli_args(
            ["source_data.0.filelist=/foo/bar/filelist.psv"], config
        )
        assert config.source_data[0].filelist == Path("/foo/bar/filelist.psv")

    def test_number_typing(self):
        from everyvoice_tpu.utils import _coerce_cli_value

        assert _coerce_cli_value("4") == 4 and isinstance(
            _coerce_cli_value("4"), int
        )
        assert _coerce_cli_value("0.2") == 0.2
        assert _coerce_cli_value("true") is True
        assert _coerce_cli_value("False") is False
        assert _coerce_cli_value("null") is None
        assert _coerce_cli_value("[1, 2]") == [1, 2]
        assert _coerce_cli_value("hello") == "hello"

    def test_nested_scalar_override(self):
        from everyvoice_tpu.utils import update_config_from_cli_args

        config = BaseTrainingConfig()
        update_config_from_cli_args(["max_steps=1234"], config)
        assert config.max_steps == 1234

    def test_malformed_override_rejected(self):
        from everyvoice_tpu.utils import update_config_from_cli_args

        with pytest.raises(ValueError, match="key.path=value"):
            update_config_from_cli_args(["no-equals-sign"], BaseTrainingConfig())


class TestValidatorParity:
    """Reference: negative ckpt options, invalid resblock/gan_type, empty
    config files."""

    def test_negative_ckpt_epochs_rejected(self):
        with pytest.raises(ValidationError, match="non-negative"):
            BaseTrainingConfig(ckpt_epochs=-1)

    def test_negative_ckpt_steps_rejected(self):
        with pytest.raises(ValidationError, match="non-negative"):
            BaseTrainingConfig(ckpt_steps=-2, ckpt_epochs=None)

    def test_invalid_resblock_rejected(self):
        from everyvoice_tpu.models.hifigan.config import HiFiGANModelConfig

        with pytest.raises(ValidationError):
            HiFiGANModelConfig(resblock="3")

    def test_invalid_gan_type_rejected(self):
        from everyvoice_tpu.models.hifigan.config import HiFiGANTrainingConfig

        with pytest.raises(ValidationError):
            HiFiGANTrainingConfig(gan_type="hinge")

    def test_empty_config_file_errors(self, tmp_path):
        from everyvoice_tpu.models.fs2 import FastSpeech2Config

        empty = tmp_path / "everyvoice-text-to-spec.yaml"
        empty.write_text("")
        with pytest.raises(Exception):
            FastSpeech2Config.load_config_from_path(empty)

    def test_dataset_sox_effects_do_not_alias(self, tmp_path):
        filelist = tmp_path / "fl.psv"
        filelist.write_text("basename|characters\nitem|hi\n")
        a = Dataset(permissions_obtained=True, filelist=filelist)
        b = Dataset(permissions_obtained=True, filelist=filelist)
        a.sox_effects.append(["norm", "-3.0"])
        assert ["norm", "-3.0"] not in b.sox_effects
