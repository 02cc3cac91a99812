"""Test configuration: route jax compute to an 8-device virtual CPU mesh.

This container pre-imports jax with the TPU ('axon') backend via
sitecustomize, so JAX_PLATFORMS cannot be overridden here. Instead the CPU
backend (lazily initialized) is forced to expose 8 virtual devices and made
the default device, which keeps unit tests fast (no 20-40s TPU compiles) and
lets multi-chip sharding be validated on a CPU mesh — the analog of the
reference's CPU-only CI (reference .github/workflows/test.yml:17).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


LJ_DATA = __import__("pathlib").Path("/root/reference/everyvoice/tests/data")
CONTACT = {"contact_name": "Test Runner", "contact_email": "info@everyvoice.ca"}


def make_lj_config(tmp_path, small_model: bool = False):
    """FastSpeech2Config over the LJ micro-corpus (5 wavs)."""
    from everyvoice_tpu.config import PreprocessingConfig, TextConfig
    from everyvoice_tpu.config.preprocessing_config import Dataset
    from everyvoice_tpu.models.fs2 import FastSpeech2Config

    model_overrides = {}
    if small_model:
        model_overrides = {
            "encoder": {"layers": 1, "heads": 2, "input_dim": 64,
                        "feedforward_dim": 128, "conv_kernel_size": 3},
            "decoder": {"layers": 1, "heads": 2, "input_dim": 64,
                        "feedforward_dim": 128, "conv_kernel_size": 3},
            "variance_predictors": {
                "energy": {"n_layers": 1, "input_dim": 64},
                "duration": {"n_layers": 1, "input_dim": 64},
                "pitch": {"n_layers": 1, "input_dim": 64},
            },
            "max_length": 768,
        }
    return FastSpeech2Config(
        contact=CONTACT,
        model=model_overrides,
        preprocessing=PreprocessingConfig(
            save_dir=tmp_path / "preprocessed",
            source_data=[
                Dataset(
                    label="LJ_TEST",
                    permissions_obtained=True,
                    data_dir=LJ_DATA / "lj" / "wavs",
                    filelist=LJ_DATA / "metadata.psv",
                )
            ],
        ),
        text=TextConfig(
            symbols={
                "letters": list("abcdefghijklmnopqrstuvwxyz"),
                "ipa": list("ðʌɛʃɜ˞æɑɔɹɪʊəɡʒŋθaeioubcdfghjklmnpqrstvwxyz"),
            }
        ),
    )


@pytest.fixture(scope="session")
def lj_corpus(tmp_path_factory):
    """Preprocess the LJ snippet once per session; returns (config, save_dir)."""
    from everyvoice_tpu.preprocessor import Preprocessor

    tmp_path = tmp_path_factory.mktemp("lj_shared")
    config = make_lj_config(tmp_path, small_model=True)
    Preprocessor(config).preprocess(
        to_process=("audio", "text", "spec", "attn", "energy", "pitch"),
        overwrite=True,
    )
    save_dir = config.preprocessing.save_dir
    config.training.training_filelist = save_dir / "training_filelist.psv"
    config.training.validation_filelist = save_dir / "validation_filelist.psv"
    return config, save_dir


@pytest.fixture(scope="session")
def dummy_ckpts(tmp_path_factory):
    """Untrained-but-real checkpoints, built once per session (the analog of
    the reference's session-scoped get_dummy_models, conftest.py:19-35)."""
    from model_stubs import (
        get_dummy_fs2_checkpoint,
        get_dummy_hifigan_checkpoint,
    )

    tmp = tmp_path_factory.mktemp("stub_ckpts")
    return {
        "fs2": get_dummy_fs2_checkpoint(tmp),
        "hifigan": get_dummy_hifigan_checkpoint(tmp),
        "generator": get_dummy_hifigan_checkpoint(tmp, generator_only=True),
    }
