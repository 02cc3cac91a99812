"""Audio / dataset / preprocessing configs
(parity: everyvoice/config/preprocessing_config.py; schema
everyvoice-shared-data-0.5.json)."""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Any, ClassVar, List, Optional, Union

from pydantic import Field, ValidationInfo, field_validator, model_validator

from everyvoice_tpu.config.shared_types import ConfigModel, PartialLoadConfig
from everyvoice_tpu.config.utils import PossiblyRelativePath, PossiblySerializedCallable


class AudioSpecTypeEnum(str, Enum):
    mel = "mel"  # torchaudio-style (htk) mel — supported for compat
    mel_librosa = "mel-librosa"  # slaney mel basis over a power STFT (default)
    linear = "linear"
    raw = "raw"


class AudioConfig(ConfigModel):
    min_audio_length: float = Field(
        0.4, description="Minimum audio length (s); shorter clips are skipped."
    )
    max_audio_length: float = Field(
        11.0, description="Maximum audio length (s); longer clips are skipped."
    )
    max_wav_value: float = Field(
        32767.0, description="Maximum sample magnitude for integer PCM."
    )
    input_sampling_rate: int = Field(
        22050, description="Sampling rate the spec-to-wav model consumes."
    )
    output_sampling_rate: int = Field(
        22050, description="Sampling rate the spec-to-wav model produces."
    )
    alignment_sampling_rate: int = Field(
        22050, description="Sampling rate used for alignment model training."
    )
    target_bit_depth: int = Field(16, description="Bit depth of saved audio.")
    n_fft: int = Field(1024, title="FFT Size", description="Number of FFT bins.")
    fft_window_size: int = Field(1024, title="FFT Window Size")
    fft_hop_size: int = Field(
        256, title="FFT Hop Size", description="Samples between successive frames."
    )
    f_min: int = Field(0, title="Minimum Frequency")
    f_max: int = Field(8000, title="Maximum Frequency")
    n_mels: int = Field(80, title="Number of Mel bins")
    spec_type: Union[AudioSpecTypeEnum, str] = Field(
        AudioSpecTypeEnum.mel_librosa.value,
        description="Spectrogram flavour computed during preprocessing.",
    )
    vocoder_segment_size: int = Field(
        8192,
        description="Number of samples in the random fixed-size segments used "
        "for vocoder training.",
    )


class Dataset(ConfigModel):
    label: str = Field("YourDataSet", description="A label for the source of data")
    permissions_obtained: bool = Field(
        False,
        description="Attestation that permission has been obtained to use this "
        "data. You may not build a TTS system with data you do not have "
        "permission to use.",
    )
    data_dir: PossiblyRelativePath = Field(
        Path("/please/create/a/path/to/your/dataset/data"),
        description="Directory containing the audio files (relative paths "
        "resolve against the config file's own directory).",
    )
    filelist: PossiblyRelativePath = Field(
        Path("/please/create/a/path/to/your/dataset/filelist"),
        description="Path to the dataset's filelist (relative paths resolve "
        "against the config file's own directory).",
    )
    filelist_loader: PossiblySerializedCallable = Field(
        None, description="Function used to load this dataset's filelist."
    )
    sox_effects: list = Field(
        [["channels", "1"]],
        description="Audio effects applied before preprocessing "
        "(sox-style effect specs executed on-device).",
    )

    @model_validator(mode="before")
    @classmethod
    def _default_loader(cls, data: Any) -> Any:
        if isinstance(data, dict) and not data.get("filelist_loader"):
            data["filelist_loader"] = (
                "everyvoice_tpu.utils.generic_psv_filelist_reader"
            )
        return data

    @model_validator(mode="after")
    def _require_permission(self):
        # Hard requirement, as in the reference (preprocessing_config.py:123-129).
        if not self.permissions_obtained:
            raise ValueError(
                "You must check off that you have permission to use your data "
                "(set permissions_obtained: true)."
            )
        return self


class PreprocessingConfig(PartialLoadConfig):
    PARTIAL_KEYS: ClassVar[tuple] = ("audio",)

    dataset: str = Field("YourDataSet", description="The name of the dataset.")
    train_split: float = Field(
        0.9, ge=0.0, le=1.0, description="Fraction of data used for training."
    )
    dataset_split_seed: int = Field(
        1234, description="Seed for the train/validation split shuffle."
    )
    save_dir: PossiblyRelativePath = Field(
        Path("preprocessed/YourDataSet"),
        description="Directory preprocessed artifacts are written to "
        "(relative paths resolve against the config file's own directory).",
    )
    audio: AudioConfig = Field(
        default_factory=AudioConfig, description="Audio configuration."
    )
    path_to_audio_config_file: Optional[Path] = Field(
        None, description="Path to an audio configuration file."
    )
    source_data: List[Dataset] = Field(
        default_factory=list, description="A list of datasets."
    )

    @field_validator("save_dir", mode="after")
    @classmethod
    def _mkdir(cls, value: Path, info: ValidationInfo) -> Path:
        # PossiblyRelativePath already resolved against config_path when a
        # load context exists; "writing_config" covers the wizard's write
        # path. Returns the RESOLVED path so consumers are cwd-independent.
        path = value
        context = info.context or {}
        base = context.get("writing_config")
        if base is not None and not path.is_absolute():
            path = (Path(base) / path).resolve()
        path.mkdir(parents=True, exist_ok=True)
        return path
