"""FastSpeech2 configuration (parity: the fs2 submodule's config classes as
published in everyvoice/.schema/everyvoice-text-to-spec-0.5.json)."""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Any, ClassVar, Optional, Union

from pydantic import Field, model_validator

from everyvoice_tpu.config.preprocessing_config import PreprocessingConfig
from everyvoice_tpu.config.shared_types import (
    BaseTrainingConfig,
    ConfigModel,
    ContactInformation,
    NoamOptimizer,
    PartialLoadConfig,
)
from everyvoice_tpu.config.text_config import TextConfig
from everyvoice_tpu.config.type_definitions import TargetTrainingTextRepresentationLevel


class VarianceLevelEnum(str, Enum):
    phone = "phone"
    frame = "frame"


class VarianceLossEnum(str, Enum):
    mse = "mse"
    mae = "mae"


class ConformerConfig(ConfigModel):
    layers: int = Field(4, description="Number of conformer blocks.")
    heads: int = Field(2, description="Number of self-attention heads.")
    input_dim: int = Field(256, description="Model (hidden) dimension.")
    feedforward_dim: int = Field(1024, description="Feed-forward inner dimension.")
    conv_kernel_size: int = Field(9, description="Conformer convolution kernel size.")
    dropout: float = Field(0.2, description="Dropout rate.")


class VariancePredictorBase(ConfigModel):
    loss: VarianceLossEnum = Field(
        VarianceLossEnum.mse, description="Loss used for this variance predictor."
    )
    n_layers: int = Field(5, description="Number of convolutional layers.")
    kernel_size: int = Field(3, description="Convolution kernel size.")
    dropout: float = Field(0.5, description="Dropout rate.")
    input_dim: int = Field(256, description="Hidden dimension.")
    n_bins: int = Field(256, description="Quantization bins for the embedding.")
    depthwise: bool = Field(True, description="Use depthwise-separable convolutions.")


class VariancePredictorConfig(VariancePredictorBase):
    level: VarianceLevelEnum = Field(
        VarianceLevelEnum.phone,
        description="Predict at phone level (averaged by duration) or frame level.",
    )


class VariancePredictors(ConfigModel):
    energy: VariancePredictorConfig = Field(
        default_factory=VariancePredictorConfig, description="Energy predictor."
    )
    duration: VariancePredictorBase = Field(
        default_factory=VariancePredictorBase, description="Duration predictor."
    )
    pitch: VariancePredictorConfig = Field(
        default_factory=VariancePredictorConfig, description="Pitch predictor."
    )


class FastSpeech2ModelConfig(ConfigModel):
    encoder: ConformerConfig = Field(
        default_factory=ConformerConfig, description="Text encoder."
    )
    decoder: ConformerConfig = Field(
        default_factory=ConformerConfig, description="Spectrogram decoder."
    )
    variance_predictors: VariancePredictors = Field(
        default_factory=VariancePredictors, description="Variance adaptor config."
    )
    target_text_representation_level: TargetTrainingTextRepresentationLevel = Field(
        TargetTrainingTextRepresentationLevel.characters,
        description="Which text representation to train on.",
    )
    learn_alignment: bool = Field(
        True,
        description="Learn text↔mel alignment jointly (attention with a "
        "beta-binomial prior, CTC + binarization losses) instead of "
        "requiring pre-extracted durations.",
    )
    use_global_style_token_module: bool = Field(
        False, description="Enable the Global Style Token (GST) module."
    )
    max_length: int = Field(1000, description="Maximum sequence length (frames).")
    mel_loss: VarianceLossEnum = Field(
        VarianceLossEnum.mse, description="Spectrogram reconstruction loss."
    )
    use_postnet: bool = Field(True, description="Refine mel output with a postnet.")
    multilingual: bool = Field(False, description="Learn language embeddings.")
    multispeaker: bool = Field(False, description="Learn speaker embeddings.")


class FastSpeech2TrainingConfig(BaseTrainingConfig):
    use_weighted_sampler: bool = Field(
        False, description="Oversample under-represented speakers/languages."
    )
    optimizer: NoamOptimizer = Field(
        default_factory=lambda: NoamOptimizer(
            learning_rate=1e-3, weight_decay=1e-6, betas=[0.9, 0.999],
            warmup_steps=1000,
        ),
        description="Optimizer (Noam schedule).",
    )
    vocoder_path: Union[Path, None] = Field(
        None, description="Vocoder checkpoint for audio logging during training."
    )
    mel_loss_weight: float = Field(1.0)
    postnet_loss_weight: float = Field(1.0)
    pitch_loss_weight: float = Field(0.1)
    energy_loss_weight: float = Field(0.1)
    duration_loss_weight: float = Field(0.1)
    attn_ctc_loss_weight: float = Field(0.1)
    attn_bin_loss_weight: float = Field(0.1)
    attn_bin_loss_warmup_epochs: int = Field(
        100, ge=1, description="Epochs over which the binarization loss ramps up."
    )


class FastSpeech2Config(PartialLoadConfig):
    PARTIAL_KEYS: ClassVar[tuple] = ("model", "training", "preprocessing", "text")

    contact: ContactInformation = Field(
        description="Contact information for the model maintainer."
    )
    VERSION: str = Field("1.0")
    model: FastSpeech2ModelConfig = Field(
        default_factory=FastSpeech2ModelConfig, description="Model architecture."
    )
    path_to_model_config_file: Optional[Path] = None
    training: FastSpeech2TrainingConfig = Field(
        default_factory=FastSpeech2TrainingConfig, description="Training settings."
    )
    path_to_training_config_file: Optional[Path] = None
    preprocessing: PreprocessingConfig = Field(
        default_factory=PreprocessingConfig, description="Preprocessing settings."
    )
    path_to_preprocessing_config_file: Optional[Path] = None
    text: TextConfig = Field(default_factory=TextConfig, description="Text settings.")
    path_to_text_config_file: Optional[Path] = None

    @model_validator(mode="before")
    @classmethod
    def _contact_required(cls, data: Any) -> Any:
        if isinstance(data, dict) and "contact" not in data:
            raise ValueError(
                "EveryVoice models require contact information; please add a "
                "'contact' section (contact_name, contact_email)."
            )
        return data


# The reference exposes this same config under the feature_prediction wrapper
# (everyvoice/model/feature_prediction/config.py:1-7).
FeaturePredictionConfig = FastSpeech2Config
