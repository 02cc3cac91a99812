"""HiFiGAN / iSTFTNet configuration (parity: the hfgl submodule's config
classes as published in everyvoice/.schema/everyvoice-spec-to-wav-0.5.json)."""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import Any, ClassVar, List, Optional, Union

from pydantic import Field, model_validator

from everyvoice_tpu.config.preprocessing_config import PreprocessingConfig
from everyvoice_tpu.config.shared_types import (
    AdamOptimizer,
    AdamWOptimizer,
    BaseTrainingConfig,
    ConfigModel,
    ContactInformation,
    PartialLoadConfig,
    RMSOptimizer,
)
from everyvoice_tpu.config.utils import PossiblySerializedCallable


class HiFiGANResblock(str, Enum):
    one = "1"
    two = "2"


class HiFiGANTrainTypes(str, Enum):
    original = "original"
    wgan = "wgan"


class HiFiGANModelConfig(ConfigModel):
    resblock: HiFiGANResblock = Field(
        HiFiGANResblock.one, description="Which multi-receptive-field resblock to use."
    )
    upsample_rates: List[int] = Field(
        [8, 8, 2, 2], description="Upsampling factor per stage (product = hop size)."
    )
    upsample_kernel_sizes: List[int] = Field(
        [16, 16, 4, 4], description="Transposed-conv kernel size per stage."
    )
    upsample_initial_channel: int = Field(
        512, description="Channels entering the first upsampling stage."
    )
    resblock_kernel_sizes: List[int] = Field(
        [3, 7, 11], description="Kernel size of each parallel MRF resblock."
    )
    resblock_dilation_sizes: List[List[int]] = Field(
        [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        description="Dilations within each MRF resblock.",
    )
    activation_function: PossiblySerializedCallable = Field(
        None, description="Activation (default: leaky ReLU, slope 0.1)."
    )
    istft_layer: bool = Field(
        False,
        description="iSTFTNet variant: replace the last upsampling stages "
        "with an inverse-STFT head (predicting magnitude+phase).",
    )
    msd_layers: int = Field(3, description="Number of multi-scale discriminators.")
    mpd_layers: List[int] = Field(
        [2, 3, 5, 7, 11], description="Periods of the multi-period discriminators."
    )

    @model_validator(mode="before")
    @classmethod
    def _default_activation(cls, data: Any) -> Any:
        if isinstance(data, dict) and not data.get("activation_function"):
            data["activation_function"] = (
                "everyvoice_tpu.utils.original_hifigan_leaky_relu"
            )
        return data


class HiFiGANTrainingConfig(BaseTrainingConfig):
    generator_warmup_steps: int = Field(
        0, description="Steps to train the generator alone before the GAN starts."
    )
    gan_type: HiFiGANTrainTypes = Field(
        HiFiGANTrainTypes.original, description="original (LSGAN) or wgan objective."
    )
    optimizer: Union[AdamOptimizer, AdamWOptimizer, RMSOptimizer] = Field(
        default_factory=AdamWOptimizer, description="Optimizer for both networks."
    )
    wgan_clip_value: float = Field(
        0.01, description="Weight clipping for the wgan objective."
    )
    use_weighted_sampler: bool = Field(False)
    finetune: bool = Field(
        False,
        description="Finetune on teacher-forced mels from `synthesized_spec/` "
        "for vocoder matching.",
    )


class HiFiGANConfig(PartialLoadConfig):
    PARTIAL_KEYS: ClassVar[tuple] = ("model", "training", "preprocessing")

    contact: ContactInformation = Field(
        description="Contact information for the model maintainer."
    )
    VERSION: str = Field("1.0")
    model: HiFiGANModelConfig = Field(
        default_factory=HiFiGANModelConfig, description="Model architecture."
    )
    path_to_model_config_file: Optional[Path] = None
    training: HiFiGANTrainingConfig = Field(
        default_factory=HiFiGANTrainingConfig, description="Training settings."
    )
    path_to_training_config_file: Optional[Path] = None
    preprocessing: PreprocessingConfig = Field(
        default_factory=PreprocessingConfig, description="Preprocessing settings."
    )
    path_to_preprocessing_config_file: Optional[Path] = None

    @model_validator(mode="before")
    @classmethod
    def _contact_required(cls, data: Any) -> Any:
        if isinstance(data, dict) and "contact" not in data:
            raise ValueError(
                "EveryVoice models require contact information; please add a "
                "'contact' section (contact_name, contact_email)."
            )
        return data

    @model_validator(mode="after")
    def _upsamples_match_hop(self):
        import math

        product = math.prod(self.model.upsample_rates)
        hop = self.preprocessing.audio.fft_hop_size
        if self.model.istft_layer:
            # The iSTFT head supplies the remaining factor (its hop size).
            if hop % product != 0:
                raise ValueError(
                    f"With istft_layer, prod(upsample_rates)={product} must "
                    f"divide fft_hop_size={hop}."
                )
        elif product != hop:
            raise ValueError(
                f"prod(upsample_rates)={product} must equal fft_hop_size={hop}."
            )
        return self


# The reference exposes this same config under the vocoder wrapper
# (everyvoice/model/vocoder/config.py:1-3).
VocoderConfig = HiFiGANConfig
