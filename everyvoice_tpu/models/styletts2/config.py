"""StyleTTS2 configuration (parity: the styletts2 submodule's config classes
as published in everyvoice/.schema/everyvoice-text-to-wav-0.5.json)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, ClassVar, Dict, List, Optional

from pydantic import Field, model_validator

from everyvoice_tpu.config.preprocessing_config import PreprocessingConfig
from everyvoice_tpu.config.shared_types import (
    BaseTrainingConfig,
    ConfigModel,
    ContactInformation,
    PartialLoadConfig,
)
from everyvoice_tpu.config.text_config import TextConfig
from everyvoice_tpu.config.type_definitions import (
    DatasetTextRepresentation,
    TargetTrainingTextRepresentationLevel,
)
from everyvoice_tpu.config.utils import PossiblySerializedCallable
from everyvoice_tpu.models.hifigan.config import HiFiGANResblock


class StyleTTS2DecoderConfig(ConfigModel):
    """iSTFT-HiFiGAN decoder (the schema's StyleTTS2DecoderConfig)."""

    resblock: HiFiGANResblock = HiFiGANResblock.one
    upsample_rates: List[int] = Field([8, 8])
    upsample_kernel_sizes: List[int] = Field([16, 16])
    upsample_initial_channel: int = Field(512)
    resblock_kernel_sizes: List[int] = Field([3, 7, 11])
    resblock_dilation_sizes: List[List[int]] = Field(
        [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    )
    activation_function: PossiblySerializedCallable = Field(None)
    istft_layer: bool = Field(True)
    msd_layers: int = Field(3)
    mpd_layers: List[int] = Field([2, 3, 5, 7, 11])
    gen_istft_n_fft: int = Field(16)
    gen_istft_hop_size: int = Field(4)

    @model_validator(mode="before")
    @classmethod
    def _default_activation(cls, data: Any) -> Any:
        if isinstance(data, dict) and not data.get("activation_function"):
            data["activation_function"] = (
                "everyvoice_tpu.utils.original_hifigan_leaky_relu"
            )
        return data


class StyleTTS2SLMConfig(ConfigModel):
    """Speech-language-model discriminator (WavLM) settings."""

    model: str = Field("microsoft/wavlm-base-plus")
    sr: int = Field(16000)
    hidden: int = Field(768)
    nlayers: int = Field(13)
    initial_channel: int = Field(64)


class StyleTTS2DiffusionTransformerConfig(ConfigModel):
    num_layers: int = Field(3)
    num_heads: int = Field(8)
    head_features: int = Field(64)
    multiplier: int = Field(2)


class StyleTTS2DiffusionDistConfig(ConfigModel):
    sigma_data: float = Field(0.2)
    estimate_sigma_data: bool = Field(True)
    mean: float = Field(-3.0)
    std: float = Field(1.0)


class StyleTTS2DiffusionConfig(ConfigModel):
    embedding_mask_proba: float = Field(0.1)
    transformer: StyleTTS2DiffusionTransformerConfig = Field(
        default_factory=StyleTTS2DiffusionTransformerConfig
    )
    dist: StyleTTS2DiffusionDistConfig = Field(
        default_factory=StyleTTS2DiffusionDistConfig
    )


class StyleTTS2ModelConfig(ConfigModel):
    multispeaker: bool = Field(False)
    multilingual: bool = Field(False)
    language_embedding_dim: int = Field(64)
    target_text_representation_level: TargetTrainingTextRepresentationLevel = Field(
        TargetTrainingTextRepresentationLevel.characters
    )
    dim_in: int = Field(64)
    hidden_dim: int = Field(512)
    max_conv_dim: int = Field(512)
    n_layer: int = Field(3)
    max_dur: int = Field(50)
    style_dim: int = Field(128)
    dropout: float = Field(0.2)
    decoder: StyleTTS2DecoderConfig = Field(default_factory=StyleTTS2DecoderConfig)
    slm: StyleTTS2SLMConfig = Field(default_factory=StyleTTS2SLMConfig)
    diffusion: StyleTTS2DiffusionConfig = Field(
        default_factory=StyleTTS2DiffusionConfig
    )


class StyleTTS2OptimizerConfig(ConfigModel):
    lr: float = Field(1e-4)
    bert_lr: float = Field(1e-5)
    ft_lr: float = Field(1e-5)


class StyleTTS2LossConfig(ConfigModel):
    lambda_mel: float = Field(5.0)
    lambda_gen: float = Field(1.0)
    lambda_slm: float = Field(1.0)
    lambda_mono: float = Field(1.0)
    lambda_s2s: float = Field(1.0)
    tma_epoch: int = Field(50)
    lambda_f0: float = Field(1.0)
    lambda_norm: float = Field(1.0)
    lambda_dur: float = Field(1.0)
    lambda_ce: float = Field(20.0)
    lambda_sty: float = Field(1.0)
    lambda_diff: float = Field(1.0)
    diff_epoch: int = Field(20)
    joint_epoch: int = Field(50)


class StyleTTS2SLMAdvConfig(ConfigModel):
    min_len: int = Field(100)
    max_len: int = Field(500)
    batch_percentage: float = Field(0.5)
    iter: int = Field(10)
    thresh: float = Field(5.0)
    scale: float = Field(0.01)
    sig: float = Field(1.5)


class OODDataHFSource(ConfigModel):
    repo_id: Optional[str] = Field(None)
    filename: str = Field("ood.txt")
    revision: Optional[str] = Field(None)


class OODDataSource(ConfigModel):
    local_path: Optional[Path] = Field(None)
    hf: Optional[OODDataHFSource] = Field(None)
    text_representation: DatasetTextRepresentation = Field(
        DatasetTextRepresentation.characters
    )


class StyleTTS2TrainingConfig(BaseTrainingConfig):
    batch_size: int = Field(2)
    save_top_k_ckpts: int = Field(1)
    epochs_1st: int = Field(200, description="Epochs for stage-1 training.")
    epochs_2nd: int = Field(100, description="Epochs for stage-2 training.")
    max_len: int = Field(800)
    decoder_segment_frames: Optional[int] = Field(
        320,
        description="Train the waveform decoder + MPD/MSD discriminators + "
        "mel/adversarial/SLM losses on a random mel-frame segment of this "
        "length per utterance instead of the full padded utterance — the "
        "published StyleTTS2 recipe trains its GAN losses on random clips, "
        "and the waveform-scale work dominates the step "
        "(tools/styletts2_component_times.py). Duration/F0/energy/TMA "
        "losses always see the full utterance. None trains on full length.",
    )
    first_stage_path: Path = Field(
        Path("checkpoints/stage-1-last.ckpt"),
        description="Stage-1 checkpoint picked up by stage 2.",
    )
    second_stage_load_pretrained: bool = Field(True)
    load_only_params: bool = Field(False)
    root_path: Path = Field(Path("."))
    ood_raw_data: Dict[str, OODDataSource] = Field({})
    use_validation_as_ood: bool = Field(False)
    OOD_min_length: int = Field(50)
    optimizer: StyleTTS2OptimizerConfig = Field(
        default_factory=StyleTTS2OptimizerConfig
    )
    losses: StyleTTS2LossConfig = Field(default_factory=StyleTTS2LossConfig)
    slmadv: StyleTTS2SLMAdvConfig = Field(default_factory=StyleTTS2SLMAdvConfig)


class StyleTTS2JDCConfig(ConfigModel):
    repo_id: str = Field("everyvoice/styletts2-jdc-f0")
    filename: str = Field("bst.t7")
    local_path: Optional[Path] = Field(None)


class StyleTTS2ASRConfig(ConfigModel):
    repo_id: str = Field("everyvoice/styletts2-asr-aligner")
    checkpoint_filename: str = Field("epoch_00080.pth")
    config_filename: str = Field("config.yml")
    local_checkpoint: Optional[Path] = Field(None)
    local_config: Optional[Path] = Field(None)


class StyleTTS2PLBERTConfig(ConfigModel):
    repo_id: str = Field("papercup-ai/multilingual-pl-bert")
    checkpoint_filename: str = Field("step_1100000.t7")
    config_filename: str = Field("config.yml")
    local_checkpoint: Optional[Path] = Field(None)
    local_config: Optional[Path] = Field(None)


# The frozen symbol table the published StyleTTS2 pretrained components
# (multilingual PL-BERT text encoder, ASR aligner) were trained with —
# pad + punctuation + basic Latin + IPA, 178 rows; the index of a symbol is
# its embedding-table row. A data table like text/arpabet.py: it is the
# published checkpoints' contract (reference check_group.py:299-439 maps
# user symbols into it; `check pretrained-symbols` suggests substitutions).
PRETRAINED_SYMBOL_TABLE: List[str] = (
    ["$"]
    + list(';:,.!?¡¿—…"«»“” ')
    + list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
    + list(
        "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧ"
        "ʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"
    )
)


class StyleTTS2PretrainedConfig(ConfigModel):
    f0: StyleTTS2JDCConfig = Field(default_factory=StyleTTS2JDCConfig)
    asr: StyleTTS2ASRConfig = Field(default_factory=StyleTTS2ASRConfig)
    plbert: StyleTTS2PLBERTConfig = Field(default_factory=StyleTTS2PLBERTConfig)
    pretrained_symbols: List[str] = Field(
        default_factory=lambda: list(PRETRAINED_SYMBOL_TABLE),
        description="The frozen text symbol table the pretrained components "
        "were trained with; user symbols must map into it "
        "(reference base_cli/check_group.py:299-439).",
    )


class StyleTTS2Config(PartialLoadConfig):
    PARTIAL_KEYS: ClassVar[tuple] = (
        "model", "training", "preprocessing", "text",
    )

    contact: ContactInformation
    VERSION: str = Field("1.0")
    model: StyleTTS2ModelConfig = Field(default_factory=StyleTTS2ModelConfig)
    path_to_model_config_file: Optional[Path] = None
    training: StyleTTS2TrainingConfig = Field(
        default_factory=StyleTTS2TrainingConfig
    )
    path_to_training_config_file: Optional[Path] = None
    preprocessing: PreprocessingConfig = Field(default_factory=PreprocessingConfig)
    path_to_preprocessing_config_file: Optional[Path] = None
    text: TextConfig = Field(default_factory=TextConfig)
    path_to_text_config_file: Optional[Path] = None
    pretrained: StyleTTS2PretrainedConfig = Field(
        default_factory=StyleTTS2PretrainedConfig
    )

    @model_validator(mode="before")
    @classmethod
    def _contact_required(cls, data: Any) -> Any:
        if isinstance(data, dict) and "contact" not in data:
            raise ValueError(
                "EveryVoice models require contact information; please add a "
                "'contact' section (contact_name, contact_email)."
            )
        return data


# The reference exposes this under the e2e wrapper
# (everyvoice/model/e2e/config.py:1-9).
E2EConfig = StyleTTS2Config
