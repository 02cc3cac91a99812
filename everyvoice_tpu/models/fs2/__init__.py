from everyvoice_tpu.models.fs2.config import (  # noqa: F401
    ConformerConfig,
    FastSpeech2Config,
    FastSpeech2ModelConfig,
    FastSpeech2TrainingConfig,
    FeaturePredictionConfig,
    VarianceLevelEnum,
    VarianceLossEnum,
    VariancePredictorConfig,
    VariancePredictors,
)
from everyvoice_tpu.models.fs2.model import FastSpeech2  # noqa: F401
