"""Feature-prediction wrapper (parity: everyvoice/model/feature_prediction/
config.py:1-7 re-exports the fs2 config under a model-agnostic name)."""

from everyvoice_tpu.models.fs2.config import (  # noqa: F401
    FastSpeech2Config,
    FeaturePredictionConfig,
)
from everyvoice_tpu.models.fs2.model import FastSpeech2  # noqa: F401
