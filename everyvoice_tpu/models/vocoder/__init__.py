"""Vocoder wrapper (parity: everyvoice/model/vocoder/config.py:1-3)."""

from everyvoice_tpu.models.hifigan.config import (  # noqa: F401
    HiFiGANConfig,
    VocoderConfig,
)
from everyvoice_tpu.models.hifigan.model import (  # noqa: F401
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
