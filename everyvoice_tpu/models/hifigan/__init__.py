from everyvoice_tpu.models.hifigan.config import (  # noqa: F401
    HiFiGANConfig,
    HiFiGANModelConfig,
    HiFiGANTrainingConfig,
    HiFiGANTrainTypes,
    VocoderConfig,
)
from everyvoice_tpu.models.hifigan.model import (  # noqa: F401
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
