"""Configuration system: pydantic models matching the reference's published
JSON schema family (everyvoice/.schema/*-0.5.json)."""

from everyvoice_tpu.config.preprocessing_config import (  # noqa: F401
    AudioConfig,
    AudioSpecTypeEnum,
    Dataset,
    PreprocessingConfig,
)
from everyvoice_tpu.config.shared_types import (  # noqa: F401
    AdamOptimizer,
    AdamWOptimizer,
    BaseTrainingConfig,
    ConfigModel,
    ContactInformation,
    LoggerConfig,
    NoamOptimizer,
    PartialLoadConfig,
    RMSOptimizer,
    combine_configs,
    init_context,
)
from everyvoice_tpu.config.text_config import (  # noqa: F401
    Punctuation,
    Symbols,
    TextConfig,
)
