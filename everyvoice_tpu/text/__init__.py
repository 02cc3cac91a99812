"""Text frontend: normalization, tokenization, G2P, phonological features."""

from everyvoice_tpu.text.text_processor import (  # noqa: F401
    CHARACTER_JOINER,
    JOINER_SUBSTITUTION,
    PAD_SYMBOL,
    TextProcessor,
)
