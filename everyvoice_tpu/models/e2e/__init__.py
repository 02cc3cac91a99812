"""End-to-end (text→wav) wrapper (parity: everyvoice/model/e2e/config.py:1-9)."""

from everyvoice_tpu.models.styletts2.config import (  # noqa: F401
    E2EConfig,
    StyleTTS2Config,
)
