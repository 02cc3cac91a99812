"""Lazy logging facade (parity: everyvoice/logger.py:8-54).

The reference wraps loguru behind a lazy import so CLI startup stays fast.
We use stdlib logging with the same discipline: nothing heavy is imported
at module import time and the logger is configured once, on first use.
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "everyvoice_tpu"
_configured = False


def _configure() -> logging.Logger:
    global _configured
    log = logging.getLogger(_LOGGER_NAME)
    if not _configured:
        level = os.environ.get("EVERYVOICE_LOG_LEVEL", "INFO").upper()
        log.setLevel(level)
        if not log.handlers:
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(
                logging.Formatter(
                    "%(asctime)s | %(levelname)-7s | %(name)s:%(funcName)s - %(message)s",
                    datefmt="%Y-%m-%d %H:%M:%S",
                )
            )
            log.addHandler(handler)
        log.propagate = False
        _configured = True
    return log


class _LazyLogger:
    """Defers configuration until the first logging call."""

    def add_file_sink(self, path) -> None:
        log = _configure()
        handler = logging.FileHandler(path, encoding="utf8")
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)-7s | %(message)s",
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        log.addHandler(handler)

    def __getattr__(self, name: str):
        return getattr(_configure(), name)


logger = _LazyLogger()
