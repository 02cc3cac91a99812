"""Deliberately valid and invalid custom G2P plugins for tests
(model: reference everyvoice/tests/g2p_engines/__init__.py)."""

from typing import List


def valid_g2p(text: str) -> List[str]:
    return list(text)


def wrong_sig_g2p(text):  # no annotations → must be rejected
    return list(text)
