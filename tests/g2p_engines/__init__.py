"""Deliberately valid and invalid custom G2P plugins for tests
(model: reference everyvoice/tests/g2p_engines/__init__.py)."""

from typing import List


def valid_g2p(text: str) -> List[str]:
    return list(text)


def wrong_sig_g2p(text):  # no annotations → must be rejected
    return list(text)


def multiple_arguments(text: str, lang: str) -> List[str]:
    return list(text)


def not_a_string(number: int) -> List[str]:
    return [str(number)]


def not_a_list(text: str) -> str:
    return text
