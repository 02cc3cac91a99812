"""Text helper functions: normalization, symbol sorting, grapheme/phone
guessing (parity: everyvoice/text/utils.py)."""

from __future__ import annotations

import re
from typing import Optional

import regex

from everyvoice_tpu.exceptions import ConfigError


def symbol_sorter(
    symbols_for_sorting: list,
    hardcoded_initial_symbols: Optional[list] = None,
    hardcoded_final_symbols: Optional[list] = None,
) -> list:
    """Deterministic symbol ordering: longest first, then lexicographic, with
    hardcoded pad/space pinned at the front (reference text/utils.py:38-51).

    >>> symbol_sorter(['a', 'bb', 'c'], ['\\x80', ' '])
    ['\\x80', ' ', 'bb', 'a', 'c']
    """
    initial = hardcoded_initial_symbols or []
    final = hardcoded_final_symbols or []
    return (
        initial
        + sorted(symbols_for_sorting, key=lambda s: (-len(s), s))
        + final
    )


def get_symbols_from_checkpoint_symbol_dict(symbols: dict) -> list:
    """Flatten a checkpoint's serialized Symbols dict into a symbol list."""
    punctuation = list(symbols.get("punctuation", {}).values())
    other = [v for k, v in symbols.items() if k != "punctuation"]
    return [item for sublist in punctuation + other for item in sublist]


def apply_to_replace_helper(text: str, to_replace: dict) -> str:
    for pattern, replacement in to_replace.items():
        text = re.sub(pattern, replacement, text)
    return text


def apply_cleaners_helper(text: str, cleaners: list) -> str:
    for cleaner_fn in cleaners:
        try:
            text = cleaner_fn(text)
        except Exception as e:
            raise ConfigError(f"Cleaner did not work and threw exception {e}") from e
    return text


def normalize_text_helper(
    text: str,
    to_replace: dict,
    cleaners: list,
    apply_replace_rules: bool = True,
    apply_cleaners: bool = True,
) -> str:
    """Replace rules first, then cleaner functions
    (reference text/utils.py:53-77)."""
    if apply_replace_rules:
        text = apply_to_replace_helper(text, to_replace)
    if apply_cleaners:
        text = apply_cleaners_helper(text, cleaners)
    return text


def guess_graphemes_in_text(text: str) -> set:
    """Split text into Unicode extended grapheme clusters (uses the regex
    module's \\X, replacing the `grapheme` dependency).

    >>> sorted(guess_graphemes_in_text('g\\u0331an'))
    ['a', 'g̱', 'n']
    """
    return set(regex.findall(r"\X", text))


def guess_graphemes_in_text_lines(text_lines: list) -> set:
    """
    >>> example_data = [" කෝකටත් මං වෙනදා ", " ඇන්ජලීනා ජොලී කියන්නේ "]
    >>> sorted(guess_graphemes_in_text_lines(example_data))
    [' ', 'ඇ', 'ක', 'කි', 'කෝ', 'ජ', 'ජො', 'ට', 'ත්', 'දා', 'න', 'න්', 'නා', 'නේ', 'මං', 'ය', 'ලී', 'වෙ']
    """
    graphemes: set = set()
    for line in text_lines:
        graphemes.update(guess_graphemes_in_text(line))
    return graphemes


def guess_ipa_phones_in_text(text: str) -> set:
    """Extract plausible IPA phones from text, discarding anything that is
    not valid IPA (replaces the `ipatok` dependency).

    >>> sorted(guess_ipa_phones_in_text('ʃin1[}!]'))
    ['i', 'n', 'ʃ']
    """
    from everyvoice_tpu.text.ipa import tokenize_ipa

    return set(tokenize_ipa(text, unknown=False))


def guess_ipa_phones_in_text_lines(text_lines: list) -> set:
    phones: set = set()
    for line in text_lines:
        phones.update(guess_ipa_phones_in_text(line))
    return phones


def is_sentence_final(char: str) -> bool:
    """True if Unicode classifies the character as sentence-terminal.

    >>> is_sentence_final('!')
    True
    >>> is_sentence_final('¡')
    False
    """
    if len(char) != 1:
        raise ValueError("Input must be a character (string of length one).")
    return bool(regex.match(r"\p{Sentence_Break=ST}|\p{Sentence_Break=AT}", char))
