"""Text processing pipeline: normalization → tokenization → (G2P) → encoding
(parity: everyvoice/text/text_processor.py:25-513).

The ID layout contract matches the reference: the pad symbol ``\\x80`` is
always ID 0 and space is ID 1; the remaining declared symbols (including the
internal punctuation tokens and raw punctuation characters) are sorted
longest-first then lexicographically.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Optional, Union

import numpy as np
import numpy.typing as npt

from everyvoice_tpu.config.text_config import TextConfig
from everyvoice_tpu.config.type_definitions import TargetTrainingTextRepresentationLevel
from everyvoice_tpu.exceptions import OutOfVocabularySymbolError
from everyvoice_tpu.logger import logger
from everyvoice_tpu.text.features import (
    DEFAULT_PUNCTUATION_HASH,
    PhonologicalFeatureCalculator,
)
from everyvoice_tpu.text.phonemizer import AVAILABLE_G2P_ENGINES, get_g2p_engine
from everyvoice_tpu.text.utils import normalize_text_helper, symbol_sorter

PAD_SYMBOL = "\x80"
CHARACTER_JOINER = "/"
JOINER_SUBSTITUTION = "<SLASH>"


class TextProcessor:
    """Normalizes, tokenizes, optionally G2Ps, and encodes text.

    >>> from everyvoice_tpu.utils import collapse_whitespace, lower, nfc_normalize
    >>> from string import ascii_lowercase
    >>> tp = TextProcessor(TextConfig(cleaners=[collapse_whitespace, lower, nfc_normalize], symbols={'ascii': list(ascii_lowercase)}))
    >>> tp.normalize_text('HELLO\\u0301O!')
    'hellóo!'
    >>> tp.apply_tokenization('hellóo!')[:3]
    ['h', 'e', 'l']
    >>> ids = tp.encode_text('hello!')
    >>> tp.decode_tokens(ids)
    'h/e/l/l/o/!'
    """

    def __init__(
        self,
        config: TextConfig,
        punctuation_hash: dict = DEFAULT_PUNCTUATION_HASH,
        target_text_representation_level: Optional[
            TargetTrainingTextRepresentationLevel
        ] = None,
    ):
        self.config = config
        self.target_text_representation_level = target_text_representation_level
        self.phonological_feature_calculator: Optional[
            PhonologicalFeatureCalculator
        ] = None
        self._pad_symbol = PAD_SYMBOL

        self.punctuation_internal_hash = punctuation_hash
        self.punctuation_to_internal_id = {
            symbol: punctuation_hash[punctuation_type]
            for punctuation_type, symbols in iter(self.config.symbols.punctuation)
            for symbol in symbols
        }
        self.punctuation_characters = list(self.punctuation_to_internal_id.keys())
        assert (
            set(self.punctuation_characters) == self.config.symbols.punctuation.all
        )

        # The ID table always covers the FULL declared inventory, matching
        # the reference (its TextProcessor has no level parameter): training
        # datasets and inference-time loaders must agree on symbol IDs even
        # when a config declares both <label>_characters and <label>_phones.
        # target_text_representation_level only affects encode-time choices.
        symbols = self.config.symbols.all_except_punctuation
        symbols |= set(self.punctuation_internal_hash.values())
        symbols |= self.config.symbols.punctuation.all
        hardcoded_initial_symbols = [self._pad_symbol, " "]
        self.symbols = symbol_sorter(
            list(symbols - set(hardcoded_initial_symbols)),
            hardcoded_initial_symbols=hardcoded_initial_symbols,
        )
        self.missing_symbols: Counter = Counter()

        self._symbol_to_id = {s: i for i, s in enumerate(self.symbols)}
        self._id_to_symbol = {i: s for i, s in enumerate(self.symbols)}

        # Longest-symbol-first alternation gives greedy longest-match
        # tokenization over the declared inventory.
        vocabulary_pattern = "|".join(
            re.escape(x) for x in self.symbols + self.punctuation_characters
        )
        self._tokenizer = re.compile(vocabulary_pattern)
        # The complement pattern finds runs of characters NOT matching any
        # declared symbol (the reference's gaps=True tokenizer).
        self._missing_finder = re.compile(f"(?:{vocabulary_pattern})+")

    # ------------------------------------------------------------------
    def get_missing_symbols(
        self, normalized_text: str, quiet: bool = False
    ) -> list:
        """Return runs of undeclared symbols in already-normalized text.

        >>> tp = TextProcessor(TextConfig())
        >>> tp.get_missing_symbols(' ç -- &', quiet=True)
        ['ç', '&']
        """
        missing = [
            gap for gap in self._missing_finder.split(normalized_text) if gap
        ]
        for symbol in missing:
            if not quiet:
                logger.warning(
                    f"Dropping '{symbol}' from '{normalized_text}': it is "
                    "missing from the symbol inventory in your text config."
                )
            self.missing_symbols[symbol] += 1
        return missing

    def apply_punctuation_rules(self, tokenized_text: list) -> list:
        """Normalize punctuation tokens to internal class tokens.

        >>> tp = TextProcessor(TextConfig())
        >>> tp.apply_punctuation_rules(['h', 'e', 'l', 'l', 'o', '.'])
        ['h', 'e', 'l', 'l', 'o', '<PERIOD>']
        """
        return [self.punctuation_to_internal_id.get(t, t) for t in tokenized_text]

    def normalize_text(
        self,
        text: str,
        apply_replace_rules: bool = True,
        apply_cleaners: bool = True,
        dataset_label: Optional[str] = None,
        lang_id: Optional[str] = None,
    ) -> str:
        return normalize_text_helper(
            text,
            self.config.get_to_replace(dataset_label=dataset_label, lang_id=lang_id),
            self.config.get_cleaners(dataset_label=dataset_label, lang_id=lang_id),
            apply_cleaners=apply_cleaners,
            apply_replace_rules=apply_replace_rules,
        )

    def calculate_phonological_features(
        self, phone_tokens: list, apply_punctuation_rules: bool = True
    ) -> npt.NDArray[np.float32]:
        calculator = self.phonological_feature_calculator
        if calculator is None:
            calculator = PhonologicalFeatureCalculator(
                text_config=self.config,
                punctuation_hash=self.punctuation_internal_hash,
            )
            self.phonological_feature_calculator = calculator
        tokens = (
            self.apply_punctuation_rules(phone_tokens)
            if apply_punctuation_rules else phone_tokens
        )
        return calculator.get_features(tokens)

    def _run_g2p(self, normalized_text: str, lang_id: str) -> list:
        """Run the registered engine, insisting on a token-list result."""
        tokens = None
        try:
            tokens = get_g2p_engine(lang_id)(normalized_text)
        except Exception:
            pass
        assert isinstance(tokens, list), (
            f"The g2p engine for {lang_id} produced {type(tokens)} but must "
            "produce a list of tokenized phones."
        )
        return tokens

    def apply_g2p_and_tokenization(
        self,
        normalized_text: str,
        lang_id: str,
        find_missing: bool = True,
        quiet: bool = False,
    ) -> list:
        """G2P then validate against the inventory.

        >>> from everyvoice_tpu.config.text_config import Symbols
        >>> tp = TextProcessor(TextConfig(symbols=Symbols(ipa=['a', 'h', 'ʌ', 'l', 'o', 'ʊ'])))
        >>> tp.apply_g2p_and_tokenization('hello', 'eng')
        ['h', 'ʌ', 'l', 'o', 'ʊ']
        """
        known = self._symbol_to_id.keys() | set(self.punctuation_characters)
        kept = []
        for token in self._run_g2p(normalized_text, lang_id):
            if token in known:
                kept.append(token)
                continue
            self.missing_symbols[token] += 1
            if find_missing and not quiet:
                logger.warning(
                    f"Dropping '{token}' from '{normalized_text}': it is "
                    "missing from the symbol inventory in your text config."
                )
        return kept

    def apply_tokenization(
        self, normalized_text: str, quiet: bool = False, find_missing: bool = True
    ) -> list:
        """Greedy longest-match tokenization over the declared inventory.

        >>> tp = TextProcessor(TextConfig())
        >>> tp.apply_tokenization('\\x80\\x80 &', quiet=True)
        ['\\x80', '\\x80', ' ']
        >>> tp.missing_symbols['&']
        1
        """
        if find_missing:
            self.get_missing_symbols(normalized_text, quiet=quiet)
        return self._tokenizer.findall(normalized_text)

    def tokens_for(
        self,
        text: str,
        *,
        lang_id: Optional[str] = None,
        apply_g2p: bool = False,
        normalize: bool = True,
        normalize_punctuation: bool = False,
        quiet: bool = False,
        find_missing: bool = True,
        dataset_label: Optional[str] = None,
    ) -> list:
        """Validated token sequence for `text`: normalization, then either
        G2P (when an engine is requested) or inventory tokenization, then
        optional punctuation-class internalization. This is the shared
        front half of `encode_text`, also usable on its own when string
        tokens (not IDs) are wanted."""
        if normalize:
            text = self.normalize_text(
                text, dataset_label=dataset_label, lang_id=lang_id
            )
        if apply_g2p and lang_id is not None:
            tokens = self.apply_g2p_and_tokenization(
                text, lang_id, quiet=quiet, find_missing=find_missing
            )
        else:
            tokens = self.apply_tokenization(
                text, quiet=quiet, find_missing=find_missing
            )
        return self.apply_punctuation_rules(tokens) if normalize_punctuation else tokens

    def encode_text(
        self,
        text: str,
        normalize_text: bool = True,
        apply_g2p: bool = False,
        normalize_punctuation: bool = False,
        encode_as_phonological_features: bool = False,
        lang_id: Optional[str] = None,
        quiet: bool = False,
        find_missing: bool = True,
        dataset_label: Optional[str] = None,
    ) -> Union[list, npt.NDArray[np.float32]]:
        """One-call pipeline: normalize → (G2P|tokenize) → encode.

        >>> from everyvoice_tpu.config.text_config import Symbols
        >>> tp = TextProcessor(TextConfig(symbols=Symbols(ipa=['a', 'h', 'ʌ', 'l', 'o', 'ʊ'])))
        >>> ids = tp.encode_text('hello', apply_g2p=True, lang_id='eng', quiet=True)
        >>> tp.decode_tokens(ids, join_character=None)
        ['h', 'ʌ', 'l', 'o', 'ʊ']
        """
        if encode_as_phonological_features and not apply_g2p:
            raise ValueError(
                "Phonological-feature encoding needs phone tokens, which only "
                "exist after G2P runs — pass apply_g2p=True together with "
                "encode_as_phonological_features=True."
            )
        if apply_g2p and (lang_id is None or lang_id not in AVAILABLE_G2P_ENGINES):
            raise ValueError(
                f"No G2P engine is registered for language '{lang_id}', so "
                "apply_g2p cannot run. Register one in your text config's "
                "g2p_engines map or pick a supported language."
            )
        tokens = self.tokens_for(
            text,
            lang_id=lang_id,
            apply_g2p=apply_g2p,
            normalize=normalize_text,
            normalize_punctuation=normalize_punctuation,
            quiet=quiet,
            find_missing=find_missing,
            dataset_label=dataset_label,
        )
        if encode_as_phonological_features:
            return self.calculate_phonological_features(
                tokens, apply_punctuation_rules=False
            )
        return self.encode_string_tokens(tokens)

    # ------------------------------------------------------------------
    def token_sequence_to_text_sequence(self, sequence: list) -> list:
        """
        >>> tp = TextProcessor(TextConfig())
        >>> tp.token_sequence_to_text_sequence([0, 0])
        ['\\x80', '\\x80']
        """
        return [self._id_to_symbol[i] for i in sequence]

    def encode_string_tokens(self, sequence: list) -> list:
        """Encode known string tokens; raise on out-of-vocabulary items."""
        encoded = []
        for token in sequence:
            try:
                encoded.append(self._symbol_to_id[token])
            except KeyError as e:
                raise OutOfVocabularySymbolError(
                    f"Sequence {sequence} contains item '{token}'"
                ) from e
        return encoded

    def encode_escaped_string_sequence(
        self,
        string_of_tokens: str,
        split_character: str = CHARACTER_JOINER,
        joiner_substitution: str = JOINER_SUBSTITUTION,
    ) -> list:
        assert len(split_character) >= 1, (
            "An escaped string sequence must have a character to split on "
            "(default is '/')"
        )
        return self.encode_string_tokens(
            [
                token
                for token in self.split_tokens(
                    string_of_tokens, split_character, joiner_substitution
                )
                if token
            ]
        )

    def decode_tokens(
        self,
        sequence: list,
        join_character: Optional[str] = CHARACTER_JOINER,
        joiner_substitution: Optional[str] = JOINER_SUBSTITUTION,
    ) -> Union[str, list]:
        """Decode IDs back to a '/'-joined string (or a token list when
        join_character is None)."""
        symbols = self.token_sequence_to_text_sequence(sequence)
        if join_character is None:
            return symbols
        assert joiner_substitution is not None
        escaped = (s.replace(join_character, joiner_substitution) for s in symbols)
        return join_character.join(escaped)

    def split_tokens(
        self,
        joined_sequence: str,
        join_character: str = CHARACTER_JOINER,
        joiner_substitution: str = JOINER_SUBSTITUTION,
    ) -> list:
        """Inverse of decode_tokens' joining."""
        return [
            piece.replace(joiner_substitution, join_character)
            for piece in joined_sequence.split(join_character)
        ]
