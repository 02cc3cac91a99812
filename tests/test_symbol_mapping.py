"""Symbol-mapping tests (model: reference tests/test_symbol_mapping.py)."""

import pytest

from everyvoice_tpu.text.utils_heavy import (
    find_optimal_mapping,
    styletts2_symbol_distance,
    suggest_symbol_mapping,
)


class TestDistance:
    def test_identical_is_zero(self):
        assert styletts2_symbol_distance("p", "p") == 0.0

    def test_prefers_phonetically_similar_ipa(self):
        assert styletts2_symbol_distance("p", "b") < styletts2_symbol_distance(
            "p", "a"
        )

    def test_non_ipa_graphemes_not_degenerate(self):
        # Feature vectors are undefined for non-IPA symbols; the edit
        # distance / unicode fallbacks must still discriminate.
        assert styletts2_symbol_distance("1", "2") != styletts2_symbol_distance(
            "1", "22"
        )
        assert styletts2_symbol_distance("1", "2") < styletts2_symbol_distance(
            "1", "4"
        )


class TestOptimalMapping:
    def test_minimizes_total_distance(self):
        mapping = find_optimal_mapping(["1", "8"], ["0", "5", "9"])
        assert mapping == {"1": "0", "8": "9"}

    def test_excess_user_symbols_rejected(self):
        with pytest.raises(ValueError, match="onto only"):
            find_optimal_mapping(["1", "5", "9"], ["0"])


class TestSuggestions:
    def test_exact_matches_need_no_suggestion(self):
        assert suggest_symbol_mapping(["p", "a"], ["p", "a", "b"]) == {}

    def test_oov_maps_to_closest_pretrained(self):
        assert suggest_symbol_mapping(["p", "ʒ"], ["p", "ʃ"]) == {"ʒ": "ʃ"}

    def test_one_to_one(self):
        # Distinct OOV symbols must never share a target — that would
        # collapse them into the same frozen pretrained embedding.
        result = suggest_symbol_mapping(["ʒ", "d͡ʒ"], ["p", "ʃ"])
        targets = list(result.values())
        assert len(targets) == len(set(targets))

    def test_unmapped_when_out_of_slots(self):
        result = suggest_symbol_mapping(["ʒ", "d͡ʒ", "t͡ʃ"], ["p", "ʃ"])
        assert len(result) <= 2  # only two free targets exist

    def test_digits_never_suggested(self):
        # Digits are unexpanded numbers needing text normalization, not
        # graphemes with a sensible pretrained stand-in.
        assert suggest_symbol_mapping(["5"], ["4", "6"]) == {}

    def test_reserved_targets_never_handed_out(self):
        assert suggest_symbol_mapping(["ʒ"], ["ʃ"], reserved_targets=["ʃ"]) == {}

    def test_own_component_never_suggested(self):
        # 'k' and 'ʷ' are literal substrings of 'k̟ʷ': mapping onto either
        # would make it indistinguishable from symbols built from the same
        # pieces.
        assert suggest_symbol_mapping(["k̟ʷ"], ["k", "ʷ", "q"]) == {"k̟ʷ": "q"}


class TestClassDistances:
    def test_cross_class_farther_than_same_class(self):
        # Letter vs digit must rank farther than letter vs letter-of-other-
        # case (the major-class penalty).
        assert styletts2_symbol_distance("a", "1") > styletts2_symbol_distance(
            "a", "A"
        )
