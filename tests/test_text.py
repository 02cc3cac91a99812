"""Text frontend tests (model: reference everyvoice/tests/test_text.py)."""

import numpy as np
import pytest

from everyvoice_tpu.config import TextConfig
from everyvoice_tpu.config.text_config import Symbols
from everyvoice_tpu.exceptions import OutOfVocabularySymbolError
from everyvoice_tpu.text import PAD_SYMBOL, TextProcessor
from everyvoice_tpu.text.arpabet import arpabet_to_ipa
from everyvoice_tpu.text.features import (
    N_PHONOLOGICAL_FEATURES,
    PhonologicalFeatureCalculator,
)
from everyvoice_tpu.text.ipa import segment_features, tokenize_ipa
from everyvoice_tpu.text.lookups import build_lookup, lookuptables_from_data
from everyvoice_tpu.text.textsplit import chunk_text
from everyvoice_tpu.text.utils import (
    guess_graphemes_in_text,
    guess_ipa_phones_in_text,
    symbol_sorter,
)


@pytest.fixture
def base_tp():
    return TextProcessor(TextConfig())


@pytest.fixture
def ipa_tp():
    return TextProcessor(
        TextConfig(symbols=Symbols(ipa=["a", "h", "ʌ", "l", "o", "ʊ", "ɛ"]))
    )


class TestSymbolLayout:
    def test_pad_is_id_zero_space_is_one(self, base_tp):
        assert base_tp.symbols[0] == PAD_SYMBOL
        assert base_tp.symbols[1] == " "
        assert base_tp._symbol_to_id[PAD_SYMBOL] == 0
        assert base_tp._symbol_to_id[" "] == 1

    def test_longest_first_sorting(self):
        assert symbol_sorter(["a", "bb", "c"], ["\x80", " "]) == [
            "\x80", " ", "bb", "a", "c",
        ]

    def test_internal_punctuation_tokens_present(self, base_tp):
        for tok in ("<EXCL>", "<QINT>", "<PERIOD>", "<COMMA>", "<SIL>"):
            assert tok in base_tp._symbol_to_id


class TestTokenization:
    def test_roundtrip(self, ipa_tp):
        ids = ipa_tp.encode_text("hallo", quiet=True)
        assert ipa_tp.decode_tokens(ids) == "h/a/l/l/o"

    def test_missing_symbols_counted(self, base_tp):
        base_tp.apply_tokenization("abc &", quiet=True)
        assert base_tp.missing_symbols["abc"] == 1
        assert base_tp.missing_symbols["&"] == 1

    def test_punctuation_internalization(self, base_tp):
        toks = base_tp.apply_punctuation_rules(["h", "!", "?", ".", ","])
        assert toks == ["h", "<EXCL>", "<QINT>", "<PERIOD>", "<COMMA>"]

    def test_slash_escape_roundtrip(self, base_tp):
        seq = base_tp.decode_tokens([0, 1, 0])
        assert base_tp.split_tokens(seq) == [PAD_SYMBOL, " ", PAD_SYMBOL]

    def test_oov_raises(self, base_tp):
        with pytest.raises(OutOfVocabularySymbolError):
            base_tp.encode_string_tokens(["not-a-symbol"])


class TestG2P:
    def test_eng_g2p(self, ipa_tp):
        assert ipa_tp.apply_g2p_and_tokenization("hello", "eng") == [
            "h", "ʌ", "l", "o", "ʊ",
        ]

    def test_unknown_lang_raises(self, ipa_tp):
        with pytest.raises(ValueError, match="boop"):
            ipa_tp.encode_text("x", apply_g2p=True, lang_id="boop")

    def test_pfs_requires_g2p(self, ipa_tp):
        with pytest.raises(ValueError, match="apply_g2p"):
            ipa_tp.encode_text("x", encode_as_phonological_features=True)

    def test_custom_engine_registration(self):
        TextConfig(g2p_engines={"tst": "tests.g2p_engines.valid_g2p"})
        from everyvoice_tpu.text.phonemizer import AVAILABLE_G2P_ENGINES

        assert "tst" in AVAILABLE_G2P_ENGINES

    def test_invalid_engine_signature_rejected(self):
        with pytest.raises(Exception):
            TextConfig(g2p_engines={"bad": "tests.g2p_engines.wrong_sig_g2p"})


class TestPhonologicalFeatures:
    def test_dimension_is_43(self, ipa_tp):
        feats = ipa_tp.encode_text(
            "hello!", apply_g2p=True, lang_id="eng",
            encode_as_phonological_features=True, quiet=True,
        )
        assert feats.shape[1] == N_PHONOLOGICAL_FEATURES == 43

    def test_diphthong_averaging(self):
        ai = np.array(segment_features("aɪ"))
        a = np.array(segment_features("a"))
        i = np.array(segment_features("ɪ"))
        agree = a == i
        assert np.all(ai[agree] == a[agree])
        # hi and lo disagree between components -> zeroed
        assert ai[15] == 0.0 and ai[16] == 0.0

    def test_special_tokens(self):
        pf = PhonologicalFeatureCalculator(TextConfig())
        pad = pf.pad_token()
        assert pad.shape == (43,)
        assert pad[38] == 1.0  # [PAD] one-hot in the special block
        assert not np.any(pad[:38])

    def test_stress_and_punct_blocks(self):
        pf = PhonologicalFeatureCalculator(TextConfig())
        feats = pf.get_features(["ˈ", "<EXCL>", " ", "<SIL>"])
        assert feats[0][24] == 1.0  # primary stress
        assert feats[1][26 + 10] == 1.0  # excl slot
        assert feats[2][26 + 0] == 1.0  # space slot
        assert feats[3][26 + 11] == 1.0  # silence slot


class TestArticulatoryTable:
    """Validate the generated feature table against textbook phonology.

    panphon itself is not installable in this image (reference
    everyvoice/text/features.py:3 consumes its table), so instead of value
    goldens these pin the *linguistic* ground truth the table must encode:
    natural classes, minimal pairs, and distance ordering. A wrong row in
    the generated table breaks one of these.
    """

    IDX = {
        n: i
        for i, n in enumerate(
            [
                "syl", "son", "cons", "cont", "delrel", "lat", "nas",
                "strid", "voi", "sg", "cg", "ant", "cor", "distr", "lab",
                "hi", "lo", "back", "round", "velaric", "tense", "long",
                "hitone", "hireg",
            ]
        )
    }

    def feat(self, seg, name):
        return segment_features(seg)[self.IDX[name]]

    @pytest.mark.parametrize(
        "vl,vd",
        [("p", "b"), ("t", "d"), ("k", "ɡ"), ("f", "v"), ("s", "z"), ("ʃ", "ʒ")],
    )
    def test_voicing_minimal_pairs(self, vl, vd):
        a, b = np.array(segment_features(vl)), np.array(segment_features(vd))
        (diff,) = np.nonzero(a != b)
        assert list(diff) == [self.IDX["voi"]]
        assert a[self.IDX["voi"]] == -1.0 and b[self.IDX["voi"]] == 1.0

    @pytest.mark.parametrize("seg", ["m", "n", "ŋ"])
    def test_nasals_are_sonorant_stops(self, seg):
        assert self.feat(seg, "nas") == 1.0
        assert self.feat(seg, "son") == 1.0
        assert self.feat(seg, "cont") == -1.0

    @pytest.mark.parametrize("seg", ["a", "e", "i", "o", "u", "ə"])
    def test_vowels_are_syllabic_sonorants(self, seg):
        assert self.feat(seg, "syl") == 1.0
        assert self.feat(seg, "son") == 1.0
        assert self.feat(seg, "cons") == -1.0

    def test_vowel_height_backness_rounding(self):
        for seg in ("i", "u"):
            assert self.feat(seg, "hi") == 1.0 and self.feat(seg, "lo") == -1.0
        assert self.feat("a", "lo") == 1.0
        for seg in ("u", "o"):
            assert self.feat(seg, "round") == 1.0
            assert self.feat(seg, "back") == 1.0
        for seg in ("i", "e"):
            assert self.feat(seg, "round") == -1.0
            assert self.feat(seg, "back") == -1.0

    def test_place_classes(self):
        for seg in ("p", "b", "m", "f", "v"):
            assert self.feat(seg, "lab") == 1.0
        for seg in ("t", "d", "n", "s", "z", "l", "ɾ"):
            assert self.feat(seg, "cor") == 1.0
        for seg in ("k", "ɡ", "ŋ", "x"):
            assert self.feat(seg, "hi") == 1.0
            assert self.feat(seg, "cor") == -1.0

    def test_manner_classes(self):
        assert self.feat("l", "lat") == 1.0
        for seg in ("s", "z", "ʃ", "ʒ", "f", "v"):
            assert self.feat(seg, "cont") == 1.0
            assert self.feat(seg, "strid") == 1.0
        for seg in ("p", "t", "k", "b", "d", "ɡ"):
            assert self.feat(seg, "cont") == -1.0
        # Affricates: stop closure with delayed release
        assert self.feat("t͡ʃ", "delrel") == 1.0

    def test_glides_are_nonsyllabic_vocoids(self):
        for seg in ("j", "w"):
            assert self.feat(seg, "syl") == -1.0
            assert self.feat(seg, "son") == 1.0
            assert self.feat(seg, "cons") == -1.0
        assert self.feat("w", "round") == 1.0

    def test_laryngeals(self):
        assert self.feat("h", "sg") == 1.0
        assert self.feat("ʔ", "cg") == 1.0

    def test_alveolopalatal_sibilants(self):
        a, b = np.array(segment_features("ɕ")), np.array(segment_features("ʑ"))
        (diff,) = np.nonzero(a != b)
        assert list(diff) == [self.IDX["voi"]]
        for seg in ("ɕ", "ʑ"):
            assert self.feat(seg, "strid") == 1.0
            assert self.feat(seg, "cor") == 1.0
            assert self.feat(seg, "hi") == 1.0
            assert self.feat(seg, "cont") == 1.0
        # ɕ is distinct from both ʃ (by tongue-body height) and ç (by
        # coronality/stridency)
        assert segment_features("ɕ") != segment_features("ʃ")
        assert segment_features("ɕ") != segment_features("ç")
        # and the tied affricate composes: t͡ɕ = ɕ with stop closure
        assert self.feat("t͡ɕ", "delrel") == 1.0
        assert self.feat("t͡ɕ", "cont") == -1.0

    def test_length_modifier(self):
        assert self.feat("aː", "long") == 1.0
        assert self.feat("a", "long") == -1.0

    def test_distance_ordering(self):
        """Hamming distance over the table must respect similarity: a
        voicing pair is closer than a place pair, which is closer than a
        consonant/vowel pair (the property symbol mapping relies on —
        reference everyvoice/text/utils_heavy.py feature edit distance)."""

        def d(x, y):
            return float(
                np.abs(np.array(segment_features(x)) - np.array(segment_features(y))).sum()
            )

        assert d("p", "b") < d("p", "t") < d("p", "a")
        assert d("i", "e") < d("i", "u") <= d("i", "s")
        assert d("m", "n") < d("m", "s")


class TestIPA:
    def test_affricate_tie(self):
        assert tokenize_ipa("t͡ʃa") == ["t͡ʃ", "a"]

    def test_length_and_diacritics_attach(self):
        assert tokenize_ipa("aːbʰ") == ["aː", "bʰ"]

    def test_non_ipa_dropped_when_unknown_false(self):
        assert tokenize_ipa("ʃin1[}!]", unknown=False) == ["ʃ", "i", "n"]

    def test_guessers(self):
        assert sorted(guess_graphemes_in_text("g̱an")) == ["a", "g̱", "n"]
        assert sorted(guess_ipa_phones_in_text("ʃin1!")) == ["i", "n", "ʃ"]


class TestArpabet:
    def test_basic(self):
        assert arpabet_to_ipa("HH AH0 L OW1") == "hʌlˈoʊ"

    def test_stress_placement(self):
        assert arpabet_to_ipa("AY1") == "ˈaɪ"
        assert arpabet_to_ipa("AY2") == "ˌaɪ"


class TestChunking:
    def test_short_text_single_chunk(self):
        assert chunk_text("Short sentence.") == ["Short sentence."]

    def test_splits_on_strong_boundaries(self):
        text = "First sentence here. " * 10
        chunks = chunk_text(text, desired_length=50, max_length=100)
        assert all(len(c) <= 100 for c in chunks)
        assert all(c.endswith(".") for c in chunks)

    def test_quote_awareness(self):
        text = '"A quoted. Sentence stays." Another part comes after that here.'
        chunks = chunk_text(text, desired_length=10, max_length=45)
        joined = " ".join(chunks)
        assert "A quoted. Sentence stays." in joined

    def test_non_lexical_chunks_filtered(self):
        assert chunk_text("...") == []


class TestLookups:
    def test_sorted_tables(self):
        data = [
            [{"language": "b", "speaker": "s2"}, {"language": "a", "speaker": "s1"}],
        ]
        lang2id, speaker2id = lookuptables_from_data(data)
        assert lang2id == {"a": 0, "b": 1}
        assert speaker2id == {"s1": 0, "s2": 1}

    def test_build_lookup_order_preserving(self):
        items = [{"k": "z"}, {"k": "a"}, {"k": "z"}]
        assert build_lookup(items, "k") == {"z": 0, "a": 1}


class TestEdgeCases:
    """Edge cases modeled on the reference's test_text.py coverage."""

    def test_slash_in_symbols_escaped_in_joined_tokens(self):
        tp = TextProcessor(TextConfig(symbols=Symbols(letters=["/", "a"])))
        ids = tp.encode_text("a/a", quiet=True)
        joined = tp.decode_tokens(ids)
        # '/' is both a symbol and the joiner → must be escaped
        assert "<SLASH>" in joined
        assert tp.encode_escaped_string_sequence(joined) == ids

    def test_nfc_normalization_of_symbols(self):
        # Decomposed é in the inventory must match composed é in text after
        # nfc cleaning.
        tp = TextProcessor(
            TextConfig(
                cleaners=["everyvoice_tpu.utils.nfc_normalize"],
                symbols=Symbols(letters=["é"]),
            )
        )
        ids = tp.encode_text("é", quiet=True)  # composed é
        assert len(ids) == 1

    def test_multichar_symbol_greedy_match(self):
        tp = TextProcessor(TextConfig(symbols=Symbols(letters=["a", "aa", "aaa"])))
        ids = tp.encode_text("aaaa", quiet=True)
        tokens = tp.token_sequence_to_text_sequence(ids)
        assert tokens == ["aaa", "a"]  # longest-first matching

    def test_duplicate_symbols_across_fields(self):
        # The same symbol declared in two fields must map to one ID.
        tp = TextProcessor(
            TextConfig(symbols=Symbols(set1=["x", "y"], set2=["y", "z"]))
        )
        assert len([s for s in tp.symbols if s == "y"]) == 1

    def test_empty_text(self, base_tp):
        assert base_tp.encode_text("", quiet=True) == []

    def test_encode_decode_all_punctuation(self, base_tp):
        from everyvoice_tpu.config.text_config import Punctuation

        for symbol in sorted(Punctuation().all):
            ids = base_tp.encode_text(symbol, quiet=True)
            assert len(ids) == 1, symbol

    def test_symbol_table_is_level_independent(self):
        """The ID table covers the full declared inventory regardless of the
        target representation level — the reference's TextProcessor has no
        level parameter, and training datasets vs checkpoint loaders must
        agree on symbol IDs when a config declares both characters and
        phones sets."""
        from everyvoice_tpu.config.type_definitions import (
            TargetTrainingTextRepresentationLevel as Level,
        )

        cfg = TextConfig(
            symbols=Symbols(
                ds1_characters=["c"], ds1_phones=["p"], shared=["s"],
            )
        )
        tp_chars = TextProcessor(
            cfg, target_text_representation_level=Level.characters
        )
        tp_phones = TextProcessor(
            cfg, target_text_representation_level=Level.ipa_phones
        )
        tp_plain = TextProcessor(cfg)
        assert tp_chars.symbols == tp_phones.symbols == tp_plain.symbols
        for sym in ("c", "p", "s"):
            assert sym in tp_plain._symbol_to_id

    def test_language_specific_cleaners_applied(self):
        cfg = TextConfig(
            language_cleaners={"upper_lang": ["everyvoice_tpu.utils.lower"]},
            symbols=Symbols(letters=list("abc")),
        )
        tp = TextProcessor(cfg)
        assert tp.normalize_text("ABC", lang_id="upper_lang") == "abc"
        assert tp.normalize_text("ABC", lang_id="other") == "ABC"

    def test_arpabet_dataset_to_ipa_in_preprocessing(self):
        from everyvoice_tpu.text.arpabet import arpabet_to_ipa

        # Multi-word with stress; internal spaces removed per word
        assert arpabet_to_ipa("DH AH0  K AE1 T") == "ðʌ kˈæt"


class TestRuleG2P:
    """Built-in rule-table engines (the native analog of the g2p library's
    JSON mapping transducers, reference phonemizer.py:20-28)."""

    def test_registered_languages(self):
        from everyvoice_tpu.text.phonemizer import (
            AVAILABLE_G2P_ENGINES,
            get_g2p_engine,
        )

        for lang in ("spa", "ita", "fin", "deu", "fra"):
            assert lang in AVAILABLE_G2P_ENGINES
            assert callable(get_g2p_engine(lang))

    def test_every_builtin_language_emits_known_ipa(self):
        """Every registered rule engine must emit only segments the
        articulatory table knows — a gap here silently zeroes PFS rows for
        that language (caught live: Polish ɕ/ʑ were missing)."""
        from everyvoice_tpu.text.ipa import is_ipa_segment
        from everyvoice_tpu.text.phonemizer import (
            AVAILABLE_G2P_ENGINES,
            get_g2p_engine,
        )

        samples = {
            "tur": "merhaba dünya", "pol": "dzień dobry świecie",
            "ces": "dobrý den světe", "hrv": "dobar dan svijete",
            "ron": "bună ziua lume", "por": "olá mundo",
            "cat": "bon dia món", "hun": "jó napot világ",
            "ind": "selamat pagi dunia", "swa": "habari ya dunia",
            "dan": "hej verden", "swe": "hej världen",
            "est": "tere maailm", "eus": "kaixo mundua",
            "rus": "привет мир", "ukr": "привіт світ",
            "ell": "γεια σου κόσμε", "spa": "hola mundo",
            "ita": "ciao mondo", "fin": "hei maailma",
            "deu": "hallo welt", "fra": "bonjour le monde",
            "eng": "church judge strength",
        }
        assert set(samples) <= set(AVAILABLE_G2P_ENGINES)
        unknown = {}
        for lang, text in samples.items():
            phones = get_g2p_engine(lang)(text)
            bad = [
                p for p in phones
                # tokens that are only stress/length marks are valid IPA
                if p.strip("ˈˌː ") and not is_ipa_segment(p.strip("ˈˌː"))
            ]
            if bad:
                unknown[lang] = bad
        assert not unknown, f"unknown IPA segments: {unknown}"

    def test_spanish(self):
        from everyvoice_tpu.text.phonemizer import get_g2p_engine

        g2p = get_g2p_engine("spa")
        assert "".join(g2p("queso")) == "keso"
        assert "".join(g2p("gente")) == "xente"
        assert "".join(g2p("perro")) == "pero"
        assert "".join(g2p("pero")) == "peɾo"
        assert "".join(g2p("chico")) == "t͡ʃiko"
        assert "".join(g2p("hola")) == "ola"

    def test_french_nasals_and_silent_finals(self):
        from everyvoice_tpu.text.phonemizer import get_g2p_engine

        g2p = get_g2p_engine("fra")
        assert "".join(g2p("bon")) == "bɔ̃"
        assert "".join(g2p("bonne")) == "bon"  # no nasalization before vowel
        assert "".join(g2p("chat")) == "ʃa"
        assert "".join(g2p("eau")) == "o"

    def test_german_contextual_ch(self):
        from everyvoice_tpu.text.phonemizer import get_g2p_engine

        g2p = get_g2p_engine("deu")
        assert "".join(g2p("ich")) == "iç"
        assert "".join(g2p("buch")) == "bux"
        assert "".join(g2p("schule")) == "ʃulə"

    def test_caching_and_word_split(self):
        from everyvoice_tpu.text.phonemizer import get_g2p_engine

        g2p = get_g2p_engine("fin")
        out = g2p("kissa sauna")
        assert " " in out and out[0] == "k"

    def test_user_json_table(self, tmp_path):
        import json

        from everyvoice_tpu.text.rule_g2p import load_rules_from_json

        table = [
            {"in": "sh", "out": "ʃ"},
            {"in": "x", "out": "", "post": "\\Z"},
        ]
        path = tmp_path / "mylang.json"
        path.write_text(json.dumps(table), encoding="utf8")
        engine = load_rules_from_json(path)
        assert "".join(engine("shax")) == "ʃa"

    def test_end_to_end_through_text_processor(self):
        from everyvoice_tpu.config.text_config import Symbols, TextConfig
        from everyvoice_tpu.text.text_processor import TextProcessor

        config = TextConfig(
            symbols=Symbols(
                ipa=["k", "e", "s", "o", "x", "n", "t", "θ", "a", "b", "ɾ",
                     "r", "i", "u", "d", "l", "m", "p"],
            )
        )
        tp = TextProcessor(config)
        tokens = tp.apply_g2p_and_tokenization("queso", "spa")
        assert tokens == ["k", "e", "s", "o"]


class TestRuleG2PBreadth:
    """The built-in registry covers ~24 languages — the reference's
    g2p-seeded breadth class (reference phonemizer.py:20-28)."""

    def test_registry_size(self):
        from everyvoice_tpu.text.phonemizer import (
            AVAILABLE_G2P_ENGINES,
            G2P_LANGUAGE_NAMES,
        )

        from everyvoice_tpu.text.phonemizer import _BUILTIN_FACTORIES

        assert len(AVAILABLE_G2P_ENGINES) >= 20
        # every built-in language has a display name for the wizard picker
        # (user plugins registered by other tests may not)
        assert set(_BUILTIN_FACTORIES) <= set(G2P_LANGUAGE_NAMES)

    @pytest.mark.parametrize(
        "lang,word,expected",
        [
            ("tur", "çiçek", "t͡ʃit͡ʃek"),
            ("pol", "szkoła", "ʂkow"),       # prefix: final 'a' passes through
            ("ces", "čaj", "t͡ʃaj"),
            ("hrv", "džep", "d͡ʒep"),
            ("ron", "și", "ʃi"),
            ("por", "chave", "ʃave"),
            ("cat", "queixa", "keʃ"),        # prefix
            ("hun", "gyerek", "ɟerek"),
            ("ind", "nyanyi", "ɲaɲi"),
            ("swa", "chakula", "t͡ʃakula"),
            ("swe", "kära", "ɕɛra"),
            ("est", "sõna", "sɤna"),
            ("eus", "etxe", "et͡ʃe"),
            ("rus", "мама", "mama"),
            ("ukr", "дякую", "djakuju"),
            ("ell", "καλημέρα", "kalimera"),
            ("dan", "rød", "ʁøð"),
        ],
    )
    def test_language_spot_checks(self, lang, word, expected):
        from everyvoice_tpu.text.phonemizer import get_g2p_engine

        out = "".join(get_g2p_engine(lang)(word))
        assert out.startswith(expected), f"{lang}: {word} -> {out}"


class TestCustomG2PSignatures:
    """Reference test_custom_g2p.py:235-300 — each malformed plugin
    signature is rejected with its own message and never registered."""

    def _reject(self, func_name, match):
        from pydantic import ValidationError

        from everyvoice_tpu.text.phonemizer import AVAILABLE_G2P_ENGINES

        with pytest.raises(ValidationError, match=match):
            TextConfig(
                g2p_engines={"unittest": f"tests.g2p_engines.{func_name}"}
            )
        assert "unittest" not in AVAILABLE_G2P_ENGINES

    def test_multiple_arguments_rejected(self):
        self._reject("multiple_arguments", "single argument")

    def test_non_string_input_rejected(self):
        self._reject("not_a_string", "take a string")

    def test_non_list_return_rejected(self):
        self._reject("not_a_list", "return a list")

    def test_invalid_module_rejected(self):
        from pydantic import ValidationError

        with pytest.raises((ValidationError, ValueError), match="Invalid G2P"):
            TextConfig(
                g2p_engines={"unittest": "no.such.module.some_func"}
            )

    def test_overriding_default_engine(self):
        from everyvoice_tpu.text.phonemizer import AVAILABLE_G2P_ENGINES

        assert "fra" in AVAILABLE_G2P_ENGINES
        old = AVAILABLE_G2P_ENGINES["fra"]
        try:
            before = len(AVAILABLE_G2P_ENGINES)
            TextConfig(g2p_engines={"fra": "tests.g2p_engines.valid_g2p"})
            assert len(AVAILABLE_G2P_ENGINES) == before  # replaced, not added
            assert AVAILABLE_G2P_ENGINES["fra"] is not old
            from everyvoice_tpu.text.phonemizer import get_g2p_engine

            assert get_g2p_engine("fra")("abc") == ["a", "b", "c"]
        finally:
            AVAILABLE_G2P_ENGINES["fra"] = old
