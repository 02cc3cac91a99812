"""G2P engine registry (parity: everyvoice/text/phonemizer.py).

Maps ISO language ids to grapheme-to-phoneme callables
(``Callable[[str], list[str]]``). Engines are created lazily and wrapped in a
per-token cache. Built-ins:

- ``eng`` — the self-contained rule/lexicon engine in
  everyvoice_tpu.text.english_g2p (the reference used the `g2p` library here)
- ``und`` — language-independent: transliterate-to-ascii-ish tokenization
- ``spa``/``ita``/``fin``/``deu``/``fra`` — data-driven rule tables
  (everyvoice_tpu.text.rule_g2p), the native analog of the `g2p` library's
  JSON mapping transducers the reference seeds its registry from

User plugins registered through ``TextConfig.g2p_engines`` override built-ins.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Union

from everyvoice_tpu.logger import logger

G2PCallable = Callable[[str], List[str]]

# Marker for engines we know how to build but haven't instantiated yet.
DEFERRED_ENGINE = "DEFERRED"


class CachingG2PEngine:
    """Wraps a G2P callable with a per-input-chunk cache
    (reference phonemizer.py:32-88)."""

    def __init__(self, engine: G2PCallable):
        self._engine = engine
        self._cache: Dict[str, tuple] = {}

    def process_one_token(self, input_text: str) -> List[str]:
        cached = self._cache.get(input_text)
        if cached is None:
            result = tuple(self._engine(input_text))
            self._cache[input_text] = result
            return list(result)
        return list(cached)

    def __call__(self, normalized_input_text: str) -> List[str]:
        # Split on whitespace so the cache hits at word granularity, keeping
        # spaces as tokens between words.
        words = normalized_input_text.split()
        output: List[str] = []
        for i, word in enumerate(words):
            if i > 0:
                output.append(" ")
            output.extend(self.process_one_token(word))
        return output


def _make_eng_engine() -> CachingG2PEngine:
    from everyvoice_tpu.text.english_g2p import english_g2p

    return CachingG2PEngine(english_g2p)


def _make_und_engine() -> CachingG2PEngine:
    """Language-independent fallback: keep characters that look like IPA."""
    from everyvoice_tpu.text.ipa import tokenize_ipa

    def und_g2p(text: str) -> List[str]:
        return tokenize_ipa(text.lower(), unknown=True)

    return CachingG2PEngine(und_g2p)


def _make_rule_engine(lang_id: str) -> Callable[[], CachingG2PEngine]:
    def factory() -> CachingG2PEngine:
        from everyvoice_tpu.text.rule_g2p import make_rule_engine

        return CachingG2PEngine(make_rule_engine(lang_id))

    return factory


_RULE_LANGS = (
    "spa", "ita", "fin", "deu", "fra",
    # see rule_g2p_tables.py for these additions
    "tur", "pol", "ces", "hrv", "ron", "por", "cat", "hun", "ind", "swa",
    "dan", "swe", "est", "eus", "rus", "ukr", "ell",
)

_BUILTIN_FACTORIES: Dict[str, Callable[[], CachingG2PEngine]] = {
    "eng": _make_eng_engine,
    "und": _make_und_engine,
    **{lang: _make_rule_engine(lang) for lang in _RULE_LANGS},
}

# lang id -> engine instance, DEFERRED marker, or user plugin callable.
AVAILABLE_G2P_ENGINES: Dict[str, Union[G2PCallable, str]] = {
    lang: DEFERRED_ENGINE for lang in _BUILTIN_FACTORIES
}

# Human-readable names for the wizard's language picker
# (role parity: g2p.get_arpabet_langs()'s full-name map).
G2P_LANGUAGE_NAMES: Dict[str, str] = {
    "eng": "English",
    "und": "Undetermined",
    "spa": "Spanish",
    "ita": "Italian",
    "fin": "Finnish",
    "deu": "German",
    "fra": "French",
}


def _load_extra_language_names():
    from everyvoice_tpu.text.rule_g2p_tables import EXTRA_LANGUAGE_NAMES

    G2P_LANGUAGE_NAMES.update(EXTRA_LANGUAGE_NAMES)


_load_extra_language_names()


def get_g2p_engine(lang_id: str) -> G2PCallable:
    """Fetch (lazily instantiating) the G2P engine for a language
    (reference phonemizer.py:90-111)."""
    if lang_id not in AVAILABLE_G2P_ENGINES:
        raise NotImplementedError(
            f"Sorry, we don't have a grapheme-to-phoneme engine available for "
            f"{lang_id}. Please follow the docs to implement one yourself, or "
            "register a plugin via the text config's g2p_engines field."
        )
    engine = AVAILABLE_G2P_ENGINES[lang_id]
    if engine == DEFERRED_ENGINE:
        logger.info(f"Initializing G2P engine for {lang_id}; this only happens once.")
        engine = _BUILTIN_FACTORIES[lang_id]()
        AVAILABLE_G2P_ENGINES[lang_id] = engine
    assert callable(engine), f"G2P engine for {lang_id} is not callable"
    return engine
