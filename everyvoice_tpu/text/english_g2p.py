"""Built-in rule-based English grapheme-to-phoneme engine.

The reference delegates English G2P to the `g2p` library's ARPABET mappings;
that dependency is not available here, so we ship a self-contained
lexicon + letter-to-sound engine. It is intentionally pluggable: users get
better quality by registering a custom engine in
``TextConfig.g2p_engines`` (see everyvoice_tpu.config.text_config).

Output is a list of IPA phone tokens as produced by
everyvoice_tpu.text.ipa.tokenize_ipa (diphthongs split into components,
stress marks as separate tokens).
"""

from __future__ import annotations

import re
from typing import List

# A compact exception lexicon of very common English words (IPA, no stress).
LEXICON = {
    "a": "ə", "about": "əbaʊt", "after": "æftɚ", "again": "əɡɛn",
    "all": "ɔl", "also": "ɔlsoʊ", "an": "æn", "and": "ænd", "any": "ɛni",
    "are": "ɑɹ", "as": "æz", "at": "æt", "be": "bi", "because": "bɪkʌz",
    "been": "bɪn", "before": "bɪfɔɹ", "but": "bʌt", "by": "baɪ",
    "can": "kæn", "cheese": "t͡ʃiz", "come": "kʌm", "could": "kʊd",
    "day": "deɪ", "do": "du",
    "does": "dʌz", "done": "dʌn", "down": "daʊn", "each": "it͡ʃ",
    "eight": "eɪt", "even": "ivən", "every": "ɛvɹi", "eye": "aɪ",
    "first": "fɝst", "five": "faɪv", "for": "fɔɹ", "four": "fɔɹ",
    "from": "fɹʌm", "get": "ɡɛt", "give": "ɡɪv", "go": "ɡoʊ",
    "good": "ɡʊd", "great": "ɡɹeɪt", "had": "hæd", "has": "hæz",
    "have": "hæv", "he": "hi", "hear": "hiɹ", "heart": "hɑɹt",
    "hello": "hʌloʊ", "her": "hɝ", "here": "hiɹ", "him": "hɪm",
    "his": "hɪz", "how": "haʊ", "i": "aɪ", "if": "ɪf", "in": "ɪn",
    "into": "ɪntu", "is": "ɪz", "it": "ɪt", "its": "ɪts", "just": "d͡ʒʌst",
    "know": "noʊ", "language": "læŋɡwɪd͡ʒ", "learn": "lɝn", "like": "laɪk",
    "little": "lɪtəl", "live": "lɪv", "long": "lɔŋ", "look": "lʊk",
    "love": "lʌv", "made": "meɪd", "make": "meɪk", "many": "mɛni",
    "may": "meɪ", "me": "mi", "more": "mɔɹ", "most": "moʊst", "move": "muv",
    "much": "mʌt͡ʃ", "my": "maɪ", "new": "nu", "no": "noʊ", "not": "nɑt",
    "now": "naʊ", "of": "ʌv", "off": "ɔf", "old": "oʊld", "on": "ɑn",
    "once": "wʌns", "one": "wʌn", "only": "oʊnli", "or": "ɔɹ",
    "other": "ʌðɚ", "our": "aʊɚ", "out": "aʊt", "over": "oʊvɚ",
    "people": "pipəl", "said": "sɛd", "say": "seɪ", "see": "si",
    "she": "ʃi", "should": "ʃʊd", "so": "soʊ", "some": "sʌm",
    "sound": "saʊnd", "speech": "spit͡ʃ", "synthesis": "sɪnθəsɪs",
    "than": "ðæn", "that": "ðæt", "the": "ðə", "their": "ðɛɹ",
    "them": "ðɛm", "then": "ðɛn", "there": "ðɛɹ", "these": "ðiz",
    "they": "ðeɪ", "this": "ðɪs", "those": "ðoʊz", "three": "θɹi",
    "through": "θɹu", "time": "taɪm", "to": "tu", "today": "tədeɪ",
    "two": "tu", "use": "juz", "very": "vɛɹi", "voice": "vɔɪs",
    "want": "wɑnt", "was": "wʌz", "water": "wɔtɚ", "way": "weɪ",
    "we": "wi", "were": "wɝ", "what": "wʌt", "when": "wɛn",
    "where": "wɛɹ", "which": "wɪt͡ʃ", "who": "hu", "why": "waɪ",
    "will": "wɪl", "with": "wɪð", "word": "wɝd", "world": "wɝld",
    "would": "wʊd", "year": "jiɹ", "you": "ju", "your": "jɔɹ",
}

# Ordered letter-to-sound rules: (pattern, ipa). Longest-match first within
# each starting letter; applied greedily left to right. "V" in a context
# means a vowel letter. A final fallback maps single letters.
MULTIGRAPH_RULES = [
    ("tion", "ʃən"), ("sion", "ʒən"), ("ture", "t͡ʃɚ"),
    ("ought", "ɔt"), ("aught", "ɔt"), ("ight", "aɪt"), ("eigh", "eɪ"),
    ("ough", "ʌf"), ("augh", "æf"),
    ("tch", "t͡ʃ"), ("dge", "d͡ʒ"), ("sch", "sk"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("au", "ɔ"), ("aw", "ɔ"),
    ("ea", "i"), ("ee", "i"), ("ei", "eɪ"), ("eu", "ju"), ("ew", "ju"),
    ("ey", "eɪ"), ("ie", "i"), ("oa", "oʊ"), ("oe", "oʊ"), ("oi", "ɔɪ"),
    ("oo", "u"), ("ou", "aʊ"), ("ow", "aʊ"), ("oy", "ɔɪ"), ("ue", "u"),
    ("ui", "u"),
    ("ch", "t͡ʃ"), ("ck", "k"), ("gh", "ɡ"), ("gn", "n"), ("kn", "n"),
    ("ng", "ŋ"), ("ph", "f"), ("qu", "kw"), ("sh", "ʃ"), ("th", "θ"),
    ("wh", "w"), ("wr", "ɹ"), ("mb", "m"), ("ps", "s"),
    ("bb", "b"), ("dd", "d"), ("ff", "f"), ("gg", "ɡ"), ("ll", "l"),
    ("mm", "m"), ("nn", "n"), ("pp", "p"), ("rr", "ɹ"), ("ss", "s"),
    ("tt", "t"), ("zz", "z"), ("cc", "k"),
]

SINGLE_LETTER = {
    "a": "æ", "b": "b", "c": "k", "d": "d", "e": "ɛ", "f": "f",
    "g": "ɡ", "h": "h", "i": "ɪ", "j": "d͡ʒ", "k": "k", "l": "l",
    "m": "m", "n": "n", "o": "ɑ", "p": "p", "q": "k", "r": "ɹ",
    "s": "s", "t": "t", "u": "ʌ", "v": "v", "w": "w", "x": "ks",
    "y": "j", "z": "z",
}

_VOWELS = set("aeiouy")

# "Magic e": vowel + single consonant + final e → long vowel, silent e.
_LONG_VOWEL = {"a": "eɪ", "e": "i", "i": "aɪ", "o": "oʊ", "u": "ju"}


def _word_to_ipa(word: str) -> str:
    word = word.lower()
    if word in LEXICON:
        return LEXICON[word]
    # Handle the magic-e pattern on the final syllable.
    m = re.search(r"([aeiou])([bcdfgklmnprstvz])e$", word)
    long_sub = None
    if m and len(word) > 3:
        long_sub = (m.start(1), _LONG_VOWEL[m.group(1)])
        word = word[: m.start(2) + 1]  # drop the silent e
    out = []
    i = 0
    while i < len(word):
        if long_sub is not None and i == long_sub[0]:
            out.append(long_sub[1])
            i += 1
            continue
        # soft c / soft g before e, i, y
        if word[i] == "c" and i + 1 < len(word) and word[i + 1] in "eiy":
            out.append("s")
            i += 1
            continue
        if word[i] == "g" and i + 1 < len(word) and word[i + 1] in "eiy":
            out.append("d͡ʒ")
            i += 1
            continue
        # y as a vowel when not word-initial
        if word[i] == "y" and i > 0:
            out.append("i" if i == len(word) - 1 else "ɪ")
            i += 1
            continue
        for pattern, ipa in MULTIGRAPH_RULES:
            if word.startswith(pattern, i):
                out.append(ipa)
                i += len(pattern)
                break
        else:
            out.append(SINGLE_LETTER.get(word[i], ""))
            i += 1
    return "".join(out)


def english_g2p(normalized_text: str) -> List[str]:
    """Convert normalized English text to a list of IPA phone tokens.

    >>> english_g2p('hello')
    ['h', 'ʌ', 'l', 'o', 'ʊ']
    >>> english_g2p('cheese cake')[:3]
    ['t͡ʃ', 'i', 'z']
    """
    from everyvoice_tpu.text.ipa import tokenize_ipa

    tokens: List[str] = []
    pieces = re.split(r"(\W+)", normalized_text)
    for piece in pieces:
        if not piece:
            continue
        if re.match(r"^\w+$", piece, re.UNICODE):
            tokens.extend(tokenize_ipa(_word_to_ipa(piece)))
        else:
            # Punctuation and whitespace pass through character by character;
            # the TextProcessor validates them against its inventory.
            for ch in piece:
                tokens.append(ch)
    return tokens
