"""G2P accuracy against reference-produced goldens.

The reference's English G2P is the `g2p` library's trained transducer
(reference everyvoice/text/phonemizer.py:90); its outputs for five LJ
sentences ship in the reference mount
(everyvoice/tests/data/metadata_phones.psv / metadata.psv — 84 word
tokens). These tests score the built-in `eng` engine against them:

- full engine (lexicon + morphology + letter-to-sound): pinned at 100%
  word-level agreement;
- letter-to-sound rules alone (the true-OOV fallback): a floor is pinned
  so rule regressions are caught (word agreement and phone error rate).
"""

import re
import unicodedata
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path("/root/reference/everyvoice/tests/data/metadata_phones.psv")


def _norm(s: str) -> str:
    # NFC + strip tie bars: the framework writes affricates as t͡ʃ/d͡ʒ
    # (matching its feature table), the g2p library writes tʃ/dʒ.
    return unicodedata.normalize("NFC", s).replace("͡", "")


def _golden_pairs():
    rows = GOLDEN.read_text(encoding="utf-8").splitlines()
    header = rows[0].split("|")
    pairs = []
    for line in rows[1:]:
        d = dict(zip(header, line.split("|")))
        words = [
            re.sub(r"^[^\w]+|[^\w]+$", "", w) for w in d["clean_text"].split()
        ]
        gold = [re.sub(r"[^\w˞]+", "", w) for w in d["phones"].split()]
        words = [w for w in words if w]
        gold = [g for g in gold if g]
        assert len(words) == len(gold), (words, gold)
        pairs.extend(zip(words, gold))
    return pairs


def _levenshtein(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), int)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return int(d[m, n])


@pytest.mark.skipif(not GOLDEN.exists(), reason="reference mount absent")
class TestReferenceGoldenAgreement:
    def test_full_engine_matches_reference_exactly(self):
        """Lexicon + morphology + LTS reproduces every reference-produced
        word pronunciation (84/84)."""
        from everyvoice_tpu.text.english_g2p import english_g2p

        misses = []
        for word, gold in _golden_pairs():
            ours = _norm(
                "".join(
                    t for t in english_g2p(word) if re.match(r"[\w˞]", t)
                )
            )
            if ours != _norm(gold):
                misses.append((word, _norm(gold), ours))
        assert not misses, f"G2P disagreements vs reference goldens: {misses}"

    def test_letter_to_sound_floor(self):
        """The true-OOV fallback alone (no lexicon) must stay above the
        measured round-4 floor: ≥20% exact-word, ≤40% phone error rate.
        (Measured at introduction: 23.8% / 36.0%; round 5: higher.)"""
        from everyvoice_tpu.text.english_g2p import _letters_to_sound

        total = match = dist = gold_len = 0
        for word, gold in _golden_pairs():
            ours = _norm(_letters_to_sound(word.lower().replace("-", "")))
            gold = _norm(gold)
            total += 1
            match += ours == gold
            dist += _levenshtein(ours, gold)
            gold_len += len(gold)
        assert match / total >= 0.20, f"LTS word agreement {match}/{total}"
        assert dist / gold_len <= 0.40, f"LTS phone error rate {dist}/{gold_len}"


class TestHeldOutLTS:
    """Round-5 floors on the hash-held-out lexicon slice (501 entries at
    batch 10; the LTS rules were never tuned on them — tools/eval_g2p.py
    methodology; measured at batch 10: 34.5% word accuracy, 21.1% PER)."""

    def test_held_out_floors(self):
        import hashlib

        from everyvoice_tpu.text.english_g2p import _letters_to_sound
        from everyvoice_tpu.text.english_lexicon import (
            ARPABET_LEXICON,
            arpabet_to_ipa,
        )

        items = [
            (w, arpabet_to_ipa(p))
            for w, p in ARPABET_LEXICON.items()
            if int(hashlib.md5(w.encode()).hexdigest(), 16) % 10 == 0
            and "'" not in w and " " not in w
        ]
        assert len(items) >= 300, "held-out slice shrank below 300 entries"
        total = match = dist = gold_len = 0
        for word, gold in items:
            ours = _letters_to_sound(word.replace("-", ""))
            total += 1
            match += ours == gold
            dist += _levenshtein(ours, gold)
            gold_len += len(gold)
        assert match / total >= 0.34, (
            f"held-out LTS word accuracy regressed: {match}/{total}"
        )
        assert dist / gold_len <= 0.23, (
            f"held-out LTS phone error rate regressed: {dist}/{gold_len}"
        )


@pytest.mark.skipif(
    not Path("/root/reference/everyvoice/filelists/lj_full.psv").exists(),
    reason="reference mount absent",
)
class TestCorpusCoverage:
    """Lexicon+morphology coverage of the full 13,100-utterance LJ
    transcript (round-5 growth; measured at batch 10: 97.1% tokens)."""

    def test_lj_token_coverage_floor(self):
        import collections

        from everyvoice_tpu.text.english_lexicon import lookup

        def covered(w):
            if lookup(w) is not None:
                return True
            if "-" in w:
                parts = [p for p in w.split("-") if p]
                return bool(parts) and all(
                    lookup(p) is not None for p in parts
                )
            return False

        vocab = collections.Counter()
        lines = Path(
            "/root/reference/everyvoice/filelists/lj_full.psv"
        ).read_text(encoding="utf-8").splitlines()
        for line in lines:
            for w in re.findall(r"[A-Za-z][A-Za-z'-]*", line.split("|")[1]):
                vocab[w.lower()] += 1
        total = sum(vocab.values())
        cov = sum(c for w, c in vocab.items() if covered(w))
        assert cov / total >= 0.95, (
            f"LJ token coverage regressed: {cov}/{total} = {cov/total:.1%}"
        )


class TestLexicon:
    def test_arpabet_conversion_conventions(self):
        """AH→ʌ, ER→ɜ˞, stress dropped — the g2p library's eng-ipa
        alphabet (verified against the reference goldens)."""
        from everyvoice_tpu.text.english_lexicon import arpabet_to_ipa

        assert arpabet_to_ipa("DH AH0") == "ðʌ"
        assert arpabet_to_ipa("T ER1 M Z") == "tɜ˞mz"
        assert arpabet_to_ipa("F Y UW1 CH ER0") == "fjut͡ʃɜ˞"

    def test_all_entries_are_valid_arpabet(self):
        from everyvoice_tpu.text.english_lexicon import (
            ARPABET_LEXICON,
            G2P_ARPA_TO_IPA,
        )

        for word, pron in ARPABET_LEXICON.items():
            for token in pron.split():
                phone = token.rstrip("012")
                assert phone in G2P_ARPA_TO_IPA, (word, token)
                # every vowel must carry a stress digit, consonants none
                if phone in ("AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER",
                             "EY", "IH", "IY", "OW", "OY", "UH", "UW"):
                    assert token[-1] in "012", (word, token)

    def test_morphological_extension(self):
        from everyvoice_tpu.text.english_lexicon import lookup

        assert lookup("books") == "bʊks"          # voiceless + s
        assert lookup("words") == "wɜ˞dz"          # voiced + z
        assert lookup("places") == "pleɪsɪz"       # sibilant + ɪz
        assert lookup("walked") == "wɔkt"          # voiceless + t
        assert lookup("loved") == "lʌvd"           # voiced + d
        assert lookup("wanted") == "wɑntɪd"        # t/d + ɪd
        assert lookup("asking") == "æskɪŋ"         # -ing
        assert lookup("making") == "meɪkɪŋ"        # e-drop -ing
        assert lookup("quickly") == "kwɪkli"       # -ly
        assert lookup("world's") == "wɜ˞ldz"       # possessive
        assert lookup("zzzq") is None              # true OOV → LTS

    def test_lexicon_scale(self):
        """Round 3 required the lexicon to stop being ~100 words; round 5
        grew it to 5,018 LJ-targeted entries (batch 10). Pin the floor so it
        never shrinks back."""
        from everyvoice_tpu.text.english_lexicon import ARPABET_LEXICON

        assert len(ARPABET_LEXICON) >= 5000

    def test_hyphenated_compounds(self):
        from everyvoice_tpu.text.english_g2p import english_g2p

        assert "".join(english_g2p("deep-seated")) == "dipsitɪd"
