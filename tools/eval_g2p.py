"""G2P evaluation: held-out LTS accuracy + LJ-corpus lexicon coverage.

Two measurements (round-5 verdict items):

1. **Held-out letter-to-sound accuracy.** The ARPABET lexicon is split by
   a deterministic hash (md5(word) % 10 == 0 → held-out, ~10%); the LTS
   rules (which never consult the lexicon) are scored on the held-out
   entries against the lexicon's own pronunciations — a fair proxy for
   true-OOV behavior. Rule development tunes on the held-IN slice only
   (everyvoice_tpu/text/english_g2p.py SUFFIX_RULES docstring); the
   held-out floors are pinned in tests/test_g2p_accuracy.py.

2. **LJ coverage / OOV rate.** Lexicon + morphology coverage over the
   full LJSpeech transcript vocabulary
   (reference everyvoice/filelists/lj_full.psv, 13,100 utterances),
   hyphen-aware (english_g2p derives compounds per part).

Run: python tools/eval_g2p.py
Prints one JSON line per measurement.
"""

import collections
import hashlib
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LJ_FILELIST = Path("/root/reference/everyvoice/filelists/lj_full.psv")


def is_held_out(word: str) -> bool:
    return int(hashlib.md5(word.encode()).hexdigest(), 16) % 10 == 0


def levenshtein(a: str, b: str) -> int:
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


def lts_heldout_metrics() -> dict:
    from everyvoice_tpu.text.english_g2p import _letters_to_sound
    from everyvoice_tpu.text.english_lexicon import (
        ARPABET_LEXICON,
        arpabet_to_ipa,
    )

    items = [
        (w, arpabet_to_ipa(p))
        for w, p in ARPABET_LEXICON.items()
        if is_held_out(w) and "'" not in w and " " not in w
    ]
    total = match = dist = gold_len = 0
    for word, gold in items:
        ours = _letters_to_sound(word.replace("-", ""))
        total += 1
        match += ours == gold
        dist += levenshtein(ours, gold)
        gold_len += len(gold)
    return {
        "metric": "LTS held-out accuracy (true-OOV fallback)",
        "held_out_entries": total,
        "word_accuracy": round(match / total, 4),
        "phone_error_rate": round(dist / gold_len, 4),
    }


def lj_coverage_metrics() -> dict:
    from everyvoice_tpu.text.english_lexicon import (
        ARPABET_LEXICON,
        lookup,
    )

    def covered(w):
        if lookup(w) is not None:
            return True
        if "-" in w:
            parts = [p for p in w.split("-") if p]
            return bool(parts) and all(lookup(p) is not None for p in parts)
        return False

    vocab = collections.Counter()
    for line in LJ_FILELIST.read_text(encoding="utf-8").splitlines():
        for w in re.findall(r"[A-Za-z][A-Za-z'-]*", line.split("|")[1]):
            vocab[w.lower()] += 1
    total_tokens = sum(vocab.values())
    covered_tokens = sum(c for w, c in vocab.items() if covered(w))
    covered_types = sum(1 for w in vocab if covered(w))
    return {
        "metric": "lexicon+morphology coverage of the full LJ transcript",
        "lexicon_entries": len(ARPABET_LEXICON),
        "vocab_types": len(vocab),
        "vocab_tokens": total_tokens,
        "token_coverage": round(covered_tokens / total_tokens, 4),
        "type_coverage": round(covered_types / len(vocab), 4),
        "token_oov_rate": round(1 - covered_tokens / total_tokens, 4),
    }


def main() -> None:
    print(json.dumps(lts_heldout_metrics()))
    if LJ_FILELIST.exists():
        print(json.dumps(lj_coverage_metrics()))
    else:
        print(json.dumps({"metric": "lj coverage", "skipped": "no reference mount"}))


if __name__ == "__main__":
    main()
