"""English pronunciation lexicon (ARPABET, CMUdict conventions).

The reference's English G2P is the `g2p` library's trained `eng`→`eng-ipa`
transducer (reference everyvoice/text/phonemizer.py:20-110), which is
CMUdict-derived: its IPA output is the ARPABET pronunciation with stress
digits dropped, AH→ʌ, ER→ɜ˞ (verified against the reference-produced
phones in reference everyvoice/tests/data/metadata_phones.psv). That
library is not installable here, so this module ships a from-scratch
ARPABET exception lexicon covering the high-frequency English vocabulary
plus the LJ/golden test corpus; `english_g2p` extends it morphologically
(plural/possessive/past/progressive/adverbial suffixes) and falls back to
letter-to-sound rules for true OOV words.

Entries are space-separated ARPABET with stress digits. Accuracy against
the reference-produced goldens is pinned by tests/test_g2p_accuracy.py.
"""

from __future__ import annotations

ARPABET_LEXICON: dict = {
    # ---- function words / pronouns / auxiliaries ----
    "a": "AH0", "an": "AE1 N", "the": "DH AH0",
    "and": "AH0 N D", "or": "AO1 R", "but": "B AH1 T", "nor": "N AO1 R",
    "of": "AH1 V", "to": "T UW1", "in": "IH0 N", "on": "AA1 N",
    "at": "AE1 T", "by": "B AY1", "for": "F AO1 R", "with": "W IH1 DH",
    "from": "F R AH1 M", "into": "IH0 N T UW1", "onto": "AA1 N T UW2",
    "as": "AE1 Z", "is": "IH1 Z", "was": "W AA1 Z", "were": "W ER0",
    "are": "AA1 R", "be": "B IY1", "been": "B IH1 N", "being": "B IY1 IH0 NG",
    "am": "AE1 M", "it": "IH1 T", "its": "IH1 T S", "itself": "IH0 T S EH1 L F",
    "he": "HH IY1", "him": "HH IH1 M", "his": "HH IH1 Z",
    "she": "SH IY1", "her": "HH ER0", "hers": "HH ER1 Z",
    "they": "DH EY1", "them": "DH EH1 M", "their": "DH EH1 R",
    "theirs": "DH EH1 R Z", "we": "W IY1", "us": "AH1 S", "our": "AW1 ER0",
    "ours": "AW1 ER0 Z", "i": "AY1", "me": "M IY1", "my": "M AY1",
    "mine": "M AY1 N", "you": "Y UW1", "your": "Y AO1 R",
    "yours": "Y AO1 R Z", "who": "HH UW1", "whom": "HH UW1 M",
    "whose": "HH UW1 Z", "which": "W IH1 CH", "what": "W AH1 T",
    "that": "DH AE1 T", "this": "DH IH1 S", "these": "DH IY1 Z",
    "those": "DH OW1 Z", "there": "DH EH1 R", "here": "HH IY1 R",
    "where": "W EH1 R", "when": "W EH1 N", "why": "W AY1", "how": "HH AW1",
    "not": "N AA1 T", "no": "N OW1", "yes": "Y EH1 S", "if": "IH1 F",
    "then": "DH EH1 N", "than": "DH AE1 N", "so": "S OW1", "too": "T UW1",
    "very": "V EH1 R IY0", "just": "JH AH1 S T", "also": "AO1 L S OW0",
    "only": "OW1 N L IY0", "both": "B OW1 TH", "each": "IY1 CH",
    "either": "IY1 DH ER0", "neither": "N IY1 DH ER0", "all": "AO1 L",
    "any": "EH1 N IY0", "some": "S AH1 M", "such": "S AH1 CH",
    "own": "OW1 N", "same": "S EY1 M", "other": "AH1 DH ER0",
    "others": "AH1 DH ER0 Z", "another": "AH0 N AH1 DH ER0",
    "more": "M AO1 R", "most": "M OW1 S T", "less": "L EH1 S",
    "least": "L IY1 S T", "many": "M EH1 N IY0", "much": "M AH1 CH",
    "few": "F Y UW1", "several": "S EH1 V R AH0 L", "every": "EH1 V R IY0",
    "none": "N AH1 N", "nothing": "N AH1 TH IH0 NG",
    "something": "S AH1 M TH IH0 NG", "anything": "EH1 N IY0 TH IH2 NG",
    "everything": "EH1 V R IY0 TH IH2 NG", "someone": "S AH1 M W AH2 N",
    "anyone": "EH1 N IY0 W AH2 N", "everyone": "EH1 V R IY0 W AH2 N",
    "nobody": "N OW1 B AA2 D IY0", "somebody": "S AH1 M B AA2 D IY0",
    "can": "K AE1 N", "cannot": "K AE1 N AA0 T", "could": "K UH1 D",
    "will": "W IH1 L", "would": "W UH1 D", "shall": "SH AE1 L",
    "should": "SH UH1 D", "may": "M EY1", "might": "M AY1 T",
    "must": "M AH1 S T", "do": "D UW1", "does": "D AH1 Z", "did": "D IH1 D",
    "done": "D AH1 N", "have": "HH AE1 V", "has": "HH AE1 Z",
    "had": "HH AE1 D", "having": "HH AE1 V IH0 NG",
    "about": "AH0 B AW1 T", "above": "AH0 B AH1 V", "across": "AH0 K R AO1 S",
    "after": "AE1 F T ER0", "against": "AH0 G EH1 N S T",
    "along": "AH0 L AO1 NG", "among": "AH0 M AH1 NG",
    "around": "ER0 AW1 N D", "before": "B IH0 F AO1 R",
    "behind": "B IH0 HH AY1 N D", "below": "B IH0 L OW1",
    "beneath": "B IH0 N IY1 TH", "beside": "B IH0 S AY1 D",
    "between": "B IH0 T W IY1 N", "beyond": "B IH0 AA1 N D",
    "during": "D UH1 R IH0 NG", "except": "IH0 K S EH1 P T",
    "inside": "IH2 N S AY1 D", "outside": "AW1 T S AY1 D",
    "near": "N IH1 R", "off": "AO1 F", "out": "AW1 T", "over": "OW1 V ER0",
    "under": "AH1 N D ER0", "through": "TH R UW1", "throughout":
    "TH R UW0 AW1 T", "toward": "T AH0 W AO1 R D", "towards":
    "T AH0 W AO1 R D Z", "until": "AH0 N T IH1 L", "upon": "AH0 P AA1 N",
    "within": "W IH0 DH IH1 N", "without": "W IH0 TH AW1 T",
    "up": "AH1 P", "down": "D AW1 N", "again": "AH0 G EH1 N",
    "once": "W AH1 N S", "twice": "T W AY1 S", "always": "AO1 L W EY2 Z",
    "never": "N EH1 V ER0", "often": "AO1 F AH0 N",
    "sometimes": "S AH1 M T AY2 M Z", "usually": "Y UW1 ZH AH0 W AH0 L IY0",
    "perhaps": "P ER0 HH AE1 P S", "maybe": "M EY1 B IY0",
    "almost": "AO1 L M OW2 S T", "already": "AO0 L R EH1 D IY0",
    "still": "S T IH1 L", "yet": "Y EH1 T", "even": "IY1 V IH0 N",
    "ever": "EH1 V ER0", "however": "HH AW2 EH1 V ER0",
    "therefore": "DH EH1 R F AO2 R", "thus": "DH AH1 S",
    "instead": "IH0 N S T EH1 D", "rather": "R AE1 DH ER0",
    "quite": "K W AY1 T", "indeed": "IH0 N D IY1 D",
    "moreover": "M AO0 R OW1 V ER0", "meanwhile": "M IY1 N W AY2 L",
    "although": "AO0 L DH OW1", "though": "DH OW1", "while": "W AY1 L",
    "whether": "W EH1 DH ER0", "because": "B IH0 K AO1 Z",
    "since": "S IH1 N S", "unless": "AH0 N L EH1 S",
    "whereas": "W EH0 R AE1 Z", "despite": "D IH0 S P AY1 T",
    "per": "P ER1", "via": "V AY1 AH0", "versus": "V ER1 S AH0 S",
    "etc": "EH0 T S EH1 T ER0 AH0",

    # ---- numbers / time ----
    "one": "W AH1 N", "two": "T UW1", "three": "TH R IY1",
    "four": "F AO1 R", "five": "F AY1 V", "six": "S IH1 K S",
    "seven": "S EH1 V AH0 N", "eight": "EY1 T", "nine": "N AY1 N",
    "ten": "T EH1 N", "eleven": "IH0 L EH1 V AH0 N",
    "twelve": "T W EH1 L V", "thirteen": "TH ER1 T IY1 N",
    "fourteen": "F AO1 R T IY1 N", "fifteen": "F IH1 F T IY1 N",
    "sixteen": "S IH0 K S T IY1 N", "seventeen": "S EH1 V AH0 N T IY1 N",
    "eighteen": "EY0 T IY1 N", "nineteen": "N AY1 N T IY1 N",
    "twenty": "T W EH1 N T IY0", "thirty": "TH ER1 D IY0",
    "forty": "F AO1 R T IY0", "fifty": "F IH1 F T IY0",
    "sixty": "S IH1 K S T IY0", "seventy": "S EH1 V AH0 N T IY0",
    "eighty": "EY1 T IY0", "ninety": "N AY1 N T IY0",
    "hundred": "HH AH1 N D R AH0 D", "thousand": "TH AW1 Z AH0 N D",
    "million": "M IH1 L Y AH0 N", "billion": "B IH1 L Y AH0 N",
    "first": "F ER1 S T", "second": "S EH1 K AH0 N D", "third": "TH ER1 D",
    "fourth": "F AO1 R TH", "fifth": "F IH1 F TH", "sixth": "S IH1 K S TH",
    "seventh": "S EH1 V AH0 N TH", "eighth": "EY1 T TH",
    "ninth": "N AY1 N TH", "tenth": "T EH1 N TH", "zero": "Z IH1 R OW0",
    "half": "HH AE1 F", "quarter": "K W AO1 R T ER0",
    "monday": "M AH1 N D IY0", "tuesday": "T UW1 Z D IY0",
    "wednesday": "W EH1 N Z D IY0", "thursday": "TH ER1 Z D IY0",
    "friday": "F R AY1 D IY0", "saturday": "S AE1 T ER0 D IY0",
    "sunday": "S AH1 N D IY0", "january": "JH AE1 N Y UW0 EH2 R IY0",
    "february": "F EH1 B Y AH0 W EH2 R IY0", "march": "M AA1 R CH",
    "april": "EY1 P R AH0 L", "june": "JH UW1 N",
    "july": "JH UH0 L AY1", "august": "AA1 G AH0 S T",
    "september": "S EH0 P T EH1 M B ER0", "october": "AA0 K T OW1 B ER0",
    "november": "N OW0 V EH1 M B ER0", "december": "D IH0 S EH1 M B ER0",
    "today": "T AH0 D EY1", "tomorrow": "T AH0 M AA1 R OW2",
    "yesterday": "Y EH1 S T ER0 D EY2", "tonight": "T AH0 N AY1 T",
    "year": "Y IH1 R", "month": "M AH1 N TH", "week": "W IY1 K",
    "day": "D EY1", "hour": "AW1 ER0", "minute": "M IH1 N AH0 T",
    "moment": "M OW1 M AH0 N T", "morning": "M AO1 R N IH0 NG",
    "afternoon": "AE2 F T ER0 N UW1 N", "evening": "IY1 V N IH0 NG",
    "night": "N AY1 T", "time": "T AY1 M", "date": "D EY1 T",
    "century": "S EH1 N CH ER0 IY0", "decade": "D EH1 K EY0 D",
    "period": "P IH1 R IY0 AH0 D", "season": "S IY1 Z AH0 N",
    "spring": "S P R IH1 NG", "summer": "S AH1 M ER0",
    "autumn": "AO1 T AH0 M", "winter": "W IH1 N T ER0",

    # ---- common verbs ----
    "accept": "AE0 K S EH1 P T", "achieve": "AH0 CH IY1 V",
    "act": "AE1 K T", "add": "AE1 D", "admit": "AH0 D M IH1 T",
    "affect": "AH0 F EH1 K T", "afford": "AH0 F AO1 R D",
    "agree": "AH0 G R IY1", "allow": "AH0 L AW1", "announce":
    "AH0 N AW1 N S", "answer": "AE1 N S ER0", "appear": "AH0 P IH1 R",
    "apply": "AH0 P L AY1", "argue": "AA1 R G Y UW0",
    "arrive": "ER0 AY1 V", "ask": "AE1 S K", "assume": "AH0 S UW1 M",
    "attack": "AH0 T AE1 K", "attempt": "AH0 T EH1 M P T",
    "attend": "AH0 T EH1 N D", "avoid": "AH0 V OY1 D",
    "base": "B EY1 S", "bear": "B EH1 R", "beat": "B IY1 T",
    "become": "B IH0 K AH1 M", "became": "B IH0 K EY1 M",
    "begin": "B IH0 G IH1 N", "began": "B IH0 G AE1 N",
    "begun": "B IH0 G AH1 N", "behave": "B IH0 HH EY1 V",
    "believe": "B IH0 L IY1 V", "belong": "B IH0 L AO1 NG",
    "break": "B R EY1 K", "broke": "B R OW1 K", "broken": "B R OW1 K AH0 N",
    "bring": "B R IH1 NG", "brought": "B R AO1 T", "build": "B IH1 L D",
    "built": "B IH1 L T", "buy": "B AY1", "bought": "B AO1 T",
    "call": "K AO1 L", "care": "K EH1 R", "carry": "K AE1 R IY0",
    "catch": "K AE1 CH", "caught": "K AO1 T", "cause": "K AO1 Z",
    "change": "CH EY1 N JH", "charge": "CH AA1 R JH", "check": "CH EH1 K",
    "choose": "CH UW1 Z", "chose": "CH OW1 Z", "chosen": "CH OW1 Z AH0 N",
    "claim": "K L EY1 M", "climb": "K L AY1 M", "close": "K L OW1 Z",
    "come": "K AH1 M", "came": "K EY1 M", "coming": "K AH1 M IH0 NG",
    "compare": "K AH0 M P EH1 R", "complete": "K AH0 M P L IY1 T",
    "concern": "K AH0 N S ER1 N", "conclude": "K AH0 N K L UW1 D",
    "conduct": "K AH0 N D AH1 K T", "confirm": "K AH0 N F ER1 M",
    "connect": "K AH0 N EH1 K T", "consider": "K AH0 N S IH1 D ER0",
    "consist": "K AH0 N S IH1 S T", "contain": "K AH0 N T EY1 N",
    "continue": "K AH0 N T IH1 N Y UW0", "contribute":
    "K AH0 N T R IH1 B Y UW0 T", "control": "K AH0 N T R OW1 L",
    "cost": "K AO1 S T", "count": "K AW1 N T", "cover": "K AH1 V ER0",
    "create": "K R IY0 EY1 T", "cross": "K R AO1 S", "cry": "K R AY1",
    "cut": "K AH1 T", "deal": "D IY1 L", "dealt": "D EH1 L T",
    "decide": "D IH0 S AY1 D", "declare": "D IH0 K L EH1 R",
    "define": "D IH0 F AY1 N", "deliver": "D IH0 L IH1 V ER0",
    "demand": "D IH0 M AE1 N D", "deny": "D IH0 N AY1",
    "depend": "D IH0 P EH1 N D", "describe": "D IH0 S K R AY1 B",
    "deserve": "D IH0 Z ER1 V", "design": "D IH0 Z AY1 N",
    "destroy": "D IH0 S T R OY1", "determine": "D IH0 T ER1 M AH0 N",
    "develop": "D IH0 V EH1 L AH0 P", "die": "D AY1",
    "disappear": "D IH2 S AH0 P IH1 R", "discover": "D IH0 S K AH1 V ER0",
    "discuss": "D IH0 S K AH1 S", "divide": "D IH0 V AY1 D",
    "draw": "D R AO1", "drew": "D R UW1", "drawn": "D R AO1 N",
    "dream": "D R IY1 M", "drink": "D R IH1 NG K", "drank": "D R AE1 NG K",
    "drive": "D R AY1 V", "drove": "D R OW1 V", "driven": "D R IH1 V AH0 N",
    "drop": "D R AA1 P", "earn": "ER1 N", "eat": "IY1 T", "ate": "EY1 T",
    "eaten": "IY1 T AH0 N", "enable": "EH0 N EY1 B AH0 L",
    "encourage": "EH0 N K ER1 IH0 JH", "enjoy": "EH0 N JH OY1",
    "ensure": "EH0 N SH UH1 R", "enter": "EH1 N T ER0",
    "establish": "IH0 S T AE1 B L IH0 SH", "examine": "IH0 G Z AE1 M IH0 N",
    "exist": "IH0 G Z IH1 S T", "expect": "IH0 K S P EH1 K T",
    "explain": "IH0 K S P L EY1 N", "express": "IH0 K S P R EH1 S",
    "extend": "IH0 K S T EH1 N D", "face": "F EY1 S", "fail": "F EY1 L",
    "fall": "F AO1 L", "fell": "F EH1 L", "fallen": "F AA1 L AH0 N",
    "feed": "F IY1 D", "fed": "F EH1 D", "feel": "F IY1 L",
    "felt": "F EH1 L T", "fight": "F AY1 T", "fought": "F AO1 T",
    "fill": "F IH1 L", "find": "F AY1 N D", "found": "F AW1 N D",
    "finish": "F IH1 N IH0 SH", "fit": "F IH1 T", "fly": "F L AY1",
    "flew": "F L UW1", "flown": "F L OW1 N", "focus": "F OW1 K AH0 S",
    "follow": "F AA1 L OW0", "force": "F AO1 R S", "forget": "F ER0 G EH1 T",
    "forgot": "F ER0 G AA1 T", "forgotten": "F ER0 G AA1 T AH0 N",
    "form": "F AO1 R M", "gain": "G EY1 N", "get": "G EH1 T",
    "got": "G AA1 T", "gotten": "G AA1 T AH0 N", "getting": "G EH1 T IH0 NG",
    "give": "G IH1 V", "gave": "G EY1 V", "given": "G IH1 V AH0 N",
    "go": "G OW1", "went": "W EH1 N T", "gone": "G AO1 N",
    "going": "G OW1 IH0 NG", "goes": "G OW1 Z", "grow": "G R OW1",
    "grew": "G R UW1", "grown": "G R OW1 N", "guess": "G EH1 S",
    "handle": "HH AE1 N D AH0 L", "happen": "HH AE1 P AH0 N",
    "hate": "HH EY1 T", "hang": "HH AE1 NG", "hung": "HH AH1 NG",
    "head": "HH EH1 D", "hear": "HH IY1 R", "heard": "HH ER1 D",
    "help": "HH EH1 L P", "hide": "HH AY1 D", "hid": "HH IH1 D",
    "hidden": "HH IH1 D AH0 N", "hit": "HH IH1 T", "hold": "HH OW1 L D",
    "held": "HH EH1 L D", "hope": "HH OW1 P", "hurt": "HH ER1 T",
    "identify": "AY0 D EH1 N T AH0 F AY2", "ignore": "IH0 G N AO1 R",
    "imagine": "IH0 M AE1 JH AH0 N", "improve": "IH0 M P R UW1 V",
    "include": "IH0 N K L UW1 D", "increase": "IH0 N K R IY1 S",
    "indicate": "IH1 N D AH0 K EY2 T", "intend": "IH0 N T EH1 N D",
    "introduce": "IH2 N T R AH0 D UW1 S", "invite": "IH0 N V AY1 T",
    "involve": "IH0 N V AA1 L V", "join": "JH OY1 N", "jump": "JH AH1 M P",
    "keep": "K IY1 P", "kept": "K EH1 P T", "kill": "K IH1 L",
    "know": "N OW1", "knew": "N UW1", "known": "N OW1 N",
    "laugh": "L AE1 F", "launch": "L AO1 N CH", "lay": "L EY1",
    "laid": "L EY1 D", "lead": "L IY1 D", "led": "L EH1 D",
    "learn": "L ER1 N", "leave": "L IY1 V", "left": "L EH1 F T",
    "lend": "L EH1 N D", "lent": "L EH1 N T", "let": "L EH1 T",
    "lie": "L AY1", "lift": "L IH1 F T", "like": "L AY1 K",
    "listen": "L IH1 S AH0 N", "live": "L IH1 V", "look": "L UH1 K",
    "lose": "L UW1 Z", "lost": "L AO1 S T", "love": "L AH1 V",
    "maintain": "M EY0 N T EY1 N", "make": "M EY1 K", "made": "M EY1 D",
    "making": "M EY1 K IH0 NG", "manage": "M AE1 N IH0 JH",
    "mark": "M AA1 R K", "matter": "M AE1 T ER0", "mean": "M IY1 N",
    "meant": "M EH1 N T", "measure": "M EH1 ZH ER0", "meet": "M IY1 T",
    "met": "M EH1 T", "mention": "M EH1 N SH AH0 N", "mind": "M AY1 N D",
    "miss": "M IH1 S", "move": "M UW1 V", "need": "N IY1 D",
    "notice": "N OW1 T AH0 S", "obtain": "AH0 B T EY1 N",
    "occur": "AH0 K ER1", "offer": "AO1 F ER0", "open": "OW1 P AH0 N",
    "operate": "AA1 P ER0 EY2 T", "order": "AO1 R D ER0",
    "organize": "AO1 R G AH0 N AY2 Z", "own": "OW1 N", "pass": "P AE1 S",
    "pay": "P EY1", "paid": "P EY1 D", "perform": "P ER0 F AO1 R M",
    "pick": "P IH1 K", "place": "P L EY1 S", "plan": "P L AE1 N",
    "play": "P L EY1", "point": "P OY1 N T", "prefer": "P R IH0 F ER1",
    "prepare": "P R IY0 P EH1 R", "present": "P R IH0 Z EH1 N T",
    "press": "P R EH1 S", "prevent": "P R IH0 V EH1 N T",
    "produce": "P R AH0 D UW1 S", "promise": "P R AA1 M AH0 S",
    "propose": "P R AH0 P OW1 Z", "protect": "P R AH0 T EH1 K T",
    "prove": "P R UW1 V", "provide": "P R AH0 V AY1 D",
    "publish": "P AH1 B L IH0 SH", "pull": "P UH1 L", "push": "P UH1 SH",
    "put": "P UH1 T", "raise": "R EY1 Z", "reach": "R IY1 CH",
    "read": "R IY1 D", "realize": "R IY1 AH0 L AY2 Z",
    "receive": "R IH0 S IY1 V", "recognize": "R EH1 K AH0 G N AY2 Z",
    "recommend": "R EH2 K AH0 M EH1 N D", "reduce": "R IH0 D UW1 S",
    "refer": "R IH0 F ER1", "reflect": "R IH0 F L EH1 K T",
    "refuse": "R IH0 F Y UW1 Z", "regard": "R IH0 G AA1 R D",
    "relate": "R IH0 L EY1 T", "release": "R IH0 L IY1 S",
    "remain": "R IH0 M EY1 N", "remember": "R IH0 M EH1 M B ER0",
    "remove": "R IY0 M UW1 V", "repeat": "R IH0 P IY1 T",
    "replace": "R IY0 P L EY1 S", "reply": "R IH0 P L AY1",
    "report": "R IH0 P AO1 R T", "represent": "R EH2 P R IH0 Z EH1 N T",
    "require": "R IY0 K W AY1 ER0", "respond": "R IH0 S P AA1 N D",
    "rest": "R EH1 S T", "result": "R IH0 Z AH1 L T",
    "return": "R IH0 T ER1 N", "reveal": "R IH0 V IY1 L",
    "ride": "R AY1 D", "rode": "R OW1 D", "ridden": "R IH1 D AH0 N",
    "ring": "R IH1 NG", "rang": "R AE1 NG", "rung": "R AH1 NG",
    "rise": "R AY1 Z", "rose": "R OW1 Z", "risen": "R IH1 Z AH0 N",
    "run": "R AH1 N", "ran": "R AE1 N", "running": "R AH1 N IH0 NG",
    "save": "S EY1 V", "say": "S EY1", "said": "S EH1 D",
    "says": "S EH1 Z", "see": "S IY1", "saw": "S AO1", "seen": "S IY1 N",
    "seek": "S IY1 K", "sought": "S AO1 T", "seem": "S IY1 M",
    "sell": "S EH1 L", "sold": "S OW1 L D", "send": "S EH1 N D",
    "sent": "S EH1 N T", "serve": "S ER1 V", "set": "S EH1 T",
    "settle": "S EH1 T AH0 L", "shake": "SH EY1 K", "shook": "SH UH1 K",
    "shaken": "SH EY1 K AH0 N", "share": "SH EH1 R", "shoot": "SH UW1 T",
    "shot": "SH AA1 T", "show": "SH OW1", "shown": "SH OW1 N",
    "shut": "SH AH1 T", "sing": "S IH1 NG", "sang": "S AE1 NG",
    "sung": "S AH1 NG", "sit": "S IH1 T", "sat": "S AE1 T",
    "sleep": "S L IY1 P", "slept": "S L EH1 P T", "smile": "S M AY1 L",
    "speak": "S P IY1 K", "spoke": "S P OW1 K", "spoken": "S P OW1 K AH0 N",
    "spend": "S P EH1 N D", "spent": "S P EH1 N T", "stand": "S T AE1 N D",
    "stood": "S T UH1 D", "start": "S T AA1 R T", "state": "S T EY1 T",
    "stay": "S T EY1", "steal": "S T IY1 L", "stole": "S T OW1 L",
    "stolen": "S T OW1 L AH0 N", "stick": "S T IH1 K", "stuck": "S T AH1 K",
    "stop": "S T AA1 P", "strike": "S T R AY1 K", "struck": "S T R AH1 K",
    "study": "S T AH1 D IY0", "succeed": "S AH0 K S IY1 D",
    "suffer": "S AH1 F ER0", "suggest": "S AH0 G JH EH1 S T",
    "supply": "S AH0 P L AY1", "support": "S AH0 P AO1 R T",
    "suppose": "S AH0 P OW1 Z", "survive": "S ER0 V AY1 V",
    "take": "T EY1 K", "took": "T UH1 K", "taken": "T EY1 K AH0 N",
    "taking": "T EY1 K IH0 NG", "talk": "T AO1 K", "teach": "T IY1 CH",
    "taught": "T AO1 T", "tell": "T EH1 L", "told": "T OW1 L D",
    "tend": "T EH1 N D", "test": "T EH1 S T", "thank": "TH AE1 NG K",
    "think": "TH IH1 NG K", "thought": "TH AO1 T", "throw": "TH R OW1",
    "threw": "TH R UW1", "thrown": "TH R OW1 N", "touch": "T AH1 CH",
    "train": "T R EY1 N", "travel": "T R AE1 V AH0 L", "treat": "T R IY1 T",
    "try": "T R AY1", "turn": "T ER1 N", "understand":
    "AH2 N D ER0 S T AE1 N D", "understood": "AH2 N D ER0 S T UH1 D",
    "use": "Y UW1 Z", "used": "Y UW1 Z D", "using": "Y UW1 Z IH0 NG",
    "visit": "V IH1 Z AH0 T", "vote": "V OW1 T", "wait": "W EY1 T",
    "wake": "W EY1 K", "woke": "W OW1 K", "walk": "W AO1 K",
    "want": "W AA1 N T", "warn": "W AO1 R N", "wash": "W AA1 SH",
    "watch": "W AA1 CH", "wear": "W EH1 R", "wore": "W AO1 R",
    "worn": "W AO1 R N", "win": "W IH1 N", "won": "W AH1 N",
    "wish": "W IH1 SH", "wonder": "W AH1 N D ER0", "work": "W ER1 K",
    "worry": "W ER1 IY0", "write": "R AY1 T", "wrote": "R OW1 T",
    "written": "R IH1 T AH0 N", "writing": "R AY1 T IH0 NG",

    # ---- common nouns ----
    "ability": "AH0 B IH1 L AH0 T IY0", "account": "AH0 K AW1 N T",
    "action": "AE1 K SH AH0 N", "activity": "AE0 K T IH1 V AH0 T IY0",
    "address": "AH0 D R EH1 S", "administration":
    "AH0 D M IH2 N IH0 S T R EY1 SH AH0 N", "advance": "AH0 D V AE1 N S",
    "advantage": "AH0 D V AE1 N T IH0 JH", "advice": "AH0 D V AY1 S",
    "age": "EY1 JH", "agency": "EY1 JH AH0 N S IY0",
    "agent": "EY1 JH AH0 N T", "agreement": "AH0 G R IY1 M AH0 N T",
    "air": "EH1 R", "amount": "AH0 M AW1 N T",
    "analysis": "AH0 N AE1 L AH0 S AH0 S", "animal": "AE1 N AH0 M AH0 L",
    "approach": "AH0 P R OW1 CH", "area": "EH1 R IY0 AH0",
    "argument": "AA1 R G Y AH0 M AH0 N T", "arm": "AA1 R M",
    "army": "AA1 R M IY0", "art": "AA1 R T", "article": "AA1 R T AH0 K AH0 L",
    "attention": "AH0 T EH1 N SH AH0 N", "attitude": "AE1 T AH0 T UW2 D",
    "audience": "AA1 D IY0 AH0 N S", "authority": "AH0 TH AO1 R AH0 T IY0",
    "baby": "B EY1 B IY0", "back": "B AE1 K", "ball": "B AO1 L",
    "bank": "B AE1 NG K", "bed": "B EH1 D", "benefit": "B EH1 N AH0 F IH0 T",
    "bill": "B IH1 L", "bird": "B ER1 D", "blood": "B L AH1 D",
    "board": "B AO1 R D", "boat": "B OW1 T", "body": "B AA1 D IY0",
    "book": "B UH1 K", "box": "B AA1 K S", "boy": "B OY1",
    "brain": "B R EY1 N", "branch": "B R AE1 N CH", "bread": "B R EH1 D",
    "brother": "B R AH1 DH ER0", "budget": "B AH1 JH IH0 T",
    "building": "B IH1 L D IH0 NG", "business": "B IH1 Z N AH0 S",
    "camera": "K AE1 M ER0 AH0", "campaign": "K AE0 M P EY1 N",
    "capital": "K AE1 P AH0 T AH0 L", "car": "K AA1 R",
    "card": "K AA1 R D", "case": "K EY1 S", "cell": "S EH1 L",
    "center": "S EH1 N T ER0", "chair": "CH EH1 R",
    "chairman": "CH EH1 R M AH0 N", "chance": "CH AE1 N S",
    "character": "K EH1 R IH0 K T ER0", "charge": "CH AA1 R JH",
    "chief": "CH IY1 F", "child": "CH AY1 L D",
    "children": "CH IH1 L D R AH0 N", "choice": "CH OY1 S",
    "church": "CH ER1 CH", "citizen": "S IH1 T AH0 Z AH0 N",
    "city": "S IH1 T IY0", "class": "K L AE1 S", "college": "K AA1 L IH0 JH",
    "color": "K AH1 L ER0", "committee": "K AH0 M IH1 T IY0",
    "community": "K AH0 M Y UW1 N AH0 T IY0",
    "company": "K AH1 M P AH0 N IY0", "computer": "K AH0 M P Y UW1 T ER0",
    "concept": "K AA1 N S EH0 P T", "condition": "K AH0 N D IH1 SH AH0 N",
    "conference": "K AA1 N F R AH0 N S", "congress": "K AA1 NG G R AH0 S",
    "consequence": "K AA1 N S AH0 K W EH2 N S", "cost": "K AO1 S T",
    "country": "K AH1 N T R IY0", "couple": "K AH1 P AH0 L",
    "course": "K AO1 R S", "court": "K AO1 R T", "crime": "K R AY1 M",
    "culture": "K AH1 L CH ER0", "cup": "K AH1 P",
    "current": "K ER1 AH0 N T", "customer": "K AH1 S T AH0 M ER0",
    "data": "D EY1 T AH0", "daughter": "D AO1 T ER0", "death": "D EH1 TH",
    "debate": "D AH0 B EY1 T", "decision": "D IH0 S IH1 ZH AH0 N",
    "defense": "D IH0 F EH1 N S", "degree": "D IH0 G R IY1",
    "department": "D IH0 P AA1 R T M AH0 N T", "detail": "D IH0 T EY1 L",
    "difference": "D IH1 F ER0 AH0 N S", "dinner": "D IH1 N ER0",
    "direction": "D ER0 EH1 K SH AH0 N", "director": "D ER0 EH1 K T ER0",
    "discussion": "D IH0 S K AH1 SH AH0 N", "disease": "D IH0 Z IY1 Z",
    "doctor": "D AA1 K T ER0", "dog": "D AO1 G", "door": "D AO1 R",
    "dream": "D R IY1 M", "drug": "D R AH1 G", "ear": "IY1 R",
    "earth": "ER1 TH", "east": "IY1 S T", "economy": "IH0 K AA1 N AH0 M IY0",
    "edge": "EH1 JH", "education": "EH2 JH AH0 K EY1 SH AH0 N",
    "effect": "IH0 F EH1 K T", "effort": "EH1 F ER0 T", "egg": "EH1 G",
    "election": "IH0 L EH1 K SH AH0 N", "end": "EH1 N D",
    "energy": "EH1 N ER0 JH IY0", "environment":
    "IH0 N V AY1 R AH0 N M AH0 N T", "equipment": "IH0 K W IH1 P M AH0 N T",
    "error": "EH1 R ER0", "evidence": "EH1 V AH0 D AH0 N S",
    "example": "IH0 G Z AE1 M P AH0 L", "experience":
    "IH0 K S P IH1 R IY0 AH0 N S", "expert": "EH1 K S P ER0 T",
    "eye": "AY1", "face": "F EY1 S", "fact": "F AE1 K T",
    "factor": "F AE1 K T ER0", "family": "F AE1 M AH0 L IY0",
    "farm": "F AA1 R M", "father": "F AA1 DH ER0", "fear": "F IH1 R",
    "feature": "F IY1 CH ER0", "field": "F IY1 L D", "figure":
    "F IH1 G Y ER0", "film": "F IH1 L M", "finger": "F IH1 NG G ER0",
    "fire": "F AY1 ER0", "firm": "F ER1 M", "fish": "F IH1 SH",
    "floor": "F L AO1 R", "food": "F UW1 D", "foot": "F UH1 T",
    "feet": "F IY1 T", "forest": "F AO1 R AH0 S T", "form": "F AO1 R M",
    "frame": "F R EY1 M", "friend": "F R EH1 N D", "front": "F R AH1 N T",
    "fund": "F AH1 N D", "future": "F Y UW1 CH ER0", "game": "G EY1 M",
    "garden": "G AA1 R D AH0 N", "gas": "G AE1 S", "girl": "G ER1 L",
    "glass": "G L AE1 S", "goal": "G OW1 L", "government":
    "G AH1 V ER0 M AH0 N T", "ground": "G R AW1 N D",
    "group": "G R UW1 P", "growth": "G R OW1 TH", "gun": "G AH1 N",
    "guy": "G AY1", "hair": "HH EH1 R", "hand": "HH AE1 N D",
    "heart": "HH AA1 R T", "heat": "HH IY1 T", "history": "HH IH1 S T ER0 IY0",
    "home": "HH OW1 M", "horse": "HH AO1 R S", "hospital":
    "HH AA1 S P IH0 T AH0 L", "hotel": "HH OW0 T EH1 L",
    "house": "HH AW1 S", "human": "HH Y UW1 M AH0 N",
    "idea": "AY0 D IY1 AH0", "image": "IH1 M IH0 JH",
    "impact": "IH1 M P AE0 K T", "importance": "IH0 M P AO1 R T AH0 N S",
    "individual": "IH2 N D AH0 V IH1 JH AH0 W AH0 L",
    "industry": "IH1 N D AH0 S T R IY0", "information":
    "IH2 N F ER0 M EY1 SH AH0 N", "institution":
    "IH2 N S T IH0 T UW1 SH AH0 N", "interest": "IH1 N T R AH0 S T",
    "international": "IH2 N T ER0 N AE1 SH AH0 N AH0 L",
    "interview": "IH1 N T ER0 V Y UW2", "investment":
    "IH0 N V EH1 S T M AH0 N T", "issue": "IH1 SH UW0", "item": "AY1 T AH0 M",
    "job": "JH AA1 B", "judge": "JH AH1 JH", "key": "K IY1",
    "kid": "K IH1 D", "kind": "K AY1 N D", "king": "K IH1 NG",
    "kitchen": "K IH1 CH AH0 N", "knowledge": "N AA1 L IH0 JH",
    "land": "L AE1 N D", "language": "L AE1 NG G W IH0 JH",
    "law": "L AO1", "lawyer": "L AO1 Y ER0", "leader": "L IY1 D ER0",
    "leg": "L EH1 G", "letter": "L EH1 T ER0", "level": "L EH1 V AH0 L",
    "library": "L AY1 B R EH2 R IY0", "life": "L AY1 F",
    "lives": "L IH1 V Z", "light": "L AY1 T", "line": "L AY1 N",
    "list": "L IH1 S T", "literature": "L IH1 T ER0 AH0 CH ER0",
    "location": "L OW0 K EY1 SH AH0 N", "machine": "M AH0 SH IY1 N",
    "magazine": "M AE1 G AH0 Z IY2 N", "man": "M AE1 N", "men": "M EH1 N",
    "management": "M AE1 N IH0 JH M AH0 N T", "manager": "M AE1 N IH0 JH ER0",
    "manner": "M AE1 N ER0", "market": "M AA1 R K IH0 T",
    "marriage": "M EH1 R IH0 JH", "material": "M AH0 T IH1 R IY0 AH0 L",
    "matter": "M AE1 T ER0", "meaning": "M IY1 N IH0 NG",
    "media": "M IY1 D IY0 AH0", "medicine": "M EH1 D AH0 S AH0 N",
    "meeting": "M IY1 T IH0 NG", "member": "M EH1 M B ER0",
    "memory": "M EH1 M ER0 IY0", "message": "M EH1 S IH0 JH",
    "method": "M EH1 TH AH0 D", "middle": "M IH1 D AH0 L",
    "mile": "M AY1 L", "military": "M IH1 L IH0 T EH2 R IY0",
    "mind": "M AY1 N D", "mission": "M IH1 SH AH0 N",
    "model": "M AA1 D AH0 L", "money": "M AH1 N IY0",
    "mother": "M AH1 DH ER0", "mountain": "M AW1 N T AH0 N",
    "mouth": "M AW1 TH", "movement": "M UW1 V M AH0 N T",
    "movie": "M UW1 V IY0", "music": "M Y UW1 Z IH0 K",
    "name": "N EY1 M", "nation": "N EY1 SH AH0 N",
    "nature": "N EY1 CH ER0", "network": "N EH1 T W ER2 K",
    "news": "N UW1 Z", "newspaper": "N UW1 Z P EY2 P ER0",
    "north": "N AO1 R TH", "note": "N OW1 T", "number": "N AH1 M B ER0",
    "object": "AA1 B JH EH0 K T", "occasion": "AH0 K EY1 ZH AH0 N",
    "ocean": "OW1 SH AH0 N", "offer": "AO1 F ER0",
    "office": "AO1 F IH0 S", "officer": "AO1 F AH0 S ER0",
    "official": "AH0 F IH1 SH AH0 L", "oil": "OY1 L",
    "operation": "AA2 P ER0 EY1 SH AH0 N", "opinion": "AH0 P IH1 N Y AH0 N",
    "opportunity": "AA2 P ER0 T UW1 N AH0 T IY0", "option": "AA1 P SH AH0 N",
    "organization": "AO2 R G AH0 N AH0 Z EY1 SH AH0 N",
    "owner": "OW1 N ER0", "page": "P EY1 JH", "pain": "P EY1 N",
    "paper": "P EY1 P ER0", "parent": "P EH1 R AH0 N T",
    "park": "P AA1 R K", "part": "P AA1 R T", "party": "P AA1 R T IY0",
    "past": "P AE1 S T", "path": "P AE1 TH", "patient": "P EY1 SH AH0 N T",
    "pattern": "P AE1 T ER0 N", "peace": "P IY1 S", "people": "P IY1 P AH0 L",
    "percent": "P ER0 S EH1 N T", "performance": "P ER0 F AO1 R M AH0 N S",
    "person": "P ER1 S AH0 N", "phone": "F OW1 N",
    "picture": "P IH1 K CH ER0", "piece": "P IY1 S", "place": "P L EY1 S",
    "plan": "P L AE1 N", "plant": "P L AE1 N T", "player": "P L EY1 ER0",
    "point": "P OY1 N T", "police": "P AH0 L IY1 S",
    "policy": "P AA1 L AH0 S IY0", "politics": "P AA1 L AH0 T IH2 K S",
    "population": "P AA2 P Y AH0 L EY1 SH AH0 N", "position":
    "P AH0 Z IH1 SH AH0 N", "power": "P AW1 ER0", "practice":
    "P R AE1 K T AH0 S", "pressure": "P R EH1 SH ER0",
    "price": "P R AY1 S", "principle": "P R IH1 N S AH0 P AH0 L",
    "problem": "P R AA1 B L AH0 M", "process": "P R AA1 S EH0 S",
    "product": "P R AA1 D AH0 K T", "production": "P R AH0 D AH1 K SH AH0 N",
    "program": "P R OW1 G R AE2 M", "project": "P R AA1 JH EH0 K T",
    "property": "P R AA1 P ER0 T IY0", "proposal": "P R AH0 P OW1 Z AH0 L",
    "public": "P AH1 B L IH0 K", "purpose": "P ER1 P AH0 S",
    "quality": "K W AA1 L AH0 T IY0", "question": "K W EH1 S CH AH0 N",
    "radio": "R EY1 D IY0 OW2", "rain": "R EY1 N", "range": "R EY1 N JH",
    "rate": "R EY1 T", "reason": "R IY1 Z AH0 N", "record": "R EH1 K ER0 D",
    "region": "R IY1 JH AH0 N", "relation": "R IY0 L EY1 SH AH0 N",
    "relationship": "R IY0 L EY1 SH AH0 N SH IH2 P",
    "religion": "R IH0 L IH1 JH AH0 N", "research": "R IY0 S ER1 CH",
    "resource": "R IY1 S AO0 R S", "response": "R IH0 S P AA1 N S",
    "restaurant": "R EH1 S T ER0 AA2 N T", "result": "R IH0 Z AH1 L T",
    "right": "R AY1 T", "risk": "R IH1 S K", "river": "R IH1 V ER0",
    "road": "R OW1 D", "rock": "R AA1 K", "role": "R OW1 L",
    "room": "R UW1 M", "rule": "R UW1 L", "safety": "S EY1 F T IY0",
    "scene": "S IY1 N", "school": "S K UW1 L",
    "science": "S AY1 AH0 N S", "screen": "S K R IY1 N", "sea": "S IY1",
    "seat": "S IY1 T", "section": "S EH1 K SH AH0 N",
    "sense": "S EH1 N S", "series": "S IH1 R IY0 Z",
    "service": "S ER1 V AH0 S", "sign": "S AY1 N",
    "significance": "S IH0 G N IH1 F IH0 K AH0 N S",
    "situation": "S IH2 CH UW0 EY1 SH AH0 N", "size": "S AY1 Z",
    "skill": "S K IH1 L", "skin": "S K IH1 N", "sky": "S K AY1",
    "society": "S AH0 S AY1 AH0 T IY0", "son": "S AH1 N",
    "song": "S AO1 NG", "sort": "S AO1 R T", "sound": "S AW1 N D",
    "source": "S AO1 R S", "south": "S AW1 TH", "space": "S P EY1 S",
    "sport": "S P AO1 R T", "staff": "S T AE1 F", "stage": "S T EY1 JH",
    "standard": "S T AE1 N D ER0 D", "star": "S T AA1 R",
    "statement": "S T EY1 T M AH0 N T", "station": "S T EY1 SH AH0 N",
    "step": "S T EH1 P", "stock": "S T AA1 K", "store": "S T AO1 R",
    "story": "S T AO1 R IY0", "strategy": "S T R AE1 T AH0 JH IY0",
    "street": "S T R IY1 T", "structure": "S T R AH1 K CH ER0",
    "student": "S T UW1 D AH0 N T", "style": "S T AY1 L",
    "subject": "S AH1 B JH IH0 K T", "success": "S AH0 K S EH1 S",
    "sun": "S AH1 N", "surface": "S ER1 F AH0 S", "system":
    "S IH1 S T AH0 M", "table": "T EY1 B AH0 L", "task": "T AE1 S K",
    "tax": "T AE1 K S", "teacher": "T IY1 CH ER0", "team": "T IY1 M",
    "technology": "T EH0 K N AA1 L AH0 JH IY0", "television":
    "T EH1 L AH0 V IH2 ZH AH0 N", "term": "T ER1 M", "theory":
    "TH IY1 ER0 IY0", "thing": "TH IH1 NG", "thought": "TH AO1 T",
    "town": "T AW1 N", "trade": "T R EY1 D", "treatment":
    "T R IY1 T M AH0 N T", "tree": "T R IY1", "trial": "T R AY1 AH0 L",
    "trip": "T R IH1 P", "trouble": "T R AH1 B AH0 L",
    "truth": "T R UW1 TH", "type": "T AY1 P", "unit": "Y UW1 N IH0 T",
    "university": "Y UW2 N AH0 V ER1 S AH0 T IY0", "value": "V AE1 L Y UW0",
    "variety": "V ER0 AY1 AH0 T IY0", "vehicle": "V IY1 HH IH0 K AH0 L",
    "version": "V ER1 ZH AH0 N", "victim": "V IH1 K T AH0 M",
    "view": "V Y UW1", "village": "V IH1 L AH0 JH",
    "violence": "V AY1 AH0 L AH0 N S", "voice": "V OY1 S",
    "wall": "W AO1 L", "war": "W AO1 R", "water": "W AO1 T ER0",
    "wave": "W EY1 V", "weapon": "W EH1 P AH0 N", "weather": "W EH1 DH ER0",
    "west": "W EH1 S T", "whole": "HH OW1 L", "wife": "W AY1 F",
    "wind": "W IH1 N D", "window": "W IH1 N D OW0", "woman": "W UH1 M AH0 N",
    "women": "W IH1 M AH0 N", "wood": "W UH1 D", "word": "W ER1 D",
    "world": "W ER1 L D", "writer": "R AY1 T ER0", "yard": "Y AA1 R D",
    "youth": "Y UW1 TH",

    # ---- common adjectives / adverbs ----
    "able": "EY1 B AH0 L", "absolute": "AE1 B S AH0 L UW2 T",
    "active": "AE1 K T IH0 V", "actual": "AE1 K CH AH0 W AH0 L",
    "additional": "AH0 D IH1 SH AH0 N AH0 L", "available":
    "AH0 V EY1 L AH0 B AH0 L", "aware": "AH0 W EH1 R", "bad": "B AE1 D",
    "basic": "B EY1 S IH0 K", "beautiful": "B Y UW1 T AH0 F AH0 L",
    "best": "B EH1 S T", "better": "B EH1 T ER0", "big": "B IH1 G",
    "black": "B L AE1 K", "blue": "B L UW1", "bright": "B R AY1 T",
    "broad": "B R AO1 D", "brown": "B R AW1 N", "busy": "B IH1 Z IY0",
    "careful": "K EH1 R F AH0 L", "central": "S EH1 N T R AH0 L",
    "certain": "S ER1 T AH0 N", "cheap": "CH IY1 P", "clean": "K L IY1 N",
    "clear": "K L IH1 R", "cold": "K OW1 L D", "common": "K AA1 M AH0 N",
    "cool": "K UW1 L", "correct": "K ER0 EH1 K T",
    "critical": "K R IH1 T IH0 K AH0 L", "cultural": "K AH1 L CH ER0 AH0 L",
    "dangerous": "D EY1 N JH ER0 AH0 S", "dark": "D AA1 R K",
    "dead": "D EH1 D", "deep": "D IY1 P", "democratic":
    "D EH2 M AH0 K R AE1 T IH0 K", "different": "D IH1 F ER0 AH0 N T",
    "difficult": "D IH1 F AH0 K AH0 L T", "direct": "D ER0 EH1 K T",
    "dry": "D R AY1", "early": "ER1 L IY0", "easy": "IY1 Z IY0",
    "economic": "EH2 K AH0 N AA1 M IH0 K", "effective":
    "IH0 F EH1 K T IH0 V", "empty": "EH1 M P T IY0",
    "entire": "IH0 N T AY1 ER0", "environmental":
    "IH0 N V AY2 R AH0 N M EH1 N T AH0 L", "equal": "IY1 K W AH0 L",
    "especially": "AH0 S P EH1 SH L IY0", "essential": "EH0 S EH1 N SH AH0 L",
    "exact": "IH0 G Z AE1 K T", "excellent": "EH1 K S AH0 L AH0 N T",
    "expensive": "IH0 K S P EH1 N S IH0 V", "fair": "F EH1 R",
    "false": "F AO1 L S", "famous": "F EY1 M AH0 S", "far": "F AA1 R",
    "fast": "F AE1 S T", "federal": "F EH1 D ER0 AH0 L",
    "final": "F AY1 N AH0 L", "financial": "F AH0 N AE1 N SH AH0 L",
    "fine": "F AY1 N", "foreign": "F AO1 R AH0 N", "free": "F R IY1",
    "fresh": "F R EH1 SH", "full": "F UH1 L", "general": "JH EH1 N ER0 AH0 L",
    "good": "G UH1 D", "gray": "G R EY1", "green": "G R IY1 N",
    "happy": "HH AE1 P IY0", "hard": "HH AA1 R D", "healthy":
    "HH EH1 L TH IY0", "heavy": "HH EH1 V IY0", "high": "HH AY1",
    "hot": "HH AA1 T", "huge": "HH Y UW1 JH", "important":
    "IH0 M P AO1 R T AH0 N T", "impossible": "IH0 M P AA1 S AH0 B AH0 L",
    "international": "IH2 N T ER0 N AE1 SH AH0 N AH0 L",
    "large": "L AA1 R JH", "late": "L EY1 T", "legal": "L IY1 G AH0 L",
    "likely": "L AY1 K L IY0", "local": "L OW1 K AH0 L",
    "long": "L AO1 NG", "low": "L OW1", "main": "M EY1 N",
    "major": "M EY1 JH ER0", "medical": "M EH1 D AH0 K AH0 L",
    "modern": "M AA1 D ER0 N", "national": "N AE1 SH AH0 N AH0 L",
    "natural": "N AE1 CH ER0 AH0 L", "necessary": "N EH1 S AH0 S EH2 R IY0",
    "negative": "N EH1 G AH0 T IH0 V", "new": "N UW1", "nice": "N AY1 S",
    "normal": "N AO1 R M AH0 L", "official": "AH0 F IH1 SH AH0 L",
    "old": "OW1 L D", "particular": "P ER0 T IH1 K Y AH0 L ER0",
    "personal": "P ER1 S AH0 N AH0 L", "physical": "F IH1 Z IH0 K AH0 L",
    "political": "P AH0 L IH1 T AH0 K AH0 L", "poor": "P UH1 R",
    "popular": "P AA1 P Y AH0 L ER0", "positive": "P AA1 Z AH0 T IH0 V",
    "possible": "P AA1 S AH0 B AH0 L", "powerful": "P AW1 ER0 F AH0 L",
    "present": "P R EH1 Z AH0 N T", "pretty": "P R IH1 T IY0",
    "previous": "P R IY1 V IY0 AH0 S", "private": "P R AY1 V AH0 T",
    "professional": "P R AH0 F EH1 SH AH0 N AH0 L",
    "proper": "P R AA1 P ER0", "quick": "K W IH1 K", "quiet": "K W AY1 AH0 T",
    "ready": "R EH1 D IY0", "real": "R IY1 L", "recent": "R IY1 S AH0 N T",
    "red": "R EH1 D", "regular": "R EH1 G Y AH0 L ER0",
    "religious": "R IH0 L IH1 JH AH0 S", "responsible":
    "R IY0 S P AA1 N S AH0 B AH0 L", "rich": "R IH1 CH",
    "safe": "S EY1 F", "serious": "S IH1 R IY0 AH0 S",
    "short": "SH AO1 R T", "significant": "S IH0 G N IH1 F IH0 K AH0 N T",
    "similar": "S IH1 M AH0 L ER0", "simple": "S IH1 M P AH0 L",
    "single": "S IH1 NG G AH0 L", "slow": "S L OW1", "small": "S M AO1 L",
    "smart": "S M AA1 R T", "social": "S OW1 SH AH0 L",
    "soft": "S AA1 F T", "special": "S P EH1 SH AH0 L",
    "specific": "S P AH0 S IH1 F IH0 K", "strange": "S T R EY1 N JH",
    "strong": "S T R AO1 NG", "successful": "S AH0 K S EH1 S F AH0 L",
    "sure": "SH UH1 R", "sweet": "S W IY1 T", "tall": "T AO1 L",
    "thin": "TH IH1 N", "tiny": "T AY1 N IY0", "tired": "T AY1 ER0 D",
    "total": "T OW1 T AH0 L", "tough": "T AH1 F",
    "traditional": "T R AH0 D IH1 SH AH0 N AH0 L", "true": "T R UW1",
    "typical": "T IH1 P AH0 K AH0 L", "useful": "Y UW1 S F AH0 L",
    "warm": "W AO1 R M", "weak": "W IY1 K", "wet": "W EH1 T",
    "white": "W AY1 T", "wide": "W AY1 D", "wild": "W AY1 L D",
    "wonderful": "W AH1 N D ER0 F AH0 L", "wrong": "R AO1 NG",
    "yellow": "Y EH1 L OW0", "young": "Y AH1 NG",

    # ---- greetings / speech-domain ----
    "hello": "HH AH0 L OW1", "hi": "HH AY1", "goodbye": "G UH2 D B AY1",
    "please": "P L IY1 Z", "sorry": "S AA1 R IY0",
    "welcome": "W EH1 L K AH0 M", "okay": "OW2 K EY1",
    "cheese": "CH IY1 Z", "cake": "K EY1 K", "coffee": "K AA1 F IY0",
    "tea": "T IY1", "milk": "M IH1 L K", "wine": "W AY1 N",
    "speech": "S P IY1 CH", "speak": "S P IY1 K", "speaker":
    "S P IY1 K ER0", "audio": "AA1 D IY0 OW2", "text": "T EH1 K S T",
    "sentence": "S EH1 N T AH0 N S", "synthesis": "S IH1 N TH AH0 S AH0 S",
    "synthesize": "S IH1 N TH AH0 S AY2 Z", "sample": "S AE1 M P AH0 L",
    "signal": "S IH1 G N AH0 L", "frequency": "F R IY1 K W AH0 N S IY0",
    "phrase": "F R EY1 Z", "accent": "AE1 K S EH2 N T",
    "pronunciation": "P R OW0 N AH2 N S IY0 EY1 SH AH0 N",
    "quick": "K W IH1 K", "brown": "B R AW1 N", "fox": "F AA1 K S",
    "jumps": "JH AH1 M P S", "lazy": "L EY1 Z IY0",

    # ---- LJ / Warren-report domain (the reference's golden corpus) ----
    "assassination": "AH0 S AE2 S AH0 N EY1 SH AH0 N",
    "commission": "K AH0 M IH1 SH AH0 N",
    "memoranda": "M EH2 M ER0 AE1 N D AH0",
    "memorandum": "M EH2 M ER0 AE1 N D AH0 M",
    "embodied": "IH0 M B AA1 D IY0 D", "embody": "IH0 M B AA1 D IY0",
    "executive": "IH0 G Z EH1 K Y AH0 T IH0 V",
    "execution": "EH2 K S AH0 K Y UW1 SH AH0 N",
    "procedure": "P R AH0 S IY1 JH ER0",
    "protection": "P R AH0 T EH1 K SH AH0 N",
    "president": "P R EH1 Z AH0 D EH2 N T",
    "presidential": "P R EH2 Z AH0 D EH1 N SH AH0 L",
    "guarantee": "G EH2 R AH0 N T IY1",
    "security": "S IH0 K Y UH1 R AH0 T IY0",
    "demands": "D IH0 M AE1 N D Z", "demand": "D IH0 M AE1 N D",
    "responsibilities": "R IY0 S P AA2 N S AH0 B IH1 L AH0 T IY0 Z",
    "responsibility": "R IY0 S P AA2 N S AH0 B IH1 L AH0 T IY0",
    "varied": "V EH1 R IY0 D", "vary": "V EH1 R IY0",
    "tradition": "T R AH0 D IH1 SH AH0 N", "democracy":
    "D IH0 M AA1 K R AH0 S IY0", "seated": "S IY1 T IH0 D",
    "preclude": "P R IH0 K L UW1 D", "examination":
    "IH0 G Z AE2 M AH0 N EY1 SH AH0 N", "kennedy": "K EH1 N AH0 D IY0",
    "oswald": "AA1 Z W AO0 L D", "dallas": "D AE1 L AH0 S",
    "texas": "T EH1 K S AH0 S", "governor": "G AH1 V ER0 N ER0",
    "rifle": "R AY1 F AH0 L", "bullet": "B UH1 L AH0 T",
    "motorcade": "M OW1 T ER0 K EY2 D", "depository":
    "D IH0 P AA1 Z AH0 T AO2 R IY0", "witnesses": "W IH1 T N AH0 S IH0 Z",
    "witness": "W IH1 T N AH0 S", "testimony": "T EH1 S T AH0 M OW2 N IY0",
    "investigation": "IH0 N V EH2 S T AH0 G EY1 SH AH0 N",
    "agents": "EY1 JH AH0 N T S", "secret": "S IY1 K R IH0 T",
    "federal": "F EH1 D ER0 AH0 L", "bureau": "B Y UH1 R OW0",
    "terms": "T ER1 M Z", "term": "T ER1 M",
    "essential": "EH0 S EH1 N SH AH0 L", "future": "F Y UW1 CH ER0",
    # Reference-parity quirks: the g2p library's `eng` transducer renders
    # a possessive apostrophe-s as "ɛs" (verified in metadata_phones.psv:
    # today's → tʌdeɪɛs, kennedy's → kɛnʌdiɛs). Kept as explicit entries —
    # the general possessive fallback below uses the phonological z/s/ɪz.
    "today's": "T AH0 D EY1 EH0 S", "kennedy's": "K EH1 N AH0 D IY0 EH0 S",

    # -ower words that are NOT stem+er agentives/comparatives (the -er
    # morphology below would mis-derive them from flow/pow/tow/show).
    "flower": "F L AW1 ER0", "power": "P AW1 ER0", "tower": "T AW1 ER0",
    "shower": "SH AW1 ER0",
}

# Round-5 LJ-corpus growth (separate module to keep this one reviewable).
from everyvoice_tpu.text.english_lexicon_ext import LEXICON_EXT  # noqa: E402

ARPABET_LEXICON.update(LEXICON_EXT)

# g2p-library parity: its eng→eng-ipa mapping is the ARPABET pronunciation
# with stress digits dropped and these vowel conventions (verified against
# reference everyvoice/tests/data/metadata_phones.psv: ðʌ, tɜ˞mz, fjutʃɜ˞).
G2P_ARPA_VOWELS = {
    "AA": "ɑ", "AE": "æ", "AH": "ʌ", "AO": "ɔ", "AW": "aʊ", "AY": "aɪ",
    "EH": "ɛ", "ER": "ɜ˞", "EY": "eɪ", "IH": "ɪ", "IY": "i", "OW": "oʊ",
    "OY": "ɔɪ", "UH": "ʊ", "UW": "u",
}
G2P_ARPA_CONSONANTS = {
    "B": "b", "CH": "t͡ʃ", "D": "d", "DH": "ð", "F": "f", "G": "ɡ",
    "HH": "h", "JH": "d͡ʒ", "K": "k", "L": "l", "M": "m", "N": "n",
    "NG": "ŋ", "P": "p", "R": "ɹ", "S": "s", "SH": "ʃ", "T": "t",
    "TH": "θ", "V": "v", "W": "w", "Y": "j", "Z": "z", "ZH": "ʒ",
}
G2P_ARPA_TO_IPA = {**G2P_ARPA_VOWELS, **G2P_ARPA_CONSONANTS}

_VOICELESS_FINALS = set("ptkfθ")
_SIBILANT_FINALS = ("s", "z", "ʃ", "ʒ", "t͡ʃ", "d͡ʒ", "tʃ", "dʒ")


def arpabet_to_ipa(pron: str) -> str:
    """ARPABET string → IPA with the g2p library's eng-ipa conventions
    (stress digits dropped; affricates carry the framework's tie bar).

    >>> arpabet_to_ipa('T ER1 M Z')
    'tɜ˞mz'
    >>> arpabet_to_ipa('DH AH0')
    'ðʌ'
    """
    out = []
    for token in pron.split():
        phone = token.rstrip("012")
        out.append(G2P_ARPA_TO_IPA.get(phone, phone.lower()))
    return "".join(out)


def lookup(word: str):
    """IPA for `word` from the lexicon, with morphological extension:
    possessive/plural/3sg -s ('s, s', s, es), past -ed, progressive -ing,
    adverbial -ly. Returns None for true OOV words (letter-to-sound rules
    take over in english_g2p)."""
    base = ARPABET_LEXICON.get(word)
    if base is not None:
        return arpabet_to_ipa(base)
    if word.endswith("'s"):
        stem = lookup(word[:-2])
        return _add_s(stem) if stem else None
    if word.endswith("'"):
        # Plural possessive (ladies', debtors'): same IPA as the plural.
        return lookup(word[:-1])
    if word.endswith("ies") and len(word) > 4:
        stem = lookup(word[:-3] + "y")
        if stem and stem.endswith("i"):
            return stem + "z"
    if word.endswith("es") and len(word) > 3:
        stem = lookup(word[:-2])
        if stem and stem.endswith(_SIBILANT_FINALS):
            return stem + "ɪz"
        stem = lookup(word[:-1])  # e.g. "places" → "place" + s
        if stem:
            return _add_s(stem)
    if word.endswith("s") and len(word) > 2 and not word.endswith("ss"):
        stem = lookup(word[:-1])
        return _add_s(stem) if stem else None
    if word.endswith("ed") and len(word) > 3:
        stem = lookup(word[:-2]) or lookup(word[:-1])  # walked / loved
        if stem is None and word.endswith("ied"):
            stem = lookup(word[:-3] + "y")
        if stem is None and len(word) > 4 and word[-3] == word[-4]:
            stem = lookup(word[:-3])  # planned → plan, committed → commit
        if stem:
            if stem.endswith(("t", "d")):
                return stem + "ɪd"
            return stem + ("t" if stem.endswith(tuple(_VOICELESS_FINALS))
                           else "d")
    if word.endswith("ing") and len(word) > 4:
        stem = ARPABET_LEXICON.get(word[:-3])
        if stem is None:
            stem = ARPABET_LEXICON.get(word[:-3] + "e")  # making → make
        if stem is None and len(word) > 5 and word[-4] == word[-5]:
            stem = ARPABET_LEXICON.get(word[:-4])  # running → run
        if stem is not None:
            return arpabet_to_ipa(stem) + "ɪŋ"
    if word.endswith("ly") and len(word) > 3:
        stem = lookup(word[:-2])
        if stem:
            return stem + "li"
    # Comparative/agentive -er and superlative -est (CMUdict renders the
    # suffix vowel AH0 → ʌ in the g2p alphabet, the -est one likewise):
    # greater, larger (e-drop), bigger (doubling); greatest/largest/biggest.
    if word.endswith("er") and len(word) > 3:
        stem = _stem_for_suffix(word, 2)
        if stem:
            return stem + "ɜ˞"
    if word.endswith("est") and len(word) > 4:
        stem = _stem_for_suffix(word, 3)
        if stem:
            return stem + "ʌst"
    # Productive nominal/adjectival suffixes on known stems: kindness,
    # hopeful, harmless, payment (CMUdict: N AH0 S / F AH0 L / L AH0 S /
    # M AH0 N T → the g2p alphabet's ʌ).
    for suffix, tail in (("ness", "nʌs"), ("ful", "fʌl"),
                         ("less", "lʌs"), ("ment", "mʌnt")):
        if word.endswith(suffix) and len(word) > len(suffix) + 2:
            stem = lookup(word[: -len(suffix)])
            if stem:
                return stem + tail
    return None


def _stem_for_suffix(word: str, n: int):
    """Stem IPA for a vowel-initial suffix of length n: direct (great-er),
    e-drop (larg-er ← large), consonant-doubling (bigg-er ← big)."""
    stem = lookup(word[:-n])
    if stem is None:
        base = ARPABET_LEXICON.get(word[:-n] + "e")  # e-drop: larger
        stem = arpabet_to_ipa(base) if base is not None else None
    if stem is None and len(word) > n + 2 and word[-n - 1] == word[-n - 2]:
        stem = lookup(word[: -n - 1])  # doubling: bigger → big
    return stem


def _add_s(stem_ipa: str) -> str:
    if stem_ipa.endswith(_SIBILANT_FINALS):
        return stem_ipa + "ɪz"
    if stem_ipa.endswith(tuple(_VOICELESS_FINALS)):
        return stem_ipa + "s"
    return stem_ipa + "z"
