"""Text normalization for WER evaluation.

Reference: Tests/WhisperKitTests/Evaluate/NormalizeEn.swift (892 LoC) +
SpellingMapping.swift (1,746 LoC) — themselves ports of openai/whisper's
`BasicTextNormalizer` / `EnglishTextNormalizer` (normalizers/english.py).
Re-implemented from the published normalization rules:

  * BasicTextNormalizer: strip bracketed asides, lowercase, drop
    punctuation/symbols, collapse whitespace
  * EnglishTextNormalizer: contraction/abbreviation standardization,
    number-word → digit conversion, British→American spelling mapping
    (subset; extensible via `extra_spellings`), currency/percent handling

The spelling table here is a representative subset of the American-English
mapping the reference vendors; WER comparisons remain self-consistent as
long as hypothesis and reference pass through the same normalizer.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Optional


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif unicodedata.category(c) == "Mn":
            continue
        elif unicodedata.category(c)[0] in "MSP":
            out.append(" ")
        else:
            out.append(c)
    return "".join(out)


def remove_symbols(s: str) -> str:
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.clean = (
            remove_symbols_and_diacritics if remove_diacritics else remove_symbols
        )
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # bracketed annotations
        s = re.sub(r"\(([^)]+?)\)", "", s)  # parenthesized asides
        s = self.clean(s).lower()
        if self.split_letters:
            s = " ".join(re.findall(r"\X", s, re.U))
        s = re.sub(r"\s+", " ", s)
        return s.strip()


# -- English number normalization -------------------------------------------

_ONES = {
    w: i
    for i, w in enumerate(
        "zero one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen".split()
    )
}
_TENS = {
    w: 10 * i
    for i, w in enumerate(
        "_ _ twenty thirty forty fifty sixty seventy eighty ninety".split()
    )
    if w != "_"
}
_MULTIPLIERS = {
    "hundred": 100,
    "thousand": 1_000,
    "million": 1_000_000,
    "billion": 1_000_000_000,
    "trillion": 1_000_000_000_000,
}
_ORDINAL_ONES = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19, "twentieth": 20, "thirtieth": 30, "fortieth": 40,
    "fiftieth": 50, "sixtieth": 60, "seventieth": 70, "eightieth": 80,
    "ninetieth": 90, "hundredth": 100, "thousandth": 1000,
}


class EnglishNumberNormalizer:
    """Convert spelled-out numbers to digits (functional subset of openai's
    EnglishNumberNormalizer)."""

    def __call__(self, s: str) -> str:
        words = s.split()
        out: list[str] = []
        i = 0
        while i < len(words):
            value, consumed, suffix = self._parse_number(words, i)
            if consumed > 0:
                out.append(str(value) + suffix)
                i += consumed
            else:
                out.append(words[i])
                i += 1
        return " ".join(out)

    def _parse_number(self, words: list[str], start: int):
        total = 0
        current = 0
        consumed = 0
        suffix = ""
        i = start
        matched = False
        while i < len(words):
            w = words[i].rstrip(",")
            bare = w
            if bare in _ONES:
                if current % 10 != 0 or (current % 100 and _ONES[bare] >= 10):
                    break
                current += _ONES[bare]
                matched = True
            elif bare in _TENS:
                if current % 100 >= 10:
                    break
                current += _TENS[bare]
                matched = True
            elif bare in _MULTIPLIERS:
                if not matched and bare != "hundred":
                    break
                mult = _MULTIPLIERS[bare]
                if mult == 100:
                    current = max(current, 1) * 100
                else:
                    total += max(current, 1) * mult
                    current = 0
                matched = True
            elif bare in _ORDINAL_ONES and matched:
                current += _ORDINAL_ONES[bare]
                suffix = "th" if not bare.endswith(("first", "second", "third")) else {
                    "first": "st", "second": "nd", "third": "rd"
                }[bare.split()[-1]]
                i += 1
                consumed = i - start
                return total + current, consumed, suffix
            elif bare == "and" and matched:
                i += 1
                continue
            else:
                break
            i += 1
            consumed = i - start
        if not matched or (consumed == 1 and words[start] in ("one",)):
            # keep lone "one" as a word (openai behavior: "one" is ambiguous)
            return 0, 0, ""
        return total + current, consumed, suffix


_CONTRACTIONS = {
    r"\bwon't\b": "will not",
    r"\bcan't\b": "can not",
    r"\blet's\b": "let us",
    r"\bain't\b": "aint",
    r"\by'all\b": "you all",
    r"\bwanna\b": "want to",
    r"\bgotta\b": "got to",
    r"\bgonna\b": "going to",
    r"\bi'ma\b": "i am going to",
    r"\bimma\b": "i am going to",
    r"\bwoulda\b": "would have",
    r"\bcoulda\b": "could have",
    r"\bshoulda\b": "should have",
    r"\bma'am\b": "madam",
    # standalone suffix expansions
    r"n't\b": " not",
    r"'re\b": " are",
    r"'s\b": " is",
    r"'d\b": " would",
    r"'ll\b": " will",
    r"'t\b": " not",
    r"'ve\b": " have",
    r"'m\b": " am",
}

_ABBREVIATIONS = {
    r"\bmr\b": "mister",
    r"\bmrs\b": "missus",
    r"\bst\b": "saint",
    r"\bdr\b": "doctor",
    r"\bprof\b": "professor",
    r"\bcapt\b": "captain",
    r"\bgov\b": "governor",
    r"\bald\b": "alderman",
    r"\bgen\b": "general",
    r"\bsen\b": "senator",
    r"\brep\b": "representative",
    r"\bpres\b": "president",
    r"\brev\b": "reverend",
    r"\bhon\b": "honorable",
    r"\basst\b": "assistant",
    r"\bassoc\b": "associate",
    r"\blt\b": "lieutenant",
    r"\bcol\b": "colonel",
    r"\bjr\b": "junior",
    r"\bsr\b": "senior",
    r"\besq\b": "esquire",
}

# Representative British→American subset of the reference's SpellingMapping
_SPELLINGS = {
    "analyse": "analyze", "analysed": "analyzed", "analysing": "analyzing",
    "behaviour": "behavior", "behaviours": "behaviors",
    "cancelled": "canceled", "cancelling": "canceling",
    "catalogue": "catalog", "centre": "center", "centres": "centers",
    "colour": "color", "colours": "colors", "coloured": "colored",
    "defence": "defense", "dialogue": "dialog",
    "favour": "favor", "favourite": "favorite", "favourites": "favorites",
    "fibre": "fiber", "flavour": "flavor", "flavours": "flavors",
    "grey": "gray", "honour": "honor", "honours": "honors",
    "humour": "humor", "labour": "labor", "licence": "license",
    "litre": "liter", "metre": "meter", "metres": "meters",
    "neighbour": "neighbor", "neighbours": "neighbors",
    "offence": "offense", "organise": "organize", "organised": "organized",
    "organisation": "organization", "organisations": "organizations",
    "practise": "practice", "programme": "program",
    "realise": "realize", "realised": "realized",
    "recognise": "recognize", "recognised": "recognized",
    "theatre": "theater", "travelled": "traveled", "travelling": "traveling",
    "valour": "valor", "vigour": "vigor",
}


# Words the suffix rules must not touch (would produce non-words).
_SPELLING_RULE_EXCEPTIONS = {
    "genre", "acre", "ogre", "mediocre", "macabre", "lucre", "timbre",
    "cadre", "chore", "store", "score", "shore", "snore", "spore", "swore",
    "bore", "core", "fore", "gore", "more", "pore", "sore", "tore", "wore",
    "adore", "before", "explore", "ignore", "restore", "hour", "our",
    "sour", "four", "pour", "tour", "your", "flour", "devour", "velour",
    "amour", "detour", "contour", "paramour", "troubadour", "wise",
    "rise", "arise", "raise", "praise", "advise", "devise", "revise",
    "surprise", "comprise", "demise", "despise", "disguise", "exercise",
    "franchise", "premise", "promise", "paradise", "anise", "precise",
    "concise", "expertise", "merchandise", "noise", "poise", "cruise",
    "bruise", "else", "false", "padre", "hombre", "bizarre", "sabre",
}


def _rule_based_american(word: str) -> Optional[str]:
    """Conservative British→American suffix rules, applied only when the
    dictionary misses (approximates the rest of the reference's 1,746-line
    SpellingMapping table)."""
    if word in _SPELLING_RULE_EXCEPTIONS or len(word) < 5:
        return None
    # -our → -or (colour/honour families), incl. inflections
    for suffix, repl in (
        ("ourite", "orite"), ("ouring", "oring"), ("oured", "ored"),
        ("ours", "ors"), ("our", "or"),
    ):
        if word.endswith(suffix) and len(word) - len(suffix) >= 3:
            stem = word[: -len(suffix)]
            if stem[-1] not in "aeiou":  # "four", "pour" are excepted above
                return stem + repl
    # -ise/-isation → -ize/-ization (organise family)
    for suffix, repl in (
        ("isation", "ization"), ("isations", "izations"),
        ("ising", "izing"), ("ised", "ized"), ("ises", "izes"), ("ise", "ize"),
    ):
        if word.endswith(suffix) and len(word) - len(suffix) >= 4:
            return word[: -len(suffix)] + repl
    # consonant+re → consonant+er (centre/fibre/calibre families)
    for suffix, repl in (("res", "ers"), ("re", "er")):
        if word.endswith(suffix) and len(word) - len(suffix) >= 3:
            prev = word[-len(suffix) - 1]
            if prev not in "aeiour":  # vowel+re ("store") and rre ("bizarre") stay
                return word[: -len(suffix)] + repl
    # doubled-l inflections (travelled → traveled)
    for suffix, repl in (("lled", "led"), ("lling", "ling"), ("ller", "ler")):
        if word.endswith(suffix) and len(word) - len(suffix) >= 4:
            stem = word[: -len(suffix)]
            if stem[-1] not in "aeiou":
                continue
            return stem + repl
    return None


class EnglishTextNormalizer:
    """Reference: NormalizeEn.swift; openai EnglishTextNormalizer."""

    def __init__(self, extra_spellings: Optional[dict[str, str]] = None):
        self.number_normalizer = EnglishNumberNormalizer()
        self.spellings = dict(_SPELLINGS)
        if extra_spellings:
            self.spellings.update(extra_spellings)

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
        s = re.sub(r"\(([^)]+?)\)", "", s)
        s = re.sub(r"\s+'", "'", s)  # stray space before apostrophe
        for pattern, replacement in _CONTRACTIONS.items():
            s = re.sub(pattern, replacement, s)
        for pattern, replacement in _ABBREVIATIONS.items():
            s = re.sub(pattern, replacement, s)
        s = re.sub(r"(\d),(\d)", r"\1\2", s)  # remove commas in numbers
        s = re.sub(r"\.([^0-9]|$)", r" \1", s)  # periods not in numbers
        s = remove_symbols_and_diacritics(s, keep=".%$¢€£")
        s = self.number_normalizer(s)
        s = re.sub(r"[.$¢€£]([^0-9])", r" \1", s)  # leftover symbols not in numbers
        s = re.sub(r"([^0-9])%", r"\1 ", s)
        words = [
            self.spellings.get(w) or _rule_based_american(w) or w
            for w in s.split()
        ]
        s = " ".join(words)
        s = re.sub(r"\s+", " ", s)
        return s.strip()
