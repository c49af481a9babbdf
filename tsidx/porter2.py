"""Pure-Python Snowball English ("Porter2") stemmer.

The reference engine stems with NLTK's ``SnowballStemmer("english")``
(``/root/reference/ts_type_filter/inverted_index.py:6-11,61``).  NLTK is not
available in this environment, so this module implements the published
Snowball English algorithm (snowballstem.org/algorithms/english/stemmer.html)
with the NLTK-compatible front-end behaviors that the reference relies on:

- input is lowercased first (NLTK lowercases inside ``stem()``);
- words of length <= 2 are returned unchanged *before* any other processing;
- the Unicode apostrophes U+2019 / U+2018 / U+201B are normalized to ASCII
  ``'`` (the sonnets corpus uses U+2019 throughout and the reference goldens
  show ASCII-apostrophe terms, ``documentation/inverted-index.md:161``);
- a single leading apostrophe is stripped.

Fidelity is asserted by tests/test_porter2.py (spot goldens from
``documentation/inverted-index.md:153-173``) and by the corpus-level index
statistics golden (154 docs / 4034 terms / 13044 postings,
``documentation/inverted-index.md:134-136``) — any stemmer divergence on the
4,888-token sonnets vocabulary would shift those counts.

Implementation is original, written from the public algorithm description;
regions R1/R2 are tracked as integer cursor positions.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

# Exceptional forms (checked before the algorithm proper).
_EXCEPTIONS = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariants
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Exceptional forms checked after step 1a (left unchanged from that point).
_EXCEPTIONS_POST_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)

# Step 2/3/4 suffix tables, ordered longest-first (longest-match semantics:
# the first ``endswith`` hit decides; if it fails the region test nothing
# shorter is tried).
_STEP2 = (
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
    ("ogi", None),  # -> "og" when preceded by l
    ("li", None),  # -> delete when preceded by a valid li-ending
)

_STEP3 = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ative", None),  # delete, but only when in R2
    ("ical", "ic"),
    ("ness", ""),
    ("ful", ""),
)

_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",
    "al",
    "er",
    "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 start positions for *word* (post y-marking)."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        return (
            word[-3] not in _VOWELS
            and word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
        )
    return False


def _suffix_in(word: str, suffix_len: int, region_start: int) -> bool:
    return len(word) - suffix_len >= region_start


def stem(word: str) -> str:
    """Stem one word with NLTK-compatible Snowball-English semantics."""
    word = word.lower()
    if len(word) <= 2:
        return word
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    word = word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    if word.startswith("'"):
        word = word[1:]

    # Mark consonant-y as "Y" so it is not treated as a vowel.
    if word.startswith("y"):
        word = "Y" + word[1:]
    if "y" in word:
        chars = list(word)
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in _VOWELS:
                chars[i] = "Y"
        word = "".join(chars)

    r1, r2 = _regions(word)

    # --- Step 0: longest of  '  's  's'
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # --- Step 1a
    for suf in ("sses", "ied", "ies", "us", "ss", "s"):
        if word.endswith(suf):
            if suf == "sses":
                word = word[:-2]
            elif suf in ("ied", "ies"):
                word = word[:-2] if len(word) - len(suf) > 1 else word[:-1]
            elif suf == "s":
                if any(c in _VOWELS for c in word[:-2]):
                    word = word[:-1]
            # "us"/"ss": leave unchanged
            break

    if word in _EXCEPTIONS_POST_1A:
        return word

    # --- Step 1b
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(suf):
            if suf in ("eedly", "eed"):
                if _suffix_in(word, len(suf), r1):
                    word = word[: -len(suf)] + "ee"
            else:
                preceding = word[: -len(suf)]
                if any(c in _VOWELS for c in preceding):
                    word = preceding
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
            break

    # --- Step 1c: y/Y -> i when preceded by a non-vowel that is not the
    # first letter of the word.
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # --- Step 2 (region R1)
    for suf, repl in _STEP2:
        if word.endswith(suf):
            if _suffix_in(word, len(suf), r1):
                if suf == "ogi":
                    if word[-4] == "l":
                        word = word[:-1]
                elif suf == "li":
                    if word[-3] in _LI_ENDINGS:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 3 (region R1; "ative" additionally requires R2)
    for suf, repl in _STEP3:
        if word.endswith(suf):
            if _suffix_in(word, len(suf), r1):
                if suf == "ative":
                    if _suffix_in(word, len(suf), r2):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # --- Step 4 (region R2)
    for suf in _STEP4:
        if word.endswith(suf):
            if _suffix_in(word, len(suf), r2):
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # --- Step 5
    if word.endswith("e"):
        if _suffix_in(word, 1, r2) or (
            _suffix_in(word, 1, r1) and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("ll") and _suffix_in(word, 1, r2):
        word = word[:-1]

    return word.replace("Y", "y")
