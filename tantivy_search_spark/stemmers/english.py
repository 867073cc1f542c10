"""Snowball English stemmer ("Porter2"), implemented from the published
algorithm description (snowballstem.org, "The English (Porter2)
stemming algorithm").  This is the same algorithm tantivy's
Stemmer(Language::English) runs via rust-stemmers
(/root/reference/src/tokenizer/parser.rs:134-150), re-implemented — not
ported — in Python.

The whole module is pure string code so it can run inside Arrow-batched
pandas UDFs without extra dependencies.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

#: whole-word exceptional forms, applied before the steps
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

#: invariant after step 1a
_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"])

_STEP2_MAP = [  # (suffix, replacement, extra condition key)
    ("ization", "ize", None), ("ational", "ate", None),
    ("ousness", "ous", None), ("iveness", "ive", None),
    ("fulness", "ful", None), ("lessli", "less", None),
    ("biliti", "ble", None), ("entli", "ent", None),
    ("ation", "ate", None), ("alism", "al", None), ("aliti", "al", None),
    ("ousli", "ous", None), ("iviti", "ive", None), ("fulli", "ful", None),
    ("tional", "tion", None), ("enci", "ence", None), ("anci", "ance", None),
    ("abli", "able", None), ("izer", "ize", None), ("ator", "ate", None),
    ("alli", "al", None), ("bli", "ble", None),
    ("ogi", "og", "l"),  # only when preceded by l
    ("li", "", "li"),    # only when preceded by a valid li-ending
]
_STEP2_MAP.sort(key=lambda e: -len(e[0]))

_STEP3_MAP = [
    ("ational", "ate", None), ("tional", "tion", None),
    ("alize", "al", None), ("icate", "ic", None), ("iciti", "ic", None),
    ("ical", "ic", None), ("ful", "", None), ("ness", "", None),
    ("ative", "", "R2"),  # only when in R2
]
_STEP3_MAP.sort(key=lambda e: -len(e[0]))

_STEP4_SUFFIXES = sorted(
    ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
     "ment", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion"],
    key=len, reverse=True)


def _mark_consonant_y(w: str) -> str:
    """Initial y, and y after a vowel, are consonants — marked Y."""
    out = []
    prev_vowel = False
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or prev_vowel):
            out.append("Y")
            prev_vowel = False
        else:
            out.append(c)
            prev_vowel = c in _VOWELS
    return "".join(out)


def _regions(w: str) -> tuple[int, int]:
    """R1/R2 start offsets; gener/commun/arsen override R1."""
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n >= 3:
        return (w[-3] not in _VOWELS and w[-2] in _VOWELS
                and w[-1] not in _VOWELS and w[-1] not in "wxY")
    if n == 2:
        return w[0] in _VOWELS and w[1] not in _VOWELS
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _ends_short_syllable(w)


def _has_vowel(w: str) -> bool:
    return any(c in _VOWELS for c in w)


def stem(word: str) -> str:
    w = word.lower()
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in _EXCEPTION1:
        return _EXCEPTION1[w]

    w = _mark_consonant_y(w)

    # step 0: longest of 's / ' / 's'  (NB "'s'" before "'s" before "'")
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if _has_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    r1, r2 = _regions(w)

    # step 1b
    step1b_deleted = False
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem_part = w[: -len(suf)]
                if _has_vowel(stem_part):
                    w = stem_part
                    step1b_deleted = True
                break
    if step1b_deleted:
        r1, r2 = _regions(w)
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif w.endswith(_DOUBLES):
            w = w[:-1]
        elif _is_short(w, r1):
            w += "e"

    # step 1c: y/Y -> i when preceded by a non-vowel that isn't the
    # first letter
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS:
        w = w[:-1] + "i"

    r1, r2 = _regions(w)

    # step 2 (longest suffix; apply only if it lies in R1)
    for suf, rep, cond in _STEP2_MAP:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if cond == "l":
                    if len(w) > len(suf) and w[-len(suf) - 1] == "l":
                        w = w[: -len(suf)] + rep
                elif cond == "li":
                    if len(w) > len(suf) and w[-len(suf) - 1] in _LI_ENDINGS:
                        w = w[: -len(suf)] + rep
                else:
                    w = w[: -len(suf)] + rep
            break

    r1, r2 = _regions(w)

    # step 3
    for suf, rep, cond in _STEP3_MAP:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if cond == "R2":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)] + rep
                else:
                    w = w[: -len(suf)] + rep
            break

    r1, r2 = _regions(w)

    # step 4 (longest suffix in R2)
    for suf in _STEP4_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    r1, r2 = _regions(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
                len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")
