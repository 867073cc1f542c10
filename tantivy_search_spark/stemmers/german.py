"""Snowball German stemmer, implemented from the published algorithm
(snowballstem.org, "The German stemming algorithm") — the algorithm
behind tantivy's Stemmer(Language::German)."""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDINGS = frozenset("bdfghklmnrt")
_ST_ENDINGS = frozenset("bdfghklmnt")


def _prelude(w: str) -> str:
    w = w.replace("ß", "ss")
    out = list(w)
    n = len(w)
    for i in range(1, n - 1):
        if w[i - 1] in _VOWELS and w[i + 1] in _VOWELS:
            if w[i] == "u":
                out[i] = "U"
            elif w[i] == "y":
                out[i] = "Y"
    return "".join(out)


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    # R1 is adjusted so that the region before it is at least 3 letters
    r1 = max(r1, min(3, n))
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def stem(word: str) -> str:
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w.replace("U", "u").replace("Y", "y")
    r1, r2 = _regions(w)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 1: longest of (a) em ern er, (b) e en es, (c) s [valid s-ending]
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(suf):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(suf):
                    w = w[: -len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if w.endswith("s") and in_r1("s") and len(w) > 1 \
                    and w[-2] in _S_ENDINGS:
                w = w[:-1]

    r1, r2 = _regions(w)
    # step 2: longest of (a) en er est, (b) st [valid st-ending, 3+ before]
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(suf):
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("st") and in_r1("st") and len(w) > 5 \
                and w[-3] in _ST_ENDINGS:
            w = w[:-2]

    r1, r2 = _regions(w)
    # step 3: d-suffixes
    if w.endswith(("end", "ung")):
        if in_r2(w[-3:]):
            w = w[:-3]
            if w.endswith("ig") and len(w) - 2 >= r2 and \
                    (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
    elif w.endswith(("isch", "ig", "ik")):
        suf = "isch" if w.endswith("isch") else w[-2:]
        if in_r2(suf) and w[-len(suf) - 1] != "e":
            w = w[: -len(suf)]
    elif w.endswith(("lich", "heit")):
        if in_r2(w[-4:]):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and len(w) - 2 >= r1:
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2("keit"):
            w = w[:-4]
            if w.endswith("lich") and len(w) - 4 >= r2:
                w = w[:-4]
            elif w.endswith("ig") and len(w) - 2 >= r2:
                w = w[:-2]

    w = w.replace("U", "u").replace("Y", "y")
    for a, b in (("ä", "a"), ("ö", "o"), ("ü", "u")):
        w = w.replace(a, b)
    return w
