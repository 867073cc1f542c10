"""Snowball Dutch stemmer, implemented from the published algorithm
(snowballstem.org, "The Dutch stemming algorithm")."""

from __future__ import annotations

_VOWELS = frozenset("aeiouyè")

_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(w: str) -> str:
    w = w.translate(_DEACCENT)
    out = list(w)
    n = len(w)
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or w[i - 1] in _VOWELS):
            out[i] = "Y"
        elif c == "i" and 0 < i < n - 1 \
                and w[i - 1] in _VOWELS and w[i + 1] in _VOWELS:
            out[i] = "I"
    return "".join(out)


def _r1r2(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r1 = max(r1, min(3, n))  # at least 3 letters before R1
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def stem(word: str) -> str:
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w.replace("Y", "y").replace("I", "i")
    r1, r2 = _r1r2(w)

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    # ---- step 1
    if w.endswith("heden"):
        if in_r1(len(w) - 5):
            w = w[:-5] + "heid"
    elif w.endswith(("ene", "en")):
        suf = "ene" if w.endswith("ene") else "en"
        p = len(w) - len(suf)
        # valid en-ending: non-vowel, and not the word gem
        if in_r1(p) and p > 0 and w[p - 1] not in _VOWELS \
                and not w[:p].endswith("gem"):
            w = _undouble(w[:p])
    elif w.endswith(("se", "s")):
        suf = "se" if w.endswith("se") else "s"
        p = len(w) - len(suf)
        # valid s-ending: non-vowel other than j
        if in_r1(p) and p > 0 and w[p - 1] not in _VOWELS \
                and w[p - 1] != "j":
            w = w[:p]

    # ---- step 2: suffix e, in R1, preceded by a non-vowel
    step2_done = False
    if w.endswith("e") and in_r1(len(w) - 1) and len(w) > 1 \
            and w[-2] not in _VOWELS:
        w = _undouble(w[:-1])
        step2_done = True

    # ---- step 3a: heid, in R2, not preceded by c; then en as step 1
    if w.endswith("heid") and in_r2(len(w) - 4) and len(w) > 4 \
            and w[-5] != "c":
        w = w[:-4]
        if w.endswith("en"):
            p = len(w) - 2
            if in_r1(p) and p > 0 and w[p - 1] not in _VOWELS \
                    and not w[:p].endswith("gem"):
                w = _undouble(w[:p])

    # ---- step 3b: d-suffixes
    if w.endswith(("end", "ing")):
        p = len(w) - 3
        if in_r2(p):
            w = w[:p]
            if w.endswith("ig") and in_r2(len(w) - 2) and \
                    (len(w) < 3 or w[-3] != "e"):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("ig"):
        if in_r2(len(w) - 2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("lijk"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            # repeat step 2
            if w.endswith("e") and in_r1(len(w) - 1) and len(w) > 1 \
                    and w[-2] not in _VOWELS:
                w = _undouble(w[:-1])
    elif w.endswith("baar"):
        if in_r2(len(w) - 4):
            w = w[:-4]
    elif w.endswith("bar"):
        if in_r2(len(w) - 3) and step2_done:
            w = w[:-3]

    # ---- step 4: undouble vowel — C v v C(not I) at the end
    if len(w) >= 4:
        c1, v1, v2, c2 = w[-4], w[-3], w[-2], w[-1]
        if c1 not in _VOWELS and c2 not in _VOWELS and c2 != "I" \
                and v1 == v2 and v1 in "aeou":
            w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")
