"""Snowball Danish / Norwegian / Swedish stemmers, implemented from the
published algorithm descriptions (snowballstem.org) — the algorithms
behind tantivy's Stemmer(Language::{Danish,Norwegian,Swedish})."""

from __future__ import annotations


def _r1(w: str, vowels: frozenset[str]) -> int:
    """Standard R1, adjusted so at least 3 letters precede it."""
    n = len(w)
    r1 = n
    for i in range(1, n):
        if w[i] not in vowels and w[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, min(3, n))


_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP1 = sorted(
    """hed ethed ered e erede ende erende ene erne ere en heden eren er
    heder erer heds es endes erendes enes ernes eres ens hedens erens
    ers ets erets et eret""".split(), key=len, reverse=True)


def stem_danish(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w, _DA_VOWELS)

    # step 1: longest d-suffix in R1, else s after a valid s-ending
    for suf in _DA_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and len(w) - 1 >= r1 and len(w) > 1 \
                and w[-2] in _DA_S_END:
            w = w[:-1]

    # step 2: gd dt gt kt in R1 -> drop last letter
    if len(w) - 2 >= r1 and w[-2:] in ("gd", "dt", "gt", "kt"):
        w = w[:-1]

    # step 3: igst -> drop st; then ig lig elig els in R1 (+ step 2
    # again); løst -> løs
    if w.endswith("igst"):
        w = w[:-2]
    for suf in ("elig", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            if len(w) - 2 >= r1 and w[-2:] in ("gd", "dt", "gt", "kt"):
                w = w[:-1]
            break
    else:
        if w.endswith("løst") and len(w) - 1 >= r1:
            w = w[:-1]

    # step 4 (undouble): double consonant at the end, in R1
    if len(w) >= 2 and len(w) - 1 >= r1 and w[-1] == w[-2] \
            and w[-1] not in _DA_VOWELS:
        w = w[:-1]
    return w


_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP1 = sorted(
    """a e ede ande ende ane ene hetene en heten ar er heter as es edes
    endes enes hetenes ens hetens ers ets et het ast""".split(),
    key=len, reverse=True)
_NO_STEP3 = sorted(
    "leg eleg ig eig lig elig els lov elov slov hetslov".split(),
    key=len, reverse=True)


def stem_norwegian(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w, _NO_VOWELS)

    # step 1: longest among the d-suffixes / erte|ert -> er / s
    matched = None
    for suf in _NO_STEP1 + ["erte", "ert"]:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if matched is None or len(suf) > len(matched):
                matched = suf
    if matched in ("erte", "ert"):
        w = w[: -len(matched)] + "er"
    elif matched is not None:
        w = w[: -len(matched)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) > 1 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))):
        w = w[:-1]

    # step 2: dt / vt in R1 -> drop t
    if len(w) - 2 >= r1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]

    # step 3: longest of the derivational suffixes in R1 -> delete
    for suf in _NO_STEP3:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    return w


_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_STEP1 = sorted(
    """a arna erna heterna orna ad e ade ande arne are aste en anden
    aren heten ern ar er heter or as arnas ernas ornas es ades andes
    ens arens hetens erns at andet het ast""".split(),
    key=len, reverse=True)


def stem_swedish(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w, _SV_VOWELS)

    # step 1: longest d-suffix in R1, else s after a valid s-ending
    for suf in _SV_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and len(w) - 1 >= r1 and len(w) > 1 \
                and w[-2] in _SV_S_END:
            w = w[:-1]

    # step 2: dd gd nn dt gt kt tt in R1 -> drop last letter
    if len(w) - 2 >= r1 and w[-2:] in ("dd", "gd", "nn", "dt", "gt",
                                       "kt", "tt"):
        w = w[:-1]

    # step 3: lig ig els in R1 -> delete; löst -> lös; fullt -> full
    for suf in ("lig", "ig", "els"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("löst") and len(w) - 1 >= r1:
            w = w[:-1]
        elif w.endswith("fullt") and len(w) - 1 >= r1:
            w = w[:-1]
    return w
