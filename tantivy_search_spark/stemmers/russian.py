"""Snowball Russian stemmer, implemented from the published algorithm
(snowballstem.org, "The Russian stemming algorithm")."""

from __future__ import annotations

_VOWELS = frozenset("аеиоуыэюя")

_PERFECTIVE_1 = ("в", "вши", "вшись")            # preceded by а or я
_PERFECTIVE_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_ADJECTIVE = (
    "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их ых "
    "ую юю ая яя ою ею").split()
_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")    # preceded by а or я
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_VERB_1 = (
    "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно").split()
_VERB_2 = (
    "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло "
    "ено ят ует уют ит ыт ены ить ыть ишь ую ю").split()
_NOUN = (
    "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием ем "
    "ам ом о у ах иях ях ы ь ию ью ю ия ья я").split()


def _rv_r2(w: str) -> tuple[int, int]:
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _longest(w: str, sufs, rv: int, preceded_ay=()) -> str | None:
    """Longest suffix of w (within RV) from sufs; entries in
    ``preceded_ay`` additionally require а/я before the suffix (the
    preceding letter must also be inside RV)."""
    best = None
    for s in sufs:
        if w.endswith(s) and len(w) - len(s) >= rv:
            if s in preceded_ay:
                p = len(w) - len(s)
                if p - 1 < rv or p == 0 or w[p - 1] not in "ая":
                    continue
            if best is None or len(s) > len(best):
                best = s
    return best


def stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    rv, r2 = _rv_r2(w)
    if rv >= len(w):
        return w

    # step 1: perfective gerund, else [reflexive] + adjectival|verb|noun
    g1 = [s + "" for s in _PERFECTIVE_1]
    best = _longest(w, list(_PERFECTIVE_2) + g1, rv,
                    preceded_ay=set(g1))
    if best is not None:
        w = w[: -len(best)]
    else:
        ref = _longest(w, ("ся", "сь"), rv)
        if ref is not None:
            w = w[: -len(ref)]
        # adjectival: adjective, optionally preceded by participle
        adj = _longest(w, _ADJECTIVE, rv)
        if adj is not None:
            w = w[: -len(adj)]
            part = _longest(
                w, list(_PARTICIPLE_2) + list(_PARTICIPLE_1), rv,
                preceded_ay=set(_PARTICIPLE_1))
            if part is not None:
                w = w[: -len(part)]
        else:
            vb = _longest(w, list(_VERB_2) + list(_VERB_1), rv,
                          preceded_ay=set(_VERB_1))
            if vb is not None:
                w = w[: -len(vb)]
            else:
                nn = _longest(w, _NOUN, rv)
                if nn is not None:
                    w = w[: -len(nn)]

    # step 2: drop a final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational ость/ост in R2
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # step 4: tidying up
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        sup = _longest(w, ("ейше", "ейш"), rv)
        if sup is not None:
            w = w[: -len(sup)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
    if w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w
