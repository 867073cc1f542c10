"""Snowball Turkish stemmer, implemented from the published algorithm
description (snowballstem.org, "The Turkish stemming algorithm",
Evren (Kapusuz) Çilden) — the algorithm behind tantivy's
Stemmer(Language::Turkish)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).

Mechanics transcribed from the description:
- only words with more than one syllable (>= 2 vowels) are stemmed;
- every vowel-bearing suffix must satisfy progressive vowel harmony
  with the preceding vowel (a<-aıou, e<-eiöü, ı<-aı, i<-ei, u<-ou,
  ü<-öü), checked on the word before any stripping of that suffix;
- suffixes written -(y)X/-(n)X/-(s)X/-(U)X take their buffer letter
  only after a vowel-final stem, and the bare form only after a
  consonant-final stem;
- after suffix stripping, a stem ending in d/g gains the harmony
  vowel of its last vowel, then a final b/c/d/ğ is devoiced to
  p/ç/t/k.
The nominal-verb chain, noun chain and the ki-chain follow the
description's composition order.
"""

from __future__ import annotations

_VOWELS = frozenset("aeıioöuü")

#: progressive vowel harmony: suffix vowel -> allowed preceding vowels
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}


def _vowel_count(w: str) -> int:
    return sum(1 for c in w if c in _VOWELS)


def _check_harmony(w: str) -> bool:
    """Last vowel of `w` must harmonize with the vowel before it."""
    v1 = v2 = None
    for c in reversed(w):
        if c in _VOWELS:
            if v1 is None:
                v1 = c
            else:
                v2 = c
                break
    if v1 is None or v2 is None:
        return False
    allowed = _HARMONY.get(v1)
    return allowed is not None and v2 in allowed


def _expand(template: str) -> list[str]:
    """Expand the description's capital metavowels/metaconsonants:
    A -> a/e, U -> ı/i/u/ü, D -> d/t."""
    forms = [""]
    for ch in template:
        if ch == "A":
            alts = "ae"
        elif ch == "U":
            alts = "ıiuü"
        elif ch == "D":
            alts = "dt"
        else:
            alts = ch
        forms = [f + a for f in forms for a in alts]
    return forms


class _Suffix:
    """One suffix class, e.g. -(y)Um: concrete forms + optional buffer
    consonant/vowel + whether vowel harmony applies."""

    __slots__ = ("forms", "buffer", "harmony")

    def __init__(self, template: str, buffer: str | None = None,
                 harmony: bool = True):
        self.forms = sorted(_expand(template), key=len, reverse=True)
        self.buffer = buffer
        self.harmony = harmony

    def strip(self, w: str) -> str | None:
        """Return the word with this suffix removed, or None."""
        if self.harmony and not _check_harmony(w):
            return None
        for form in self.forms:
            if not w.endswith(form):
                continue
            head = w[: len(w) - len(form)]
            if not head:
                continue
            if self.buffer is None:
                return head
            # buffered: take buffer letter after a vowel-final stem,
            # bare form only after a consonant-final stem
            if self.buffer == "U":
                if head[-1] in "ıiuü" and len(head) >= 2:
                    return head[:-1]
                if head[-1] not in _VOWELS:
                    return head
                return None
            if head[-1] == self.buffer:
                if len(head) >= 2 and head[-2] in _VOWELS:
                    return head[:-1]
                return None
            if head[-1] not in _VOWELS:
                return head
            return None
        return None


# --- nominal verb suffixes (description section 1) ---
_YMUS = _Suffix("mUş", "y")
_YDU = _Suffix("DU", "y")
_YSA = _Suffix("sA", "y")
_YKEN = _Suffix("ken", "y", harmony=False)
_CASINA = _Suffix("cAsInA")
_SUNUZ = _Suffix("sUnUz")
_LAR = _Suffix("lAr")
_YUM = _Suffix("Um", "y")
_SUN = _Suffix("sUn")
_YUZ = _Suffix("Uz", "y")
_NUZ = _Suffix("nUz")
_DUR = _Suffix("DUr")

# --- noun suffixes (description section 2) ---
_LARI = _Suffix("lArI")
_NCA = _Suffix("cA", "n")
_UM_POSS = _Suffix("m", "U")
_UMUZ = _Suffix("mUz", "U")
_UN_POSS = _Suffix("n", "U")
_UNUZ = _Suffix("nUz", "U")
_SU = _Suffix("U", "s")
_NU = _Suffix("nU")
_NUN = _Suffix("Un", "n")
_YU = _Suffix("U", "y")
_YLA = _Suffix("lA", "y")
_KI = _Suffix("ki", harmony=False)
_NDA = _Suffix("DA", "n")
_NDAN = _Suffix("DAn", "n")
_YA = _Suffix("A", "y")

_POSSESSIVES = (_UMUZ, _UNUZ, _LARI, _UM_POSS, _UN_POSS, _SU, _NU)


def _try(w: str, *suffixes: _Suffix) -> str | None:
    for s in suffixes:
        out = s.strip(w)
        if out is not None:
            return out
    return None


def _nominal_verb(w: str) -> tuple[str, bool]:
    """Strip one nominal-verb suffix chain.  Returns (word,
    continue_with_noun_suffixes)."""
    out = _try(w, _YMUS, _YDU, _YSA, _YKEN)
    if out is not None:
        return out, True
    out = _CASINA.strip(w)
    if out is not None:
        mid = _try(out, _SUNUZ, _LAR, _YUM, _SUN, _YUZ)
        if mid is not None:
            out = mid
        tail = _YMUS.strip(out)
        return (tail if tail is not None else out), True
    out = _LAR.strip(w)
    if out is not None:
        more = _try(out, _DUR, _YDU, _YSA, _YMUS)
        if more is not None:
            # -lArDUr / -lArDU / ... : a finished verb form; the
            # description stops noun stemming here
            return more, False
        return out, True
    out = _NUZ.strip(w)
    if out is not None:
        more = _try(out, _YDU, _YSA)
        return (more if more is not None else out), True
    out = _try(w, _SUNUZ, _YUZ, _SUN, _YUM)
    if out is not None:
        more = _YMUS.strip(out)
        return (more if more is not None else out), True
    out = _DUR.strip(w)
    if out is not None:
        mid = _try(out, _SUNUZ, _LAR, _YUM, _SUN, _YUZ)
        if mid is not None:
            more = _YMUS.strip(mid)
            if more is not None:
                return more, True
        more = _YMUS.strip(out)
        return (more if more is not None else out), True
    return w, True


def _after_ki(w: str) -> str:
    """The ki-chain: -ki attaches to locative/genitive forms and can
    recurse ("evindekilerin" ...)."""
    out = _NDA.strip(w)
    if out is not None:
        more = _LAR.strip(out)
        if more is not None:
            return _ki_chain(more)
        more = _try(out, *_POSSESSIVES)
        if more is not None:
            lar = _LAR.strip(more)
            if lar is not None:
                return _ki_chain(lar)
            return more
        return out
    out = _NUN.strip(w)
    if out is not None:
        more = _LARI.strip(out)
        if more is not None:
            return more
        more = _SU.strip(out)
        if more is not None:
            lar = _LAR.strip(more)
            if lar is not None:
                return _ki_chain(lar)
            return more
        ki = _KI.strip(out)
        if ki is not None:
            return _after_ki(ki)
        return out
    return w


def _ki_chain(w: str) -> str:
    ki = _KI.strip(w)
    if ki is not None:
        return _after_ki(ki)
    return w


def _noun(w: str) -> str:
    """Strip one noun-suffix chain (longest sensible composition, per
    the description's ordering)."""
    out = _LAR.strip(w)
    if out is not None:
        return _ki_chain(out)
    out = _NCA.strip(w)
    if out is not None:
        mid = _LARI.strip(out)
        if mid is not None:
            return mid
        mid = _NUN.strip(out)
        if mid is not None:
            lar = _LAR.strip(mid)
            return lar if lar is not None else mid
        lar = _LAR.strip(out)
        if lar is not None:
            return lar
        return out
    out = _try(w, _NDAN, _NDA)
    if out is not None:
        poss = _try(out, *_POSSESSIVES)
        if poss is not None:
            lar = _LAR.strip(poss)
            if lar is not None:
                return _ki_chain(lar)
            return poss
        return _ki_chain(out)
    out = _try(w, _NUN, _YLA)
    if out is not None:
        mid = _try(out, *_POSSESSIVES)
        if mid is not None:
            lar = _LAR.strip(mid)
            if lar is not None:
                return _ki_chain(lar)
            return mid
        lar = _LAR.strip(out)
        if lar is not None:
            return _ki_chain(lar)
        return _ki_chain(out)
    out = _LARI.strip(w)
    if out is not None:
        return out
    out = _ki_chain(w)
    if out != w:
        return out
    out = _try(w, *_POSSESSIVES)
    if out is not None:
        lar = _LAR.strip(out)
        if lar is not None:
            return _ki_chain(lar)
        return out
    out = _try(w, _YU, _YA)
    if out is not None:
        mid = _try(out, *_POSSESSIVES)
        if mid is not None:
            lar = _LAR.strip(mid)
            if lar is not None:
                return lar
            return mid
        lar = _LAR.strip(out)
        if lar is not None:
            return lar
        return out
    return w


def _postlude(w: str) -> str:
    if w and w[-1] in "dg":
        last_v = next((c for c in reversed(w) if c in _VOWELS), None)
        for u, group in (("ı", "aı"), ("i", "ei"), ("u", "ou"),
                         ("ü", "öü")):
            if last_v in group:
                w = w + u
                break
    if w and w[-1] in "bcdğ":
        w = w[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[w[-1]]
    return w


def stem(word: str) -> str:
    w = word.lower()
    if _vowel_count(w) <= 1:
        return w
    w2, continue_nouns = _nominal_verb(w)
    if continue_nouns:
        # single pass: chained forms are composed inside _noun itself
        w2 = _noun(w2)
    return _postlude(w2)
