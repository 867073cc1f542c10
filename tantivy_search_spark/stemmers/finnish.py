"""Snowball Finnish stemmer, implemented from the published algorithm
description (snowballstem.org, "The Finnish stemming algorithm") — the
algorithm behind tantivy's Stemmer(Language::Finnish)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers)."""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäö")
#: restricted vowel set V (the spec's vowels minus y), used by the
#: step-3 "siin/den/tten preceded by Vi" rule
_RV = frozenset("aeiouäö")
#: long vowels
_LV = frozenset(("aa", "ee", "ii", "oo", "uu", "ää", "öö"))

_STEP1_PARTICLES = sorted(
    "kin kaan kään ko kö han hän pa pä".split(), key=len, reverse=True)
_STEP4 = sorted(
    """mpi mpa mpä mmi mma mmä impi impa impä immi imma immä eja
    ejä""".split(), key=len, reverse=True)
_HXN = {"han": "a", "hen": "e", "hin": "i", "hon": "o", "hun": "u",
        "hyn": "y", "hän": "ä", "hön": "ö"}

#: step-3 case endings, one longest-match table (Snowball `among`
#: semantics: the longest suffix wins and if its side-condition fails
#: nothing is removed — no fallback to a shorter suffix)
_STEP3 = sorted(
    [("seen", "seen"), ("siin", "Vi"), ("tten", "Vi"), ("den", "Vi")]
    + [(s, "hXn") for s in _HXN]
    + [("tta", "tta"), ("ttä", "tta")]
    + [(s, "simple") for s in
       "ta tä ssa ssä sta stä lla llä lta ltä lle na nä ksi ine".split()]
    + [("a", "a"), ("ä", "a"), ("n", "n")],
    key=lambda t: len(t[0]), reverse=True)


def _regions(w: str) -> tuple[int, int]:
    n = len(w)
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
    return r1, r2


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1, r2 = _regions(w)

    # step 1: particles etc.  Longest of the particle suffixes in R1,
    # deleted if preceded by n, t or a vowel; 'sti' deleted if in R2.
    for suf in _STEP1_PARTICLES:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            p = len(w) - len(suf)
            if p > 0 and (w[p - 1] in _VOWELS or w[p - 1] in "nt"):
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("sti") and len(w) - 3 >= r2:
            w = w[:-3]

    # step 2: possessives, in R1
    if w.endswith("si") and len(w) - 2 >= r1:
        if not (len(w) >= 3 and w[-3] == "k"):
            w = w[:-2]
    elif w.endswith("ni") and len(w) - 2 >= r1:
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif w.endswith(("nsa", "nsä", "mme", "nne")) and len(w) - 3 >= r1:
        w = w[:-3]
    elif w.endswith("an") and len(w) - 2 >= r1 and w[:-2].endswith(
            ("ta", "ssa", "sta", "lla", "lta", "na")):
        w = w[:-2]
    elif w.endswith("än") and len(w) - 2 >= r1 and w[:-2].endswith(
            ("tä", "ssä", "stä", "llä", "ltä", "nä")):
        w = w[:-2]
    elif w.endswith("en") and len(w) - 2 >= r1 and w[:-2].endswith(
            ("lle", "ine")):
        w = w[:-2]

    # step 3: cases — single longest match in R1; a failed
    # side-condition removes nothing (no shorter-suffix fallback)
    ending_removed = False
    n = len(w)
    for suf, kind in _STEP3:
        k = len(suf)
        if not w.endswith(suf) or n - k < r1:
            continue
        if kind == "hXn":
            # 'han' preceded by a, 'hen' by e, ... -> delete
            if n >= 4 and w[-4] == _HXN[suf]:
                w = w[:-3]
                ending_removed = True
        elif kind == "seen":
            if n >= 6 and w[-6:-4] in _LV:
                w = w[:-4]
                ending_removed = True
        elif kind == "Vi":
            if n >= k + 2 and w[n - k - 1] == "i" and w[n - k - 2] in _RV:
                w = w[:-k]
                ending_removed = True
        elif kind == "tta":
            if n >= 4 and w[-4] == "e":
                w = w[:-3]
                ending_removed = True
        elif kind == "simple":
            w = w[:-k]
            ending_removed = True
        elif kind == "a":
            # a/ä preceded by cv
            if n >= 3 and w[-2] in _VOWELS and w[-3] not in _VOWELS:
                w = w[:-1]
                ending_removed = True
        else:  # 'n': delete; then drop a preceding LV vowel or 'ie' e
            w = w[:-1]
            ending_removed = True
            if w.endswith("ie") or (len(w) >= 2 and w[-2:] in _LV):
                w = w[:-1]
        break

    # step 4: other endings, in R2 (longest match)
    n = len(w)
    for suf in _STEP4:
        if w.endswith(suf) and n - len(suf) >= r2:
            if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if w[:-len(suf)].endswith("po"):
                    break
            w = w[: -len(suf)]
            break

    # step 5
    if ending_removed:
        if (w.endswith("i") or w.endswith("j")) and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2 \
                and w[-2] in _VOWELS:
            w = w[:-1]
            if w.endswith("imma") and len(w) - 4 >= r2:
                w = w[:-4]
            elif w.endswith("mma") and len(w) - 3 >= r2 \
                    and not w[:-3].endswith("po"):
                w = w[:-3]

    # step 6: tidying, restricted to R1 for (a)-(d) (the spec's
    # setlimit-to-p1 wraps the whole test, so the full suffix must sit
    # inside R1)
    # (a) R1 ends LV -> delete last letter
    if len(w) >= 2 and len(w) - 2 >= r1 and w[-2:] in _LV:
        w = w[:-1]
    # (b) R1 ends cX, X in {a ä e i}, c a consonant -> delete last letter
    if len(w) >= 2 and len(w) - 2 >= r1 and w[-1] in "aäei" \
            and w[-2] not in _VOWELS:
        w = w[:-1]
    # (c) R1 ends oj or uj -> delete last letter
    if len(w) >= 2 and len(w) - 2 >= r1 and w[-2:] in ("oj", "uj"):
        w = w[:-1]
    # (d) R1 ends jo -> delete last letter
    if len(w) >= 2 and len(w) - 2 >= r1 and w[-2:] == "jo":
        w = w[:-1]
    # (e) not restricted to R1: word ends double consonant followed by
    # zero or more vowels -> remove the last consonant of the double
    i = len(w) - 1
    while i >= 0 and w[i] in _VOWELS:
        i -= 1
    if i >= 1 and w[i] not in _VOWELS and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w
