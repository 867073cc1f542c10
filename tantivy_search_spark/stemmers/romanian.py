"""Snowball Romanian stemmer, implemented from the published
algorithm description (snowballstem.org, "The Romanian stemming
algorithm") — the algorithm behind tantivy's
Stemmer(Language::Romanian)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).

Uses the cedilla forms ş/ţ internally (the forms the algorithm is
defined over); comma-below variants ș/ț in the input are normalized
first.  As in the spec's prelude, i/u between vowels are upper-cased
to I/U (consonants for every later test, opaque to suffix matching)
and lower-cased again at the end.
"""

from __future__ import annotations

_VOWELS = frozenset("aăâeiîou")


def _prelude(w: str) -> str:
    """Spec prelude: i/u between vowels become I/U (consonants for
    every later test, and opaque to lowercase suffix matching)."""
    out = list(w)
    for i in range(1, len(w) - 1):
        if w[i] in "iu" and w[i - 1] in _VOWELS and w[i + 1] in _VOWELS:
            out[i] = w[i].upper()
    return "".join(out)


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS


def _regions(w: str) -> tuple[int, int, int]:
    """(rv, r1, r2) start offsets per the standard Romance/Snowball
    definitions."""
    n = len(w)
    rv = n
    if n >= 3:
        if not _is_vowel(w, 1):
            # second letter a consonant: after the next vowel
            for i in range(2, n):
                if _is_vowel(w, i):
                    rv = i + 1
                    break
        elif _is_vowel(w, 0):
            # first two letters vowels: after the next consonant
            for i in range(2, n):
                if not _is_vowel(w, i):
                    rv = i + 1
                    break
        else:
            # consonant + vowel: after the third letter
            rv = 3
    r1 = n
    for i in range(1, n):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return rv, r1, r2


def _table(pairs):
    return sorted(pairs, key=lambda t: len(t[0]), reverse=True)


#: step 0: removal of plurals (and other simplifications), in R1
_STEP0 = _table(
    [("ul", ""), ("ului", "")]
    + [("aua", "a")]
    + [(s, "e") for s in ("ea", "ele", "elor")]
    + [(s, "i") for s in ("ii", "iua", "iei", "iile", "iilor", "ilor")]
    + [("ile", "i!ab")]          # 'ile' -> 'i' unless preceded by 'ab'
    + [("atei", "at")]
    + [("aţie", "aţi"), ("aţia", "aţi")])

#: step 1: reduction of combining suffixes (repeated), in R1
_STEP1 = _table(
    [(s, "abil") for s in
     ("abilitate", "abilitati", "abilităi", "abilităţi")]
    + [("ibilitate", "ibil")]
    + [(s, "iv") for s in ("ivitate", "ivitati", "ivităi", "ivităţi")]
    + [(s, "ic") for s in
       ("icitate", "icitati", "icităi", "icităţi", "icator",
        "icatori", "iciv", "iciva", "icive", "icivi", "icivă",
        "ical", "icala", "icale", "icali", "icală")]
    + [(s, "at") for s in
       ("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
        "atoare", "ator", "atori", "ătoare", "ător", "ători")]
    + [(s, "it") for s in
       ("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
        "itoare", "itor", "itori")])

#: step 2: removal of standard suffixes, in R2
_STEP2_DELETE = _table([(s, "") for s in """
    at ata ată ati ate ut uta ută uti ute it ita ită iti ite
    ic ica ice ici ică abil abila abile abili abilă
    ibil ibila ibile ibili ibilă oasa oasă oase os osi oşi
    ant anta ante anti antă ator atori itate itati ităi ităţi
    iv iva ive ivi ivă""".split()]
    + [("iune", "ţ:t"), ("iuni", "ţ:t")]
    + [(s, "ist") for s in
       ("ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti")])

#: step 3 group 1: delete if preceded (within RV) by a consonant or u
_STEP3_COND = """
    are ere ire âre ind ând indu ându eze ească ez ezi ează esc eşti
    eşte ăsc ăşti ăşte am ai au eam eai ea eau iam iai ia iau
    aşi arăm arăţi ară uşi urăm urăţi ură işi irăm irăţi iră
    âşi ârăm ârăţi âră asem aseşi ase aserăm aserăţi aseră
    isem iseşi ise iserăm iserăţi iseră âsem âseşi âse âserăm
    âserăţi âseră usem useşi use userăm userăţi useră""".split()

#: step 3 group 2: delete unconditionally (in RV)
_STEP3_PLAIN = """
    ăm aţi em eţi im iţi âm âţi seşi serăm serăţi seră sei se
    sesem seseşi sese seserăm seserăţi seseră""".split()

_STEP3 = _table([(s, "cond") for s in _STEP3_COND]
                + [(s, "plain") for s in _STEP3_PLAIN])

#: step 4: remove final vowel, in RV
_STEP4 = _table([(s, "") for s in ("ie", "a", "e", "i", "ă")])


def _longest(w: str, region: int, table):
    for suf, action in table:
        if w.endswith(suf) and len(w) - len(suf) >= region:
            return suf, action
    return None


def stem(word: str) -> str:
    w = word.lower().replace("ș", "ş").replace("ț", "ţ")
    if len(w) <= 2:
        return w
    w = _prelude(w)
    rv, r1, r2 = _regions(w)

    # step 0: plurals etc. (longest match in R1; failed side-condition
    # removes nothing, per among semantics)
    hit = _longest(w, r1, _STEP0)
    if hit is not None:
        suf, repl = hit
        if repl == "i!ab":
            if not w[: -len(suf)].endswith("ab"):
                w = w[: -len(suf)] + "i"
        else:
            w = w[: -len(suf)] + repl

    # step 1: combining suffixes, repeated until no replacement
    removed = False
    while True:
        hit = _longest(w, r1, _STEP1)
        if hit is None:
            break
        suf, repl = hit
        w = w[: -len(suf)] + repl
        removed = True

    # step 2: standard suffixes in R2
    hit = _longest(w, r2, _STEP2_DELETE)
    if hit is not None:
        suf, repl = hit
        if repl == "ţ:t":
            # iune/iuni deleted only when preceded by ţ, which -> t
            if w[: -len(suf)].endswith("ţ"):
                w = w[: -len(suf) - 1] + "t"
                removed = True
        else:
            w = w[: -len(suf)] + repl
            removed = True

    # step 3: verb suffixes in RV, only if steps 1-2 removed nothing
    if not removed:
        hit = _longest(w, rv, _STEP3)
        if hit is not None:
            suf, kind = hit
            p = len(w) - len(suf)
            if kind == "plain":
                w = w[:p]
            elif p > rv and (not _is_vowel(w, p - 1)
                             or w[p - 1] == "u"):
                w = w[:p]

    # step 4: final vowel in RV
    hit = _longest(w, rv, _STEP4)
    if hit is not None:
        w = w[: -len(hit[0])]
    return w.lower()
