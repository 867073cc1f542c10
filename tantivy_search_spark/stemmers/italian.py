"""Snowball Italian stemmer, implemented from the published algorithm
(snowballstem.org, "The Italian stemming algorithm")."""

from __future__ import annotations

_VOWELS = frozenset("aeiouàèìòù")

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")

_PRONOUNS = sorted(
    """ci gli la le li lo mi ne si ti vi sene gliela gliele glieli
    glielo gliene mela mele meli melo mene tela tele teli telo tene
    cela cele celi celo cene vela vele veli velo vene""".split(),
    key=len, reverse=True)

_STEP1_DELETE_R2 = sorted(
    """anza anze ico ici ica ice iche ichi ismo ismi abile abili ibile
    ibili ista iste isti istà istè istì oso osi osa ose mente atrice
    atrici ante anti""".split(), key=len, reverse=True)

_STEP2_VERB = sorted(
    """ammo ando ano are arono asse assero assi assimo ata ate ati ato
    ava avamo avano avate avi avo emmo enda ende endi endo erà erai
    eranno ere erebbe erebbero erei eremmo eremo ereste eresti erete
    erò erono essero ete eva evamo evano evate evi evo Yamo iamo immo
    irà irai iranno ire irebbe irebbero irei iremmo iremo ireste
    iresti irete irò irono isca iscano isce isci isco iscono issero
    ita ite iti ito iva ivamo ivano ivate ivi ivo ono uta ute uti uto
    ar ir""".split(), key=len, reverse=True)


def _prelude(w: str) -> str:
    w = w.translate(_ACUTE_TO_GRAVE)
    out = list(w)
    n = len(w)
    for i, c in enumerate(w):
        if c in "ui" and 0 < i < n - 1 \
                and w[i - 1] in _VOWELS and w[i + 1] in _VOWELS:
            out[i] = c.upper()
        elif c == "u" and i > 0 and w[i - 1] == "q":
            out[i] = "U"
    return "".join(out)


def _rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _VOWELS:
        for i in range(2, n):
            if w[i] in _VOWELS:
                return i + 1
        return n
    if w[0] in _VOWELS and w[1] in _VOWELS:
        for i in range(2, n):
            if w[i] not in _VOWELS:
                return i + 1
        return n
    return 3


def _r1r2(w: str) -> tuple[int, int]:
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
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w.lower().replace("U", "u").replace("I", "i")
    rv = _rv(w)
    r1, r2 = _r1r2(w)

    def in_rv(p):
        return p >= rv

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    # ---- step 0: attached pronoun, after ando/endo (delete) or
    # ar/er/ir (replace with e), all within RV
    for pron in _PRONOUNS:
        if w.endswith(pron):
            base = w[: -len(pron)]
            done = False
            for pre in ("ando", "endo"):
                if base.endswith(pre) and in_rv(len(base) - len(pre)):
                    w = base
                    done = True
                    break
            if not done:
                for pre in ("ar", "er", "ir"):
                    if base.endswith(pre) and in_rv(len(base) - len(pre)):
                        w = base + "e"
                        break
            break

    orig = w

    # ---- step 1: standard suffixes (longest match)
    cand = None
    for suf in sorted(
            _STEP1_DELETE_R2
            + """azione azioni atore atori logia logie uzione uzioni
            usione usioni enza enze amento amenti imento imenti amente
            ità ivo ivi iva ive""".split(), key=len, reverse=True):
        if w.endswith(suf):
            cand = suf
            break
    if cand is not None:
        p = len(w) - len(cand)
        if cand == "amente":
            if in_r1(p):
                w = w[:p]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic")) and in_r2(len(w) - 2):
                    w = w[:-2]
                elif w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
        elif cand in ("amento", "amenti", "imento", "imenti"):
            if in_rv(p):
                w = w[:p]
        elif cand in ("azione", "azioni", "atore", "atori"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("logia", "logie"):
            if in_r2(p):
                w = w[:p] + "log"
        elif cand in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(p):
                w = w[:p] + "u"
        elif cand in ("enza", "enze"):
            if in_r2(p):
                w = w[:p] + "ente"
        elif cand == "ità":
            if in_r2(p):
                w = w[:p]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("ivo", "ivi", "iva", "ive"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
        else:
            if in_r2(p):
                w = w[:p]

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if w == orig:
        for suf in _STEP2_VERB:
            p = len(w) - len(suf)
            if w.endswith(suf) and in_rv(p):
                w = w[:p]
                break

    # ---- step 3a: residual vowel suffix (+ trailing i) in RV
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w and w[-1] == "i" and in_rv(len(w) - 1):
            w = w[:-1]

    # ---- step 3b: ch/gh -> c/g in RV
    if w.endswith(("ch", "gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")
