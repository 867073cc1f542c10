"""Snowball Portuguese stemmer, implemented from the published
algorithm (snowballstem.org, "The Portuguese stemming algorithm")."""

from __future__ import annotations

#: nasal vowels are rewritten to two-character forms for the duration
#: of the algorithm (spec prelude), restored in the postlude
_VOWELS = frozenset("aeiouáéíóúâêô")

_DEACCENT = str.maketrans("áéíóúâêô", "aeiouaeo")

_STEP1_DELETE_R2 = sorted(
    """eza ezas ico ica icos icas ismo ismos ável ível ista istas oso
    osa osos osas amento amentos imento imentos""".split(),
    key=len, reverse=True)

_STEP2_VERB = sorted(
    """ada ida ia aria eria iria ará ara erá era irá ava asse esse
    isse aste este iste ei arei erei irei am ado ido ando endo indo
    ara~o era~o ira~o ar er ir as adas idas ias arias erias irias
    arás aras erás eras irás avas es ardes erdes irdes ares eres ires
    asses esses isses astes estes istes is ais eis íeis aríeis eríeis
    iríeis áreis areis éreis ereis íreis ireis ásseis ésseis ísseis
    áveis ados idos ámos amos íamos aríamos eríamos iríamos áramos
    éramos íramos ávamos emos aremos eremos iremos ássemos êssemos
    íssemos imos armos ermos irmos eu iu ou ira iras""".split(),
    key=len, reverse=True)


def _prelude(w: str) -> str:
    return w.replace("ã", "a~").replace("õ", "o~")


def _postlude(w: str) -> str:
    return w.replace("a~", "ã").replace("o~", "õ").translate(_DEACCENT) \
        .replace("ã", "a").replace("õ", "o").replace("ç", "c")


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
        return _postlude(w)
    rv = _rv(w)
    r1, r2 = _r1r2(w)

    def in_rv(p):
        return p >= rv

    def in_r1(p):
        return p >= r1

    def in_r2(p):
        return p >= r2

    orig = w

    # ---- step 1: standard suffix removal (longest match)
    cand = None
    for suf in sorted(
            _STEP1_DELETE_R2
            + """adora ador aça~o adoras adores aço~es ante antes
            ância logia logias uça~o uço~es ência ências amente mente
            idade idades iva ivo ivas ivos ira iras""".split(),
            key=len, reverse=True):
        if w.endswith(suf):
            cand = suf
            break
    if cand is not None:
        p = len(w) - len(cand)
        if cand in ("adora", "ador", "aça~o", "adoras", "adores",
                    "aço~es", "ante", "antes", "ância"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("logia", "logias"):
            if in_r2(p):
                w = w[:p] + "log"
        elif cand in ("uça~o", "uço~es"):
            if in_r2(p):
                w = w[:p] + "u"
        elif cand in ("ência", "ências"):
            if in_r2(p):
                w = w[:p] + "ente"
        elif cand == "amente":
            if in_r1(p):
                w = w[:p]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith(("os", "ic", "ad")) \
                        and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand == "mente":
            if in_r2(p):
                w = w[:p]
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break
        elif cand in ("idade", "idades"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("abil") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith(("ic", "iv")) and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("ira", "iras"):
            # replace with ir when in RV and preceded by e
            if in_rv(p) and p > 0 and w[p - 1] == "e":
                w = w[:p] + "ir"
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

    # ---- step 3: trailing i after c (only if 1 or 2 changed the word)
    if w != orig:
        if w.endswith("i") and len(w) - 1 >= rv and len(w) > 1 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        # ---- step 4: residual suffix
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            p = len(w) - len(suf)
            if w.endswith(suf):
                if in_rv(p):
                    w = w[:p]
                break

    # ---- step 5: residual e / é / ê + gu/ci undoubling
    if w and w[-1] in "eéê" and len(w) - 1 >= rv:
        w = w[:-1]
        if len(w) >= 2 and ((w.endswith("gu") or w.endswith("ci"))
                            and len(w) - 1 >= rv):
            w = w[:-1]
    return _postlude(w)
