"""Snowball Spanish stemmer, implemented from the published algorithm
(snowballstem.org, "The Spanish stemming algorithm")."""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúü")

_ACCENT_MAP = str.maketrans("áéíóú", "aeiou")


def _rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _VOWELS:
        # consonant in second position: RV after the next vowel
        for i in range(2, n):
            if w[i] in _VOWELS:
                return i + 1
        return n
    if w[0] in _VOWELS and w[1] in _VOWELS:
        # two vowels: RV after the next consonant
        for i in range(2, n):
            if w[i] not in _VOWELS:
                return i + 1
        return n
    # consonant-vowel: RV after the third letter
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


_PRONOUNS = sorted(
    "me se sela selo selas selos la le lo las les los nos".split(),
    key=len, reverse=True)
_PRON_PRE_ACCENT = ("iéndo", "ándo", "ár", "ér", "ír")
_PRON_PRE_PLAIN = ("iendo", "ando", "ar", "er", "ir")

_STEP2A = sorted(
    "ya ye yan yen yeron yendo yo yó yas yes yais yamos".split(),
    key=len, reverse=True)

_STEP2B_GU = sorted("en es éis emos".split(), key=len, reverse=True)
_STEP2B = sorted(
    """arían arías arán arás aríais aría aréis aríamos aremos ará aré
    erían erías erán erás eríais ería eréis eríamos eremos erá eré
    irían irías irán irás iríais iría iréis iríamos iremos irá iré aba
    ada ida ía ara iera ad ed id ase iese aste iste an aban ían aran
    ieran asen iesen aron ieron ado ido ando iendo ió ar er ir as abas
    adas idas ías aras ieras ases ieses ís áis abais íais arais ierais
    aseis ieseis asteis isteis ados idos amos ábamos íamos imos áramos
    iéramos iésemos ásemos""".split(), key=len, reverse=True)


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w.translate(_ACCENT_MAP)
    rv = _rv(w)
    r1, r2 = _r1r2(w)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---------------- step 0: attached pronoun
    for pron in _PRONOUNS:
        if w.endswith(pron):
            base = w[: -len(pron)]
            for pre in _PRON_PRE_ACCENT:
                if base.endswith(pre) and len(base) - len(pre) >= rv - 0 \
                        and in_rv(len(base) - len(pre)):
                    w = base.translate(_ACCENT_MAP)
                    break
            else:
                for pre in _PRON_PRE_PLAIN:
                    if base.endswith(pre) and in_rv(len(base) - len(pre)):
                        w = base
                        break
                else:
                    if base.endswith("yendo") and len(base) >= 6 \
                            and base[-6] == "u":
                        w = base
            break

    orig = w

    # ---------------- step 1: standard suffix removal (longest match)
    cand = None
    for suf in sorted(
            """anza anzas ico ica icos icas ismo ismos able ables ible
            ibles ista istas oso osa osos osas amiento amientos imiento
            imientos adora ador ación adoras adores aciones ante antes
            ancia ancias logía logías ución uciones encia encias
            amente mente idad idades iva ivo ivas ivos""".split(),
            key=len, reverse=True):
        if w.endswith(suf):
            cand = suf
            break
    if cand is not None:
        p = len(w) - len(cand)
        if cand in ("anza", "anzas", "ico", "ica", "icos", "icas",
                    "ismo", "ismos", "able", "ables", "ible", "ibles",
                    "ista", "istas", "oso", "osa", "osos", "osas",
                    "amiento", "amientos", "imiento", "imientos"):
            if in_r2(p):
                w = w[:p]
        elif cand in ("adora", "ador", "ación", "adoras", "adores",
                      "aciones", "ante", "antes", "ancia", "ancias"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("logía", "logías"):
            if in_r2(p):
                w = w[:p] + "log"
        elif cand in ("ución", "uciones"):
            if in_r2(p):
                w = w[:p] + "u"
        elif cand in ("encia", "encias"):
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
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
        elif cand in ("idad", "idades"):
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

    # ---------------- steps 2a / 2b: verb suffixes
    if w == orig:
        before = w
        for suf in _STEP2A:
            p = len(w) - len(suf)
            if w.endswith(suf) and in_rv(p) and p > 0 and w[p - 1] == "u":
                w = w[:p]
                break
        if w == before:
            cand = None
            for suf in sorted(_STEP2B + _STEP2B_GU, key=len,
                              reverse=True):
                p = len(w) - len(suf)
                if w.endswith(suf) and in_rv(p):
                    cand = suf
                    break
            if cand is not None:
                p = len(w) - len(cand)
                w = w[:p]
                if cand in _STEP2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # ---------------- step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó"):
        p = len(w) - len(suf)
        if w.endswith(suf):
            if in_rv(p):
                w = w[:p]
            break
    else:
        if w.endswith(("e", "é")):
            p = len(w) - 1
            if in_rv(p):
                w = w[:p]
                if w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]

    return w.translate(_ACCENT_MAP)
