"""Snowball French stemmer, implemented from the published algorithm
(snowballstem.org, "The French stemming algorithm")."""

from __future__ import annotations

_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _prelude(w: str) -> str:
    """Mark u/i between vowels as U/I, y next to a vowel as Y, u after
    q as U (all treated as consonants afterwards)."""
    out = list(w)
    n = len(w)
    for i in range(n):
        c = w[i]
        if c in "ui" and 0 < i < n - 1 \
                and w[i - 1] in _VOWELS and w[i + 1] in _VOWELS:
            out[i] = c.upper()
        elif c == "y" and ((i > 0 and w[i - 1] in _VOWELS)
                           or (i < n - 1 and w[i + 1] in _VOWELS)):
            out[i] = "Y"
        elif c == "u" and i > 0 and w[i - 1] == "q":
            out[i] = "U"
    return "".join(out)


def _rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _VOWELS and w[1] in _VOWELS:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    for i in range(1, n):
        if w[i] in _VOWELS:
            return i + 1
    return n


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


_STEP2A = sorted(
    """îmes ît îtes i ie ies ir ira irai iraIent irais irait iras irent
    irez iriez irions irons iront is issaIent issais issait issant
    issante issantes issants isse issent isses issez issiez issions
    issons it""".split(), key=len, reverse=True)

_STEP2B_ER = sorted(
    """é ée ées és èrent er era erai eraIent erais erait eras erez
    eriez erions erons eront ez iez""".split(), key=len, reverse=True)
_STEP2B_A = sorted(
    """âmes ât âtes a ai aIent ais ait ant ante antes ants as asse
    assent asses assiez assions""".split(), key=len, reverse=True)


def stem(word: str) -> str:
    w = _prelude(word.lower())
    if len(w) <= 2:
        return w.lower()
    rv = _rv(w)
    r1, r2 = _r1r2(w)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    orig = w
    step1_removed_ment = False

    # ---------------- step 1: standard suffix removal (longest match)
    suffixes = []  # (suffix, handler-id) — longest endswith wins

    def cut(k: int) -> str:
        return w[:-k] if k else w

    cand = None
    for suf in sorted(
            """ance iqUe isme able iste eux ances iqUes ismes ables
            istes atrice ateur ation atrices ateurs ations logie logies
            usion ution usions utions ence ences ement ements ité ités
            if ive ifs ives eaux aux euse euses issement issements
            amment emment ment ments""".split(), key=len, reverse=True):
        if w.endswith(suf):
            cand = suf
            break
    if cand is not None:
        p = len(w) - len(cand)
        if cand in ("ance", "iqUe", "isme", "able", "iste", "eux",
                    "ances", "iqUes", "ismes", "ables", "istes"):
            if in_r2(p):
                w = w[:p]
        elif cand in ("atrice", "ateur", "ation",
                      "atrices", "ateurs", "ations"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif cand in ("logie", "logies"):
            if in_r2(p):
                w = w[:p] + "log"
        elif cand in ("usion", "ution", "usions", "utions"):
            if in_r2(p):
                w = w[:p] + "u"
        elif cand in ("ence", "ences"):
            if in_r2(p):
                w = w[:p] + "ent"
        elif cand in ("ement", "ements"):
            if in_rv(p):
                w = w[:p]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("iqU") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif cand in ("ité", "ités"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif cand in ("if", "ive", "ifs", "ives"):
            if in_r2(p):
                w = w[:p]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif cand == "eaux":
            w = w[:p] + "eau"
        elif cand == "aux":
            if in_r1(p):
                w = w[:p] + "al"
        elif cand in ("euse", "euses"):
            if in_r2(p):
                w = w[:p]
            elif in_r1(p):
                w = w[:p] + "eux"
        elif cand in ("issement", "issements"):
            if in_r1(p) and p > 0 and w[p - 1] not in _VOWELS:
                w = w[:p]
        elif cand == "amment":
            if in_rv(p):
                w = w[:p] + "ant"
                step1_removed_ment = True
        elif cand == "emment":
            if in_rv(p):
                w = w[:p] + "ent"
                step1_removed_ment = True
        elif cand in ("ment", "ments"):
            if p > 0 and w[p - 1] in _VOWELS and in_rv(p - 1):
                w = w[:p]
                step1_removed_ment = True

    step1_changed = (w != orig)
    do_2a = (not step1_changed) or step1_removed_ment

    # ---------------- steps 2a / 2b: verb suffixes (in RV)
    if do_2a:
        before_2a = w
        for suf in _STEP2A:
            p = len(w) - len(suf)
            if w.endswith(suf) and p >= rv and p > 0 \
                    and w[p - 1] not in _VOWELS and p - 1 >= rv:
                w = w[:p]
                break
        if w == before_2a:
            # step 2b
            cand = None
            for suf in sorted(_STEP2B_ER + _STEP2B_A + ["ions"],
                              key=len, reverse=True):
                p = len(w) - len(suf)
                if w.endswith(suf) and p >= rv:
                    cand = suf
                    break
            if cand is not None:
                p = len(w) - len(cand)
                if cand == "ions":
                    if in_r2(p):
                        w = w[:p]
                elif cand in _STEP2B_ER:
                    w = w[:p]
                else:  # the a-group
                    w = w[:p]
                    if w.endswith("e") and len(w) - 1 >= rv:
                        w = w[:-1]

    # ---------------- step 3 or step 4
    if w != orig:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2 \
                and w[-2] not in "aiouès" and w[-2] != "H":
            w = w[:-1]
        cand = None
        for suf in ("Ière", "ière", "Ier", "ier", "ion", "e", "ë"):
            if w.endswith(suf):
                cand = suf
                break
        if cand == "ion":
            p = len(w) - 3
            # RV-limited among: the s/t lookback must also be inside RV
            if in_r2(p) and p - 1 >= rv and p > 0 and w[p - 1] in "st":
                w = w[:p]
        elif cand in ("Ière", "ière", "Ier", "ier"):
            p = len(w) - len(cand)
            if p >= rv:
                w = w[:p] + "i"
        elif cand == "e":
            if len(w) - 1 >= rv:
                w = w[:-1]
        elif cand == "ë":
            if len(w) >= 3 and w[-3:-1] == "gu" and len(w) - 1 >= rv:
                w = w[:-1]

    # ---------------- step 5: undouble
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(suf):
            w = w[:-1]
            break

    # ---------------- step 6: un-accent
    i = len(w) - 1
    seen_nonvowel = 0
    while i >= 0 and w[i] not in _VOWELS:
        seen_nonvowel += 1
        i -= 1
    if seen_nonvowel >= 1 and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")
