"""Snowball Hungarian stemmer, implemented from the published
algorithm description (snowballstem.org, "The Hungarian stemming
algorithm", Tordai & de Rijke) — the algorithm behind tantivy's
Stemmer(Language::Hungarian)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).

Every step is a `do` in the Snowball source: each runs in order
whether or not the previous one removed anything.  Suffix searches
are longest-match inside R1; a failed side-condition removes nothing
(no shorter-suffix fallback), per Snowball `among` semantics.
"""

from __future__ import annotations

_VOWELS = frozenset("aáeéiíoóöőuúüű")

#: the nine consonant digraphs (dzs is the trigraph), longest first
_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

#: doubled consonants (incl. doubled digraphs, written with the first
#: letter doubled), longest first; undoubling drops the first letter
_DOUBLES = sorted(
    """bb cc ccs dd ff gg ggy jj kk ll lly mm nn nny pp rr ss ssz tt
    tty vv zz zzs""".split(), key=len, reverse=True)

_CASE_SUFFIXES = sorted(
    """ban ben ba be ra re nak nek val vel tól től ról ről ból ből hoz
    hez höz nál nél ig at et ot öt ért képp képpen kor ul ül vá vé
    onként enként anként ként en on an ön n t""".split(),
    key=len, reverse=True)

#: (suffix, replacement-or-None) tables, longest-match
_CASE_SPECIAL = [("ánként", "a"), ("én", "e"), ("án", "a")]
_CASE_OTHER = [("astul", None), ("estül", None), ("ástul", "a"),
               ("éstül", "e"), ("stul", None), ("stül", None)]
_OWNED = [("oké", None), ("öké", None), ("aké", None), ("eké", None),
          ("áké", "a"), ("éké", "e"), ("ké", None), ("éi", None),
          ("ái", "a"), ("é", None)]
_SING_OWNER = sorted(
    [("ünk", None), ("unk", None), ("ánk", "a"), ("énk", "e"),
     ("nk", None), ("ájuk", "a"), ("éjük", "e"), ("juk", None),
     ("jük", None), ("uk", None), ("ük", None), ("ém", "e"),
     ("ám", "a"), ("em", None), ("om", None), ("am", None),
     ("m", None), ("od", None), ("ed", None), ("ad", None),
     ("öd", None), ("éd", "e"), ("ád", "a"), ("d", None),
     ("ja", None), ("je", None), ("a", None), ("e", None),
     ("o", None), ("á", "a"), ("é", "e")],
    key=lambda t: len(t[0]), reverse=True)
_PLUR_OWNER = sorted(
    [("jaim", None), ("jeim", None), ("áim", "a"), ("éim", "e"),
     ("im", None), ("jaid", None), ("jeid", None), ("áid", "a"),
     ("éid", "e"), ("id", None), ("jai", None), ("jei", None),
     ("ái", "a"), ("éi", "e"), ("i", None), ("jaink", None),
     ("jeink", None), ("áink", "a"), ("éink", "e"), ("ink", None),
     ("jaitok", None), ("jeitek", None), ("áitok", "a"),
     ("éitek", "e"), ("itek", None), ("jeik", None), ("jaik", None),
     ("áik", "a"), ("éik", "e"), ("ik", None)],
    key=lambda t: len(t[0]), reverse=True)
_UNDEF_FORM = [("ák", "a"), ("ék", "e"), ("ök", None), ("ok", None),
               ("ek", None), ("ak", None), ("k", None)]


def _r1(w: str) -> int:
    """R1 start: word begins with a vowel -> after the first consonant
    or digraph; begins with a consonant -> after the first vowel;
    neither -> null region at the end."""
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _VOWELS:
        i = 1
        while i < n and w[i] in _VOWELS:
            i += 1
        if i == n:
            return n
        for d in _DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    return n if i == n else i + 1


def _ends_double(w: str, upto: int) -> int:
    """Length of the doubled-consonant cluster ending at w[:upto]
    (longest match), or 0."""
    head = w[:upto]
    for d in _DOUBLES:
        if head.endswith(d):
            return len(d)
    return 0


def _undouble(w: str) -> str:
    """Remove the first letter of the trailing double cluster."""
    k = _ends_double(w, len(w))
    if k:
        w = w[: len(w) - k] + w[len(w) - k + 1:]
    return w


def _longest_in_r1(w: str, r1: int, table) -> tuple[str, object] | None:
    for suf, action in table:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            return suf, action
    return None


def _apply_table(w: str, r1: int, table) -> str:
    hit = _longest_in_r1(w, r1, table)
    if hit is None:
        return w
    suf, repl = hit
    w = w[: -len(suf)]
    return w + repl if repl else w


def _v_ending(w: str, r1: int) -> str:
    """Word ends á in R1 -> a; é in R1 -> e."""
    if len(w) >= 1 and len(w) - 1 >= r1:
        if w[-1] == "á":
            return w[:-1] + "a"
        if w[-1] == "é":
            return w[:-1] + "e"
    return w


def stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w
    r1 = _r1(w)

    # step 1: instrumental case — al/el in R1 preceded by a double
    # consonant: delete, then undouble
    for suf in ("al", "el"):
        if w.endswith(suf) and len(w) - 2 >= r1:
            if _ends_double(w, len(w) - 2):
                w = _undouble(w[:-2])
            break

    # step 2: frequent cases — delete, then á->a / é->e tidy
    hit = _longest_in_r1(w, r1, [(s, None) for s in _CASE_SUFFIXES])
    if hit is not None:
        w = w[: -len(hit[0])]
        w = _v_ending(w, r1)

    # step 3: special cases (replacements)
    w = _apply_table(w, r1, _CASE_SPECIAL)
    # step 4: other cases (-stul/-stül family)
    w = _apply_table(w, r1, _CASE_OTHER)

    # step 5: factive case — á/é in R1 preceded by a double consonant
    for suf in ("á", "é"):
        if w.endswith(suf) and len(w) - 1 >= r1:
            if _ends_double(w, len(w) - 1):
                w = _undouble(w[:-1])
            break

    # step 6: owned (-é "that of", -éi "those of")
    w = _apply_table(w, r1, _OWNED)
    # step 7: singular owner suffixes
    w = _apply_table(w, r1, _SING_OWNER)
    # step 8: plural owner suffixes
    w = _apply_table(w, r1, _PLUR_OWNER)
    # step 9: plural / undefined form
    w = _apply_table(w, r1, _UNDEF_FORM)
    return w
