"""Snowball Tamil stemmer, implemented from the published algorithm
description (snowballstem.org, "The Tamil stemming algorithm",
Damodharan Rajalingam) — the algorithm behind tantivy's
Stemmer(Language::Tamil)
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).

The algorithm strips, in order: question clitics, the conjunction
-um, common word endings, plural markers (with sandhi restoration:
-ngkal -> -m, -kkal -> virama), case suffixes (vetrumai urupukal) and
tense/person endings, each guarded by a minimum word length, working
directly on the Tamil script (vowel signs + virama ``்``).  The
suffix inventory is transcribed from the description; the rarer
sandhi-restoration special cases are reduced to the principal rules
(recorded in COVERAGE.md).
"""

from __future__ import annotations

_VIRAMA = "்"          # ்
_MIN = 4                     # has_min_length: only stem longer words


#: never stem below one syllable: a result of fewer than 3 code points
#: (e.g. a bare consonant + virama) merges unrelated lemmas into one
#: term — வந்தானா must stop at வந்தான், not collapse to வ்
#: (ADVICE r4; rarely reached, the _MIN word-length guard handles most)
_MIN_RESULT = 3


def _replace(w: str, table) -> tuple[str, bool]:
    """Longest-match one (suffix -> replacement) rule; None keeps the
    word unchanged when no rule matches, or when the result would drop
    under _MIN_RESULT code points."""
    for suf, repl in table:
        if w.endswith(suf) and len(w) - len(suf) >= 1:
            head = w[: -len(suf)]
            if repl == _VIRAMA and head.endswith(_VIRAMA):
                repl = ""
            out = head + repl
            if len(out) < _MIN_RESULT:
                return w, False
            return out, True
    return w, False


#: question clitics -aa/-ee/-oo written as vowel signs on the last
#: consonant: restore the virama
_QUESTION = [("ா", _VIRAMA),   # ா
             ("ே", _VIRAMA),   # ே
             ("ோ", _VIRAMA)]   # ோ

#: conjunction -um
_UM = [("ும்", _VIRAMA)]          # ும் -> ்

#: common word endings
_COMMON = sorted([
    ("ுடன்", _VIRAMA),        # ுடன் (together with)
    ("ிலிருந்து",
     _VIRAMA),                                    # ிலிருந்து (from)
    ("ாமல்", _VIRAMA),        # ாமல் (without)
    ("ாகிய", ""),             # ாகிய
    ("ாகி", ""),                   # ாகி
    ("ாக", _VIRAMA),                    # ாக (as)
    ("ென்று", ""),       # என்று (that)
    ("ுள்ள", _VIRAMA),        # ுள்ள (having)
], key=lambda t: len(t[0]), reverse=True)

#: plural: -kkal -> virama, -ngkal -> -m, -kal -> delete
_PLURAL = [
    ("க்கள்", _VIRAMA),              # க்கள்
    ("ங்கள்", "ம்"),       # ங்கள் -> ம்
    ("கள்", ""),                               # கள்
]

#: case suffixes (vetrumai urupukal)
_CASE = sorted([
    ("ை", _VIRAMA),                                      # ை acc
    ("ொடு", _VIRAMA),                          # ொடு soc
    ("ோடு", _VIRAMA),                          # ோடு soc
    ("ால்", _VIRAMA),                          # ால் instr
    ("ுக்கு", _VIRAMA),              # ுக்கு dat
    ("ில்", _VIRAMA),                          # ில் loc
    ("ின்", _VIRAMA),                          # ின் gen
    ("து", _VIRAMA),                                # து gen/obl
    ("ிடம்", _VIRAMA),                    # ிடம் loc
], key=lambda t: len(t[0]), reverse=True)

#: tense / person-number-gender endings (repeatedly stripped)
_TENSE = sorted([
    # present கிறு/கின்று families
    ("கிறான்", _VIRAMA),        # கிறான்
    ("கிறாள்", _VIRAMA),        # கிறாள்
    ("கிறார்", _VIRAMA),        # கிறார்
    ("கிறது", _VIRAMA),              # கிறது
    ("கிறேன்", _VIRAMA),        # கிறேன்
    ("கிறோம்", _VIRAMA),        # கிறோம்
    ("கின்றான்", _VIRAMA),
    ("கின்றாள்", _VIRAMA),
    ("கின்றார்", _VIRAMA),
    ("கின்றது", _VIRAMA),
    # past ந்த் family
    ("ந்தான்", _VIRAMA),        # ந்தான்
    ("ந்தாள்", _VIRAMA),        # ந்தாள்
    ("ந்தார்", _VIRAMA),        # ந்தார்
    ("ந்தது", _VIRAMA),              # ந்தது
    ("ந்தேன்", _VIRAMA),        # ந்தேன்
    # future வ் family
    ("வான்", _VIRAMA),                    # வான்
    ("வாள்", _VIRAMA),                    # வாள்
    ("வார்", _VIRAMA),                    # வார்
    ("வேன்", _VIRAMA),                    # வேன்
    ("பான்", _VIRAMA),                    # பான்
    ("பாள்", _VIRAMA),                    # பாள்
    ("பார்", _VIRAMA),                    # பார்
    # past-participle / infinitive tails
    ("ிய", ""),                                     # ிய
    ("்று", _VIRAMA),                          # ்று
    ("ட்டு", _VIRAMA),                    # ட்டு
    ("ன்று", _VIRAMA),                    # ன்று
], key=lambda t: len(t[0]), reverse=True)


def stem(word: str) -> str:
    w = word
    if len(w) <= _MIN:
        return w

    w, _ = _replace(w, _QUESTION)
    if len(w) > _MIN:
        w, _ = _replace(w, _UM)
    if len(w) > _MIN:
        w, _ = _replace(w, _COMMON)
    if len(w) > _MIN:
        w, _ = _replace(w, _PLURAL)
    if len(w) > _MIN:
        w, _ = _replace(w, _CASE)
    # tense endings strip repeatedly (agglutinated chains)
    while len(w) > _MIN:
        w, changed = _replace(w, _TENSE)
        if not changed:
            break
    return w
