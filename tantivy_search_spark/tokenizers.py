"""Analyzer chains reproducing the reference's tokenizer semantics.

Behavioral spec (not a port) from
/root/reference/src/tokenizer/parser.rs:107-255 and
/root/reference/src/tokenizer/ingredient/tokenizer.rs:9-107:

* ``default``    : Simple split -> RemoveLong(40) -> LowerCaser
* ``raw``        : whole string = one token, no filters
* ``simple``     : Simple split -> RemoveLong(length_limit) -> StopWords
                   -> [LowerCaser unless case_sensitive]
* ``stem``       : simple + Snowball-style stemmer between stopwords and
                   lowercase
* ``whitespace`` : split on \\s+ -> RemoveLong -> StopWords -> [LowerCaser]
* ``ngram``      : char n-grams (min_gram..max_gram, optionally prefix
                   only) -> RemoveLong -> StopWords -> [LowerCaser]

Ordering subtleties preserved: stopword filtering happens BEFORE
lowercasing (case-sensitive match against the raw token), and
RemoveLongFilter drops tokens whose UTF-8 byte length >= limit.

Everything here is pure Python operating on lists/numpy so it can run
inside Arrow-vectorized pandas UDFs (no per-row Python at the Spark
layer; see udfs.py).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from functools import lru_cache

# Rust `char::is_alphanumeric` = Unicode Alphabetic | Nd | Nl | No.
# Python `\w` = word chars incl. underscore; `[^\W_]` excludes it.
_SIMPLE_SPLIT = re.compile(r"[^\W_]+", re.UNICODE)
_WHITESPACE_SPLIT = re.compile(r"\S+", re.UNICODE)

# Lucene/Tantivy English stop-word list (33 words) — the list used by
# tantivy's StopWordFilter for Language::English.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

#: languages the reference accepts for stop_word_filters
#: (/root/reference/src/tokenizer/languages.rs:7-21)
STOP_WORD_LANGUAGES = frozenset(
    """danish dutch english finnish french german hungarian italian
    norwegian portuguese russian spanish swedish""".split()
)

#: languages the reference accepts for stem_languages
STEM_LANGUAGES = frozenset(
    """arabic danish dutch english finnish french german greek hungarian
    italian norwegian portuguese romanian russian spanish swedish tamil
    turkish""".split()
)

_STOP_WORD_SETS: dict[str, frozenset[str]] = {"english": ENGLISH_STOP_WORDS}


class TokenizerError(ValueError):
    """Invalid tokenizer configuration."""


def _utf8_len(tok: str) -> int:
    return len(tok.encode("utf-8", errors="surrogatepass"))


def _remove_long(tokens: list[str], limit: int) -> list[str]:
    # tantivy RemoveLongFilter keeps tokens with utf8 byte length < limit
    return [t for t in tokens if _utf8_len(t) < limit]


def _stop_words(tokens: list[str], stop: frozenset[str]) -> list[str]:
    if not stop:
        return tokens
    return [t for t in tokens if t not in stop]


def _porter_stem(word: str) -> str:
    """Compact Porter stemmer (English).

    Approximates tantivy's Snowball English stemmer; exact agreement is
    not required by BASELINE.json (which mandates only the simple + raw
    chains) — this keeps the ``stem`` chain functional and deterministic.
    """
    if len(word) <= 2:
        return word

    vowels = "aeiou"

    def cons(w: str, i: int) -> bool:
        c = w[i]
        if c in vowels:
            return False
        if c == "y":
            return i == 0 or not cons(w, i - 1)
        return True

    def measure(w: str) -> int:
        m, i, n = 0, 0, len(w)
        while i < n and cons(w, i):
            i += 1
        while i < n:
            while i < n and not cons(w, i):
                i += 1
            if i >= n:
                break
            m += 1
            while i < n and cons(w, i):
                i += 1
        return m

    def has_vowel(w: str) -> bool:
        return any(not cons(w, i) for i in range(len(w)))

    def ends_double_cons(w: str) -> bool:
        return len(w) >= 2 and w[-1] == w[-2] and cons(w, len(w) - 1)

    def cvc(w: str) -> bool:
        if len(w) < 3:
            return False
        return (
            cons(w, len(w) - 3)
            and not cons(w, len(w) - 2)
            and cons(w, len(w) - 1)
            and w[-1] not in "wxy"
        )

    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif measure(w) == 1 and cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    pairs2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ]
    for suf, rep in pairs2:
        if w.endswith(suf):
            if measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    pairs3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in pairs3:
        if w.endswith(suf):
            if measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    sufs4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in sorted(sufs4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and measure(w[:-3]) > 1 and w[:-3].endswith(("s", "t")):
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = measure(stem)
        if m > 1 or (m == 1 and not cvc(stem)):
            w = stem
    # step 5b
    if measure(w) > 1 and ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def _resolve_stop_set(stop_word_filters: Sequence[str]) -> frozenset[str]:
    out: set[str] = set()
    for lang in stop_word_filters:
        key = lang.lower()
        if key not in STOP_WORD_LANGUAGES:
            raise TokenizerError(f"Unknown stop-word filter language: {lang}")
        words = _STOP_WORD_SETS.get(key)
        if words is None:
            raise NotImplementedError(
                f"stop-word list for '{key}' not bundled (english is); "
                "pass an explicit word list via stop_words_extra"
            )
        out |= words
    return frozenset(out)


@lru_cache(maxsize=256)
def build_analyzer(
    type: str = "default",
    *,
    stop_word_filters: tuple[str, ...] = (),
    stem_languages: tuple[str, ...] = (),
    length_limit: int = 40,
    case_sensitive: bool = False,
    min_gram: int = 2,
    max_gram: int = 3,
    prefix_only: bool = False,
) -> Callable[[str], list[str]]:
    """Return ``analyze(text) -> [token, ...]`` for one column config."""
    if type in ("chinese", "icu"):
        raise NotImplementedError(
            f"'{type}' tokenizer requires jieba/PyICU, out of scope for the "
            "source-code corpus (documented in SURVEY.md §2.2)"
        )
    if type not in ("default", "raw", "simple", "stem", "whitespace", "ngram"):
        raise TokenizerError(f"Unknown tokenizer type: {type}")
    if type == "ngram":
        if min_gram >= max_gram:
            # reference: parser.rs:166-196 rejects min >= max
            raise TokenizerError("ngram: min_gram must be < max_gram")
        if min_gram == 0:
            raise TokenizerError("ngram: min_gram must be > 0")

    if type == "raw":
        def analyze_raw(text: str) -> list[str]:
            return [text] if text else []
        return analyze_raw

    if type == "default":
        def analyze_default(text: str) -> list[str]:
            toks = _SIMPLE_SPLIT.findall(text)
            toks = _remove_long(toks, 40)
            return [t.lower() for t in toks]
        return analyze_default

    stop = _resolve_stop_set(stop_word_filters)
    stemmers = []
    for lang in stem_languages:
        key = lang.lower()
        if key not in STEM_LANGUAGES:
            raise TokenizerError(f"Unknown stem language: {lang}")
        if key != "english":
            raise NotImplementedError(f"stemmer for '{key}' not bundled")
        stemmers.append(_porter_stem)

    if type == "whitespace":
        splitter = _WHITESPACE_SPLIT
    else:
        splitter = _SIMPLE_SPLIT

    def analyze(text: str) -> list[str]:
        if type == "ngram":
            toks = []
            n = len(text)
            starts = (0,) if prefix_only else range(n)
            for i in starts:
                for g in range(min_gram, max_gram + 1):
                    if i + g <= n:
                        toks.append(text[i : i + g])
        else:
            toks = splitter.findall(text)
        toks = _remove_long(toks, length_limit)
        toks = _stop_words(toks, stop)  # BEFORE lowercasing, like the reference
        for stem in stemmers:
            toks = [stem(t) for t in toks]
        if not case_sensitive:
            toks = [t.lower() for t in toks]
        return toks

    return analyze


def analyzer_from_config(cfg: dict) -> Callable[[str], list[str]]:
    """Build an analyzer from one column's JSON tokenizer config dict."""
    t = dict(cfg.get("tokenizer", {"type": "default"}))
    return build_analyzer(
        t.get("type", "default"),
        stop_word_filters=tuple(t.get("stop_word_filters", ())),
        stem_languages=tuple(t.get("stem_languages", ())),
        length_limit=int(t.get("length_limit", 40)),
        case_sensitive=bool(t.get("case_sensitive", False)),
        min_gram=int(t.get("min_gram", 2)),
        max_gram=int(t.get("max_gram", 3)),
        prefix_only=bool(t.get("prefix_only", False)),
    )
