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

from tantivy_search_spark.stopwords import BY_LANGUAGE as _STOP_WORD_SETS
from tantivy_search_spark.stopwords import ENGLISH as ENGLISH_STOP_WORDS

#: languages the reference accepts for stop_word_filters
#: (/root/reference/src/tokenizer/languages.rs:7-21); all 13 lists are
#: bundled in stopwords.py
STOP_WORD_LANGUAGES = frozenset(_STOP_WORD_SETS)

#: languages the reference accepts for stem_languages
STEM_LANGUAGES = frozenset(
    """arabic danish dutch english finnish french german greek hungarian
    italian norwegian portuguese romanian russian spanish swedish tamil
    turkish""".split()
)


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


def _resolve_stop_set(stop_word_filters: Sequence[str]) -> frozenset[str]:
    out: set[str] = set()
    for lang in stop_word_filters:
        key = lang.lower()
        if key not in STOP_WORD_LANGUAGES:
            raise TokenizerError(f"Unknown stop-word filter language: {lang}")
        out |= _STOP_WORD_SETS[key]
    return frozenset(out)


#: rust char::is_alphanumeric analog used by the reference's
#: remove_nonsense_token post-filter (utils.rs:1-15)
_ALNUM_RUNS = re.compile(r"[^\W_]+", re.UNICODE)
#: empty-dictionary jieba grouping: ASCII alnum runs stay whole, every
#: other char stands alone (no multi-char dictionary words exist)
_ASCII_RUN_OR_CHAR = re.compile(r"[0-9A-Za-z]+|.", re.DOTALL)


def _cangjie_analyzer(jieba: str, mode: str, hmm: bool,
                      case_sensitive: bool) -> Callable[[str], list[str]]:
    """Reference `chinese` chain (CangjieTokenizer + nonsense strip +
    LowerCaser; parser.rs:197-227, cangjie/tokenizer.rs:29-48).

    Implemented without the jieba crate for the configurations that
    don't need its data files:
    * mode=unicode — per-character split (exact reference semantics,
      no dictionary involved).
    * jieba=empty + default/all/search, hmm=False — with an empty
      dictionary every CJK char is its own word and ASCII alnum runs
      group, which is what Jieba::empty() produces.
    jieba=default (the bundled dictionary) and hmm=True (the HMM model)
    raise NotImplementedError at config creation — capability gap.
    """
    if jieba == "default":
        raise NotImplementedError(
            "chinese tokenizer with jieba='default' needs the jieba "
            "dictionary, which is not available in this environment; "
            "use jieba='empty' or mode='unicode' (COVERAGE.md)")
    if hmm and mode in ("default", "search"):
        raise NotImplementedError(
            "chinese tokenizer with hmm=true needs the jieba HMM model; "
            "set hmm=false (COVERAGE.md)")

    def analyze(text: str) -> list[str]:
        if mode == "unicode":
            raw = list(text)
        else:  # default / all / search over the empty dictionary
            raw = _ASCII_RUN_OR_CHAR.findall(text)
        out: list[str] = []
        for t in raw:  # remove_nonsense_token: keep alnum runs only
            out.extend(_ALNUM_RUNS.findall(t))
        if not case_sensitive:
            out = [t.lower() for t in out]
        return out

    return analyze


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
    jieba: str = "default",
    mode: str = "search",
    hmm: bool = False,
) -> Callable[[str], list[str]]:
    """Return ``analyze(text) -> [token, ...]`` for one column config."""
    if type == "chinese":
        return _cangjie_analyzer(jieba, mode, hmm, case_sensitive)
    if type == "icu":
        raise NotImplementedError(
            "'icu' tokenizer requires PyICU (not in this environment); "
            "capability gap recorded in COVERAGE.md"
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
        from tantivy_search_spark.stemmers import get_stemmer
        stemmers.append(get_stemmer(key))  # raises clearly if unbundled

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
        jieba=str(t.get("jieba", "default")),
        mode=str(t.get("mode", "search")),
        hmm=bool(t.get("hmm", False)),
    )
