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


#: jieba's default block regex: runs of han / latin / digits /
#: word-joining punctuation segment through the DAG; everything else
#: passes through per char (and is then nonsense-stripped)
_JIEBA_HAN_BLOCK = re.compile(r"[一-鿕a-zA-Z0-9+#&._%\-]+")
_JIEBA_ENG = re.compile(r"[a-zA-Z0-9]")

#: finalseg (HMM) block split: pure-han runs go through Viterbi,
#: everything else through the skip regex — jieba's finalseg.cut
_JIEBA_FINALSEG_HAN = re.compile(r"([一-鿕]+)")
_JIEBA_FINALSEG_SKIP = re.compile(r"(\d+\.\d+|[a-zA-Z0-9]+)")

_HMM_MIN_FLOAT = -3.14e100
_HMM_STATES = "BMES"
#: Viterbi predecessor sets for the BEMS word-position states
_HMM_PREV = {"B": ("E", "S"), "M": ("M", "B"),
             "S": ("S", "E"), "E": ("B", "M")}
#: jieba's published start/transition log-probs (MIT-licensed constants
#: from the jieba project's finalseg; the algorithm's 14 scalars, not
#: its trained per-character emission tables)
_HMM_START = {"B": -0.26268660809250016, "E": _HMM_MIN_FLOAT,
              "M": _HMM_MIN_FLOAT, "S": -1.4652633398537678}
_HMM_TRANS = {
    "B": {"E": -0.510825623765990, "M": -0.916290731874155},
    "E": {"B": -0.5897149736854513, "S": -0.8085250474669937},
    "M": {"E": -0.33344856811948514, "M": -1.2603623820268226},
    "S": {"B": -0.7211965654669841, "S": -0.6658631448798212},
}


class _JiebaHmm:
    """finalseg's character-position HMM (states B/M/E/S, Viterbi
    decode) — the public jieba unknown-word model with the trained
    per-character emission tables injected from a JSON file:
    ``{"emit": {"B": {char: logp, ...}, ...}, "start": {...}?,
    "trans": {...}?}``.  start/trans default to jieba's published
    constants; the emission tables are model DATA this environment
    does not ship, which is why ``hmm=true`` requires an
    ``hmm_model`` path (cangjie/tokenizer.rs:29-48 hmm semantics)."""

    def __init__(self, path: str):
        import json as _json

        with open(path, encoding="utf-8") as f:
            d = _json.load(f)
        self.emit: dict[str, dict[str, float]] = {
            s: dict(d.get("emit", {}).get(s, {})) for s in _HMM_STATES}
        self.start = {**_HMM_START, **d.get("start", {})}
        self.trans = {s: {**_HMM_TRANS.get(s, {}), **d.get("trans", {}).get(s, {})}
                      for s in _HMM_STATES}

    def _viterbi(self, obs: str) -> list[str]:
        V: list[dict[str, float]] = [{}]
        path: dict[str, list[str]] = {}
        for y in _HMM_STATES:
            V[0][y] = self.start[y] + self.emit[y].get(obs[0],
                                                       _HMM_MIN_FLOAT)
            path[y] = [y]
        for t in range(1, len(obs)):
            V.append({})
            newpath: dict[str, list[str]] = {}
            for y in _HMM_STATES:
                em = self.emit[y].get(obs[t], _HMM_MIN_FLOAT)
                prob, state = max(
                    (V[t - 1][y0] + self.trans[y0].get(y, _HMM_MIN_FLOAT)
                     + em, y0) for y0 in _HMM_PREV[y])
                V[t][y] = prob
                newpath[y] = path[state] + [y]
            path = newpath
        _, state = max((V[-1][y], y) for y in "ES")
        return path[state]

    def _cut_han(self, s: str) -> list[str]:
        pos = self._viterbi(s)
        out: list[str] = []
        begin = nexti = 0
        for i, ch in enumerate(s):
            if pos[i] == "B":
                begin = i
            elif pos[i] == "E":
                out.append(s[begin:i + 1])
                nexti = i + 1
            elif pos[i] == "S":
                out.append(ch)
                nexti = i + 1
        if nexti < len(s):
            out.append(s[nexti:])
        return out

    def cut(self, s: str) -> list[str]:
        """finalseg.cut: han runs -> Viterbi, other runs -> skip split."""
        out: list[str] = []
        for blk in _JIEBA_FINALSEG_HAN.split(s):
            if not blk:
                continue
            if _JIEBA_FINALSEG_HAN.fullmatch(blk):
                out.extend(self._cut_han(blk))
            else:
                out.extend(x for x in _JIEBA_FINALSEG_SKIP.split(blk) if x)
        return out


_JIEBA_HMM_CACHE: dict[str, _JiebaHmm] = {}


class _JiebaDict:
    """Dictionary-mode segmentation — the public jieba algorithm
    (prefix dictionary -> DAG -> max-log-prob route), matching
    jieba_rs::Jieba::{cut, cut_all, cut_for_search} with hmm=false over
    a user-supplied dictionary file (`word freq [tag]` per line, the
    standard jieba dict format).  The jieba project's own bundled
    dict.txt is data this environment does not ship — point ``jieba``
    at any dictionary file to enable these modes
    (cangjie/tokenizer.rs:29-48 semantics)."""

    def __init__(self, path: str):
        import math

        self.freq: dict[str, int] = {}
        total = 0
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split()
                if not parts:
                    continue
                w = parts[0]
                fr = (int(parts[1]) if len(parts) > 1
                      and parts[1].isdigit() else 1)
                self.freq[w] = self.freq.get(w, 0) + fr
                total += fr
                for i in range(1, len(w)):
                    self.freq.setdefault(w[:i], 0)
        self.total = max(total, 1)
        self._logtotal = math.log(self.total)

    @classmethod
    def empty(cls) -> "_JiebaDict":
        """Jieba::empty(): no words — every han char routes single, so
        with hmm the whole block buffers into the HMM (jieba-rs
        Jieba::empty() + hmm=true semantics)."""
        self = cls.__new__(cls)
        self.freq = {}
        self.total = 1
        self._logtotal = 0.0
        return self

    def _dag(self, s: str) -> dict[int, list[int]]:
        dag: dict[int, list[int]] = {}
        n = len(s)
        for k in range(n):
            ends = []
            i = k
            frag = s[k]
            while i < n and frag in self.freq:
                if self.freq[frag]:
                    ends.append(i)
                i += 1
                frag = s[k:i + 1]
            if not ends:
                ends.append(k)
            dag[k] = ends
        return dag

    def _route(self, s: str, dag: dict[int, list[int]]) -> list[int]:
        import math

        n = len(s)
        route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
        for i in range(n - 1, -1, -1):
            route[i] = max(
                (math.log(self.freq.get(s[i:j + 1]) or 1)
                 - self._logtotal + route[j + 1][0], j)
                for j in dag[i])
        return [route[i][1] for i in range(n)]

    def _cut_block(self, s: str) -> list[str]:
        """__cut_DAG_NO_HMM: best route; consecutive single alnum chars
        buffer into one token (english runs survive a CJK dict)."""
        route = self._route(s, self._dag(s))
        out: list[str] = []
        i = 0
        buf = ""
        while i < len(s):
            j = route[i] + 1
            word = s[i:j]
            if len(word) == 1 and _JIEBA_ENG.match(word):
                buf += word
            else:
                if buf:
                    out.append(buf)
                    buf = ""
                out.append(word)
            i = j
        if buf:
            out.append(buf)
        return out

    def _cut_block_hmm(self, s: str, hm: "_JiebaHmm") -> list[str]:
        """__cut_DAG (hmm=true): best route; runs of single-char route
        words buffer and, when not a dictionary word themselves, go
        through the finalseg HMM for unknown-word discovery."""
        route = self._route(s, self._dag(s))
        out: list[str] = []
        i = 0
        buf = ""

        def flush(buf: str) -> None:
            if len(buf) == 1:
                out.append(buf)
            elif not self.freq.get(buf):
                out.extend(hm.cut(buf))
            else:
                out.extend(buf)

        while i < len(s):
            j = route[i] + 1
            word = s[i:j]
            if j - i == 1:
                buf += word
            else:
                if buf:
                    flush(buf)
                    buf = ""
                out.append(word)
            i = j
        if buf:
            flush(buf)
        return out

    def _cut_all_block(self, s: str) -> list[str]:
        dag = self._dag(s)
        out: list[str] = []
        old_j = -1
        for k in range(len(s)):
            ends = dag[k]
            if len(ends) == 1 and k > old_j:
                out.append(s[k:ends[0] + 1])
                old_j = ends[0]
            else:
                for j in ends:
                    if j > k:
                        out.append(s[k:j + 1])
                        old_j = j
        return out

    def _cut_for_search_block(self, s: str,
                              hm: "_JiebaHmm | None" = None) -> list[str]:
        out: list[str] = []
        base = (self._cut_block_hmm(s, hm) if hm is not None
                else self._cut_block(s))
        for w in base:
            for gram in (2, 3):
                if len(w) > gram:
                    for i in range(len(w) - gram + 1):
                        g = w[i:i + gram]
                        if self.freq.get(g):
                            out.append(g)
            out.append(w)
        return out

    def tokenize(self, text: str, mode: str,
                 hm: "_JiebaHmm | None" = None) -> list[str]:
        if mode == "all":  # cut_all has no HMM stage (jieba semantics)
            cut = self._cut_all_block
        elif mode == "search":
            cut = (lambda s: self._cut_for_search_block(s, hm))
        elif hm is not None:
            cut = (lambda s: self._cut_block_hmm(s, hm))
        else:
            cut = self._cut_block
        out: list[str] = []
        pos = 0
        for m in _JIEBA_HAN_BLOCK.finditer(text):
            out.extend(text[pos:m.start()])  # per-char passthrough
            out.extend(cut(m.group(0)))
            pos = m.end()
        out.extend(text[pos:])
        return out


_JIEBA_DICT_CACHE: dict[str, _JiebaDict] = {}


def _cangjie_analyzer(jieba: str, mode: str, hmm: bool,
                      case_sensitive: bool,
                      hmm_model: str = "") -> Callable[[str], list[str]]:
    """Reference `chinese` chain (CangjieTokenizer + nonsense strip +
    LowerCaser; parser.rs:197-227, cangjie/tokenizer.rs:29-48).

    Configurations:
    * mode=unicode — per-character split (exact reference semantics,
      no dictionary involved).
    * jieba=empty + default/all/search, hmm=False — with an empty
      dictionary every CJK char is its own word and ASCII alnum runs
      group, which is what Jieba::empty() produces.
    * jieba=<path to a jieba-format dictionary file> — real dictionary
      DAG segmentation for default/all/search (hmm=False), via
      :class:`_JiebaDict`.
    * hmm=True + hmm_model=<path to a JSON emission-table file> —
      unknown-word discovery via the finalseg BEMS Viterbi
      (:class:`_JiebaHmm`) inside __cut_DAG, for default/search modes.
    jieba=default (jieba's own bundled dict.txt, absent here) and
    hmm=True without hmm_model (the trained emission tables, likewise
    data) raise NotImplementedError at config creation — capability
    gap recorded in COVERAGE.md; the algorithms themselves are
    implemented and take any user-supplied dictionary/model files.
    """
    if jieba == "default":
        raise NotImplementedError(
            "chinese tokenizer with jieba='default' needs jieba's "
            "bundled dict.txt, which is not available in this "
            "environment; pass jieba='<path to a jieba-format "
            "dictionary file>' for dictionary mode, or use "
            "jieba='empty' / mode='unicode' (COVERAGE.md)")
    hm: _JiebaHmm | None = None
    if hmm and mode in ("default", "search"):
        if not hmm_model:
            raise NotImplementedError(
                "chinese tokenizer with hmm=true needs jieba's trained "
                "HMM emission tables; pass hmm_model='<path to a JSON "
                "model file>' (the Viterbi machinery is implemented; "
                "only the model data is absent — COVERAGE.md), or set "
                "hmm=false")
        if hmm_model not in _JIEBA_HMM_CACHE:
            _JIEBA_HMM_CACHE[hmm_model] = _JiebaHmm(hmm_model)
        hm = _JIEBA_HMM_CACHE[hmm_model]
    jdict: _JiebaDict | None = None
    if jieba != "empty":
        if jieba not in _JIEBA_DICT_CACHE:
            _JIEBA_DICT_CACHE[jieba] = _JiebaDict(jieba)
        jdict = _JIEBA_DICT_CACHE[jieba]
    elif hm is not None and mode != "unicode":
        # Jieba::empty() + hmm: the DAG machinery must run so single
        # chars buffer into the HMM
        jdict = _JiebaDict.empty()

    def analyze(text: str) -> list[str]:
        if mode == "unicode":
            raw = list(text)
        elif jdict is not None:
            raw = jdict.tokenize(text, mode, hm)
        else:  # default / all / search over the empty dictionary
            raw = _ASCII_RUN_OR_CHAR.findall(text)
        out: list[str] = []
        for t in raw:  # remove_nonsense_token: keep alnum runs only
            out.extend(_ALNUM_RUNS.findall(t))
        if not case_sensitive:
            out = [t.lower() for t in out]
        return out

    return analyze


def _is_han(c: str) -> bool:
    o = ord(c)
    return (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2FA1F)


def _is_hiragana(c: str) -> bool:
    return 0x3040 <= ord(c) <= 0x309F


def _is_katakana(c: str) -> bool:
    o = ord(c)
    return 0x30A0 <= o <= 0x30FF or 0xFF66 <= o <= 0xFF9D


def _is_word_char(c: str) -> bool:
    import unicodedata
    k = unicodedata.category(c)
    return k[0] in ("L", "N") or k[0] == "M"


def _icu_words(text: str, jdict: "_JiebaDict | None" = None) -> list[str]:
    """UAX#29-approximate word segmentation (the `word` mode of the
    reference's IcuTokenizer, icu/tokenizer.rs:31-58).

    Matches ICU for alphabetic scripts (runs of letters/digits/marks
    with MidLetter '/’ and MidNum ./, kept inside a run), keeps
    katakana runs together, and emits one token per Han/hiragana
    character.  DOCUMENTED APPROXIMATION: real ICU segments Chinese
    and Japanese with a bundled dictionary/LSTM model ("在地" stays one
    word there); without that data every ideograph is its own token —
    exactly UAX#29's default behavior.  Pass ``jdict`` (a frequency
    dictionary) to run Han/hiragana runs through the same
    best-path-by-log-frequency route ICU's CjkBreakEngine uses —
    enabled via the ``cjk_dict`` config key."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if _is_han(c) or _is_hiragana(c):
            if jdict is not None:
                j = i + 1
                while j < n and (_is_han(text[j])
                                 or _is_hiragana(text[j])):
                    j += 1
                out.extend(jdict._cut_block(text[i:j]))
                i = j
            else:
                out.append(c)
                i += 1
            continue
        if _is_katakana(c):
            j = i + 1
            while j < n and _is_katakana(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if _is_word_char(c):
            j = i + 1
            while j < n:
                cj = text[j]
                if (_is_han(cj) or _is_hiragana(cj)
                        or _is_katakana(cj)):
                    break
                if _is_word_char(cj):
                    j += 1
                    continue
                # MidLetter / MidNum: a single ' ’ . , between two
                # word characters does not break the run
                if cj in "'’.," and j + 1 < n \
                        and _is_word_char(text[j + 1]) \
                        and not (_is_han(text[j + 1])
                                 or _is_hiragana(text[j + 1])
                                 or _is_katakana(text[j + 1])):
                    j += 2
                    continue
                break
            out.append(text[i:j])
            i = j
            continue
        i += 1  # spaces/punctuation form no word token
    return out


def _icu_graphemes(text: str) -> list[str]:
    """Approximate extended grapheme clusters: base char plus combining
    marks/ZWJ continuations, CRLF as one cluster."""
    import unicodedata
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        j = i + 1
        if text[i] == "\r" and j < n and text[j] == "\n":
            j += 1
        else:
            while j < n and (unicodedata.category(text[j])[0] == "M"
                             or text[j] == "‍"
                             or (j >= 1 and text[j - 1] == "‍")):
                j += 1
        out.append(text[i:j])
        i = j
    return out


#: sentence terminators: UAX#29 STerm plus the ATerm full stops
_STERM = set("!?‼⁇⁈⁉。！？｡…")
_CLOSERS = set("\"'’”』」)]}»›")


#: English sentence-break suppressions - abbreviations after which a
#: '.' is not a sentence terminator.  Transcribed from the published
#: CLDR segmentation suppressions for English (common/segments/en.xml,
#: Unicode CLDR, public data), reduced to the everyday members; the
#: full CLDR list also carries rarer honorifics and month forms.
#: Matching is case-sensitive, like CLDR's exact-string suppressions.
_EN_SENTENCE_SUPPRESSIONS = frozenset({
    "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "Rev.", "Hon.", "Gov.",
    "Gen.", "Capt.", "Col.", "Maj.", "Lt.", "Sgt.", "St.", "Jr.",
    "Sr.", "Messrs.", "Mmes.", "Bros.", "Co.", "Corp.", "Inc.",
    "Ltd.", "LLC.", "Ave.", "Blvd.", "Rd.", "Mt.", "Ft.", "vs.",
    "etc.", "approx.", "appt.", "apt.", "dept.", "est.", "min.",
    "max.", "misc.", "No.", "Nos.", "Ph.D.", "M.D.", "B.A.", "M.A.",
    "B.S.", "M.S.", "U.S.", "U.K.", "U.N.", "D.C.", "a.m.", "p.m.",
    "A.M.", "P.M.", "i.e.", "e.g.", "cf.", "al.", "Jan.", "Feb.",
    "Mar.", "Apr.", "Jun.", "Jul.", "Aug.", "Sep.", "Sept.", "Oct.",
    "Nov.", "Dec.", "Mon.", "Tue.", "Tues.", "Wed.", "Thu.", "Thur.",
    "Thurs.", "Fri.", "Sat.", "Sun.", "Fig.", "fig.", "Vol.", "vol.",
    "Ch.", "ch.", "pp.", "ed.", "eds.", "Univ.", "Assn.", "Est.",
})

_SUPPRESSION_LISTS = {"": frozenset(), "en": _EN_SENTENCE_SUPPRESSIONS,
                      "english": _EN_SENTENCE_SUPPRESSIONS}


def _icu_sentences(text: str,
                   suppressions: frozenset = frozenset()) -> list[str]:
    """UAX#29-approximate sentence segmentation (the `sentence` mode of
    the reference's IcuTokenizer, icu/tokenizer.rs:42-45).  Matches
    ICU's SentenceSegmenter on the common rules: a sentence ends after a
    terminator (STerm, or '.' as ATerm) plus any closing quotes/brackets
    and the following spaces (trailing spaces belong to the PRECEDING
    segment, as in ICU); paragraph separators are mandatory breaks.
    DOCUMENTED APPROXIMATION: the suppression rules are the big ones
    only — '.' does not break before a lowercase continuation (SB8) or
    inside a number like 3.4 (SB6/7).  ``suppressions`` (opt-in via
    the tokenizer's ``suppressions`` field) adds CLDR-style locale
    abbreviation handling: a '.' ending a listed abbreviation never
    breaks.  OFF by default because the reference's icu4x
    ``SentenceSegmenter::new()`` runs root-locale rules without
    suppression data - default output mirrors the reference."""
    out: list[str] = []
    i, start, n = 0, 0, len(text)
    while i < n:
        c = text[i]
        if c in "\r\n  ":
            j = i + 1
            if c == "\r" and j < n and text[j] == "\n":
                j += 1
            out.append(text[start:j])
            start = i = j
            continue
        if c in _STERM or c == ".":
            j = i + 1
            while j < n and (text[j] in _STERM or text[j] == "."):
                j += 1
            while j < n and text[j] in _CLOSERS:
                j += 1
            k = j
            while k < n and text[k] in " \t":
                k += 1
            if c == "." and j == i + 1:
                nxt = text[j] if j < n else ""
                # SB6/7: 3.4 stays one sentence; SB8: ". word" with a
                # lowercase continuation does not break
                if nxt and k == j and (nxt.isdigit() or nxt.isalpha()):
                    i = j
                    continue
                if k < n and text[k].islower():
                    i = k
                    continue
                if suppressions:
                    # trailing word incl. the dot ("Mr.", "Ph.D.")
                    w = i
                    while w > start and (text[w - 1].isalpha()
                                         or text[w - 1] == '.'):
                        w -= 1
                    if text[w:i + 1] in suppressions:
                        i = j
                        continue
            out.append(text[start:k])
            start = i = k
            continue
        i += 1
    if start < n:
        out.append(text[start:n])
    return out


def _icu_lines(text: str) -> list[str]:
    """UAX#14-approximate line-break segmentation (the `line` mode of
    the reference's IcuTokenizer, icu/tokenizer.rs:39-41): break
    opportunities after a whitespace run (spaces attach to the
    preceding segment), after an intra-word hyphen, around CJK
    ideographs and kana (each its own opportunity), mandatory at
    newlines.  DOCUMENTED APPROXIMATION: ICU's non-starter kana rules
    (small forms, prolonged-sound marks) and the auto (dictionary/LSTM)
    refinements are absent."""
    out: list[str] = []
    i, start, n = 0, 0, len(text)

    def flush(upto: int) -> None:
        nonlocal start
        if start < upto:
            out.append(text[start:upto])
        start = upto

    while i < n:
        c = text[i]
        if c in "\r\n  ":
            j = i + 1
            if c == "\r" and j < n and text[j] == "\n":
                j += 1
            out.append(text[start:j])
            start = i = j
            continue
        if c in " \t":
            j = i
            while j < n and text[j] in " \t":
                j += 1
            if j < n:
                flush(j)
            i = j
            continue
        if c == "-" and i + 1 < n and text[i + 1].isalnum():
            flush(i + 1)
            i += 1
            continue
        if _is_han(c) or _is_hiragana(c) or _is_katakana(c):
            flush(i)
            flush(i + 1)
            i += 1
            continue
        i += 1
    if start < n:
        out.append(text[start:n])
    return out


_ICU_SEGMENTERS = {
    "word": _icu_words,
    "grapheme": _icu_graphemes,
    "sentence": _icu_sentences,
    "line": _icu_lines,
}


def _resolve_icu_segment(mode: str, cjk_dict: str,
                         suppressions: str = "") -> Callable[[str], list[str]]:
    """Word-mode segmenter, optionally dictionary-backed: ``cjk_dict``
    (a jieba-format frequency dictionary file) routes Han/hiragana
    runs through the CjkBreakEngine-style best path instead of
    per-char UAX#29 default.  ``suppressions`` names a locale
    abbreviation list for sentence mode ('english'/'en'; default none,
    mirroring the reference's root-locale SentenceSegmenter)."""
    if cjk_dict and mode == "word":
        if cjk_dict not in _JIEBA_DICT_CACHE:
            _JIEBA_DICT_CACHE[cjk_dict] = _JiebaDict(cjk_dict)
        jd = _JIEBA_DICT_CACHE[cjk_dict]
        return lambda t: _icu_words(t, jd)
    if mode == "sentence" and suppressions:
        key = str(suppressions).lower()
        if key not in _SUPPRESSION_LISTS:
            raise TokenizerError(
                f"icu: unknown suppressions list: {suppressions!r} "
                f"(supported: english)")
        sup = _SUPPRESSION_LISTS[key]
        return lambda t: _icu_sentences(t, sup)
    return _ICU_SEGMENTERS[mode]


def _icu_analyzer(mode: str, stop_word_filters, stem_languages,
                  case_sensitive: bool,
                  cjk_dict: str = "",
                  suppressions: str = "") -> Callable[[str], list[str]]:
    """Reference `icu` chain (parser.rs icu arm: IcuTokenizer +
    stop-word filters + stemmers + LowerCaser), with every segmenter
    mode approximated in pure Python (no PyICU in this environment; the
    approximation is documented per mode and in COVERAGE.md)."""
    segment = _resolve_icu_segment(mode, cjk_dict, suppressions)
    stop = _resolve_stop_set(stop_word_filters)
    stemmers = []
    for lang in stem_languages:
        key = lang.lower()
        if key not in STEM_LANGUAGES:
            raise TokenizerError(f"Unknown stem language: {lang}")
        from tantivy_search_spark.stemmers import get_stemmer
        stemmers.append(get_stemmer(key))

    def analyze(text: str) -> list[str]:
        import unicodedata
        toks = [t for t in segment(text)
                if any(unicodedata.category(c)[0] in ("L", "N")
                       for c in t)]  # remove_nonsense_token
        toks = _stop_words(toks, stop)  # BEFORE lowercasing
        for stem in stemmers:
            toks = [stem(t) for t in toks]
        if not case_sensitive:
            toks = [t.lower() for t in toks]
        return toks

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
    hmm_model: str = "",
    cjk_dict: str = "",
    suppressions: str = "",
) -> Callable[[str], list[str]]:
    """Return ``analyze(text) -> [token, ...]`` for one column config."""
    if type == "chinese":
        return _cangjie_analyzer(jieba, mode, hmm, case_sensitive,
                                 hmm_model)
    if type == "icu":
        return _icu_analyzer(mode, stop_word_filters, stem_languages,
                             case_sensitive, cjk_dict, suppressions)
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
        mode=str(t.get("mode",
                       "word" if t.get("type") == "icu" else "search")),
        hmm=bool(t.get("hmm", False)),
        hmm_model=str(t.get("hmm_model", "")),
        cjk_dict=str(t.get("cjk_dict", "")),
        suppressions=str(t.get("suppressions", "")),
    )


@lru_cache(maxsize=256)
def build_analyzer_pos(
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
    hmm_model: str = "",
    cjk_dict: str = "",
    suppressions: str = "",
) -> Callable[[str], tuple[list[str], list[int]]]:
    """Position-annotated twin of :func:`build_analyzer`:
    ``analyze_pos(text) -> (tokens, positions)``.

    Positions follow tantivy's model: the BASE tokenizer assigns them at
    emission, and token-REMOVING filters (RemoveLongFilter,
    StopWordFilter) drop tokens without renumbering — removed slots
    leave gaps, so a phrase query cannot match across a removed
    stopword.  Chains whose reference tokenizer strips tokens BEFORE
    position assignment stay consecutively numbered: cangjie and icu
    run remove_nonsense_token inside token_stream() and number the
    surviving tokens 0..n-1 (reference cangjie/stream.rs:33
    ``position: self.index``, icu/tokenizer.rs:56), so only icu's
    stop-word stage (a tantivy-level filter) leaves gaps.  tantivy's
    NgramTokenizer emits every ngram at position 0 (published tantivy
    docs — overlapping grams share the slot), so ``ngram`` returns all
    zeros.  The token list is always exactly ``build_analyzer``'s
    output for the same config (property-pinned in
    test_arrow_tokenize).
    """
    plain = build_analyzer(
        type,
        stop_word_filters=stop_word_filters,
        stem_languages=stem_languages,
        length_limit=length_limit,
        case_sensitive=case_sensitive,
        min_gram=min_gram,
        max_gram=max_gram,
        prefix_only=prefix_only,
        jieba=jieba,
        mode=mode,
        hmm=hmm,
        hmm_model=hmm_model,
        cjk_dict=cjk_dict,
    )

    if type == "chinese":
        # nonsense strip precedes position assignment in the reference
        def analyze_chinese_pos(text: str):
            toks = plain(text)
            return toks, list(range(len(toks)))
        return analyze_chinese_pos

    if type == "raw":
        def analyze_raw_pos(text: str):
            return ([text], [0]) if text else ([], [])
        return analyze_raw_pos

    if type == "ngram":
        def analyze_ngram_pos(text: str):
            toks = plain(text)
            return toks, [0] * len(toks)
        return analyze_ngram_pos

    if type == "icu":
        segment = _resolve_icu_segment(mode, cjk_dict, suppressions)
        stop = _resolve_stop_set(stop_word_filters)
        from tantivy_search_spark.stemmers import get_stemmer
        stemmers = [get_stemmer(lang.lower()) for lang in stem_languages]

        def analyze_icu_pos(text: str):
            import unicodedata
            toks = [t for t in segment(text)
                    if any(unicodedata.category(c)[0] in ("L", "N")
                           for c in t)]  # inside token_stream -> no gaps
            poss = list(range(len(toks)))
            if stop:  # tantivy-level filter -> gaps, BEFORE lowercasing
                kept = [(t, p) for t, p in zip(toks, poss)
                        if t not in stop]
                toks = [t for t, _ in kept]
                poss = [p for _, p in kept]
            for stem in stemmers:
                toks = [stem(t) for t in toks]
            if not case_sensitive:
                toks = [t.lower() for t in toks]
            return toks, poss
        return analyze_icu_pos

    if type == "default":
        def analyze_default_pos(text: str):
            raw = _SIMPLE_SPLIT.findall(text)
            kept = [(t.lower(), i) for i, t in enumerate(raw)
                    if _utf8_len(t) < 40]
            return [t for t, _ in kept], [i for _, i in kept]
        return analyze_default_pos

    # simple / stem / whitespace
    stop = _resolve_stop_set(stop_word_filters)
    stemmers = []
    for lang in stem_languages:
        from tantivy_search_spark.stemmers import get_stemmer
        stemmers.append(get_stemmer(lang.lower()))
    splitter = _WHITESPACE_SPLIT if type == "whitespace" else _SIMPLE_SPLIT

    def analyze_pos(text: str):
        raw = splitter.findall(text)
        kept = [(t, i) for i, t in enumerate(raw)
                if _utf8_len(t) < length_limit]
        if stop:
            kept = [(t, i) for t, i in kept if t not in stop]
        toks = [t for t, _ in kept]
        poss = [i for _, i in kept]
        for stem in stemmers:
            toks = [stem(t) for t in toks]
        if not case_sensitive:
            toks = [t.lower() for t in toks]
        return toks, poss

    return analyze_pos


def analyzer_pos_from_config(cfg: dict) -> Callable[
        [str], tuple[list[str], list[int]]]:
    """Position-annotated analyzer from one column's config dict."""
    t = dict(cfg.get("tokenizer", {"type": "default"}))
    return build_analyzer_pos(
        t.get("type", "default"),
        stop_word_filters=tuple(t.get("stop_word_filters", ())),
        stem_languages=tuple(t.get("stem_languages", ())),
        length_limit=int(t.get("length_limit", 40)),
        case_sensitive=bool(t.get("case_sensitive", False)),
        min_gram=int(t.get("min_gram", 2)),
        max_gram=int(t.get("max_gram", 3)),
        prefix_only=bool(t.get("prefix_only", False)),
        jieba=str(t.get("jieba", "default")),
        mode=str(t.get("mode",
                       "word" if t.get("type") == "icu" else "search")),
        hmm=bool(t.get("hmm", False)),
        hmm_model=str(t.get("hmm_model", "")),
        cjk_dict=str(t.get("cjk_dict", "")),
        suppressions=str(t.get("suppressions", "")),
    )
