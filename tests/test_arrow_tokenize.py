"""Property: the Arrow-kernel build path (udfs.term_doc_tf_arrow) is
exactly equivalent to tokenize_series + term_doc_tf (the reference-exact
Python chain) for every arrow-eligible tokenizer config — triples,
tf counts, and doclens all identical, over adversarial unicode."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from tantivy_search_spark.udfs import (
    arrow_fast_eligible,
    term_doc_tf,
    term_doc_tf_arrow,
    tokenize_series,
)

CONFIGS = [
    {"tokenizer": {"type": "default"}},
    {"tokenizer": {"type": "raw"}},
    {"tokenizer": {"type": "whitespace"}},
    {"tokenizer": {"type": "simple"}},
    {"tokenizer": {"type": "simple", "length_limit": 6,
                   "case_sensitive": True}},
    {"tokenizer": {"type": "simple", "stop_word_filters": ["english"],
                   "length_limit": 12}},
    {"tokenizer": {"type": "whitespace", "length_limit": 5}},
    {"tokenizer": {"type": "stem", "stem_languages": ["english"],
                   "stop_word_filters": ["english"]}},
    {"tokenizer": {"type": "stem", "stem_languages": ["german"],
                   "case_sensitive": True}},
]

# mixed-script alphabet incl. combining marks, CJK, astral plane, controls
_ALPHABET = st.sampled_from(list(
    "abcXYZ019_ .,;()\t\n\r-" + "éÜßñ" + "漢字한국語" + "𐍈💡" + "́ "
))
_DOC = st.text(alphabet=_ALPHABET, min_size=0, max_size=120)


def _triples(terms, docs, tfs):
    return sorted(zip(terms.tolist(), docs.tolist(), tfs.tolist()))


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: str(c["tokenizer"]))
@settings(max_examples=40, deadline=None)
@given(docs=st.lists(st.one_of(st.none(), _DOC), min_size=1, max_size=12))
def test_arrow_equals_python_chain(cfg, docs):
    assert arrow_fast_eligible(cfg)
    s = pd.Series(docs, dtype=object)
    ids = np.arange(len(docs), dtype=np.int64) * 3 + 7
    a = term_doc_tf_arrow(s, ids, cfg)
    b = term_doc_tf(tokenize_series(s, cfg), ids)
    assert _triples(a[0], a[1], a[2]) == _triples(b[0], b[1], b[2])
    assert a[3].tolist() == b[3].tolist()


def test_arrow_eligibility_boundaries():
    # bundled stemmers ride the arrow path (dictionary stemming);
    # unbundled ones and ngram stay on the python chain
    assert arrow_fast_eligible(
        {"tokenizer": {"type": "stem", "stem_languages": ["english"]}})
    # round 3 bundled all 18 Snowball languages, so every accepted
    # stem language rides arrow now; only an unknown one falls back
    assert arrow_fast_eligible(
        {"tokenizer": {"type": "stem", "stem_languages": ["turkish"]}})
    assert not arrow_fast_eligible(
        {"tokenizer": {"type": "stem", "stem_languages": ["klingon"]}})
    assert not arrow_fast_eligible({"tokenizer": {"type": "ngram"}})


# position-annotated chain: tokens must be IDENTICAL to the plain chain,
# positions follow tantivy (gaps at removed tokens; see build_analyzer_pos)
_POS_TEXTS = [
    "The quick the fox JUMPS over a lazy dog",
    "masters Mastering the ART of arts",
    "",
    "x" * 45 + " alpha " + "y" * 45 + " beta",
    "汉字 mixed 文本 with English words",
]

_POS_CFGS = [
    {"tokenizer": {"type": "default"}},
    {"tokenizer": {"type": "raw"}},
    {"tokenizer": {"type": "simple", "stop_word_filters": ["english"]}},
    {"tokenizer": {"type": "whitespace", "length_limit": 10}},
    {"tokenizer": {"type": "stem", "stem_languages": ["english"],
                   "stop_word_filters": ["english"]}},
    {"tokenizer": {"type": "ngram", "min_gram": 2, "max_gram": 3}},
    {"tokenizer": {"type": "icu", "mode": "word",
                   "stop_word_filters": ["english"]}},
    {"tokenizer": {"type": "chinese", "jieba": "empty", "mode": "default",
                   "hmm": False}},
]


def test_pos_chain_tokens_match_plain_chain():
    from tantivy_search_spark.tokenizers import (analyzer_from_config,
                                                 analyzer_pos_from_config)
    for cfg in _POS_CFGS:
        a = analyzer_from_config(cfg)
        ap = analyzer_pos_from_config(cfg)
        for text in _POS_TEXTS:
            toks, poss = ap(text)
            assert toks == a(text), (cfg, text)
            assert len(poss) == len(toks), (cfg, text)
            # positions strictly ascend except ngram (all zeros,
            # tantivy NgramTokenizer emits every gram at position 0)
            if cfg["tokenizer"]["type"] == "ngram":
                assert all(p == 0 for p in poss)
            else:
                assert all(b > a_ for a_, b in zip(poss, poss[1:])), \
                    (cfg, text, poss)


def test_pos_chain_gap_semantics():
    from tantivy_search_spark.tokenizers import analyzer_pos_from_config
    # stop word removed AFTER position assignment -> gap at its slot
    ap = analyzer_pos_from_config(
        {"tokenizer": {"type": "simple", "stop_word_filters": ["english"]}})
    assert ap("quick the fox") == (["quick", "fox"], [0, 2])
    # default chain: >=40-byte token removed -> gap
    ap = analyzer_pos_from_config({"tokenizer": {"type": "default"}})
    assert ap("alpha " + "z" * 41 + " beta") == (["alpha", "beta"], [0, 2])
    # cangjie strips nonsense INSIDE token_stream -> consecutive
    ap = analyzer_pos_from_config(
        {"tokenizer": {"type": "chinese", "jieba": "empty",
                       "mode": "default", "hmm": False}})
    toks, poss = ap("汉, 字!")
    assert poss == list(range(len(toks)))
