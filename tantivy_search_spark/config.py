"""Index configuration: JSON tokenizer config parsing + validation.

Reproduces the reference's ``verify_index_parameter`` semantics
(/root/reference/src/utils/ffi_utils.rs:8-34): the per-column config is
``{"<col>": {"tokenizer": {"type": ..., <type-specific fields>}}}`` with
serde ``deny_unknown_fields`` — unknown keys or invalid enum values are
rejected (field sets per type:
/root/reference/src/tokenizer/ingredient/tokenizer.rs:9-107).

The parsed config is persisted alongside the index tables as
``_index_meta.json`` (the reference persists ``custom_index_setting.json``,
/root/reference/src/utils/index_utils.rs:120-143).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from tantivy_search_spark.tokenizers import (
    STEM_LANGUAGES,
    STOP_WORD_LANGUAGES,
    TokenizerError,
    analyzer_from_config,
)

_COMMON = {"store_doc"}
_FIELDS_BY_TYPE: dict[str, set[str]] = {
    "default": _COMMON,
    "raw": _COMMON,
    "simple": _COMMON | {"stop_word_filters", "length_limit", "case_sensitive"},
    "stem": _COMMON
    | {"stop_word_filters", "stem_languages", "length_limit", "case_sensitive"},
    "whitespace": _COMMON | {"stop_word_filters", "length_limit", "case_sensitive"},
    "ngram": _COMMON
    | {
        "min_gram",
        "max_gram",
        "prefix_only",
        "stop_word_filters",
        "length_limit",
        "case_sensitive",
    },
    "chinese": _COMMON | {"jieba", "mode", "hmm", "hmm_model",
                          "case_sensitive"},
    "icu": _COMMON | {"mode", "stop_word_filters", "stem_languages",
                      "case_sensitive", "cjk_dict", "suppressions"},
}

_CHINESE_JIEBA = {"default", "empty"}
_CHINESE_MODES = {"all", "default", "search", "unicode"}
_ICU_MODES = {"grapheme", "line", "sentence", "word"}


def _validate_tokenizer(tok: dict) -> None:
    if not isinstance(tok, dict):
        raise TokenizerError("tokenizer config must be an object")
    ttype = tok.get("type")
    if ttype not in _FIELDS_BY_TYPE:
        raise TokenizerError(f"unknown tokenizer type: {ttype!r}")
    allowed = _FIELDS_BY_TYPE[ttype] | {"type"}
    unknown = set(tok) - allowed
    if unknown:
        raise TokenizerError(
            f"unknown fields for tokenizer '{ttype}': {sorted(unknown)}"
        )
    for lang in tok.get("stop_word_filters", []):
        if str(lang).lower() not in STOP_WORD_LANGUAGES:
            raise TokenizerError(f"unknown stop-word language: {lang}")
    for lang in tok.get("stem_languages", []):
        if str(lang).lower() not in STEM_LANGUAGES:
            raise TokenizerError(f"unknown stem language: {lang}")
    if ttype == "ngram":
        min_gram = int(tok.get("min_gram", 2))
        max_gram = int(tok.get("max_gram", 3))
        if min_gram == 0 or min_gram >= max_gram:
            raise TokenizerError("ngram: require 0 < min_gram < max_gram")
    if ttype == "chinese":
        jb = tok.get("jieba", "default")
        # besides the named providers, a filesystem path to a
        # jieba-format dictionary file enables real dictionary mode
        if jb not in _CHINESE_JIEBA and not os.path.isfile(str(jb)):
            raise TokenizerError(
                "chinese: jieba must be default|empty or a path to a "
                "jieba-format dictionary file")
        if tok.get("mode", "search") not in _CHINESE_MODES:
            raise TokenizerError("chinese: bad mode")
        hmm_model = tok.get("hmm_model", "")
        if hmm_model and not os.path.isfile(str(hmm_model)):
            raise TokenizerError(
                "chinese: hmm_model must be a path to a JSON HMM "
                "emission-table file")
    if ttype == "icu":
        if tok.get("mode", "word") not in _ICU_MODES:
            raise TokenizerError("icu: bad mode")
        cjk = tok.get("cjk_dict", "")
        if cjk and not os.path.isfile(str(cjk)):
            raise TokenizerError(
                "icu: cjk_dict must be a path to a frequency-dictionary "
                "file (word freq per line)")
        sup = str(tok.get("suppressions", "")).lower()
        if sup not in ("", "en", "english"):
            raise TokenizerError(
                "icu: suppressions must be '' or 'english'")


def verify_index_parameter(index_json_parameter: str) -> bool:
    """Reference B3: validate the JSON tokenizer config; bool, no raise."""
    try:
        parsed = json.loads(index_json_parameter)
        if not isinstance(parsed, dict):
            return False
        for col_cfg in parsed.values():
            if not isinstance(col_cfg, dict):
                return False
            extra = set(col_cfg) - {"tokenizer"}
            if extra:
                return False
            _validate_tokenizer(col_cfg.get("tokenizer", {"type": "default"}))
        return True
    except (TokenizerError, ValueError, TypeError):
        return False


@dataclass
class IndexConfig:
    """Engine-side index configuration (persisted to ``_index_meta.json``).

    ``columns`` — indexed text columns; unconfigured columns fall back to
    the ``default`` chain (reference TEXT fallback,
    /root/reference/src/index/implements/index_manager.rs:72-74).
    """

    columns: list[str]
    tokenizers: dict[str, dict] = field(default_factory=dict)
    k1: float = 1.2
    b: float = 0.75
    store_doc: bool = False
    # scale knobs
    parts_per_shard: int = 64  # doc-range parts folded into one posting shard row
    n_buckets: int = 64  # hash(term) buckets for file-level pruning
    block_size: int = 128  # docs per posting block (skip/block-max granularity)
    #: index token positions (reference WithFreqsAndPositions) — enables
    #: true quoted-phrase queries at ~2x postings storage; default OFF
    #: keeps the round-1 positions-free layout
    with_positions: bool = False

    @classmethod
    def from_json(cls, columns: list[str], index_json_parameter: str = "{}") -> "IndexConfig":
        if not verify_index_parameter(index_json_parameter):
            raise TokenizerError(f"invalid index parameter: {index_json_parameter}")
        parsed = json.loads(index_json_parameter)
        store = any(
            c.get("tokenizer", {}).get("store_doc", False) for c in parsed.values()
        )
        cfg = cls(columns=list(columns), tokenizers=parsed, store_doc=store)
        # capability gaps (chinese/icu tokenizers, unbundled stemmers)
        # must surface HERE with a clear NotImplementedError, not at the
        # first analyzer build deep inside an index job
        for col in cfg.columns:
            cfg.analyzer(col)
        return cfg

    def tokenizer_config(self, column: str) -> dict:
        return self.tokenizers.get(column, {"tokenizer": {"type": "default"}})

    def analyzer(self, column: str):
        return analyzer_from_config(self.tokenizer_config(column))

    def analyzer_pos(self, column: str):
        """Position-annotated analyzer (tantivy Token.position model —
        removing filters leave gaps); used by the positions index path
        and quoted-phrase query parsing."""
        from tantivy_search_spark.tokenizers import analyzer_pos_from_config
        return analyzer_pos_from_config(self.tokenizer_config(column))

    def lowercases(self, column: str) -> bool:
        """Whether the column's chain ends in LowerCaser (used by LIKE->regex,
        reference api_regex_term_bitmap.rs:28-40)."""
        tok = self.tokenizer_config(column).get("tokenizer", {"type": "default"})
        t = tok.get("type", "default")
        if t == "raw":
            return False
        if t == "default":
            return True
        return not tok.get("case_sensitive", False)

    def to_json(self) -> str:
        return json.dumps(
            {
                "columns": self.columns,
                "tokenizers": self.tokenizers,
                "k1": self.k1,
                "b": self.b,
                "store_doc": self.store_doc,
                "parts_per_shard": self.parts_per_shard,
                "n_buckets": self.n_buckets,
                "block_size": self.block_size,
                "with_positions": self.with_positions,
            }
        )

    @classmethod
    def from_meta_json(cls, s: str) -> "IndexConfig":
        d = json.loads(s)
        return cls(**d)
