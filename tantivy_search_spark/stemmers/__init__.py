"""Snowball stemmer registry.

The reference accepts 18 stem languages
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).
Eleven are implemented here from the published Snowball algorithm
descriptions (no third-party stemmer package exists in this
environment); the remainder raise a clear error at config-creation
time.  COVERAGE.md records the capability gap.
"""

from __future__ import annotations

from collections.abc import Callable

from tantivy_search_spark.stemmers import dutch as _nl
from tantivy_search_spark.stemmers import english as _en
from tantivy_search_spark.stemmers import french as _fr
from tantivy_search_spark.stemmers import german as _de
from tantivy_search_spark.stemmers import italian as _it
from tantivy_search_spark.stemmers import portuguese as _pt
from tantivy_search_spark.stemmers import russian as _ru
from tantivy_search_spark.stemmers import spanish as _es
from tantivy_search_spark.stemmers.scandinavian import (
    stem_danish,
    stem_norwegian,
    stem_swedish,
)

STEMMERS: dict[str, Callable[[str], str]] = {
    "english": _en.stem,
    "french": _fr.stem,
    "german": _de.stem,
    "spanish": _es.stem,
    "russian": _ru.stem,
    "italian": _it.stem,
    "portuguese": _pt.stem,
    "dutch": _nl.stem,
    "danish": stem_danish,
    "norwegian": stem_norwegian,
    "swedish": stem_swedish,
}

#: accepted by the reference but not implemented here
UNIMPLEMENTED = frozenset(
    """arabic finnish greek hungarian romanian tamil turkish""".split())


def get_stemmer(lang: str) -> Callable[[str], str]:
    key = lang.lower()
    fn = STEMMERS.get(key)
    if fn is None:
        raise NotImplementedError(
            f"Snowball stemmer for '{key}' is not bundled (implemented: "
            f"{', '.join(sorted(STEMMERS))}); the reference supports it "
            "via rust-stemmers — recorded as a capability gap in "
            "COVERAGE.md")
    return fn
