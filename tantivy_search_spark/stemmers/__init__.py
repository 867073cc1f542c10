"""Snowball stemmer registry.

The reference accepts 18 stem languages
(/root/reference/src/tokenizer/parser.rs:134-150 via rust-stemmers).
All 18 are implemented here from the published Snowball algorithm
descriptions (no third-party stemmer package exists in this
environment).  The Greek exception lists and the rarer Tamil sandhi
cases are reduced to their principal members; COVERAGE.md records
those reductions.
"""

from __future__ import annotations

from collections.abc import Callable

from tantivy_search_spark.stemmers import arabic as _ar
from tantivy_search_spark.stemmers import dutch as _nl
from tantivy_search_spark.stemmers import english as _en
from tantivy_search_spark.stemmers import finnish as _fi
from tantivy_search_spark.stemmers import french as _fr
from tantivy_search_spark.stemmers import german as _de
from tantivy_search_spark.stemmers import greek as _el
from tantivy_search_spark.stemmers import hungarian as _hu
from tantivy_search_spark.stemmers import italian as _it
from tantivy_search_spark.stemmers import portuguese as _pt
from tantivy_search_spark.stemmers import romanian as _ro
from tantivy_search_spark.stemmers import russian as _ru
from tantivy_search_spark.stemmers import spanish as _es
from tantivy_search_spark.stemmers import tamil as _ta
from tantivy_search_spark.stemmers import turkish as _tr
from tantivy_search_spark.stemmers.scandinavian import (
    stem_danish,
    stem_norwegian,
    stem_swedish,
)

STEMMERS: dict[str, Callable[[str], str]] = {
    "arabic": _ar.stem,
    "english": _en.stem,
    "finnish": _fi.stem,
    "french": _fr.stem,
    "german": _de.stem,
    "greek": _el.stem,
    "hungarian": _hu.stem,
    "spanish": _es.stem,
    "romanian": _ro.stem,
    "russian": _ru.stem,
    "italian": _it.stem,
    "portuguese": _pt.stem,
    "dutch": _nl.stem,
    "danish": stem_danish,
    "norwegian": stem_norwegian,
    "swedish": stem_swedish,
    "tamil": _ta.stem,
    "turkish": _tr.stem,
}

#: every reference-accepted language is now bundled
UNIMPLEMENTED: frozenset[str] = frozenset()


def get_stemmer(lang: str) -> Callable[[str], str]:
    key = lang.lower()
    fn = STEMMERS.get(key)
    if fn is None:
        raise NotImplementedError(
            f"Snowball stemmer for '{key}' is not bundled (implemented: "
            f"{', '.join(sorted(STEMMERS))})")
    return fn
