"""Query AST + compilation to native Spark Column expressions.

Reproduces the semantics of the reference's two query families
(SURVEY.md §2.4):

* standard (`bm25_standard_search`): per target column, tokenize the
  sentence with that column's analyzer, combine the column's tokens with
  AND or OR, and OR the per-column groups together
  (behavior of /root/reference/src/search/implements/strategy/
  bm25_standard_query.rs:23-104).
* nlq (`bm25_natural_language_search`): a small recursive-descent parser
  for the grammar subset the reference test-suite exercises —
  ``col:term``, ``col:(a b c)``, parentheses, infix ``OR``/``AND``, bare
  terms over all default columns, default conjunction when
  ``operator_or=False`` (QueryParser::set_conjunction_by_default).

Scoring follows Lucene/Tantivy BooleanQuery: a document's score is the
sum of the scores of its *matching* subtrees; a Must (AND) group
contributes only when every child matches.  The tree compiles bottom-up
to Spark Column expressions over per-atom aggregated columns (``m<i>``
matched flags, ``s<i>`` score sums), so evaluation is whole-stage
codegen'd JVM work — no Python in the scoring hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, functions as F


@dataclass
class Term:
    col: str | None  # None = any default column
    text: str  # already analyzed token


@dataclass
class Phrase:
    """Quoted phrase over one column: terms must appear adjacent, in
    order (reference WithFreqsAndPositions + tantivy PhraseQuery
    semantics).  Only produced when the index stores positions; scored
    as the sum of its member term scores (an AND group restricted to
    adjacency matches).

    ``slop`` ('"a b"~2', tantivy QueryParser slop syntax): a cumulative
    gap budget — terms must still appear IN ORDER, and the total number
    of extra tokens between consecutive phrase terms must be <= slop
    ('"a b"~1' matches 'a x b' but not 'b a'; transpositions are not
    matched — documented divergence from Lucene-style sloppy phrases,
    which tantivy also does not implement)."""

    col: str
    terms: list  # analyzed tokens, in phrase order
    slop: int = 0
    #: query-side token positions (tantivy Token.position, normalized so
    #: offsets[0] == 0).  A stop word inside the quoted text leaves a
    #: gap — '"quick the fox"' becomes terms (quick, fox) at offsets
    #: (0, 2) and only matches documents with one (removed) token
    #: between them, like tantivy PhraseQuery::new_with_offset.
    #: Empty () means consecutive (0, 1, 2, ...).
    offsets: tuple = ()

    def __post_init__(self):
        if not self.offsets:
            self.offsets = tuple(range(len(self.terms)))


@dataclass
class Boost:
    """Score multiplier on a subtree (tantivy QueryParser 'term^2.0');
    matching is unchanged, the subtree's score scales by ``factor``."""

    child: object
    factor: float


@dataclass
class Bool:
    """Boolean group with exclusions: matches when ``positive`` matches
    and NO ``must_nots`` member matches; scores as ``positive`` alone
    (tantivy QueryParser '-term' => BooleanQuery MustNot semantics:
    excluded clauses never contribute score)."""

    positive: object  # Term/Phrase/And/Or (None => pure-negative query)
    must_nots: list = field(default_factory=list)


@dataclass
class And:
    children: list = field(default_factory=list)


@dataclass
class Or:
    children: list = field(default_factory=list)


def standard_query_tree(
    tokens_by_col: dict[str, list[str]], operator_or: bool
):
    """Per-column token groups, AND/OR within a column, OR across columns."""
    groups = []
    for col, toks in tokens_by_col.items():
        # reference multiterms queries are term-set based: dedup, keep order
        uniq = list(dict.fromkeys(toks))
        if not uniq:
            continue
        terms = [Term(col, t) for t in uniq]
        groups.append(Or(terms) if operator_or else And(terms))
    if not groups:
        return None
    return Or(groups) if len(groups) > 1 else groups[0]


# ---------------------------------------------------------------------------
# NLQ parser (subset)
# ---------------------------------------------------------------------------


class NlqError(ValueError):
    pass


def _lex(q: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise NlqError("unterminated quote")
            out.append(q[i : j + 1])
            i = j + 1
        elif c == "-" and i + 1 < n and q[i + 1] == '"':
            out.append("-")  # negated quoted phrase: -"..."
            i += 1
        else:
            j = i
            while j < n and not q[j].isspace() and q[j] not in "()":
                j += 1
            out.append(q[i:j])
            i = j
    return out


def parse_nlq(
    query: str,
    default_columns: list[str],
    analyzers: dict[str, callable],
    conjunction_by_default: bool,
    phrase_nodes: bool = False,
    pos_analyzers: dict[str, callable] | None = None,
):
    """Parse the NLQ grammar subset into a Term/And/Or tree (or None).

    ``pos_analyzers`` (col -> analyze_pos) supplies tantivy-style token
    positions for quoted phrases, so a stop word inside the quotes
    leaves a gap in the Phrase offsets; without it phrases assume
    consecutive offsets (exact for filter chains that remove nothing).
    """
    toks = _lex(query)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def analyzed_term(col: str | None, text: str):
        """Analyze raw text for one column (or all defaults) -> node."""
        if col is not None:
            pieces = analyzers[col](text)
            terms = [Term(col, p) for p in pieces]
        else:
            # bare term: Should across default columns (per-column analysis)
            by_col = []
            for c in default_columns:
                pieces = analyzers[c](text)
                if len(pieces) == 1:
                    by_col.append(Term(c, pieces[0]))
                elif len(pieces) > 1:
                    sub = [Term(c, p) for p in pieces]
                    by_col.append(And(sub) if conjunction_by_default else Or(sub))
            if not by_col:
                return None
            return by_col[0] if len(by_col) == 1 else Or(by_col)
        if not terms:
            return None  # fully stopworded away
        if len(terms) == 1:
            return terms[0]
        return And(terms) if conjunction_by_default else Or(terms)

    def _strip_boost(tok: str):
        """'term^2.5' -> ('term', 2.5); no-op when ^ absent/invalid."""
        if "^" in tok and not tok.startswith('"'):
            base, _, suffix = tok.rpartition("^")
            try:
                return base, float(suffix)
            except ValueError:
                pass
        return tok, None

    def parse_unit():
        nonlocal pos
        t = peek()
        if t is None:
            return None
        if t == "(":
            pos += 1
            node = parse_or()
            if peek() != ")":
                raise NlqError("missing )")
            pos += 1
            node = _maybe_trailing_boost(node)
            return node
        if t == ")":
            return None
        boost = None
        if isinstance(t, str):
            stripped, boost = _strip_boost(t)
            if boost is not None:
                toks[pos] = stripped
                t = stripped
        pos += 1
        if t.startswith('"') and t.endswith('"'):
            node = _quoted(t[1:-1])
            node = _maybe_trailing_slop(node)
            node = _maybe_trailing_boost(node)
            if boost is not None and node is not None:
                node = Boost(node, boost)
            return node
        node = _parse_bare_or_field(t)
        if boost is not None and node is not None:
            node = Boost(node, boost)
        return node

    def _maybe_trailing_slop(node):
        """'"..."~2': tantivy QueryParser phrase slop — the lexer emits
        '~2' as its own token.  Sets slop on every Phrase inside the
        quoted unit's node (single-piece columns stay plain Terms: slop
        on a one-term phrase is a no-op in tantivy too)."""
        nonlocal pos
        t = peek()
        if node is not None and isinstance(t, str) and t.startswith("~"):
            body, caret, suffix = t[1:].partition("^")
            if not body.isdigit():
                return node
            slop = int(body)
            if caret:
                toks[pos] = caret + suffix  # leave '^3' for the boost pass
            else:
                pos += 1

            def put(n):
                if isinstance(n, Phrase):
                    n.slop = slop
                elif isinstance(n, (And, Or)):
                    for c in n.children:
                        put(c)

            put(node)
        return node

    def _maybe_trailing_boost(node):
        """'(...)^2' / '"..."^2': the lexer emits '^2' as its own token."""
        nonlocal pos
        t = peek()
        if node is not None and isinstance(t, str) and t.startswith("^"):
            try:
                factor = float(t[1:])
            except ValueError:
                return node
            pos += 1
            return Boost(node, factor)
        return node

    def _parse_bare_or_field(t: str):
        nonlocal pos
        if t.startswith('"') and t.endswith('"'):
            # quoted phrase -> AND group (positions are not indexed; the
            # reference suite never issues phrase queries — SURVEY.md §2)
            return _quoted(t[1:-1])
        if ":" in t and not t.startswith(":"):
            col, rest = t.split(":", 1)
            if col not in analyzers:
                raise NlqError(f"unknown field: {col}")
            if rest == "(" or rest == "":
                # col:( ... ) with space or col:(...) split by lexer only if
                # the '(' was attached; handle "col:(a" token shape below
                if rest == "":
                    if peek() == "(":
                        pos += 1
                        inner = parse_field_group(col)
                        return inner
                    raise NlqError("empty field term")
            if rest.startswith("("):
                # token like 'col:(a' — push back remainder
                return parse_field_group_inline(col, rest)
            return analyzed_term(col, rest)
        return analyzed_term(None, t)

    def parse_field_group(col: str):
        nonlocal pos
        texts = []
        while peek() is not None and peek() != ")":
            texts.append(toks[pos])
            pos += 1
        if peek() != ")":
            raise NlqError("missing ) in field group")
        pos += 1
        return field_group_node(col, texts)

    def parse_field_group_inline(col: str, rest: str):
        nonlocal pos
        texts = []
        first = rest[1:]
        closed = False
        if first.endswith(")"):
            first, closed = first[:-1], True
        if first:
            texts.append(first)
        while not closed and peek() is not None:
            t = toks[pos]
            pos += 1
            if t == ")":
                closed = True
                break
            if t.endswith(")"):
                texts.append(t[:-1])
                closed = True
                break
            texts.append(t)
        if not closed:
            raise NlqError("missing ) in field group")
        return field_group_node(col, texts)

    def field_group_node(col: str, texts: list[str]):
        pieces: list[str] = []
        for x in texts:
            pieces.extend(analyzers[col](x))
        pieces = list(dict.fromkeys(pieces))
        if not pieces:
            return None
        terms = [Term(col, p) for p in pieces]
        if len(terms) == 1:
            return terms[0]
        return And(terms) if conjunction_by_default else Or(terms)

    def _quoted(text: str):
        """Quoted phrase: a true Phrase node when the index stores
        positions (phrase_nodes=True); otherwise the round-1 degradation
        to an AND group (positions-free layout cannot check adjacency)."""
        by_col = []
        for c in default_columns:
            if pos_analyzers is not None:
                pieces, offs = pos_analyzers[c](text)
            else:
                pieces = analyzers[c](text)
                offs = list(range(len(pieces)))
            if pieces:
                if len(pieces) == 1:
                    by_col.append(Term(c, pieces[0]))
                elif phrase_nodes:
                    base = offs[0]
                    by_col.append(Phrase(
                        c, list(pieces),
                        offsets=tuple(o - base for o in offs)))
                else:
                    by_col.append(And([Term(c, p) for p in pieces]))
        if not by_col:
            return None
        return by_col[0] if len(by_col) == 1 else Or(by_col)

    def parse_and_seq():
        nonlocal pos
        units = []
        negs = []
        while True:
            t = peek()
            if t is None or t == ")" or t == "OR":
                break
            if t == "AND":
                pos += 1
                continue
            neg = False
            if t == "-":  # lexer-split negation marker (-"phrase")
                pos += 1
                t = peek()
                if isinstance(t, str) and t.startswith('"'):
                    neg = True
                else:
                    continue  # stray standalone dash: ignore (lenient)
            elif isinstance(t, str) and len(t) > 1 and t[0] == "-":
                # tantivy QueryParser '-term' / '-col:term' => MustNot
                toks[pos] = t[1:]
                neg = True
            elif isinstance(t, str) and len(t) > 1 and t[0] == "+":
                # '+term': Must — under default conjunction every clause
                # is already a must; under OR-default we honor the
                # common intent by keeping the clause (documented
                # simplification: no mixed Should/Must scoring group)
                toks[pos] = t[1:]
            u = parse_unit()
            if u is not None:
                (negs if neg else units).append(u)
        if not units and not negs:
            return None
        if not units:
            positive = None  # pure-negative query matches nothing
        elif len(units) == 1:
            positive = units[0]
        else:
            positive = And(units) if conjunction_by_default else Or(units)
        if negs:
            return Bool(positive, negs)
        return positive

    def parse_or():
        nonlocal pos
        parts = []
        first = parse_and_seq()
        if first is not None:
            parts.append(first)
        while peek() == "OR":
            pos += 1
            nxt = parse_and_seq()
            if nxt is not None:
                parts.append(nxt)
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Or(parts)

    tree = parse_or()
    if pos != len(toks):
        raise NlqError(f"trailing tokens: {toks[pos:]}")
    return tree


# ---------------------------------------------------------------------------
# Atom extraction + Column compilation
# ---------------------------------------------------------------------------


def flat_groups_weighted(
    tree, mult: float = 1.0,
) -> list[tuple[list[tuple], bool]] | None:
    """Decompose a *flat* tree into [([(atom_key, weight)], is_and)]
    groups whose scores combine as: total = sum over matched groups of
    the group's weight×atom-score sums; matched = any group matched.
    This is the shape ``standard_query_tree`` emits (per-column AND/OR
    groups OR'd together) plus Boost nodes, whose factor is linear in
    the score and therefore distributes onto the member atoms'
    weights — letting the batch scorer keep dense matrix ops (a score
    weight matrix distinct from the match-arity count matrix).

    OR is associative for both matching (any) and scoring (sum of
    matched children), so nested Or children flatten recursively.
    And-of-Or does NOT distribute: the kernel sums every matched
    group, so DNF-expanding "a (b OR c)" into (a b) OR (a c) would
    double-count a's score on docs matching both arms.  Exclusions
    (Bool must_not) change matching, not scores — they keep the
    compile path.  Returns None for those shapes.
    """
    leaf = (Term, Phrase)  # a Phrase is one scoring atom (position-
    # verified by its scorer), so it participates in flat groups like
    # any term atom

    if isinstance(tree, Boost):
        return flat_groups_weighted(tree.child, mult * float(tree.factor))
    if isinstance(tree, Bool):
        return None  # exclusions need the compile path
    if isinstance(tree, leaf):
        return [([(atom_key(tree), mult)], False)]
    if isinstance(tree, And):
        atoms = []
        for c in tree.children:
            if c is None:
                continue
            m, node = mult, c
            while isinstance(node, Boost):
                m *= float(node.factor)
                node = node.child
            if not isinstance(node, leaf):
                return None
            atoms.append((atom_key(node), m))
        return [(atoms, True)]
    if isinstance(tree, Or):
        groups = []
        for c in tree.children:
            if c is None:
                continue
            sub = flat_groups_weighted(c, mult)
            if sub is None:
                return None
            groups.extend(sub)
        return groups
    return None


def flat_groups(tree) -> list[tuple[list[tuple[str | None, str]], bool]] | None:
    """Unweighted view of ``flat_groups_weighted`` for callers whose
    math carries no per-atom weights (the WAND block-max paths): the
    same [(atom_keys, is_and)] groups, or None when the tree is nested
    OR carries boost weights ≠ 1."""
    weighted = flat_groups_weighted(tree)
    if weighted is None:
        return None
    out = []
    for atoms, is_and in weighted:
        if any(w != 1.0 for _, w in atoms):
            return None
        out.append(([k for k, _ in atoms], is_and))
    return out


#: marker prefix distinguishing phrase atom keys from (col, term) keys
_PHRASE_MARK = "\0phrase"


def atom_key(node):
    """Scoring-atom key for a leaf: (col, term) for a Term; a marked
    (mark, col, terms, slop) tuple for a Phrase (one phrase = one atom,
    scored by the position-aware phrase scorer)."""
    if isinstance(node, Term):
        return (node.col, node.text)
    if isinstance(node, Phrase):
        return (_PHRASE_MARK, node.col, tuple(node.terms), node.slop,
                tuple(node.offsets))
    raise TypeError(type(node))


def is_phrase_key(key) -> bool:
    return len(key) == 5 and key[0] == _PHRASE_MARK


def collect_atoms(tree) -> list:
    """Distinct leaf atom keys in tree order (Terms and Phrases)."""
    atoms: list = []
    seen = set()

    def walk(node):
        if node is None:
            return
        if isinstance(node, (Term, Phrase)):
            key = atom_key(node)
            if key not in seen:
                seen.add(key)
                atoms.append(key)
        elif isinstance(node, Bool):
            walk(node.positive)
            for c in node.must_nots:
                walk(c)
        elif isinstance(node, Boost):
            walk(node.child)
        else:
            for c in node.children:
                walk(c)

    walk(tree)
    return atoms


def compile_tree(tree, atom_index: dict[tuple[str | None, str], int]) -> tuple[Column, Column]:
    """Tree -> (matched: Column<bool>, score: Column<double>).

    Operates on an aggregated row with columns ``m<i>`` (int 0/1) and
    ``s<i>`` (double, null if unmatched) per atom.
    """

    def walk(node) -> tuple[Column, Column]:
        if isinstance(node, Term):
            i = atom_index[(node.col, node.text)]
            matched = F.col(f"m{i}") == 1
            score = F.coalesce(F.col(f"s{i}"), F.lit(0.0))
            return matched, F.when(matched, score).otherwise(F.lit(0.0))
        kids = [walk(c) for c in node.children if c is not None]
        if not kids:
            return F.lit(False), F.lit(0.0)
        if isinstance(node, And):
            matched = kids[0][0]
            for m, _ in kids[1:]:
                matched = matched & m
            total = kids[0][1]
            for _, s in kids[1:]:
                total = total + s
            return matched, F.when(matched, total).otherwise(F.lit(0.0))
        # Or
        matched = kids[0][0]
        for m, _ in kids[1:]:
            matched = matched | m
        total = kids[0][1]
        for _, s in kids[1:]:
            total = total + s
        return matched, total

    return walk(tree)


def compile_tree_map_sql(
    tree,
    atom_index: dict[tuple[str | None, str], int],
    map_col: str = "sc",
) -> tuple[str, str]:
    """SQL-text twin of :func:`compile_tree_map`: returns
    ``(matched_sql, score_sql)`` strings with identical semantics.

    Motivation is driver latency, not plan shape: the Column form makes
    one py4j round-trip per node/operator (~3 ms each), which at a few
    dozen nodes is most of a single query's plan-build time.  Building
    the expression as text and wrapping it in ONE ``F.expr`` call per
    output collapses that to two round-trips; Catalyst parses the text
    into the same expression tree.
    """

    def walk(node) -> tuple[str, str]:
        if isinstance(node, (Term, Phrase)):
            i = atom_index[atom_key(node)]
            v = f"`{map_col}`[{int(i)}]"
            return f"({v} IS NOT NULL)", f"coalesce({v}, CAST(0.0 AS DOUBLE))"
        if isinstance(node, Boost):
            m, sc = walk(node.child)
            f = float(node.factor)
            return m, f"({sc} * CAST({f!r} AS DOUBLE))"
        if isinstance(node, Bool):
            if node.positive is None:
                pm, ps = "false", "CAST(0.0 AS DOUBLE)"
            else:
                pm, ps = walk(node.positive)
            excl = " OR ".join(walk(c)[0] for c in node.must_nots)
            matched = f"({pm} AND NOT ({excl}))" if excl else f"({pm})"
            return matched, (f"(CASE WHEN {matched} THEN {ps} "
                             f"ELSE CAST(0.0 AS DOUBLE) END)")
        kids = [walk(c) for c in node.children if c is not None]
        if not kids:
            return "false", "CAST(0.0 AS DOUBLE)"
        total = "(" + " + ".join(s for _, s in kids) + ")"
        if isinstance(node, And):
            matched = "(" + " AND ".join(m for m, _ in kids) + ")"
            return matched, (f"(CASE WHEN {matched} THEN {total} "
                             f"ELSE CAST(0.0 AS DOUBLE) END)")
        matched = "(" + " OR ".join(m for m, _ in kids) + ")"
        return matched, total

    return walk(tree)


def compile_tree_map(
    tree,
    atom_index: dict[tuple[str | None, str], int],
    map_col: str = "sc",
) -> tuple[Column, Column]:
    """Like :func:`compile_tree`, but over a single ``map<int, double>``
    column (atom id -> summed score) instead of 2N flat columns.

    The flat-column form needs 2 aggregate expressions per atom; past a
    few hundred atoms the generated aggregate method exceeds janino's
    64 KB limit and the whole stage silently falls back to interpreted
    execution.  A map lookup per atom keeps the *aggregation* fixed-size
    (the map is built by a constant-width collect_list agg upstream) and
    projection expressions split fine across generated methods.
    """

    def walk(node) -> tuple[Column, Column]:
        if isinstance(node, (Term, Phrase)):
            i = atom_index[atom_key(node)]
            v = F.col(map_col).getItem(i)
            matched = v.isNotNull()
            return matched, F.coalesce(v, F.lit(0.0))
        if isinstance(node, Boost):
            m, sc = walk(node.child)
            return m, sc * F.lit(float(node.factor))
        if isinstance(node, Bool):
            if node.positive is None:
                pm, ps = F.lit(False), F.lit(0.0)
            else:
                pm, ps = walk(node.positive)
            excluded = F.lit(False)
            for c in node.must_nots:
                em, _ = walk(c)
                excluded = excluded | em
            matched = pm & ~excluded
            return matched, F.when(matched, ps).otherwise(F.lit(0.0))
        kids = [walk(c) for c in node.children if c is not None]
        if not kids:
            return F.lit(False), F.lit(0.0)
        if isinstance(node, And):
            matched = kids[0][0]
            for m, _ in kids[1:]:
                matched = matched & m
            total = kids[0][1]
            for _, s in kids[1:]:
                total = total + s
            return matched, F.when(matched, total).otherwise(F.lit(0.0))
        # Or
        matched = kids[0][0]
        for m, _ in kids[1:]:
            matched = matched | m
        total = kids[0][1]
        for _, s in kids[1:]:
            total = total + s
        return matched, total

    return walk(tree)
