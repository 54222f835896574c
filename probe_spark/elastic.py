"""Elastic query language: lexer, parser, AST, boolean evaluation.

Faithful Python re-implementation of the reference grammar and semantics
(SURVEY.md SS2.3-2.4, /root/reference/src/search/elastic_query.rs):

  * lexer tokens ``+ - AND OR ( ) : ident "quoted"`` (:542-644)
  * grammar: ``or_expr := and_expr (OR and_expr)*``;
    ``and_expr := factor (AND factor | +/- factor => AND |
    adjacency => implicit OR)*`` (:683-748)
  * term parsing: ``+`` required, ``-`` excluded, quoted exact,
    ``field:term``, ``ns::path`` rejoin (:762-891)
  * parse-time term expansion through the content tokenizer for non-exact,
    non-excluded terms (:791-814); exact/excluded keywords become per-query
    special terms (not a process global -- SURVEY.md SS7.0)
  * evaluation incl. the Lucene-ish required-first rule (:109-146) and the
    optional any-keyword rule (:221-234)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from probe_spark import textkit


class ParseError(Exception):
    pass


@dataclass(frozen=True)
class Term:
    """elastic_query.rs:27-34.  ``raw`` keeps the pre-expansion keyword(s)
    (the user's original ident, dots intact) for the filename auto-detect
    (filters.rs:302-328) -- expansion splits 'main.rs' into tokens, so the
    detection must look at the raw form."""

    keywords: tuple[str, ...]
    field: str | None = None
    required: bool = False
    excluded: bool = False
    exact: bool = False
    # carried metadata, not part of term identity (goldens compare Terms)
    raw: tuple[str, ...] | None = dc_field(default=None, compare=False)
    # resolved=True marks keywords that ARE index vocabulary (the
    # plan_from_index_terms path): they must never be case-folded again,
    # or a case-preserving simple-tokenizer index scores zero postings
    resolved: bool = dc_field(default=False, compare=False)

    @property
    def lowercase_keywords(self) -> tuple[str, ...]:
        if self.resolved:
            return self.keywords
        return tuple(k.lower() for k in self.keywords)


@dataclass(frozen=True)
class And:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class Or:
    left: "Expr"
    right: "Expr"


Expr = Term | And | Or


# ---------------------------------------------------------------------------
# Lexer (elastic_query.rs:542-644)
# ---------------------------------------------------------------------------

PLUS, MINUS, AND_T, OR_T, LPAREN, RPAREN, COLON, IDENT, QUOTED = range(9)


def lex(text: str) -> list[tuple[int, str]]:
    tokens: list[tuple[int, str]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
        elif c == "+":
            tokens.append((PLUS, c))
            i += 1
        elif c == "-":
            tokens.append((MINUS, c))
            i += 1
        elif c == "(":
            tokens.append((LPAREN, c))
            i += 1
        elif c == ")":
            tokens.append((RPAREN, c))
            i += 1
        elif c == ":":
            tokens.append((COLON, c))
            i += 1
        elif c == '"':
            i += 1
            buf: list[str] = []
            escaped = False
            closed = False
            while i < n:
                ch = text[i]
                if escaped:
                    buf.append(ch)
                    escaped = False
                    i += 1
                elif ch == "\\":
                    escaped = True
                    i += 1
                elif ch == '"':
                    i += 1
                    closed = True
                    break
                else:
                    buf.append(ch)
                    i += 1
            if not closed:
                raise ParseError("Unexpected end of input in quoted string")
            tokens.append((QUOTED, "".join(buf)))
        elif c.isalnum() or c in "_.":
            buf = []
            while i < n and (text[i].isalnum() or text[i] in "_.-"):
                buf.append(text[i])
                i += 1
            ident = "".join(buf)
            upper = ident.upper()
            if upper == "AND":
                tokens.append((AND_T, ident))
            elif upper == "OR":
                tokens.append((OR_T, ident))
            else:
                tokens.append((IDENT, ident))
        else:
            i += 1  # skip unknown characters (elastic_query.rs:591-597)
    if not tokens:
        raise ParseError("No valid tokens found in input")
    return tokens


# ---------------------------------------------------------------------------
# Parser (elastic_query.rs:683-891)
# ---------------------------------------------------------------------------


@dataclass
class _Parser:
    tokens: list[tuple[int, str]]
    special_terms: set[str]
    pos: int = 0

    def peek(self) -> tuple[int, str] | None:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> tuple[int, str] | None:
        t = self.peek()
        if t is not None:
            self.pos += 1
        return t

    def expect(self, kind: int) -> None:
        t = self.peek()
        if t is None:
            raise ParseError("Unexpected end of input")
        if t[0] != kind:
            raise ParseError(f"Unexpected token {t!r}")
        self.next()

    def parse_expr(self) -> Expr:
        return self.parse_or_expr()

    def parse_or_expr(self) -> Expr:
        left = self.parse_and_expr()
        while (t := self.peek()) is not None and t[0] == OR_T:
            self.next()
            right = self.parse_and_expr()
            left = Or(left, right)
        return left

    def parse_and_expr(self) -> Expr:
        left = self.parse_factor()
        while (t := self.peek()) is not None:
            kind = t[0]
            if kind == AND_T:
                self.next()
                left = And(left, self.parse_factor())
            elif kind == OR_T:
                break
            elif kind in (PLUS, MINUS):
                # +/- chain forces AND (elastic_query.rs:726-732)
                left = And(left, self.parse_factor())
            elif kind in (IDENT, QUOTED, LPAREN):
                # adjacency => implicit OR (elastic_query.rs:734-741)
                left = Or(left, self.parse_factor())
            else:
                break
        return left

    def parse_factor(self) -> Expr:
        t = self.peek()
        if t is not None and t[0] == LPAREN:
            self.next()
            expr = self.parse_expr()
            self.expect(RPAREN)
            return expr
        return self.parse_prefixed_term()

    def parse_prefixed_term(self) -> Expr:
        required = excluded = False
        t = self.peek()
        if t is not None and t[0] == PLUS:
            required = True
            self.next()
        elif t is not None and t[0] == MINUS:
            excluded = True
            self.next()

        primary = self.parse_primary()
        if not isinstance(primary, Term):
            return primary

        # Parse-time expansion (elastic_query.rs:791-814)
        if primary.exact or excluded:
            for kw in primary.keywords:
                self.special_terms.add(kw.lower())
            final_keywords = primary.keywords
        else:
            expanded: list[str] = []
            for kw in primary.keywords:
                expanded.extend(
                    s
                    for s in textkit.tokenize(kw, frozenset(self.special_terms))
                    if s
                )
            final_keywords = tuple(expanded)
        return Term(
            keywords=final_keywords,
            field=primary.field,
            required=required,
            excluded=excluded,
            exact=primary.exact,
            raw=primary.keywords,
        )

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t is None:
            raise ParseError("Unexpected end of input")
        kind, val = t
        if kind == QUOTED:
            self.next()
            return Term(keywords=(val,), exact=True)
        if kind == IDENT:
            self.next()
            first = val
            nxt = self.peek()
            if nxt is not None and nxt[0] == COLON:
                self.next()  # consume ':'
                nxt2 = self.peek()
                if nxt2 is not None and nxt2[0] == COLON:
                    # namespace separator '::' (elastic_query.rs:845-864)
                    self.next()
                    nid = self.next()
                    if nid is None or nid[0] != IDENT:
                        return Term(keywords=(first,))
                    qualified = f"{first}::{nid[1]}"
                    while (
                        (a := self.peek()) is not None
                        and a[0] == COLON
                        and self.pos + 1 < len(self.tokens)
                        and self.tokens[self.pos + 1][0] == COLON
                    ):
                        self.next()
                        self.next()
                        part = self.next()
                        if part is None or part[0] != IDENT:
                            break
                        qualified += f"::{part[1]}"
                    return Term(keywords=(qualified,))
                if nxt2 is not None and nxt2[0] == IDENT:
                    self.next()
                    return Term(keywords=(nxt2[1],), field=first)
                if nxt2 is not None and nxt2[0] == QUOTED:
                    self.next()
                    return Term(keywords=(nxt2[1],), field=first, exact=True)
                return Term(keywords=(), field=first)
            return Term(keywords=(first,))
        raise ParseError(f"Unexpected token {t!r}")


def parse_query(
    query: str, exact: bool = False
) -> tuple[Expr, frozenset[str]]:
    """elastic_query.rs:917-955 (parse_query incl. fallbacks).

    Returns (ast, per-query special terms).  The special-terms set replaces
    probe's process-global DYNAMIC_SPECIAL_TERMS (SURVEY.md SS7.0).
    """
    if exact:
        return Term(keywords=(query,), exact=True), frozenset()

    try:
        tokens = lex(query)
    except ParseError:
        cleaned = "".join(
            c for c in query if c.isalnum() or c.isspace() or c in "_."
        )
        if not cleaned.strip():
            raise ParseError("No valid tokens found") from None
        keywords = tuple(s.lower() for s in cleaned.split())
        return Term(keywords=keywords), frozenset()

    special: set[str] = set()
    parser = _Parser(tokens, special)
    try:
        ast = parser.parse_expr()
    except ParseError:
        idents = tuple(v for k, v in tokens if k == IDENT)
        if not idents:
            raise ParseError("No valid identifiers found") from None
        return Term(keywords=idents), frozenset(special)
    return ast, frozenset(special)


# ---------------------------------------------------------------------------
# AST helpers + evaluation (elastic_query.rs:84-446)
# ---------------------------------------------------------------------------


def walk_terms(expr: Expr):
    if isinstance(expr, Term):
        yield expr
    else:
        yield from walk_terms(expr.left)
        yield from walk_terms(expr.right)


def has_required_term(expr: Expr) -> bool:
    return any(t.required for t in walk_terms(expr))


def is_only_excluded_terms(expr: Expr) -> bool:
    return all(t.excluded for t in walk_terms(expr))


def update_exact(expr: Expr) -> Expr:
    """query.rs:256-271 (update_ast_exact)."""
    if isinstance(expr, Term):
        return Term(
            expr.keywords, expr.field, expr.required, expr.excluded, True,
            expr.raw,
        )
    klass = type(expr)
    return klass(update_exact(expr.left), update_exact(expr.right))


def _check_all_required_present(
    expr: Expr, matched: frozenset[int], term_indices: dict[str, int]
) -> bool:
    """elastic_query.rs:109-146."""
    if isinstance(expr, Term):
        if expr.required and not expr.excluded:
            return all(
                term_indices.get(kw) in matched
                for kw in expr.lowercase_keywords
            )
        return True
    return _check_all_required_present(
        expr.left, matched, term_indices
    ) and _check_all_required_present(expr.right, matched, term_indices)


def _evaluate_inner(
    expr: Expr,
    matched: frozenset[int],
    term_indices: dict[str, int],
    ignore_negatives: bool,
    has_required_anywhere: bool,
) -> bool:
    """elastic_query.rs:150-285 (evaluate_with_has_required)."""
    if not matched and not is_only_excluded_terms(expr):
        return False
    if has_required_anywhere and not ignore_negatives:
        if not _check_all_required_present(expr, matched, term_indices):
            return False

    if isinstance(expr, Term):
        kws = expr.lowercase_keywords
        if not kws:
            return expr.excluded
        present = [term_indices.get(kw) in matched for kw in kws]
        if expr.excluded:
            if ignore_negatives:
                return True
            return not any(present)
        if expr.required and ignore_negatives:
            return True
        if expr.required:
            return all(present)
        if has_required_anywhere:
            return True
        return any(present)
    if isinstance(expr, And):
        return _evaluate_inner(
            expr.left, matched, term_indices, ignore_negatives, has_required_anywhere
        ) and _evaluate_inner(
            expr.right, matched, term_indices, ignore_negatives, has_required_anywhere
        )
    return _evaluate_inner(
        expr.left, matched, term_indices, ignore_negatives, has_required_anywhere
    ) or _evaluate_inner(
        expr.right, matched, term_indices, ignore_negatives, has_required_anywhere
    )


def evaluate(
    expr: Expr,
    matched: frozenset[int] | set[int],
    term_indices: dict[str, int],
    ignore_negatives: bool = False,
) -> bool:
    """elastic_query.rs:363-446 (evaluate)."""
    matched = frozenset(matched)
    if not matched and not is_only_excluded_terms(expr):
        return False
    if ignore_negatives:
        for t in walk_terms(expr):
            if t.required and not t.excluded:
                for kw in t.lowercase_keywords:
                    idx = term_indices.get(kw)
                    if idx is None or idx not in matched:
                        return False
    has_req = has_required_term(expr)
    return _evaluate_inner(expr, matched, term_indices, ignore_negatives, has_req)


# ---------------------------------------------------------------------------
# Query plan (query.rs:94-227)
# ---------------------------------------------------------------------------

def validate_query(query: str) -> tuple[bool, str | None]:
    """Q10 (query_validator.rs): syntax pre-check without building a plan.
    Returns (ok, error_message)."""
    try:
        parse_query(query)
        return True, None
    except ParseError as e:
        return False, str(e)


def _is_es_operator(s: str) -> bool:
    return s in ("AND", "OR", "NOT")


def _has_special_chars(term: str) -> bool:
    """query_validator.rs:126-143: underscore always; mixed case only for
    multi-char terms (single letters are not camelCase)."""
    if "_" in term:
        return True
    if len(term) <= 1:
        return False
    has_upper = any(c.isupper() for c in term)
    has_lower = any(c.islower() for c in term)
    return has_upper and has_lower


def _find_unquoted_special_term(query: str) -> str | None:
    """query_validator.rs:68-119: scan terms outside quotes; parens are
    grouping (not part of a term)."""
    in_quotes = False
    term = ""
    for ch in query:
        if ch == '"':
            in_quotes = not in_quotes
            if not in_quotes:
                term = ""
        elif ch in "()":
            pass
        elif ch == " " and not in_quotes:
            if term and not _is_es_operator(term) and _has_special_chars(term):
                return term
            term = ""
        elif not in_quotes:
            term += ch
    if term and not _is_es_operator(term) and _has_special_chars(term):
        return term
    return None


def validate_strict_elastic_syntax(query: str) -> None:
    """--strict-elastic-syntax pre-validator (query_validator.rs:4-45,
    wired at main.rs:184-185): instead of the parse_query fallback chain
    silently degrading a malformed query to a keyword bag, reject vague
    multi-word queries without explicit AND/OR/NOT and unquoted
    snake_case/camelCase terms with an actionable error.  Raises
    ParseError; returns None when the query is acceptable."""
    query = query.strip()
    if not query:
        raise ParseError("Query cannot be empty")
    words = query.split()
    has_operators = (
        " AND " in query or " OR " in query or " NOT " in query
    )
    fully_quoted = query.startswith('"') and query.endswith('"')
    if len(words) > 1 and not has_operators and not fully_quoted:
        raise ParseError(
            "Vague query format detected. When using"
            " --strict-elastic-syntax:\n"
            "- Use explicit AND/OR operators: (term1 AND term2) OR term3\n"
            '- Wrap exact matches in quotes: "functionName"\n'
            "- Use parentheses for grouping complex queries"
        )
    bad = _find_unquoted_special_term(query)
    if bad is not None:
        raise ParseError(
            f"Term '{bad}' contains special characters (snake_case,"
            " camelCase, etc.) and should be wrapped in quotes.\n"
            f'- For exact match: "{bad}" (with quotes)\n'
            "- For separate keywords: split into individual terms with"
            " AND/OR operators"
        )


FILTER_FIELDS = frozenset(
    [
        "file",
        "path",
        "filename",
        "ext",
        "extension",
        "type",
        "dir",
        "directory",
        "lang",
        "language",
    ]
)  # filters.rs:353-368


# filters.rs:390-427 (common_extensions) -- ported verbatim
_FILENAME_EXTENSIONS = (
    ".txt", ".md", ".rs", ".js", ".ts", ".py", ".java", ".c", ".cpp", ".h",
    ".go", ".json", ".yaml", ".yml", ".toml", ".xml", ".html", ".css",
    ".scss", ".sass", ".sh", ".bash", ".zsh", ".fish", ".rb", ".php",
    ".swift", ".kt", ".scala", ".sql", ".csv", ".log", ".conf", ".config",
    ".env", ".gitignore", ".dockerfile", ".makefile", ".cmake", ".gradle",
    ".properties", ".ini", ".cfg",
)

# filters.rs:444-457 (common_files) -- ported verbatim
_FILENAME_COMMON = (
    "makefile", "dockerfile", "readme", "license", "changelog",
    "contributing", "codeowners", "authors", "notice", "cargo.toml",
    "package.json",
)


def is_filename_like(term: str) -> bool:
    """filters.rs:375-465 (is_filename_like): known extension, dotfile, or
    common filename prefix.  Drives the F2 auto-detect: an unfielded term
    that looks like a filename becomes a filename (url-substring) filter."""
    if not term.strip():
        return False
    t = term.lower()
    if any(t.endswith(ext) for ext in _FILENAME_EXTENSIONS):
        return True
    if term.startswith(".") and "/" not in term and len(term) > 1:
        return True
    return any(t == f or t.startswith(f) for f in _FILENAME_COMMON)


@dataclass
class QueryPlan:
    """query.rs:33-62, minus caches (vectorized eval needs none)."""

    ast: Expr | None
    term_indices: dict[str, int]
    excluded_terms: frozenset[str]
    exact: bool
    is_simple_query: bool
    required_terms: frozenset[str]
    has_required_anywhere: bool
    required_terms_indices: frozenset[int]
    has_only_excluded_terms: bool
    is_universal_query: bool
    special_terms: frozenset[str]
    filters: dict[str, list[str]] = dc_field(default_factory=dict)

    @property
    def terms(self) -> list[str]:
        out = [""] * len(self.term_indices)
        for t, i in self.term_indices.items():
            out[i] = t
        return out


def extract_filters(
    expr: Expr, autodetect: bool = True
) -> tuple[dict[str, list[str]], Expr | None]:
    """filters.rs:205-351 (extract_and_simplify_with_autodetect): field
    filters plus F2 filename auto-detect -- an unfielded, non-required,
    non-excluded term whose RAW (pre-expansion) keywords all look
    filename-like (filters.rs:302-328) becomes a ``filename`` filter (url
    substring on the web schema).  The raw form is used because parse-time
    expansion splits 'main.rs' into tokens."""
    filters: dict[str, list[str]] = {}

    def simplify(e: Expr) -> Expr | None:
        if isinstance(e, Term):
            if e.field is not None and e.field.lower() in FILTER_FIELDS:
                filters.setdefault(e.field.lower(), []).extend(e.keywords)
                return None
            if (
                autodetect
                and e.field is None
                and not e.required
                and not e.excluded
            ):
                raw = e.raw if e.raw is not None else e.keywords
                if raw and all(is_filename_like(kw) for kw in raw):
                    filters.setdefault("filename", []).extend(raw)
                    return None
            return e
        left = simplify(e.left)
        right = simplify(e.right)
        klass = type(e)
        if left is not None and right is not None:
            return klass(left, right)
        return left if left is not None else right

    return filters, simplify(expr)


def collect_required_terms(expr: Expr) -> set[str]:
    """query.rs:236-252 -- Terms under And/top only; nothing under Or."""
    out: set[str] = set()
    if isinstance(expr, Term):
        if expr.required and not expr.excluded:
            out.update(expr.keywords)
    elif isinstance(expr, And):
        out |= collect_required_terms(expr.left)
        out |= collect_required_terms(expr.right)
    return out


def plan_from_index_terms(terms) -> QueryPlan:
    """Implicit-OR bag plan over ALREADY-RESOLVED index terms (the
    more-like-this support path): parse-time expansion/stemming is skipped
    because the terms come from the index's own vocabulary, not from user
    input -- feeding them back through the parser would re-stem them into
    forms a simple-tokenizer index never stored.  For the same reason the
    terms are NOT case-folded here: a case-preserving simple-tokenizer
    index stores mixed-case vocabulary, and lowering a resolved term
    would silently score zero postings (probe-tokenizer vocabularies are
    already lowercase, so this is a no-op for them)."""
    uniq = sorted({t for t in terms if t})
    if not uniq:
        raise ParseError("plan_from_index_terms: no terms")
    ast: Expr | None = None
    for t in uniq:
        node: Expr = Term(keywords=(t,), resolved=True)
        ast = node if ast is None else Or(ast, node)
    return QueryPlan(
        ast=ast,
        term_indices={t: i for i, t in enumerate(uniq)},
        excluded_terms=frozenset(),
        exact=False,
        is_simple_query=isinstance(ast, Term),
        required_terms=frozenset(),
        has_required_anywhere=False,
        required_terms_indices=frozenset(),
        has_only_excluded_terms=False,
        is_universal_query=False,
        special_terms=frozenset(),
        filters={},
    )


def create_query_plan(query: str, exact: bool = False) -> QueryPlan:
    """query.rs:94-227 + filter extraction (search_runner.rs:392-411)."""
    ast, special = parse_query(query, exact)
    if exact:
        ast = update_exact(ast)

    filters, simplified = extract_filters(ast)

    if simplified is None:
        # universal query: all terms were filters (query.rs:858-889)
        return QueryPlan(
            ast=None,
            term_indices={},
            excluded_terms=frozenset(),
            exact=exact,
            is_simple_query=False,
            required_terms=frozenset(),
            has_required_anywhere=False,
            required_terms_indices=frozenset(),
            has_only_excluded_terms=False,
            is_universal_query=True,
            special_terms=special,
            filters=filters,
        )

    all_terms: list[str] = []
    excluded: set[str] = set()
    for t in walk_terms(simplified):
        all_terms.extend(t.lowercase_keywords)
        if t.excluded:
            excluded.update(t.lowercase_keywords)
    all_terms = sorted(set(all_terms))
    if len(all_terms) > 256:
        # ranking.rs:164-184 -- u8 query-token map limit, kept as validation
        raise ParseError("Query exceeds the 256 unique token limit")
    term_indices = {t: i for i, t in enumerate(all_terms)}

    required = collect_required_terms(simplified)
    is_simple = (
        isinstance(simplified, Term)
        and not simplified.excluded
        and len(all_terms) == 1
    )
    return QueryPlan(
        ast=simplified,
        term_indices=term_indices,
        excluded_terms=frozenset(excluded),
        exact=exact,
        is_simple_query=is_simple,
        required_terms=frozenset(required),
        has_required_anywhere=has_required_term(simplified),
        required_terms_indices=frozenset(
            term_indices[t] for t in required if t in term_indices
        ),
        has_only_excluded_terms=is_only_excluded_terms(simplified),
        is_universal_query=False,
        special_terms=special,
        filters=filters,
    )
