"""Ports of reference tokenization/parsing goldens not yet in
test_textkit.py: elastic_query_tokenization_tests.rs and the
tokenize_and_stem suite."""

from probe_spark import textkit as tk
from probe_spark.elastic import Or, Term, parse_query


def test_tokenize_and_stem_reference_goldens():
    """elastic_query_tokenization_tests.rs:47-73."""
    assert tk.tokenize_and_stem("running") == ["run"]
    r = tk.tokenize_and_stem("enableIpWhiteListing")
    for part in ("enabl", "ip", "white", "list"):
        assert part in r, (part, r)
    # "whitelist" is a special-case word: never split
    r = tk.tokenize_and_stem("whitelist")
    assert "whitelist" in r
    assert len(tk.tokenize_and_stem("function")) == 1
    r = tk.tokenize_and_stem("firewall")
    assert len(r) == 1 and r[0] in ("firewall", "firewal")


def test_workflow_should_not_be_split():
    """elastic_query_tokenization_tests.rs:525-538: 'workflow' is an
    exception term and must stay whole."""
    assert tk.is_exception_term("workflow")
    assert tk.tokenize_and_stem("workflow") == ["workflow"]


def test_hyphenated_compound_terms_parsing():
    """elastic_query_tokenization_tests.rs:488-522: 'multi-agent' is ONE
    term tokenized to [multi, agent] -- the '-' inside an identifier is
    not negation."""
    ast, _special = parse_query("multi-agent")
    assert isinstance(ast, Term), ast
    assert set(ast.keywords) == {"multi", "agent"}
    assert len(ast.keywords) == 2

    ast, _special = parse_query("yaml workflow agent multi-agent user input")
    assert isinstance(ast, Or), ast
    # no keyword anywhere may be an excluded 'agent'

    def no_excluded(e):
        if isinstance(e, Term):
            return not e.excluded
        return no_excluded(e.left) and no_excluded(e.right)

    assert no_excluded(ast)


def test_exact_mode_whole_query_single_term():
    """elastic_query.rs:895-908: --exact makes the WHOLE query one exact
    term -- no tokenization, no stemming, no stop-word removal (the
    word-level exact splitting in query_tests.rs:75-105 belongs to the
    pattern-generation path that the index replaces, SURVEY.md Q8)."""
    ast, _ = parse_query("the ip whitelist for security", exact=True)
    assert isinstance(ast, Term)
    assert ast.exact
    assert ast.keywords == ("the ip whitelist for security",)
    # stop words and original words survive inside the exact phrase
    assert "the" in ast.lowercase_keywords[0]
    assert "whitelist" in ast.lowercase_keywords[0]


def test_quoted_exact_term_not_tokenized():
    """elastic_query.rs:791-814: a quoted term stays one keyword, stop
    words preserved."""
    ast, _ = parse_query('"the quick firewall"')
    assert isinstance(ast, Term)
    assert ast.exact
    assert ast.keywords == ("the quick firewall",)


def test_snake_case_upper_identifier_tokenization():
    """query_tests.rs:285-301: ENGLISH_STOP_WORDS ->
    english/stop/word after split+stem."""
    toks = tk.tokenize("ENGLISH_STOP_WORDS")
    for part in ("english", "stop", "word"):
        assert part in toks, (part, toks)


def test_negated_terms_removed_from_content_tokens():
    """query_tests.rs:303+ (negation capture): '-bar' drops bar from the
    tokenize() output."""
    toks = tk.tokenize("foo -bar")
    assert any(t.startswith("foo") for t in toks)
    assert all(not t.startswith("bar") for t in toks)
