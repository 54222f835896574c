"""Query parser + boolean evaluation parity tests.

Goldens ported from /root/reference/src/search/elastic_query_tests.rs and
elastic_query_evaluate_tests.rs.
"""

import pytest

from probe_spark import elastic
from probe_spark.elastic import And, Or, Term, create_query_plan, evaluate, parse_query


def term(*kws, **kw):
    return Term(keywords=tuple(kws), **kw)


def req(*kws):
    return Term(keywords=tuple(kws), required=True)


def exc(*kws):
    return Term(keywords=tuple(kws), excluded=True)


def parse(q):
    ast, _ = parse_query(q)
    return ast


# --- parse shape goldens (elastic_query_tests.rs:183-330) ------------------

def test_single_terms():
    assert parse("foo") == term("foo")
    assert parse("+foo") == req("foo")
    assert parse("-foo") == exc("foo")


def test_multiple_terms_implicit_combinations():
    assert parse("foo bar") == Or(term("foo"), term("bar"))
    assert parse("+foo bar") == Or(req("foo"), term("bar"))
    assert parse("+foo bar baz") == Or(Or(req("foo"), term("bar")), term("baz"))
    assert parse("+foo +bar") == And(req("foo"), req("bar"))
    assert parse("+foo -bar") == And(req("foo"), exc("bar"))
    assert parse("-foo bar baz") == Or(Or(exc("foo"), term("bar")), term("baz"))


def test_explicit_boolean_operators():
    assert parse("foo AND bar") == And(term("foo"), term("bar"))
    assert parse("foo OR bar") == Or(term("foo"), term("bar"))
    # AND binds tighter than OR
    assert parse("foo AND bar OR baz") == Or(
        And(term("foo"), term("bar")), term("baz")
    )
    assert parse("foo OR bar AND baz") == Or(
        term("foo"), And(term("bar"), term("baz"))
    )
    assert parse("+foo AND -bar") == And(req("foo"), exc("bar"))
    assert parse("foo bar OR baz") == Or(Or(term("foo"), term("bar")), term("baz"))


def test_parentheses():
    assert parse("(foo)") == term("foo")
    assert parse("(foo AND bar)") == And(term("foo"), term("bar"))
    assert parse("(foo) OR (bar)") == Or(term("foo"), term("bar"))
    assert parse("(+foo -bar baz)") == Or(
        And(req("foo"), exc("bar")), term("baz")
    )
    # "timeout" -> precomputed split (time,out), "out" is a stopword;
    # "deadline" -> decompound (dead,line) -- reference tables at work
    assert parse("(timeout OR deadline) AND retry") == And(
        Or(term("time"), term("dead", "line")), term("retri")
    )


def test_quoted_exact_terms():
    ast = parse('"parseJSONToHTML5"')
    assert ast == Term(keywords=("parseJSONToHTML5",), exact=True)
    # quoted terms skip tokenization entirely
    ast = parse('"error handling"')
    assert ast == Term(keywords=("error handling",), exact=True)


def test_excluded_terms_not_tokenized():
    # excluded keywords are kept whole (elastic_query.rs:791-796)
    ast = parse("-deprecated")
    assert ast == Term(keywords=("deprecated",), excluded=True)
    # vs optional terms, which are tokenized+stemmed
    ast = parse("deprecated")
    assert ast == term("deprec")


def test_term_expansion_through_tokenizer():
    # camelCase query terms expand via the content tokenizer
    ast = parse("parseJSONToHTML5")
    assert isinstance(ast, Term)
    assert set(ast.keywords) == {"pars", "json", "html"}
    # stopword-only term expands to empty keywords
    ast = parse("the AND for")
    assert ast == And(term(), term())


def test_field_terms():
    ast = parse("lang:de firewall")
    assert isinstance(ast, Or)
    assert ast.left == Term(keywords=("de",), field="lang")
    assert set(ast.left.lowercase_keywords) == {"de"}
    assert set(ast.right.keywords) == {"firewall", "firewal"}


def test_namespace_rejoin():
    # ns::path::parts re-joined then tokenized (elastic_query.rs:845-864)
    ast = parse("std::collections::HashMap")
    assert isinstance(ast, Term)
    assert "std" in ast.keywords
    assert "collect" in ast.keywords  # stemmed "collections"
    # "map" is a programming stopword (Go keyword) and is filtered
    assert "hash" in ast.keywords and "map" not in ast.keywords


def test_special_terms_registration():
    _, special = parse_query('+retry -"error handling"')
    assert "error handling" in special
    _, special = parse_query('"keywordAlpha" -keywordGamma')
    assert special == frozenset({"keywordalpha", "keywordgamma"})


def test_lexer_fallback_raises_on_empty():
    # all-symbol input: lexer yields no tokens -> cleaned fallback empty ->
    # ParseError (elastic_query.rs:930-947)
    with pytest.raises(elastic.ParseError):
        parse_query("@ ! ^")


def test_exact_flag_query():
    ast, special = parse_query("error handling", exact=True)
    assert ast == Term(keywords=("error handling",), exact=True)


# --- evaluate goldens (elastic_query_evaluate_tests.rs) --------------------

def ev(expr, matched, indices, ignore_negatives=False):
    return evaluate(expr, frozenset(matched), indices, ignore_negatives)


def test_evaluate_simple_terms():
    idx = {"foo": 0, "bar": 1}
    assert ev(term("foo"), {0}, idx)
    assert not ev(term("foo"), {1}, idx)
    assert not ev(term("foo"), set(), idx)
    # excluded term: true when absent... but empty matched + only-excluded
    assert ev(exc("foo"), {1}, idx)
    assert not ev(exc("foo"), {0}, idx)


def test_evaluate_and_or():
    idx = {"foo": 0, "bar": 1, "baz": 2}
    e = And(term("foo"), term("bar"))
    assert ev(e, {0, 1}, idx)
    assert not ev(e, {0}, idx)
    e = Or(term("foo"), term("bar"))
    assert ev(e, {0}, idx)
    assert ev(e, {1}, idx)
    assert not ev(e, {2}, idx)


def test_required_first_rule():
    # Lucene semantics: required terms gate everything, even under OR
    # (elastic_query.rs:109-146, test_required_term_in_or_bug)
    idx = {"foo": 0, "bar": 1}
    e = Or(req("foo"), term("bar"))
    assert not ev(e, {1}, idx)  # bar present but required foo missing
    assert ev(e, {0}, idx)
    assert ev(e, {0, 1}, idx)


def test_optional_any_keyword_rule():
    # multi-keyword optional Term matches if ANY keyword present when no
    # required terms exist (elastic_query.rs:221-234)
    idx = {"repositori": 0, "repository": 1}
    e = term("repository", "repositori")
    assert ev(e, {0}, idx)
    assert ev(e, {1}, idx)
    assert not ev(e, set(), idx)


def test_required_multi_keyword_all_present():
    idx = {"pars": 0, "json": 1}
    e = Term(keywords=("pars", "json"), required=True)
    assert ev(e, {0, 1}, idx)
    assert not ev(e, {0}, idx)


def test_excluded_with_ignore_negatives():
    idx = {"foo": 0, "bar": 1}
    e = And(term("foo"), exc("bar"))
    assert ev(e, {0, 1}, idx, ignore_negatives=True)
    assert not ev(e, {0, 1}, idx, ignore_negatives=False)


def test_only_excluded_empty_matched():
    idx = {"foo": 0}
    assert ev(exc("foo"), set(), idx)


# --- query plan (query.rs:94-227) ------------------------------------------

def test_plan_term_indices_sorted_dedup():
    plan = create_query_plan("error AND handling error")
    assert plan.terms == sorted(plan.terms)
    assert len(set(plan.terms)) == len(plan.terms)


def test_plan_required_terms():
    plan = create_query_plan("+error +handler")
    assert plan.required_terms == frozenset({"error", "handler", "handl"}) or (
        "error" in plan.required_terms
    )
    assert plan.has_required_anywhere
    # required terms under OR are not collected (query.rs:248-252)
    plan = create_query_plan("(+error) OR handler")
    assert plan.has_required_anywhere
    assert plan.required_terms == frozenset()


def test_plan_excluded():
    plan = create_query_plan("process -deprecated")
    assert plan.excluded_terms == frozenset({"deprecated"})
    assert not plan.has_only_excluded_terms
    plan = create_query_plan("-deprecated")
    assert plan.has_only_excluded_terms


def test_plan_simple_query():
    assert create_query_plan("retry").is_simple_query
    assert not create_query_plan("error handling").is_simple_query


def test_plan_universal_query():
    plan = create_query_plan("lang:de")
    assert plan.is_universal_query
    assert plan.filters == {"lang": ["de"]}


def test_plan_filter_extraction():
    plan = create_query_plan("lang:de firewall")
    assert plan.filters == {"lang": ["de"]}
    assert plan.ast is not None
    assert not plan.is_universal_query
    assert "firewall" in plan.term_indices


def test_plan_256_limit():
    q = " ".join(f"uniqterm{i}xx" for i in range(300))
    with pytest.raises(elastic.ParseError):
        create_query_plan(q)


def test_filename_autodetect():
    """F2 (filters.rs:302-328): unfielded filename-like terms become
    filename filters using the RAW (pre-expansion) keyword."""
    from probe_spark.elastic import create_query_plan

    plan = create_query_plan("main.rs error")
    assert plan.filters.get("filename") == ["main.rs"]
    assert list(plan.term_indices) == ["error"]

    # all terms filename-like -> universal (filters-only) query
    # ("readme" is itself filename-like, filters.rs:444-457 common files)
    plan = create_query_plan("config.yaml readme")
    assert plan.is_universal_query
    assert plan.filters.get("filename") == ["config.yaml", "readme"]

    # required/excluded terms are never auto-detected (filters.rs:313)
    plan = create_query_plan("+main.rs error")
    assert "filename" not in plan.filters
    assert "main" in plan.term_indices

    # non-filename dotted tokens stay search terms
    plan = create_query_plan("v1.2.3 error")
    assert "filename" not in plan.filters


def test_lang_alias_normalization_oracle():
    """lang:rs == lang:rust in both value and label position
    (search_runner.rs:1904-1921)."""
    from probe_spark.elastic import create_query_plan
    from probe_spark.oracle import CorpusIndex, Doc, search

    docs = [
        Doc(0, "https://a/x", "firewall rules and zones", "rust"),
        Doc(1, "https://b/y", "firewall config", "rs"),
        Doc(2, "https://c/z", "firewall errors", "python"),
    ]
    ix = CorpusIndex.build(docs)
    for q in ("lang:rs firewall", "lang:rust firewall"):
        got = {d for d, _ in search(ix, q, 10)}
        assert got == {0, 1}, q
    plan = create_query_plan("lang:rs firewall")
    assert plan.filters["lang"] == ["rs"]
