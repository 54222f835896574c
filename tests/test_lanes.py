"""Differential suite: lanes.eval_and_score (the vectorized executor-side
scorer) must be BIT-IDENTICAL to the scalar oracle (elastic.evaluate +
oracle.score_expr) -- exact f64 ==, not approx -- on random tf lanes for
every reference query shape (q01-q25) plus edge cases."""

import random

import numpy as np

from probe_spark import elastic
from probe_spark.config import DEFAULT_BM25
from probe_spark.lanes import eval_and_score
from probe_spark.oracle import idf, score_expr
from tests.test_spark_engine import QUERIES


def _scalar(ast, term_indices, tf, dl, avgdl, idfs, params):
    """The exact scalar pipeline the engine used to run per doc."""
    matched = frozenset(term_indices[t] for t in tf if t in term_indices)
    if not elastic.evaluate(ast, matched, term_indices):
        return None
    return score_expr(ast, tf, dl, avgdl, idfs, params)


def _compare(plan, lanes, dl, avgdl, idfs):
    term_indices = dict(plan.term_indices)
    keep, scores = eval_and_score(
        plan.ast, term_indices, lanes, dl, avgdl, idfs, DEFAULT_BM25
    )
    for i in range(len(dl)):
        tf = {t: int(lanes[t][i]) for t in lanes if lanes[t][i] > 0}
        s = _scalar(plan.ast, term_indices, tf, int(dl[i]), avgdl, idfs, DEFAULT_BM25)
        if s is None:
            assert not keep[i], (i, tf)
        else:
            assert keep[i], (i, tf)
            assert scores[i] == s, (i, tf, scores[i], s)


def test_lanes_match_scalar_on_reference_queries():
    rng = random.Random(42)
    n = 200
    checked = 0
    for name, q in QUERIES.items():
        plan = elastic.create_query_plan(q)
        if plan.is_universal_query or not plan.term_indices:
            continue
        terms = list(plan.term_indices)
        avgdl = 37.5
        idfs = {t: idf(1000, rng.randint(0, 900)) for t in terms}
        lanes = {}
        for t in terms:
            lane = np.array(
                [rng.choice((0, 0, 0, 1, 2, 5)) for _ in range(n)],
                dtype=np.int64,
            )
            if lane.any():
                lanes[t] = lane
        dl = np.array([rng.randint(1, 80) for _ in range(n)], dtype=np.int64)
        _compare(plan, lanes, dl, avgdl, idfs)
        checked += 1
    assert checked >= 20


def test_lanes_missing_lanes_and_zero_idf():
    """Keywords with no postings at all (missing lane) and df=0 terms
    (idf 0) must behave like the scalar path."""
    plan = elastic.create_query_plan("+alpha beta AND gamma")
    terms = dict(plan.term_indices)
    n = 50
    rng = random.Random(7)
    lanes = {
        "alpha": np.array([rng.choice((0, 1, 3)) for _ in range(n)], np.int64),
        # "beta" lane missing entirely; gamma present but idf 0
        "gamma": np.array([rng.choice((0, 2)) for _ in range(n)], np.int64),
    }
    dl = np.full(n, 20, dtype=np.int64)
    idfs = {"alpha": idf(100, 5), "beta": idf(100, 10), "gamma": 0.0}
    _compare(plan, lanes, dl, 22.5, idfs)


def test_lanes_avgdl_zero_corpus():
    plan = elastic.create_query_plan("alpha")
    lanes = {"alpha": np.array([1, 0, 2], np.int64)}
    dl = np.zeros(3, dtype=np.int64)
    _compare(plan, lanes, dl, 0.0, {"alpha": 1.0})
