"""Web-graph operators: degree, integer-ppb PageRank, anchor text.

All three entries are under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed degrees and an INDEPENDENT pure-Python integer
PageRank against the Spark implementation on a 5-node fixture, so a
regression in either the edge synthesis or the integer update rule is
caught without the oracle.
"""

from __future__ import annotations

import pandas as pd

from probe_spark.entry_queries import (
    _PR_BASE,
    _PR_ITERS,
    _PR_ONE,
    graph_anchor_text,
    graph_degree,
    graph_pagerank,
)

N = 5


def _edges(n: int) -> set[tuple[int, int]]:
    out = set()
    for u in range(n):
        for m, a in ((7, 3), (13, 5), (29, 11)):
            out.add((u, (u * m + a) % n))
    return out


def _py_pagerank(n: int) -> dict[int, int]:
    """Independent integer-ppb PageRank mirroring the documented rule:
    pr0 = 1e9 div N; pr' = (0.15e9 div N) + (85 * sum(pr div outdeg)) div 100."""
    edges = _edges(n)
    outdeg: dict[int, int] = {}
    for u, _v in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = {v: _PR_ONE // n for v in range(n)}
    base = _PR_BASE // n
    for _ in range(_PR_ITERS):
        s = {v: 0 for v in range(n)}
        for u, v in edges:
            s[v] += pr[u] // outdeg[u]
        pr = {v: base + (85 * s[v]) // 100 for v in range(n)}
    return pr


def _write_docs(tmp_path):
    rows = [
        (i, f"w{i} body text", "en", "web", 1) for i in range(N)
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_graph_degree_hand_computed(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        r["node"]: (r["out_deg"], r["in_deg"])
        for r in graph_degree(spark, sf_dir).collect()
    }
    # edges for N=5: 0->{3,0,1} 1->{0,3} 2->{2,1,4} 3->{4,3} 4->{1,2}
    assert got == {0: (3, 2), 1: (2, 3), 2: (3, 2), 3: (2, 3), 4: (2, 2)}
    edges = _edges(N)
    assert sum(o for o, _ in got.values()) == len(edges)
    assert sum(i for _, i in got.values()) == len(edges)


def test_graph_pagerank_matches_independent_integer_impl(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        r["node"]: r["pr_ppb"]
        for r in graph_pagerank(spark, sf_dir).collect()
    }
    assert got == _py_pagerank(N)
    # mass sanity: total stays within integer-floor loss of 1e9
    assert 0.9 * _PR_ONE <= sum(got.values()) <= _PR_ONE


def test_graph_anchor_text_top_anchor_tie_break(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        r["node"]: r.asDict()
        for r in graph_anchor_text(spark, sf_dir).collect()
    }
    # node 1 has inlinks from 0, 2, 4 -> anchors w0, w2, w4: all cnt 1,
    # lexicographic tie-break picks w0
    assert got[1]["n_inlinks"] == 3
    assert got[1]["n_distinct_anchors"] == 3
    assert got[1]["top_anchor"] == "w0"
    assert got[1]["top_anchor_cnt"] == 1
    # node 3 has inlinks from 0, 1, 3 -> top anchor w0 (tie w0/w1/w3)
    assert got[3]["top_anchor"] == "w0"
    # every node's inlink count matches the raw edge list
    edges = _edges(N)
    for v in range(N):
        want = sum(1 for _u, d in edges if d == v)
        if want:
            assert got[v]["n_inlinks"] == want
        else:
            assert v not in got
