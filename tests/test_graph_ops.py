"""Web-graph + event-flow operators: degree, integer-ppb PageRank, HITS
hubs/authorities, anchor text, triangle counts, in-degree histogram,
transition matrix.

All seven entries are under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed degrees/buckets/tie-breaks and INDEPENDENT
pure-Python integer PageRank + HITS + triangle implementations against the
Spark results on a 5-node fixture, so a regression in either the edge
synthesis or the integer update rules is caught without the oracle.
"""

from __future__ import annotations

import pandas as pd

from probe_spark.entry_queries import (
    _HITS_ITERS,
    _HITS_ONE,
    _PR_BASE,
    _PR_ITERS,
    _PR_ONE,
    events_transition_matrix,
    graph_anchor_text,
    graph_degree,
    graph_hits,
    graph_indegree_histogram,
    graph_pagerank,
    graph_triangles,
)

N = 5


def _edges(n: int) -> set[tuple[int, int]]:
    out = set()
    for u in range(n):
        for t in (
            (u * 7 + 3) % n,
            (u * 13 + 5) % n,
            u % 10,
            u % 100,
            (u + 1) % n,
            (u + 2) % n,
        ):
            out.add((u, t))
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
    # edges for N=5 (hub targets u%10 = u%100 = u are self-loops here):
    # 0->{3,0,1,2} 1->{0,3,1,2} 2->{2,1,3,4} 3->{4,3,0} 4->{1,2,4,0}
    assert got == {0: (4, 4), 1: (4, 4), 2: (4, 4), 3: (3, 4), 4: (4, 3)}
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
    # node 1 has inlinks from 0, 1, 2, 4 -> anchors w0, w1, w2, w4: all
    # cnt 1, lexicographic tie-break picks w0
    assert got[1]["n_inlinks"] == 4
    assert got[1]["n_distinct_anchors"] == 4
    assert got[1]["top_anchor"] == "w0"
    assert got[1]["top_anchor_cnt"] == 1
    # node 3 has inlinks from 0, 1, 2, 3 -> top anchor w0 (4-way tie)
    assert got[3]["top_anchor"] == "w0"
    # every node's inlink count matches the raw edge list
    edges = _edges(N)
    for v in range(N):
        want = sum(1 for _u, d in edges if d == v)
        if want:
            assert got[v]["n_inlinks"] == want
        else:
            assert v not in got


def _py_hits(n: int) -> dict[int, tuple[int, int]]:
    """Independent integer-ppb HITS mirroring the documented rule:
    hub0 = 1e9 div N; auth = L1-renormalized inlink hub sum, hub =
    L1-renormalized outlink auth sum, two iterations."""
    edges = _edges(n)
    hub = {v: _HITS_ONE // n for v in range(n)}
    auth = {v: 0 for v in range(n)}
    for _ in range(_HITS_ITERS):
        a_raw = {v: 0 for v in range(n)}
        for u, v in edges:
            a_raw[v] += hub[u]
        ta = sum(a_raw.values())
        auth = {v: (a_raw[v] * _HITS_ONE) // ta for v in range(n)}
        h_raw = {u: 0 for u in range(n)}
        for u, v in edges:
            h_raw[u] += auth[v]
        th = sum(h_raw.values())
        hub = {u: (h_raw[u] * _HITS_ONE) // th for u in range(n)}
    return {v: (hub[v], auth[v]) for v in range(n)}


def test_graph_hits_matches_independent_integer_impl(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        r["node"]: (r["hub_ppb"], r["auth_ppb"])
        for r in graph_hits(spark, sf_dir).collect()
    }
    assert got == _py_hits(N)
    # L1 normalization: each side's total mass stays within integer-floor
    # loss of 1e9, and the degree asymmetry separates the scores (node 3
    # has out-degree 3 vs 4 elsewhere, node 4 in-degree 3)
    assert 0.99 * _HITS_ONE <= sum(h for h, _ in got.values()) <= _HITS_ONE
    assert 0.99 * _HITS_ONE <= sum(a for _, a in got.values()) <= _HITS_ONE
    assert got[3][0] == min(h for h, _ in got.values())
    assert got[4][1] == min(a for _, a in got.values())


def _py_triangles(n: int) -> dict[int, int]:
    """Independent per-node triangle counts over the canonical (a < b)
    undirected projection of the synthesized edge list."""
    und = {
        (min(u, v), max(u, v)) for u, v in _edges(n) if u != v
    }
    counts: dict[int, int] = {}
    for a, b in und:
        for c in range(n):
            if a < b < c and (b, c) in und and (a, c) in und:
                for x in (a, b, c):
                    counts[x] = counts.get(x, 0) + 1
    return counts


def test_graph_triangles_matches_independent_impl(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        r["node"]: r["n_triangles"]
        for r in graph_triangles(spark, sf_dir).collect()
    }
    # N=5 synthesized graph is the complete graph K5 -> every node sits
    # in C(4,2) = 6 triangles; the independent impl agrees
    assert got == _py_triangles(N)
    assert got == {v: 6 for v in range(N)}


def test_graph_indegree_histogram_buckets(spark, tmp_path):
    sf_dir = _write_docs(tmp_path)
    got = {
        r["log2_bucket"]: r["n_nodes"]
        for r in graph_indegree_histogram(spark, sf_dir).collect()
    }
    # in-degrees for N=5 are 4,4,4,4,3 -> bucket 2 (deg 4) x4, bucket 1
    # (deg 3) x1
    assert got == {2: 4, 1: 1}


def test_events_transition_matrix_tie_break(spark, tmp_path):
    import pandas as pd

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                [
                    "2026-01-01 10:00",  # u1: view
                    "2026-01-01 10:05",  # u1: click
                    "2026-01-01 10:05",  # u1: ts TIE with event 2 ->
                    #                        event_id orders it AFTER
                    "2026-01-01 11:00",  # u2: view
                    "2026-01-01 11:30",  # u2: view
                    "2026-01-01 12:00",  # u2: purchase
                ]
            ).astype("datetime64[us]"),  # Spark rejects NANOS parquet
            "user_id": [1, 1, 1, 2, 2, 2],
            "event_type": [
                "view", "click", "purchase", "view", "view", "purchase",
            ],
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in events_transition_matrix(spark, str(tmp_path)).collect()
    }
    # u1: view->click->purchase (tie resolved by event_id);
    # u2: view->view->purchase
    assert got == {
        ("view", "click"): 1,
        ("click", "purchase"): 1,
        ("view", "view"): 1,
        ("view", "purchase"): 1,
    }


def test_graph_reciprocal_brute_force(spark, tmp_path):
    from probe_spark.entry_queries import graph_reciprocal

    sf_dir = _write_docs(tmp_path)
    edges = {(u, v) for u, v in _edges(N) if u != v}
    out_deg = {u: sum(1 for a, _ in edges if a == u) for u, _ in edges}
    n_recip = {
        u: sum(1 for a, b in edges if a == u and (b, a) in edges)
        for u in out_deg
    }
    got = {
        r["node"]: (r["out_deg"], r["n_recip"], r["recip_ppm"])
        for r in graph_reciprocal(spark, sf_dir).collect()
    }
    assert got == {
        u: (out_deg[u], n_recip[u], n_recip[u] * 1_000_000 // out_deg[u])
        for u in out_deg
    }
    # the fixture exercises both reciprocated and one-way edges
    assert any(n for n in n_recip.values()) and any(
        n_recip[u] < out_deg[u] for u in out_deg
    )


def test_events_bot_flags_hand_computed(spark, tmp_path):
    import pandas as pd

    from probe_spark.entry_queries import (
        _BOT_MIN_EVENTS,
        _BOT_MIN_GAP_US,
        events_bot_flags,
    )

    # u1: sustained volume + one 1-second burst gap -> bot
    # u2: same volume, every gap 10 min -> not a bot (no burst)
    # u3: burst-fast but only 3 events -> not a bot (volume)
    rows = []
    eid = 0
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(_BOT_MIN_EVENTS):
        rows.append((eid, t0 + pd.Timedelta(minutes=10 * i), 1, "view"))
        eid += 1
    rows.append((eid, t0 + pd.Timedelta(minutes=10 * (_BOT_MIN_EVENTS - 1), seconds=1), 1, "view"))
    eid += 1
    for i in range(_BOT_MIN_EVENTS + 1):
        rows.append((eid, t0 + pd.Timedelta(minutes=10 * i), 2, "view"))
        eid += 1
    for i in range(3):
        rows.append((eid, t0 + pd.Timedelta(seconds=i), 3, "view"))
        eid += 1
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    # micros, not pandas-default nanos: Spark rejects TIMESTAMP(NANOS)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = 0.0
    ev["props"] = "{}"
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    got = {
        r["user_id"]: r for r in events_bot_flags(spark, str(tmp_path)).collect()
    }
    assert got[1]["is_bot"] and got[1]["min_gap_us"] == 1_000_000
    assert got[1]["n_events"] == _BOT_MIN_EVENTS + 1
    assert got[1]["span_us"] == 10 * (_BOT_MIN_EVENTS - 1) * 60_000_000 + 1_000_000
    assert not got[2]["is_bot"] and got[2]["min_gap_us"] == 600_000_000
    assert got[2]["min_gap_us"] >= _BOT_MIN_GAP_US
    assert not got[3]["is_bot"] and got[3]["min_gap_us"] == 1_000_000
    assert got[3]["n_events"] == 3
