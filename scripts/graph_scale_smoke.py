"""Scale smoke for the web-graph operators (default 1M nodes / ~6M
edges, 200x the sf0.1 gate; pass an argv node count for larger rungs,
e.g. 10_000_000 for the 10M/~60M-edge rung): run PageRank, HITS and
triangle counting on a synthesized doc table, checking mass-conservation
invariants and the hub structure the fixture guarantees.  Evidence for
the 100x question: the same plans that hash-match DuckDB at 5k docs
execute unchanged at each rung."""

import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from probe_spark.entry_queries import (  # noqa: E402
    graph_hits,
    graph_pagerank,
    graph_triangles,
)
from probe_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SF = "/tmp/graph_smoke_sf"

spark = get_spark("graph_smoke")
spark.sparkContext.setLogLevel("ERROR")

spark.range(N).selectExpr(
    "id AS doc_id",
    "'w' AS text",
    "'en' AS lang",
    "'web' AS source",
    "CAST(1 AS INT) AS n_chars",
).write.mode("overwrite").parquet(f"{SF}/documents.parquet")

t0 = time.time()
pr = graph_pagerank(spark, SF)
n = pr.count()
el = time.time() - t0
tot = pr.agg(F.sum("pr_ppb")).collect()[0][0]
top = pr.orderBy(F.desc("pr_ppb")).limit(3).collect()
print(
    f"pagerank  {N} nodes: {el:6.1f}s rows={n} mass_ppb={tot} "
    f"(floor loss {1_000_000_000 - tot}) top={[(r['node'], r['pr_ppb']) for r in top]}"
)
assert n == N
assert 0.9 * 1_000_000_000 <= tot <= 1_000_000_000
assert all(r["node"] < 10 for r in top), "mega-hubs must top PageRank"

t0 = time.time()
h = graph_hits(spark, SF)
n = h.count()
el = time.time() - t0
sums = h.agg(F.sum("hub_ppb"), F.sum("auth_ppb")).collect()[0]
topa = h.orderBy(F.desc("auth_ppb")).limit(3).collect()
print(
    f"hits      {N} nodes: {el:6.1f}s rows={n} hub_mass={sums[0]} "
    f"auth_mass={sums[1]} top_auth={[(r['node'], r['auth_ppb']) for r in topa]}"
)
assert n == N
assert 0.99 * 1_000_000_000 <= sums[0] <= 1_000_000_000
assert 0.99 * 1_000_000_000 <= sums[1] <= 1_000_000_000
assert all(r["node"] < 10 for r in topa), "mega-hubs must top authority"

t0 = time.time()
tri = graph_triangles(spark, SF)
n = tri.count()
el = time.time() - t0
tot_tri = tri.agg(F.sum("n_triangles")).collect()[0][0]
print(
    f"triangles {N} nodes: {el:6.1f}s nodes_with_triangles={n} "
    f"corner_credits={tot_tri} (triangles={tot_tri // 3})"
)
assert tot_tri % 3 == 0 and tot_tri > 0

print("SCALE SMOKE OK")
