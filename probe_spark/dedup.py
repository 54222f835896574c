"""Near-duplicate cluster resolution and scale-guarded pair generation.

The reference engine is search-only; this module supplies the dedup family a
100-TB training-data pipeline needs on top of it (SURVEY.md §2 LLM-pipeline
operators): candidate PAIR generation that cannot go quadratic on
mass-duplicate floods, connected-component CLUSTER resolution over the pair
edges, and canonical-document selection.

Scale guards (all deterministic, oracle-mirrorable):

* **Exact collapse first.**  Docs with identical text (or identical
  signatures) are collapsed to one representative before any banding.  This
  is LOSSLESS for every pair operator here: identical inputs have identical
  shingle sets / signatures, so every collapsed pair's verdict equals its
  representative pair's verdict, and intra-group pairs are trivially
  duplicates (jaccard 1 / hamming 0).  A 10^6-copy duplicate cluster — the
  exact input dedup exists for — therefore contributes ONE row to the band
  join instead of 10^6 rows in one bucket (10^12 candidate pairs).

* **Band-bucket caps.**  After collapse, a band bucket only holds *distinct*
  near-identical inputs.  A residual flood (many distinct docs agreeing on a
  band) is capped at ``BAND_BUCKET_CAP`` representatives per bucket (keep the
  lowest doc_ids — the FineWeb/CCNet-style guard), mirrored in the SQL
  oracles, so worst-case candidate volume per bucket is cap².

* **Lossless sub-banding for SimHash.**  The simhash pair operator's oracle
  is the *exhaustive* hamming<=3 definition, so its guard must not drop
  pairs: oversize band buckets are re-split by a second pigeonhole over the
  remaining 45 bits (4 sub-bands; <=3 differing bits can touch at most 3 of
  them, so one sub-band always matches).  Buckets stay exact AND bounded.

Connected components use min-label propagation: every node repeatedly takes
the minimum label over itself and its neighbours until fixpoint.  Rounds =
graph diameter; LSH near-dup clusters are clique-like (diameter <= 2 — every
member shares a band bucket with the flood's survivors), so 2-3 rounds
close.  For adversarial long-path graphs the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) bounds rounds at O(log² n); propagation is chosen because
dup graphs are dense and each round here is ONE self-join shuffle.  Each
round is localCheckpoint()ed to cut lineage (iterative plans otherwise grow
exponentially in Catalyst).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# max representatives considered per band bucket after exact collapse; the
# residual guard against floods of *distinct* near-identical docs.  Small
# test corpora never hit it (max observed bucket at sf0.1 is 13 reps for
# minhash); the skew suite overrides it to exercise the cap path.
BAND_BUCKET_CAP = int(os.environ.get("PROBE_SPARK_BUCKET_CAP", "100"))


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Connected components over undirected ``edges`` (columns src, dst)
    covering ``nodes`` (column node).  Returns (node, cluster_id) where
    cluster_id = min node id in the component; isolated nodes get their own
    id.  Min-label propagation, one shuffle per round, O(diameter) rounds
    (see module docstring for why that is small for dedup graphs).

    Raises RuntimeError if ``max_iter`` rounds pass without convergence
    (a silent unconverged return would be *wrong* labels -- plausible for
    pathological long near-dup chains at scale, and would diverge from the
    exhaustive oracle with no error signal)."""
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    und = und.localCheckpoint(eager=True)
    labels = nodes.select(
        F.col("node").cast("long").alias("node"), F.col("node").cast("long").alias("label")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        # candidate labels flowing across edges: neighbour u offers its
        # current label to v for every edge (u, v)
        offers = und.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = (
            labels.unionByName(offers)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; component diameter exceeds the budget. Re-run with a "
            "larger max_iter (rounds are O(diameter); each is one shuffle)."
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------------------
# Exact collapse
# ---------------------------------------------------------------------------


def exact_member_map(docs: DataFrame, key=None) -> DataFrame:
    """(doc_id, rep): rep = min doc_id among docs with identical text (or
    identical ``key`` expression).  The lossless pre-pass for every pair
    operator (see module docstring)."""
    key = F.md5("text") if key is None else key
    k = docs.select("doc_id", key.alias("k"))
    w = Window.partitionBy("k")
    return k.select("doc_id", F.min("doc_id").over(w).alias("rep"))


def _rep_docs(docs: DataFrame, memb: DataFrame) -> DataFrame:
    reps = memb.filter(F.col("doc_id") == F.col("rep")).select("doc_id")
    return docs.join(reps, "doc_id")


# ---------------------------------------------------------------------------
# MinHash banded pairs (collapse + cap + verify + expand)
# ---------------------------------------------------------------------------

SHINGLE_N = 3
MINHASH_N = 8  # 4 bands x 2 rows


def _shingles(docs: DataFrame, n: int = SHINGLE_N) -> DataFrame:
    arr = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    # explode_outer + not-null: plain explode lets InferFiltersFromGenerate
    # inline the computed child into a pre-Generate filter that re-evaluates
    # split() per row (see entry_queries._explode_nn)
    idx = arr.select(
        "doc_id",
        F.explode_outer(F.sequence(F.lit(0), F.size("w") - n)).alias("i"),
        "w",
    ).where(F.col("i").isNotNull())
    return idx.select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("w"), F.col("i") + 1, n)).alias("shingle"),
    ).distinct()


def minhash_signature_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, b0..b3): md5-derived 8-minhash signature folded into 4 LSH
    bands of 2 rows each."""
    sh = _shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(MINHASH_N)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        *[
            F.md5(F.concat(F.col(f"mh{2 * i}"), F.col(f"mh{2 * i + 1}"))).alias(f"b{i}")
            for i in range(MINHASH_N // 2)
        ],
    )


def minhash_rep_pairs(
    rep_docs: DataFrame, threshold: float = 0.5, cap: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, jaccard) among ``rep_docs`` (already exact-collapsed):
    banded candidate generation with a per-bucket cap, exact-Jaccard verify
    on candidates only."""
    cap = BAND_BUCKET_CAP if cap is None else cap
    bands = minhash_signature_bands(rep_docs)
    sh = _shingles(rep_docs)
    cand = None
    for i in range(MINHASH_N // 2):
        w = Window.partitionBy(f"b{i}").orderBy("doc_id")
        kept = (
            bands.select("doc_id", f"b{i}")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .drop("rn")
        )
        p = (
            kept.alias("x")
            .join(kept.alias("y"), F.col(f"x.b{i}") == F.col(f"y.b{i}"))
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
            )
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def expand_rep_pairs(
    rep_pairs: DataFrame, memb: DataFrame, intra_value, value_col: str
) -> DataFrame:
    """Expand representative-level pairs back to document-level pairs via
    the exact-collapse membership map: cross pairs between two groups carry
    the representatives' value (identical inputs ⇒ identical verdicts);
    intra-group pairs get ``intra_value`` (jaccard 1 / hamming 0)."""
    ma = memb.select(F.col("doc_id").alias("da"), F.col("rep").alias("doc_a"))
    mb = memb.select(F.col("doc_id").alias("db"), F.col("rep").alias("doc_b"))
    cross = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            value_col,
        )
    )
    intra = (
        memb.alias("a")
        .join(memb.alias("b"), F.col("a.rep") == F.col("b.rep"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.lit(intra_value).alias(value_col),
        )
    )
    return cross.unionByName(intra)


def minhash_pairs(
    docs: DataFrame, threshold: float = 0.5, cap: int | None = None
) -> DataFrame:
    """Document-level near-dup pairs (doc_a, doc_b, jaccard >= threshold):
    exact collapse → banded rep pairs (capped buckets) → expand."""
    memb = exact_member_map(docs)
    rp = minhash_rep_pairs(_rep_docs(docs, memb), threshold, cap)
    return expand_rep_pairs(rp, memb, 1.0, "jaccard")


# ---------------------------------------------------------------------------
# SimHash pairs (signature collapse + lossless sub-banded buckets)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 15 bits each; pigeonhole-lossless at hamming <= 3
# the remaining 45 bits split 12/11/11/11 for the second pigeonhole level
_SUB_SPLITS = ((0, 12), (12, 11), (23, 11), (34, 11))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit distinct-term-weighted simhash, computed in
    ONE vectorized mapInPandas pass (numpy bit matrix) — no 60× row
    explosion before the shuffle.  Bit-identical to the long-format
    definition (DEDUP_SIMHASH_SQL): h(term) = first 15 md5 hex chars as
    int, bit b set iff sum over distinct terms of ±1 votes > 0."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("simhash", LongType())]
    )

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        hcache: dict[str, int] = {}

        def h(t: str) -> int:
            v = hcache.get(t)
            if v is None:
                v = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                hcache[t] = v
            return v

        shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for row, text in enumerate(pdf["text"]):
                terms = {t for t in (text or "").split(" ") if t}
                hs = np.fromiter(
                    (h(t) for t in terms), dtype=np.uint64, count=len(terms)
                )
                # votes[b] = (#set bits) - (#unset) = 2*set - n; > 0 ⇔ bit on
                bits = (hs[:, None] >> shifts) & np.uint64(1)
                votes = 2 * bits.sum(axis=0).astype(np.int64) - len(terms)
                out[row] = int(((votes > 0) << shifts).sum())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(run, schema)


def simhash_rep_pairs(
    sig: DataFrame, max_hamming: int = 3, cap: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, hamming) over (doc_id, simhash) rows with DISTINCT
    signatures: 4×15-bit bands; buckets larger than ``cap`` are re-split by
    a second pigeonhole over the remaining 45 bits (lossless at
    hamming <= 3, see module docstring), so the output is EXACTLY the set
    of pairs within ``max_hamming`` regardless of cap."""
    cap = BAND_BUCKET_CAP if cap is None else cap
    bands = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"CAST((simhash >> {15 * i}) & 32767 AS INT)")
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bi", "bv"),
    )
    w = Window.partitionBy("bi", "bv")
    bands = bands.withColumn("bsz", F.count(F.lit(1)).over(w)).localCheckpoint(
        eager=True
    )
    small = bands.filter(F.col("bsz") <= cap)
    cand = (
        small.alias("x")
        .join(small.alias("y"), ["bi", "bv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    big = bands.filter(F.col("bsz") > cap)
    # remaining 45 bits once band bi is removed, as a packed value
    rem = F.expr(
        "CAST(shiftleft(shiftright(simhash, (bi + 1) * 15), bi * 15) AS BIGINT)"
        " | (simhash & (shiftleft(CAST(1 AS BIGINT), bi * 15) - 1))"
    )
    sub = big.withColumn("rem", rem).select(
        "doc_id",
        "bi",
        "bv",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"CAST((rem >> {off}) & {(1 << width) - 1} AS INT)")
                    for off, width in _SUB_SPLITS
                ]
            )
        ).alias("sj", "sv"),
    )
    cand_big = (
        sub.alias("x")
        .join(sub.alias("y"), ["bi", "bv", "sj", "sv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    cand = cand.unionByName(cand_big).distinct()
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("ha ^ hb")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, cap: int | None = None
) -> DataFrame:
    """Document-level simhash pairs (doc_a, doc_b, hamming <= max_hamming),
    exactly the exhaustive all-pairs definition: signature collapse (docs
    with identical simhash → one representative; a mass-duplicate flood is
    ONE band row) → sub-banded rep pairs → expand (cross pairs inherit the
    rep hamming — signatures are equal within a group — intra pairs are
    hamming 0)."""
    sig = simhash_signatures(docs).localCheckpoint(eager=True)
    w = Window.partitionBy("simhash")
    memb = sig.select("doc_id", F.min("doc_id").over(w).alias("rep"))
    rep_sig = (
        sig.join(
            memb.filter(F.col("doc_id") == F.col("rep")).select("doc_id"), "doc_id"
        )
    )
    rp = simhash_rep_pairs(rep_sig, max_hamming, cap)
    return expand_rep_pairs(rp, memb, 0, "hamming").select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Embedding LSH pairs (capped buckets, oracle mirrors the cap)
# ---------------------------------------------------------------------------


def lsh_band_signatures(
    emb: DataFrame, n_planes: int = 24, r: int = 6
) -> DataFrame:
    """(vec_id, bi, bv) hyperplane-LSH band values in ONE vectorized
    mapInPandas pass: the whole Arrow batch of embeddings is projected onto
    all ``n_planes`` deterministic integer hyperplanes with a single numpy
    matmul (w[p,i] = (i*31 + p*17) % 7 - 3, the same weights as the
    long-format SQL oracle), then sign bits fold into bands of ``r`` bits.
    Replaces the posexplode -> plane-join -> groupBy pipeline (64 rows +
    one shuffle per vector) with a map-only projection -- the projection is
    embarrassingly parallel; only the band agg that FOLLOWS it needs a
    shuffle.  The long form survives only in the SQL oracle."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("bi", IntegerType()),
            StructField("bv", LongType()),
        ]
    )
    n_bands = n_planes // r

    def run(batches):
        import numpy as np
        import pandas as pd

        P = np.arange(n_planes)
        shifts = 1 << (P % r)
        w_cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            dim = E.shape[1]  # dimension-agnostic, like the long-form oracle
            W = w_cache.get(dim)
            if W is None:
                I = np.arange(dim)
                W = ((I[None, :] * 31 + P[:, None] * 17) % 7 - 3).astype(
                    np.float64
                )
                w_cache[dim] = W
            vals = ((E @ W.T) > 0).astype(np.int64) * shifts
            bvm = np.stack(
                [
                    vals[:, b * r : (b + 1) * r].sum(axis=1)
                    for b in range(n_bands)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(np.int64), n_bands
                    ),
                    "bi": np.tile(np.arange(n_bands, dtype=np.int32), n),
                    "bv": bvm.reshape(-1),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(run, schema)


def incremental_dedup(
    snapshot: DataFrame,
    batch: DataFrame,
    m_bits: int = 1 << 18,
    k_hashes: int = 6,
) -> DataFrame:
    """Incremental exact dedup of a new crawl batch against an existing
    corpus snapshot via a Bloom-filter prefilter with an exact repair pass
    -- the Dolma "BFF" (Bloom Filter Filtering) pattern, made EXACT: the
    bloom's false positives are repaired by an anti-join over only the
    bloom-positive rows, and bloom false negatives are impossible, so the
    result equals the plain anti-join on md5(text) bit for bit (which is
    exactly what the DuckDB oracle computes -- no banding mirror needed).

    Everything stays JVM-side: the "bloom" is a DataFrame of the DISTINCT
    set bit positions (bounded by min(k*|snapshot|, m_bits) rows
    regardless of corpus size), derived from k 5-hex-digit slices of each
    snapshot doc's md5 -- built once per snapshot and broadcast; the batch
    explodes the same k positions map-side and left-joins the broadcast
    bit table; a doc is bloom-positive iff all k positions hit.
    Bloom-negative docs are provably new and keep WITHOUT ANY SHUFFLE of
    the batch side; only the positives (true dups + the (1-e^(-kn/m))^k
    false-positive sliver) shuffle into the exact md5 anti-join.

    Scale plan (1e12-doc snapshot): a single broadcast bloom saturates --
    shard the bit table by md5-prefix bucket exactly like the postings
    buckets (indexer.py bucket-as-salt layout) so each executor joins only
    its bucket's slice, and size m_bits per bucket; the snapshot-side bit
    table is persisted with the corpus and incrementally OR-ed (unioned)
    as batches commit, so steady-state cost is ONE scan of each new batch
    plus a dup-sized shuffle.

    Returns the kept batch rows as (doc_id, h=md5(text))."""
    def positions(col):
        return F.array(
            *[
                (
                    F.conv(F.substring(col, 1 + 5 * j, 5), 16, 10).cast(
                        "long"
                    )
                    % m_bits
                ).alias(f"p{j}")
                for j in range(k_hashes)
            ]
        )

    snap_h = snapshot.select(F.md5("text").alias("h"))
    batch_h = batch.select("doc_id", F.md5("text").alias("h"))
    bits = (
        snap_h.select(F.explode(positions(F.col("h"))).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # probed feeds BOTH the fresh and candidate branches: without a
    # persist the whole probe pipeline (bit-table build + broadcast +
    # batch groupBy shuffle) executes twice -- verified on the physical
    # plan (no exchange reuse across the two filters).  Persist once,
    # checkpoint the batch-sized answer, release the cache.
    probed = (
        batch_h.select("doc_id", "h", F.explode(positions(F.col("h"))).alias("pos"))
        .join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "h")
        .agg(F.count("hit").alias("n_hit"))
        .persist()
    )
    fresh = probed.filter(F.col("n_hit") < k_hashes).select("doc_id", "h")
    candidates = probed.filter(F.col("n_hit") == k_hashes).select(
        "doc_id", "h"
    )
    survivors = candidates.join(snap_h, "h", "left_anti").select("doc_id", "h")
    result = fresh.unionByName(survivors)
    try:
        return result.localCheckpoint(eager=True)
    finally:
        probed.unpersist()


def capped_bands(bands: DataFrame, id_col: str = "vec_id", cap: int | None = None) -> DataFrame:
    """Keep the ``cap`` lowest ids per (bi, bv) band bucket — the lossy
    residual flood guard for operators whose oracle mirrors the banding."""
    cap = BAND_BUCKET_CAP if cap is None else cap
    w = Window.partitionBy("bi", "bv").orderBy(id_col)
    return (
        bands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
