"""Segment-pruned top-k scoring over compressed posting blocks (WAND-style).

Stage 4 of the build plan (SURVEY.md SS7.5).  Distributed adaptation of
block-max WAND: the reference prunes with a two-stage ranker + batched early
termination (SURVEY.md R4/R6); a sequential doc-at-a-time WAND does not map
onto Spark's execution model, so pruning happens at segment granularity
(8192-doc aligned ranges, compaction.py) with block-max metadata:

  phase 0  per-seg upper bound = sum over query terms of max block ub
  phase 1  score the top-S segments by upper bound -> threshold theta =
           k-th best score found (a LOWER bound on the true k-th score)
  phase 2  score only the remaining segments with ub_seg >= theta
  merge    exact top-k by (score desc, doc_id asc)

Correct for disjunctive (OR-bag) queries: a doc in a pruned segment scores
<= ub_seg < theta <= true k-th score, so it cannot enter the top-k.  Ties at
theta live in un-pruned segments and are resolved by the final exact sort.
Queries outside this class fall back to the general engine (engine.py).

Everything stays in DataFrames: segment scoring is one Arrow applyInPandas
over (seg) groups doing dense numpy accumulation over decoded blocks.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from probe_spark import elastic, oracle
from probe_spark.compaction import SEG_BITS, SEG_SIZE
from probe_spark.config import DEFAULT_BM25, BM25Params
from probe_spark.engine import SearchEngine, _is_disjunctive_bag

_SCORE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


class WandEngine:
    """Top-k search over the compacted ``blocks`` table."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        params: BM25Params = DEFAULT_BM25,
        phase1_segs: int = 8,
    ):
        self.spark = spark
        self.index_dir = str(index_dir)
        self.params = params
        self.phase1_segs = phase1_segs
        p = Path(self.index_dir)
        row = spark.read.parquet(str(p / "stats")).collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"])
        self._blocks_path = str(p / "blocks")
        self._terms_path = str(p / "terms")
        self._fallback = SearchEngine(spark, index_dir, params)

    def _idfs(self, terms: list[str]) -> dict[str, float]:
        rows = (
            self.spark.read.parquet(self._terms_path)
            .filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        return {
            r["term"]: oracle.idf(self.n_docs, int(r["df"])) for r in rows
        }

    def _score_segs(
        self,
        blocks: DataFrame,
        idfs: dict[str, float],
        k: int,
        term_pos: dict[str, int],
    ) -> DataFrame:
        """Per-seg dense scoring: decode blocks, accumulate BM25 into a
        seg-local array, emit the seg's top-k (score desc, doc_id asc).
        Terms accumulate in AST keyword order (term_pos) so double sums
        match the oracle bit-for-bit."""
        params = self.params
        avgdl = self.avgdl

        def score_group(pdf):
            import numpy as np
            import pandas as pd

            from probe_spark.codec import decode_doc_block, varbyte_decode

            pdf = pdf.assign(_pos=pdf["term"].map(term_pos)).sort_values(
                ["_pos", "block_id"]
            )
            seg = int(pdf["seg"].iloc[0])
            base = seg << SEG_BITS
            acc = np.zeros(SEG_SIZE, dtype=np.float64)
            for term, docs, tfs, dls in zip(
                pdf["term"], pdf["docs"], pdf["tfs"], pdf["dls"]
            ):
                idf = idfs.get(term, 0.0)
                if idf == 0.0:
                    continue
                d = decode_doc_block(docs)
                t = varbyte_decode(tfs).astype(np.float64)
                l = varbyte_decode(dls).astype(np.float64)
                tp = (t * (params.k1 + 1.0)) / (
                    t + params.k1 * (1.0 - params.b + params.b * (l / avgdl))
                )
                acc[(d - base).astype(np.int64)] += idf * tp
            nz = np.flatnonzero(acc)
            if len(nz) == 0:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            scores = acc[nz]
            if len(nz) > k:
                # top-k by (score desc, doc_id asc): doc ids in nz are
                # ascending, stable lexsort on -score keeps that order
                order = np.argsort(-scores, kind="stable")[:k]
                nz, scores = nz[order], scores[order]
            return pd.DataFrame(
                {"doc_id": (nz + base).astype("int64"), "score": scores}
            )

        return blocks.groupBy("seg").applyInPandas(score_group, _SCORE_SCHEMA)

    def search_local(
        self, query: str, k: int = 10
    ) -> list[tuple[int, float]]:
        plan = elastic.create_query_plan(query)
        if not _is_disjunctive_bag(plan) or plan.filters:
            return self._fallback.search_local(query, k)
        terms = list(plan.term_indices)
        if not terms:
            return []
        idfs = self._idfs(terms)
        term_pos = {
            kw: i
            for i, kw in enumerate(
                kw
                for t in elastic.walk_terms(plan.ast)
                for kw in t.lowercase_keywords
            )
        }

        blocks = self.spark.read.parquet(self._blocks_path).filter(
            F.col("term").isin(terms)
        )
        blocks = blocks.persist()
        try:
            # phase 0: per-seg upper bound (sum over terms of max block ub)
            seg_ub = (
                blocks.groupBy("seg", "term")
                .agg(F.max("ub").alias("tub"))
                .groupBy("seg")
                .agg(F.sum("tub").alias("seg_ub"))
            )
            top_segs = [
                r["seg"]
                for r in seg_ub.orderBy(F.desc("seg_ub"), F.asc("seg"))
                .limit(self.phase1_segs)
                .collect()
            ]
            if not top_segs:
                return []
            p1 = (
                self._score_segs(
                    blocks.filter(F.col("seg").isin(top_segs)), idfs, k, term_pos
                )
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
            results = [(int(r["doc_id"]), float(r["score"])) for r in p1]
            theta = results[k - 1][1] if len(results) >= k else 0.0

            # phase 2: remaining segments that could still beat theta
            rest = seg_ub.filter(
                (~F.col("seg").isin(top_segs)) & (F.col("seg_ub") >= theta)
            ).select("seg")
            p2 = (
                self._score_segs(
                    blocks.join(rest, "seg", "leftsemi"), idfs, k, term_pos
                )
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
            results += [(int(r["doc_id"]), float(r["score"])) for r in p2]
        finally:
            blocks.unpersist()
        results.sort(key=lambda x: (-x[1], x[0]))
        return results[:k]
