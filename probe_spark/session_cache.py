"""Session cache: per-(session, query) result dedup (SURVEY.md S8).

The reference persists returned block keys per (session_id, md5(query)) and
filters them from later identical searches (src/search/cache.rs:30-43,
312-316,544).  The web-engine analog keys on doc_id and stores the cache as
a small parquet table (on a deployment this is an Iceberg table with
MERGE INTO semantics; append + dedup-on-read is equivalent here).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import SparkSession


def _query_hash(query: str) -> str:
    """cache.rs keys on md5 of the query string (:312-316)."""
    return hashlib.md5(query.encode("utf-8")).hexdigest()


class SessionCache:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = str(path)

    def seen_doc_ids(self, session_id: str, query: str) -> set[int]:
        p = Path(self.path)
        if not p.exists() or not any(p.rglob("*.parquet")):
            return set()
        qh = _query_hash(query)
        from pyspark.sql import functions as F

        rows = (
            self.spark.read.parquet(self.path)
            .where(
                (F.col("session_id") == session_id)
                & (F.col("query_hash") == qh)
            )
            .select("doc_id")
            .distinct()
            .collect()
        )
        return {int(r["doc_id"]) for r in rows}

    def filter_results(
        self, session_id: str, query: str, results: list[tuple[int, float]]
    ) -> list[tuple[int, float]]:
        """Drop docs already returned for this (session, query) --
        cache.rs:394 (filter_matched_lines analog at doc granularity)."""
        seen = self.seen_doc_ids(session_id, query)
        return [(d, s) for d, s in results if d not in seen]

    def add_results(
        self, session_id: str, query: str, results: list[tuple[int, float]]
    ) -> None:
        """cache.rs:544 (add_results_to_cache)."""
        if not results:
            return
        qh = _query_hash(query)
        df = self.spark.createDataFrame(
            [(session_id, qh, int(d)) for d, _ in results],
            "session_id string, query_hash string, doc_id long",
        )
        df.coalesce(1).write.mode("append").parquet(self.path)
