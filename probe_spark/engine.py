"""Distributed BM25 query engine over the inverted index (SURVEY.md SS7.3).

Query lifecycle (replacing the reference's scan steps 3-9, SURVEY.md SS3.1):

  1. parse query -> AST + QueryPlan (driver, pure Python, shared w/ oracle)
  2. posting retrieval: filter the term-sorted postings parquet with
     ``term IN (...)`` -- parquet row-group stats prune non-matching row
     groups (the files are sorted by term at build time)
  3. exact/excluded ("rescue") terms: case-insensitive containment match
     against text+url, mirroring the exact-term rescue at
     file_processing.rs:1350-1358 (``full_code_lower.contains(term)`` --
     true SUBSTRING semantics).  Served from the trigram substring-index
     lane (indexer.tri_rows, the public Zoekt/Code-Search design): the
     rarest <=3 trigrams of the needle are intersected in the tri_postings
     table and contains() verifies only those candidates -- O(trigram df)
     per query.  Fallbacks, in order: trigram-bloom column prefilter
     (legacy index layouts), full containment scan (tiny corpora / <3-char
     needles).  The reference pays a full scan on EVERY query.
  4. boolean evaluation + expression scoring per doc: one shuffle
     (groupBy doc_id), then either
       - pure-Column fast path for disjunctive bags (no required/excluded/
         exact/multi-keyword terms): whole-stage-codegen BM25 sum, or
       - an Arrow-vectorized pandas UDF hosting the SAME oracle scorer
         (score_expr + evaluate) for full boolean semantics
  5. top-k: orderBy(score desc, doc_id asc).limit(k) -- Spark's
     TakeOrderedAndProject turns this into a per-partition top-k + driver
     merge, no global sort
  6. hydrate top-k rows with urls from the doc store (k rows, broadcast)

Corpus statistics (N, avgdl, per-term df) are global index-time values per
the design decision in SURVEY.md SS7.0; df for rescue terms is the exact
containment-or-token count computed by the same job that finds candidates.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from probe_spark import elastic, oracle
from probe_spark.config import DEFAULT_BM25, BM25Params
from probe_spark.elastic import QueryPlan, Term, walk_terms


def _term_in(col: str, values) -> "F.Column":
    """``col IN (...)`` as ONE JVM-parsed SQL expression.

    ``Column.isin(values)`` converts each Python literal through py4j
    (~2 ms per element of driver time); fine for a single query's <=20
    terms, but the fused batch path filters postings by the term UNION
    of a whole query log (hundreds of terms), where the per-literal cost
    becomes a fixed driver stall that no executor can absorb.  The
    parsed expression is the same Catalyst ``In`` predicate, so parquet
    row-group pruning is unchanged."""
    vals = sorted(values)
    if not vals:
        return F.lit(False)
    quoted = ",".join(
        "'%s'" % v.replace("\\", "\\\\").replace("'", "\\'") for v in vals
    )
    return F.expr("%s IN (%s)" % (col, quoted))


def _is_disjunctive_bag(plan: QueryPlan) -> bool:
    """True when the query is a pure OR-bag of optional non-exact terms:
    score == sum of per-term BM25 and match == any term present.  This is
    the whole-stage-codegen fast path (no Python in the hot loop)."""
    if plan.ast is None or plan.has_required_anywhere or plan.excluded_terms:
        return False
    all_kws: list[str] = []
    for t in walk_terms(plan.ast):
        if t.exact or t.excluded or t.required:
            return False
        # multi-keyword terms (compound splits, e.g. "deadline" ->
        # dead+line) sum INSIDE the Term first, then node totals add --
        # the flat keyword sum here is the same value but a different f64
        # association (observed flipping the last ulp at 100k docs), so
        # those route to the lane scorer which mirrors the tree exactly
        if len(t.lowercase_keywords) > 1:
            return False
        all_kws.extend(t.lowercase_keywords)
    # a keyword repeated across Term nodes contributes once per node to the
    # expression score (e.g. "repository OR repositori" where the exception
    # dual-emit puts "repositori" in both terms) -- the flat per-term sum
    # would undercount, so bail to the general scorer
    if len(all_kws) != len(set(all_kws)):
        return False

    def only_or(e) -> bool:
        if isinstance(e, Term):
            return True
        if isinstance(e, elastic.Or):
            return only_or(e.left) and only_or(e.right)
        return False

    return only_or(plan.ast)


def _bag_plus_exclusions(plan: QueryPlan) -> bool:
    """True when the query is a pure OR-bag of optional single-keyword
    terms AND-combined with purely-excluded terms -- probe's dominant
    "keywords -noise" shape.  Matching for that shape is (any positive
    keyword present) AND (no excluded term present), and kept docs get an
    exact 0.0 contribution from every excluded term, so the score is the
    same f64 sum the lane scorer produces -- letting the engine score
    positives on the codegen disjunctive path and apply exclusions as
    one anti-join instead of pivoting every term into lanes."""
    if (
        plan.ast is None
        or plan.has_required_anywhere
        or not plan.excluded_terms
    ):
        return False
    chain: list = []

    def flat(e) -> None:
        if isinstance(e, elastic.And):
            flat(e.left)
            flat(e.right)
        else:
            chain.append(e)

    flat(plan.ast)
    pos_subtrees = []
    for node in chain:
        if isinstance(node, Term) and node.excluded:
            # the anti-join drops docs matching the excluded TERM's
            # candidate rows; that equals the tree's "no excluded keyword
            # present" only when the node is single-keyword and that
            # keyword is the term the candidate rows are keyed by
            if node.required or len(node.lowercase_keywords) != 1:
                return False
            if node.lowercase_keywords[0] not in plan.term_indices:
                return False
            continue
        pos_subtrees.append(node)
    # exactly one positive subtree: more than one And-child of positives
    # means conjunctive matching, which the bag path cannot express
    if len(pos_subtrees) != 1:
        return False
    sub = pos_subtrees[0]
    all_kws: list[str] = []
    for t in walk_terms(sub):
        if t.exact or t.excluded or t.required:
            return False
        if len(t.lowercase_keywords) > 1:
            return False
        all_kws.extend(t.lowercase_keywords)
    if not all_kws or len(all_kws) != len(set(all_kws)):
        return False

    def only_or(e) -> bool:
        if isinstance(e, Term):
            return True
        if isinstance(e, elastic.Or):
            return only_or(e.left) and only_or(e.right)
        return False

    return only_or(sub)


def _fused_chain_gates(
    plan: QueryPlan, excl_only_rescues: set[str]
) -> list[str] | None:
    """Classify a query for the fused queries-as-data batch plan.

    Returns the list of GATING terms -- the positive keywords that must
    ALL be present for a doc to match -- or None when the query cannot
    ride the fused plan.  An empty list means pure any-keyword matching
    (the score>0 filter implements it).  Exclusions are handled
    separately (idf-0 marker rows + max(excl) drop rule in the fused
    aggregation) and are not gates.

    Probe's parser emits LEFT-DEEP operator chains (elastic_query.rs
    grammar: implicit/explicit operators left-associate; only explicit
    parentheses nest a right subtree), and score_expr_bm25_optimized
    (ranking.rs:228-276) sums a left-deep chain in strict left-to-right
    keyword order -- exactly the fused plan's sorted-position ordered
    f64 aggregate.  Match semantics per evaluate_with_has_required
    (elastic_query.rs:150-285) reduce, for such chains, to gate counts:

    - required terms anywhere: match = ALL required present (plain terms
      never gate once a required exists) AND no And-connected excluded
      present  -> gates = required keywords
    - no required, every connector And: match = all positives present
      AND no excluded present                -> gates = positive keywords
    - no required, every positive connector Or (excluded tail may be
      And-connected): match = any positive   -> gates = []

    Bails on: parenthesized right subtrees (association and boolean
    structure both break), mixed And/Or positives without a required
    term ((a OR b) AND c is not count-expressible), multi-keyword /
    exact / missing-from-dictionary positives (compound splits sum
    inside the Term first -- a different f64 association), duplicate
    positive keywords (per-node double counting), Or-connected excluded
    terms (disjunctive exclusion), field filters, only-excluded queries,
    and any rescue term that is not purely excluded.  Excluded terms MAY
    be exact/quoted: their drop set is containment-served either way."""
    if (
        plan.ast is None
        or plan.filters
        or not plan.term_indices
        or plan.has_only_excluded_terms
        or oracle.rescue_terms(plan) != frozenset(excl_only_rescues)
    ):
        return None
    chain: list[tuple[str | None, Term]] = []

    def flat(e, conn: str | None) -> bool:
        if isinstance(e, Term):
            chain.append((conn, e))
            return True
        if isinstance(e, (elastic.And, elastic.Or)):
            if not isinstance(e.right, Term):
                return False  # parenthesized right subtree
            c = "and" if isinstance(e, elastic.And) else "or"
            if not flat(e.left, c):
                return False
            chain.append((c, e.right))
            return True
        return False

    if not flat(plan.ast, None):
        return None
    # an excluded element gates conjunctively iff its own connector AND
    # every connector after it are And: in a left-deep chain the nodes
    # above element i are exactly the joining nodes of elements i+1..n,
    # so any later Or makes the exclusion disjunctive ("+r -b OR c"
    # matches docs containing b whenever c is present)
    suffix_and = [True] * (len(chain) + 1)
    for i in range(len(chain) - 1, 0, -1):
        suffix_and[i] = suffix_and[i + 1] and chain[i][0] == "and"
    pos_kws: list[str] = []
    req_kws: list[str] = []
    pos_conns: list[str | None] = []
    for i, (conn, t) in enumerate(chain):
        if t.excluded:
            # (a single-element chain would be only-excluded: bailed)
            if conn != "and" or not suffix_and[i + 1]:
                return None
            for kw in t.lowercase_keywords:
                if kw not in plan.term_indices:
                    return None
            continue
        if t.exact or len(t.lowercase_keywords) != 1:
            return None
        kw = t.lowercase_keywords[0]
        if kw not in plan.term_indices:
            return None
        pos_kws.append(kw)
        pos_conns.append(conn)
        if t.required:
            req_kws.append(kw)
    if not pos_kws or len(pos_kws) != len(set(pos_kws)):
        return None
    if req_kws:
        return req_kws
    conns = {c for c in pos_conns if c is not None}
    if conns == {"and"}:
        return pos_kws
    if conns <= {"or"}:
        return []
    return None  # mixed And/Or positives without a required term


def _read_stats(stats_dir) -> tuple[int, float]:
    """(n_docs, avgdl) from the singleton stats table via pyarrow -- one
    tiny file read, no Spark job per engine construction."""
    import pyarrow.parquet as pq

    from pathlib import Path as _P

    files = sorted(_P(stats_dir).glob("*.parquet")) or sorted(
        _P(stats_dir).rglob("*.parquet")
    )
    for f in files:  # Spark writers may emit empty part files
        t = pq.read_table(str(f))
        if t.num_rows:
            d = t.to_pydict()
            return int(d["n_docs"][0]), float(d["avgdl"][0])
    raise FileNotFoundError(f"no stats rows under {stats_dir}")


def index_fingerprint(index_dir) -> tuple:
    """Driver-side change marker for an index directory: lineage file
    names (a stream/batch commit adds one) + stats file stats (every
    ingest rewrites them).  One listdir + a few os.stat, no Spark jobs.
    Shared by the engine's check_refresh and by derived tables (the
    SymSpell suggest buckets) that must detect a stale source index."""
    p = Path(index_dir)
    lin = p / "lineage"
    names = (
        tuple(sorted(f.name for f in lin.glob("*.json")))
        if lin.exists()
        else ()
    )
    sp = p / "stats"
    stat_m = (
        tuple(
            sorted(
                (f.name, f.stat().st_mtime_ns, f.stat().st_size)
                for f in sp.glob("*.parquet")
            )
        )
        if sp.exists()
        else ()
    )
    return (names, stat_m)


def parquet_rows(table_dir) -> int:
    """Row count of a parquet directory from footer metadata (no Spark
    job; footers are a few KB regardless of table size).  Unreadable
    footers return a pessimistic huge count so size-guarded preloads stay
    off rather than loading an unknown quantity."""
    import pyarrow.parquet as pq

    total = 0
    for f in Path(table_dir).rglob("*.parquet"):
        try:
            total += pq.ParquetFile(str(f)).metadata.num_rows
        except Exception:  # unreadable footer: assume big
            return 1 << 62
    return total


def _empty_matches(hits: DataFrame) -> DataFrame:
    """Typed empty rich-result columns for paths with no positive keyword
    postings (universal / stopword-only / only-excluded queries)."""
    return hits.withColumn(
        "matched_keywords", F.array().cast("array<string>")
    ).withColumn(
        "score_breakdown",
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<double>")
        ),
    )


class SearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        params: BM25Params = DEFAULT_BM25,
        bloom_min_docs: int = 50_000,
    ):
        """``bloom_min_docs``: below this corpus size the trigram-bloom
        prefilter is skipped -- a full containment scan of a tiny doc store
        is cheaper than the prefilter's extra job (the bloom pays off when
        text bytes dwarf bloom bytes + job overhead, i.e. at scale)."""
        self.spark = spark
        self.index_dir = str(index_dir)
        self.params = params
        self.bloom_min_docs = bloom_min_docs
        self._index_fp: tuple | None = None
        self._reopen()

    def _index_fingerprint(self) -> tuple:
        """Cheap driver-side change marker for the whole index: lineage
        file names (a stream/batch commit adds one) + stats file stats
        (every ingest rewrites them).  One listdir + a few os.stat per
        query, no Spark jobs -- the price of a cached engine staying fresh
        under incremental ingest.  The SymSpell manifest stat rides along
        so a live engine picks up a freshly built (or refreshed) suggest
        bucket table without reconstruction; it is NOT part of the bare
        index_fingerprint the manifest itself stores, which would be
        self-invalidating."""
        from probe_spark.symspell import MANIFEST

        mf = Path(self.index_dir) / MANIFEST
        sym = (
            (mf.stat().st_mtime_ns, mf.stat().st_size)
            if mf.exists()
            else None
        )
        return (index_fingerprint(self.index_dir), sym)

    def check_refresh(self) -> bool:
        """Reopen readers + caches iff the index changed on disk since the
        last query (incremental ingest / compaction).  Returns True when a
        refresh happened.  Called at the top of search()."""
        fp = self._index_fingerprint()
        if fp == self._index_fp:
            return False
        self._reopen()
        return True

    def pin_hot(self, materialize: bool = True) -> None:
        """Pin the serving-hot tables (postings, doc store) in executor
        storage for interactive serving: MEMORY_AND_DISK, so each
        executor keeps its partitions of the hot set resident and the
        per-query parquet scan becomes a cache read (measured ~25%
        single-query warm latency at sf0.1; the biggest win is the scan
        stage).  At 100-TB scale this is the standard hot-set pattern:
        the block manager caches what fits and evicts to disk -- never
        wrong, just colder.  Survives check_refresh reopens (the flag
        re-applies to the fresh readers; the stale pinned blocks are
        unpersisted).  ``materialize=False`` defers cache fill to the
        first query."""
        from pyspark import StorageLevel

        self._pin = True
        self._postings_df = self._postings_df.persist(
            StorageLevel.MEMORY_AND_DISK
        )
        self._docs_df = self._docs_df.persist(StorageLevel.MEMORY_AND_DISK)
        self._pinned_frames = (self._postings_df, self._docs_df)
        if materialize:
            self._postings_df.count()
            self._docs_df.count()

    def unpin(self) -> None:
        """Inverse of pin_hot: unpersist the pinned frames and clear the
        pin bookkeeping, so callers don't have to reach into private
        state (_pinned_frames / _pin) to undo a pin."""
        for frame in self._pinned_frames:
            frame.unpersist()
        self._pin = False
        self._pinned_frames = ()

    def _reopen(self) -> None:
        spark = self.spark
        p = Path(self.index_dir)
        self._index_fp = self._index_fingerprint()
        # singleton stats come straight from the parquet file driver-side
        # (pyarrow): constructing an engine should not cost a Spark job
        self.n_docs, self.avgdl = _read_stats(p / "stats")
        # the build manifest records which tokenizer produced the postings;
        # more_like_this must analyze the seed doc with the SAME one
        self._tokenizer = "probe"
        mf = p / "manifest.json"
        if mf.exists():
            import json

            try:
                self._tokenizer = json.loads(mf.read_text()).get(
                    "tokenizer", "probe"
                )
            except (OSError, ValueError):
                pass
        self._postings_path = str(p / "postings")
        # the doc store IS the ingest snapshot (text is written once at
        # build time); doc_len lives in the slim doc_lens table and is
        # only joined in for containment-rescue hits
        self._docs_path = str(
            p / "pages_indexed" if (p / "pages_indexed").exists() else p / "docs"
        )
        self._terms_path = str(p / "terms")
        self._cached_cand = None
        # create readers once: repeated spark.read.parquet re-lists files
        # and re-infers partitioning on every query
        for old in getattr(self, "_pinned_frames", ()):
            old.unpersist()
        self._pinned_frames: tuple = ()
        self._postings_df = spark.read.parquet(self._postings_path)
        self._docs_df = spark.read.parquet(self._docs_path)
        if getattr(self, "_pin", False):
            # re-apply hot pinning across an incremental-ingest reopen;
            # materialization is lazy (first query fills the cache)
            self.pin_hot(materialize=False)
        self._docs_text_df = None  # lazy: see _docs_text()
        self._terms_df = spark.read.parquet(self._terms_path)
        lens_path = p / "doc_lens"
        self._doc_lens_df = (
            spark.read.parquet(str(lens_path)) if lens_path.exists() else None
        )
        # driver-side term-stats cache (standard IR engine practice): df
        # lookups repeat across queries, and a Spark job per query just to
        # read <=256 dictionary rows is pure fixed overhead.  Small
        # dictionaries load whole (one job at init); at web scale the
        # table exceeds the bound and lookups fall back to the term-pruned
        # parquet read, memoized per term.
        self._df_cache: dict[str, int] = {}
        self._bloom_cache: dict[str, list[int] | None] = {}
        self._tri_cand_cache: dict[str, object] = {}
        self._tri_df_cache: dict[str, int] = {}
        # verified-containment memo (adaptive exact-form postings): once a
        # rescue needle's TRUE match set is known and small, later queries
        # serve it as a literal postings frame -- no doc-store touch at
        # all.  Keyed by (needle, exclude_filenames) because -n changes
        # the haystack (text-only).  Value: a reusable literal DataFrame,
        # or None = known too large to cache (scan stays embedded).
        # Invalidation: this dict lives in _reopen, so any on-disk index
        # change (check_refresh fingerprint) drops it with the others.
        self._verified_cache: dict[tuple[str, bool], DataFrame | None] = {}
        # raw verified id lists beside the literal frames (same keys /
        # lifecycle): lets batch callers build ONE combined literal frame
        # for B warm needles instead of B one-task union branches
        self._verified_ids: dict[tuple[str, bool], list[int] | None] = {}
        # rescue-term df memo (same keying/invalidation): the df of a
        # rescue term is a corpus-wide constant of the index, so the
        # per-query df-count action is only paid on first sight
        self._rescue_df_cache: dict[tuple[str, bool], int] = {}
        self._full_dict = False
        # trigram substring-index lane (indexer.tri_rows): serves the
        # containment rescue in O(trigram df) instead of an O(corpus)
        # bloom/doc scan.  Enabled only when it COVERS the corpus: every
        # postings bucket must have a tri bucket (a pre-tri-lane index
        # that later received tri-writing stream deltas would otherwise
        # silently miss containment matches in the old buckets).
        self._tri_post_df = None
        self._tri_terms_df = None
        self._full_tri_dict = False
        tri_root, post_root = p / "tri_postings", p / "postings"
        if (
            tri_root.exists()
            and (p / "tri_terms").exists()
            and post_root.exists()
        ):
            post_buckets = {d.name for d in post_root.glob("bucket=*")}
            tri_buckets = {d.name for d in tri_root.glob("bucket=*")}
            if post_buckets and post_buckets <= tri_buckets:
                tri_df = spark.read.parquet(str(tri_root))
                # layout guard: the lane stores 24-bit byte-trigram CODES
                # (int); an index from the short-lived string-trigram layout
                # would silently refute every needle -- disable instead
                from pyspark.sql.types import IntegerType, LongType

                if isinstance(
                    tri_df.schema["tri"].dataType, (IntegerType, LongType)
                ):
                    self._tri_post_df = tri_df
                    self._tri_terms_df = spark.read.parquet(
                        str(p / "tri_terms")
                    )
                    self._tri_terms_path = p / "tri_terms"
        # SymSpell suggest lane (symspell.py): precomputed delete-
        # neighborhood table; loaded only when its manifest fingerprint
        # matches the live index, else suggest falls back to the brute
        # dictionary scan (stale lane = silently disabled, never wrong)
        from probe_spark import symspell

        (
            self._suggest_buckets_df,
            self._suggest_max_dist,
        ) = symspell.load_if_fresh(spark, self.index_dir)
        # guard the whole-dictionary preload by VOCABULARY size, not doc
        # count (web vocab at 1M docs can be tens of millions of terms);
        # row counts come from parquet footers -- driver-side, no job
        if self._vocab_rows(p / "terms") <= 2_000_000:
            pdf = self._terms_df.select("term", "df").toPandas()
            self._df_cache = dict(
                zip(pdf["term"], (int(x) for x in pdf["df"]))
            )
            self._full_dict = True

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _vocab_rows(terms_dir: Path) -> int:
        """Term-dictionary row count via the shared parquet_rows helper."""
        return parquet_rows(terms_dir)

    def _docs(self) -> DataFrame:
        return self._docs_df

    def _docs_text(self) -> DataFrame:
        """Doc store with text hydrated: identity for copy-mode layouts;
        reference-mode layouts join the slim store against the durable
        source (indexer.doc_text_df).  Only the containment-rescue verify
        needs this -- hot paths (hydration, field filters) stay on the
        slim frame and never pay the join."""
        if self._docs_text_df is None:
            from probe_spark.indexer import doc_text_df

            self._docs_text_df = doc_text_df(
                self.spark, self.index_dir, self._docs_df
            )
        return self._docs_text_df

    def _filtered_docs(self, plan: QueryPlan) -> DataFrame | None:
        """Apply field filters (F1/F3 web mapping): lang equality, url
        substring.  Returns None when no filters are active."""
        from probe_spark.config import LANG_ALIASES, normalize_lang

        lang_vals = [
            normalize_lang(v)
            for f in ("lang", "language")
            for v in plan.filters.get(f, [])
        ]
        url_subs = [
            v.lower()
            for f in ("file", "path", "filename", "dir", "directory")
            for v in plan.filters.get(f, [])
        ]
        ext_vals = [
            v.lower().lstrip(".")
            for f in ("ext", "extension")
            for v in plan.filters.get(f, [])
        ]
        if not lang_vals and not url_subs and not ext_vals:
            return None
        docs = self._docs()
        if lang_vals:
            # alias-normalize the doc label too (lang:rs == lang:rust,
            # search_runner.rs:1904-1921) -- tiny literal map, JVM-side
            alias_map = F.create_map(
                *[
                    x
                    for a, c in sorted(LANG_ALIASES.items())
                    for x in (F.lit(a), F.lit(c))
                ]
            )
            doc_lang = F.lower(F.col("lang"))
            docs = docs.filter(
                F.coalesce(alias_map[doc_lang], doc_lang).isin(lang_vals)
            )
        for s in url_subs:
            docs = docs.filter(F.lower(F.col("url")).contains(s))
        if ext_vals:
            # same regex as oracle.url_extension (shared semantics)
            ext = F.lower(
                F.regexp_extract(
                    F.col("url"), r"\.([A-Za-z0-9]+)([?#].*)?$", 1
                )
            )
            docs = docs.filter(ext.isin(ext_vals))
        return docs

    # above this many bloom candidates the isin-pushdown stops paying for
    # itself; verify with the plain full scan instead
    _BLOOM_ISIN_CAP = 50_000

    def _bloom_candidate_ids(self, needle: str):
        """Trigram-bloom prefilter (trigram.py): doc_ids whose bloom holds
        every trigram of ``needle`` -- a SUPERSET of the true containment
        matches, from the slim doc_lens table.  Returns a list (collected;
        verify scan pushes ``doc_id IN (...)`` into parquet row groups), or
        a lazy candidate DataFrame when the list would exceed the IN cap
        (caller semi-joins), or None when the prefilter is unavailable."""
        if (
            self._doc_lens_df is None
            or "tri_bloom" not in self._doc_lens_df.columns
            or self.n_docs < self.bloom_min_docs
            or len(needle.encode("utf-8")) < 3
        ):
            return None
        if needle in self._bloom_cache:
            return self._bloom_cache[needle]

        @F.pandas_udf("boolean")
        def _hit(blooms):
            import pandas as pd

            from probe_spark.trigram import bloom_batch_might_contain

            if len(blooms) == 0:
                return pd.Series([], dtype=bool)
            return pd.Series(bloom_batch_might_contain(blooms, needle))

        cand_df = self._doc_lens_df.filter(_hit(F.col("tri_bloom"))).select(
            "doc_id"
        )
        rows = cand_df.limit(self._BLOOM_ISIN_CAP + 1).collect()
        if len(rows) > self._BLOOM_ISIN_CAP:
            # too many candidates for an IN pushdown: hand back the lazy
            # candidate frame -- the caller semi-joins it (contains() runs
            # on far fewer rows even though the text read is not pruned)
            out: list[int] | DataFrame | None = cand_df
        else:
            out = [int(r["doc_id"]) for r in rows]
        if len(self._bloom_cache) > 1000:  # bound driver memory
            self._bloom_cache.clear()
        self._bloom_cache[needle] = out
        return out

    # intersect at most this many (rarest) trigrams of a rescue needle --
    # each additional list narrows candidates but adds read volume; the
    # rarest 3 almost always shrink the set to near-truth (Zoekt uses the
    # same heuristic)
    _TRI_INTERSECT = 3

    # serve a needle from the trigram lane only when its rarest trigram's
    # df is under this fraction of the corpus (with a small-corpus floor):
    # a dense candidate set is spread across every parquet row group, so
    # the IN/semi-join pushdown prunes nothing and each verify action pays
    # a near-full doc-store scan PLUS the candidate machinery (measured 2x
    # a plain contains() scan at sf0.1 for a 45%-df needle).  Rare needles
    # -- the dominant case for real quoted/excluded terms at web scale --
    # stay index-served at O(df).  The df check is driver-side and free
    # (tri dictionary is preloaded/memoized).
    _TRI_DIRECT_FRAC = 0.05
    _TRI_DIRECT_FLOOR = 1_000
    # sentinel: lane PRESENT but declined for this needle (too common) --
    # tells _rescue_candidates to skip the bloom (same density pathology)
    # and verify with the plain scan
    _TRI_DECLINED = object()

    def _tri_dfs(self, tris: list[int]) -> dict[int, int]:
        """Per-trigram df from the tri dictionary: lazy whole-dictionary
        driver preload when small (first rescue query pays one tiny job),
        pruned parquet lookups memoized per trigram otherwise."""
        if not self._full_tri_dict and not self._tri_df_cache:
            if self._vocab_rows(self._tri_terms_path) <= 2_000_000:
                pdf = self._tri_terms_df.select("tri", "df").toPandas()
                self._tri_df_cache = dict(
                    zip(
                        (int(x) for x in pdf["tri"]),
                        (int(x) for x in pdf["df"]),
                    )
                )
                self._full_tri_dict = True
        out = {t: self._tri_df_cache[t] for t in tris if t in self._tri_df_cache}
        missing = [t for t in tris if t not in out]
        if missing and not self._full_tri_dict:
            rows = (
                self._tri_terms_df.filter(F.col("tri").isin(missing))
                .select("tri", "df")
                .collect()
            )
            for r in rows:
                out[r["tri"]] = int(r["df"])
            for t in missing:
                self._tri_df_cache[t] = out.setdefault(t, 0)
        else:
            for t in missing:  # full dict: absence means df 0
                out[t] = 0
        return out

    def _tri_candidate_ids(self, needle: str):
        """Substring-index candidates for a rescue needle: doc_ids whose
        haystack holds the needle's RAREST <=3 trigrams (a SUPERSET of the
        true containment matches -- trigrams present but non-contiguous are
        possible, so callers still verify contains()).  Returns a list of
        ids (IN-pushdown into the doc-store read), a lazy DataFrame when
        the candidate set exceeds the IN cap, [] when some trigram has df 0
        (no doc can contain the needle), or None when the lane is absent,
        the needle is shorter than one trigram, or the needle is too
        COMMON for the prefilter to pay (_TRI_DIRECT_FRAC -- the caller
        falls back to the plain verify scan it would mostly run anyway).
        Cost is O(sum of the selected trigram dfs) -- never O(corpus)."""
        from probe_spark.trigram import needle_tri_codes

        if self._tri_post_df is None:
            return None
        tris = needle_tri_codes(needle)
        if not tris:  # needle shorter than one trigram
            return None
        if needle in self._tri_cand_cache:
            return self._tri_cand_cache[needle]
        dfs = self._tri_dfs(tris)
        if any(dfs[t] == 0 for t in tris):
            out: list[int] | DataFrame | None = []
        elif min(dfs.values()) > max(
            self._TRI_DIRECT_FRAC * self.n_docs, self._TRI_DIRECT_FLOOR
        ):
            # unselective needle: candidates would blanket every row group
            out = self._TRI_DECLINED
        else:
            sel = sorted(tris, key=lambda t: dfs[t])[: self._TRI_INTERSECT]
            post = self._tri_post_df.filter(F.col("tri").isin(sel))
            if len(sel) == 1:
                cand_df = post.select("doc_id")
            else:
                # (tri, doc_id) rows are distinct (array_distinct at build),
                # so count(*) == len(sel) <=> the doc holds ALL selected
                cand_df = (
                    post.groupBy("doc_id")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .filter(F.col("c") == len(sel))
                    .select("doc_id")
                )
            if min(dfs[t] for t in sel) > self._BLOOM_ISIN_CAP:
                # provably too many candidates for an IN pushdown: hand
                # back the lazy frame (caller semi-joins) without collecting
                out = cand_df
            else:
                rows = cand_df.limit(self._BLOOM_ISIN_CAP + 1).collect()
                if len(rows) > self._BLOOM_ISIN_CAP:
                    out = cand_df
                else:
                    out = [int(r["doc_id"]) for r in rows]
        if len(self._tri_cand_cache) > 1000:  # bound driver memory
            self._tri_cand_cache.clear()
        self._tri_cand_cache[needle] = out
        return out

    def _rescue_candidates(self, needle: str):
        """Best available containment prefilter for a rescue needle:
        trigram postings lane first (index-served, O(df)), trigram bloom
        second (columnar O(corpus) superset), else None (full scan).  A
        lane DECLINE (needle too common to prune) also skips the bloom:
        its candidate set would be just as dense, so the bloom scan would
        only add an O(corpus) pass before the inevitable verify scan."""
        ids = self._tri_candidate_ids(needle)
        if ids is self._TRI_DECLINED:
            return None
        if ids is not None:
            return ids
        return self._bloom_candidate_ids(needle)

    # cache a needle's verified match set only when it fits an IN-pushdown
    # anyway; bound the number of memoized needles driver-side
    _VERIFIED_NEEDLE_CAP = 128

    def _try_verify_cache(
        self, key: tuple[str, bool], scan_frame: DataFrame, ids
    ) -> DataFrame | None:
        """First sight of a rescue needle: materialize its TRUE containment
        match set (one bounded action -- the same scan the query plan would
        embed, run once instead of per-query) and memoize it as a literal
        postings frame.  Returns the frame to union into the candidate
        rows: the literal frame when the set fits the cap, the original
        scan (and a None cache marker = uncacheable) when it doesn't, or
        None when the verified set is empty (no doc contains the needle).
        At web scale this is standard adaptive caching of hot filters: the
        cap keeps driver/plan memory bounded, and any on-disk index change
        invalidates via the _reopen fingerprint."""
        import pandas as pd

        cap = self._BLOOM_ISIN_CAP
        sel = scan_frame.select("doc_id")
        if isinstance(ids, list):
            # candidate superset already <= cap, so the verified set is too
            rows = sel.collect()
        else:
            rows = sel.limit(cap + 1).collect()
            if len(rows) > cap:
                self._verified_cache[key] = None  # known too large
                self._verified_ids[key] = None
                return scan_frame
        doc_ids = sorted(int(r["doc_id"]) for r in rows)
        if len(self._verified_cache) > self._VERIFIED_NEEDLE_CAP:
            self._verified_cache.clear()
            self._verified_ids.clear()
        lit = self._cache_verified(key, doc_ids)
        return lit if doc_ids else None

    def _cache_verified(
        self, key: tuple[str, bool], ids: list[int] | None
    ) -> DataFrame | None:
        """Materialize a verified id list into the literal-frame caches --
        the single constructor for the three cache states (literal frame /
        empty frame / None = known too large).  Callers manage capacity."""
        if ids is None:
            self._verified_cache[key] = None
            self._verified_ids[key] = None
            return None
        import pandas as pd

        ids = sorted(ids)
        if ids:
            lit = self.spark.createDataFrame(
                pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64")})
            )
        else:
            lit = self.spark.createDataFrame([], "doc_id long")
        lit = lit.select(
            F.lit(key[0]).alias("term"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit(1).cast("int").alias("tf"),
        )
        self._verified_cache[key] = lit
        self._verified_ids[key] = ids
        return lit

    def _candidate_rows(self, plan: QueryPlan) -> DataFrame:
        """(term, doc_id, tf, doc_len) rows for every query term, incl.
        containment rescue for exact/excluded terms."""
        return self._term_rows(plan, list(plan.term_indices))

    def warm_rescue_needles(self, needles: list[str], ex_fn: bool) -> None:
        """Batch-verify COLD rescue needles in ONE Spark action.

        The per-needle path (_rescue_frames -> _try_verify_cache) pays up
        to two serialized driver round-trips per cold needle: the trigram
        candidate collect and the verified-set collect.  A query BATCH
        with B distinct excluded/exact needles therefore spends O(B)
        actions of pure driver latency before its single data action --
        measured 43 s of serial plan-build time for a 200-query log at
        150k docs, the Amdahl fraction behind the 0.37 serving-scaling
        efficiency in BENCH r4.  Here every cold needle's verify scan
        becomes ONE union job: trigram-pruned branches (doc_id IN
        pushdown from a single batched candidate collect) plus one shared
        full-scan branch for lane-declined / sub-trigram needles, capped
        per needle by a row_number window so the driver collect stays
        bounded exactly as the per-needle path bounds it.  Results
        populate _verified_cache with the same three states the
        per-needle path produces (literal frame / empty frame / None =
        known too large), so _rescue_frames afterwards is cache-hits
        only.  Single queries and legacy bloom-only layouts keep the
        per-needle path."""
        from probe_spark.trigram import needle_tri_codes

        ex_key = bool(ex_fn)
        cold = sorted(
            {t for t in needles if (t, ex_key) not in self._verified_cache}
        )
        if len(cold) < 2 or self._tri_post_df is None:
            return
        if len(self._verified_cache) + len(cold) > self._VERIFIED_NEEDLE_CAP:
            # make room for the WHOLE batch up front: the per-insert
            # eviction would otherwise wipe needles warmed earlier in this
            # same call (a batch may transiently exceed the cap; the next
            # per-needle insert restores the bound)
            self._verified_cache.clear()
            self._verified_ids.clear()
            cold = sorted(set(needles))
        cap = self._BLOOM_ISIN_CAP
        pair_rows: list[tuple[str, int]] = []
        n_sel: dict[str, int] = {}
        fullscan: list[str] = []
        for t in cold:
            tris = needle_tri_codes(t)
            if not tris:
                fullscan.append(t)  # sub-trigram needle: plain verify scan
                continue
            dfs = self._tri_dfs(tris)
            if any(dfs[x] == 0 for x in tris):
                # refuted corpus-wide: cache the empty frame now
                self._cache_verified((t, ex_key), [])
                self._tri_cand_cache.setdefault(t, [])
                continue
            if min(dfs.values()) > max(
                self._TRI_DIRECT_FRAC * self.n_docs, self._TRI_DIRECT_FLOOR
            ):
                fullscan.append(t)  # lane declines: plain verify scan
                continue
            sel = sorted(tris, key=lambda x: dfs[x])[: self._TRI_INTERSECT]
            if min(dfs[x] for x in sel) > cap:
                # provably more candidates than an IN pushdown takes: the
                # per-needle path keeps the candidate frame LAZY and
                # semi-joins it; mirror that as a lazy verify branch
                n_sel[t] = -len(sel)
            else:
                n_sel[t] = len(sel)
            pair_rows += [(t, int(x)) for x in sel]
        from pyspark.sql.window import Window

        def _cand_df(terms: dict[str, int]):
            """Lazy (term, doc_id) candidate pairs for the given needles
            (|n| selected trigrams each) -- no action."""
            rows_ = [(t, c) for t, c in pair_rows if t in terms]
            qt = self.spark.createDataFrame(rows_, "term string, tri int")
            codes = sorted({c for _, c in rows_})
            post = self._tri_post_df.filter(F.col("tri").isin(codes))
            nsel_df = self.spark.createDataFrame(
                [(t, abs(n)) for t, n in sorted(terms.items())],
                "term string, n int",
            )
            return (
                post.join(F.broadcast(qt), "tri")
                .groupBy("term", "doc_id")
                .agg(F.count(F.lit(1)).alias("c"))
                .join(F.broadcast(nsel_df), "term")
                .filter(F.col("c") == F.col("n"))
                .select("term", "doc_id")
            )

        # batched trigram candidates: ONE Arrow collect for every needle
        # whose candidate set is bounded (<= rarest trigram df <= cap)
        cand_ids: dict[str, list[int]] = {}
        small = {t: n for t, n in n_sel.items() if n > 0}
        lazy = {t: n for t, n in n_sel.items() if n < 0}
        if small:
            pdf = _cand_df(small).toPandas()
            for t in small:
                cand_ids[t] = []
            for t, d in pdf.groupby("term")["doc_id"]:
                cand_ids[t] = [int(x) for x in d]
            for t, ids in cand_ids.items():
                if not ids:
                    # trigrams individually present but never co-located
                    self._cache_verified((t, ex_key), [])
            cand_ids = {t: ids for t, ids in cand_ids.items() if ids}
        # batched verify: one union job over pruned branches + full scan
        docs = self._docs_text().select(
            "doc_id",
            F.lower(F.col("text")).alias("_t"),
            F.lower(F.col("url")).alias("_u"),
        )

        def _hit(term_lit):
            c = F.col("_t").contains(term_lit)
            return c if ex_key else c | F.col("_u").contains(term_lit)

        branches: list[DataFrame] = []
        for t, ids in sorted(cand_ids.items()):
            branches.append(
                docs.filter(
                    F.expr("doc_id IN (%s)" % ",".join(map(str, ids)))
                )
                .filter(_hit(F.lit(t)))
                .select(F.lit(t).alias("term"), "doc_id")
            )
        if lazy:
            branches.append(
                docs.join(_cand_df(lazy), "doc_id", "inner")
                .filter(_hit(F.col("term")))
                .select("term", "doc_id")
            )
        if fullscan:
            fs = self.spark.createDataFrame(
                [(t,) for t in sorted(set(fullscan))], "term string"
            )
            branches.append(
                docs.crossJoin(F.broadcast(fs))
                .filter(_hit(F.col("term")))
                .select("term", "doc_id")
            )
        if not branches:
            return
        allv = branches[0]
        for b in branches[1:]:
            allv = allv.unionByName(b)
        wv = Window.partitionBy("term").orderBy("doc_id")
        vdf = (
            allv.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") <= cap + 1)
            .select("term", "doc_id")
            .toPandas()
        )
        verified: dict[str, list[int]] = {
            t: [] for t in list(cand_ids) + list(lazy) + fullscan
        }
        for t, d in vdf.groupby("term")["doc_id"]:
            verified[t] = [int(x) for x in d]
        for t, ids in verified.items():
            key = (t, ex_key)
            self._cache_verified(key, None if len(ids) > cap else ids)

    def _rescue_frames(
        self, rescues: list[str], ex_fn: bool
    ) -> list[DataFrame]:
        """(term, doc_id, tf=1) containment-match frames, one per rescue
        needle: the memoized literal frame when the needle's verified set
        is cached, else the candidate-pruned doc-store scan (which the
        first sighting materializes into the memo via _try_verify_cache).
        Needles refuted corpus-wide (no doc can contain them) or verified
        empty contribute no frame."""
        docs = self._docs_text().select(
            "doc_id",
            F.lower(F.col("text")).alias("_t"),
            F.lower(F.col("url")).alias("_u"),
        )
        ex_key = bool(ex_fn)
        scans: list[DataFrame] = []
        for t in rescues:
            key = (t, ex_key)
            lit_df = self._verified_cache.get(key)
            if lit_df is not None:
                # warm needle: the exact match set was materialized on a
                # prior query -- a literal postings frame replaces the
                # doc-store scan entirely
                scans.append(lit_df)
                continue
            base = docs
            ids = self._rescue_candidates(t)
            if isinstance(ids, DataFrame):
                base = docs.join(ids, "doc_id", "leftsemi")
            elif ids is not None:
                if not ids:
                    continue  # no doc can contain t
                # one JVM-parsed IN expression: a python-side .isin(ids)
                # pays a py4j literal conversion PER id (~2ms each -- 5s of
                # driver time at a few thousand candidates)
                base = docs.filter(
                    F.expr(
                        "doc_id IN (%s)" % ",".join(map(str, ids))
                    )
                )
            hay_hit = (
                F.col("_t").contains(t)
                if ex_fn  # -n: containment rescue checks TEXT only
                else (F.col("_t").contains(t) | F.col("_u").contains(t))
            )
            scan_frame = base.filter(hay_hit).select(
                F.lit(t).alias("term"),
                "doc_id",
                F.lit(1).cast("int").alias("tf"),
            )
            if key not in self._verified_cache:
                scan_frame = self._try_verify_cache(key, scan_frame, ids)
                if scan_frame is None:
                    continue  # verified empty: no doc contains t
            scans.append(scan_frame)
        return scans

    def _term_rows(self, plan: QueryPlan, terms: list[str]) -> DataFrame:
        """(term, doc_id, tf, doc_len) rows for the GIVEN terms only, with
        the containment rescue applied to those that are rescue terms
        (lets WandEngine fetch just the excluded-term rows)."""
        ex_fn = getattr(self, "_exclude_fn", False)
        post = self._postings_df.filter(F.col("term").isin(list(terms)))
        if ex_fn:
            # -n: drop url-token-only matches (tf_url = url-token share of
            # tf, written at build time); the surviving rows keep the FULL
            # tf for scoring (see search() docstring)
            if "tf_url" not in self._postings_df.columns:
                raise ValueError(
                    "exclude_filenames needs the tf_url postings column; "
                    "this index predates it -- rebuild with build_index()"
                )
            post = post.filter((F.col("tf") - F.col("tf_url")) > 0)
        post = post.select("term", "doc_id", "tf", "doc_len")
        rescues = sorted(t for t in oracle.rescue_terms(plan) if t in terms)
        if not rescues:
            return post
        scans = self._rescue_frames(rescues, ex_fn)
        if not scans:
            # every rescue term was bloom-refuted corpus-wide: no doc can
            # contain any of them, token postings alone decide
            return post
        scan_df = scans[0]
        for s in scans[1:]:
            scan_df = scan_df.unionByName(s)
        if self._doc_lens_df is not None:
            # rescue hits need doc_len for BM25 -- join the slim lengths
            # table (only the matched doc_ids flow into the join)
            scan_df = scan_df.join(self._doc_lens_df, "doc_id", "left").select(
                "term", "doc_id", "tf", "doc_len"
            )
        else:  # legacy layout: doc store carried doc_len
            scan_df = scan_df.join(
                self._docs_df.select("doc_id", "doc_len"), "doc_id", "left"
            ).select("term", "doc_id", "tf", "doc_len")
        # token tf wins over the rescue tf=1 (file_processing.rs:1350-1358
        # only appends when the token is absent)
        return (
            post.unionByName(scan_df)
            .groupBy("term", "doc_id")
            .agg(F.max("tf").alias("tf"), F.first("doc_len").alias("doc_len"))
        )

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Global df per term from the dictionary: driver cache first,
        term-pruned parquet lookup for misses (memoized)."""
        out = {t: self._df_cache[t] for t in terms if t in self._df_cache}
        missing = [t for t in terms if t not in out]
        if missing and not self._full_dict:
            rows = (
                self._terms_df
                .filter(F.col("term").isin(missing))
                .select("term", "df")
                .collect()
            )
            for r in rows:
                out[r["term"]] = int(r["df"])
            for t in missing:  # absent from dictionary => df 0, memoize too
                self._df_cache[t] = out.get(t, 0)
        return out

    def _query_dfs(self, plan: QueryPlan, cand: DataFrame) -> dict[str, int]:
        """Global df per query term: regular terms from the terms dictionary
        (driver cache / term-pruned parquet); rescue terms from the
        candidate rows (their containment scan defines their df).

        PURELY-excluded rescue terms skip the df job: their idf only gates
        the drop decision (a doc is dropped iff its excluded total > 0,
        i.e. tf > 0 and idf > 0 -- oracle.score_expr), and kept docs have
        tf = 0 for them, so ANY positive df yields identical results while
        saving a full doc-store containment scan action (the same
        observation the WAND engine applies to its synthetic exclusion
        blocks)."""
        rescues = oracle.rescue_terms(plan)
        regular = [t for t in plan.term_indices if t not in rescues]
        out: dict[str, int] = {}
        if regular:
            out.update(self.term_dfs(regular))
        excl_only = self._excl_only_rescues(plan)
        for t in excl_only:
            out[t] = 1
        scored_rescues = sorted(rescues - excl_only)
        ex_key = bool(getattr(self, "_exclude_fn", False))
        for t in list(scored_rescues):
            if (t, ex_key) in self._rescue_df_cache:
                # a rescue term's df is a corpus-wide constant of the index
                # (invalidated with the other caches on refresh): the count
                # action is only paid on the term's first sighting
                out[t] = self._rescue_df_cache[(t, ex_key)]
                scored_rescues.remove(t)
        if scored_rescues:
            rows = (
                cand.filter(F.col("term").isin(scored_rescues))
                .groupBy("term")
                .agg(F.count(F.lit(1)).alias("df"))
                .collect()
            )
            got = {r["term"]: int(r["df"]) for r in rows}
            for t in scored_rescues:
                d = got.get(t, 0)
                out[t] = d
                self._rescue_df_cache[(t, ex_key)] = d
        return out

    @staticmethod
    def _excl_only_rescues(plan: QueryPlan) -> set[str]:
        """Rescue terms that are excluded and never positive -- the ones
        whose df is substitutable (see _query_dfs)."""
        rescues = oracle.rescue_terms(plan)
        pos_kws = (
            {
                kw
                for t in walk_terms(plan.ast)
                if not t.excluded
                for kw in t.lowercase_keywords
            }
            if plan.ast is not None
            else set()
        )
        return {
            t for t in rescues if t in plan.excluded_terms and t not in pos_kws
        }

    # -- public API ----------------------------------------------------------

    def search(
        self,
        query: str,
        k: int = 10,
        exact: bool = False,
        boost_coverage: bool = False,
        with_matches: bool = False,
        exclude_filenames: bool = False,
    ) -> DataFrame:
        """Top-k results as a DataFrame (rank, doc_id, url, score).
        exclude_filenames (reference -n, cli.rs:31-33 / issue #527): a term
        only matches a doc when it appears in the TEXT -- url-token-only
        credit is dropped from matching (tf for scoring keeps the full
        index value, mirroring the reference whose ranking tokenization is
        unconditionally filename-inclusive, file_processing.rs:1337).
        boost_coverage applies the R7 coverage boost (see oracle.py).
        with_matches adds the reference's rich-result columns
        (models.rs:34-88): matched_keywords (query keywords present in the
        doc, sorted) and score_breakdown (keyword -> its BM25 contribution,
        6dp) -- hydrated for the top-k rows only, one extra postings lookup
        bounded by k."""
        self.check_refresh()
        plan = elastic.create_query_plan(query, exact)
        self._boost_coverage = boost_coverage
        self._exclude_fn = exclude_filenames
        extra = ("matched_keywords", "score_breakdown") if with_matches else ()
        scored, cand, idfs, zero_score = self._match_frames(plan)

        if zero_score:
            # universal / stopword-only / only-excluded: score-0 docs in
            # doc_id order
            hits = scored.orderBy(F.asc("doc_id")).limit(k)
            return self._ranked(_empty_matches(hits) if with_matches else hits, extra)

        hits = self._topk_hits(scored, k)
        if with_matches:
            hits = self._hydrate_matches(hits, cand, idfs)
        return self._ranked(hits, extra)

    def _topk_hits(
        self, scored: DataFrame, k: int, exclude_doc_id: int | None = None
    ) -> DataFrame:
        """Deterministic top-k hydration shared by search / more_like_this /
        prefix_search: (score desc, doc_id asc) cut, url join on the k
        survivors only, re-sorted after the join (joins don't preserve
        order)."""
        if exclude_doc_id is not None:
            scored = scored.filter(F.col("doc_id") != exclude_doc_id)
        return (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .join(self._docs().select("doc_id", "url"), "doc_id", "left")
            .select("doc_id", "url", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def _reset_match_state(self) -> None:
        """Clear per-query scoring state (coverage boost, filename
        exclusion) so index-native entry points that don't expose those
        options (more_like_this / prefix_search / facets) can't inherit
        them from a prior ``search(...)`` on the same engine --
        files_only() guards the same way via try/finally."""
        self._boost_coverage = False
        self._exclude_fn = False

    def more_like_this(
        self,
        url: str,
        k: int = 10,
        max_terms: int = 8,
        min_term_len: int = 3,
        max_df_frac: float = 0.5,
    ) -> DataFrame:
        """More-like-this (the Elasticsearch MLT analog; the reference has
        no direct equivalent -- this is the index-native 'find similar
        pages' query a web-search deployment serves).  Scale shape: ONE
        doc-store fetch for the seed (url-keyed), ONE term-dictionary
        lookup for its candidate terms, then the standard disjunctive-bag
        postings query -- never a corpus scan, exactly like re-analyzing
        the seed doc when term vectors aren't stored.

        Term selection is integer-deterministic so a SQL oracle reproduces
        it exactly: candidates are the seed's tokens with
        ``len(term) >= min_term_len`` and dictionary
        ``df <= floor(max_df_frac * n_docs)`` (the df cap drops
        quasi-stopwords), ranked (seed tf desc, df asc, term asc), top
        ``max_terms``.  A float tf-idf ranking could flip ulp-ties across
        engines; the integer ordering cannot."""
        self.check_refresh()
        row = (
            self._docs_text()
            .filter(F.col("url") == url)
            .select("doc_id", "text")
            .head()
        )
        if row is None:
            raise KeyError(f"more_like_this: url not indexed: {url!r}")
        seed_id, text = int(row["doc_id"]), row["text"] or ""
        if self._tokenizer == "simple":
            toks = [t for t in text.split(" ") if t]
        else:
            from probe_spark.textkit import tokenize

            toks = tokenize(text)
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        cand = sorted(t for t in counts if len(t) >= min_term_len)
        dfs = self.term_dfs(cand)
        df_cap = int(max_df_frac * self.n_docs)
        eligible = [t for t in cand if 0 < dfs.get(t, 0) <= df_cap]
        sel = sorted(eligible, key=lambda t: (-counts[t], dfs[t], t))
        sel = sel[:max_terms]
        if not sel:
            return self.spark.createDataFrame(
                [], "rank int, doc_id long, url string, score double"
            )
        plan = elastic.plan_from_index_terms(sel)
        self._reset_match_state()
        scored, _cand, _idfs, _zero = self._match_frames(plan)
        return self._ranked(self._topk_hits(scored, k, exclude_doc_id=seed_id))

    def suggest(
        self,
        term: str,
        max_dist: int = 2,
        limit: int = 5,
        use_buckets: bool | None = None,
    ) -> DataFrame:
        """Spelling suggestion from the term DICTIONARY (did-you-mean):
        terms within levenshtein ``max_dist`` of the query, ranked
        (distance asc, df desc, term asc) -- all integer columns, so the
        ranking is reproducible bit-for-bit by a SQL oracle.

        Two lanes, identical rows.  Brute: one JVM-side levenshtein pass
        over the dictionary behind a ``|len(term) - len(q)| <= max_dist``
        prefilter -- vocabulary-sized, never corpus-sized.  SymSpell
        (``symspell.build_suggest_buckets``): the query's own delete
        variants (driver-side, <= 1+L+L(L-1)/2 strings) IN-filter the
        precomputed delete-neighborhood table -- parquet min/max prunes
        the sorted table to a handful of row groups -- then the exact
        levenshtein verifies candidates only.  The delete bound makes the
        candidate set a superset of every true match, so both lanes rank
        the same rows; at a web-scale vocabulary the bucket lookup is the
        only shape that doesn't scan the dictionary per keystroke.
        ``use_buckets``: None = auto (buckets when present, fresh, and
        built deep enough for ``max_dist``)."""
        self.check_refresh()
        # case-insensitive comparison (both sides folded) so a
        # case-preserving simple-tokenizer dictionary still suggests
        # 'Mango' for 'mangp'; the DISPLAYED term keeps its stored case.
        # Probe-tokenizer dictionaries are already lowercase -- no-op.
        # (The bucket table stores lower(term) variants for the same
        # reason, so both lanes fold identically.)
        q = term.lower()
        from probe_spark.symspell import delete_variants

        if use_buckets is None:
            # auto prefers brute for very long queries: past the
            # SESSION'S parquet IN-pushdown threshold (exact count vs the
            # live conf -- a user-supplied session may run the Spark
            # default of 10) the variant list would collapse to a
            # [min,max] range and the bucket scan loses its pruning --
            # still correct, but strictly worse than one dictionary pass
            threshold = int(
                self.spark.conf.get(
                    "spark.sql.parquet.pushdown.inFilterThreshold", "10"
                )
            )
            use_buckets = (
                self._suggest_buckets_df is not None
                and max_dist <= self._suggest_max_dist
                and len(delete_variants(q, max_dist)) <= threshold
            )
        if use_buckets:
            if (
                self._suggest_buckets_df is None
                or max_dist > self._suggest_max_dist
            ):
                raise ValueError(
                    "suggest(use_buckets=True): no fresh suggest_buckets "
                    f"table built for max_dist={max_dist} under "
                    f"{self.index_dir} (symspell.build_suggest_buckets)"
                )
            cand = (
                self._suggest_buckets_df.filter(
                    F.col("variant").isin(delete_variants(q, max_dist))
                )
                # (variant, term) pairs collapse to candidate terms; df is
                # a per-term constant so any surviving row carries it
                .dropDuplicates(["term"]).select("term", "df")
            )
        else:
            # prefilter on the FOLDED length: lower() can change a term's
            # length (Turkish dotted I), and dist below compares folded
            # forms -- a raw-length prefilter would drop rows the bucket
            # lane (built on lower(term)) keeps, breaking lane identity
            cand = self._terms_df.select(
                "term", F.col("df").cast("long").alias("df")
            ).filter(
                F.abs(F.length(F.lower("term")) - F.lit(len(q))) <= max_dist
            )
        return (
            cand.withColumn(
                "dist",
                F.levenshtein(F.lower(F.col("term")), F.lit(q)).cast("long"),
            )
            .filter(F.col("dist") <= max_dist)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(limit)
        )

    def prefix_search(
        self, prefix: str, max_terms: int = 4, k: int = 10
    ) -> DataFrame:
        """Prefix / trailing-wildcard query (``prefix*``) served entirely
        from the index: the term DICTIONARY expands the prefix to its top
        ``max_terms`` concrete terms (df desc, term asc -- Lucene's
        top-terms-N rewrite, all-integer so a SQL oracle reproduces the
        selection exactly), then the standard disjunctive BM25 bag serves
        the expanded terms from the postings.  Scale shape: the dictionary
        is written range-partitioned + sorted by term
        (indexer.sorted_dictionary), so the StringStartsWith predicate
        pushes to the parquet scan and min/max prunes the expansion to
        the row groups spanning the prefix -- vocabulary row groups, not
        the vocabulary; and an over-broad wildcard can never explode the
        scoring plan because the rewrite is capped at ``max_terms`` terms
        -- the same guard Lucene's rewrite applies."""
        self.check_refresh()
        # case-fold the user prefix to match the index's vocabulary case:
        # the probe tokenizer stores lowercase terms, the simple tokenizer
        # preserves case (so 'Ma' must match dictionary term 'Mango')
        p = prefix.rstrip("*")
        if self._tokenizer != "simple":
            p = p.lower()
        if not p:
            raise ValueError("prefix_search: empty prefix")
        rows = (
            self._terms_df.select(
                "term", F.col("df").cast("long").alias("df")
            )
            .filter(F.col("term").startswith(p))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        sel = [r["term"] for r in rows]
        if not sel:
            return self.spark.createDataFrame(
                [], "rank int, doc_id long, url string, score double"
            )
        plan = elastic.plan_from_index_terms(sel)
        self._reset_match_state()
        scored, _cand, _idfs, _zero = self._match_frames(plan)
        return self._ranked(self._topk_hits(scored, k))

    def facets(
        self,
        query: str,
        meta: DataFrame,
        top_per_facet: int = 3,
    ) -> DataFrame:
        """Faceted result grouping (the Elasticsearch terms-aggregation +
        top_hits analog; the reference's outline format groups hits by
        directory, search_output.rs:2658+ -- grouping by a page-metadata
        dimension is the web-corpus analog): score ALL docs matching
        ``query`` through the index, join the caller's ``meta`` table
        ((url, facet) -- lang, source domain, crawl snapshot, ...), and
        return per-facet match counts plus the top ``top_per_facet`` hits
        per facet by (6dp-rounded score desc, doc_id asc).  Scores are
        rounded BEFORE ranking so summation-order ulps can't flip a facet
        rank across engines.  Scale shape: the scored set stays
        distributed end to end -- one url-keyed join, one hash aggregate
        for the counts, one window partitioned by facet; nothing corpus-
        sized is collected, and a hot facet costs one window partition,
        not a driver loop."""
        from pyspark.sql.window import Window

        self.check_refresh()
        plan = elastic.create_query_plan(query, False)
        self._reset_match_state()
        scored, _cand, _idfs, zero = self._match_frames(plan)
        if zero:
            m = scored.select("doc_id", F.lit(0.0).alias("score"))
        else:
            m = scored.select("doc_id", F.round("score", 6).alias("score"))
        j = m.join(self._docs().select("doc_id", "url"), "doc_id").join(
            meta.select("url", "facet"), "url"
        )
        # counts and ranks as two window functions over the SAME facet
        # partitioning: one exchange, one pass of the scoring pipeline (a
        # separate groupBy+join would re-run the candidate-match + BM25
        # chain a second time -- different exchange, no shuffle reuse)
        w = Window.partitionBy("facet").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        wc = Window.partitionBy("facet")
        return (
            j.withColumn("n_docs", F.count(F.lit(1)).over(wc).cast("long"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= top_per_facet)
            .select("facet", "n_docs", "rank", "url", "score")
        )

    def search_batch(
        self,
        queries: dict[str, str],
        k: int = 10,
        exact: bool = False,
        boost_coverage: bool = False,
        exclude_filenames: bool = False,
    ) -> DataFrame:
        """Serve a whole query SET in ONE Spark action: (query_id, rank,
        doc_id, url, score), per-query top-k, rank partitioned by query_id.

        The cluster serving pattern for an analytic index is a query
        BATCH (relevance labeling of a query log, offline eval sweeps),
        and per-job scheduling overhead -- not scoring -- dominates when
        the queries are issued one action at a time.  Each query's branch
        keeps its own term-pruned postings scan and TakeOrdered top-k
        (exactly the single-query physical plan), the branches are
        unioned lazily, and one action computes them all; Spark schedules
        the branches' stages concurrently inside the job, so the batch
        cost approaches max(branch) instead of sum(branch).

        Driver-side planning is batched too: every query's terms resolve
        through ONE pruned terms-dictionary lookup (term_dfs over the
        union of terms) instead of a lookup action per query.  Rows are
        value-identical to per-query ``search()`` calls -- the batch
        identity test pins this.

        Top-k + hydration are SHARED across branches (half-fused): each
        query keeps its own scoring plan (the single-query physical
        plan), but the scored frames union into ONE query_id-partitioned
        window and ONE url join instead of a per-branch TakeOrdered +
        join + window chain.  Scores are computed by the identical
        per-branch plans, so rows stay f64-exact vs search(); what
        changes is stage count -- the r4 serving trials measured the
        branch-union plan at 0.29 scaling efficiency because per-branch
        top-k/hydration stages are driver fixed cost that more cores
        cannot absorb, and this removes ~2/3 of them (measured 1.4x on
        the 25-ref-query batch)."""
        if not queries:
            raise ValueError("search_batch: empty query set")
        self.check_refresh()
        plans = {
            qid: elastic.create_query_plan(q, exact)
            for qid, q in queries.items()
        }
        # one dictionary lookup for the union of all plain terms (rescue
        # terms resolve per-branch exactly as in search())
        plain = sorted(
            {
                t
                for p in plans.values()
                for t in p.term_indices
                if t not in oracle.rescue_terms(p)
            }
        )
        if plain:
            self.term_dfs(plain)
        # batch-verify the union of cold rescue needles once (one action
        # instead of two driver round-trips per needle per branch)
        rescues = sorted({t for p in plans.values() for t in oracle.rescue_terms(p)})
        if rescues:
            self.warm_rescue_needles(rescues, bool(exclude_filenames))
        from pyspark.sql.window import Window

        scored_parts: list[DataFrame] = []
        zero_parts: list[DataFrame] = []
        for qid in sorted(queries):
            plan = plans[qid]
            self._boost_coverage = boost_coverage
            self._exclude_fn = exclude_filenames
            scored, _cand, _idfs, zero_score = self._match_frames(plan)
            if zero_score:
                # universal / stopword-only / only-excluded: score-0 docs
                # in doc_id order, cut per branch (the k-row cut must see
                # only this query's docs)
                zero_parts.append(
                    scored.orderBy(F.asc("doc_id"))
                    .limit(k)
                    .select(
                        F.lit(qid).alias("query_id"), "doc_id", "url", "score"
                    )
                )
            else:
                scored_parts.append(
                    scored.select(
                        F.lit(qid).alias("query_id"), "doc_id", "score"
                    )
                )
        parts: list[DataFrame] = []
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        if scored_parts:
            allsc = scored_parts[0]
            for p_ in scored_parts[1:]:
                allsc = allsc.unionByName(p_)
            topk = allsc.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= k
            )
            parts.append(
                topk.join(
                    self._docs().select("doc_id", "url"), "doc_id", "left"
                ).select("query_id", "rank", "doc_id", "url", "score")
            )
        if zero_parts:
            allz = zero_parts[0]
            for p_ in zero_parts[1:]:
                allz = allz.unionByName(p_)
            # scores are all 0.0, so the shared (score desc, doc_id asc)
            # rank order reduces to doc_id order -- same as _ranked
            parts.append(
                allz.withColumn("rank", F.row_number().over(w)).select(
                    "query_id", "rank", "doc_id", "url", "score"
                )
            )
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.orderBy(
            F.asc("query_id"), F.asc("rank")
        )

    def search_batch_fused(
        self,
        queries: dict[str, str],
        k: int = 10,
        exact: bool = False,
        boost_coverage: bool = False,
        exclude_filenames: bool = False,
    ) -> DataFrame:
        """search_batch with the per-branch plans FUSED into one join.

        search_batch unions one physical plan per query, so a B-query
        batch schedules O(B) stages -- at cluster scale the driver, not
        the executors, becomes the bottleneck (the r4 serving trials
        measured 0.22 scaling efficiency for the branch-union plan:
        per-branch scheduling is a fixed cost more cores cannot absorb).
        Here eligible queries become DATA instead of plans: a broadcast
        (query_id, term, idf, pos) table is joined once against the
        term-pruned postings, scored per (query_id, doc_id) with the
        SAME sorted-position ordered f64 sum as _score_disjunctive, and
        top-k'd with one window -- one postings scan and one shuffle
        REGARDLESS of batch size, the relevance-labeling /
        offline-eval-sweep plan a 100-TB corpus needs.

        Eligible = left-deep single-keyword operator chains with no field
        filters (_fused_chain_gates): pure disjunctive bags, "keywords
        -noise" bags with conjunctive exclusions, "+required optional"
        queries, and explicit conjunctive AND chains -- probe's dominant
        query-log shapes.  Required / conjunctive matching fuses as a
        GATE COUNT: the broadcast query-term table carries a per-term
        gate flag and the per-query gate total, and docs survive iff
        they matched every gating term (one extra agg column, no extra
        shuffle).  Exclusions fuse as DATA in the same aggregation: each
        excluded term's match rows (postings union memoized containment
        frames, exactly _match_bag_excluded's drop set) ride the same
        broadcast query-term table as idf-0 marker rows, and max(excl)
        applies the drop rule -- no anti-join, no second sort of the
        scored set; marker rows never enter the score array (null-skipped
        by collect_list) so kept docs' scores stay f64-identical.  Cold
        containment needles batch-verify in one union job first
        (warm_rescue_needles) and warm needles merge into one combined
        literal frame.
        Everything else (required/exact/compound/filtered) falls back to
        the branch-union plan and the outputs are unioned.  Rows are
        value-identical to search_batch -- f64-exact: a one-element
        ordered sum is 0.0 + x == x for the single-term case and the
        multi-term association mirrors _score_disjunctive -- pinned by
        the fused-vs-branch identity test.  boost_coverage batches
        delegate wholesale: the single-term branch applies the boost as
        a Python-computed literal (oracle.coverage_boost) whose pow can
        differ from the JVM's in the last ulp."""
        if not queries:
            raise ValueError("search_batch_fused: empty query set")
        if boost_coverage:
            return self.search_batch(
                queries,
                k,
                exact,
                boost_coverage=True,
                exclude_filenames=exclude_filenames,
            )
        self.check_refresh()
        plans = {
            qid: elastic.create_query_plan(q, exact)
            for qid, q in queries.items()
        }
        gates_by_q: dict[str, list[str]] = {}
        for qid, p in plans.items():
            g = _fused_chain_gates(p, self._excl_only_rescues(p))
            if g is not None:
                gates_by_q[qid] = g
        fused = sorted(gates_by_q)
        rest = {qid: queries[qid] for qid in queries if qid not in set(fused)}
        parts = []
        if fused:
            # per-query split: positives feed the scoring join, excluded
            # terms become idf-0 marker rows in the same join (empty for
            # pure bags)
            pos_terms_by_q: dict[str, list[str]] = {}
            excl_terms_by_q: dict[str, list[str]] = {}
            for qid in fused:
                p = plans[qid]
                excl = set(p.excluded_terms)
                pos_terms_by_q[qid] = [
                    t for t in p.term_indices if t not in excl
                ]
                excl_terms_by_q[qid] = [
                    t for t in p.term_indices if t in excl
                ]
            all_terms = sorted(
                {t for qid in fused for t in pos_terms_by_q[qid]}
            )
            dfs = self.term_dfs(all_terms)
            qt_rows = []
            for qid in fused:
                p = plans[qid]
                gates = set(gates_by_q[qid])
                kws = [
                    kw
                    for t in walk_terms(p.ast)
                    if not t.excluded
                    for kw in t.lowercase_keywords
                ]
                for pos, kw in enumerate(kws):
                    qt_rows.append(
                        (
                            qid,
                            kw,
                            oracle.idf(self.n_docs, dfs.get(kw, 0)),
                            pos,
                            1 if kw in gates else 0,
                            len(gates),
                            0,
                        )
                    )
            # exclusions fuse as DATA in the same shuffle: each excluded
            # term contributes MARKER rows (idf 0, pos -1, excl 1) from
            # its token postings union its containment-match frames, and
            # the per-(query, doc) agg adds one max(excl) column -- a doc
            # survives iff no marker row reached it.  The 0.0 marker
            # contributions keep the ordered f64 sum bit-identical
            # (0.0 + 0.0 == 0.0 precedes every real term), and the
            # pre-refactor LeftAnti sort-merge join over the full scored
            # set -- the measured serving bottleneck -- disappears.
            ex_fn = bool(exclude_filenames)
            all_excl = sorted(
                {t for qid in fused for t in excl_terms_by_q[qid]}
            )
            if all_excl:
                # batch-verify cold needles in one action instead of two
                # driver round-trips per needle
                self.warm_rescue_needles(all_excl, ex_fn)
            xt_rows = sorted(
                (qid, t) for qid in fused for t in excl_terms_by_q[qid]
            )
            for qid, t in xt_rows:
                qt_rows.append(
                    (qid, t, 0.0, -1, 0, len(set(gates_by_q[qid])), 1)
                )
            qt = self.spark.createDataFrame(
                qt_rows,
                "query_id string, term string, idf double, pos int, "
                "gate int, n_gate int, excl int",
            )
            post = self._postings_df.filter(
                _term_in("term", sorted(set(all_terms) | set(all_excl)))
            )
            if exclude_filenames:
                if "tf_url" not in self._postings_df.columns:
                    raise ValueError(
                        "exclude_filenames needs the tf_url postings column; "
                        "this index predates it -- rebuild with build_index()"
                    )
                post = post.filter((F.col("tf") - F.col("tf_url")) > 0)
            post = post.select(
                "term",
                "doc_id",
                "tf",
                "doc_len",
                F.lit(0).alias("src"),
            )
            if all_excl:
                dl_t = post.schema["doc_len"].dataType
                tf_t = post.schema["tf"].dataType
                # ONE combined literal frame for every warm needle with a
                # known verified-id list (one stage instead of one
                # one-task stage per needle); per-needle frames only for
                # uncacheable (too-large) or unwarmed needles
                lit_terms: list[str] = []
                lit_ids: list[int] = []
                rest_needles: list[str] = []
                for t in all_excl:
                    ids = self._verified_ids.get((t, ex_fn), None)
                    if isinstance(ids, list):
                        lit_terms += [t] * len(ids)
                        lit_ids += ids
                    else:
                        rest_needles.append(t)
                frames: list[DataFrame] = []
                if lit_terms:
                    import pandas as pd

                    frames.append(
                        self.spark.createDataFrame(
                            pd.DataFrame(
                                {
                                    "term": lit_terms,
                                    "doc_id": pd.Series(
                                        lit_ids, dtype="int64"
                                    ),
                                    "tf": pd.Series(
                                        1, index=range(len(lit_ids)),
                                        dtype="int32",
                                    ),
                                }
                            )
                        )
                    )
                if rest_needles:
                    frames += self._rescue_frames(rest_needles, ex_fn)
                for frame in frames:
                    # markers never score, so doc_len is a placeholder;
                    # src=1 restricts these rows to marker qt rows below
                    # (a containment hit is part of a term's DROP set,
                    # never of its scoring postings)
                    post = post.unionByName(
                        frame.select(
                            "term",
                            "doc_id",
                            F.col("tf").cast(tf_t).alias("tf"),
                            F.lit(1).cast(dl_t).alias("doc_len"),
                            F.lit(1).alias("src"),
                        )
                    )
            p_ = self.params
            tf = F.col("tf").cast("double")
            tf_part = (tf * F.lit(p_.k1 + 1.0)) / (
                tf
                + F.lit(p_.k1)
                * (
                    F.lit(1.0 - p_.b)
                    + F.lit(p_.b)
                    * (F.col("doc_len").cast("double") / F.lit(self.avgdl))
                )
            )
            joined = post.join(F.broadcast(qt), "term").filter(
                # containment-marker rows (src=1) pair only with marker qt
                # rows; token postings pair with both (a token hit both
                # scores a positive term and drops an excluded one)
                ~((F.col("src") == 1) & (F.col("excl") == 0))
            )
            scored = (
                joined.select(
                    "query_id",
                    "doc_id",
                    "pos",
                    "gate",
                    "n_gate",
                    "excl",
                    # marker rows contribute NULL (collect_list skips
                    # nulls, so they never enter the score array; a 0.0
                    # prefix would sum identically -- 0.0 + 0.0 == 0.0 --
                    # but bloats every dropped doc's array for nothing)
                    F.when(
                        F.col("excl") == 0, F.col("idf") * tf_part
                    ).alias("term_score"),
                )
                .groupBy("query_id", "doc_id")
                .agg(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("excl") == 0,
                                F.struct("pos", "term_score"),
                            )
                        )
                    ).alias("arr"),
                    F.sum("gate").alias("gates_hit"),
                    F.first("n_gate").alias("n_gate"),
                    F.max("excl").alias("excl_hit"),
                )
                # gate-count match rule: required / conjunctive-AND chains
                # need every gating term present (postings are unique per
                # (term, doc_id), so gates_hit counts present gate terms);
                # pure bags have n_gate 0 and pass through.  excl_hit = 1
                # means some excluded term's postings or containment set
                # reached this doc: the boolean drop rule, applied in the
                # SAME shuffle
                .filter(
                    (F.col("gates_hit") == F.col("n_gate"))
                    & (F.col("excl_hit") == 0)
                )
                .select(
                    "query_id",
                    "doc_id",
                    F.aggregate(
                        "arr", F.lit(0.0), lambda acc, s: acc + s["term_score"]
                    ).alias("score"),
                )
                .filter(F.col("score") > 0.0)
            )
            from pyspark.sql.window import Window

            w = Window.partitionBy("query_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
            topk = scored.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= k
            )
            parts.append(
                topk.join(self._docs().select("doc_id", "url"), "doc_id", "left")
                .select("query_id", "rank", "doc_id", "url", "score")
            )
        if rest:
            parts.append(
                self.search_batch(
                    rest, k, exact, exclude_filenames=exclude_filenames
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy(F.asc("query_id"), F.asc("rank"))

    def files_only(
        self, query: str, exact: bool = False, exclude_filenames: bool = False
    ) -> DataFrame:
        """All matching docs as (doc_id, url) in doc_id order, NO ranking
        -- the reference's --files-only mode skips AST/ranking and emits
        unique files (search_runner.rs:699-735, cli.rs:24-26).  Unlimited
        by design (the reference returns every candidate file); CLI-level
        --max-results still applies downstream."""
        self.check_refresh()
        plan = elastic.create_query_plan(query, exact)
        self._exclude_fn = exclude_filenames
        try:
            scored, _cand, _idfs, zero_score = self._match_frames(plan)
        finally:
            self._exclude_fn = False
        out = scored.select("doc_id")
        if zero_score:
            out = scored.select("doc_id", "url")
        else:
            out = out.join(self._docs().select("doc_id", "url"), "doc_id", "left")
        return out.select("doc_id", "url").orderBy(F.asc("doc_id"))

    def _match_frames(
        self, plan: QueryPlan
    ) -> tuple[DataFrame, DataFrame | None, dict[str, float] | None, bool]:
        """Shared match+score pipeline: returns (frame, cand, idfs,
        zero_score).  zero_score=True frames are (doc_id, url, score=0)
        doc sets (universal / stopword-only / only-excluded); otherwise
        the frame is (doc_id, score) of ALL matching docs, unranked and
        unlimited -- search() applies top-k, files_only() doesn't."""
        fdocs = self._filtered_docs(plan)

        if plan.is_universal_query:
            docs = fdocs if fdocs is not None else self._docs()
            return (
                docs.select("doc_id", "url").withColumn("score", F.lit(0.0)),
                None,
                None,
                True,
            )

        if not plan.term_indices:
            # all keywords were stop words: no-match path (FIXTURES q18)
            return (
                self._docs()
                .select("doc_id", "url")
                .withColumn("score", F.lit(0.0))
                .limit(0),
                None,
                None,
                True,
            )

        if _bag_plus_exclusions(plan) and oracle.rescue_terms(
            plan
        ) == self._excl_only_rescues(plan):
            return self._match_bag_excluded(plan, fdocs)

        cand = self._candidate_rows(plan)
        ex_key = bool(getattr(self, "_exclude_fn", False))
        rescues_all = oracle.rescue_terms(plan)
        scored_rescues = rescues_all - self._excl_only_rescues(plan)
        if any(
            # SCORED rescue queries run two actions over the candidate rows
            # (the df-count and the scoring job); cache the rows so any
            # embedded doc-store scan runs once (evicted lazily on the next
            # rescue query).  Purely-excluded rescues skip the df job
            # entirely (df substituted in _query_dfs) and memoized dfs
            # skip it too -- in both cases there is a single action and
            # persisting would be pure overhead.
            (t, ex_key) not in self._rescue_df_cache
            for t in scored_rescues
        ):
            if self._cached_cand is not None:
                self._cached_cand.unpersist()
            cand = cand.persist()
            self._cached_cand = cand

        if plan.has_only_excluded_terms:
            # everything NOT containing the excluded terms, score 0,
            # doc_id order (ranking.rs:239-245 + only-excluded fast path)
            docs = fdocs if fdocs is not None else self._docs()
            return (
                docs.join(cand.select("doc_id").distinct(), "doc_id", "leftanti")
                .select("doc_id", "url")
                .withColumn("score", F.lit(0.0)),
                None,
                None,
                True,
            )

        # global df BEFORE field filters narrow the candidate set -- stats
        # are corpus-wide (SURVEY.md SS7.0), filters only restrict results
        dfs = self._query_dfs(plan, cand)

        if fdocs is not None:
            cand = cand.join(fdocs.select("doc_id"), "doc_id", "leftsemi")
        idfs = {t: oracle.idf(self.n_docs, dfs.get(t, 0)) for t in plan.term_indices}

        if _is_disjunctive_bag(plan):
            scored = self._score_disjunctive(cand, plan, idfs)
        else:
            scored = self._score_general(cand, plan, idfs)
        return scored, cand, idfs, False

    def _match_bag_excluded(
        self, plan: QueryPlan, fdocs: DataFrame | None
    ) -> tuple[DataFrame, DataFrame, dict[str, float], bool]:
        """Fast path for "keywords -noise" queries (_bag_plus_exclusions):
        positives scored on the codegen disjunctive path straight off the
        postings (no rescue union, no groupBy merge), exclusions applied
        as ONE anti-join against the excluded terms' match rows (token
        postings ∪ containment, usually a memoized literal frame after
        the needle's first sighting).  Kept docs receive exactly 0.0 from
        every excluded term, so scores are f64-identical to the lane
        scorer; the q-set rank-identity suite pins this."""
        excl = set(plan.excluded_terms)
        pos_terms = [t for t in plan.term_indices if t not in excl]
        excl_terms = [t for t in plan.term_indices if t in excl]
        # positives are plain bag terms (never rescues): postings only
        pos_cand = self._term_rows(plan, pos_terms)
        dfs = self.term_dfs(pos_terms)
        idfs = {
            t: oracle.idf(self.n_docs, dfs.get(t, 0)) for t in pos_terms
        }
        for t in excl_terms:
            # excluded idf only gates the drop decision (tf>0) -- any
            # positive df is equivalent; mirror _query_dfs's substitution
            idfs[t] = oracle.idf(self.n_docs, 1)
        if fdocs is not None:
            pos_cand = pos_cand.join(
                fdocs.select("doc_id"), "doc_id", "leftsemi"
            )
        scored = self._score_disjunctive(pos_cand, plan, idfs)
        # drop set = token postings ∪ containment matches of the excluded
        # terms, doc_id only -- no doc_len join, no (term, doc_id) merge:
        # the anti-join neither needs tf nor cares about duplicate rows
        ex_fn = getattr(self, "_exclude_fn", False)
        post_excl = self._postings_df.filter(
            F.col("term").isin(excl_terms)
        )
        if ex_fn:
            post_excl = post_excl.filter(
                (F.col("tf") - F.col("tf_url")) > 0
            )
        drop = post_excl.select("doc_id")
        for frame in self._rescue_frames(sorted(excl_terms), ex_fn):
            drop = drop.unionByName(frame.select("doc_id"))
        scored = scored.join(drop, "doc_id", "leftanti")
        return scored, pos_cand, idfs, False

    def _ranked(self, hits: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return hits.withColumn("rank", F.row_number().over(w)).select(
            "rank", "doc_id", "url", "score", *extra
        )

    def _hydrate_matches(
        self, hits: DataFrame, cand: DataFrame, idfs: dict[str, float]
    ) -> DataFrame:
        """Rich-result columns for the top-k rows (reference SearchResult,
        models.rs:34-88): matched_keywords = sorted query keywords with a
        posting for the doc; score_breakdown = keyword -> idf * tf_part
        (6dp).  One bounded lookup: candidate rows are semi-joined to the
        <= k hit doc_ids before aggregating, so the hydration cost tracks
        k, not the corpus.  When the engine applies a coverage boost (R7)
        the per-term entries are rescaled by score/sum(raw contributions)
        so the breakdown always sums to the REPORTED score."""
        p = self.params
        tf = F.col("tf").cast("double")
        tf_part = (tf * F.lit(p.k1 + 1.0)) / (
            tf
            + F.lit(p.k1)
            * (
                F.lit(1.0 - p.b)
                + F.lit(p.b)
                * (F.col("doc_len").cast("double") / F.lit(self.avgdl))
            )
        )
        if idfs:
            idf_map = F.create_map(
                *[x for t, v in sorted(idfs.items()) for x in (F.lit(t), F.lit(v))]
            )
            contrib = F.coalesce(idf_map[F.col("term")], F.lit(0.0)) * tf_part
        else:  # empty literal map would be void-typed and fail analysis
            contrib = F.lit(0.0)
        mk = (
            cand.join(hits.select("doc_id"), "doc_id", "leftsemi")
            .select("doc_id", "term", contrib.alias("c"))
            .groupBy("doc_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("term", "c"))).alias("e")
            )
        )
        joined = hits.join(mk, "doc_id", "left")
        # rescale contributions to the reported score (identity when no
        # coverage boost; with boost, each entry carries its share of the
        # multiplier so the map still sums to `score`)
        rawsum = F.aggregate("e", F.lit(0.0), lambda acc, s: acc + s["c"])
        factor = F.when(rawsum > 0.0, F.col("score") / rawsum).otherwise(F.lit(1.0))
        joined = joined.select(
            *[c for c in joined.columns if c != "e"],
            F.transform("e", lambda s: s["term"]).alias("matched_keywords"),
            F.map_from_entries(
                F.transform(
                    "e", lambda s: F.struct(s["term"], F.round(s["c"] * factor, 6))
                )
            ).alias("score_breakdown"),
        )
        return joined.withColumn(
            "matched_keywords",
            F.coalesce("matched_keywords", F.array().cast("array<string>")),
        ).withColumn(
            "score_breakdown",
            F.coalesce(
                "score_breakdown",
                F.map_from_arrays(
                    F.array().cast("array<string>"), F.array().cast("array<double>")
                ),
            ),
        )

    def _score_disjunctive(
        self, cand: DataFrame, plan: QueryPlan, idfs: dict[str, float]
    ) -> DataFrame:
        """Pure-Column BM25 sum, whole-stage codegen.

        Doubles are summed in the SAME order as the oracle (AST keyword
        order) via sort-by-position + sequential F.aggregate -- a plain
        F.sum adds in shuffle-arrival order, which is nondeterministic in
        the last ulp and can flip near-tied ranks between runs."""
        p = self.params
        kw_pos = {
            kw: i
            for i, kw in enumerate(
                kw
                # excluded terms contribute no rows here (pure bags have
                # none; the bag+exclusions path feeds positives only) --
                # keeping them out preserves the single-positive-term
                # no-shuffle branch and the positives' relative sum order
                for t in walk_terms(plan.ast)
                if not t.excluded
                for kw in t.lowercase_keywords
            )
        }
        tf = F.col("tf").cast("double")
        tf_part = (tf * F.lit(p.k1 + 1.0)) / (
            tf
            + F.lit(p.k1)
            * (
                F.lit(1.0 - p.b)
                + F.lit(p.b) * (F.col("doc_len").cast("double") / F.lit(self.avgdl))
            )
        )
        if len(kw_pos) == 1:
            # single-term query: one posting row per doc, nothing to sum --
            # no shuffle at all, straight scan -> score -> top-k
            term = next(iter(kw_pos))
            scored = cand.select(
                "doc_id",
                (F.lit(idfs.get(term, 0.0)) * tf_part).alias("score"),
            ).filter(F.col("score") > 0.0)
            if getattr(self, "_boost_coverage", False):
                # exactly one positive term matched; the denominator is ALL
                # query terms (incl. excluded -- result_ranking.rs:8-18 via
                # oracle.coverage_boost), so cov < 1 when exclusions ride
                # along with the single positive
                scored = scored.withColumn(
                    "score",
                    F.col("score")
                    * F.lit(
                        oracle.coverage_boost(1, len(plan.term_indices))
                    ),
                )
            return scored
        # Multi-term bag: ONE conditional aggregation pivots the candidate
        # rows into per-keyword (tf, doc_len) columns, and the BM25 sum is
        # plain column math over them -- no collect_list/array_sort/lambda
        # F.aggregate (higher-order functions are interpreted, and their
        # plans cost Catalyst 2-3x the analysis/optimization time of a
        # conditional agg; guide SS1.2 step 2 / SS4.1 "prefer built-ins").
        # f64 identity with the old array fold: parts are added in the same
        # kw_pos order starting from the first term, unmatched terms
        # contribute an exact 0.0, and x + 0.0 == x for the non-negative
        # BM25 parts, so every doc's sum sees the identical sequence of
        # f64 additions (pinned by the q01-q25 rank-identity suite).
        ordered = sorted(kw_pos, key=kw_pos.get)
        wide = cand.groupBy("doc_id").agg(
            F.first("doc_len").alias("doc_len"),
            *[
                F.max(F.when(F.col("term") == t, F.col("tf"))).alias(
                    f"_tf{i}"
                )
                for i, t in enumerate(ordered)
            ],
        )

        def _part(i: int, t: str):
            tfd = F.col(f"_tf{i}").cast("double")
            tfp_i = (tfd * F.lit(p.k1 + 1.0)) / (
                tfd
                + F.lit(p.k1)
                * (
                    F.lit(1.0 - p.b)
                    + F.lit(p.b)
                    * (F.col("doc_len").cast("double") / F.lit(self.avgdl))
                )
            )
            return F.when(
                F.col(f"_tf{i}").isNotNull(),
                F.lit(idfs.get(t, 0.0)) * tfp_i,
            ).otherwise(F.lit(0.0))

        score_col = _part(0, ordered[0])
        matched_col = F.col("_tf0").isNotNull().cast("int")
        for i, t in enumerate(ordered[1:], start=1):
            score_col = score_col + _part(i, t)
            matched_col = matched_col + F.col(f"_tf{i}").isNotNull().cast(
                "int"
            )
        scored = wide.select(
            "doc_id",
            score_col.alias("score"),
            matched_col.alias("_matched"),
        ).filter(F.col("score") > 0.0)
        if getattr(self, "_boost_coverage", False):
            n_terms = len(plan.term_indices)
            cov = F.least(
                F.col("_matched").cast("double") / F.lit(float(n_terms)),
                F.lit(1.0),
            )
            scored = scored.withColumn(
                "score",
                F.col("score")
                * (
                    F.lit(1.0)
                    + F.pow(cov, F.lit(oracle.COVERAGE_BOOST_EXP))
                    * F.lit(oracle.COVERAGE_BOOST_MULT)
                ),
            )
        return scored.drop("_matched")

    def _score_general(
        self, cand: DataFrame, plan: QueryPlan, idfs: dict[str, float]
    ) -> DataFrame:
        """Vectorized boolean scorer: pivot candidate rows into per-term tf
        columns with one whole-stage-codegen conditional agg (the only
        shuffle), then evaluate + score the AST as numpy lane ops
        (lanes.eval_and_score) over the Arrow batch -- no per-doc Python.
        Rank identity vs the scalar oracle (evaluate + score_expr) is pinned
        bit-for-bit by tests/test_lanes.py and the q01-q25 suite."""
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        ast = plan.ast
        term_indices = dict(plan.term_indices)
        term_list = plan.terms  # index order; one tf column per query term
        avgdl = self.avgdl
        params = self.params
        boost = getattr(self, "_boost_coverage", False)
        n_terms = len(term_indices)

        out_schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("score", DoubleType()),
            ]
        )

        aggs = [F.first("doc_len").alias("doc_len")]
        for i, t in enumerate(term_list):
            aggs.append(
                F.max(F.when(F.col("term") == t, F.col("tf"))).alias(f"_tf{i}")
            )
        wide = cand.groupBy("doc_id").agg(*aggs)

        def score_batch(iterator):
            import numpy as np
            import pandas as pd

            from probe_spark.lanes import eval_and_score

            empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
            for pdf in iterator:
                if not len(pdf):
                    yield empty
                    continue
                lanes: dict[str, np.ndarray] = {}
                for i, t in enumerate(term_list):
                    col = pdf[f"_tf{i}"]
                    if col.notna().any():
                        lanes[t] = col.fillna(0).to_numpy(np.int64)
                dl = pdf["doc_len"].to_numpy(np.int64)
                keep, scores = eval_and_score(
                    ast, term_indices, lanes, dl, avgdl, idfs, params
                )
                if boost:
                    from probe_spark.oracle import (
                        COVERAGE_BOOST_EXP,
                        COVERAGE_BOOST_MULT,
                    )

                    matched = np.zeros(len(pdf), dtype=np.int64)
                    for lane in lanes.values():
                        matched += lane > 0
                    cov = np.minimum(matched / float(n_terms), 1.0) if n_terms else 0.0
                    scores = scores * (
                        1.0 + cov**COVERAGE_BOOST_EXP * COVERAGE_BOOST_MULT
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].to_numpy(np.int64)[keep],
                        "score": scores[keep],
                    }
                )

        return wide.mapInPandas(score_batch, out_schema)

    def search_local(
        self,
        query: str,
        k: int = 10,
        exact: bool = False,
        timeout: float | None = None,
        exclude_filenames: bool = False,
    ) -> list[tuple[int, float]]:
        """Collect top-k as [(doc_id, score)] -- the oracle-comparable shape.
        ``timeout`` (seconds) cancels the query's Spark job group at the
        deadline and raises QueryTimeoutError, leaving the session usable
        (reference src/search/timeout.rs:1-43; probe_spark.watchdog).

        Serving fast path (guide SS1.2: don't compute what you throw
        away): this entry point returns (doc_id, score) only, so it skips
        search()'s url hydration join and the global rank window and
        collects the top-k cut straight off the scored frame -- one
        TakeOrderedAndProject action for single-term queries instead of
        the 2-3 jobs the hydrated DataFrame path pays.  The k rows and
        their order are identical to search(): same scored frame, same
        (score desc, doc_id asc) cut."""
        from probe_spark.watchdog import query_deadline

        with query_deadline(self.spark, timeout):
            self.check_refresh()
            plan = elastic.create_query_plan(query, exact)
            self._boost_coverage = False
            self._exclude_fn = exclude_filenames
            scored, _cand, _idfs, zero_score = self._match_frames(plan)
            order = (
                [F.asc("doc_id")]
                if zero_score
                else [F.desc("score"), F.asc("doc_id")]
            )
            rows = (
                scored.orderBy(*order)
                .limit(k)
                .select("doc_id", "score")
                .collect()
            )
        return [(int(r["doc_id"]), float(r["score"])) for r in rows]
