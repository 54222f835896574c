"""Deterministic synthetic web-page corpus (FIXTURES.md SS1).

Seed-stable generator for the ``pages`` table mandated by BASELINE.json
input_hint: (url string, warc_ts timestamp, html binary, text string,
lang string).  Every value is a pure function of (SEED, i): doc i is
byte-identical at every scale (prefix property).  ``text`` is DEFINED as
``extract_text(html)``, which makes the per-row byte-identity invariant
self-consistent and testable.

The lexicon deliberately covers every branch of the reference tokenizer
tables (citations in FIXTURES.md SS1): stopwords, special-case words,
exception terms, precomputed compounds, camelCase identifiers, stemming
families, numerals, and negation-looking hyphens.  Word frequencies are
Zipf-skewed so the corpus has genuinely hot head terms (skew handling is
part of the north rule).
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

from probe_spark.extract import extract_text

SEED = 42

_CORE_WORDS = [
    # plain English incl. stopwords (must vanish from the index)
    "the", "and", "for", "with", "from", "this", "that", "have", "will",
    "about", "into", "other", "some", "more", "when", "each", "which",
    # programming stopwords
    "func", "return", "struct", "class", "import", "public", "static",
    # special-case words (never split, never stemmed)
    "whitelist", "graphql", "postgresql", "oauth2", "ipv4", "kubernetes",
    "javascript", "blacklist",
    # exception terms (emitted raw AND stemmed)
    "firewall", "repository", "handler", "middleware", "network", "parser",
    "client", "server", "config", "cache", "queue", "worker", "listener",
    "callback", "validator", "encoder", "decoder", "workflow",
    # precomputed-split compounds
    "hashmap", "codeblock", "filename", "blackmail", "tokenizer",
    "database", "timeout", "deadline", "deadlock", "keyword", "password",
    "backend", "frontend", "microservice", "localhost",
    # camelCase / PascalCase / acronym identifiers
    "parseJSONToHTML5", "APIDefinition", "migrateEndpointMetaByType",
    "OAuth2Provider", "typeIgnore", "enableFirewallWhitelist",
    "HttpClientFactory", "XMLHttpRequest", "getUserById", "snake_case_token",
    "code_block", "error_handler", "retry_policy",
    # stemming families
    "process", "processing", "processed", "processes",
    "definition", "define", "defining", "defined",
    "error", "errors", "handling", "handled", "handles",
    "retry", "retried", "retries", "retrying",
    "migrate", "migration", "migrations", "migrating",
    "connect", "connection", "connections", "connecting",
    "serialize", "serialization", "deserialize",
    "validate", "validation", "validating",
    "deploy", "deployment", "deploying",
    "index", "indexes", "indexing", "indexed",
    # misc technical vocabulary
    "endpoint", "meta", "payload", "latency", "throughput", "shard",
    "partition", "replica", "cluster", "batch", "stream", "buffer",
    "socket", "thread", "mutex", "atomic", "compress", "decompress",
    "upload", "download", "request", "response", "header", "footer",
    "session", "token", "secret", "credential", "permission", "policy",
    "metric", "monitor", "alert", "incident", "postmortem", "runbook",
    "leak", "base", "store", "data", "storage", "memory", "disk",
    # numerals: 0-10 are stopwords, larger numbers are kept
    "0", "1", "2", "3", "5", "7", "10", "42", "256", "1024", "4096", "1999",
    # negation-looking hyphens (exercise T2/T5 negation capture)
    "-deprecated", "-legacy",
]

_TOPICS = [
    "engineering", "security", "databases", "networking", "devops",
    "observability", "frontend", "backend", "tutorials", "postmortems",
    "releases", "performance", "architecture", "testing", "migration",
]

_SLUG_WORDS = [
    "parseJSONToHTML5", "code_block", "firewall-whitelist", "retry_policy",
    "deadlock", "timeout", "hashmap", "oauth2", "handler", "migration",
    "error_handler", "postgresql", "deployment", "indexing", "tokenizer",
]

_LANGS = ["de", "fr"]


def _filler_words(n: int, rng: random.Random) -> list[str]:
    """Deterministic pseudo-words to pad the lexicon to 2000 entries."""
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    out = []
    for _ in range(n):
        syllables = rng.randint(2, 4)
        w = "".join(
            rng.choice(consonants) + rng.choice(vowels)
            for _ in range(syllables)
        )
        if rng.random() < 0.3:
            w += rng.choice(consonants)
        out.append(w)
    return out


def build_lexicon() -> list[str]:
    rng = random.Random(SEED)
    lex = list(_CORE_WORDS)
    lex.extend(_filler_words(2000 - len(lex), rng))
    return lex


_LEXICON = build_lexicon()


@dataclass
class Page:
    url: str
    warc_ts: dt.datetime
    html: bytes
    text: str
    lang: str


def _zipf_pick(rng: random.Random, n: int) -> int:
    """Zipf-skewed index in [0, n): head words are hot."""
    return int(n * (rng.random() ** 2.5))


def make_page(i: int) -> Page:
    rng = random.Random((SEED << 32) + i)
    topic = _TOPICS[i % len(_TOPICS)]
    slug = rng.choice(_SLUG_WORDS)
    url = f"https://site{i % 97}.example.com/{topic}/{slug}-{i}"
    warc_ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=137 * i
    )
    lang = "en" if rng.random() < 0.9 else _LANGS[i % 2]

    n_words = rng.randint(50, 400)
    words = [_LEXICON[_zipf_pick(rng, len(_LEXICON))] for _ in range(n_words)]
    title_words = [
        _LEXICON[_zipf_pick(rng, len(_LEXICON))] for _ in range(rng.randint(3, 6))
    ]
    title = " ".join(title_words)

    # paragraphs of 30-60 words; every ~4th doc gets a <ul>
    body_parts: list[str] = [f"<h1>{title}</h1>"]
    pos = 0
    while pos < len(words):
        step = rng.randint(30, 60)
        chunk = words[pos : pos + step]
        pos += step
        if rng.random() < 0.25 and len(chunk) >= 9:
            items = "".join(
                f"<li>{' '.join(chunk[j:j+3])}</li>" for j in range(0, 9, 3)
            )
            body_parts.append(f"<ul>{items}</ul>")
            rest = chunk[9:]
            if rest:
                body_parts.append(f"<p>{' '.join(rest)}</p>")
        else:
            body_parts.append(f"<p>{' '.join(chunk)}</p>")

    html = (
        "<html><head><title>{t}</title>"
        '<meta charset="utf-8"></head><body>'
        '<nav><a href="/">home</a> <a href="/topics">topics</a> '
        "<span>boilerplate navigation chrome</span></nav>"
        "{body}"
        "<footer>copyright 2025 example corp - boilerplate footer</footer>"
        "</body></html>"
    ).format(t=title, body="".join(body_parts))
    html_bytes = html.encode("utf-8")
    return Page(url, warc_ts, html_bytes, extract_text(html_bytes), lang)


def page_url(i: int) -> str:
    """URL of page ``i`` without building the page.  Replicates exactly
    make_page's first rng draw (slug is the first choice off the
    per-page rng), so ``page_url(i) == make_page(i).url`` always -- the
    sharded oracle sorts 10M+ urls to derive doc_ids without holding
    10M rendered pages (oracle_shard.url_rank_permutation)."""
    rng = random.Random((SEED << 32) + i)
    topic = _TOPICS[i % len(_TOPICS)]
    slug = rng.choice(_SLUG_WORDS)
    return f"https://site{i % 97}.example.com/{topic}/{slug}-{i}"


def make_pages(n: int) -> list[Page]:
    return [make_page(i) for i in range(n)]


def pages_df(spark, n_docs: int):
    """Build the fixture ``pages`` DataFrame (distributed generation: the
    driver ships only the id range; pages materialize on executors)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            rows = [make_page(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r.url for r in rows],
                    "warc_ts": [r.warc_ts for r in rows],
                    "html": [r.html for r in rows],
                    "text": [r.text for r in rows],
                    "lang": [r.lang for r in rows],
                }
            )

    ids = spark.range(0, n_docs).select(F.col("id"))
    return ids.mapInPandas(gen, schema=schema)


def oracle_corpus(n_docs: int, workers: int = 1):
    """The same corpus as an oracle CorpusIndex (doc_id = url sort rank,
    FIXTURES.md SS1).  ``workers > 1`` parallelizes both page generation
    and oracle tokenization over a fork Pool (same kernels, more hosts) --
    used by the large identity runs, where the single-threaded oracle
    build, not the engine, was the bottleneck."""
    from probe_spark.oracle import CorpusIndex, Doc

    if workers > 1 and n_docs >= 10_000:
        from multiprocessing import get_context

        with get_context("fork").Pool(workers) as pool:
            pages = pool.map(make_page, range(n_docs), chunksize=2048)
    else:
        pages = make_pages(n_docs)
    by_url = sorted(pages, key=lambda p: p.url)
    docs = [
        Doc(doc_id=i, url=p.url, text=p.text, lang=p.lang)
        for i, p in enumerate(by_url)
    ]
    return CorpusIndex.build(docs, workers=workers)


def query_log(n_queries: int = 200) -> dict[str, str]:
    """Deterministic MIXED-SHAPE query LOG over the corpus lexicon -- the
    shape a relevance-labeling / offline-eval batch has: 1-3 terms drawn
    from the same Zipf-skewed vocabulary as the corpus (hot terms
    dominate like real logs), ~70% plain bags plus the other dominant
    log shapes (+required prefix, -excluded tail, explicit AND).  Only
    fused-eligible queries are emitted (_fused_chain_gates: left-deep
    single-keyword chains, no compound splits, no stem collisions) so
    the serving-scaling trials measure the queries-as-data join plan,
    not its fallback."""
    from probe_spark import elastic
    from probe_spark.engine import SearchEngine, _fused_chain_gates

    rng = random.Random(SEED + 7)
    words = sorted({w for w in _CORE_WORDS if w.isalpha() and w.islower()})
    out: dict[str, str] = {}
    while len(out) < n_queries:
        k = rng.choice((1, 2, 2, 3))
        terms = rng.sample(words, k)
        shape = rng.random()
        if shape < 0.70 or k == 1:
            q = " ".join(terms)
        elif shape < 0.82:
            q = "+" + " ".join(terms)  # required first term
        elif shape < 0.92:
            q = " ".join(terms[:-1]) + " -" + terms[-1]  # excluded tail
        else:
            q = " AND ".join(terms)  # conjunctive chain
        plan = elastic.create_query_plan(q, False)
        if not plan.term_indices:
            continue
        g = _fused_chain_gates(plan, SearchEngine._excl_only_rescues(plan))
        if g is not None:
            out[f"log{len(out):04d}"] = q
    return out


# The 25 reference queries (FIXTURES.md SS3): one per reference feature
# axis -- plain/stemmed terms, AND/OR/parens, +required/-excluded, quoted
# exact phrases, camelCase/snake_case identifiers, stopword-only, lang:
# field filter.  Canonical here so the identity runs, bench serving
# trials, and tests all sweep the same set.
REFERENCE_QUERIES = {
    "q01": "firewall", "q02": "deadlock", "q03": "error handling",
    "q04": "error AND handling", "q05": "timeout OR deadline",
    "q06": "+firewall whitelist", "q07": "+error +handler",
    "q08": "process -deprecated", "q09": "-deprecated",
    "q10": '"parseJSONToHTML5"', "q11": '"error handling" retry',
    "q12": "(timeout OR deadline) AND retry", "q13": "parseJSONToHTML5",
    "q14": "codeblock", "q15": "hashmap lookup", "q16": "whitelist",
    "q17": "OAuth2Provider", "q18": "the and for", "q19": "processing",
    "q20": "lang:de firewall", "q21": '+retry -"error handling"',
    "q22": "repository OR repositori", "q23": "migrate endpoint meta",
    "q24": "data AND (base OR store) -leak", "q25": "snake_case_token",
}
