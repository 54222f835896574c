"""Result limiting with byte/token budgets (SURVEY.md R9) and output
formatting (SURVEY.md S7).

The reference applies max_results / max_bytes / max_tokens budgets as
running totals over the ranked results (apply_limits,
/root/reference/src/search/search_limiter.rs:22-226), estimating tokens as
bytes/4 before a precise tiktoken pass (:101-160).  tiktoken is not
available in this environment, so the estimate IS the count (documented;
the reference itself ships the same estimate as the fast path).

These run driver-side over the collected top-k (k is small by
construction), exactly like the reference runs them over its final ranked
list.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass
class LimitedResults:
    results: list[dict]
    skipped: int
    limits_applied: bool


def estimate_tokens(text: str) -> int:
    """search_limiter.rs bytes/4 heuristic (tiktoken fast-path estimate)."""
    return max(1, len(text.encode("utf-8")) // 4)


def precise_token_counter():
    """text -> token count: the reference's precise pass
    (search_tokens.rs:333-430).  Resolution order (probe_spark.bpe):
    tiktoken p50k_base when installed -> the pure-Python byte-level BPE
    over a merges file named by PROBE_SPARK_BPE_MERGES (the public
    vocab.bpe) -> None, estimate-only (the reference's own fast path)."""
    from probe_spark.bpe import resolve_counter

    return resolve_counter()


# switch from the bytes/4 estimate to the precise counter once the running
# estimate crosses this fraction of the token budget (the reference's lazy
# tiktoken threshold, search_limiter.rs:101-160)
_PRECISE_THRESHOLD = 0.9


def apply_limits(
    rows: list[dict],
    max_results: int | None = None,
    max_bytes: int | None = None,
    max_tokens: int | None = None,
    text_key: str = "url",
    token_counter=None,
) -> LimitedResults:
    """Running-total budgets over ranked rows (search_limiter.rs:22-226).

    ``token_counter`` (text -> int) overrides the precise counter; by
    default tiktoken is used when installed.  Tokens are counted with the
    cheap estimate until the running total reaches 90% of ``max_tokens``,
    then precisely -- the reference's lazy-precise discipline."""
    out: list[dict] = []
    total_bytes = 0
    total_tokens = 0
    skipped = 0
    applied = False
    precise = None
    if max_tokens is not None:
        precise = token_counter or precise_token_counter()
    for row in rows:
        text = str(row.get(text_key, ""))
        nb = len(text.encode("utf-8"))
        nt = estimate_tokens(text)
        if (
            precise is not None
            and max_tokens is not None
            and total_tokens + nt >= _PRECISE_THRESHOLD * max_tokens
        ):
            nt = precise(text)
        if max_results is not None and len(out) >= max_results:
            skipped += 1
            applied = True
            continue
        if max_bytes is not None and total_bytes + nb > max_bytes and out:
            skipped += 1
            applied = True
            continue
        if max_tokens is not None and total_tokens + nt > max_tokens and out:
            skipped += 1
            applied = True
            continue
        out.append(row)
        total_bytes += nb
        total_tokens += nt
    return LimitedResults(out, skipped, applied)


def format_results(
    rows: list[dict], fmt: str = "text", terms: list[str] | None = None
) -> str:
    """S7 output formatters: text / json / markdown / xml / outline /
    outline-xml / color / terminal (full web-engine mapping of the
    reference's 8-format set, cli.rs:81, search_output.rs).  ``outline``
    groups hits under their host -- the web analog of the reference
    grouping matches under their file's structural parents
    (search_output.rs:2658+); ``outline-xml`` is its XML rendering.
    ``color`` is the ANSI-highlighted text variant
    (search_output.rs:234-281); pass ``terms`` to highlight query-term
    occurrences inside urls.  ``terminal`` is the decorated human format
    (header box + per-hit lines, results_formatter.rs:10-29)."""
    if fmt == "terminal":
        bold, cyan, reset = "\x1b[1m", "\x1b[36m", "\x1b[0m"
        bar = "─" * 49
        lines = [
            f"{cyan}╭{bar}╮{reset}",
            f"{cyan}│{reset} {bold}Found {len(rows)} results{reset} {cyan}│{reset}",
            f"{cyan}╰{bar}╯{reset}",
            "",
        ]
        for r in rows:
            lines.append(
                f"{bold}{r.get('rank'):>4}{reset}  "
                f"{r.get('score'):>12.6f}  {r.get('url')}"
            )
        return "\n".join(lines)
    if fmt == "outline-xml":
        from urllib.parse import urlparse
        from xml.sax.saxutils import escape

        groups: dict[str, list[dict]] = {}
        for r in rows:
            host = urlparse(str(r.get("url"))).netloc or "(no host)"
            groups.setdefault(host, []).append(r)
        lines = ["<outline>"]
        for host in sorted(groups):
            lines.append(f'  <host name="{escape(host)}">')
            for r in groups[host]:
                path = urlparse(str(r.get("url"))).path or "/"
                lines.append(
                    '    <result rank="{rank}" score="{score:.6f}">{p}'
                    "</result>".format(
                        rank=r.get("rank"),
                        score=r.get("score"),
                        p=escape(path),
                    )
                )
            lines.append("  </host>")
        lines.append("</outline>")
        return "\n".join(lines)
    if fmt == "outline":
        from urllib.parse import urlparse

        groups: dict[str, list[dict]] = {}
        for r in rows:
            host = urlparse(str(r.get("url"))).netloc or "(no host)"
            groups.setdefault(host, []).append(r)
        lines = []
        for host in sorted(groups):
            lines.append(host)
            for r in groups[host]:
                path = urlparse(str(r.get("url"))).path or "/"
                lines.append(
                    f"  {r.get('rank'):>4}  {r.get('score'):>12.6f}  {path}"
                )
        return "\n".join(lines)
    if fmt == "color":
        import re

        bold, green, cyan, yellow, reset = (
            "\x1b[1m", "\x1b[32m", "\x1b[36m", "\x1b[33m", "\x1b[0m",
        )
        pat = (
            re.compile(
                "|".join(
                    re.escape(t) for t in sorted(terms, key=len, reverse=True)
                ),
                re.IGNORECASE,
            )
            if terms
            else None
        )
        out = []
        for r in rows:
            url = str(r.get("url"))
            if pat:
                url = pat.sub(lambda m: f"{yellow}{m.group(0)}{reset}", url)
            out.append(
                f"{bold}{r.get('rank'):>4}{reset}  "
                f"{green}{r.get('score'):>12.6f}{reset}  {cyan}{url}{reset}"
            )
        return "\n".join(out)
    if fmt == "json":
        return json.dumps({"results": rows}, default=str)
    if fmt == "xml":
        from xml.sax.saxutils import escape

        lines = ["<results>"]
        for r in rows:
            lines.append(
                "  <result rank=\"{rank}\" doc_id=\"{doc}\" "
                "score=\"{score:.6f}\">{url}</result>".format(
                    rank=r.get("rank"),
                    doc=r.get("doc_id"),
                    score=r.get("score"),
                    url=escape(str(r.get("url"))),
                )
            )
        lines.append("</results>")
        return "\n".join(lines)
    if fmt == "markdown":
        lines = ["| rank | doc_id | url | score |", "|---|---|---|---|"]
        lines += [
            f"| {r.get('rank')} | {r.get('doc_id')} | {r.get('url')} "
            f"| {r.get('score'):.6f} |"
            for r in rows
        ]
        return "\n".join(lines)
    if fmt == "text":
        def line(r: dict) -> str:
            s = f"{r.get('rank'):>4}  {r.get('score'):>12.6f}  {r.get('url')}"
            if r.get("matched_keywords"):
                s += "  [" + " ".join(r["matched_keywords"]) + "]"
            return s

        return "\n".join(line(r) for r in rows)
    raise ValueError(f"unknown format: {fmt}")


def best_window(
    tokens: list[str], terms, width: int = 10
) -> tuple[int, int, int] | None:
    """Best snippet window for highlighting: among windows of ``width``
    tokens ANCHORED at query-term hits, the one holding the most DISTINCT
    query terms; ties broken by more total hits, then earliest start.
    (An optimal fixed-width window can always be shifted right until its
    first token is a hit without losing content, so hit-anchoring loses
    nothing and makes the winner deterministic -- the same rule the
    SNIPPET_SQL DuckDB oracle implements.)  Positions are 1-based over the
    RAW token list (empties included) to mirror SQL generate_subscripts.
    Returns (start, n_distinct_terms, n_hits), or None when no token
    matches."""
    tset = set(terms)
    hits = [(i + 1, t) for i, t in enumerate(tokens) if t in tset]
    best: tuple[tuple[int, int, int], int, int, int] | None = None
    for s, _ in hits:
        inw = [(p, t) for p, t in hits if s <= p <= s + width - 1]
        key = (-len({t for _, t in inw}), -len(inw), s)
        if best is None or key < best[0]:
            best = (key, s, -key[0], -key[1])
    if best is None:
        return None
    _, s, n_terms, n_hits = best
    return s, n_terms, n_hits
