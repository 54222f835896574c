"""Reranker selector parity (reference cli.rs:35-37): the non-BERT values
all execute the same BM25 ranking (result_ranking.rs routes only ms-marco-*
differently); ms-marco-* errors without the BERT feature."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def cli_index(spark, tiny_index):
    ix, _ = tiny_index
    return ix


def _search(capsys, ix, *extra):
    from probe_spark.cli import main

    rc = main(
        ["search", "--index", ix, "--query", "firewall whitelist", "-k", "5",
         "--format", "json", *extra]
    )
    out = capsys.readouterr()
    return rc, out


def test_non_bert_selectors_are_bm25_aliases(cli_index, capsys):
    results = {}
    for rr in ("bm25", "tfidf", "hybrid", "hybrid2"):
        rc, out = _search(capsys, cli_index, "--reranker", rr)
        assert rc == 0
        results[rr] = json.loads(out.out.strip().splitlines()[-1])["results"]
    base = results["bm25"]
    assert base
    for rr in ("tfidf", "hybrid", "hybrid2"):
        assert results[rr] == base, rr


def test_bert_selector_rejected_without_feature(cli_index, capsys):
    rc, out = _search(capsys, cli_index, "--reranker", "ms-marco-tinybert")
    assert rc == 2
    assert "BERT" in out.err
