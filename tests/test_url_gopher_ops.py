"""Canonical-URL crawl dedup, Gopher quality-rule filter, Flesch
readability score.

All three entries are under the driver's DuckDB gate (ALL_QUERIES); these
tests pin hand-computed expectations on tiny fixtures so a regression is
caught without the oracle.
"""

from __future__ import annotations

import pandas as pd

from probe_spark.entry_queries import dedup_url_canonical, filter_gopher_rules


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_url_canonical_collapses_all_four_spellings(spark, tmp_path):
    # page key = id % 50, spelling variant = id % 4.  Since 50 is even,
    # ids sharing an even page key can only hit the even variants
    # (www-https and UPPER-trailing-slash) and odd page keys the odd
    # ones (?query and #frag) -- so two fixture families cover all four
    # spellings, and each family must collapse to ONE canonical url.
    rows = [
        # page key 0, variants 0 and 2 (ids 0 and 50 mod 4 = 0, 2)
        (0, "t", "en", "web", 1),
        (50, "t", "en", "web", 1),
        # page key 25, variants 1 and 3 (ids 25, 75)
        (25, "t", "en", "web", 1),
        (75, "t", "en", "web", 1),
        # different source -> never merges
        (100, "t", "en", "wiki", 1),
    ]
    sf_dir = _write_docs(tmp_path, rows)
    out = {
        r["canonical_url"]: r.asDict()
        for r in dedup_url_canonical(spark, sf_dir).collect()
    }
    assert out["web.com/p/0"]["n_variants"] == 2
    assert out["web.com/p/0"]["keeper_doc_id"] == 0
    assert out["web.com/p/25"]["n_variants"] == 2
    assert out["web.com/p/25"]["keeper_doc_id"] == 25
    assert out["wiki.com/p/0"]["n_variants"] == 1
    # canonical form has no scheme, no www, no query, no fragment,
    # no trailing slash, and is lowercase
    for url in out:
        assert "://" not in url and "?" not in url and "#" not in url
        assert not url.startswith("www.") and not url.endswith("/")
        assert url == url.lower()


def test_gopher_rules_signals_and_keep(spark, tmp_path):
    ok_words = ["the", "a", "of"] + ["spark"] * 22  # 25 words, all rules pass
    rows = [
        (1, " ".join(ok_words), "en", "web", 1),
        # too short: 5 words < 20
        (2, "the a of spark join", "en", "web", 1),
        # only one distinct stop word ('the')
        (3, " ".join(["the"] + ["spark"] * 24), "en", "web", 1),
        # mean word length > 10 (25 words x 11 chars)
        (4, " ".join(["the", "a"] + ["abcdefghijk"] * 23), "en", "web", 1),
    ]
    sf_dir = _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in filter_gopher_rules(spark, sf_dir).collect()
    }
    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 25
    assert out[1]["n_stop_distinct"] == 3
    assert out[1]["n_alpha_words"] == 25
    # 3 stop words (3+1+2 chars) + 22x 'spark' (5) = 116 chars
    assert out[1]["word_chars"] == 116
    assert out[2]["keep"] is False and out[2]["n_words"] == 5
    assert out[3]["keep"] is False and out[3]["n_stop_distinct"] == 1
    assert out[4]["keep"] is False
    assert out[4]["word_chars"] > 10 * out[4]["n_words"]


def test_readability_flesch_milli_hand_computed(spark, tmp_path):
    from probe_spark.entry_queries import text_readability

    rows = [
        # doc 0: k = 5 -> n_sent = ceil(6/5) = 2; syllable groups:
        # the(1) quick(1) brown(1) fox(1) jumps(1) over(2) = 7
        (0, "the quick brown fox jumps over", "en", "web", 1),
        # doc 1: k = 6; 'onomatopoeia' has vowel groups o|o|a|o|oeia = 5
        # -> 12 words x 5 = 60 syllables, dense prose scores deeply
        # negative and is dropped
        (1, " ".join(["onomatopoeia"] * 12), "en", "web", 1),
        # doc 2: empty text -> split yields one empty token (n_words 1,
        # the same convention as the Gopher rules), zero syllables
        (2, "", "en", "web", 1),
    ]
    sf_dir = _write_docs(tmp_path, rows)
    out = {
        r["doc_id"]: r.asDict()
        for r in text_readability(spark, sf_dir).collect()
    }
    # doc 0: wps = (6*1000)//2 = 3000, spw = (7*1000)//6 = 1166
    # flesch = 206835 - (1015*3000)//1000 - (846*1166)//10
    #        = 206835 - 3045 - 98643 = 105147
    assert out[0]["n_words"] == 6
    assert out[0]["n_syll"] == 7
    assert out[0]["n_sent"] == 2
    assert out[0]["flesch_milli"] == 105147
    assert out[0]["keep"] is True
    # doc 1: wps = (12*1000)//2 = 6000, spw = (60*1000)//12 = 5000
    # flesch = 206835 - 6090 - 423000 = -222255
    assert out[1]["n_words"] == 12
    assert out[1]["n_syll"] == 60
    assert out[1]["n_sent"] == 2
    assert out[1]["flesch_milli"] == -222255
    assert out[1]["keep"] is False
    # doc 2: degenerate empty doc never divides by zero
    assert out[2]["n_words"] == 1
    assert out[2]["n_syll"] == 0
    assert out[2]["n_sent"] == 1
    assert out[2]["flesch_milli"] == 206835 - 1015
    assert out[2]["keep"] is True
