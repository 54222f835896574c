"""SymSpell delete-neighborhood suggest lane (probe_spark/symspell.py).

Contract: the bucket lane returns BIT-IDENTICAL rows to the brute
dictionary-levenshtein scan for every query -- recall from the symmetric
-delete bound (lev(a,b) <= d implies a common <= d-delete string),
precision from the exact levenshtein verify on candidates.  These tests
pin that identity (fixed typos + seeded random mutations of real vocab),
the staleness fallback, the depth guard, and the case-preserving
dictionary behavior."""

from __future__ import annotations

import json
import random

import pytest

from probe_spark.symspell import delete_variants


def test_delete_variants_counts():
    # distinct chars: 1 + L + C(L,2) variants
    assert len(delete_variants("abcd", 2)) == 1 + 4 + 6
    assert delete_variants("ab", 1) == ["a", "ab", "b"]
    # repeated chars collapse
    assert set(delete_variants("aa", 1)) == {"a", "aa"}
    assert delete_variants("x", 0) == ["x"]
    # deleting everything is representable ("" bucket only holds terms
    # with len <= max_dist, so it stays tiny at scale)
    assert "" in delete_variants("ab", 2)


def test_delete_bound_holds_for_lev_le_2():
    # the recall guarantee the lane rests on, checked directly on word
    # pairs at each true distance
    pairs = [
        ("kitten", "kitten", 0),
        ("kitten", "kittn", 1),
        ("kitten", "mitten", 1),
        ("kitten", "sitting", 3),
        ("spark", "sprak", 2),  # transposition = 2 plain-lev ops
        ("value", "vale", 1),
        ("line", "lne", 1),
    ]
    for a, b, d in pairs:
        inter = set(delete_variants(a, 2)) & set(delete_variants(b, 2))
        if d <= 2:
            assert inter, (a, b)


@pytest.fixture(scope="module")
def sym_index(spark, tmp_path_factory):
    """300-doc probe-tokenizer index with the SymSpell table built --
    module-private so building buckets doesn't change which lane other
    modules' auto-mode suggest tests exercise."""
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.symspell import build_suggest_buckets

    d = tmp_path_factory.mktemp("symspell") / "ix"
    build_index(spark, pages_df(spark, 300), str(d), n_buckets=2)
    n = build_suggest_buckets(spark, str(d), max_dist=2)
    assert n > 0
    return str(d)


def _rows(df):
    return [(r["term"], r["df"], r["dist"]) for r in df.collect()]


def test_lane_identity_fixed_typos(spark, sym_index):
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, sym_index)
    assert eng._suggest_buckets_df is not None  # lane detected fresh
    for q in ("firewal", "frewall", "gatewya", "xyzzy", "a", ""):
        brute = _rows(eng.suggest(q, 2, 5, use_buckets=False))
        sym = _rows(eng.suggest(q, 2, 5, use_buckets=True))
        assert brute == sym, q
    # d=1 must also agree (subset of the built depth)
    assert _rows(eng.suggest("firewal", 1, 5, use_buckets=True)) == _rows(
        eng.suggest("firewal", 1, 5, use_buckets=False)
    )


def test_lane_identity_seeded_mutations(spark, sym_index):
    """Mutate real vocabulary terms (delete/insert/substitute/swap) and
    require lane identity on every mutant -- the strongest recall check
    short of exhausting the vocabulary."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, sym_index)
    vocab = [r["term"] for r in eng._terms_df.select("term").collect()]
    rng = random.Random(0)
    terms = rng.sample(sorted(vocab), min(12, len(vocab)))
    mutants = []
    for t in terms:
        i = rng.randrange(len(t))
        mutants.append(t[:i] + t[i + 1 :])  # delete
        mutants.append(t[:i] + chr(rng.randrange(97, 123)) + t[i:])  # insert
        mutants.append(t[:i] + chr(rng.randrange(97, 123)) + t[i + 1 :])
        if len(t) >= 2:
            j = rng.randrange(len(t) - 1)
            mutants.append(t[:j] + t[j + 1] + t[j] + t[j + 2 :])  # swap
    for q in mutants:
        assert _rows(eng.suggest(q, 2, 5, use_buckets=False)) == _rows(
            eng.suggest(q, 2, 5, use_buckets=True)
        ), q


def test_stale_manifest_disables_lane(spark, sym_index, tmp_path):
    """A bucket table whose manifest fingerprint no longer matches the
    index must be silently ignored: auto mode falls back to brute (never
    wrong answers from a stale dictionary), explicit use_buckets=True
    raises."""
    import shutil

    from probe_spark.engine import SearchEngine
    from probe_spark.symspell import MANIFEST, load_if_fresh

    d = tmp_path / "ix"
    shutil.copytree(sym_index, d)
    mf = d / MANIFEST
    m = json.loads(mf.read_text())
    m["fingerprint"] = [["bogus.json"], []]
    mf.write_text(json.dumps(m))
    assert load_if_fresh(spark, str(d)) == (None, 0)
    eng = SearchEngine(spark, str(d))
    assert eng._suggest_buckets_df is None
    # auto falls back to the brute lane and still answers correctly
    rows = _rows(eng.suggest("firewal", 2, 5))
    assert any(t == "firewall" and dist == 1 for t, _df, dist in rows)
    with pytest.raises(ValueError, match="suggest_buckets"):
        eng.suggest("firewal", 2, 5, use_buckets=True)


def test_depth_guard(spark, sym_index):
    """max_dist beyond the built depth: auto quietly uses brute, explicit
    bucket request raises (the table cannot guarantee recall there)."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, sym_index)
    brute3 = _rows(eng.suggest("firwl", 3, 5))  # auto -> brute at d=3
    assert brute3 == _rows(eng.suggest("firwl", 3, 5, use_buckets=False))
    with pytest.raises(ValueError, match="max_dist=3"):
        eng.suggest("firwl", 3, 5, use_buckets=True)


def test_variant_filter_reaches_scan(spark, sym_index):
    """The lane's whole point at scale: the lookup must reach the bucket
    table's parquet scan as a variant IN-set (min/max row-group pruning
    on the sorted column), not filter post-scan."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, sym_index)
    plan = (
        eng.suggest("firewal", 2, 5, use_buckets=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "suggest_buckets" in ln and "variant" in ln
    ]
    assert scan and any(
        "INSET" in ln or "In(variant" in ln for ln in plan.splitlines()
    ), plan


def test_mixed_case_dictionary_via_buckets(spark, tmp_path):
    """Case-preserving simple-tokenizer dictionary: buckets are built on
    lower(term) so the lane matches case-insensitively while displaying
    the stored case -- same contract as the brute lane."""
    from pyspark.sql import Row

    from probe_spark.engine import SearchEngine
    from probe_spark.indexer import build_index
    from probe_spark.symspell import build_suggest_buckets

    d = tmp_path / "ix"
    pages = spark.createDataFrame(
        [
            Row(url="doc://00000000", text="Mango Mango Apple kiwi", lang="en"),
            Row(url="doc://00000001", text="pear pear plum", lang="en"),
        ]
    )
    build_index(spark, pages, str(d), n_buckets=2, tokenizer="simple")
    build_suggest_buckets(spark, str(d), max_dist=2)
    eng = SearchEngine(spark, str(d))
    rows = _rows(eng.suggest("mangp", 1, 3, use_buckets=True))
    assert rows == _rows(eng.suggest("mangp", 1, 3, use_buckets=False))
    assert any(t == "Mango" and dist == 1 for t, _df, dist in rows)


def test_suggest_cli_lane_flags(spark, sym_index, capsys):
    from probe_spark.cli import main

    rc = main(
        ["suggest", "--index", sym_index, "--term", "firewal", "--lane", "symspell"]
    )
    out_sym = capsys.readouterr().out
    assert rc == 0
    rc = main(
        ["suggest", "--index", sym_index, "--term", "firewal", "--lane", "brute"]
    )
    out_brute = capsys.readouterr().out
    assert rc == 0 and out_sym == out_brute
    rows = [json.loads(ln) for ln in out_sym.strip().splitlines()]
    assert any(r["term"] == "firewall" and r["dist"] == 1 for r in rows)


def test_build_suggest_cli(spark, tmp_path, capsys):
    from probe_spark.cli import main
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index

    d = tmp_path / "ix"
    build_index(spark, pages_df(spark, 50), str(d), n_buckets=2)
    rc = main(["build-suggest", "--index", str(d), "--max-dist", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["bucket_rows"] > 0 and payload["max_dist"] == 1
    # depth-1 table serves d=1, refuses d=2 explicitly
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, str(d))
    assert eng._suggest_max_dist == 1
    assert _rows(eng.suggest("firewal", 1, 5, use_buckets=True)) == _rows(
        eng.suggest("firewal", 1, 5, use_buckets=False)
    )
    with pytest.raises(ValueError):
        eng.suggest("firewal", 2, 5, use_buckets=True)


def test_live_engine_picks_up_new_buckets(spark, tmp_path):
    """A cached engine must auto-detect a bucket table built AFTER its
    construction (the manifest stat rides the refresh fingerprint), so a
    long-lived server starts serving the lane without reconstruction."""
    from probe_spark.engine import SearchEngine
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.symspell import build_suggest_buckets

    d = tmp_path / "ix"
    build_index(spark, pages_df(spark, 50), str(d), n_buckets=2)
    eng = SearchEngine(spark, str(d))
    assert eng._suggest_buckets_df is None
    before = _rows(eng.suggest("firewal", 2, 5))  # brute
    build_suggest_buckets(spark, str(d), max_dist=2)
    after = _rows(eng.suggest("firewal", 2, 5))  # auto -> lane, same rows
    assert eng._suggest_buckets_df is not None
    assert before == after


def test_auto_lane_prefers_brute_for_long_queries(spark, sym_index):
    """Past the parquet IN-pushdown threshold (~24 chars at d=2) the
    variant IN-list would collapse to an unprunable range, so auto mode
    routes long queries to the brute scan; explicit use_buckets=True
    still works and still agrees."""
    from probe_spark.engine import SearchEngine

    eng = SearchEngine(spark, sym_index)
    long_q = "a" * 30
    # auto == brute rows; explicit buckets agree too (correctness never
    # depends on the routing choice)
    auto = _rows(eng.suggest(long_q, 2, 5))
    assert auto == _rows(eng.suggest(long_q, 2, 5, use_buckets=False))
    assert auto == _rows(eng.suggest(long_q, 2, 5, use_buckets=True))


def test_folded_length_prefilter_unicode(spark, tmp_path):
    """lower() can CHANGE a term's length (Turkish dotted I: len('İİ')=2,
    len('İİ'.lower())=4 -- each İ folds to i + combining dot).  The brute
    lane's length prefilter must use the folded length or it drops terms
    the bucket lane (built on lower(term)) keeps, breaking lane
    identity."""
    from pyspark.sql import Row

    from probe_spark.engine import SearchEngine
    from probe_spark.indexer import build_index
    from probe_spark.symspell import build_suggest_buckets

    d = tmp_path / "ix"
    pages = spark.createDataFrame(
        [Row(url="doc://00000000", text="İİ plain words", lang="tr")]
    )
    build_index(spark, pages, str(d), n_buckets=2, tokenizer="simple")
    build_suggest_buckets(spark, str(d), max_dist=2)
    eng = SearchEngine(spark, str(d))
    # query = folded 'İİ' plus one char: folded-length diff 1, RAW-length
    # diff 3 -- a raw-length prefilter would wrongly drop the term
    q = "İİ".lower() + "x"
    brute = _rows(eng.suggest(q, 2, 5, use_buckets=False))
    sym = _rows(eng.suggest(q, 2, 5, use_buckets=True))
    assert brute == sym
    assert any(t == "İİ" and dist == 1 for t, _df, dist in brute), brute


def test_delete_bound_property():
    """Property form of the recall guarantee: for ANY string a and ANY b
    produced by <= 2 single-character edits (insert/delete/substitute) of
    a, the <= 2-delete neighborhoods intersect.  Pure driver-side -- this
    is the lemma the lane's recall rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "abcxyİ"  # includes a multi-byte char

    def apply_edit(s: str, op: int, pos: int, ch: str) -> str:
        if op == 0:  # insert
            p = pos % (len(s) + 1)
            return s[:p] + ch + s[p:]
        if not s:
            return s
        p = pos % len(s)
        if op == 1:  # delete
            return s[:p] + s[p + 1 :]
        return s[:p] + ch + s[p + 1 :]  # substitute

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet=alphabet, max_size=8),
        st.lists(
            st.tuples(
                st.integers(0, 2),
                st.integers(0, 63),
                st.sampled_from(alphabet),
            ),
            max_size=2,
        ),
    )
    def check(a, edits):
        b = a
        for op, pos, ch in edits:
            b = apply_edit(b, op, pos, ch)
        assert set(delete_variants(a, 2)) & set(delete_variants(b, 2)), (
            a,
            b,
        )

    check()


def test_lane_lifecycle_under_incremental_ingest(spark, tmp_path):
    """Full lifecycle: build -> buckets fresh -> incremental ingest makes
    them stale (auto silently falls back to brute, which sees the NEW
    vocabulary) -> rebuild -> lane fresh again and identical to brute.
    Pins the freshness contract end to end, not just its pieces."""
    from pyspark.sql import Row

    from probe_spark.engine import SearchEngine
    from probe_spark.fixtures import pages_df
    from probe_spark.indexer import build_index
    from probe_spark.streaming.incremental import ingest_batch
    from probe_spark.symspell import build_suggest_buckets

    d = tmp_path / "ix"
    build_index(spark, pages_df(spark, 60), str(d), n_buckets=2)
    build_suggest_buckets(spark, str(d), max_dist=2)
    eng = SearchEngine(spark, str(d))
    eng.suggest("firewal", 2, 3).collect()
    assert eng._suggest_buckets_df is not None  # fresh lane serving

    # ingest a doc carrying a brand-new vocabulary word
    ingest_batch(
        spark,
        spark.createDataFrame(
            [Row(url="doc://zzz", text="zebrafish zebrafish", lang="en")]
        ),
        str(d),
        epoch_id=99,
    )
    # stale lane auto-disabled; brute fallback sees the new word
    rows = _rows(eng.suggest("zebrafis", 2, 3))
    assert eng._suggest_buckets_df is None
    assert any(t == "zebrafish" and dist == 1 for t, _df, dist in rows)
    with pytest.raises(ValueError):
        eng.suggest("zebrafis", 2, 3, use_buckets=True)

    # rebuild refreshes the lane; identical rows through the buckets
    build_suggest_buckets(spark, str(d), max_dist=2)
    sym = _rows(eng.suggest("zebrafis", 2, 3, use_buckets=True))
    assert eng._suggest_buckets_df is not None
    assert sym == _rows(eng.suggest("zebrafis", 2, 3, use_buckets=False))
    assert any(t == "zebrafish" and dist == 1 for t, _df, dist in sym)
