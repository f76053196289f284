"""Decontamination + repetition-score + JSON-props operator tests
(training-data pipeline family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from golr_loader_spark.operators.dedup import decontaminate
from golr_loader_spark.operators.textstats import repetition_score


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here with no overlap at all"),
            (3, "quick brown fox jumps over something else entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(train, bench, n=4).collect()}
    assert set(got) == {1, 3}  # doc 2 shares no 4-gram
    # doc 1 shares "the quick brown fox", "quick brown fox jumps",
    # "brown fox jumps over"; doc 3 the latter two
    assert got[1]["n_shared_shingles"] == 3
    assert got[3]["n_shared_shingles"] == 2
    assert got[1]["n_bench_docs"] == 1


def test_decontaminate_short_docs_yield_nothing(spark):
    train = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "too short")], "doc_id long, text string")
    assert decontaminate(train, bench, n=4).count() == 0


def test_repetition_score_bounds_and_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),       # heavy 3-gram repetition
            (2, "one two three four five"),  # all distinct
            (3, "x y"),                    # shorter than n -> 0 grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_score(df, n=3).collect()}
    # doc 1: 6 grams, only 2 distinct ("a b a", "b a b")
    assert got[1]["n_grams"] == 6 and got[1]["n_distinct"] == 2
    assert got[1]["rep_ratio"] == round(1 - 2 / 6, 6)
    assert got[2]["rep_ratio"] == 0.0
    assert got[3]["n_grams"] == 0 and got[3]["rep_ratio"] == 0.0


def test_repetition_score_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = repetition_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_budget_boundaries(spark):
    """Concat-and-chunk packing: a doc's pack is the bin its FIRST
    token lands in; packs are contiguous in doc_id order per shard
    and never interleave shards."""
    from golr_loader_spark.operators.textstats import pack_sequences

    rows = [
        (0, "a b c", "s1"),      # 3 tokens, cum 3  -> bin 0
        (1, "d e f g", "s1"),    # 4 tokens, starts at 3 -> bin 0
        (2, "h i", "s1"),        # starts at 7 -> bin 1
        (3, "j k l m n", "s1"),  # starts at 9 -> bin 1
        (4, "o", "s1"),          # starts at 14 -> bin 2
        (5, "p q r s t u", "s2"),  # own shard: starts at 0 -> bin 0
        (6, "v", "s2"),          # starts at 6 -> bin 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"])
        for r in pack_sequences(df, budget=5, shard_col="source").collect()
    }
    assert got == {
        0: (3, "s1/0"), 1: (4, "s1/0"), 2: (2, "s1/1"),
        3: (5, "s1/1"), 4: (1, "s1/2"), 5: (6, "s2/0"), 6: (1, "s2/1"),
    }


def test_pii_scrub_counts_and_redaction(spark):
    from golr_loader_spark.operators.textstats import pii_scrub

    rows = [
        (0, "mail a.b+c@sub.example.org and x@y.io end"),
        (1, "server at 192.168.0.1 and 10.0.0.255, version 1.2 no"),
        (2, "call 555-123-4567 or 555.987.6543 but not 55-123-4567"),
        (3, "clean text with no pii at all"),
        (4, "combo bob@corp.net from 8.8.8.8 dial 800-555-0100"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r.asDict()
        for r in pii_scrub(df, "doc_id", "text").collect()
    }
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert out[0]["redacted"] == "mail <EMAIL> and <EMAIL> end"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 2, 0)
    assert out[1]["redacted"] == "server at <IP> and <IP>, version 1.2 no"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 2)
    assert "55-123-4567" in out[2]["redacted"]  # 2-digit prefix: not a phone
    assert out[3]["redacted"] == rows[3][1]
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    assert out[4]["redacted"] == "combo <EMAIL> from <IP> dial <PHONE>"


def test_weighted_sample_deterministic_and_stratified(spark):
    from pyspark.sql import functions as F

    from golr_loader_spark.operators.textstats import weighted_sample

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2 == 0).alias("long_doc"),
    )
    rate = F.when(F.col("long_doc"), F.lit(0.8)).otherwise(F.lit(0.2))
    a = {r["doc_id"] for r in weighted_sample(df, "doc_id", rate).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "doc_id", rate).collect()
    }
    assert a == b  # partitioning-independent membership
    longs = sum(1 for d in a if d % 2 == 0) / 10000
    shorts = sum(1 for d in a if d % 2 == 1) / 10000
    assert abs(longs - 0.8) < 0.02 and abs(shorts - 0.2) < 0.02


def test_significant_terms_lift_model(spark):
    from pyspark.sql import functions as F

    from golr_loader_spark.operators.textstats import significant_terms

    rows = [
        (0, "alpha beta common"),
        (1, "alpha beta common"),
        (2, "alpha beta rare common"),
        (3, "common other words"),
        (4, "common more words"),
        (5, "common words again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fg = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    got = {
        r["term"]: (r["fg_df"], r["bg_df"], r["lift"])
        for r in significant_terms(df, fg, "doc_id", "text", min_fg=2).collect()
    }
    # alpha/beta: fg 3/3, bg 3/6 → lift (3/3)/(3/6) = 2.0
    assert got["alpha"] == (3, 3, 2.0) and got["beta"] == (3, 3, 2.0)
    # common: everywhere → lift 1.0; rare: fg_df 1 < min_fg → dropped
    assert got["common"] == (3, 6, 1.0)
    assert "rare" not in got
    # exclusion drops the query's own terms
    got2 = {r["term"] for r in significant_terms(
        df, fg, "doc_id", "text", min_fg=2, exclude=["alpha"]).collect()}
    assert "alpha" not in got2 and "beta" in got2


def test_ccnet_buckets_thirds_and_tie_groups(spark):
    from golr_loader_spark.operators.textstats import ccnet_buckets

    # 9 docs in one language with 3 distinct quality levels (text
    # length drives alpha/stopword ratios identically within a group)
    rows = []
    for i in range(3):
        rows.append((i, "the and of to in is it for on", "en"))        # high stopword
    for i in range(3, 6):
        rows.append((i, "xyzzy qwerty plugh foobar barbaz", "en"))     # no stopwords
    for i in range(6, 9):
        rows.append((i, "the 123 456 789 000 111 222 333", "en"))      # mixed
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["id"]: r for r in ccnet_buckets(df, "doc_id", "text", "lang").collect()}
    assert len(got) == 9
    # each distinct quality value is a tie group → lands in ONE bucket
    by_q = {}
    for r in got.values():
        by_q.setdefault(r["quality"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in by_q.values())
    # thirds: with 3 values × 3 docs, each value is its own bucket,
    # ordered worst→tail, best→head
    qs = sorted(by_q)
    assert by_q[qs[0]] == {"tail"}
    assert by_q[qs[1]] == {"middle"}
    assert by_q[qs[2]] == {"head"}


def test_ccnet_buckets_per_language_independence(spark):
    from golr_loader_spark.operators.textstats import ccnet_buckets

    # same quality value can be head in one language, tail in another
    rows = [
        (0, "the and of to in", "en"),          # best in en
        (1, "xx yy zz ww vv", "en"),
        (2, "aa bb cc dd ee", "en"),
        (3, "the and of to in", "fr"),          # worst tie? no — best in fr too
        (4, "the the the the the and and of to in", "fr"),
        (5, "the and of to in is it for on with", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(df, "doc_id", "text", "lang").collect()
    langs = {r["lang"] for r in out}
    assert langs == {"en", "fr"}
    # every language gets a full partitioning of its docs
    for lang in langs:
        docs = [r for r in out if r["lang"] == lang]
        assert len(docs) == 3
        assert {r["bucket"] for r in docs} <= {"head", "middle", "tail"}


def test_oov_rate_vocab_and_ties(spark):
    from golr_loader_spark.operators.textstats import oov_rate

    df = spark.createDataFrame(
        [
            (0, "aa aa aa bb"),     # aa tf=3, bb tf=2 (w/ doc 1)
            (1, "bb cc dd"),        # cc tf=1, dd tf=1, ee tf=1
            (2, "aa ee ee zz"),     # ee tf=2... recount below
        ],
        "doc_id long, text string",
    )
    # corpus tf: aa=4, ee=2, bb=2, cc=1, dd=1, zz=1
    # vocab_size=2 → top2 by (tf desc, term asc): aa(4), bb(2) — bb
    # beats ee on the term tie-break at tf=2
    got = {r["id"]: r for r in oov_rate(df, "doc_id", "text", 2).collect()}
    assert (got[0]["n_tokens"], got[0]["n_oov"]) == (4, 0)
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (3, 2)   # cc dd
    assert (got[2]["n_tokens"], got[2]["n_oov"]) == (4, 3)   # ee ee zz
    assert got[2]["oov_rate"] == 0.75
