"""Text-analysis operators: token stats, quality scoring, marker-based
language ID, document fingerprinting. All pure Catalyst expressions
(split/size/filter/aggregate) — ANSI-SQL-expressible, so every one is
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "from",
]

# tiny marker lexicons for heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, avg_token_len) — whitespace tokens."""
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            (F.length(text_col) - F.size(toks) + 1) / F.size(toks), 6
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features + combined score per doc.

    stopword_ratio (fluency proxy), alpha_ratio (symbol noise proxy),
    length band. score = 0.5·stopword + 0.3·alpha + 0.2·len_ok,
    rounded — deterministic, SQL-expressible.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    stop_ratio = n_stop / n
    alpha_ratio = n_alpha / F.length(text_col)
    len_ok = F.when(
        (F.length(text_col) >= 100) & (F.length(text_col) <= 4000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("id"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        len_ok.alias("len_ok"),
        F.round(
            F.lit(0.5) * stop_ratio + F.lit(0.3) * alpha_ratio + F.lit(0.2) * len_ok,
            6,
        ).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language guess → (id, lang_guess). Explode tokens,
    join the broadcast marker lexicon, argmax with deterministic
    tie-break (marker count desc, lang asc); no hits → 'und'."""
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(w, lang) for lang, ws in LANG_MARKERS.items() for w in ws],
        "tok string, cand string",
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    counts = (
        toks.join(F.broadcast(markers), "tok")
        .groupBy("id", "cand")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    best = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("hits"), F.asc("cand"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("id", F.col("cand").alias("lang_guess"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(best, "id", "left")
        .select("id", F.coalesce("lang_guess", F.lit("und")).alias("lang_guess"))
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized content fingerprint (whitespace-collapsed, lowered,
    md5) — the exact-dup key → (id, fp)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.select(F.col(id_col).alias("id"), F.md5(norm).alias("fp"))


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document repetition: 1 − distinct/total word n-grams →
    (doc_id, n_grams, n_distinct, rep_ratio). The standard
    repetitive-document quality signal (dup-ngram fraction) used to
    down-weight boilerplate in pre-training corpora. Pure projection —
    the n-gram array never leaves the row, so the whole operator is
    map-side with zero shuffles at any corpus size."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = df.select(
        F.col(id_col),
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    return g.select(
        id_col,
        "n_grams",
        "n_distinct",
        F.when(
            F.col("n_grams") > 0,
            F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-sequence packing (the concat-and-chunk assembly step
    of an LLM pretraining pipeline): assign each document to a
    fixed-token-budget pack, deterministically — contiguous packing
    in ``id_col`` order WITHIN each ``shard_col`` shard. A doc's pack
    is ``floor(start_offset / budget)`` where start_offset is the
    running token total of the docs before it in its shard, i.e. the
    pack its first token lands in when the shard's docs are
    concatenated in id order.

    → (doc_id, shard, n_tokens, pack_id) with ``pack_id =
    '<shard>/<bin>'``. Tokens are whitespace tokens (the module's
    counting convention, shared with ``token_stats``).

    Scale shape: ONE partitioned window (cumulative sum per shard) —
    shards are the parallelism unit exactly as in a real packing job
    (each worker packs its own shard stream); no global ordering, no
    partitionless window, no corpus collect. ANSI-SQL-expressible
    (SUM OVER PARTITION BY ... ROWS UNBOUNDED PRECEDING), so
    DuckDB-oracle-checkable."""
    from pyspark.sql import Window

    n_tok = F.size(F.split(F.lower(F.col(text_col)), " "))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(shard_col).alias("shard"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("_cum", F.sum("n_tokens").over(
            Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .withColumn(
            "pack_id",
            F.concat_ws(
                "/",
                F.col("shard"),
                F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(budget))
                .cast("long").cast("string"),
            ),
        )
        .drop("_cum")
    )


# PII patterns shared by the operator and its tests. Written to the
# regex COMMON SUBSET of Java (Spark) and RE2 (DuckDB): no lookaround,
# no backreferences — so the DuckDB oracle replays them verbatim.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}
PII_TOKENS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing for web-scale training corpora: per-doc counts of
    email / IPv4 / phone-shaped spans plus the redacted text with each
    span replaced by a typed token (<EMAIL>/<IP>/<PHONE>) — the
    standard pre-training privacy pass (e.g. what C4/RefinedWeb-style
    pipelines run before tokenization).

    Pure Catalyst: ``regexp_count`` per class + one ``regexp_replace``
    chain — whole-stage-codegen'd, no Python in the hot path, embar-
    rassingly parallel (zero shuffles), so the plan is a bare scan →
    project at any corpus size. Replacement order is email → ipv4 →
    phone; counts are measured on the ORIGINAL text so classes can't
    mask each other (an email's host never counts as an IP unless it
    already matched the IP pattern in the raw text)."""
    text = F.col(text_col)
    out = df.select(
        F.col(id_col).alias("id"),
        *[
            F.regexp_count(text, F.lit(p)).alias(f"n_{name}")
            for name, p in PII_PATTERNS.items()
        ],
        text.alias("_t"),
    )
    red = F.col("_t")
    for name, p in PII_PATTERNS.items():
        red = F.regexp_replace(red, p, PII_TOKENS[name])
    return out.select(
        "id", "n_email", "n_ipv4", "n_phone", red.alias("redacted")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    rate_col,
    salt: int = 2654435761,
) -> DataFrame:
    """Deterministic weighted sampling for training-data curation
    (CCNet/RefinedWeb-style quality-bucket subsampling): keep a row
    iff ``u(id) < rate`` where ``u`` is a Knuth multiplicative hash of
    the id mapped to [0, 1) — reproducible across runs, engines, and
    partitionings (no RNG state, no per-partition seeds), and
    embarrassingly parallel (zero shuffles; the filter pushes to the
    scan). ``rate_col``: a Column giving the per-row keep probability
    (e.g. a quality-bucket CASE expression). Expected kept fraction
    per stratum = its rate; membership is stable under re-runs, so
    downstream dedup/splits stay consistent."""
    u = F.pmod(F.col(id_col) * F.lit(salt), F.lit(4294967296)) / F.lit(
        4294967296.0
    )
    return df.withColumn("_u", u).filter(F.col("_u") < rate_col).drop("_u")


def significant_terms(
    df: DataFrame,
    fg_ids: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    min_fg: int = 2,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Significant terms (Solr SignificantTermsQParser / ES
    significant_terms): terms OVERREPRESENTED in a foreground doc set
    relative to the whole corpus — "what distinguishes the docs
    matching my query". Per term: fg_df (foreground docs containing
    it), bg_df (corpus docs containing it), and the lift
    ``(fg_df / fg_n) / (bg_df / n_docs)``; ranked (lift desc, fg_df
    desc, term asc), terms below ``min_fg`` foreground docs and the
    ``exclude`` list (the query's own terms) dropped.

    Plan: ONE explode + distinct over the corpus tokens feeding two
    map-side-combinable aggregations (bg over everything, fg over the
    semi-joined foreground — the foreground set broadcasts when
    small); output cardinality is vocabulary-sized. No per-doc
    windows, no driver loops — the 100 TB shape."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).distinct()
    n_docs = df.select(id_col).distinct().count()
    fg = fg_ids.select(F.col(fg_ids.columns[0]).alias("_id")).distinct()
    fg_n = fg.count()
    if fg_n == 0:
        return df.sparkSession.createDataFrame(
            [], "term string, fg_df long, bg_df long, lift double"
        )
    bg_counts = toks.groupBy("term").agg(
        F.countDistinct("_id").cast("long").alias("bg_df")
    )
    fg_counts = (
        toks.join(fg, on="_id", how="left_semi")
        .groupBy("term")
        .agg(F.countDistinct("_id").cast("long").alias("fg_df"))
    )
    out = (
        fg_counts.join(bg_counts, on="term")
        .filter(F.col("fg_df") >= min_fg)
        .withColumn(
            "lift",
            F.round(
                (F.col("fg_df") / F.lit(float(fg_n)))
                / (F.col("bg_df") / F.lit(float(n_docs))),
                4,
            ),
        )
    )
    if exclude:
        out = out.filter(~F.col("term").isin([t.lower() for t in exclude]))
    return out.orderBy(
        F.desc("lift"), F.desc("fg_df"), F.asc("term")
    ).limit(k)


# Gopher rule-filter stopword set (Rae et al. 2021, Appendix A1.1 —
# "contains at least 2 of" this fixed 8-word list)
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher + C4 heuristic quality-rule features per document
    (Rae et al. 2021 Appendix A1.1; Raffel et al. 2020 §2.2) — the
    standard pre-training corpus rule filters, computed as ONE pure
    Catalyst projection (no UDF, no shuffle; the filter pushes to the
    scan when used as a predicate):

      n_words            whitespace tokens
      mean_word_len      total token chars / n_words
      symbol_ratio       ('#' + '...' occurrences) / n_words   (<= 0.1)
      bullet_line_frac   lines starting '- ' / '* ' / '• '      (<= 0.9)
      ellipsis_line_frac lines ending '...'                    (<= 0.3)
      alpha_word_frac    words containing [A-Za-z]             (>= 0.8)
      n_stop_hits        DISTINCT Gopher stopwords present     (>= 2)
      term_punct_line_frac  C4: lines ending . ! ? or "
      n_sentences        count of . ! ? characters             (>= 3)
      has_lorem          contains 'lorem ipsum'                (== 0)
      gopher_pass        all Gopher thresholds (50 <= n_words <=
                         100000, 3 <= mean_word_len <= 10, plus the
                         four ratio rules above)
      c4_pass            n_sentences >= 3 AND NOT has_lorem

    Every feature is replayable in ANSI SQL (list_filter/list_
    transform on the same splits), so the whole rule set is DuckDB-
    oracle-checkable; ratios round to 6 like the other textstats."""
    txt = F.col(text_col)
    toks = F.split(txt, " ")
    n_words = F.size(toks)
    mean_wl = (F.length(txt) - n_words + 1) / n_words
    hash_n = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    ell_n = (
        F.length(txt) - F.length(F.regexp_replace(txt, "\\.\\.\\.", ""))
    ) / 3
    symbol_ratio = (hash_n + ell_n) / n_words
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    bullet_n = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ")
            | l.startswith("* ")
            | l.startswith("• "),
        )
    )
    ell_line_n = F.size(F.filter(lines, lambda l: l.endswith("...")))
    tp_n = F.size(
        F.filter(
            lines,
            lambda l: l.endswith(".")
            | l.endswith("!")
            | l.endswith("?")
            | l.endswith('"'),
        )
    )
    alpha_n = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    alpha_frac = alpha_n / n_words
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPS])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(F.split(F.lower(txt), " ")), stop_arr)
    )
    n_sent = F.length(txt) - F.length(F.regexp_replace(txt, "[.!?]", ""))
    lorem = F.lower(txt).contains("lorem ipsum").cast("int")
    bullet_frac = bullet_n / n_lines
    ell_line_frac = ell_line_n / n_lines
    tp_frac = tp_n / n_lines
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_wl >= 3)
        & (mean_wl <= 10)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ell_line_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (n_stop >= 2)
    ).cast("int")
    c4_pass = ((n_sent >= 3) & (lorem == 0)).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ell_line_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stop_hits"),
        F.round(tp_frac, 6).alias("term_punct_line_frac"),
        n_sent.cast("long").alias("n_sentences"),
        lorem.alias("has_lorem"),
        gopher_pass.alias("gopher_pass"),
        c4_pass.alias("c4_pass"),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "is_target",
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): score every document by the log ratio of
    its likelihood under a TARGET-domain n-gram LM vs the RAW-corpus
    LM, log w(x) = Σ_f c_x(f)·[ln p_tgt(f) − ln p_raw(f)] — then
    resample the corpus by weight (the deterministic-hash sampler
    q39 uses composes downstream). Features are unigrams + bigrams
    with additive smoothing over the raw vocabulary:

        p(f) = (C(f) + alpha) / (N + alpha · V)

    with V = distinct raw features, N = that corpus's feature total.
    The paper hashes features into B buckets to bound memory; here
    the feature space is the corpus n-gram vocabulary itself so the
    whole pass stays exactly SQL-replayable — at true 100-TB scale
    swap the feature key for ``xxhash64(f) % B`` (one expression; the
    plan shape is unchanged and the count tables shrink to B rows).

    Output: (id, n_feats, log_weight), HIGHER = more target-like.
    Plan shape: bigrams from one zip_with (no self-join); two
    map-side-combinable count tables (raw, target); scoring is two
    equi-joins on the feature key + one groupBy(doc) — hash shuffles
    only, target/raw totals ride a broadcast one-row dimension."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    heads = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    tails = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigr = F.zip_with(heads, tails, lambda a, b: F.concat_ws(" ", a, b))
    feats = F.concat(toks, bigr)
    fx = df.select(
        F.col(id_col).alias("id"),
        F.col(target_col).cast("int").alias("t"),
        F.explode(feats).alias("f"),
    )
    doc_c = fx.groupBy("id", "f").agg(F.count("*").alias("cdoc"))
    raw_c = fx.groupBy("f").agg(F.count("*").alias("cr"))
    tgt_c = (
        fx.filter(F.col("t") == 1).groupBy("f").agg(F.count("*").alias("ct"))
    )
    dims = raw_c.agg(
        F.sum("cr").alias("nr"), F.count("*").alias("v")
    ).crossJoin(
        fx.filter(F.col("t") == 1).agg(F.count("*").alias("nt"))
    )
    scored = (
        doc_c.join(raw_c, on="f")
        .join(tgt_c, on="f", how="left")
        .crossJoin(F.broadcast(dims))  # one-row dimension
        .withColumn(
            "term",
            F.col("cdoc")
            * (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                    / (F.col("nt") + F.lit(alpha) * F.col("v"))
                )
                - F.log(
                    (F.col("cr") + F.lit(alpha))
                    / (F.col("nr") + F.lit(alpha) * F.col("v"))
                )
            ),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.sum("cdoc").cast("long").alias("n_feats"),
            F.round(F.sum("term"), round_to).alias("log_weight"),
        )
        .orderBy("id")
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet/Wenzek et al. 2020
    pattern: score each document under a language model trained on
    the corpus itself and filter/bucket by it — here a corpus-level
    bigram LM with additive smoothing instead of external KenLM, so
    the whole pass stays self-contained and SQL-replayable):

        P(w2 | w1) = (C(w1 w2) + alpha) / (C(w1 ·) + alpha · V)

    where C(w1 w2) is the corpus bigram count, C(w1 ·) the count of
    w1 as a bigram FIRST element (so the conditional normalizes), V
    the corpus vocabulary size. Output: (id, n_bigrams, avg_logprob)
    per doc with ≥ 1 bigram — avg natural-log probability of the
    doc's bigrams, rounded; HIGHER = more typical of the corpus (the
    low tail is the unusual/garbled text CCNet's head/middle/tail
    split cuts).

    Plan shape at 100 TB: bigrams materialize JVM-side from one
    arrays_zip over the token split (no self-join, no window); the
    two count tables are map-side-combinable groupBys; the scoring
    pass is two equi-joins on term keys (AQE-broadcast when the
    vocabulary is small) + one final groupBy(doc). Everything is a
    hash shuffle on (term) or (doc) — no skewed cross products."""
    # materialize the token split once per row (same codegen trap as
    # dedup.word_shingles: inlining split() into the slice/zip
    # expressions re-evaluates it several times per row)
    toks = F.col("_toks")
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    split_df = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.col(text_col)), " ").alias("_toks"),
    )
    bg = (
        split_df.select("id", F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    bigram_c = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # C(w1 ·) = Σ_w2 C(w1 w2): derive the first-element counts from
    # the (far smaller) bigram-count table instead of a second full
    # pass + shuffle over the exploded bigrams — integer arithmetic,
    # bit-identical result
    first_c = bigram_c.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        split_df.select(F.explode(toks).alias("w")).agg(
            F.countDistinct("w").alias("v")
        )
    )
    scored = (
        bg.join(bigram_c, on=["w1", "w2"])
        .join(first_c, on="w1")
        .crossJoin(F.broadcast(vocab))  # one-row dimension
        .withColumn(
            "logp",
            F.log(
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("logp"), round_to).alias("avg_logprob"),
        )
        .orderBy("id")
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020):
    rank documents by the heuristic quality score WITHIN each
    language and split the per-language distribution into thirds —
     'head' is the best-scoring third, 'tail' the worst. CCNet does
    this with per-language perplexity-percentile cutoffs; the engine
    uses the same structure over ``quality_score``.

    100-TB plan shape — an EXACT distributed percentile with no
    per-document window: (1) ONE map-side-combinable
    groupBy(lang, quality) count — the heavy pass touches each doc
    once; (2) a cumulative window over the tiny DISTINCT-value table
    (|langs| × |distinct 6-dp scores|, thousands of rows at any
    corpus size, never O(docs)); (3) bucket cutoffs derive from
    integer rank arithmetic (a value's first document's 0-based rank
    vs floor(n/3), floor(2n/3) — all ties land in one bucket, the
    CCNet value-cutoff behavior, and nothing depends on float
    interpolation); (4) the per-value bucket table joins back
    broadcast, so assignment is map-side. Deterministic and
    SQL-replayable end to end.
    """
    from pyspark.sql import Window

    q = quality_score(df, id_col, text_col).select(
        "id", "quality"
    ).join(
        df.select(F.col(id_col).alias("id"), F.col(lang_col).alias("lang")),
        on="id",
    )
    by_val = q.groupBy("lang", "quality").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy("quality")
    # per-lang totals as a broadcast join, not a no-order window —
    # keeps every Window in the plan explicitly partitioned+ordered
    totals = by_val.groupBy("lang").agg(F.sum("cnt").alias("n"))
    ranked = by_val.withColumn(
        "start", F.sum("cnt").over(w) - F.col("cnt")
    ).join(F.broadcast(totals), on="lang")
    buckets = ranked.select(
        "lang",
        "quality",
        F.when(F.col("start") < F.floor(F.col("n") / 3), F.lit("tail"))
        .when(F.col("start") < F.floor(2 * F.col("n") / 3), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
    )
    return q.join(F.broadcast(buckets), on=["lang", "quality"]).select(
        "id", "lang", "quality", "bucket"
    )


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 100,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` term-frequency vocabulary — the standard
    tokenizer-fit / garbage-document signal in training-data prep
    (docs whose tokens mostly miss the vocabulary are noise, OCR
    breakage, or the wrong language).

    Plan shape at 100 TB: ONE explode + map-side-combinable
    groupBy(term) count builds the frequency table; the vocabulary is
    rank-and-cut IN THE PLAN (orderBy count desc, term asc → limit V,
    V bounded by the REQUEST) and broadcasts; per-doc counting is the
    same exploded pass left-joined to the broadcast vocabulary + ONE
    groupBy(doc). Ties at the rank-V boundary break on the term
    string, so the vocabulary is deterministic.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), on="tok", how="left")
    return joined.groupBy("id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1.0).otherwise(0.0))
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )
