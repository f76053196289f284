"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference operators (per the build brief): exact dedup,
n-gram Jaccard, MinHash+LSH, SimHash. All pure DataFrame/Catalyst —
every step is an equi-join or aggregation with map-side combine, so
each scales by partitioning on the blocking key (hash, shingle,
band signature) with no driver-side state.

Hash function note: ``md5``-prefix → bigint is used (not xxhash64)
because it is reproducible in ANSI SQL engines — the DuckDB oracle
computes the identical values, making every operator here
value-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (a_i, b_i) parameters for 8 universal hash functions over a Mersenne
# prime field — fixed constants so Spark and any SQL oracle agree.
MINHASH_PARAMS = [
    (1299721, 104729),
    (15485863, 32452843),
    (49979687, 86028121),
    (67867967, 2038074743),
    (122949823, 141650939),
    (198491317, 256203161),
    (295075147, 314606869),
    (370248451, 404188577),
]
MERSENNE_P = (1 << 61) - 1


def hash64(col: Column) -> Column:
    """Deterministic 60-bit hash reproducible in SQL:
    bigint(first 15 hex chars of md5)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-free dedup: one hash-groupBy. → (fingerprint,
    n_copies, canonical_id = min id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("canonical_id"))
    )


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc → (id, shingle); docs
    shorter than n tokens yield none. Built with sequence/transform —
    no explode-then-window, the shingling stays inside one projection
    until the final explode. ``array_distinct`` BEFORE the explode is
    the whole dedup: with one input row per id (the documents-table
    contract) the output is already distinct, so no post-explode
    distinct — that would be a full extra shuffle of the largest
    intermediate in the dedup family."""
    # materialize the token split ONCE per row in its own projection:
    # inlining split(lower(text)) into the transform lambda makes
    # codegen re-evaluate the split per gram — O(tokens²) string work
    # per doc (measured 2.6× slower on the shingling stage at sf0.1)
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.split(F.lower(F.col(text_col)), " ").alias("_toks"),
        )
        .select(F.col("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int = 50,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold → (id_a, id_b,
    jaccard). Self-join blocked on shared shingles; shingles hotter
    than ``max_shingle_df`` are dropped first (stop-shingle removal —
    the skew guard that keeps the join linear at corpus scale)."""
    sh = word_shingles(df, id_col, text_col, n)
    # per-shingle df via groupBy (map-side partial agg keeps hot
    # stop-shingles cheap). The hot filter joins against the SMALL
    # derived set only — `hot` (df > cap) — which AQE broadcasts when
    # it fits. No broadcast HINT: hot is data-dependent in size
    # (could be millions of shingles at corpus scale).
    counts = sh.groupBy("shingle").count()
    hot = counts.filter(F.col("count") > max_shingle_df)
    sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    # ONE groupBy(shingle) gathers each cold shingle's doc list —
    # bounded by max_shingle_df (the hot filter ran first), so no
    # giant-row risk — and every downstream quantity derives from it:
    #   * sizes — per-doc cold-shingle counts (re-explode + groupBy,
    #     ALL cold shingles incl. df=1, so Jaccard denominators are
    #     unchanged);
    #   * pairs — a JVM higher-order-function expansion of the sorted
    #     list into its C(df,2) ordered pairs (≤ C(cap,2) per
    #     shingle), replacing the former shingle self-join. The old
    #     plan shuffled the cold shingle set THREE times (sizes agg +
    #     both join sides); this plan shuffles it twice (the list
    #     groupBy + the sizes re-explode) and the pair explosion is a
    #     map-side transform — measured ~2× faster at sf0.1 with
    #     bit-identical output.
    g = sh.groupBy("shingle").agg(F.collect_list("id").alias("ids")).persist()
    sizes = g.select(F.explode("ids").alias("id")).groupBy("id").agg(
        F.count("*").alias("sz")
    )
    sids = F.col("sids")
    pair_structs = F.flatten(
        F.transform(
            sids,
            lambda x, i: F.transform(
                F.slice(sids, i + 2, F.size(sids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    inter = (
        g.filter(F.size("ids") >= 2)
        .select(F.sort_array("ids").alias("sids"))
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature rows → (id, h, minhash) for h in 0..7.
    h_i(x) = (a_i·x + b_i) mod 2^61-1 over the 32-bit shingle hash —
    32 bits so a_i·x never overflows int64 (a_i < 2^31), keeping the
    arithmetic bit-identical between Spark and any SQL oracle."""
    sh = word_shingles(df, id_col, text_col, shingle_n).withColumn(
        "x", hash64(F.col("shingle")) % F.lit(4294967296)
    )
    per_hash = [
        sh.select(
            "id",
            F.lit(i).alias("h"),
            ((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)).alias("hx"),
        )
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    allh = per_hash[0]
    for p in per_hash[1:]:
        allh = allh.unionAll(p)
    return allh.groupBy("id", "h").agg(F.min("hx").alias("minhash"))


def lsh_candidate_pairs(signatures: DataFrame, band_size: int = 2) -> DataFrame:
    """Band the signatures and emit pairs sharing any band →
    (id_a, id_b). The banded group-join is the scale path: candidate
    generation never compares all pairs, only docs colliding in a
    band bucket."""
    banded = (
        signatures.withColumn("band", (F.col("h") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("h", "minhash"))).alias("sig"))
        .withColumn("sig_key", F.md5(F.to_json(F.struct("band", "sig"))))
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, "sig_key")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash over whitespace tokens (tf-weighted) →
    (id, simhash). Cross join with a bit-position dimension (32 rows,
    broadcast) keeps the whole computation in Catalyst."""
    spark = df.sparkSession
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("x", hash64(F.col("tok")))
    )
    bitdim = spark.range(bits).select(F.col("id").cast("int").alias("b"))
    return (
        toks.crossJoin(F.broadcast(bitdim))
        .withColumn(
            "contrib",
            (F.expr("shiftrightunsigned(x, b)") % 2 * 2 - 1) * F.col("tf"),
        )
        .groupBy("id", "b")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bit", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("id")
        .agg(
            F.sum(
                F.col("bit").cast("long") * F.expr("shiftleft(cast(1 as bigint), b)")
            ).alias("simhash")
        )
    )


# diagnostic contract counter (the LAST_COLLECTED_* pattern): number
# of large-star+small-star alternations the last call executed —
# pytest asserts the logarithmic round count on chain graphs
LAST_CC_ROUNDS = 0


def _cc_large_star(edges: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al., Connected Components in MapReduce
    and Beyond): every neighbor LARGER than the center re-attaches to
    min(Γ(center) ∪ {center}). Input/output edges are canonical
    (u > v); the emitted (v_larger, m) keeps that invariant because
    m ≤ center < v_larger."""
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mt = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    )
    return (
        sym.join(mt, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _cc_small_star(edges: DataFrame) -> DataFrame:
    """Small-star: every SMALLER neighbor of a center (plus the center
    itself) attaches to the center's minimum smaller neighbor. With
    canonical (u > v) edges, a center's smaller neighbors are exactly
    its rows as ``u``."""
    mt = edges.groupBy("u").agg(F.min("v").alias("m"))
    e1 = edges.join(mt, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    e2 = mt.select(F.col("u"), F.col("m").alias("v"))
    return e1.unionAll(e2).filter(F.col("u") != F.col("v")).distinct()


def connected_components(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components over an undirected pair graph →
    (id, cluster_id = min id reachable). The step AFTER candidate
    generation in a dedup pipeline: LSH/Jaccard pairs → duplicate
    CLUSTERS → keep one doc per cluster.

    Algorithm: alternating large-star / small-star (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond") — each
    alternation is two groupBy-min + two equi-joins over the CANONICAL
    (u > v) edge list, no driver-side graph state, and the edge set
    converges to min-rooted stars in O(log²) alternations (in practice
    2-3) instead of the graph-DIAMETER rounds min-label propagation
    needs: an adversarial 10⁴-node chain converges in ~5 alternations
    where label propagation would need 10⁴ rounds. Near-dup clusters
    are shallow, so typical inputs converge just as fast as before —
    this closes the adversarial tail, not the common case. Edges are
    cut from lineage every round via localCheckpoint (the iterative-
    plan-blowup guard), and a silent non-fixpoint still raises — split
    clusters would make a downstream dedup silently keep duplicates.
    Same fixpoint labels as min-label propagation (the pinned
    chain/island/cycle pytest fixtures and the q28 DuckDB oracle are
    unchanged); ``LAST_CC_ROUNDS`` records the alternation count.
    """
    global LAST_CC_ROUNDS
    nodes = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.greatest(F.col("id_a"), F.col("id_b")).alias("u"),
            F.least(F.col("id_a"), F.col("id_b")).alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()
    LAST_CC_ROUNDS = 0
    for _ in range(max_iter):
        if n_edges == 0:
            break
        new_edges = _cc_small_star(_cc_large_star(edges)).localCheckpoint()
        LAST_CC_ROUNDS += 1
        n_new = new_edges.count()
        # set equality: both sides are distinct, so equal counts plus
        # an empty one-sided difference means identical edge sets
        if n_new == n_edges and (
            new_edges.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        edges, n_edges = new_edges, n_new
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "alternations — raise max_iter"
        )
    # at the fixpoint the edge set is min-rooted stars: every non-root
    # node carries exactly one (node, root) edge; roots and isolated
    # nodes label themselves
    attach = edges.groupBy(F.col("u").alias("id")).agg(
        F.min("v").alias("_root")
    )
    return nodes.join(attach, "id", "left").select(
        "id", F.coalesce("_root", F.col("id")).alias("cluster_id")
    )


def keep_canonical(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-dedup retention: keep the min-id doc per fingerprint
    (the degenerate fast path every pipeline runs first)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with a held-out benchmark set → (doc_id, n_shared_shingles,
    n_bench_docs). The standard pre-training hygiene pass (the
    published recipes use 8-13-gram exact overlap; n is a knob).

    Plan shape at scale: the benchmark side is tiny relative to the
    corpus (eval sets are thousands of docs, the corpus billions), so
    its distinct shingle set broadcasts and the corpus-side scan
    stays map-side — a broadcast semi-ish join + one agg keyed by the
    contaminated doc, never a corpus self-join."""
    train_sh = word_shingles(df, id_col, text_col, n)
    bench_sh = word_shingles(benchmark, id_col, text_col, n).withColumnRenamed(
        "id", "bench_id"
    )
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def positional_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Every k-token window of every doc WITH its position →
    (id, pos, whash). The positional sibling of ``word_shingles``
    (which distincts and drops positions): exact-substring dedup
    needs every occurrence and where it starts. ``pos`` is the
    0-based token offset of the window start; ``whash`` is
    ``hash64`` of the space-joined window — the md5-prefix discipline
    of this module, so a SQL oracle computes identical values.

    Scale note: the window strings exist only transiently inside one
    whole-stage-codegen projection (posexplode → hash64 pipelines
    row-at-a-time); what shuffles is (id, pos, 8-byte hash) — k×
    smaller than the text. Per-row transient memory is
    O(doc_len × k) chars while the shingle array of ONE document is
    built; for extreme doc lengths cap upstream or split docs into
    overlapping chunks of ~10^5 tokens (windows never span real doc
    boundaries if chunks overlap by k-1)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "gram")
    ).select("id", "pos", hash64(F.col("gram")).alias("whash"))


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    keep_first: bool = True,
) -> DataFrame:
    """Exact-substring duplicate spans (the EXACTSUBSTR dedup of Lee
    et al. 2021, "Deduplicating Training Data Makes Language Models
    Better": any k-token substring that appears more than once in the
    corpus is a duplicate; the canonical occurrence survives) →
    (doc_id, span_start, span_end, span_tokens) — merged, maximal,
    non-overlapping duplicated token ranges per doc ([start, end)).

    Stages, all shuffle-on-key DataFrame ops (the reference paper
    builds a monolithic suffix array — one global sort this engine
    replaces with a hash groupBy, the shuffle-friendly equivalent for
    fixed k):
      1. ``positional_shingles``: every k-window occurrence, hashed;
      2. duplicate detection: groupBy(whash) keeping n ≥ 2 groups and
         the FIRST occurrence min(struct(id, pos)) — ``keep_first``
         drops that canonical occurrence from the duplicate set (set
         False to mark ALL occurrences, the "remove every copy"
         policy some pipelines use);
      3. span merge: per (doc), overlapping/adjacent [pos, pos+k)
         windows coalesce into maximal spans — a per-doc window
         cumulative-max chain (partitioned by doc, never global).

    A hot k-gram (boilerplate license header) makes one big groupBy
    group — bounded by its occurrence count, and the groupBy carries
    only (hash, id, pos) triples; no unblocked self-join anywhere.
    """
    occ = positional_shingles(df, id_col, text_col, k)
    # one row per DUPLICATED hash (count + canonical first occurrence
    # — an agg, never a per-group array: a boilerplate k-gram with
    # 10^8 occurrences stays one fixed-width row), then an equi-join
    # back to the occurrence stream on the hash
    dup_hashes = (
        occ.groupBy("whash")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(F.struct("id", "pos")).alias("first_occ"),
        )
        .filter(F.col("n_occ") >= 2)
        .select("whash", "first_occ")
    )
    dup = occ.join(dup_hashes, "whash")
    if keep_first:
        dup = dup.filter(
            (F.col("id") != F.col("first_occ.id"))
            | (F.col("pos") != F.col("first_occ.pos"))
        )
    # no distinct needed: each (id, pos) emits exactly one window
    dup = dup.select("id", "pos")

    # interval union per doc: a window start opens a NEW span when it
    # begins after the running max end of all earlier windows
    w = Window.partitionBy("id").orderBy("pos")
    spans = (
        dup.withColumn("end", F.col("pos") + F.lit(k))
        .withColumn(
            "prev_max_end",
            F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_span",
            (F.col("prev_max_end").isNull()
             | (F.col("pos") > F.col("prev_max_end"))).cast("int"),
        )
        .withColumn("span_id", F.sum("new_span").over(w))
        .groupBy("id", "span_id")
        .agg(F.min("pos").alias("span_start"), F.max("end").alias("span_end"))
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
    return spans


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Apply ``exact_substring_spans``: cut every duplicated span out
    of each doc (keep-first policy) → the input columns with
    ``text_col`` rewritten plus (total_tokens, dup_tokens). Docs with
    no duplicated span pass through untouched (left join). The cut
    runs as one per-doc projection: filter the token array by
    position against the doc's merged span list (array_contains-free
    — a ``filter`` lambda over an ``exists`` check on the span
    array), then re-join with single spaces."""
    spans = exact_substring_spans(df, id_col, text_col, k)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    toks = F.split(F.lower(F.col(text_col)), " ")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] < sp["span_end"]),
        ),
    )
    out = (
        df.join(per_doc, id_col, "left")
        .withColumn("total_tokens", F.size(toks))
        .withColumn("dup_tokens", F.coalesce("dup_tokens", F.lit(0)))
        .withColumn(
            text_col,
            F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
                F.array_join(F.transform(kept, lambda s: s["t"]), " ")
            ),
        )
        .drop("_spans")
    )
    return out
