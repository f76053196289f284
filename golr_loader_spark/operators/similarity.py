"""Similarity search over embedding columns (array<float/double>).

Brute-force cosine top-k as the exact baseline, and a random-
hyperplane LSH-bucketed variant as the scale path (bucket join
instead of full cross product). Dot products stay JVM-side via
``F.zip_with`` + ``F.aggregate`` — no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id → (query_id, rank,
    neighbor_id, cos_sim). The query side is tiny → broadcast; the
    corpus side streams (one pass, no shuffle before the top-k
    window)."""
    q = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    pairs = (
        embeddings.alias("c")
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            # round BEFORE ranking (the module float discipline: rank
            # by the rounded value + integer tie-break, so sub-1e-6
            # float jitter can never flip the top-k order)
            "cos_sim",
            F.round(
                _dot(F.col(vec_col), F.col("qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col(id_col).alias("neighbor_id"),
            "cos_sim",
        )
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes —
    the bucket key for approximate search."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(x) for x in p])) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        * F.lit(1 << i)
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via MULTI-TABLE random-hyperplane LSH:
    ``n_tables`` independent signatures of ``n_planes`` bits each; a
    corpus vector is a candidate if it collides with the query in ANY
    table (recall ≈ 1-(1-p^b)^L, the classic LSH amplification), then
    exact scoring on the deduped candidate set. At corpus scale each
    table is an equi-join on its bucket key — candidate count per
    table drops ~2^n_planes-fold vs the cross product.

    Tuning: per-plane collision probability for a neighbor at angle θ
    is p = 1 − θ/π; per-table it is p^n_planes, amplified to
    1 − (1 − p^n_planes)^n_tables. Pick n_planes from the target
    neighbor tightness (clustered near-dups → more planes, diffuse
    corpora → fewer) and n_tables from the target recall — the
    recall@10 ≥ 0.9 pytest gate pins (3, 16) for the diffuse test
    embeddings.

    ``dim``: pass the known embedding width to skip the one-row
    bootstrap action (one tiny driver job otherwise)."""
    dim = dim or len(embeddings.select(vec_col).first()[0])
    b = embeddings
    bucket_cols = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + 1000 * t)
        col = f"b{t}"
        b = b.withColumn(col, lsh_bucket(F.col(vec_col), planes))
        bucket_cols.append(col)
    b = b.cache()
    q = b.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        *[F.col(c).alias(f"q{c}") for c in bucket_cols],
    )
    cand = None
    for c in bucket_cols:
        hit = b.join(F.broadcast(q), b[c] == q[f"q{c}"]).select(
            "query_id", id_col, vec_col, "qvec"
        )
        cand = hit if cand is None else cand.unionAll(hit)
    pairs = (
        cand.dropDuplicates(["query_id", id_col])
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col(vec_col), F.col("qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col(id_col).alias("neighbor_id"),
            "cos_sim",
        )
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-means (Lloyd) training for the IVF coarse quantizer, as pure
    DataFrame jobs — the FAISS ``train()`` analog. Initialization is
    the same deterministic stride sample ``ivf_cosine_topk`` uses
    untrained, so n_iters=0 reproduces the oracle-checkable quantizer
    exactly; each iteration is:

    * **assign** — the identical broadcast nested-loop argmin the IVF
      operator runs at query time (cosine, rounded-6 lexicographic
      ``min(struct(−cos, cell))`` — map-side combinable, plan size
      O(1) in n_cells);
    * **update** — ``posexplode`` the assigned vectors and take the
      per-(cell, dimension) mean: one groupBy with output cardinality
      n_cells × dim, then re-assemble the centroid arrays ordered by
      dimension. Entirely JVM-side; no Python UDFs.

    Returns (cell, cvec); cells that lose all members simply drop out
    (as in FAISS). Feed the result to ``ivf_cosine_topk(...,
    centroids=...)`` — training only moves the Voronoi partition, so
    every correctness property of the untrained index carries over,
    and recall at equal n_probe strictly improves on clustered data
    (pytest-pinned)."""
    n = embeddings.count()
    stride = max(1, -(-n // n_cells))
    cent = (
        embeddings.filter(F.col(id_col) % stride == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
    )
    for _ in range(n_iters):
        neg = -F.round(
            _dot(F.col(vec_col), F.col("cvec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("cvec"))),
            6,
        )
        assigned = (
            embeddings.join(F.broadcast(cent))
            .withColumn(
                "_nc", F.struct(neg.alias("neg"), F.col("cell").alias("cell"))
            )
            .groupBy(id_col)
            .agg(
                F.min("_nc")["cell"].alias("cell"),
                F.first(vec_col).alias(vec_col),
            )
        )
        cent = (
            assigned.select("cell", F.posexplode(vec_col))
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ),
                    lambda s: s["m"].cast("float"),
                ).alias("cvec")
            )
        )
        # cut lineage between iterations: each round's centroids are a
        # tiny (n_cells × dim) table — materialize instead of stacking
        # n_iters of join+agg plans
        cent = embeddings.sparkSession.createDataFrame(
            cent.collect(), "cell long, cvec array<float>"
        )
    return cent


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_strategy: str = "auto",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an INVERTED-FILE (IVF-flat) index:
    a coarse quantizer partitions the corpus into ``n_cells`` Voronoi
    cells; a query exactly scores only the cells whose centroids it is
    closest to (``n_probe`` of them). This is the FAISS IVF shape —
    the list/probe trade-off (recall ≈ fraction of true neighbors
    inside the probed cells) with candidate cost n_probe/n_cells of
    the corpus instead of all of it.

    The centroids are the corpus vectors at ids 0, stride, 2·stride, …
    (stride = ceil(N/n_cells)) — a deterministic sample, i.e. IVF with
    sampled init and zero Lloyd iterations. That keeps the whole
    operator SQL-expressible (a DuckDB oracle can replay it exactly),
    fully JVM-side in Spark, and admissibly "coarse": any quantizer
    partition is a valid IVF index, training only sharpens recall.

    Plan shape at scale — two centroid strategies, picked by
    ``centroid_strategy`` ("auto" = inline when n_cells ≤ 64, else
    broadcast):

    * **inline** (small n_cells): the centroid table is collected and
      inlined as literals (like the LSH hyperplane constants), so
      corpus assignment is a PURE MAP expression — zero shuffles of
      the corpus. Breaks down at realistic nlist (4k-64k): the
      expression tree carries n_cells array literals, blowing past
      codegen method limits and plan-size sanity.
    * **broadcast** (large n_cells): centroids live in a broadcast
      DataFrame; assignment is a broadcast nested-loop join (corpus ×
      n_cells rows) immediately collapsed by a map-side-combinable
      ``min(struct(−cos, cell))`` groupBy — same FLOPs, one corpus-
      row-count shuffle, plan size O(1) in n_cells. Both strategies
      pick the identical cell (same rounded-cosine lexicographic
      argmin), pytest-pinned.

    Probing then joins candidates on the cell key against the
    broadcast probe table — never a cross product against the corpus.

    ``centroids``: optional pre-trained (cell, cvec) table from
    ``train_ivf_centroids`` — overrides the stride-sample quantizer
    (training sharpens recall at equal n_probe; the untrained default
    stays the SQL-replayable oracle mode).
    """
    spark = embeddings.sparkSession
    if centroids is not None:
        cent_src = centroids.select("cell", "cvec")
    else:
        n = embeddings.count()
        stride = max(1, -(-n // n_cells))  # ceil
        cent_src = (
            embeddings.filter(F.col(id_col) % stride == 0)
            .orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
        )
    if centroid_strategy == "auto":
        centroid_strategy = "inline" if n_cells <= 64 else "broadcast"

    if centroid_strategy == "inline":
        cents = cent_src.collect()

        def cos_cent(v: str, cvec: list[float]) -> Column:
            c = F.array(*[F.lit(float(x)) for x in cvec])
            return F.round(
                _dot(F.col(v), c) / (_norm(F.col(v)) * _norm(c)), 6
            )

        def nearest_cells(v: str) -> Column:
            # sorted array of (−cos, cell) structs: lexicographic
            # struct order = rounded cos desc, cell asc (the module
            # float discipline) — [0] is the assignment, [:n_probe]
            # the probes
            return F.sort_array(
                F.array(
                    *[
                        F.struct(
                            (-cos_cent(v, r["cvec"])).alias("neg"),
                            F.lit(int(r["cell"])).alias("cell"),
                        )
                        for r in cents
                    ]
                )
            )

        assigned = embeddings.withColumn(
            "cell", nearest_cells(vec_col)[0]["cell"]
        )
        probes = (
            embeddings.filter(F.col(id_col).isin(query_ids))
            .select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
            )
            .withColumn(
                "cell",
                F.explode(
                    F.transform(
                        F.slice(nearest_cells("qvec"), 1, n_probe),
                        lambda s: s["cell"],
                    )
                ),
            )
            .select("query_id", "qvec", "cell")
        )
    elif centroid_strategy == "broadcast":
        cents_df = F.broadcast(cent_src)
        neg = -F.round(
            _dot(F.col(vec_col), F.col("cvec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("cvec"))),
            6,
        )
        # corpus assignment: broadcast NL join × n_cells, collapsed by
        # a map-side-combinable min(struct) — the (−cos, cell)
        # lexicographic argmin is IDENTICAL to the inline path's
        assigned = (
            embeddings.join(cents_df)
            .withColumn("_nc", F.struct(neg.alias("neg"), F.col("cell").alias("cell")))
            .groupBy(id_col)
            .agg(
                F.min("_nc")["cell"].alias("cell"),
                F.first(vec_col).alias(vec_col),
            )
        )
        qsrc = embeddings.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
        qneg = -F.round(
            _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
            6,
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.asc("_neg"), F.asc("cell")
        )
        probes = (
            qsrc.join(cents_df)
            .withColumn("_neg", qneg)
            .withColumn("_r", F.row_number().over(wq))
            .filter(F.col("_r") <= n_probe)
            .select("query_id", "qvec", "cell")
        )
    else:
        raise ValueError(f"unknown centroid_strategy {centroid_strategy!r}")
    pairs = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col(vec_col), F.col("qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "cos_sim")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, LSH-
    blocked (bucket self-join) → (id_a, id_b, cos_sim). ``dim``:
    pass the known embedding width to skip the one-row bootstrap
    action."""
    dim = dim or len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    b = embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, "bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .withColumn(
            # round-then-threshold: same discipline as the q27 brute
            # twin, so the LSH-blocked and exact paths agree at the
            # threshold boundary
            "cos_sim",
            F.round(
                _dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
                / (_norm(F.col(f"l.{vec_col}")) * _norm(F.col(f"r.{vec_col}"))),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            "cos_sim",
        )
        .distinct()
    )


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    tau: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings, then marking within-
    cluster near-duplicates by pairwise cosine — the cluster blocks
    the quadratic comparison, which is the whole published design.
    Output: (vec_id, cluster, is_dup) for every input vector, ordered
    by vec_id; ``is_dup`` is true when a LOWER-id vector in the same
    cluster has cosine ≥ tau (keep-lowest-id canonicalization, the
    same keeper rule as the exact-dedup family).

    ``centroids``: [(cid, vector)] cluster centers; defaults to the
    first ``n_clusters`` vectors by id (deterministic, SQL-replayable
    — swap in ``train_ivf_centroids`` output for quality at scale).
    Assignment = argmax cosine, ties to the LOWEST cid; cosines are
    rounded to ``round_to`` BEFORE the argmax and the tau threshold
    (the module's round-then-compare float discipline).

    Plan shape at 100 TB: assignment is ZERO-shuffle — the K centroid
    cosines are one array column built from broadcast literals and
    ``array_position(arr, array_max(arr))`` picks the first maximum
    JVM-side (first = lowest cid, the tie rule). The only wide ops
    are the cluster-blocked self-join (equi-join on cluster id — at
    SemDeDup scale clusters are ~corpus/K, exactly the published
    cost) and the final sort. No driver collect beyond the K
    centroid rows."""
    if centroids is None:
        centroids = [
            (i, list(r[vec_col]))
            for i, r in enumerate(
                embeddings.select(vec_col)
                .orderBy(F.col(id_col).asc())
                .limit(n_clusters)
                .collect()  # bounded: K rows
            )
        ]
    # per-row vector norm computed ONCE and carried alongside the
    # vector: the centroid cosines AND the pairwise stage below reuse
    # it (the old plan re-folded both norms for EVERY candidate pair —
    # O(pairs·dim) array aggregates instead of O(rows·dim)) — same
    # float ops, bit-identical cosines
    vv = F.col("_vec")
    cos_cols = []
    for _cid, cvec in sorted(centroids):
        c = F.array(*[F.lit(float(x)) for x in cvec])
        cnorm = float(np.sqrt(sum(float(x) * float(x) for x in cvec)))
        cos_cols.append(
            F.round(_dot(vv, c) / (F.col("_nrm") * F.lit(cnorm)), round_to)
        )
    arr = F.array(*cos_cols)
    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_vec"),
        _norm(F.col(vec_col)).alias("_nrm"),
    ).select(
        "vec_id",
        "_vec",
        "_nrm",
        (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("cluster"),
    )
    l, r = assigned.alias("l"), assigned.alias("r")
    dup_ids = (
        l.join(r, on="cluster")
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("l._vec"), F.col("r._vec"))
                / (F.col("l._nrm") * F.col("r._nrm")),
                round_to,
            ),
        )
        .filter(F.col("cos_sim") >= tau)
        .select(F.col("r.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("_d", F.lit(True)), on="vec_id", how="left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(F.col("_d"), F.lit(False)).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


def rrf_fuse(
    arms: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner: each arm contributes 1/(k + rank) for
    the ids it ranked, fused score = the sum, missing arms contribute
    0. Output: (id, r0..rN arm ranks nullable, rrf_score) — the top
    rows by (unrounded score desc, id asc), score then rounded.

    Plan shape: each arm is already a bounded top-k list, so the
    fusion is a chain of equi full-outer joins over ≤ Σ k_arm rows —
    broadcast-sized at any corpus scale (fusion cost is a function of
    k, not of the corpus) — followed by orderBy + limit (TakeOrdered,
    no partitionless window)."""
    if not arms:
        raise ValueError("rrf_fuse needs at least one ranked arm")
    named = [
        df.select(
            F.col(id_col).alias("id"),
            F.col(rank_col).cast("long").alias(f"r{i}"),
        )
        for i, df in enumerate(arms)
    ]
    fused = named[0]
    for nxt in named[1:]:
        fused = fused.join(nxt, on="id", how="full_outer")
    score = None
    for i in range(len(arms)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"r{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.withColumn("_s", score)
        .orderBy(F.desc("_s"), F.asc("id"))
        .limit(top)
        .select(
            "id",
            *[f"r{i}" for i in range(len(arms))],
            F.round(F.col("_s"), round_to).alias("rrf_score"),
        )
    )
