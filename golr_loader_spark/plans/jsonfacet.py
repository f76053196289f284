"""Solr JSON Facet API (the modern facet module): nested facets with
per-bucket aggregations.

The classic facet params (facet.field / facet.pivot / stats.field —
already covered by ``facets.facet_counts`` / ``pivot_facet_counts`` /
``stats_field``) were superseded in Solr 5+ by the JSON Facet API:
one request describes a TREE of facets, each bucket carrying
sub-aggregations and sub-facets. This module implements the subset
production golr cores actually use:

* ``{"type": "terms", "field": f, "limit": L, "mincount": M,
  "sort": "count"|"index", "facet": {...}}`` — bucket per field value;
* ``{"type": "query", "q": "<lucene query>", "facet": {...}}`` — one
  bucket counting a subquery;
* ``{"type": "range", "field": f, "start": s, "end": e, "gap": g}``
  — fixed-width numeric buckets in range order, EMPTY BUCKETS
  INCLUDED (Solr's range mincount defaults to 0), values outside
  [start, end) dropped (no before/after/between — documented
  subset); aggregations ride the same single groupBy and the bucket
  count is bounded by the REQUEST, never by data;
* ``numBuckets: true`` (bucket count after mincount, before limit)
  and ``allBuckets: true`` on terms facets — allBuckets uses the
  union reading (distinct matching docs having at least one value;
  equals Solr for single-valued fields, documented divergence for
  multi-valued);
* leaf aggregations ``"sum(f)" | "avg(f)" | "min(f)" | "max(f)"``
  over numeric doc values and ``"unique(f)"`` over a facet field
  (exact, not the streaming sketch Solr uses in distrib mode);
* ONE level of facet nesting (terms/query sub-facets under a
  top-level facet) — the facet.pivot-with-stats shape; deeper trees
  raise a clear ValueError.

Result shape mirrors Solr: ``{"count": N, name: {"buckets": [{"val":
v, "count": n, <aggs>, <subfacets>}...]} | {"count": n, <aggs>}}``.

Plan shape (distributed ``json_facet``): the match set is decoded
once (``matching_doc_ids`` — doc_id streams only, no scores) and
persisted across the facet jobs; every terms facet is ONE
co-located (bucket, doc_id) join + ONE map-side-combinable groupBy
whose output cardinality is the field's distinct-value count; nested
terms facets groupBy (parent, child) in one job with a per-parent
window for the child limit — never a job per bucket. ``unique`` aggs
run as countDistinct in the same groupBy shape. At 100 TB the wide
work is the same two exchanges as ``facet_counts``.

Serving twin: ``json_facet_local`` over a ``LocalSearcher`` (same
spec, dict arithmetic). Sharded twin: ``json_facet_sharded`` asks
each shard for UNTRUNCATED buckets with mergeable partials (count /
sum / min / max / unique VALUE SETS — doc spaces are disjoint so
set-union is exact), merges, then applies sort/limit/mincount once —
the same exact-merge discipline as ``ShardedSearcher.facet_counts``
(Solr needs two-phase refinement because its shards truncate; we
request complete buckets, facet value sets being small).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import InvertedIndex, bucket_of
from golr_loader_spark.plans.facets import matching_doc_ids

_AGG_RE = re.compile(r"^(sum|avg|min|max|unique)\((\w+)\)$")
# Solr percentile agg, single-percentile subset: percentile(field, 50).
# Solr computes these with a t-digest sketch; this engine computes the
# EXACT linear-interpolated percentile (Spark F.percentile ==
# SQL quantile_cont), so the result is deterministic and
# oracle-replayable — at true 100-TB bucket sizes you'd swap the
# partial back to a mergeable sketch, which this fn-string dispatch
# isolates to _agg_partial/_merge_agg/_finalize_agg.
_PCTL_RE = re.compile(r"^percentile\((\w+),(\d+(?:\.\d+)?)\)$")


def _parse_aggs(spec: dict) -> tuple[dict[str, tuple[str, str]], dict[str, dict]]:
    """spec["facet"] → ({agg_name: (fn, field)}, {subfacet_name: spec}).
    fn is sum/avg/min/max/unique or 'percentile:<pct>'."""
    aggs: dict[str, tuple[str, str]] = {}
    subs: dict[str, dict] = {}
    for name, sub in (spec.get("facet") or {}).items():
        if isinstance(sub, str):
            flat = sub.replace(" ", "")
            m = _AGG_RE.match(flat)
            if m:
                aggs[name] = (m.group(1), m.group(2))
                continue
            mp = _PCTL_RE.match(flat)
            if not mp:
                raise ValueError(
                    f"unsupported aggregation {sub!r} "
                    "(sum/avg/min/max/unique/percentile)"
                )
            aggs[name] = (f"percentile:{mp.group(2)}", mp.group(1))
        elif isinstance(sub, dict):
            subs[name] = sub
        else:
            raise ValueError(f"bad facet entry {name!r}")
    return aggs, subs


def _pctl_frac(fn: str) -> float:
    return float(fn.split(":", 1)[1]) / 100.0


def exact_percentile(xs, pct: float):
    """Exact linear-interpolated percentile of a value sequence —
    quantile_cont / Spark F.percentile semantics; None on empty.
    Shared by the serving/sharded stats and facet partial merges."""
    xs = sorted(xs)
    if not xs:
        return None
    pos = (pct / 100.0) * (len(xs) - 1)
    lo = int(pos)
    frac = pos - lo
    return xs[lo] if frac == 0 else xs[lo] + frac * (xs[lo + 1] - xs[lo])


def _agg_exprs(aggs: dict[str, tuple[str, str]]) -> list:
    out = []
    for name, (fn, field) in aggs.items():
        if fn == "unique":
            continue  # joined from the facet table, not numbers
        col = F.col(field)
        if fn.startswith("percentile:"):
            e = F.percentile(col, F.lit(_pctl_frac(fn))).cast("double")
        else:
            e = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[fn](col)
            if fn == "sum":
                e = e.cast("double")
        out.append(e.alias(name))
    return out


# instrumentation for the O(limit)-collect contract test: row count of
# the last _bucket_rows collect (must be ≤ the facet's limit, never the
# distinct-value count)
LAST_COLLECTED_BUCKET_ROWS: int | None = None


def _round4(x):
    return None if x is None else round(float(x), 4)


def _sort_key(sort: str):
    if sort == "index":
        return lambda b: b["val"]
    return lambda b: (-b["count"], b["val"])


def json_facet(
    index: InvertedIndex,
    query: str,
    spec: dict,
    facets: DataFrame,
    cfg: IndexConfig | None = None,
    numbers: DataFrame | None = None,
    mode: str = "or",
    fq=None,
    exclude_ids=None,
) -> dict:
    """Execute a JSON Facet API request tree → nested result dict.

    ``facets``: the (doc_id, bucket, facet, value) table from
    ``build_facets``. ``numbers``: (doc_id, <numeric cols>) doc values
    for sum/avg/min/max aggregations (only the referenced columns are
    read — column pruning reaches the scan)."""
    cfg = cfg or index.cfg
    m = matching_doc_ids(
        index, query, cfg=cfg, mode=mode, exclude_ids=exclude_ids
    )
    if fq is not None:
        from golr_loader_spark.plans.lucene import fq_doc_ids

        m = m.join(
            fq_doc_ids(index, fq, cfg=cfg, exclude_ids=exclude_ids)
            .select("doc_id"),
            on="doc_id",
            how="left_semi",
        )
    m = m.persist()
    try:
        out: dict = {"count": m.count()}
        nums = None
        if numbers is not None:
            nums = numbers.withColumn(
                "bucket",
                bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits),
            )
        for name, fspec in spec.items():
            out[name] = _facet_node(
                index, m, fspec, facets, cfg, nums, depth=0,
                exclude_ids=exclude_ids,
            )
        return out
    finally:
        m.unpersist()


def _joined_values(m: DataFrame, facets: DataFrame, field: str) -> DataFrame:
    """(bucket, doc_id, value) for one facet field over the match set —
    the co-located (bucket, doc_id) equi-join both wide ops build on."""
    fx = facets.filter(F.col("facet") == field).select(
        "bucket", "doc_id", "value"
    )
    return fx.join(m.select("bucket", "doc_id"), on=["bucket", "doc_id"])


def _with_numbers(df: DataFrame, nums: DataFrame | None, fields: set[str]) -> DataFrame:
    if nums is None or not fields:
        return df
    sel = nums.select("bucket", "doc_id", *sorted(fields))
    return df.join(sel, on=["bucket", "doc_id"], how="left")


def _bucket_rows(
    index, m, fspec, facets, cfg, nums, exclude_ids
) -> tuple[list[dict], dict, dict]:
    """One terms facet level → (buckets, aggs, subs). Buckets carry
    count + numeric/unique aggs; sort/limit/mincount applied."""
    field = fspec["field"]
    limit = int(fspec.get("limit", 10))
    mincount = int(fspec.get("mincount", 1))
    sort = fspec.get("sort", "count")
    aggs, subs = _parse_aggs(fspec)
    num_fields = {f for fn, f in aggs.values() if fn != "unique"}
    jv = _joined_values(m, facets, field)
    base = _with_numbers(jv, nums, num_fields).groupBy("value").agg(
        F.count(F.lit(1)).cast("long").alias("count"), *_agg_exprs(aggs)
    )
    uniq = {n: (fn, f) for n, (fn, f) in aggs.items() if fn == "unique"}
    for uname, (_fn, ufield) in uniq.items():
        child = facets.filter(F.col("facet") == ufield).select(
            "bucket", "doc_id", F.col("value").alias("_uv")
        )
        u = (
            jv.join(child, on=["bucket", "doc_id"])
            .groupBy("value")
            .agg(F.countDistinct("_uv").cast("long").alias(uname))
        )
        base = base.join(u, on="value", how="left")
    # rank + truncate DISTRIBUTED-side for both supported sorts — the
    # single-index match set is complete, so orderBy(...).limit(limit)
    # is exact and the driver collects O(limit) rows, not O(distinct
    # values).  (The sharded path computes its own untruncated
    # mergeable partials in json_facet_sharded and never enters here.)
    ranked = base.filter(F.col("count") >= mincount)
    extras: dict = {}
    if fspec.get("numBuckets"):
        # Solr numBuckets: bucket count after mincount, before limit —
        # a count(*) over the (small) distinct-value agg, never
        # collected
        extras["numBuckets"] = int(ranked.count())
    if fspec.get("allBuckets"):
        # allBuckets under the union reading (documented): distinct
        # matching docs having at least one value for the field —
        # equals Solr for single-valued fields; for multi-valued
        # fields Solr's bucket-sum reading would differ
        extras["allBuckets"] = {
            "count": int(jv.select("doc_id").distinct().count())
        }
    if sort == "index":
        ranked = ranked.orderBy(F.asc("value"))
    else:
        ranked = ranked.orderBy(F.desc("count"), F.asc("value"))
    if limit < (1 << 31):  # JVM limit() is int32; larger means "all"
        ranked = ranked.limit(limit)
    rows = ranked.collect()
    global LAST_COLLECTED_BUCKET_ROWS
    LAST_COLLECTED_BUCKET_ROWS = len(rows)
    buckets = []
    for r in rows:
        b = {"val": r["value"], "count": int(r["count"])}
        for aname, (fn, _f) in aggs.items():
            v = r[aname]
            if fn == "unique":
                b[aname] = int(v) if v is not None else 0
            elif fn in ("sum", "avg") or fn.startswith("percentile:"):
                b[aname] = _round4(v)
            else:
                b[aname] = None if v is None else (
                    float(v) if isinstance(v, float) else v
                )
        buckets.append(b)
    buckets.sort(key=_sort_key(sort))
    return buckets[:limit], aggs, subs, extras


def _facet_node(
    index, m, fspec, facets, cfg, nums, depth, exclude_ids
) -> dict:
    ftype = fspec.get("type", "terms")
    if depth > 1:
        raise ValueError("json_facet supports one level of sub-facets")
    if ftype == "query":
        sub = matching_doc_ids(
            index, fspec["q"], cfg=cfg, mode=fspec.get("mode", "or"),
            exclude_ids=exclude_ids,
        )
        mq = m.join(
            sub.select("doc_id"), on="doc_id", how="left_semi"
        ).persist()
        try:
            aggs, subs = _parse_aggs(fspec)
            num_fields = {f for fn, f in aggs.values() if fn != "unique"}
            node: dict = {"count": mq.count()}
            if aggs:
                gb = _with_numbers(
                    mq.select("bucket", "doc_id"), nums, num_fields
                ).agg(*_agg_exprs(aggs))
                row = gb.collect()[0] if num_fields else None
                for aname, (fn, afield) in aggs.items():
                    if fn == "unique":
                        node[aname] = (
                            _joined_values(mq, facets, afield)
                            .select("value").distinct().count()
                        )
                    else:
                        node[aname] = _round4(row[aname])
            for sname, sspec in subs.items():
                node[sname] = _facet_node(
                    index, mq, sspec, facets, cfg, nums, depth + 1,
                    exclude_ids,
                )
            return node
        finally:
            mq.unpersist()
    if ftype == "range":
        return _range_node(m, fspec, nums)
    if ftype != "terms":
        raise ValueError(f"unsupported facet type {ftype!r}")

    buckets, aggs, subs, extras = _bucket_rows(
        index, m, fspec, facets, cfg, nums, exclude_ids
    )
    field = fspec["field"]
    missing_n = None
    if fspec.get("missing"):
        # Solr facet.missing / "missing": true — matching docs with NO
        # value for the field: match count minus the docs the facet
        # join reaches (one anti-semi-shaped count, map-side combined)
        have = (
            _joined_values(m, facets, field)
            .select("doc_id").distinct().count()
        )
        missing_n = m.count() - have
    if subs and depth > 0:
        raise ValueError("json_facet supports one level of sub-facets")
    for sname, sspec in subs.items():
        stype = sspec.get("type", "terms")
        top_vals = [b["val"] for b in buckets]
        if not top_vals:
            continue
        if stype == "terms":
            _attach_terms_subfacet(
                index, m, facets, cfg, nums, field, top_vals, buckets,
                sname, sspec,
            )
        elif stype == "query":
            _attach_query_subfacet(
                index, m, facets, cfg, field, top_vals, buckets, sname,
                sspec, exclude_ids,
            )
        else:
            raise ValueError(f"unsupported facet type {stype!r}")
    out = {"buckets": buckets}
    out.update(extras)
    if missing_n is not None:
        out["missing"] = {"count": int(missing_n)}
    return out


def _range_params(fspec: dict) -> tuple[float, float, float, int, bool]:
    start = float(fspec["start"])
    end = float(fspec["end"])
    gap = float(fspec["gap"])
    if gap <= 0 or end <= start:
        raise ValueError("range facet needs gap > 0 and end > start")
    import math

    nb = int(math.ceil((end - start) / gap))
    if nb > 100_000:
        raise ValueError(f"range facet would create {nb} buckets")
    integral = all(float(x).is_integer() for x in (start, end, gap))
    return start, end, gap, nb, integral


def _range_val(lo: float, integral: bool):
    return int(lo) if integral else float(lo)


def _range_node(m, fspec: dict, nums) -> dict:
    """Solr JSON Facet ``type:"range"`` over a numeric doc value:
    fixed-width buckets [start, start+gap), …, in range order,
    EMPTY BUCKETS INCLUDED (Solr's range mincount defaults to 0),
    values outside [start, end) dropped (no before/after/between —
    documented subset). Aggregations (sum/avg/min/max of other
    numeric fields) ride the same single groupBy; the bucket count is
    bounded by the REQUEST ((end-start)/gap), never by data, so the
    collect is O(request)."""
    if nums is None:
        raise ValueError("range facet needs the numbers doc-values table")
    field = fspec["field"]
    start, end, gap, nb, integral = _range_params(fspec)
    mincount = int(fspec.get("mincount", 0))
    aggs, subs = _parse_aggs(fspec)
    if subs:
        raise ValueError("sub-facets under a range facet are not supported")
    if any(fn == "unique" for fn, _f in aggs.values()):
        raise ValueError("unique() is not supported inside a range facet")
    num_fields = {field} | {f for _fn, f in aggs.values()}
    vals = _with_numbers(m.select("bucket", "doc_id"), nums, num_fields).filter(
        F.col(field).isNotNull()
        & (F.col(field) >= start)
        & (F.col(field) < end)
    )
    lo_col = (F.floor((F.col(field) - start) / gap) * gap + start).alias("_lo")
    rows = (
        vals.groupBy(lo_col)
        .agg(F.count(F.lit(1)).cast("long").alias("count"), *_agg_exprs(aggs))
        .collect()
    )
    got = {float(r["_lo"]): r for r in rows}
    buckets = []
    for i in range(nb):
        lo = start + i * gap
        r = got.get(float(lo))
        b: dict = {"val": _range_val(lo, integral), "count": int(r["count"]) if r is not None else 0}
        if b["count"] < mincount:
            continue
        for aname, (fn, _f) in aggs.items():
            if r is None:
                b[aname] = None
            elif fn in ("sum", "avg") or fn.startswith("percentile:"):
                b[aname] = _round4(r[aname])
            else:
                b[aname] = r[aname]
        buckets.append(b)
    return {"buckets": buckets}


def _attach_terms_subfacet(
    index, m, facets, cfg, nums, pfield, top_vals, buckets, sname, sspec
) -> None:
    """Nested terms facet in ONE job: (parent value, child value)
    groupBy with a per-parent window for the child limit — never a job
    per parent bucket."""
    cfield = sspec["field"]
    climit = int(sspec.get("limit", 10))
    cmin = int(sspec.get("mincount", 1))
    csort = sspec.get("sort", "count")
    caggs, csubs = _parse_aggs(sspec)
    if csubs:
        raise ValueError("json_facet supports one level of sub-facets")
    num_fields = {f for fn, f in caggs.values() if fn != "unique"}
    if any(fn == "unique" for fn, _f in caggs.values()):
        raise ValueError("unique() is not supported inside a sub-facet")
    pj = _joined_values(m, facets, pfield).withColumnRenamed("value", "_pv")
    pj = pj.filter(F.col("_pv").isin(top_vals))
    cj = facets.filter(F.col("facet") == cfield).select(
        "bucket", "doc_id", F.col("value").alias("_cv")
    )
    both = pj.join(cj, on=["bucket", "doc_id"])
    gb = _with_numbers(both, nums, num_fields).groupBy("_pv", "_cv").agg(
        F.count(F.lit(1)).cast("long").alias("count"), *_agg_exprs(caggs)
    ).filter(F.col("count") >= cmin)
    if csort == "index":
        w = Window.partitionBy("_pv").orderBy(F.asc("_cv"))
    else:
        w = Window.partitionBy("_pv").orderBy(F.desc("count"), F.asc("_cv"))
    rows = (
        gb.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= climit)
        .collect()
    )
    per_parent: dict[str, list[dict]] = {}
    for r in sorted(rows, key=lambda r: r["_r"]):
        b = {"val": r["_cv"], "count": int(r["count"])}
        for aname, (fn, _f) in caggs.items():
            b[aname] = (
                _round4(r[aname])
                if fn in ("sum", "avg") or fn.startswith("percentile:")
                else r[aname]
            )
        per_parent.setdefault(r["_pv"], []).append(b)
    for b in buckets:
        b[sname] = {"buckets": per_parent.get(b["val"], [])}


def _attach_query_subfacet(
    index, m, facets, cfg, pfield, top_vals, buckets, sname, sspec,
    exclude_ids,
) -> None:
    """Nested query facet in ONE job: subquery semi-join, then a
    per-parent-value count (+ a clear error for aggs, which the
    one-level contract keeps out of this path)."""
    if sspec.get("facet"):
        raise ValueError("json_facet supports one level of sub-facets")
    sub = matching_doc_ids(
        index, sspec["q"], cfg=cfg, mode=sspec.get("mode", "or"),
        exclude_ids=exclude_ids,
    )
    pj = _joined_values(m, facets, pfield).withColumnRenamed("value", "_pv")
    pj = pj.filter(F.col("_pv").isin(top_vals))
    rows = (
        pj.join(sub.select("doc_id"), on="doc_id", how="left_semi")
        .groupBy("_pv")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .collect()
    )
    counts = {r["_pv"]: int(r["count"]) for r in rows}
    for b in buckets:
        b[sname] = {"count": counts.get(b["val"], 0)}


# --------------------------------------------------------- serving twin


def _local_match_pairs(searcher, ids_set, field):
    """(doc_id, value) pairs of one facet field over a match-id set,
    from the searcher's doc-sorted facet arrays."""
    import numpy as np

    arrays = searcher._load_facets()
    if arrays is False:
        raise ValueError("index was written without a facets table")
    a_ids, a_facets, a_vals = arrays
    mask = a_facets == field
    if not mask.any():
        return []
    ids = a_ids[mask]
    vals = a_vals[mask]
    keep = np.isin(ids, np.fromiter(ids_set, dtype=np.int64, count=len(ids_set)))
    return list(zip(ids[keep].tolist(), vals[keep].tolist()))


def _merge_agg(fn, a, b):
    if b is None:
        return a
    if a is None:
        return b
    if fn.startswith("percentile:"):
        return sorted(a + b)  # exact partial = value list; see _PCTL_RE
    if fn == "sum":
        return a + b
    if fn == "avg":
        return [a[0] + b[0], a[1] + b[1]]
    if fn == "min":
        return min(a, b)
    if fn == "max":
        return max(a, b)
    if fn == "unique":
        return a | b
    raise AssertionError(fn)


def _agg_partial(fn, xs):
    """Leaf partial from raw values (None-filtered)."""
    if fn == "unique":
        return set(xs)
    xs = [x for x in xs if x is not None]
    if not xs:
        return None
    if fn.startswith("percentile:"):
        return sorted(float(x) for x in xs)
    if fn == "sum":
        return float(sum(xs))
    if fn == "avg":
        return [float(sum(xs)), len(xs)]
    if fn == "min":
        return min(xs)
    if fn == "max":
        return max(xs)
    raise AssertionError(fn)


def _finalize_agg(fn, p):
    if fn == "unique":
        return len(p) if p is not None else 0
    if p is None:
        return None
    if fn.startswith("percentile:"):
        return _round4(exact_percentile(p, _pctl_frac(fn) * 100.0))
    if fn == "sum":
        return _round4(p)
    if fn == "avg":
        return _round4(p[0] / p[1]) if p[1] else None
    return p


def _local_node_partials(searcher, ids, fspec, depth, max_expansions=1024):
    ftype = fspec.get("type", "terms")
    if depth > 1:
        raise ValueError("json_facet supports one level of sub-facets")
    aggs, subs = _parse_aggs(fspec)

    def numbers_of(doc_ids, fields):
        if not fields:
            return {}
        return searcher.fetch(sorted(doc_ids), sorted(fields))

    if ftype == "query":
        sub_ids = {int(d) for d in searcher.matching_ids(
            fspec["q"], fspec.get("mode", "or")
        )} & ids
        node = {"count": len(sub_ids), "_aggs": {}}
        num_fields = {f for fn, f in aggs.values() if fn != "unique"}
        stored = numbers_of(sub_ids, num_fields)
        for aname, (fn, afield) in aggs.items():
            if fn == "unique":
                vals = [v for _d, v in _local_match_pairs(searcher, sub_ids, afield)]
                node["_aggs"][aname] = ("unique", set(vals))
            else:
                xs = [stored[d].get(afield) for d in stored]
                node["_aggs"][aname] = (fn, _agg_partial(fn, xs))
        node["_subs"] = {
            sname: _local_node_partials(searcher, sub_ids, sspec, depth + 1)
            for sname, sspec in subs.items()
        }
        return node

    if ftype == "range":
        field = fspec["field"]
        start, end, gap, _nb, _integral = _range_params(fspec)
        if subs:
            raise ValueError(
                "sub-facets under a range facet are not supported"
            )
        if any(fn == "unique" for fn, _f in aggs.values()):
            raise ValueError("unique() is not supported inside a range facet")
        num_fields = {field} | {f for _fn, f in aggs.values()}
        stored = numbers_of(ids, num_fields)
        per_lo: dict[float, list] = {}
        for d, row in stored.items():
            x = row.get(field)
            if x is None or not (start <= float(x) < end):
                continue
            lo = (float(x) - start) // gap * gap + start
            per_lo.setdefault(float(lo), []).append(row)
        ranges: dict = {}
        for lo, rws in per_lo.items():
            b = {"count": len(rws), "_aggs": {}, "_subs": {}}
            for aname, (fn, afield) in aggs.items():
                xs = [r.get(afield) for r in rws]
                b["_aggs"][aname] = (fn, _agg_partial(fn, xs))
            ranges[lo] = b
        return {"_range": ranges}

    if ftype != "terms":
        raise ValueError(f"unsupported facet type {ftype!r}")
    field = fspec["field"]
    pairs = _local_match_pairs(searcher, ids, field)
    by_val: dict = {}
    for d, v in pairs:
        by_val.setdefault(v, set()).add(int(d))
    missing_n = None
    if fspec.get("missing"):
        missing_n = len(ids) - len({int(d) for d, _v in pairs})
    allbuckets_n = None
    if fspec.get("allBuckets"):
        # union reading (same as the distributed path): distinct docs
        # with at least one value — sums exactly across disjoint shards
        allbuckets_n = len({int(d) for d, _v in pairs})
    num_fields = {f for fn, f in aggs.values() if fn != "unique"}
    if any(fn == "unique" for fn, _f in aggs.values()) and depth > 0:
        raise ValueError("unique() is not supported inside a sub-facet")
    stored = numbers_of({d for ds in by_val.values() for d in ds}, num_fields)
    buckets: dict = {}
    for v, ds in by_val.items():
        b = {"count": len(ds), "_aggs": {}, "_subs": {}}
        for aname, (fn, afield) in aggs.items():
            if fn == "unique":
                vals = [cv for _d, cv in _local_match_pairs(searcher, ds, afield)]
                b["_aggs"][aname] = ("unique", set(vals))
            else:
                xs = [stored.get(d, {}).get(afield) for d in ds]
                b["_aggs"][aname] = (fn, _agg_partial(fn, xs))
        for sname, sspec in subs.items():
            b["_subs"][sname] = _local_node_partials(
                searcher, ds, sspec, depth + 1
            )
        buckets[v] = b
    node = {"_buckets": buckets}
    if missing_n is not None:
        node["_missing"] = missing_n
    if allbuckets_n is not None:
        node["_allbuckets"] = allbuckets_n
    return node


def _merge_nodes(a: dict, b: dict) -> dict:
    if "_range" in a:
        out = {"_range": dict(a["_range"])}
        for lo, bb in b["_range"].items():
            if lo in out["_range"]:
                out["_range"][lo] = _merge_bucket(out["_range"][lo], bb)
            else:
                out["_range"][lo] = bb
        return out
    if "_buckets" in a:
        out = {"_buckets": dict(a["_buckets"])}
        for v, bb in b["_buckets"].items():
            if v in out["_buckets"]:
                out["_buckets"][v] = _merge_bucket(out["_buckets"][v], bb)
            else:
                out["_buckets"][v] = bb
        if "_missing" in a or "_missing" in b:
            out["_missing"] = a.get("_missing", 0) + b.get("_missing", 0)
        if "_allbuckets" in a or "_allbuckets" in b:
            out["_allbuckets"] = a.get("_allbuckets", 0) + b.get("_allbuckets", 0)
        return out
    return _merge_bucket(a, b)


def _merge_bucket(x: dict, y: dict) -> dict:
    out = {"count": x["count"] + y["count"], "_aggs": {}, "_subs": {}}
    for aname, (fn, p) in x.get("_aggs", {}).items():
        q = y.get("_aggs", {}).get(aname, (fn, None))[1]
        out["_aggs"][aname] = (fn, _merge_agg(fn, p, q))
    for sname, sn in x.get("_subs", {}).items():
        out["_subs"][sname] = _merge_nodes(sn, y.get("_subs", {}).get(
            sname, {"_buckets": {}} if "_buckets" in sn else
            {"count": 0, "_aggs": {}, "_subs": {}}
        ))
    return out


def _finalize_node(fspec: dict, node: dict) -> dict:
    ftype = fspec.get("type", "terms")
    aggs, subs = _parse_aggs(fspec)
    if ftype == "query":
        out = {"count": node["count"]}
        for aname, (fn, _f) in aggs.items():
            out[aname] = _finalize_agg(fn, node["_aggs"][aname][1])
        for sname, sspec in subs.items():
            out[sname] = _finalize_node(sspec, node["_subs"][sname])
        return out
    if ftype == "range":
        start, end, gap, nb, integral = _range_params(fspec)
        mincount = int(fspec.get("mincount", 0))
        ranges = node["_range"]
        buckets = []
        for i in range(nb):
            lo = start + i * gap
            b = ranges.get(float(lo))
            n = b["count"] if b is not None else 0
            if n < mincount:
                continue
            fb: dict = {"val": _range_val(lo, integral), "count": n}
            for aname, (fn, _f) in aggs.items():
                fb[aname] = (
                    _finalize_agg(fn, b["_aggs"][aname][1])
                    if b is not None else None
                )
            buckets.append(fb)
        return {"buckets": buckets}
    limit = int(fspec.get("limit", 10))
    mincount = int(fspec.get("mincount", 1))
    sort = fspec.get("sort", "count")
    buckets = []
    for v, b in node["_buckets"].items():
        if b["count"] < mincount:
            continue
        fb = {"val": v, "count": b["count"]}
        for aname, (fn, _f) in aggs.items():
            fb[aname] = _finalize_agg(fn, b["_aggs"][aname][1])
        for sname, sspec in subs.items():
            fb[sname] = _finalize_node(sspec, b["_subs"][sname])
        buckets.append(fb)
    buckets.sort(key=_sort_key(sort))
    out = {"buckets": buckets[:limit]}
    if fspec.get("numBuckets"):
        out["numBuckets"] = len(buckets)
    if fspec.get("allBuckets"):
        out["allBuckets"] = {"count": int(node.get("_allbuckets", 0))}
    if "_missing" in node:
        out["missing"] = {"count": int(node["_missing"])}
    return out


def json_facet_local(
    searcher, query: str, spec: dict, mode: str = "or", fq: str | None = None
) -> dict:
    """Serving twin of ``json_facet`` over a ``LocalSearcher`` (same
    spec, dict arithmetic; numeric aggs read STORED fields). Exact
    twin by construction — parity pytest pins it."""
    ids = {int(d) for d in searcher.matching_ids(query, mode)}
    if fq is not None:
        ids &= searcher._fq_ids_local(fq)
    out: dict = {"count": len(ids)}
    for name, fspec in spec.items():
        out[name] = _finalize_node(
            fspec, _local_node_partials(searcher, ids, fspec, depth=0)
        )
    return out


def local_facet_partials(
    searcher, query: str, spec: dict, mode: str = "or", fq: str | None = None
):
    """One shard's complete json-facet partials for a request — a
    single scatter unit so the sharded path is ONE round trip per
    shard (and one RPC per shard on the process transport)."""
    ids = {int(d) for d in searcher.matching_ids(query, mode)}
    if fq is not None:
        ids &= searcher._fq_ids_local(fq)
    return (
        len(ids),
        {
            name: _local_node_partials(searcher, ids, fspec, depth=0)
            for name, fspec in spec.items()
        },
    )


def json_facet_sharded(
    shards, query: str, spec: dict, mode: str = "or", fq: str | None = None,
    fanout=None,
) -> dict:
    """Sharded twin: every shard computes UNTRUNCATED mergeable
    partials (count/sum/min/max merge trivially; avg as (sum, n);
    unique as exact value SETS — doc spaces are disjoint), the
    coordinator merges and finalizes sort/limit/mincount ONCE. Exact,
    unlike Solr's distributed unique() sketch. ``fanout``: optional
    scatter executor (ShardedSearcher._fanout) so the process
    transport parallelizes the per-shard partials."""
    calls = [
        (lambda s=s: s.json_facet_partials(query, spec, mode=mode, fq=fq))
        for s in shards
    ]
    per_shard = fanout(calls) if fanout is not None else [c() for c in calls]
    out: dict = {"count": sum(n for n, _p in per_shard)}
    for name, fspec in spec.items():
        merged = per_shard[0][1][name]
        for _n, parts in per_shard[1:]:
            merged = _merge_nodes(merged, parts[name])
        out[name] = _finalize_node(fspec, merged)
    return out
