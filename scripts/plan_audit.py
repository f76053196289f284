"""Physical-plan audit over every registered query: dump the plan
shape and flag scale killers.

Red flags checked (each is a pattern that works at sf0.01 and dies at
100 TB):
  * single-partition window  — "Window" with no partition spec
    (WindowExec moves ALL rows to one task);
  * cartesian product        — CartesianProduct / BroadcastNestedLoop
    with a non-tiny build side (we allowlist the intentional ones:
    broadcast centroid/bit-dimension tables bounded by a constant);
  * sort-merge join of a dimension table that should broadcast;
  * per-row Python UDF       — BatchEvalPython (Arrow-batched
    ArrowEvalPython / mapInPandas are fine).

Usage: python scripts/plan_audit.py [sf_dir] [--write-md]
Exit nonzero if any un-allowlisted red flag is found (CI-gate shape,
like scripts/sanity_check.py).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# queries whose plans legitimately contain a bounded nested-loop join:
# a broadcast side that is CONSTANT-sized by construction (16 IVF
# centroids, 32 simhash bit positions, <=5 ANN query vectors, 8
# minhash params), not data-sized.
BOUNDED_NLJ = {
    "q19_simhash",            # 32-row bit dimension
    "q20_ann_cosine_topk",    # <=5 broadcast query vectors
    "q26_lsh_candidates",
    "q27_embedding_neardup",  # bounded oracle twin (vec_id < 300)
    "q32_ivf_ann",            # 16 literal centroids; queries explode
    "q18_minhash",
    "q17_ngram_jaccard",
    "q42_bigram_logprob",     # ONE-ROW vocab-size dimension (countDistinct agg)
    "q44_dsir_weights",       # ONE-ROW target/raw totals dimensions (two aggs)
    "q45_hybrid_rrf",         # single broadcast query vector (k=50 lists)
}


# queries whose plans legitimately contain an UNPARTITIONED window:
# the windowed input is bounded by the REQUEST, not the corpus —
# today that is the Streaming Expressions movingAvg()/diff() stream
# decorators (plans/stream_expr.py _c_moving_avg/_c_diff), which run
# over a bucketed timeseries/facet series whose length is fixed by
# the request's bucket count. Any future registry row built on them
# must be registered here with the same bounded-series rationale.
BOUNDED_WINDOW: set[str] = set()


def audit(plan: str, name: str) -> list[str]:
    flags = []
    # a window with an EMPTY partition spec funnels all rows to one
    # task. Plan text: partitioned = "Window [exprs], [part], [sort]"
    # (3 bracket groups), unpartitioned = "Window [exprs], [sort]" (2).
    for m in re.finditer(r"Window (\[.*?\](?:, \[.*?\])*)", plan):
        groups = re.findall(r"\[.*?\]", m.group(1))
        if len(groups) < 3 and name not in BOUNDED_WINDOW:
            flags.append("single-partition window")
            break
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in BOUNDED_NLJ:
        flags.append("BroadcastNestedLoopJoin (check build side size)")
    if "BatchEvalPython" in plan:
        flags.append("per-row Python UDF (BatchEvalPython)")
    return flags


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    write_md = "--write-md" in sys.argv

    import __spark_entry__ as entry
    from golr_loader_spark import get_spark

    spark = get_spark(cores=8)
    qs = entry.queries()
    rows, bad = [], {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            bad[name] = [f"PLAN ERROR: {e}"]
            continue
        flags = audit(plan, name)
        n_exchanges = plan.count("Exchange")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        rows.append((name, n_exchanges, n_bhj, n_smj, flags))
        if flags:
            bad[name] = flags

    lines = ["# PLANS — physical-plan audit", "",
             f"sf_dir: {sf}; flags: single-partition window, cartesian,",
             "unbounded nested-loop join, per-row Python UDF.", "",
             "| query | exchanges | broadcast joins | sort-merge joins | flags |",
             "|---|---|---|---|---|"]
    for name, ne, nb, nsm, flags in rows:
        lines.append(f"| {name} | {ne} | {nb} | {nsm} | {', '.join(flags) or '—'} |")
    report = "\n".join(lines) + "\n"
    if write_md:
        with open("PLANS.md", "w") as f:
            f.write(report)
    print(report)
    if bad:
        print(f"RED FLAGS: {bad}", file=sys.stderr)
        return 1
    print("PLAN AUDIT: clean", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
