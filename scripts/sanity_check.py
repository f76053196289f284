"""Production sanity gate — the reference's QueriesSanityCheck analog
(/root/reference/src/main/java/org/monarch/golr/QueriesSanityCheck.java:
35-111: run every query with a per-query timeout, collect the failures,
print the failed list, exit nonzero) plus its Pipeline priority
scheduling (Pipeline.java:108-115 runs the literature queries first —
C2): names passed via ``--priority`` run before the rest.

Each query runs in its own worker thread inside a dedicated Spark job
group; on timeout the group is cancelled (interruptOnCancel) so the
executor threads stop burning cores, and the failure is recorded
instead of aborting the suite — exactly the reference's
collect-then-report contract.

Usage:
  python scripts/sanity_check.py [sf_dir] [--timeout SECONDS]
                                 [--priority name1,name2]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time


def run_suite(
    spark,
    queries: dict,
    sf_dir: str,
    timeout_s: float = 120.0,
    priority: tuple[str, ...] = (),
) -> tuple[dict[str, str], dict[str, float]]:
    """Run every query with a per-query timeout. Returns (failures:
    name → reason, timings: name → seconds, in execution order)."""
    ordered = [n for n in priority if n in queries] + [
        n for n in queries if n not in set(priority)
    ]
    failures: dict[str, str] = {}
    timings: dict[str, float] = {}

    for name in ordered:
        fn = queries[name]
        group = f"sanity-{name}"
        result: dict = {}

        def work(fn=fn, group=group, result=result):
            try:
                # job-group properties are thread-local: set inside the
                # worker so cancelJobGroup targets only this query
                spark.sparkContext.setJobGroup(group, group, interruptOnCancel=True)
                result["rows"] = fn(spark, sf_dir).count()
            except BaseException as ex:  # collect, don't abort the suite
                result["err"] = f"{type(ex).__name__}: {str(ex)[:200]}"

        t0 = time.monotonic()
        worker = threading.Thread(target=work, daemon=True)
        worker.start()
        worker.join(timeout_s)
        timings[name] = time.monotonic() - t0
        if worker.is_alive():
            spark.sparkContext.cancelJobGroup(group)
            failures[name] = f"timeout after {timeout_s:.0f}s"
        elif "err" in result:
            failures[name] = result["err"]

    return failures, timings


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from golr_loader_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--timeout", type=float, default=120.0)
    ap.add_argument("--priority", default="engine_bm25_wand,q24_bm25_topk")
    args = ap.parse_args()

    spark = get_spark(cores=8, app_name="sanity-check")
    priority = tuple(p for p in args.priority.split(",") if p)
    failures, timings = run_suite(
        spark, entrymod.queries(), args.sf_dir, args.timeout, priority
    )

    for name, secs in timings.items():
        status = "FAIL" if name in failures else "ok"
        print(f"{name:32s} {status:4s} {secs:7.2f}s")
    if failures:  # QueriesSanityCheck.java:96-109 — list then exit 1
        print(f"\n{len(failures)} failed queries:")
        for name, why in failures.items():
            print(f"  {name}: {why}")
        sys.exit(1)
    print(f"\nall {len(timings)} queries passed")


if __name__ == "__main__":
    main()
