"""C2/C4: the sanity harness must survive (and report) injected hangs
and failures, and honor priority ordering — the contract of the
reference's QueriesSanityCheck.java:35-111 + Pipeline.java:108-115."""

from __future__ import annotations

import importlib.util
import pathlib
import time

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "sanity_check",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "sanity_check.py",
)
sanity_check = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sanity_check)


def _ok(spark, sf_dir):
    return spark.range(10)


def _boom(spark, sf_dir):
    raise RuntimeError("injected failure")


def _hang(spark, sf_dir):
    time.sleep(30)
    return spark.range(1)


def test_harness_collects_failures_without_aborting(spark):
    spark.range(1).count()  # warm the session so the 3 s budget is real
    failures, timings = sanity_check.run_suite(
        spark,
        {"good": _ok, "boom": _boom, "hangs": _hang},
        sf_dir="unused",
        timeout_s=3.0,
    )
    assert "good" not in failures
    assert failures["boom"].startswith("RuntimeError")
    assert failures["hangs"].startswith("timeout")
    # the hang was bounded by the timeout, not the sleep
    assert timings["hangs"] < 10.0
    # every query ran and was timed despite the failures
    assert set(timings) == {"good", "boom", "hangs"}


def test_harness_priority_runs_first(spark):
    _, timings = sanity_check.run_suite(
        spark,
        {"a": _ok, "b": _ok, "c": _ok},
        sf_dir="unused",
        timeout_s=30.0,
        priority=("c", "b"),
    )
    assert list(timings) == ["c", "b", "a"]


def test_harness_green_suite_reports_no_failures(spark):
    failures, _ = sanity_check.run_suite(
        spark, {"a": _ok, "b": _ok}, sf_dir="unused", timeout_s=30.0
    )
    assert failures == {}
