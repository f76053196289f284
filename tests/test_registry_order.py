"""Registry-order contract: the driver gates exactly the first 50 rows of
``queries()``, so the rotation policy in ``__spark_entry__._REGISTRY_PRIORITY``
must actually put the least-gated rows inside that window.

Round-5 invariant: every row with 0 driver-green records through r4 (the 17
never-gated engine rows) plus all once- and twice-gated rows sit in the
first-50 window; the long-stable 4-record rows (q01..q27, engine_bm25_wand)
are the only ones allowed to fall outside.
"""

import json
import pathlib

import __spark_entry__ as entrymod

REPO = pathlib.Path(__file__).resolve().parent.parent

NEVER_GATED_THROUGH_R4 = {
    "engine_blockjoin", "engine_collate", "engine_elevate", "engine_export",
    "engine_mselect", "engine_sortpage", "engine_suggest", "engine_stats",
    "engine_boost", "engine_cursor", "engine_pivot", "engine_fetchpage",
    "engine_mlt_boosted", "engine_chain", "engine_terms", "engine_tvec",
    "engine_join",
}


def _registry_names():
    return list(entrymod.queries().keys())


def test_priority_names_all_exist():
    names = set(_registry_names())
    missing = [n for n in entrymod._REGISTRY_PRIORITY if n not in names]
    assert not missing, f"_REGISTRY_PRIORITY names absent from registry: {missing}"


def test_never_gated_rows_in_driver_window():
    window = set(_registry_names()[:50])
    out = NEVER_GATED_THROUGH_R4 - window
    assert not out, f"never-driver-gated rows outside the first-50 window: {out}"


def test_low_record_rows_lead_high_record_rows():
    """Rows with fewer driver-green records must come before 4-record rows."""
    records = {}
    for rpath in sorted(REPO.glob("CORRECTNESS_r0*.json")):
        for name in json.loads(rpath.read_text()):
            records[name] = records.get(name, 0) + 1
    names = _registry_names()
    counts = [records.get(n, 0) for n in names]
    # every 0/1/2-record row must precede the first 4-record row
    first_heavy = next(i for i, c in enumerate(counts) if c >= 4)
    stragglers = [n for n, c in zip(names[first_heavy:], counts[first_heavy:]) if c <= 2]
    assert not stragglers, f"low-record rows behind 4-record rows: {stragglers}"


def test_every_registry_row_has_oracle_or_documented_exception():
    q = set(_registry_names())
    o = set(entrymod.oracle_sql().keys())
    assert o <= q, f"oracle rows without a queries() entry: {o - q}"
    assert q == o, f"registry rows missing oracle SQL: {q - o}"


def test_no_duplicate_oracle_sql_definitions():
    """A later `SQL_QXX = ...` with an already-used name silently
    shadows the earlier oracle (this clobbered engine_dismax/
    engine_drilldown once) — forbid duplicate definitions."""
    import re

    src = (REPO / "golr_loader_spark" / "operators" / "relational.py").read_text()
    names = re.findall(r"^(SQL_Q\w+) = ", src, re.M)
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate oracle SQL definitions: {dupes}"
