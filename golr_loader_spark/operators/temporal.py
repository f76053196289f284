"""Temporal operators Spark lacks natively: as-of join.

``asof_join`` attaches, to each left row, the payload of the latest
right row with ``right.ts <= left.ts`` (backward as-of) for the same
keys — the canonical point-in-time enrichment (feature lookups,
"last seen state before the event").

Physical strategy: the UNION-MARKER plan, not a range join. Both
sides are unioned with a side marker, one window pass partitioned by
the join keys and ordered by (ts, side, tiebreak) carries the most
recent right payload forward (``last(..., ignorenulls=True)``), and
left rows are filtered back out. That is ONE sort-shuffle over
|L|+|R| rows — the same shape as sort-merge join — whereas expressing
as-of as ``L join R on keys and R.ts <= L.ts`` + window explodes to
the full per-key cross product before pruning (quadratic per key:
the classic as-of scale trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    payload: list[str],
    right_tiebreak: str | None = None,
    allow_exact: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """→ left columns + ``prefix+c`` for each payload column c (null
    when no right row precedes). ``right_tiebreak``: right column that
    breaks equal-ts ties among right rows (larger wins). With
    ``allow_exact`` a right row at exactly left.ts matches; otherwise
    only strictly earlier rows do."""
    lcols = left.columns
    pay = [f"{prefix}{c}" for c in payload]

    l = left.select(
        *keys,
        F.col(ts).alias("_ts"),
        # at equal ts the right row must sort BEFORE the left row to
        # be visible (or AFTER it, for strict inequality)
        F.lit(1 if allow_exact else 0).alias("_side"),
        F.lit(None).cast(
            dict(right.dtypes)[right_tiebreak] if right_tiebreak else "long"
        ).alias("_tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(p) for c, p in zip(payload, pay)],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in keys],
    )
    r = right.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(1 - (1 if allow_exact else 0)).alias("_side"),
        # native type: a lossy cast (e.g. a UUID string -> long) would
        # turn every tiebreak NULL and make 'larger wins' nondeterministic
        (
            F.col(right_tiebreak) if right_tiebreak else F.lit(0)
        ).alias("_tb"),
        *[F.col(c).alias(p) for c, p in zip(payload, pay)],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in lcols if c not in keys],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *keys,
        "_ts",
        "_side",
        *[F.col(f"_l_{c}") for c in lcols if c not in keys],
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in pay],
    )
    is_left_side = F.col("_side") == (1 if allow_exact else 0)
    out = filled.filter(is_left_side).select(
        *keys,
        F.col("_ts").alias(ts),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in keys and c != ts],
        *pay,
    )
    return out
