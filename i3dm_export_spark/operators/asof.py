"""As-of (backward) join — a custom temporal operator Spark lacks.

Semantics: for every left row, attach the value columns of the LATEST
right row with the same key and ``right_ts <= left_ts`` (DuckDB
``ASOF LEFT JOIN`` semantics, ties at equal timestamps match).

Spark-first plan: instead of a range join (O(n·m) candidate explosion) or
a per-key ``applyInPandas`` merge, both sides are unioned and a single
window pass carries the last non-null right payload forward in time:

    union(left tagged _side=1, right tagged _side=0)
      -> Window.partitionBy(key).orderBy(ts, _side)
         last(_rv, ignorenulls=True) over rowsBetween(unbounded, current)
      -> filter _side=1

ONE shuffle (the window partition), whole-stage-codegen throughout, no
Python. Right rows sort before left rows at equal timestamps, so an
exact-timestamp match wins — same as DuckDB's ``l.ts >= r.ts``.

Determinism: if the right side has multiple rows per (key, ts) the
carried value is ambiguous — dedupe the right side per (key, ts) first
(the driver-gate query aggregates MAX(value) per key+ts).

At 100 TB: the shuffle is on the join key; per-key skew is bounded by the
keyspace (user ids), and AQE handles stragglers. No broadcast needed on
either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + value_cols of the latest right
    row at or before its timestamp (nulls where none exists, or where the
    match is older than ``tolerance_seconds``)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    rv = F.struct(
        F.col(right_ts).alias("_matched_ts"),
        *[F.col(c) for c in value_cols],
    )
    rv_type = right.select(rv.alias("_rv")).schema["_rv"].dataType
    lp = F.struct(*[left[c] for c in left.columns])
    lp_type = left.select(lp.alias("_lp")).schema["_lp"].dataType

    l3 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(rv_type).alias("_rv"),
        lp.alias("_lp"),
        F.lit(1).alias("_side"),
    )
    r3 = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        rv.alias("_rv"),
        F.lit(None).cast(lp_type).alias("_lp"),
        F.lit(0).alias("_side"),
    )

    u = l3.unionByName(r3)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # timestamp difference must be timezone-free: casting TIMESTAMP_NTZ
        # through the session zone gives two values straddling a DST
        # transition different UTC offsets, skewing the difference by the
        # DST delta (ADVICE r2). timestampdiff operates directly on both
        # TIMESTAMP and TIMESTAMP_NTZ without a zone conversion; numeric
        # _ts columns subtract directly.
        ts_kind = u.schema["_ts"].dataType.simpleString()
        if ts_kind.startswith("timestamp"):
            delta = (
                F.expr("timestampdiff(MICROSECOND, _m._matched_ts, _ts)")
                / F.lit(1e6)
            )
        else:
            delta = F.col("_ts").cast("double") - F.col("_m._matched_ts").cast(
                "double"
            )
        in_tol = delta <= tolerance_seconds
        out = out.withColumn(
            "_m", F.when(in_tol, F.col("_m")).otherwise(F.lit(None).cast(rv_type))
        )
    return out.select(
        F.col("_lp.*"),
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )
