"""As-of (most-recent-prior) join — a time-series operator Spark's
DataFrame API lacks as a primitive.

Implemented as the scalable union-and-window composition rather than a
range join or a per-key loop:

  1. tag both sides (right=0, left=1) and union them on a shared
     schema (right payload columns null on left rows and vice versa);
  2. ONE shuffle: window partitioned by the join keys, ordered by
     (ts, side) — side 0 before side 1 so an exactly-equal right
     timestamp is visible to the left row (v.ts <= l.ts inclusive);
  3. last(ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT carries
     each right payload forward to the next left row;
  4. keep left rows.

At 100 TB this is the plan you want: a single hash-partition exchange
on the equi-keys plus a per-partition sort — the same cost as the
groupBy any aggregation would pay — with no range-explode, no
broadcast requirement, and skew bounded by the hottest key's row
count. DuckDB's native ASOF JOIN re-derives the result exactly
(scripts/check_oracles.py `asof_join`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach `right_payload` columns (prefixed)
    from the right row with the greatest right_ts <= left_ts sharing
    the `by` keys, plus `{prefix}ts` itself; nulls when no prior right
    row exists. Left rows and columns pass through unchanged.

    Ties on (by, right_ts) are broken by the LAST right row in
    (right_ts, payload) order within the window — callers needing
    strict determinism should ensure (by, right_ts) is unique, which
    DuckDB's ASOF JOIN equally assumes.
    """
    lcols = left.columns
    tagged_r = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols if c not in by],
    )
    tagged_l = left.select(
        *[F.col(c) for c in by],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in by],
    )
    u = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *by,
        "__ts",
        "__side",
        *[F.col(f"__l_{c}") for c in lcols if c not in by],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias(f"{prefix}ts"),
        *[
            F.last(F.when(F.col("__side") == 0, F.col(f"__r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in right_payload
        ],
    )
    out_left = [
        F.col(f"__l_{c}").alias(c) if c not in by else F.col(c) for c in lcols
    ]
    # restore the left's timestamp column name (it was folded into __ts)
    out_left = [
        F.col("__ts").alias(c) if c == left_ts else e for c, e in zip(lcols, out_left)
    ]
    return carried.filter(F.col("__side") == 1).select(
        *out_left, F.col(f"{prefix}ts"), *[F.col(f"{prefix}{c}") for c in right_payload]
    )
