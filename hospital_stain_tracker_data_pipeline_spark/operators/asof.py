"""Day-over-day / as-of-previous-calendar-day operators (SURVEY.md §2.3
op-join-asof-prev, §2.5 op-window-lag).

The reference computes "Δ strain" by left-outer self-joining
``metrics_daily`` to itself on ``(region_id, date = target - 1 day)``
(``backend/app/main.py:249-284``). The semantics are *previous calendar
day*, not previous observed row — a gap day yields NULL delta.

Spark-first implementation: a single ``lag`` window over
``(key, order by date)`` plus a calendar-adjacency guard. One shuffle on
the key instead of a self-join's two scans + shuffle — at 100 TB this
halves the read and removes a join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_prev_calendar_day(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    prev_col: str = "prev_value",
) -> DataFrame:
    """Add ``prev_col`` = value from the previous *calendar* day per key,
    NULL when that day is absent (exact reference semantics,
    main.py:264-268 — where a plain lag would wrongly bridge gaps)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(date_col))
    lag_val = F.lag(value_col).over(w)
    lag_date = F.lag(date_col).over(w)
    adjacent = F.datediff(F.col(date_col), lag_date) == 1
    return df.withColumn(prev_col, F.when(adjacent, lag_val))


def calendar_day_delta(
    df: DataFrame,
    key_cols: Sequence[str],
    date_col: str,
    value_col: str,
    delta_col: str = "delta",
    prev_col: str = "prev_value",
) -> DataFrame:
    """prev-day value + NULL-propagating delta (main.py:273-284)."""
    out = with_prev_calendar_day(df, key_cols, date_col, value_col, prev_col)
    return out.withColumn(delta_col, F.col(value_col) - F.col(prev_col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Generic scalable as-of join: for each left row, attach the most
    recent right row with ``right_time <= left_time`` within the same
    ``by`` key (the operator Spark lacks natively; DuckDB/Pandas call it
    ASOF JOIN / merge_asof).

    Implementation is union + one window pass, NOT a range self-join:
    tag right rows 0 and left rows 1, union on (key, time, tag), and
    carry the latest right values forward with last_value(ignoreNulls)
    over (key ORDER BY time, tag). One shuffle on the key, state per
    row is O(#value_cols), no quadratic candidate blowup — at 100 TB a
    range-join would explode on hot keys; this stays linear and skew
    is handled by AQE on the single exchange.

    Right rows must be unique per (by, right_time) for deterministic
    output (pre-aggregate if not). Left rows at equal timestamps see
    the right row (tag order puts right first).

    The right-side values travel as ONE struct and the window carries
    the latest non-null STRUCT forward — so a right row whose value
    column is genuinely NULL is still "the match" (its NULL is
    returned, exactly like DuckDB ASOF / pandas merge_asof), and
    multiple value_cols always come from the same right row, never
    stitched across rows.
    """
    by = list(by)
    vals = list(value_cols)
    lcols = [c for c in left.columns]
    row_struct = F.struct(*[F.col(v).alias(v) for v in vals])
    null_struct_type = right.select(row_struct.alias("_r")).schema["_r"].dataType
    l = left.select(
        *by,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in by and c != left_time],
        F.lit(None).cast(null_struct_type).alias("_r"),
    )
    r = right.select(
        *by,
        F.col(right_time).cast(l.schema["_t"].dataType).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in by and c != left_time],
        row_struct.alias("_r"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    keep = [c for c in lcols if c not in by and c != left_time]
    return filled.filter(F.col("_is_left") == 1).select(
        *by,
        F.col("_t").alias(left_time),
        *keep,
        *[F.col(f"_asof.{v}").alias(f"asof_{v}") for v in vals],
    )
