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
