"""Gap-based sessionization (SURVEY §2.6/§2.10).

The batch form of Structured Streaming's ``session_window``: a new
session starts wherever the gap to the previous row in the same ``by``
group exceeds ``gap``. Reference semantic source: segmentation by
onset positions (segment.py:445-475) — cuts at irregular event
positions. Pure window SQL: one shuffle on ``by``, whole-stage codegen.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, on: str, gap: float,
               by: str | Sequence[str] = (),
               session_col: str = "session_id") -> DataFrame:
    """Assign 0-based session ids per ``by`` group.

    ``on`` may be numeric (positions) or timestamp (gap in seconds).
    """
    by = [by] if isinstance(by, str) else list(by)
    ts = F.col(on).cast("double") if dict(df.dtypes)[on] == "timestamp" \
        else F.col(on)
    gap_lit = F.lit(gap)
    w = Window.partitionBy(*by).orderBy(ts.asc())
    prev = F.lag(ts).over(w)
    is_new = F.when(prev.isNull() | ((ts - prev) > gap_lit), 1).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(session_col, (F.sum(is_new).over(w_run) - 1))


def session_bounds(df: DataFrame, on: str, by: str | Sequence[str] = (),
                   session_col: str = "session_id") -> DataFrame:
    """Aggregate sessionized rows to one row per session with start /
    end / length — the engine analogue of a Segments metadata table."""
    by = [by] if isinstance(by, str) else list(by)
    return (
        df.groupBy(*by, session_col)
        .agg(F.min(on).alias("session_start"),
             F.max(on).alias("session_end"),
             F.count("*").alias("n_rows"))
    )


def sessionize_streaming(events, on: str, gap_duration: str,
                         by: str | Sequence[str] = ()):
    """Structured-Streaming equivalent using the native session_window
    (same semantics as :func:`sessionize`, watermark handles late data).
    ``events`` must be a streaming DataFrame with a timestamp ``on``.
    """
    by = [by] if isinstance(by, str) else list(by)
    return (
        events.withWatermark(on, gap_duration)
        .groupBy(*by, F.session_window(F.col(on), gap_duration))
        .agg(F.count("*").alias("n_rows"))
        .select(*by,
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_rows")
    )
