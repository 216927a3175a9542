"""Backfill / LOCF, lag-lead deltas, delay embedding columns, and
edge-clip policies (SURVEY §2.10).

Reference semantics: segment params broadcast to all rows of a segment
(LOCF shape), ``np.take(mode='clip')`` edge policy (onsets.py:250),
``np.gradient`` central differences (features.py:302),
``delay_embedding`` lagged matrix (fractal.py:42-61). All pure window
SQL — one shuffle on ``by``, codegen'd.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _by(by) -> list:
    return [by] if isinstance(by, str) else list(by)


def locf(df: DataFrame, cols: Sequence[str], on: str,
         by: str | Sequence[str] = (), backwards: bool = False,
         limit: int | None = None) -> DataFrame:
    """Last-observation-carried-forward over nulls (forward fill);
    ``backwards=True`` gives next-observation-carried-backward.

    ``limit``: carry at most ``limit`` ROWS past the observation
    (pandas ``ffill(limit=n)`` semantics) — stale observations stop
    propagating; rows further away stay null. Still one window over
    one shuffle, just a bounded frame."""
    order = F.col(on).desc() if backwards else F.col(on).asc()
    lo = Window.unboundedPreceding if limit is None else -limit
    w = (Window.partitionBy(*_by(by)).orderBy(order)
         .rowsBetween(lo, 0))
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def fill_edges_clip(df: DataFrame, cols: Sequence[str], on: str,
                    by: str | Sequence[str] = ()) -> DataFrame:
    """np.take(mode='clip') analogue: nulls at the head take the first
    non-null, elsewhere the previous value (LOCF then backward fill)."""
    return locf(locf(df, cols, on, by), cols, on, by, backwards=True)


def lag_lead_delta(df: DataFrame, col: str, on: str,
                   by: str | Sequence[str] = (),
                   prefix: str | None = None) -> DataFrame:
    """Attach lag/lead/central-gradient columns for ``col``.

    ``{c}_grad`` reproduces np.gradient semantics exactly: central
    difference ``(lead-lag)/2`` in the interior, one-sided at the first
    and last row of each group (features.py:302 parity)."""
    p = prefix or col
    w = Window.partitionBy(*_by(by)).orderBy(F.col(on).asc())
    lagc, leadc = F.lag(col).over(w), F.lead(col).over(w)
    grad = (
        F.when(lagc.isNull() & leadc.isNull(), F.lit(0.0))
        .when(lagc.isNull(), leadc - F.col(col))
        .when(leadc.isNull(), F.col(col) - lagc)
        .otherwise((leadc - lagc) / 2.0)
    )
    return (
        df.withColumn(f"{p}_lag", lagc)
        .withColumn(f"{p}_lead", leadc)
        .withColumn(f"{p}_delta", F.col(col) - lagc)
        .withColumn(f"{p}_grad", grad)
    )


def flux_from_series(df: DataFrame, col: str, on: str,
                     by: str | Sequence[str] = (),
                     out_col: str = "flux") -> DataFrame:
    """Positive gradient of a per-segment series — spectral-flux shape
    (features.py:280-305) as pure SQL when the magnitudes are already
    a column."""
    tmp = lag_lead_delta(df, col, on, by, prefix="__f")
    return (
        tmp.withColumn(out_col, F.greatest(F.col("__f_grad"), F.lit(0.0)))
        .drop("__f_lag", "__f_lead", "__f_delta", "__f_grad")
    )


def delay_embed_cols(df: DataFrame, col: str, on: str, delay: int,
                     m_dim: int, by: str | Sequence[str] = ()) -> DataFrame:
    """Delay-embedding as lag columns (fractal.py:42-61): row t gets
    ``col`` at t, t+delay, ..., t+(m_dim-1)*delay; rows whose embedding
    would run off the end are dropped (the reference's hard cut)."""
    w = Window.partitionBy(*_by(by)).orderBy(F.col(on).asc())
    out = df
    for k in range(1, m_dim):
        out = out.withColumn(f"{col}_d{k}", F.lead(col, k * delay).over(w))
    return out.where(F.col(f"{col}_d{m_dim - 1}").isNotNull()) if m_dim > 1 else out


def rolling_stats(df: DataFrame, col: str, on: str, before: int, after: int,
                  by: str | Sequence[str] = (),
                  prefix: str | None = None) -> DataFrame:
    """Sliding count-window mean/min/max/sum (rowsBetween frame) — the
    windowed-statistics primitive behind the peak picker's conditions
    1-2 (onsets.py:243-248)."""
    p = prefix or col
    w = (Window.partitionBy(*_by(by)).orderBy(F.col(on).asc())
         .rowsBetween(-before, after))
    return (
        df.withColumn(f"{p}_win_mean", F.avg(col).over(w))
        .withColumn(f"{p}_win_min", F.min(col).over(w))
        .withColumn(f"{p}_win_max", F.max(col).over(w))
        .withColumn(f"{p}_win_sum", F.sum(col).over(w))
    )


def standardize(df: DataFrame, cols: Sequence[str],
                by: str | Sequence[str] = ()) -> DataFrame:
    """Z-score per group (tools.py:222-231 standardize), as windowed
    aggregates — no second join."""
    w = Window.partitionBy(*_by(by))
    out = df
    for c in cols:
        mu, sd = F.avg(c).over(w), F.stddev_pop(c).over(w)
        out = out.withColumn(
            c + "_z", F.when(sd > 0, (F.col(c) - mu) / sd).otherwise(F.lit(0.0)))
    return out


def minmax_normalize(df: DataFrame, cols: Sequence[str],
                     by: str | Sequence[str] = ()) -> DataFrame:
    """Min-max scaling per group (tools.py:112-144 normalize)."""
    w = Window.partitionBy(*_by(by))
    out = df
    for c in cols:
        lo, hi = F.min(c).over(w), F.max(c).over(w)
        out = out.withColumn(
            c + "_mm",
            F.when(hi > lo, (F.col(c) - lo) / (hi - lo)).otherwise(F.lit(0.0)))
    return out


def smooth_stat(df: DataFrame, col: str, by: str | Sequence[str] = (),
                out_col: str | None = None) -> DataFrame:
    """Replace values within +-1 sigma of the group mean by the mean
    (tools.py:201-219)."""
    w = Window.partitionBy(*_by(by))
    mu, sd = F.avg(col).over(w), F.stddev_pop(col).over(w)
    inside = (F.col(col) >= mu - sd) & (F.col(col) <= mu + sd)
    return df.withColumn(out_col or col + "_smooth",
                         F.when(inside, mu).otherwise(F.col(col)))
