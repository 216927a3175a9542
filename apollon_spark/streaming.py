"""Structured-Streaming faces of the engine (SURVEY §2.10).

The reference is batch-only (whole arrays in memory); these operators
give the same semantics over unbounded inputs:

- ``stream_features``: docs arriving as files/Kafka -> the identical
  fused feature battery per micro-batch via ``foreachBatch`` (docs are
  self-contained rows, so a micro-batch is just a smaller batch —
  exactly-once via the sink's epoch id).
- ``stream_sessionize``: native ``session_window`` (same result as the
  batch gap-sessionizer, tested equal in tests/test_streaming.py).
- ``stream_peak_picker``: the reference's recursive peak smoother
  (onsets.py:227-262) as a STATEFUL streaming operator — the recursion
  ``g' = max(v, a*g + (1-a)*v)`` carries across micro-batches in
  ``applyInPandasWithState`` per doc.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .spectral import FeatureConfig, extract_features

DOCS_STREAM_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, "
                      "source string")


def stream_features(spark, src_path: str, out_path: str,
                    checkpoint: str, cfg: FeatureConfig | None = None,
                    trigger_once: bool = True):
    """File-stream of docs -> feature battery -> parquet sink.

    foreachBatch keeps the batch extractor (zero-shuffle plan) and the
    checkpoint dir gives exactly-once file semantics / resume.
    Returns the StreamingQuery.
    """
    cfg = cfg or FeatureConfig()
    stream = (spark.readStream.schema(DOCS_STREAM_SCHEMA)
              .parquet(src_path))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        feats = extract_features(batch_df, cfg)
        feats.write.mode("append").parquet(out_path)

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


PEAK_STATE_SCHEMA = "g double, carry_rows int"
PEAK_OUT_SCHEMA = "doc_id string, seg_idx long, value double, is_peak boolean"


def _peak_fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
    """Stateful scan: conditions 1-2 of the picker need a +-n window, so
    streaming mode applies the smoother condition (cond3) plus a local
    3-segment max; exactness vs the batch picker holds when segments of
    a doc arrive in one group-batch (tested)."""
    alpha, delta, half = 0.1, 0.1, 3
    g = state.get[0] if state.exists else 0.0
    for pdf in pdfs:
        pdf = pdf.sort_values("seg_idx").reset_index(drop=True)
        vals = pdf["value"].to_numpy()
        n = len(vals)
        is_peak = np.zeros(n, dtype=bool)
        for i in range(n):
            val = vals[i]
            lo, hi = max(0, i - half), min(n, i + half + 1)
            window = vals[lo:hi]
            cond1 = val >= window.max()
            cond2 = val >= window.mean() + delta
            foo = max(val, alpha * g + (1 - alpha) * val)
            cond3 = val >= foo
            g = foo
            is_peak[i] = cond1 and cond2 and cond3
        out = pdf[["doc_id", "seg_idx", "value"]].copy()
        out["is_peak"] = is_peak
        yield out
    state.update((float(g), 0))


def stream_peak_picker(odf_stream: DataFrame) -> DataFrame:
    """Apply the stateful peak scan to a streaming odf
    (doc_id, seg_idx, value)."""
    return (odf_stream.groupBy("doc_id")
            .applyInPandasWithState(
                _peak_fn, PEAK_OUT_SCHEMA, PEAK_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def stream_windowed_agg(events: DataFrame, ts_col: str = "ts",
                        value_col: str = "value",
                        window_dur: str = "5 minutes",
                        slide: str | None = None,
                        watermark: str = "10 minutes",
                        by: str | None = None) -> DataFrame:
    """Event-time windowed aggregation with a watermark for late data
    (SURVEY §2.10: the streaming face of the batch tumbling/sliding
    count-windows). Late rows beyond ``watermark`` are dropped and the
    window state is evicted — bounded state on unbounded input.

    Works on a streaming OR batch ``events`` frame (batch ignores the
    watermark, same results — tested equal to the batch tumbling agg).
    """
    from pyspark.sql import functions as F
    ev = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        ev = ev.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window_dur, slide or window_dur)
    keys = [win] + ([F.col(by)] if by else [])
    return (ev.groupBy(*keys)
            .agg(F.count("*").alias("n"),
                 F.sum(value_col).alias("val_sum"),
                 F.avg(value_col).alias("val_avg"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    *([by] if by else []), "n", "val_sum", "val_avg"))


def stream_exact_dedup(docs: DataFrame, content_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup over an unbounded doc stream: keep the
    first arrival of each distinct content value within the watermark
    horizon.

    Scale shape (the streaming face of ``ml.dedup.exact_dedup``): the
    dedup key is ``sha2(content, 256)`` — 32 bytes of state per
    distinct doc instead of the raw text — and
    ``dropDuplicatesWithinWatermark`` evicts key state once the
    watermark passes, so state is bounded by the arrival-rate x
    horizon product, never by corpus size. (All-time exact dedup over
    an unbounded stream is unbounded state by definition; the batch
    operator covers that case.)

    Works on a streaming OR batch frame; batch falls back to plain
    dropDuplicates on the hash (same survivors modulo arrival order,
    which batch has no notion of).
    """
    from pyspark.sql import functions as F
    keyed = docs.withColumn(
        "__content_h",
        F.unhex(F.sha2(F.col(content_col).cast("string"), 256)))
    if docs.isStreaming:
        out = (keyed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["__content_h"]))
    else:
        out = keyed.dropDuplicates(["__content_h"])
    return out.drop("__content_h")
