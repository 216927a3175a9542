"""Structured-Streaming session windows == batch gap sessionization."""
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from apollon_spark.operators.sessionize import (session_bounds, sessionize,
                                                sessionize_streaming)


def test_streaming_session_window_matches_batch(spark, tmp_path):
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:10:00",
            "2024-01-01 02:00:00", "2024-01-01 00:00:00",
            "2024-01-01 03:00:00"]),
    })
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp")) \
        .write.mode("overwrite").parquet(src)

    schema = "user_id long, ts timestamp"
    events = spark.readStream.schema(schema).parquet(src)
    agg = sessionize_streaming(events, on="ts", gap_duration="30 minutes",
                               by="user_id")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("sess_out").start())
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sess_out").toPandas() \
            .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    finally:
        q.stop()

    batch = spark.read.parquet(src)
    b = sessionize(batch.withColumn("t", F.unix_micros(F.col("ts"))),
                   on="t", gap=1_800_000_000, by="user_id")
    want = session_bounds(b, on="t", by="user_id").toPandas() \
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)

    assert len(got) == len(want) == 4
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    # session_window end = last event + gap; starts align with batch
    got_start_us = got["session_start"].astype("int64") // 1000
    # pandas datetime64[ns] -> us
    assert (got_start_us.to_numpy() == want["session_start"].to_numpy()).all()
