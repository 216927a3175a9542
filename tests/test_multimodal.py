"""Multimodal plumbing: schema, determinism, stub seam, frame plan."""
import numpy as np
import pytest

from apollon_spark.ml.multimodal import (extract_media_features,
                                         frame_sample_plan, synth_media)


def test_media_features_deterministic(spark):
    media = synth_media(spark, 16)
    a = extract_media_features(media, dim=8).toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    b = extract_media_features(media, dim=8).toPandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(a) == 16
    for x, y in zip(a["feature"], b["feature"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert len(x) == 8
        assert all(0.0 <= v < 1.0 for v in x)


def test_real_decode_raises_at_seam(spark):
    media = synth_media(spark, 2)
    with pytest.raises(Exception):
        extract_media_features(media, dim=4, fake_decode=False).collect()


def test_frame_sample_plan(spark):
    media = synth_media(spark, 4)
    plan = frame_sample_plan(media, every_ms=250).toPandas()
    rows = media.select("media_id", "duration_ms").toPandas()
    for _, r in rows.iterrows():
        n = len(plan[plan["media_id"] == r["media_id"]])
        assert n == (r["duration_ms"] + 249) // 250
