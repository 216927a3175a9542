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


def _wav_bytes(samples, fps=8000):
    """samples: (n, ch) float in [-1, 1) -> PCM16 WAV bytes."""
    import io
    import wave
    pcm = np.clip(samples * 32768, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(fps)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_real_audio_decode_parity(spark):
    """kind='audio' decodes for REAL (stdlib WAV parser — no codec
    lib needed): distributed features == local re-derivation."""
    import pandas as pd
    from apollon_spark.ml.multimodal import _audio_features
    rng = np.random.default_rng(5)
    wavs = [_wav_bytes(rng.uniform(-0.9, 0.9, (400, ch)))
            for ch in (1, 2, 2)]
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": [f"w{i}" for i in range(3)],
        "kind": "audio", "payload": wavs, "mime": "audio/wav",
        "width": 0, "height": 0, "duration_ms": 50}))
    got = extract_media_features(media, dim=6, fake_decode=False) \
        .toPandas().sort_values("media_id").reset_index(drop=True)
    for i, feat in enumerate(got["feature"]):
        np.testing.assert_allclose(
            np.asarray(feat), _audio_features(wavs[i], 6), atol=0)


def test_real_image_decode_parity(spark):
    """kind='image' decodes for real when PIL is importable (skipped
    in codec-less CI; fake_decode stays the CI path)."""
    pytest.importorskip("PIL")
    import io

    import pandas as pd
    from PIL import Image
    from apollon_spark.ml.multimodal import _image_features
    rng = np.random.default_rng(6)
    payloads = []
    for _ in range(3):
        img = Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), "RGB")
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payloads.append(buf.getvalue())
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": [f"i{i}" for i in range(3)],
        "kind": "image", "payload": payloads, "mime": "image/png",
        "width": 16, "height": 16, "duration_ms": 0}))
    got = extract_media_features(media, dim=4, fake_decode=False) \
        .toPandas().sort_values("media_id").reset_index(drop=True)
    for i, feat in enumerate(got["feature"]):
        np.testing.assert_allclose(
            np.asarray(feat), _image_features(payloads[i], 4), atol=0)


def test_soundfile_decode_parity(spark):
    """Audio-beyond-WAV probe (VERDICT r03 #8, mirrors the PIL
    pattern): when soundfile/libsndfile is importable, a FLAC payload
    decodes through the seam and a PCM16 WAV decoded by BOTH paths
    (stdlib parser vs soundfile) yields the same binned features.
    Skipped when soundfile is absent (this sandbox)."""
    sf = pytest.importorskip("soundfile")
    import io

    import pandas as pd
    from apollon_spark.ml.multimodal import (_audio_features,
                                             _audio_features_soundfile)
    rng = np.random.default_rng(7)
    samples = rng.uniform(-0.9, 0.9, (400, 1))
    wav = _wav_bytes(samples)
    # same-signal parity between the two decoders (PCM16 is lossless)
    np.testing.assert_allclose(_audio_features_soundfile(wav, 6),
                               _audio_features(wav, 6), atol=1e-9)
    # a non-WAV container goes through the soundfile branch end-to-end
    buf = io.BytesIO()
    pcm = np.clip(samples * 32768, -32768, 32767).astype("<i2")
    sf.write(buf, pcm, 8000, format="FLAC")
    media = spark.createDataFrame(pd.DataFrame({
        "media_id": ["f0"], "kind": "audio", "payload": [buf.getvalue()],
        "mime": "audio/flac", "width": 0, "height": 0,
        "duration_ms": 50}))
    got = extract_media_features(media, dim=6, fake_decode=False) \
        .toPandas()
    assert len(got) == 1 and len(got["feature"].iloc[0]) == 6
