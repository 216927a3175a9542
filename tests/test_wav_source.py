"""Distributed WAV source: stdlib-parsed PCM == local wave read,
mono mixdown parity, end-to-end battery over real audio bytes."""
import io
import os
import wave

import numpy as np
import pytest

from apollon_spark.sources.wav import parse_wav, read_wav_docs


def _write_wav(path, samples, fps=8000, width=2):
    """samples: (n, ch) float in [-1, 1)."""
    scale = 2 ** (8 * width - 1)
    if width == 2:
        pcm = np.clip(samples * scale, -scale, scale - 1).astype("<i2")
    else:
        raise ValueError(width)
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(width)
        wf.setframerate(fps)
        wf.writeframes(pcm.tobytes())


def test_parse_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    sig = rng.uniform(-0.9, 0.9, size=(1000, 2))
    p = tmp_path / "a.wav"
    _write_wav(p, sig, fps=16000)
    fps, ch, got = parse_wav(p.read_bytes())
    assert (fps, ch) == (16000, 2)
    assert got.shape == (1000, 2)
    # int16 quantization error only
    np.testing.assert_allclose(got, sig, atol=1.0 / 32768)


def test_read_wav_docs_mono_and_battery(spark, tmp_path):
    rng = np.random.default_rng(5)
    d = tmp_path / "wavs"
    d.mkdir()
    t = np.arange(4000) / 8000.0
    mono_sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([mono_sig, 0.25 * np.sin(2 * np.pi * 880 * t)], axis=1)
    _write_wav(d / "tone.wav", stereo)
    _write_wav(d / "noise.wav",
               rng.uniform(-0.5, 0.5, size=(3000, 1)))
    (d / "ignored.txt").write_text("not audio")

    docs = read_wav_docs(spark, str(d)).orderBy("doc_id")
    got = docs.toPandas()
    # doc_id = full path sans extension (collision-safe across shard
    # dirs); order noise < tone holds on the shared-prefix paths
    assert [p.rsplit("/", 1)[-1] for p in got["doc_id"]] == \
        ["noise", "tone"]
    assert list(got["n_tok"]) == [3000, 4000]
    assert list(got["n_channels"]) == [1, 2]

    # mono mixdown parity: mean of channels == local wave read mean
    fps, ch, local = parse_wav((d / "tone.wav").read_bytes())
    np.testing.assert_allclose(
        np.asarray(got.loc[1, "tokens"]), local.mean(axis=1), atol=1e-12)

    # the battery runs unchanged on real audio samples
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features
    cfg = FeatureConfig(framing=FramingParams(256, 128), fps=8000)
    feats = extract_features(
        docs.select("doc_id", "tokens", "n_tok", "source"), cfg)
    out = feats.toPandas()
    assert len(out) > 0
    tone = out[out["doc_id"].str.endswith("tone")]
    # mixdown = (0.5*sin440 + 0.25*sin880)/2: magnitude-weighted
    # centroid ~ (440*0.25 + 880*0.125)/0.375 ~ 587 Hz (+ leakage)
    mid = tone.iloc[len(tone) // 2]
    assert 500 < mid["centroid"] < 700


def test_read_wav_norm(spark, tmp_path):
    d = tmp_path / "w2"
    d.mkdir()
    sig = 0.25 * np.sin(2 * np.pi * 100 * np.arange(500) / 8000.0)
    _write_wav(d / "q.wav", sig[:, None])
    got = read_wav_docs(spark, str(d), norm=True).toPandas()
    peak = np.abs(np.asarray(got.loc[0, "tokens"])).max()
    np.testing.assert_allclose(peak, 1.0, atol=1e-9)
