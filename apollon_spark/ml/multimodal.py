"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (no codec libraries in this environment):
``fake_decode=True`` derives a deterministic feature vector from the
bytes so the Spark-side plumbing — schema, partition sizing, Arrow
batch shape, UDF signatures — is real and tested; ``fake_decode=False``
raises NotImplementedError at the exact seam where a real
decoder (PIL/libsndfile/ffmpeg) would plug in.

Scale notes: binary payloads dominate partition size, so stages set
``maxRecordsPerBatch`` expectations low and never collect payloads;
metadata-only projections prune the binary column at the parquet scan.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "mime string, width int, height int, duration_ms int")


def synth_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                seed = int(i)
                payload = hashlib.sha256(f"media{seed}".encode()).digest() * 8
                rows.append((f"m{seed:06d}", kind, payload,
                             "application/octet-stream",
                             64 + seed % 32, 64 + seed % 16,
                             1000 + seed * 10))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms"])
    return spark.range(n).repartition(2).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoder+encoder: bytes -> sha256
    stream -> dim floats in [0, 1)."""
    need = dim * 4
    buf = b""
    h = payload
    while len(buf) < need:
        h = hashlib.sha256(h).digest()
        buf += h
    arr = np.frombuffer(buf[:need], dtype="<u4").astype("float64")
    return arr / 2**32


def _image_features(payload: bytes, dim: int) -> np.ndarray:
    """Real image decode (requires PIL): grayscale, resize to a 1 x dim
    strip with bilinear resampling, pixels scaled to [0, 1]."""
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(payload)).convert("L") \
        .resize((dim, 1), Image.BILINEAR)
    return np.asarray(img, dtype="float64").ravel() / 255.0


def _binned_amplitude(mono: np.ndarray, dim: int) -> np.ndarray:
    """Mean absolute amplitude over ``dim`` equal time bins."""
    if mono.size == 0:
        return np.zeros(dim)
    bins = np.array_split(np.abs(mono), dim)
    return np.array([b.mean() if b.size else 0.0 for b in bins])


def _audio_features(payload: bytes, dim: int) -> np.ndarray:
    """Real audio decode via the stdlib WAV parser (sources/wav.py —
    no external codec needed): mono mixdown, then binned amplitude."""
    from ..sources.wav import parse_wav
    _, ch, arr = parse_wav(payload)
    mono = arr.mean(axis=1) if ch > 1 else arr.ravel()
    return _binned_amplitude(mono, dim)


def _audio_features_soundfile(payload: bytes, dim: int) -> np.ndarray:
    """Audio-beyond-WAV decode probe (FLAC/OGG/AIFF/...): the same
    import-if-available pattern as the PIL image path. ``soundfile``
    (libsndfile) normalizes to float in [-1, 1]; rescale to the
    int16-peak convention of the stdlib path so both decoders feed
    the same feature space (parity pinned in test_multimodal, skipped
    when soundfile is absent — which it is in this sandbox)."""
    import io

    import soundfile as sf
    data, _sr = sf.read(io.BytesIO(payload), dtype="float64",
                        always_2d=True)
    mono = data.mean(axis=1) * 32768.0
    return _binned_amplitude(mono, dim)


def extract_media_features(media: DataFrame, dim: int = 16,
                           fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract stage: (media_id, kind, feature
    array<double>). Vectorized mapInPandas over binary payloads.

    ``fake_decode=False`` decodes for REAL where a decoder exists:
    'audio' RIFF payloads are WAV-parsed with the stdlib decoder
    (sources/wav.py), non-WAV audio uses soundfile/libsndfile when
    importable, 'image' payloads use PIL when importable; other kinds
    (or audio/image without the optional lib) raise
    NotImplementedError at this seam — plug ffmpeg/torchaudio/etc. in
    here."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fake_decode:
                feats = [_fake_features(p, dim) for p in pdf["payload"]]
            else:
                feats = []
                for kind, p in zip(pdf["kind"], pdf["payload"]):
                    if kind == "audio":
                        raw = bytes(p)
                        if raw[:4] == b"RIFF":
                            feats.append(_audio_features(raw, dim))
                        else:
                            # non-WAV container: soundfile if present,
                            # else the documented seam
                            try:
                                feats.append(
                                    _audio_features_soundfile(raw, dim))
                            except ImportError as exc:
                                raise NotImplementedError(
                                    "non-WAV audio decode requires "
                                    "soundfile (libsndfile), absent "
                                    "here; install it or plug a "
                                    "decoder in at this seam") from exc
                    elif kind == "image":
                        try:
                            feats.append(_image_features(bytes(p), dim))
                        except ImportError as exc:
                            raise NotImplementedError(
                                "image decode requires PIL, absent "
                                "here; install pillow or plug a "
                                "decoder in at this seam") from exc
                    else:
                        raise NotImplementedError(
                            f"no decoder for kind={kind!r} (video "
                            "needs ffmpeg) — plug one in at this seam")
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": feats})

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, "media_id string, kind string, feature array<double>")


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan (metadata-only — prunes the payload
    column at the scan): one row per sampled frame timestamp."""
    return (
        media.select("media_id", "duration_ms")
        .withColumn("frame_ts_ms", F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))))
    )
