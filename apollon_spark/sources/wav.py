"""Distributed WAV audio source (reference surface: audio.py
``AudioFile.read`` / ``load_audio``, audio.py:24-138).

The reference reads audio with libsndfile; this source needs no codec
libraries at all — RIFF/PCM WAV parses with the stdlib ``wave``
module + numpy, so it runs on any executor. Files arrive through
Spark's ``binaryFile`` datasource (one row per file, payload as
bytes) and a vectorized mapInPandas decodes each batch:

  read_wav_docs(spark, "s3://bucket/audio/*.wav")
    -> (doc_id, tokens array<double>, n_tok, fps, n_channels, source)

matching the engine's canonical docs shape, so the whole feature
battery runs on real audio unchanged. ``doc_id`` is the full file
path without extension (unique across shard directories).

Semantics mirrored from the reference:
- mono mixdown = mean over channels (audio.py:131-132), the same fold
  as ``functions.scalars.mono_mixdown``;
- ``norm=True`` peak-normalizes per file (signal/tools.normalize);
- int PCM is scaled to [-1, 1) by the sample-width full scale, the
  inverse of ``fti16`` (audio.py:141-150).

Scale note: binaryFile yields ONE row per file, so a multi-GB WAV is
one task until split — route long files through
``operators.framing.split_docs_halo`` after load, exactly like token
whales. Column pruning works: a metadata-only projection
(path/length) never deserializes payloads.
"""
from __future__ import annotations

import io
import os
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WAV_DOCS_SCHEMA = ("doc_id string, tokens array<double>, n_tok int, "
                   "fps int, n_channels int, source string")

_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def parse_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """bytes -> (fps, n_channels, float64 samples (n, ch) in [-1, 1)).

    PCM 8/16/32-bit via the stdlib ``wave`` reader; 8-bit WAV is
    unsigned per the RIFF spec and is re-centered."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        fps = wf.getframerate()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        n = wf.getnframes()
        raw = wf.readframes(n)
    if width not in _WIDTH_DTYPE:
        raise ValueError(f"unsupported PCM sample width {width}")
    arr = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).astype("float64")
    if width == 1:
        arr = arr - 128.0          # unsigned 8-bit -> centered
        scale = 128.0
    else:
        scale = float(2 ** (8 * width - 1))
    arr = (arr / scale).reshape(-1, ch)
    return fps, ch, arr


def read_wav_docs(spark: SparkSession, path: str, mono: bool = True,
                  norm: bool = False) -> DataFrame:
    """Scan a directory/glob of .wav files into the canonical docs
    shape. doc_id = full file path without the extension (basenames can
    collide across subdirectories; see the module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                fps, ch, samples = parse_wav(bytes(content))
                if mono and ch > 1:
                    samples = samples.mean(axis=1)      # audio.py:131-132
                else:
                    samples = samples[:, 0] if mono else samples.ravel()
                if norm:
                    peak = np.abs(samples).max()
                    if peak > 0:
                        samples = samples / peak
                # doc_id from the FULL path (extension stripped):
                # same-basename files in different shards must not
                # collide into one doc
                base = os.path.splitext(p)[0]
                rows.append((base, samples.tolist(), len(samples),
                             fps, ch, p))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "tokens", "n_tok", "fps", "n_channels", "source"])

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.wav")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(gen, WAV_DOCS_SCHEMA)
