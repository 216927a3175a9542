"""Deterministic synthetic docs-table generators (FIXTURES.md F1/F2/F6).

Generation is DISTRIBUTED: the driver only materializes a range of doc
indices; each executor derives every doc's content from a per-doc seed
(crc32 of doc_id), so the same table is reproduced at any parallelism
and any scale — the pattern that still works at 10^12 docs.
"""
from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DOCS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"

# Regime-switching Poisson parameters (match the reference's HMM test
# oracle, tests/hmm/test_hmm.py:29-33)
REGIME_LAMBDAS = np.array([20.0, 40.0, 80.0, 120.0])


def _doc_seed(doc_id: str) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) & 0xFFFFFFFF


def _gen_length(rng: np.random.Generator, whales: bool) -> int:
    """Zipf-ish mixture per FIXTURES.md F1: 90% short, 9% medium,
    1% whales (skew/salting path)."""
    u = rng.random()
    if u < 0.90 or not whales:
        return int(rng.integers(2_000, 8_192))
    if u < 0.99:
        return int(rng.integers(8_192, 65_536))
    return int(rng.integers(262_144, 1_048_576))


def _regime_tokens(rng: np.random.Generator, n_tok: int,
                   n_states: int = 4, stay: float = 0.995) -> np.ndarray:
    """Markov regime process with Poisson emissions, vectorized:
    draw regime run-lengths geometrically, then one Poisson call."""
    lams = REGIME_LAMBDAS[:n_states]
    states = []
    total = 0
    state = int(rng.integers(n_states))
    while total < n_tok:
        run = int(rng.geometric(1.0 - stay))
        states.append((state, min(run, n_tok - total)))
        total += run
        nxt = int(rng.integers(n_states - 1))
        state = nxt if nxt < state else nxt + 1
    lam_series = np.concatenate(
        [np.full(r, lams[s]) for s, r in states])[:n_tok]
    return rng.poisson(lam_series).astype("int32")


def synth_docs(spark: SparkSession, n_docs: int, whales: bool = True,
               partitions: int | None = None) -> DataFrame:
    """F1: regime-switching Poisson docs with Zipf-skewed lengths."""
    if partitions is None:
        partitions = min(max(n_docs // 8, 1), 256)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                doc_id = f"doc{int(i):08d}"
                rng = np.random.default_rng(_doc_seed(doc_id))
                n_tok = _gen_length(rng, whales)
                toks = _regime_tokens(rng, n_tok)
                rows.append((doc_id, toks, n_tok, f"src{int(i) % 8}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "n_tok", "source"])

    return (
        spark.range(n_docs).repartition(partitions)
        .mapInPandas(gen, DOCS_SCHEMA)
    )


def synth_docs_sine(spark: SparkSession, n_docs: int = 8,
                    fps: int = 9000, n_tok: int = 9000) -> DataFrame:
    """F2: quantized sinusoid mixtures — the analytic spectral oracle
    (frequencies/amps per tests/signal/test_spectral.py:18-21).
    Doc i uses only component i (mod 5), so its spectral centroid after
    mean removal sits at that component's frequency."""
    frqs = [440.0, 550.0, 660.0, 880.0, 1760.0]
    amps = [1.0, 0.5, 0.25, 0.1, 0.05]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n_tok) / fps
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                k = int(i) % len(frqs)
                sig = 512.0 + 256.0 * amps[k] * np.sin(2 * np.pi * frqs[k] * t)
                toks = np.round(sig).astype("int32")
                rows.append((f"sine{int(i):04d}", toks, n_tok, f"f{frqs[k]:.0f}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "n_tok", "source"])

    return spark.range(n_docs).repartition(2).mapInPandas(gen, DOCS_SCHEMA)


def synth_docs_bursts(spark: SparkSession, n_docs: int = 16,
                      n_tok: int = 16384, n_bursts: int = 4,
                      burst_len: int = 512, quiet_lam: float = 2.0,
                      burst_lam: float = 400.0) -> DataFrame:
    """F6: silence + K bursts at known positions — onset/sessionization
    ground truth. Burst starts are deterministic per doc."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                doc_id = f"burst{int(i):04d}"
                rng = np.random.default_rng(_doc_seed(doc_id))
                toks = rng.poisson(quiet_lam, n_tok)
                span = n_tok // n_bursts
                starts = [b * span + int(rng.integers(span // 4, span // 2))
                          for b in range(n_bursts)]
                for s in starts:
                    toks[s:s + burst_len] = rng.poisson(burst_lam, burst_len)
                rows.append((doc_id, toks.astype("int32"), n_tok,
                             ",".join(str(s) for s in starts)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "n_tok", "source"])

    return spark.range(n_docs).repartition(2).mapInPandas(gen, DOCS_SCHEMA)
