"""Content-based similarity pipeline (reference entry point C,
SURVEY §3.3): per-doc Poisson-HMM descriptors -> Gamma-SOM (Hellinger
metric over flattened transition matrices) -> BMU 'position' queries.

This is the apollon end-game: two docs are similar when their HMM
transition structures map to nearby SOM units. Engine shape:

  docs --(mapInPandas HMM fit)--> models(doc_id, gamma flat)
       --(batch SOM, hellinger)--> weights (broadcast, tiny)
       --(mapInPandas BMU)------> positions(doc_id, bmu, bmu_dist)

No stage shuffles doc payloads; the only driver-side state is the
(n_units x m^2) weight matrix per epoch.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hmm import fit_hmm_docs
from .som import SomGrid, SomParams, assign_bmu, fit_batch_som, umatrix


def hmm_descriptor_table(docs: DataFrame, m_states: int = 3,
                         max_obs: int | None = 4096,
                         max_iter: int = 300) -> DataFrame:
    """(doc_id, gamma_flat array<double>) for converged fits — the
    stochastic-matrix descriptor the reference feeds its SOM
    (som/utilities.py 'stm' init + hellinger metric)."""
    models = fit_hmm_docs(docs, m_states=m_states, max_obs=max_obs,
                          max_iter=max_iter)
    return (models.where(F.col("success"))
            .select("doc_id", F.flatten("gamma").alias("gamma_flat")))


def fit_similarity_map(docs: DataFrame, m_states: int = 3,
                       som_rows: int = 8, som_cols: int = 8,
                       n_iter: int = 8, seed: int = 10,
                       max_obs: int | None = 4096):
    """Full pipeline. Returns (positions DataFrame, weights, qerrors).

    positions: (doc_id, bmu, bmu_dist) — docs sharing a BMU (or nearby
    units on the lattice) are structurally similar sequences."""
    desc = hmm_descriptor_table(docs, m_states, max_obs=max_obs)
    desc.cache()
    p = SomParams(som_rows, som_cols, n_iter=n_iter, metric="hellinger",
                  init="stm", seed=seed)
    weights, qerrors = fit_batch_som(desc, "gamma_flat", p)
    positions = assign_bmu(desc, "gamma_flat", weights,
                           metric="hellinger")
    out = positions.select("doc_id", "bmu", "bmu_dist")
    return out, weights, qerrors


def similarity_umatrix(weights: np.ndarray, som_rows: int,
                       som_cols: int) -> np.ndarray:
    """U-matrix of the fitted Gamma-SOM (som/som.py:276-302) — cluster
    boundaries of the sequence-structure space."""
    return umatrix(weights, SomGrid(som_rows, som_cols), metric="hellinger")


def calibrate(positions: DataFrame, labels: DataFrame,
              on: str = "doc_id", label_col: str = "label") -> DataFrame:
    """Label each SOM unit by the majority label of the docs mapped to
    it (som/som.py calibrate/distribute semantics as one grouped agg)."""
    joined = positions.join(labels.select(on, label_col), on)
    return (joined.groupBy("bmu", label_col)
            .agg(F.count("*").alias("n"))
            .groupBy("bmu")
            .agg(F.max_by(label_col, F.col("n")).alias("unit_label"),
                 F.sum("n").alias("n_docs")))


def predict(positions: DataFrame, unit_labels: DataFrame) -> DataFrame:
    """Propagate unit labels back to docs (som predict):
    (doc_id, bmu, unit_label)."""
    return positions.join(F.broadcast(unit_labels), "bmu") \
        .select("doc_id", "bmu", "unit_label")
