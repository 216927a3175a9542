"""End-to-end HMM -> Gamma-SOM similarity: docs with the same hidden
regime structure must land on the same/nearby SOM units."""
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
import pytest

from apollon_spark.similarity import (calibrate, fit_similarity_map,
                                      predict, similarity_umatrix)


@pytest.fixture(scope="module")
def two_class_docs(spark):
    """Class A: sticky 2-regime process (lam 10/100, stay .99).
    Class B: fast-switching (stay .7). Same marginals, different Gamma
    -> separable ONLY through transition structure."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                cls = i % 2
                stay = 0.99 if cls == 0 else 0.70
                rng = np.random.default_rng(
                    zlib.crc32(f"sim{i}".encode()) & 0xFFFFFFFF)
                lams = np.array([10.0, 100.0])
                state = rng.integers(2)
                toks = np.empty(3000, dtype="int32")
                for t in range(3000):
                    if rng.random() > stay:
                        state = 1 - state
                    toks[t] = rng.poisson(lams[state])
                rows.append((f"sim{i:03d}", toks.tolist(), 3000,
                             f"class{cls}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "n_tok", "source"])

    return spark.range(24).repartition(4).mapInPandas(
        gen, "doc_id string, tokens array<int>, n_tok int, source string")


def test_similarity_pipeline_separates_classes(spark, two_class_docs):
    positions, weights, qerr = fit_similarity_map(
        two_class_docs, m_states=2, som_rows=4, som_cols=4, n_iter=6,
        max_obs=3000)
    pos = positions.toPandas()
    assert len(pos) >= 20                  # most fits converge
    labels = two_class_docs.selectExpr("doc_id", "source as label")
    units = calibrate(positions, labels, label_col="label")
    pred = predict(positions, units).toPandas()
    truth = {r["doc_id"]: r["source"]
             for r in two_class_docs.select("doc_id", "source").collect()}
    acc = np.mean([truth[r.doc_id] == r.unit_label
                   for r in pred.itertuples()])
    assert acc >= 0.85                     # structure-only separation
    u = similarity_umatrix(weights, 4, 4)
    assert u.shape == (4, 4) and np.isfinite(u).all()
    assert qerr[-1] <= qerr[0]
