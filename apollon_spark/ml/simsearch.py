"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — queries are broadcast as a
  numpy matrix; one vectorized mapInPandas pass scores every row
  against all queries (one BLAS matmul per Arrow batch), then a
  per-query window keeps the top k. The exactness baseline.
- ``lsh_ann``: random-hyperplane LSH — signatures in pure SQL-callable
  form, bucket join, exact re-rank inside buckets. The scale path:
  candidate generation is an equi-join, no all-pairs product.
- ``ivf_topk``: IVF-style — k-means centroids from a driver-side
  sample, broadcast; rows route to their nearest centroid (coarse
  quantizer), queries probe ``n_probe`` nearest lists only.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-30)


def _score_stage(vectors: DataFrame, id_col: str, vec_col: str,
                 queries: np.ndarray, q_ids: np.ndarray) -> DataFrame:
    """(id, q_id, sim) for every row x query — vectorized cosine."""
    spark = vectors.sparkSession
    bq = spark.sparkContext.broadcast(
        {"q": _normalize(np.asarray(queries, "float64")), "ids": q_ids})

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = bq.value
        qm, qids = st["q"], st["ids"]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _normalize(np.stack(
                [np.asarray(v, "float64") for v in pdf[vec_col]]))
            sims = x @ qm.T                       # (batch, n_q)
            n, nq = sims.shape
            yield pd.DataFrame({
                "id": np.repeat(pdf[id_col].to_numpy(), nq),
                "q_id": np.tile(qids, n),
                "sim": sims.ravel()})

    return vectors.select(id_col, vec_col).mapInPandas(
        gen, "id long, q_id long, sim double")


def brute_force_topk(vectors: DataFrame, queries: np.ndarray,
                     q_ids: np.ndarray, k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query: (q_id, id, sim, rank)."""
    scored = _score_stage(vectors, id_col, vec_col, queries, q_ids)
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "id", "sim", "rank"))


def cosine_pairs_above(vectors: DataFrame, queries: np.ndarray,
                       q_ids: np.ndarray, threshold: float,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """All (query, row) pairs with cosine >= threshold (rank-free —
    deterministic under ties, used by the SQL oracle checks)."""
    scored = _score_stage(vectors, id_col, vec_col, queries, q_ids)
    return scored.where(F.col("sim") >= threshold).select("q_id", "id", "sim")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_stage(vectors: DataFrame, planes: np.ndarray,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id, bucket) — sign-pattern of the dot products with the
    broadcast hyperplanes, packed into one long."""
    spark = vectors.sparkSession
    bp = spark.sparkContext.broadcast(planes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        pows = (1 << np.arange(pl.shape[0])).astype("int64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack([np.asarray(v, "float64") for v in pdf[vec_col]])
            signs = (x @ pl.T) > 0
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(),
                                "bucket": signs @ pows})

    return vectors.select(id_col, vec_col).mapInPandas(
        gen, "id long, bucket long")


def lsh_ann_topk(vectors: DataFrame, queries: np.ndarray,
                 q_ids: np.ndarray, k: int = 10, n_planes: int = 8,
                 seed: int = 11, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: rows and queries bucket by hyperplane signs;
    exact cosine re-rank only inside the query's bucket."""
    dim = queries.shape[1]
    planes = hyperplanes(dim, n_planes, seed)
    buckets = lsh_bucket_stage(vectors, planes, id_col, vec_col)
    qn = _normalize(np.asarray(queries, "float64"))
    q_buckets = ((qn @ planes.T) > 0) @ (1 << np.arange(n_planes)).astype("int64")

    spark = vectors.sparkSession
    qdf = spark.createDataFrame(
        pd.DataFrame({"q_id": q_ids, "q_bucket": q_buckets,
                      "q_vec": list(qn)}))
    bkt = buckets.withColumnRenamed("id", "bid")
    cand = (vectors.select(F.col(id_col).alias("id"), vec_col)
            .join(bkt, F.col("id") == F.col("bid")).drop("bid")
            .join(F.broadcast(qdf), F.col("bucket") == F.col("q_bucket")))
    dot = F.aggregate(
        F.zip_with(vec_col, "q_vec", lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x))
    scored = cand.select(
        "q_id", "id",
        (dot / F.when(norm > 0, norm).otherwise(F.lit(1.0))).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer routing)
# ---------------------------------------------------------------------------

def kmeans_centroids(sample: np.ndarray, n_centroids: int, n_iter: int = 20,
                     seed: int = 13) -> np.ndarray:
    """Plain Lloyd's on a driver-side sample (centroids are tiny)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cents = sample[idx].astype("float64")
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            pts = sample[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def ivf_topk(vectors: DataFrame, queries: np.ndarray, q_ids: np.ndarray,
             k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             sample_size: int = 2048, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: route rows to nearest centroid, probe the ``n_probe``
    centroids nearest to each query, exact re-rank inside the probed
    lists."""
    sample = np.stack([
        np.asarray(r[0], "float64")
        for r in vectors.select(vec_col).limit(sample_size).collect()])
    cents = kmeans_centroids(sample, n_centroids)
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast(cents)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cc = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack([np.asarray(v, "float64") for v in pdf[vec_col]])
            d = ((x[:, None, :] - cc[None, :, :]) ** 2).sum(-1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(),
                                "list_id": d.argmin(axis=1).astype("int32")})

    lists = vectors.select(id_col, vec_col).mapInPandas(
        assign, "id long, list_id int")

    qn = np.asarray(queries, "float64")
    dq = ((qn[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    probe_rows = [
        (int(q_ids[i]), int(c)) for i in range(len(qn))
        for c in np.argsort(dq[i])[:n_probe]
    ]
    probes = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=["q_id", "list_id"]))
    qdf = spark.createDataFrame(
        pd.DataFrame({"q_id": q_ids, "q_vec": list(_normalize(qn))}))

    lst = lists.withColumnRenamed("id", "lid")
    cand = (vectors.select(F.col(id_col).alias("id"), vec_col)
            .join(lst, F.col("id") == F.col("lid")).drop("lid")
            .join(F.broadcast(probes), "list_id")
            .join(F.broadcast(qdf), "q_id"))
    dot = F.aggregate(
        F.zip_with(vec_col, "q_vec", lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x))
    scored = cand.select(
        "q_id", "id",
        (dot / F.when(norm > 0, norm).otherwise(F.lit(1.0))).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
