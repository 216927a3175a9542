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


def _cos_sim_udf():
    """Arrow-batched cosine: one einsum per batch, zero-norm -> 0.0
    (never NaN — Spark orders NaN above every number, so a NaN would
    outrank every true neighbor)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_sim(va: pd.Series, vb: pd.Series) -> pd.Series:
        x = np.stack(va.to_numpy()).astype("float64")
        y = np.stack(vb.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", x, y)
        denom = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
        out = np.zeros(len(dots))
        np.divide(dots, denom, out=out, where=denom > 0)
        return pd.Series(out)

    return cos_sim


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


def lsh_ann_candidates(vectors: DataFrame, queries: np.ndarray,
                       q_ids: np.ndarray, n_planes: int = 8,
                       seed: int = 11, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       multiprobe: bool = True) -> DataFrame:
    """Rank-free candidate mining + exact-cosine scoring stage of
    ``lsh_ann_topk``: (q_id, id, sim) for every row that shares a
    probed bucket with a query. Split out so the bucket join + re-rank
    math can be value-oracled directly (the top-k window cut is
    verified separately by the window-top-k gates).

    Multi-probe (default): each query probes its own bucket plus all
    Hamming-1 neighbors (flip one sign bit), raising recall when the
    query sits near a hyperplane, for n_planes+1 bucket keys per query
    instead of 1 — still an equi-join, never a product.

    Scale shape: candidate generation runs on (id, bucket) keys only;
    vectors join in once per surviving candidate, and scoring is one
    einsum per Arrow batch (no interpreted SQL folds)."""
    dim = queries.shape[1]
    planes = hyperplanes(dim, n_planes, seed)
    buckets = lsh_bucket_stage(vectors, planes, id_col, vec_col)
    qn = _normalize(np.asarray(queries, "float64"))
    weights = (1 << np.arange(n_planes)).astype("int64")
    q_buckets = ((qn @ planes.T) > 0) @ weights

    spark = vectors.sparkSession
    probe_rows = []
    for i in range(len(qn)):
        qid, base = int(q_ids[i]), int(q_buckets[i])
        probe_rows.append((qid, base))
        if multiprobe:
            probe_rows.extend((qid, base ^ (1 << b)) for b in range(n_planes))
    probes = spark.createDataFrame(probe_rows, "q_id long, q_bucket long")
    qdf = spark.createDataFrame(
        [(int(q_ids[i]), qn[i].tolist()) for i in range(len(qn))],
        "q_id long, q_vec array<double>")

    # keys-only candidate mining: the embedding payloads never enter
    # the bucket join. No dedup needed — each row sits in exactly one
    # bucket and a query's probe set {base} U {base^(1<<b)} is
    # pairwise distinct, so the join emits each (q_id, id) at most
    # once (a dropDuplicates here would hash-exchange the whole
    # candidate set for nothing).
    cand_keys = (buckets
                 .join(F.broadcast(probes),
                       F.col("bucket") == F.col("q_bucket"))
                 .select("q_id", "id"))
    cand = (cand_keys
            .join(vectors.select(F.col(id_col).alias("id"),
                                 F.col(vec_col).alias("v")), "id")
            .join(F.broadcast(qdf), "q_id"))
    cos_sim = _cos_sim_udf()
    return cand.select("q_id", "id", cos_sim("v", "q_vec").alias("sim"))


def lsh_ann_topk(vectors: DataFrame, queries: np.ndarray,
                 q_ids: np.ndarray, k: int = 10, n_planes: int = 8,
                 seed: int = 11, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: rows and queries bucket by hyperplane signs;
    exact cosine re-rank only inside the probed buckets (see
    ``lsh_ann_candidates`` for the mining/scoring semantics)."""
    scored = lsh_ann_candidates(vectors, queries, q_ids, n_planes, seed,
                                id_col, vec_col, multiprobe)
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# IVF (coarse-quantizer routing)
# ---------------------------------------------------------------------------

def kmeans_centroids(sample: np.ndarray, n_centroids: int, n_iter: int = 20,
                     seed: int = 13) -> np.ndarray:
    """Lloyd's with kmeans++ seeding on a driver-side sample
    (centroids are tiny). ++ seeding avoids the empty/duplicate-
    cluster collapses of uniform seeding, which directly costs IVF
    recall (a dead list means its vectors hide behind a far
    centroid)."""
    rng = np.random.default_rng(seed)
    sample = np.asarray(sample, "float64")
    if len(sample) == 0:
        return sample.reshape(0, sample.shape[1] if sample.ndim > 1 else 0)
    k = min(n_centroids, len(sample))
    first = int(rng.integers(len(sample)))
    chosen = [first]
    d2 = ((sample - sample[first]) ** 2).sum(-1)
    for _ in range(k - 1):
        tot = d2.sum()
        if tot <= 0:
            # all remaining points coincide with a centroid: pick any
            # not-yet-chosen index rather than duplicating one
            rest = np.setdiff1d(np.arange(len(sample)), chosen)
            if rest.size == 0:
                break
            chosen.append(int(rng.choice(rest)))
        else:
            chosen.append(int(rng.choice(len(sample), p=d2 / tot)))
        d2 = np.minimum(d2, ((sample - sample[chosen[-1]]) ** 2).sum(-1))
    cents = sample[chosen].copy()
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            pts = sample[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def ivf_candidates(vectors: DataFrame, queries: np.ndarray,
                   q_ids: np.ndarray, n_centroids: int = 16,
                   n_probe: int = 4, sample_size: int = 2048,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: np.ndarray | None = None) -> DataFrame:
    """Rank-free IVF mining + scoring stage of ``ivf_topk``: route rows
    to their nearest centroid (ties -> lowest list, argmin convention),
    probe the ``n_probe`` centroids nearest to each query (stable
    argsort -> lowest list on ties), exact-cosine score inside the
    probed lists; returns (q_id, id, sim).

    ``centroids`` overrides the kmeans++ training with explicit
    vectors, making the whole stage a deterministic function of its
    inputs — the contract gate passes the first rows of the corpus so
    a SQL oracle can re-derive routing, probing, and scoring exactly
    (same device as som_train's explicit w0)."""
    if centroids is None:
        sample = np.stack([
            np.asarray(r[0], "float64")
            for r in vectors.select(vec_col).limit(sample_size).collect()])
        cents = kmeans_centroids(sample, n_centroids)
    else:
        cents = np.asarray(centroids, "float64")
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
    probes = spark.createDataFrame(probe_rows, "q_id long, list_id int")
    qnn = _normalize(qn)
    qdf = spark.createDataFrame(
        [(int(q_ids[i]), qnn[i].tolist()) for i in range(len(qnn))],
        "q_id long, q_vec array<double>")

    # keys-only candidate mining (each row sits in exactly one list and
    # probe lists are distinct per query, so no dedup needed)
    cand_keys = (lists.join(F.broadcast(probes), "list_id")
                 .select("q_id", "id"))
    cand = (cand_keys
            .join(vectors.select(F.col(id_col).alias("id"),
                                 F.col(vec_col).alias("v")), "id")
            .join(F.broadcast(qdf), "q_id"))
    cos_sim = _cos_sim_udf()
    return cand.select("q_id", "id", cos_sim("v", "q_vec").alias("sim"))


def ivf_topk(vectors: DataFrame, queries: np.ndarray, q_ids: np.ndarray,
             k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             sample_size: int = 2048, id_col: str = "vec_id",
             vec_col: str = "embedding",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF ANN: route rows to nearest centroid, probe the ``n_probe``
    centroids nearest to each query, exact re-rank inside the probed
    lists (see ``ivf_candidates`` for the mining/scoring semantics)."""
    scored = ivf_candidates(vectors, queries, q_ids, n_centroids,
                            n_probe, sample_size, id_col, vec_col,
                            centroids)
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
