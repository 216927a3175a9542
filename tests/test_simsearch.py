"""Similarity search: brute-force exactness, LSH/IVF recall."""
import numpy as np
import pandas as pd
import pytest

from apollon_spark.ml import simsearch


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(9)
    # clustered vectors so ANN recall is meaningful
    centers = rng.standard_normal((8, 16)) * 3
    vecs = np.concatenate([
        c + 0.5 * rng.standard_normal((50, 16)) for c in centers])
    pdf = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype="int64"),
                        "embedding": list(vecs)})
    return spark.createDataFrame(pdf), vecs


def _true_topk(vecs, queries, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = qn @ vn.T
    return [set(np.argsort(-sims[i])[:k]) for i in range(len(queries))]


def test_brute_force_topk_exact(spark, emb):
    df, vecs = emb
    queries, q_ids = vecs[:3], np.arange(3, dtype="int64")
    got = simsearch.brute_force_topk(df, queries, q_ids, k=10).toPandas()
    want = _true_topk(vecs, queries, 10)
    for q in range(3):
        ids = set(got[got["q_id"] == q]["id"])
        assert len(ids & want[q]) >= 9   # allow 1 tie swap at the margin


def test_lsh_ann_recall(spark, emb):
    df, vecs = emb
    queries, q_ids = vecs[:5], np.arange(5, dtype="int64")
    got = simsearch.lsh_ann_topk(df, queries, q_ids, k=10,
                                 n_planes=6).toPandas()
    want = _true_topk(vecs, queries, 10)
    recalls = []
    for q in range(5):
        ids = set(got[got["q_id"] == q]["id"])
        recalls.append(len(ids & want[q]) / 10)
    assert np.mean(recalls) >= 0.6      # bucketed ANN, clustered data


def test_ivf_recall(spark, emb):
    df, vecs = emb
    queries, q_ids = vecs[:5], np.arange(5, dtype="int64")
    got = simsearch.ivf_topk(df, queries, q_ids, k=10, n_centroids=8,
                             n_probe=3).toPandas()
    want = _true_topk(vecs, queries, 10)
    recalls = []
    for q in range(5):
        ids = set(got[got["q_id"] == q]["id"])
        recalls.append(len(ids & want[q]) / 10)
    assert np.mean(recalls) >= 0.8


def test_lsh_multiprobe_beats_or_matches_single_probe(spark, emb):
    """Multi-probe (Hamming-1) candidates are a superset of the single
    bucket's, so recall@k can only rise; on the fixture it must reach
    0.9 (VERDICT r01 item 6)."""
    df, vecs = emb
    queries, q_ids = vecs[:5], np.arange(5, dtype="int64")
    want = _true_topk(vecs, queries, 5)

    def recall(multiprobe):
        got = simsearch.lsh_ann_topk(df, queries, q_ids, k=5, n_planes=6,
                                     multiprobe=multiprobe).toPandas()
        return np.mean([
            len(set(got[got["q_id"] == q]["id"]) & want[q]) / 5
            for q in range(5)])

    r_multi = recall(True)
    assert r_multi >= recall(False) - 1e-9
    assert r_multi >= 0.9


def test_query_frames_build_in_default_session(spark, emb):
    """Regression for r01 CORRECTNESS errors: the q_vec/probe frames
    must construct without pandas schema inference (explicit DDL +
    tolist), so the operators work in any plain session."""
    df, vecs = emb
    queries, q_ids = vecs[:2], np.arange(2, dtype="int64")
    lsh = simsearch.lsh_ann_topk(df, queries, q_ids, k=3, n_planes=4)
    ivf = simsearch.ivf_topk(df, queries, q_ids, k=3, n_centroids=4,
                             n_probe=2)
    for out in (lsh, ivf):
        pdf = out.toPandas()
        assert len(pdf) == 6
        assert set(pdf.columns) == {"q_id", "id", "sim", "rank"}
        # q0/q1 are rows 0/1 of the corpus: each query's own vector
        # must be its rank-1 hit with sim ~ 1
        best = pdf[pdf["rank"] == 1].set_index("q_id")
        assert best.loc[0, "id"] == 0 and best.loc[1, "id"] == 1
        assert np.allclose(best["sim"], 1.0, atol=1e-9)


def test_kmeans_centroids_partition_clusters():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((100, 2)) + [10, 0]
    b = rng.standard_normal((100, 2)) - [10, 0]
    cents = simsearch.kmeans_centroids(np.concatenate([a, b]), 2)
    xs = sorted(c[0] for c in cents)
    assert xs[0] < -8 and xs[1] > 8
