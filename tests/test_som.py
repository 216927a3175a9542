"""SOM: BMU semantics, Hellinger metric, batch-SOM quality, umatrix."""
import numpy as np

from apollon_spark import som


def test_best_match_semantics():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(100, 5))
    x = rng.normal(size=(200, 5))
    bmu, dist = som.best_match(w, x)
    # oracle: explicit argmin over euclidean distances, ties -> first
    d = np.sqrt(((w[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    np.testing.assert_array_equal(bmu, d.argmin(axis=0))
    np.testing.assert_allclose(dist, d.min(axis=0), rtol=1e-9)


def test_hellinger():
    p = np.array([[0.2, 0.8], [0.5, 0.5]])
    q = np.array([[0.2, 0.8], [0.9, 0.1]])
    d = som.hellinger(p, q)
    assert d[0] == 0.0 and d[1] > 0
    # stm variant: mean row-wise over m x m stochastic matrices
    a = np.concatenate([p[0], p[1]])
    b = np.concatenate([q[0], q[1]])
    got = som.hellinger_stm(a, b, 2)
    np.testing.assert_allclose(got, d.mean(), rtol=1e-12)


def _clusters(n=300, seed=1):
    rng = np.random.default_rng(seed)
    centers = np.array([[0, 0], [5, 5], [0, 5], [5, 0]], dtype="float64")
    pts = np.concatenate([
        c + 0.3 * rng.standard_normal((n // 4, 2)) for c in centers])
    return pts


def test_incremental_fit_quality_decreases():
    data = _clusters()
    p = som.SomParams(5, 5, n_iter=5, eta_start=0.5, init="rnd", seed=10)
    w, qerr = som.incremental_fit(data, p)
    assert qerr[-1] < qerr[0]
    assert qerr[-1] < 1.0


def test_batch_som_spark_quality(spark):
    import pandas as pd
    data = _clusters(400)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(len(data)), "vec": list(data)}))
    p = som.SomParams(4, 4, n_iter=5, init="rnd", seed=10)
    weights, qerr = som.fit_batch_som(df, "vec", p)
    assert weights.shape == (16, 2)
    assert qerr[-1] < qerr[0]
    assert qerr[-1] < 1.0
    # BMU assignment covers all rows and distances agree with local calc
    assigned = som.assign_bmu(df, "vec", weights).toPandas()
    assert len(assigned) == len(data)
    bmu, dist = som.best_match(weights, data)
    got = assigned.sort_values("vec_id")
    np.testing.assert_array_equal(got["bmu"].to_numpy(), bmu)
    np.testing.assert_allclose(got["bmu_dist"].to_numpy(), dist, rtol=1e-9)


def test_umatrix_shape_and_range():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 3))
    u = som.umatrix(w, som.SomGrid(4, 4))
    assert u.shape == (4, 4)
    assert u.max() <= 1.0 + 1e-12 and u.min() >= 0.0


def test_init_weights_deterministic():
    a = som.init_weights("rnd", (4, 4, 3), np.zeros((10, 3)), seed=10)
    b = som.init_weights("rnd", (4, 4, 3), np.zeros((10, 3)), seed=10)
    np.testing.assert_array_equal(a, b)
    stm = som.init_weights("stm", (2, 2, 9), seed=10)
    np.testing.assert_allclose(stm.reshape(4, 3, 3).sum(-1), 1.0, atol=1e-12)


def test_calibration_family(spark):
    """distribute/match_2d/transform_weights over a BMU assignment."""
    import pandas as pd
    from apollon_spark.som import distribute, match_2d, transform_weights
    rows = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0, 1, 2, 3], "bmu": [2, 2, 5, 0]}))
    d = distribute(rows).orderBy("unit").toPandas()
    assert list(d["unit"]) == [0, 2, 5]
    assert list(d.loc[d["unit"] == 2, "matched_ids"].iloc[0]) == [0, 1]
    m = match_2d(rows, n_cols=3).orderBy("vec_id").toPandas()
    assert list(m["bmu_row"]) == [0, 0, 1, 0]
    assert list(m["bmu_col"]) == [2, 2, 2, 0]
    w = np.arange(12, dtype="float64").reshape(6, 2)
    t = transform_weights(rows, w).orderBy("vec_id").toPandas()
    assert list(t.loc[0, "bmu_weights"]) == [4.0, 5.0]
    assert list(t.loc[3, "bmu_weights"]) == [0.0, 1.0]
