"""Poisson HMM: convergence on regime-switching data (reference test
oracle tests/hmm/test_hmm.py:29-35) + init parity + Spark stage."""
import numpy as np
import pytest

from apollon_spark import hmm
from apollon_spark.datagen import synth_docs


def _regime_data(seed=0, lams=(20, 40, 80, 120, 40), n=300):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [rng.poisson(l, n) for l in lams]).astype("int64")


def test_em_converges_and_recovers_lambdas():
    x = _regime_data()
    res = hmm.fit_poisson_hmm(x, 4, seed=1)
    assert res["success"]
    lam = np.asarray(res["lambda"])
    assert np.all(np.diff(lam) > 0)            # ascending (sort_param)
    np.testing.assert_allclose(lam, [20, 40, 80, 120], rtol=0.08)
    gamma = np.asarray(res["gamma"])
    np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-9)
    delta = np.asarray(res["delta"])
    assert abs(delta.sum() - 1.0) < 1e-6
    assert res["aic"] > 0 and res["bic"] > res["aic"] - 1e9


def test_input_contract():
    with pytest.raises(TypeError):
        hmm.assert_poisson_input(np.array([1.5, 2.0]))
    with pytest.raises(ValueError):
        hmm.assert_poisson_input(np.array([[1, 2], [3, 4]]))
    with pytest.raises(ValueError):
        hmm.assert_poisson_input(np.array([1, -2]))


def test_lambda_inits():
    x = _regime_data()
    q = hmm.init_lambda(x, 3, "quantile")
    # reference: m equally spaced percentiles (hmm/utilities.py:160-181)
    want = np.percentile(x, np.linspace(100 / 4, 100, 4)[:-1])
    np.testing.assert_allclose(q, want)
    lin = hmm.init_lambda(x, 4, "linear")
    np.testing.assert_allclose(lin, np.linspace(x.min(), x.max(), 4))
    h = hmm.init_lambda(x, 3, "hist")
    assert np.all(np.diff(h) >= 0) and len(h) == 3


def test_gamma_delta_inits():
    g = hmm.init_gamma(4, "uniform", 0.8)
    np.testing.assert_allclose(np.diag(g), 0.8)
    np.testing.assert_allclose(g.sum(axis=1), 1.0)
    d = hmm.init_delta(g, "stationary")
    np.testing.assert_allclose(d.sum(), 1.0, atol=1e-12)
    # stationary: d @ g == d
    np.testing.assert_allclose(d @ g, d, atol=1e-10)


def test_quality_ordering_more_states_lower_nll():
    x = _regime_data(seed=5, lams=(10, 100), n=400)
    r2 = hmm.fit_poisson_hmm(x, 2, seed=2, max_iter=200)
    r1 = hmm.fit_poisson_hmm(x, 1, seed=2, max_iter=200) \
        if False else None  # m=1 unsupported by quantile init path
    r3 = hmm.fit_poisson_hmm(x, 3, seed=2, max_iter=200)
    assert r3["nll"] <= r2["nll"] + 1.0


def test_fit_hmm_docs_spark(spark):
    docs = synth_docs(spark, 6, whales=False)
    out = hmm.fit_hmm_docs(docs, m_states=3, max_iter=150,
                           max_obs=1500).toPandas()
    assert len(out) == 6
    ok = out[out["success"]]
    assert len(ok) >= 4          # regime data converges
    for _, row in ok.iterrows():
        lam = np.asarray(row["lambda"])
        assert np.all(np.diff(lam) >= 0)
        g = np.asarray([np.asarray(r) for r in row["gamma"]])
        np.testing.assert_allclose(g.sum(axis=1), 1.0, atol=1e-8)
