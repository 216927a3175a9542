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


def test_estep_posteriors_match_full_pmf_smoother():
    """estep_posteriors_m2 drops the log-factorial term (it cancels in
    the row-max normalization); an independent smoother built on the
    FULL Poisson pmf (math.lgamma) must give the same posteriors and
    the same forward variables to float tolerance."""
    import math
    lam = (16.0, 128.0)
    gam = ((0.75, 0.25), (0.375, 0.625))
    dlt = (0.5, 0.5)
    rng = np.random.default_rng(11)
    x = np.concatenate([rng.poisson(16, 40), rng.poisson(128, 40)]).astype("int64")

    btab = hmm.estep_b_table(lam)
    a0, c, p0, p1 = hmm.estep_posteriors_m2(x, btab, gam, dlt)

    # independent: full pmf, matrix ops, classic scaled forward-backward
    lamv = np.array(lam)
    logb = (x[:, None] * np.log(lamv) - lamv
            - np.array([math.lgamma(int(v) + 1) for v in x])[:, None])
    b = np.exp(logb)
    G = np.array(gam)
    T = x.size
    alpha = np.empty((T, 2)); cs = np.empty(T)
    phi = np.array(dlt) * b[0]
    cs[0] = phi.sum(); alpha[0] = phi / cs[0]
    for t in range(1, T):
        phi = (alpha[t - 1] @ G) * b[t]
        cs[t] = phi.sum(); alpha[t] = phi / cs[t]
    beta = np.empty((T, 2)); beta[-1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = (G @ (b[t + 1] * beta[t + 1])) / cs[t + 1]
    post = alpha * beta
    post /= post.sum(axis=1, keepdims=True)

    np.testing.assert_allclose(a0, alpha[:, 0], rtol=1e-9)
    np.testing.assert_allclose(p0, post[:, 0], rtol=0, atol=1e-9)
    np.testing.assert_allclose(p1, post[:, 1], rtol=0, atol=1e-9)
    # scale factors differ by exactly the per-step pmf normalizer:
    # their log-sums differ by sum(bmax) = ll shift, posteriors don't.
    assert np.isfinite(c).all() and (c > 0).all()


def test_estep_docs_spark(spark):
    """Spark stage emits one row per (doc, t) with normalized
    posteriors."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": ["a", "b"],
        "tokens": [[5, 20, 200, 190, 8], [100, 120, 3]],
    })
    out = (hmm.estep_docs(spark.createDataFrame(pdf), (16.0, 128.0),
                          ((0.75, 0.25), (0.375, 0.625)), (0.5, 0.5))
           .toPandas().sort_values(["doc_id", "t"]))
    assert len(out) == 8
    np.testing.assert_allclose(
        out["post0"].to_numpy() + out["post1"].to_numpy(), 1.0, rtol=1e-12)
    # high-count tokens must be attributed to the high-lambda state
    hi = out[(out["doc_id"] == "a") & (out["t"] == 2)].iloc[0]
    assert hi["post1"] > 0.99


def test_estep_general_m_matches_m2_and_m3_smoother():
    """The general-m E-step equals the scalar m=2 twin bit-for-bit
    where they overlap, and at m=3 matches an independent full-pmf
    smoother to float tolerance."""
    import math
    rng = np.random.default_rng(19)
    x = np.concatenate([rng.poisson(10, 30), rng.poisson(60, 30),
                        rng.poisson(150, 30)]).astype("int64")

    # m=2 overlap: identical recurrences, same emission table
    lam2 = (16.0, 128.0)
    gam2 = ((0.75, 0.25), (0.375, 0.625))
    dlt2 = (0.5, 0.5)
    btab2 = hmm.estep_b_table(lam2)
    a0, c2, p0, p1 = hmm.estep_posteriors_m2(x, btab2, gam2, dlt2)
    al, cg, post = hmm.estep_posteriors(x, btab2, gam2, dlt2)
    np.testing.assert_allclose(al[:, 0], a0, rtol=1e-12)
    np.testing.assert_allclose(cg, c2, rtol=1e-12)
    np.testing.assert_allclose(post[:, 0], p0, rtol=0, atol=1e-12)

    # m=3 vs independent full-pmf smoother
    lam3 = (10.0, 60.0, 150.0)
    gam3 = ((0.8, 0.15, 0.05), (0.1, 0.8, 0.1), (0.05, 0.15, 0.8))
    dlt3 = (1 / 3, 1 / 3, 1 / 3)
    btab3 = hmm.estep_b_table(lam3)
    _, _, post3 = hmm.estep_posteriors(x, btab3, gam3, dlt3)

    lamv = np.array(lam3)
    logb = (x[:, None] * np.log(lamv) - lamv
            - np.array([math.lgamma(int(v) + 1) for v in x])[:, None])
    b = np.exp(logb)
    G = np.array(gam3)
    T = x.size
    alpha = np.empty((T, 3)); cs = np.empty(T)
    phi = np.array(dlt3) * b[0]
    cs[0] = phi.sum(); alpha[0] = phi / cs[0]
    for t in range(1, T):
        phi = (alpha[t - 1] @ G) * b[t]
        cs[t] = phi.sum(); alpha[t] = phi / cs[t]
    beta = np.empty((T, 3)); beta[-1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = (G @ (b[t + 1] * beta[t + 1])) / cs[t + 1]
    want = alpha * beta
    want /= want.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(post3, want, rtol=0, atol=1e-9)
    # posteriors track the generating regimes on the regime blocks
    assert post3[:25, 0].mean() > 0.9
    assert post3[35:55, 1].mean() > 0.9
    assert post3[65:, 2].mean() > 0.9


def test_estep_docs_m3(spark):
    """estep_docs at m=3 emits post0..post2 summing to 1 per row."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": ["a"], "tokens": [[5, 60, 150, 10, 145]]})
    out = (hmm.estep_docs(spark.createDataFrame(pdf),
                          (10.0, 60.0, 150.0),
                          ((0.8, 0.15, 0.05), (0.1, 0.8, 0.1),
                           (0.05, 0.15, 0.8)),
                          (1 / 3, 1 / 3, 1 / 3))
           .toPandas().sort_values("t"))
    assert list(out.columns) == ["doc_id", "t", "alpha0", "cscale",
                                 "post0", "post1", "post2"]
    s = out["post0"] + out["post1"] + out["post2"]
    np.testing.assert_allclose(s.to_numpy(), 1.0, rtol=1e-12)
    assert out.iloc[2]["post2"] > 0.9        # 150 -> high-lambda state


def test_em_update_matches_poisson_em_one_iter():
    """em_update_m2 (the oracle gate's one-full-EM-iteration kernel)
    reproduces poisson_em(max_iter=1): same lambda'/Gamma'/delta'
    update and the same log-likelihood, modulo the b-table's
    factorial-cancellation rounding (allclose 1e-9). Parameters are
    chosen so the lambda ordering survives the update (poisson_em
    sorts states ascending by lambda on return)."""
    rng = np.random.default_rng(7)
    x = np.concatenate([rng.poisson(16.0, 40), rng.poisson(128.0, 40),
                        rng.poisson(16.0, 20)]).astype("int64")
    lam = (16.0, 128.0)
    gamma = ((0.75, 0.25), (0.375, 0.625))
    delta = (0.5, 0.5)
    btab = hmm.estep_b_table(lam)
    bmax_tab = hmm.estep_bmax_table(lam)
    upd = hmm.em_update_m2(x, btab, bmax_tab, gamma, delta)
    ref = hmm.poisson_em(x, 2, np.array(lam), np.array(gamma),
                         np.array(delta), max_iter=1)
    assert upd["lam0_next"] < upd["lam1_next"]  # ordering preserved
    np.testing.assert_allclose(
        [upd["lam0_next"], upd["lam1_next"]], ref["lambda"],
        rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        [[upd["g00_next"], upd["g01_next"]],
         [upd["g10_next"], upd["g11_next"]]], ref["gamma"],
        rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        [upd["delta0_next"], upd["delta1_next"]], ref["delta"],
        rtol=0, atol=1e-9)
    np.testing.assert_allclose(-upd["ll"], ref["nll"], rtol=0, atol=1e-6)
    # short-series contract
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hmm.em_update_m2(np.array([3]), btab, bmax_tab, gamma, delta)


def test_em_step_docs_spark(spark):
    """em_step_docs emits the estep columns bit-identical to
    estep_docs plus per-doc-constant update columns; sub-2-token docs
    are skipped."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": ["a", "b", "tiny"],
        "tokens": [[5, 20, 140, 130, 7], [100, 120, 10], [9]]})
    sdf = spark.createDataFrame(pdf)
    lam = (16.0, 128.0)
    gamma = ((0.75, 0.25), (0.375, 0.625))
    delta = (0.5, 0.5)
    full = hmm.em_step_docs(sdf, lam, gamma, delta).toPandas() \
        .sort_values(["doc_id", "t"]).reset_index(drop=True)
    est = hmm.estep_docs(sdf, lam, gamma, delta).toPandas()
    est = est[est.doc_id != "tiny"] \
        .sort_values(["doc_id", "t"]).reset_index(drop=True)
    assert sorted(full.doc_id.unique()) == ["a", "b"]
    for c in ["alpha0", "cscale", "post0", "post1"]:
        assert full[c].tolist() == est[c].tolist()
    for c in hmm.EM_STEP_COLS:  # constant per doc
        assert full.groupby("doc_id")[c].nunique().max() == 1
    # and the per-doc values equal the kernel's
    btab = hmm.estep_b_table(lam)
    bmax_tab = hmm.estep_bmax_table(lam)
    for doc, toks in zip(pdf.doc_id, pdf.tokens):
        if len(toks) < 2:
            continue
        upd = hmm.em_update_m2(np.asarray(toks), btab, bmax_tab,
                               gamma, delta)
        row = full[full.doc_id == doc].iloc[0]
        for c in hmm.EM_STEP_COLS:
            assert row[c] == upd[c], (doc, c)


def test_estep_max_x_contract(spark):
    """Token ids past the emission table raise a descriptive error
    (not a bare IndexError inside the executor); raising max_x on the
    docs API handles large-vocab corpora."""
    import pandas as pd
    import pytest as _pytest
    lam = (16.0, 128.0)
    gamma = ((0.75, 0.25), (0.375, 0.625))
    delta = (0.5, 0.5)
    btab = hmm.estep_b_table(lam)                 # max_x=255
    with _pytest.raises(ValueError, match="max_x"):
        hmm.estep_posteriors_m2(np.array([10, 300]), btab, gamma, delta)
    with _pytest.raises(ValueError, match="max_x"):
        hmm.estep_posteriors(np.array([10, 300]), btab, gamma, delta)
    # the docs API works once max_x covers the vocab
    sdf = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a"], "tokens": [[10, 300, 20, 299]]}))
    out = hmm.estep_docs(sdf, lam, gamma, delta, max_x=512).toPandas()
    assert len(out) == 4
    s = out["post0"] + out["post1"]
    np.testing.assert_allclose(s.to_numpy(), 1.0, rtol=1e-12)
    out2 = hmm.em_step_docs(sdf, lam, gamma, delta, max_x=512).toPandas()
    assert len(out2) == 4 and np.isfinite(out2["ll"]).all()


def test_em_two_iter_docs_chains_poisson_em(spark):
    """em_two_iter_docs (the hmm gate's 2-iteration training unroll)
    reproduces two manually-chained em_update_m2 iterations with the
    quantized handoff: iteration 2's emission tables built the
    STANDARD way (estep_b_table / estep_bmax_table) from the _quant16
    parameters must agree with the gate's division-recursion tables to
    float noise, and dll must be the ll improvement. Also checks the
    quantized restart stays within one grid step of the unquantized
    EM trajectory (poisson_em, 2 iterations, pre-sort comparison via
    lambda ordering)."""
    import pandas as pd
    lam = (16.0, 128.0)
    gamma = ((0.75, 0.25), (0.375, 0.625))
    delta = (0.5, 0.5)
    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        x = np.concatenate([rng.poisson(16.0, 15), rng.poisson(128.0, 20),
                            rng.poisson(16.0, 10)])
        rows.append({"doc_id": f"d{i}", "tokens": x.astype("int64").tolist()})
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["doc_id"]: r for r in
           hmm.em_two_iter_docs(sdf, lam, gamma, delta).collect()}
    assert len(out) == 6

    btab = hmm.estep_b_table(lam)
    bmax_tab = hmm.estep_bmax_table(lam)
    for r in rows:
        x = np.asarray(r["tokens"], dtype="int64")
        u1 = hmm.em_update_m2(x, btab, bmax_tab, gamma, delta)
        got = out[r["doc_id"]]
        for k in hmm.EM_STEP_COLS:
            tag = k.replace("_next", "") if k != "ll" else "ll"
            np.testing.assert_allclose(got[f"{tag}_1"], u1[k],
                                       rtol=0, atol=1e-12, err_msg=k)
        ql = [hmm._quant16(u1[k]) for k in
              ("lam0_next", "lam1_next", "g00_next", "g01_next",
               "g10_next", "g11_next", "delta0_next", "delta1_next")]
        g2 = ((ql[2], ql[3]), (ql[4], ql[5]))
        bt2 = hmm.estep_b_table((ql[0], ql[1]), max_x=int(x.max()))
        bm2 = hmm.estep_bmax_table((ql[0], ql[1]), max_x=int(x.max()))
        u2 = hmm.em_update_m2(x, bt2, bm2, g2, (ql[6], ql[7]))
        for k in hmm.EM_STEP_COLS:
            tag = k.replace("_next", "") if k != "ll" else "ll"
            np.testing.assert_allclose(got[f"{tag}_2"], u2[k],
                                       rtol=1e-9, atol=1e-9, err_msg=k)
        np.testing.assert_allclose(got["dll"], u2["ll"] - u1["ll"],
                                   rtol=0, atol=1e-6)
        # EM monotonicity survives the quantized restart on this data
        assert got["dll"] > 0

    # em2 follows the unquantized poisson_em 2-iteration trajectory to
    # quantization precision (lambda shifts bounded by grid-step
    # propagation, loose band)
    x = np.asarray(rows[0]["tokens"], dtype="int64")
    ref = hmm.poisson_em(x, 2, np.array(lam), np.array(gamma),
                         np.array(delta), max_iter=2, tol=0.0)
    got = out["d0"]
    np.testing.assert_allclose(
        sorted([got["lam0_2"], got["lam1_2"]]), ref["lambda"],
        rtol=1e-3)
