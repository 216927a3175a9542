"""Coverage for the long tail of SURVEY §2: by_samples, frms, whole-doc
DFT parts, embedding_dists, HMM reparametrization, SOM kernels,
evaluate_onsets."""
import numpy as np
import pandas as pd
import pytest

from apollon_spark import hmm, som
from apollon_spark.functions import kernels
from tests.oracle import reference_math as ref


def test_by_samples_no_hop():
    sig = np.arange(10.0)
    segs = kernels.by_samples(sig, 4)
    assert segs.shape == (3, 4)
    np.testing.assert_array_equal(segs[2], [8, 9, 0, 0])  # zero-pad to fit


def test_by_samples_with_hop():
    sig = np.arange(10.0)
    segs = kernels.by_samples(sig, 4, hop_size=3)
    # n_hops = (10-4)//3+1 = 3; remainder -> extra partial segment
    assert segs.shape[1] == 4
    np.testing.assert_array_equal(segs[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(segs[1], [3, 4, 5, 6])
    # by_ms is the ms->samples wrapper
    assert kernels.by_ms(sig, 1000, 4).shape == (3, 4)


def test_frms_estimates_time_rms():
    """frms from UN-normalized rfft bins approximates the time-domain
    rms (features.py:136-155 semantics, rect window)."""
    rng = np.random.default_rng(0)
    sig = rng.normal(size=1024)
    sig -= sig.mean()
    bins = kernels.rfft_full(sig[None, :], window=None, norm=True)
    got = kernels.frms(bins, 1024)
    want = np.sqrt(np.mean(sig ** 2))
    np.testing.assert_allclose(got[0], want, rtol=0.01)


def test_rfft_full_phase_in_range():
    sig = np.random.default_rng(1).normal(size=(4, 256))
    bins = kernels.rfft_full(sig, "hamming")
    phase = np.angle(bins)
    assert (phase >= -np.pi).all() and (phase <= np.pi).all()
    power = np.square(np.abs(bins))
    assert (power >= 0).all()
    np.testing.assert_allclose(
        np.abs(bins), kernels.rfft_mag(sig, "hamming"), rtol=1e-12)


def test_embedding_dists_matches_pdist_loop():
    sig = np.random.default_rng(2).normal(size=64)
    got = kernels.embedding_dists(sig, 3, 4)
    emb = ref.delay_embedding(sig, 3, 4)
    n = emb.shape[0]
    want = np.array([np.linalg.norm(emb[i] - emb[j])
                     for i in range(n) for j in range(i + 1, n)])
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_hmm_logit_expit_roundtrip():
    g = hmm.init_gamma(3, "uniform", 0.8)
    lg = hmm.logit_tpm(g)
    assert lg.size == 6
    back = hmm.expit_tpm(lg, 3)
    np.testing.assert_allclose(back, g, atol=1e-12)
    key = np.array([3.0, 1.0, 2.0])
    np.testing.assert_array_equal(hmm.sort_param(key, key), [1, 2, 3])
    mat = np.arange(9.0).reshape(3, 3)
    sorted_mat = hmm.sort_param(key, mat)
    assert sorted_mat[0, 0] == mat[1, 1]   # smallest key's diagonal


def test_som_star_rect_kernels():
    grid = som.SomGrid(3, 3)
    d_city = som.grid_dists(grid, "cityblock")
    d_cheb = som.grid_dists(grid, "chebyshev")
    star = som.star_kernel(d_city, 1.0)
    rect = som.rect_kernel(d_cheb, 1.0)
    center = 4  # (1,1)
    assert star[center].sum() == 5         # von neumann: self + 4
    assert rect[center].sum() == 9         # moore: 3x3 block


def test_dft_docs_parseval(spark):
    from apollon_spark.spectral import FeatureConfig, dft_docs
    rng = np.random.default_rng(3)
    sig = rng.integers(0, 100, 512).astype("int32")
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a"], "tokens": [sig.tolist()],
        "n_tok": [512], "source": ["s"]}))
    out = dft_docs(docs, FeatureConfig(window=None, norm=False),
                   parts=("abs", "power", "phase")).toPandas()
    assert out.loc[0, "n_fft"] == 512
    mag = np.asarray(out.loc[0, "abs"])
    # Parseval (one-sided): sum x^2 == (|X0|^2 + 2*sum|Xk|^2 + |XN/2|^2)/N
    lhs = float(np.sum(np.square(sig, dtype="float64")))
    rhs = (mag[0] ** 2 + 2 * np.sum(mag[1:-1] ** 2) + mag[-1] ** 2) / 512
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)
    phase = np.asarray(out.loc[0, "phase"])
    assert (np.abs(phase) <= np.pi).all()


def test_evaluate_onsets(spark):
    from apollon_spark.onsets import evaluate_onsets
    truth = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "a", "b"], "frame": [100, 5000, 200]}))
    det = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "a", "a"], "frame": [150, 9000, 9500]}))
    out = evaluate_onsets(det, truth, tolerance=512).toPandas() \
        .set_index("doc_id")
    assert out.loc["a", "hits"] == 1
    np.testing.assert_allclose(out.loc["a", "precision"], 1 / 3)
    np.testing.assert_allclose(out.loc["a", "recall"], 1 / 2)
    assert out.loc["b", "n_det"] == 0 and out.loc["b", "f1"] == 0.0


def test_roughness_in_battery(spark):
    """Optional roughness column flows through both extraction paths."""
    import pandas as pd
    from apollon_spark.datagen import synth_docs
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features
    docs = synth_docs(spark, 2, whales=False)
    cfg = FeatureConfig(framing=FramingParams(128, 64), with_roughness=True)
    a = extract_features(docs, cfg).toPandas() \
        .sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
    assert "roughness" in a.columns and np.isfinite(a["roughness"]).all()
    b = extract_features(docs, cfg, split=True, chunk_segs=5).toPandas() \
        .sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)
    np.testing.assert_allclose(a["roughness"], b["roughness"], rtol=1e-12)
    np.testing.assert_allclose(a["sharpness"], b["sharpness"], rtol=1e-12)


def test_roughness_kernel_reference_semantics():
    """Literal restatement of features.py:399-432 per segment."""
    rng = np.random.default_rng(4)
    mag = rng.random((3, 257)) * 5
    d_frq, frq_max = 17.58, 4000.0
    got = kernels.roughness_helmholtz(d_frq, mag, frq_max, total=False)
    frm = 33.0
    bin_idx = int(np.round(frq_max / d_frq))
    base = np.abs(np.arange(bin_idx + 1)) * d_frq
    kern = base / (frm * np.exp(-1.0)) * np.exp(-base / frm)
    for i in range(3):
        sl = mag[i, :kern.size].copy()
        if sl.max() > 0:
            sl /= sl.max()
        sl[sl < 0.1] = 0
        rns = np.correlate(sl, sl, "full")[len(sl) - 1:]
        rns[0] = 0
        if rns.max() > 0:
            rns = rns / rns.max()
            want = rns * kern / (rns > 0.2).sum()
        else:
            want = rns * kern
        # atol: the batched FFT autocorrelation leaves ~1e-18 residue
        # where the direct product is exactly 0 (the reference's scipy
        # correlate picks the same FFT path at this size)
        np.testing.assert_allclose(got[i], want, rtol=1e-10, atol=1e-15)


def test_roughness_single_bin_no_noise_blowup():
    """A spectrum whose thresholded slice keeps one bin has zero
    autocorrelation at every nonzero lag; the batched FFT path must not
    normalize its ~1e-17 roundoff residue into O(1) garbage."""
    mag = np.zeros((2, 257))
    mag[0, 5] = 3.0                  # single surviving bin
    mag[1, 3] = 2.0
    mag[1, 40] = 2.0                 # two bins -> genuine autocorr
    out = kernels.roughness_helmholtz(17.58, mag, 4000.0, total=False)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-12)
    assert np.abs(out[1]).max() > 0
