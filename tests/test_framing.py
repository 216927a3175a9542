"""Framing parity vs the reference-shaped oracle (SURVEY §2.2, §5)."""
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from apollon_spark.functions import kernels
from apollon_spark.datagen import synth_docs
from apollon_spark.operators import framing as FR
from tests.oracle import reference_math as ref

PARAM_GRID = [(512, 256), (1024, 512), (64, 32), (50, 10)]
FLAGS = [(True, True), (True, False), (False, True), (False, False)]


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 200, n).astype("float64")


# ---------- kernel-level (no Spark) ----------

@pytest.mark.parametrize("n_perseg,n_overlap", PARAM_GRID)
@pytest.mark.parametrize("extend,pad", FLAGS)
def test_frame_signal_matches_oracle(n_perseg, n_overlap, extend, pad):
    sig = _sig(n_perseg * 7 + 13)
    got = kernels.frame_signal(sig, n_perseg, n_overlap, extend, pad)
    want = ref.segment_transform(sig, n_perseg, n_overlap, extend, pad)
    assert got.shape == want.T.shape
    np.testing.assert_array_equal(np.asarray(got), want.T)


@pytest.mark.parametrize("extend", [True, False])
def test_centers_and_bounds(extend):
    n_perseg, n_overlap = 512, 256
    sig = _sig(5000)
    segs = kernels.frame_signal(sig, n_perseg, n_overlap, extend, True)
    centers = kernels.segment_centers(segs.shape[0], n_perseg, n_overlap, extend)
    for i in range(segs.shape[0]):
        assert centers[i] == ref.segment_center(i, n_perseg, n_overlap, extend)
    # reference test corner (tests/test_segment.py:42-49)
    if extend:
        lob, _ = ref.segment_bounds(0, n_perseg, n_overlap, extend)
        assert centers[0] - n_perseg // 2 == lob == -(n_perseg // 2)


@given(n_frames=st.integers(80, 3000), n_perseg=st.integers(8, 64),
       frac=st.floats(0.1, 0.9), extend=st.booleans(), pad=st.booleans())
@settings(max_examples=40, deadline=None)
def test_frame_property(n_frames, n_perseg, frac, extend, pad):
    n_overlap = max(1, min(n_perseg - 1, int(n_perseg * frac)))
    if n_perseg > n_frames:
        return
    sig = _sig(n_frames, seed=n_frames)
    got = kernels.frame_signal(sig, n_perseg, n_overlap, extend, pad)
    want = ref.segment_transform(sig, n_perseg, n_overlap, extend, pad)
    np.testing.assert_array_equal(np.asarray(got), want.T)
    assert got.shape[0] == kernels.n_segments(
        n_frames, n_perseg, n_overlap, extend, pad)


def test_framing_validation_raises():
    with pytest.raises(ValueError):
        kernels.validate_framing(100, 0, 10)
    with pytest.raises(ValueError):
        kernels.validate_framing(100, 50, 0)
    with pytest.raises(ValueError):
        kernels.validate_framing(100, 50, 50)
    with pytest.raises(ValueError):
        kernels.validate_framing(10, 50, 25)


def test_causal_frames_never_read_future():
    sig = _sig(2000, seed=3)
    segs, centers = kernels.causal_frame_signal(sig, 64, 32)
    for i in range(segs.shape[0]):
        c = centers[i]
        # recompute from the prefix only: identical => zero leakage
        prefix = sig[:c + 1]
        padded = np.pad(prefix, (63, 0))
        np.testing.assert_array_equal(segs[i], padded[-64:])


# ---------- Spark-level ----------

def test_segment_docs_matches_oracle(spark):
    docs = synth_docs(spark, 4, whales=False)
    p = FR.FramingParams(512, 256, True, True)
    got = (
        FR.segment_docs(docs, p)
        .select("doc_id", "seg_idx", "center", "frame")
        .toPandas()
        .sort_values(["doc_id", "seg_idx"])
    )
    src = {r["doc_id"]: np.asarray(r["tokens"], "float64")
           for r in docs.collect()}
    for doc_id, grp in got.groupby("doc_id"):
        want = ref.segment_transform(src[doc_id], 512, 256, True, True)
        assert len(grp) == want.shape[1]
        frames = np.stack(grp.sort_values("seg_idx")["frame"].to_numpy())
        np.testing.assert_array_equal(frames, want.T)


def test_reassembled_equal_invariant(spark):
    docs = synth_docs(spark, 6, whales=False)
    res = FR.reassembled_equal(docs).toPandas()
    assert len(res) == 6 and res["ok"].all()


def test_n_segments_col_matches_kernel(spark):
    docs = synth_docs(spark, 6, whales=False)
    for extend in (True, False):
        for pad in (True, False):
            p = FR.FramingParams(512, 256, extend, pad)
            rows = docs.select(
                "doc_id", "n_tok",
                FR.n_segments_col(__import__("pyspark.sql.functions",
                                             fromlist=["col"]).col("n_tok"), p)
                .alias("n_segs")).collect()
            for r in rows:
                assert r["n_segs"] == kernels.n_segments(
                    r["n_tok"], 512, 256, extend, pad)


def test_sql_segment_ids_equivalent(spark):
    """Explode+range framing (strategy b) produces the same
    (seg_idx -> positions) mapping as the strided kernel."""
    import pyspark.sql.functions as F
    docs = synth_docs(spark, 2, whales=False)
    p = FR.FramingParams(64, 32, True, True)
    frames = FR.explode_frames(docs).join(
        docs.select("doc_id", "n_tok"), "doc_id")
    got = (
        FR.sql_segment_ids(frames, p)
        .groupBy("doc_id", "seg_idx").agg(F.count("*").alias("n"))
        .toPandas()
    )
    src = {r["doc_id"]: np.asarray(r["tokens"], "float64")
           for r in docs.collect()}
    for doc_id, grp in got.groupby("doc_id"):
        n_tok = src[doc_id].size
        n_segs = kernels.n_segments(n_tok, 64, 32, True, True)
        assert grp["seg_idx"].nunique() == n_segs
        # every segment holds only in-range positions; counts match the
        # overlap of [start, stop) with [0, n_tok)
        for _, row in grp.iterrows():
            start = row["seg_idx"] * 32 - 32
            stop = start + 64
            expect = min(stop, n_tok) - max(start, 0)
            assert row["n"] == expect
