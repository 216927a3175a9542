"""Onset detection + event gathers (SURVEY §2.6, M4).

Pipeline shape (reference FluxOnsetDetector, onsets.py:179-216):
docs -> fused STFT feature stage (flux column) -> per-doc mean floor
(window agg) -> stateful peak-picker scan (recursive smoother,
onsets.py:227-262 — order-dependent, so a per-doc grouped pUDF) ->
onsets table. ``by_onsets_gather`` is the as-of gather of fixed windows
at irregular positions (segment.py:445-475) done in pure array SQL.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions import kernels
from .spectral import FeatureConfig, extract_features


# ---------------------------------------------------------------------------
# Onset detection functions (odf)
# ---------------------------------------------------------------------------

def flux_odf(docs: DataFrame, cfg: FeatureConfig | None = None) -> DataFrame:
    """(doc_id, seg_idx, frame, time, value): total spectral flux with
    the per-doc mean floor (onsets.py:201-216:
    ``value = max(flux, flux.mean())``)."""
    import dataclasses
    from .operators.framing import FramingParams
    cfg = cfg or FeatureConfig(framing=FramingParams(1024, 512))
    # the odf only consumes flux — skip the rest of the battery
    feats = extract_features(
        docs, dataclasses.replace(cfg, features=("flux",)))
    w = Window.partitionBy("doc_id")
    return (
        feats.select("doc_id", "seg_idx", "center", "ts", "flux")
        .withColumn("value", F.greatest(F.col("flux"), F.avg("flux").over(w)))
        .select("doc_id", "seg_idx",
                F.col("center").alias("frame"),
                F.col("ts").alias("time"), "value")
    )


def entropy_odf(docs: DataFrame, cfg: FeatureConfig | None = None) -> DataFrame:
    """(doc_id, seg_idx, frame, time, value): delay-embedding entropy
    per segment (EntropyOnsetDetector semantics, onsets.py:125-176; the
    reference's loop writes time over frame and floors only the last
    element — we implement the documented intent: frame = center,
    time = center/fps, no floor)."""
    from .operators.framing import FramingParams
    cfg = cfg or FeatureConfig(framing=FramingParams(1024, 512),
                               with_entropy=True)
    if not cfg.with_entropy:
        raise ValueError("entropy_odf needs cfg.with_entropy=True")
    feats = extract_features(docs, cfg)
    return feats.select(
        "doc_id", "seg_idx", F.col("center").alias("frame"),
        F.col("ts").alias("time"), F.col("entropy").alias("value"))


# ---------------------------------------------------------------------------
# Peak picking (onsets.py:219-262) — stateful scan, exact semantics
# ---------------------------------------------------------------------------

def peak_flag_series(vals: np.ndarray, n_after: int = 10, n_before: int = 10,
                     alpha: float = 0.1, delta: float = 0.1
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Per-element FilterPeakPicker conditions: (cond12, cond3) bool
    arrays. cond12 = local max over the clip-indexed window AND
    >= window mean + delta; cond3 = the recursive smoother condition
    ``g[n+1] = max(val, alpha*g[n] + (1-alpha)*val)`` (reference
    onsets.py:246-262).

    Vectorized: the reference's clip-indexed window (onsets.py:246-248,
    ``np.take(..., mode='clip')`` semantics) repeats the edge value for
    out-of-range indices, which is exactly an edge-padded sliding
    window; conds 1-2 become one ``sliding_window_view`` max/mean.
    Only cond 3's recursion stays a scalar loop (order-dependent).
    Exposed flag-level (not just the peak indices) so the peak_scan
    oracle gate can value-check every row of the scan, peaks and
    non-peaks alike."""
    vals = np.asarray(vals, dtype="float64")
    n = len(vals)
    if n == 0:
        z = np.array([], dtype=bool)
        return z, z.copy()
    padded = np.pad(vals, (n_before, n_after), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(
        padded, n_before + n_after + 1)
    cond12 = (vals >= win.max(axis=1)) & (vals >= win.mean(axis=1) + delta)
    cond3 = np.empty(n, dtype=bool)
    g = 0.0
    for i in range(n):
        val = vals[i]
        smoothed = alpha * g + (1 - alpha) * val
        foo = val if val > smoothed else smoothed
        cond3[i] = val >= foo
        g = foo
    return cond12, cond3


def pick_peaks_series(vals: np.ndarray, n_after: int = 10, n_before: int = 10,
                      alpha: float = 0.1, delta: float = 0.1) -> np.ndarray:
    """FilterPeakPicker.detect parity: indices where all three
    conditions hold (see ``peak_flag_series``)."""
    cond12, cond3 = peak_flag_series(vals, n_after, n_before, alpha, delta)
    return np.nonzero(cond12 & cond3)[0].astype("int64")


def peak_flags(odf: DataFrame, order_col: str = "seg_idx",
               value_col: str = "value", n_after: int = 10,
               n_before: int = 10, alpha: float = 0.1,
               delta: float = 0.1) -> DataFrame:
    """All odf rows with the per-condition verdicts
    (cond12, cond3, is_peak as int) — the flag-level view of the peak
    scan.

    Shape: gather each doc's ordered series into co-sorted arrays with
    ONE groupBy, then run the scan over MANY docs per Arrow batch in a
    single mapInPandas — NOT a per-doc applyInPandas (measured 12.5s
    vs ~1s at sf0.1: per-group Arrow round-trips dominate when groups
    are tiny). Per-doc state is the series itself (feature-scale,
    bounded by n_tok/win — a 65k-token whale is a 16k-double array)."""
    gathered = (odf.groupBy("doc_id")
                .agg(F.sort_array(
                    F.collect_list(F.struct(order_col, value_col)))
                    .alias("_s"))
                .select("doc_id",
                        F.col(f"_s.{order_col}").alias("_ord"),
                        F.col(f"_s.{value_col}").alias("_val")))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, ords, vals in zip(pdf["doc_id"], pdf["_ord"],
                                          pdf["_val"]):
                v = np.asarray(vals, dtype="float64")
                c12, c3 = peak_flag_series(v, n_after, n_before,
                                           alpha, delta)
                out.append(pd.DataFrame({
                    "doc_id": np.repeat(doc_id, v.size),
                    order_col: np.asarray(ords, dtype="int64"),
                    value_col: v,
                    "cond12": c12.astype("int32"),
                    "cond3": c3.astype("int32"),
                    "is_peak": (c12 & c3).astype("int32")}))
            if out:
                yield pd.concat(out, ignore_index=True)

    order_type = odf.schema[order_col].dataType.simpleString()
    return gathered.mapInPandas(
        gen, f"doc_id string, {order_col} {order_type}, "
             f"{value_col} double, cond12 int, cond3 int, is_peak int")


def pick_peaks(odf: DataFrame, n_after: int = 10, n_before: int = 10,
               alpha: float = 0.1, delta: float = 0.1) -> DataFrame:
    """Filter the odf down to peak rows. The recursion is
    order-dependent, so this is a per-doc grouped pUDF over the (small)
    odf table — the token-heavy stages never re-shuffle."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg_idx").reset_index(drop=True)
        peaks = pick_peaks_series(pdf["value"].to_numpy(),
                                  n_after, n_before, alpha, delta)
        return pdf.iloc[peaks]

    return odf.groupBy("doc_id").applyInPandas(fn, odf.schema)


def detect_onsets(docs: DataFrame, cfg: FeatureConfig | None = None,
                  method: str = "flux", fused: bool = True,
                  **pp) -> DataFrame:
    """Full detector: odf -> peaks -> (doc_id, frame, time).

    ``fused=True`` (default, flux method): the whole detector runs in
    ONE ``mapInPandas`` over whole docs — framing, rfft, flux, the
    per-doc mean floor, and the peak scan all happen in the same task,
    so the plan is Scan -> Project -> MapInPandas with ZERO shuffles
    (the composed path shuffles twice: mean-floor window + peak-pick
    groupBy). Identical output (tested fused-vs-composed)."""
    from .operators.framing import FramingParams
    if method == "flux":
        cfg = cfg or FeatureConfig(framing=FramingParams(1024, 512))
        if fused:
            return _detect_onsets_fused(docs, cfg, **pp)
        odf = flux_odf(docs, cfg)
    elif method == "entropy":
        odf = entropy_odf(docs, cfg)
    else:
        raise ValueError(method)
    return pick_peaks(odf, **pp).select("doc_id", "frame", "time")


def _detect_onsets_fused(docs: DataFrame, cfg: FeatureConfig,
                         n_after: int = 10, n_before: int = 10,
                         alpha: float = 0.1, delta: float = 0.1) -> DataFrame:
    """Flux onset detector fused into a single vectorized stage."""
    p = cfg.framing
    n_perseg, n_overlap = p.n_perseg, p.n_overlap
    extend, pad, causal = p.extend, p.pad, cfg.causal
    window, n_fft_c, norm, fps = cfg.window, cfg.n_fft, cfg.norm, cfg.fps

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
                sig = np.asarray(tokens, dtype="float64")
                if sig.size < n_perseg:
                    continue
                if causal:
                    segs, centers = kernels.causal_frame_signal(
                        sig, n_perseg, n_overlap)
                else:
                    segs = kernels.frame_signal(
                        sig, n_perseg, n_overlap, extend, pad)
                    centers = kernels.segment_centers(
                        segs.shape[0], n_perseg, n_overlap, extend)
                mag = kernels.rfft_mag(segs, window, n_fft_c, norm)
                flux = kernels.spectral_flux(mag)
                value = np.maximum(flux, flux.mean())
                peaks = pick_peaks_series(
                    value, n_after, n_before, alpha, delta)
                if peaks.size:
                    frames = centers[peaks]
                    out.append(pd.DataFrame({
                        "doc_id": np.repeat(doc_id, peaks.size),
                        "frame": frames,
                        "time": frames / fps}))
            if out:
                yield pd.concat(out, ignore_index=True)

    # compact-input guard: rfft+flux+peak-scan is CPU-bound per doc;
    # a single-file input would otherwise run the whole detector in
    # one task. No-op (and still zero shuffles) at real scale.
    from .session import spread_compact
    src = spread_compact(docs.select("doc_id", "tokens"))
    return src.mapInPandas(
        gen, "doc_id string, frame long, time double")


# ---------------------------------------------------------------------------
# by_onsets gather (segment.py:445-475) — pure array SQL
# ---------------------------------------------------------------------------

def by_onsets_gather(docs: DataFrame, onsets: DataFrame, n_perseg: int,
                     off: int = 0) -> DataFrame:
    """Fixed-length windows starting at irregular onset positions.

    Exact reference clipping: start = clip(frame + off, 0, n_tok - 1);
    windows running past the end are zero-padded. Implemented as a join
    (broadcast when onsets are small; Catalyst/AQE decide) + array
    slice/pad — no Python.
    Output: (doc_id, onset_idx, frame, window array<int>).
    """
    w = Window.partitionBy("doc_id").orderBy("frame")
    ons = onsets.select("doc_id", "frame") \
                .withColumn("onset_idx", F.row_number().over(w) - 1)
    j = ons.join(docs.select("doc_id", "tokens", "n_tok"), "doc_id")
    pos = F.greatest(F.lit(0),
                     F.least(F.col("frame") + off, F.col("n_tok") - 1))
    take = F.least(F.lit(n_perseg), F.col("n_tok") - pos)
    pad = F.lit(n_perseg) - take
    win = F.concat(
        F.slice(F.col("tokens"), (pos + 1).cast("int"), take.cast("int")),
        F.when(pad > 0, F.array_repeat(F.lit(0), pad.cast("int")))
         .otherwise(F.array().cast("array<int>")))
    return j.select("doc_id", "onset_idx", "frame", win.alias("window"))


def log_attack_time(docs: DataFrame, onsets: DataFrame, fps: int = 9000,
                    wlen: float = 0.05) -> DataFrame:
    """Log attack time per onset (features.py:361-382): argmax of
    |hilbert| inside the fps*wlen window after each onset; 0 -> 1.0
    before the log."""
    n = int(fps * wlen)
    gathered = by_onsets_gather(docs, onsets, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            segs = np.stack([np.asarray(wv, "float64")
                             for wv in pdf["window"]])
            att = kernels.hilbert_magnitude(segs).argmax(axis=1) / fps
            att = np.where(att == 0.0, 1.0, att)
            out = pdf[["doc_id", "onset_idx", "frame"]].copy()
            out["log_attack_time"] = np.log(att)
            yield out

    return gathered.mapInPandas(
        gen, "doc_id string, onset_idx int, frame long, log_attack_time double")


# ---------------------------------------------------------------------------
# Onset evaluation (onsets.py:265-287 — the reference's version is
# broken: its `_me` mir_eval alias is never imported; we implement the
# documented intent natively)
# ---------------------------------------------------------------------------

def evaluate_onsets(detected: DataFrame, truth: DataFrame,
                    tolerance: int = 512) -> DataFrame:
    """Per-doc precision/recall/F1 of detected onsets vs ground truth.

    ``detected``: (doc_id, frame); ``truth``: (doc_id, frame). A truth
    onset counts as hit when a detection lies within ``tolerance``
    positions. One broadcast-joinable agg — no pairwise blowup beyond
    the per-doc onset lists (both tiny)."""
    det = detected.groupBy("doc_id").agg(
        F.collect_list("frame").alias("det"))
    tru = truth.groupBy("doc_id").agg(
        F.collect_list("frame").alias("tru"))
    j = tru.join(det, "doc_id", "left")
    hits = F.size(F.filter(
        "tru", lambda t: F.exists(
            "det", lambda d: F.abs(d - t) <= tolerance)))
    n_det = F.coalesce(F.size("det"), F.lit(0))
    n_tru = F.size("tru")
    prec = F.when(n_det > 0, hits / n_det).otherwise(F.lit(0.0))
    rec = F.when(n_tru > 0, hits / n_tru).otherwise(F.lit(0.0))
    f1 = F.when((prec + rec) > 0,
                2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return j.select("doc_id", n_tru.alias("n_truth"), n_det.alias("n_det"),
                    hits.alias("hits"), prec.alias("precision"),
                    rec.alias("recall"), f1.alias("f1"))
