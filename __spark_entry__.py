"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship feature-extraction pipeline on sf0.001.
``queries()``: one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents. Queries whose
math is not SQL-expressible (FFT battery, HMM EM, iterative training)
have no oracle entry — they are covered by the pytest parity suite
against a reference-shaped numpy oracle instead (tests/test_features.py
etc.). The ANN pipelines (ann_lsh, ivf_ann) ARE value-oracled: fixed
centroids / seeded plane literals make routing + probing + exact-cosine
rerank fully re-derivable in SQL.

Shared determinism contract: the docs table is derived from
``documents`` with a token map expressible identically in Spark SQL and
DuckDB SQL (apollon_spark/tokenize.py); float outputs are rounded on
both sides; timestamps are compared as epoch microseconds.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apollon_spark.tokenize import (DUCKDB_DOCS_CTE, DUCKDB_FRAMES_CTE,
                                    docs_from_documents)
from apollon_spark.ml.dedup import hash_params

MERSENNE = 2_147_483_647
_MINHASH_N, _MINHASH_SEED, _SHINGLE_K = 8, 7, 3
_SIMHASH_BITS = 16


def _round6(c, scale: int = 6):
    """Round + negative-zero canonicalization for hash-compared gates.

    DuckDB's ``round(x, 6)`` of a tiny negative value yields ``-0.0``
    while Spark's ``F.round`` yields ``+0.0`` — numerically equal,
    bit-different, so the driver's value-hash diverges (the r04
    ``features_battery`` failure: 16 rows of skewness). IEEE addition
    of ``+0.0`` maps ``-0.0`` to ``+0.0`` and is the identity on every
    other double, so ``round(x, s) + 0.0`` on BOTH engine and oracle
    sides canonicalizes the sign without changing any value. Use this
    (and the matching ``round(x, s) + 0.0`` in the oracle SQL) for any
    rounded float column that can legally be a tiny negative.

    Exposure audit of the other rounded gates (r05): ``hmm_estep`` —
    posteriors/λ/Γ/δ are all in [0, ∞) and ``ll`` is ≤ -O(1), so no
    column can round to -0.0; ``cosine_neardup``/``ann_*`` — every
    branch filters ``sim >= thr`` with thr ≥ 0.1 plus an epsilon guard,
    so rounded sims are bounded away from zero; ``hmm`` — λ/δ/nll/aic/
    bic ≥ 0 and Γ ∈ [0, 1]. Only the battery's signed moment columns
    (skewness, flux gradients) straddle zero.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col, scale) + F.lit(0.0)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs_from_documents(spark, sf_dir)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tokenize -> framed short-time analysis -> fused
    spectral feature battery, on sf0.001."""
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features

    docs = _docs(spark, "/root/testdata/sf0.001")
    cfg = FeatureConfig(framing=FramingParams(32, 16))
    return extract_features(docs, cfg)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_docs_profile(spark, sf_dir):
    """Doc fingerprint + Gopher-style repetition metrics (distinct
    ratio, top-bigram fraction, duplicate-trigram fraction) in one
    per-doc profile gate."""
    from apollon_spark.ml.curation import repetition_metrics
    from apollon_spark.ml.textstats import fingerprint_col
    docs = _docs(spark, sf_dir)
    rep = repetition_metrics(docs).select(
        "doc_id", "distinct_frac", "top2_frac", "dup3_frac")
    return docs.select(
        "doc_id", "n_tok", "source",
        fingerprint_col(F.col("tokens")).alias("fingerprint")) \
        .join(rep, "doc_id")


def _q_frames_agg(spark, sf_dir):
    """Exploded-frame aggregate + the per-row reassembly invariant
    (BASELINE input_hint: exploding then rebuilding by position must
    reproduce the token array exactly) in one per-doc gate."""
    from apollon_spark.operators.framing import explode_frames, reassembled_equal
    docs = _docs(spark, sf_dir)
    agg = explode_frames(docs).groupBy("doc_id").agg(
        F.count("*").alias("n_pos"),
        F.sum(F.col("token").cast("long")).alias("tok_sum"),
        F.sum(F.col("token").cast("long") * (F.col("position") + 1))
        .alias("tok_wsum"))
    return agg.join(reassembled_equal(docs), "doc_id")


def _q_tumbling(spark, sf_dir):
    from apollon_spark.operators.framing import explode_frames, tumbling_window
    frames = tumbling_window(explode_frames(_docs(spark, sf_dir)), 16)
    return frames.groupBy("doc_id", "win_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("token").cast("long") * F.col("token")).alias("energy"),
        F.round(F.avg("token"), 6).alias("tok_mean"))


def _q_sliding(spark, sf_dir):
    from apollon_spark.operators.framing import explode_frames
    frames = explode_frames(_docs(spark, sf_dir))
    w = (Window.partitionBy("doc_id").orderBy("position")
         .rowsBetween(-7, 0))
    return frames.select(
        "doc_id", "position",
        F.round(F.avg("token").over(w), 6).alias("win_mean"),
        F.min("token").over(w).alias("win_min"),
        F.max("token").over(w).alias("win_max"))


def _q_segment_meta(spark, sf_dir):
    from apollon_spark.operators.framing import FramingParams, segment_docs
    p = FramingParams(32, 16, True, True)
    segs = segment_docs(_docs(spark, sf_dir), p)
    return segs.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum("center").alias("center_sum"),
        F.min("start").alias("start_min"),
        F.max("stop").alias("stop_max"))


def _q_seg_energy(spark, sf_dir):
    from apollon_spark.operators.framing import FramingParams, segment_docs
    p = FramingParams(32, 16, False, False)
    segs = segment_docs(_docs(spark, sf_dir), p)
    energy = F.aggregate("frame", F.lit(0.0), lambda a, x: a + x * x)
    return segs.select("doc_id", "seg_idx", energy.alias("energy"))


def _q_window_vectors(spark, sf_dir):
    # the window-name registry (scipy-parity periodic windows,
    # functions/windows.py) value-checked against closed cosine forms
    from apollon_spark.functions.windows import get_window
    n = 32
    rows = []
    for name in ("rect", "hamming", "hann", "blackman", "bartlett"):
        w = get_window(name, n)
        rows.extend((name, i, round(float(w[i]), 9)) for i in range(n))
    return spark.createDataFrame(rows, "name string, i int, w double")


def _q_scalar_funcs(spark, sf_dir):
    # psychoacoustic scalar columns over a frequency ladder — pure
    # codegen'd SQL on both sides (freq2mel/mel2freq roundtrip, Bark,
    # C-weighting, SPL<->amplitude; signal/tools.py formulas)
    from apollon_spark.functions import scalars
    f = (F.lit(20.0) + F.col("vec_id") * 10.0).cast("double")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id",
        F.round(scalars.freq2mel(f), 6).alias("mel"),
        F.round(scalars.mel2freq(scalars.freq2mel(f)), 6).alias("f_rt"),
        F.round(scalars.frq2cbr(f), 6).alias("bark"),
        F.round(scalars.c_weighting(f), 6).alias("cw"),
        F.round(scalars.amp(F.lit(60.0)), 9).alias("amp60"))


def _q_acf_profile(spark, sf_dir):
    # normalized FFT autocorrelation + the reference's no-sqrt pearson
    # variant (signal/tools.py:57-81 quirk preserved), first 8 lags,
    # value-oracled against direct lag sums in DuckDB
    from apollon_spark.functions import kernels
    docs = _docs(spark, sf_dir).where(
        (F.col("n_tok") >= 16) & (F.col("n_tok") <= 64))

    def gen(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                x = np.asarray(toks, dtype="float64")
                a = kernels.acf(x)
                p = kernels.acf_pearson(x)
                for lag in range(8):
                    rows.append((doc_id, lag, round(float(a[lag]), 6),
                                 round(float(p[lag]), 6)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "lag", "acf", "acf_pearson"])

    return docs.select("doc_id", "tokens").mapInPandas(
        gen, "doc_id string, lag int, acf double, acf_pearson double")


def _q_battery_time(spark, sf_dir):
    # the REAL fused battery (same path as features_battery), projected
    # to its SQL-expressible time-domain columns so the flagship
    # pipeline gets a value-oracle, not just a row count
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features
    cfg = FeatureConfig(framing=FramingParams(32, 16))
    feats = extract_features(_docs(spark, sf_dir).where(F.col("n_tok") >= 32),
                             cfg)
    return feats.select(
        "doc_id", "seg_idx", "center",
        F.round("energy", 6).alias("energy"),
        F.round("rms", 6).alias("rms"),
        F.round("spl", 6).alias("spl"))


def _q_causal_energy(spark, sf_dir):
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features
    cfg = FeatureConfig(framing=FramingParams(32, 16), causal=True)
    feats = extract_features(_docs(spark, sf_dir), cfg)
    return feats.select("doc_id", "seg_idx", "center", "energy")


def _click_purchase(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", "event_id",
                      F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us")))
    purch = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("rt"),
                     F.round("value", 6).alias("purchase_value")))
    return clicks, purch


def _q_asof_union(spark, sf_dir):
    from apollon_spark.operators.asof import asof_join
    clicks, purch = _click_purchase(spark, sf_dir)
    return asof_join(clicks, purch, on="t_us", right_on="rt", by="user_id",
                     value_cols=["purchase_value"], strategy="union")


def _q_asof_bucketed(spark, sf_dir):
    from apollon_spark.operators.asof import asof_join
    clicks, purch = _click_purchase(spark, sf_dir)
    return asof_join(clicks, purch, on="t_us", right_on="rt", by="user_id",
                     value_cols=["purchase_value"], strategy="bucketed",
                     bucket_width=3_600_000_000.0)


def _q_asof_strategies(spark, sf_dir):
    """Both physical as-of strategies on identical inputs in one gate
    (consolidated to keep the registry at 50): union-SMJ and
    bucketed-salted-SMJ must each reproduce the oracle's ASOF join
    exactly — the strategy tag makes a divergence in EITHER path a
    hash mismatch. Bench times the two strategies separately (r01
    per-query comparability)."""
    u = _q_asof_union(spark, sf_dir) \
        .select(F.lit("union").alias("strategy"), "*")
    b = _q_asof_bucketed(spark, sf_dir) \
        .select(F.lit("bucketed").alias("strategy"), "*")
    return u.unionByName(b)


def _q_dup_clusters(spark, sf_dir):
    """Dedup RESOLUTION: MinHash-LSH candidate pairs grouped into
    duplicate clusters (connected components via min-label
    propagation + pointer jumping) with one canonical doc kept per
    cluster (largest n_tok, ties to smallest doc_id). Covers every
    doc — docs in no pair are singleton clusters with keep=1. The
    oracle re-derives the components with a recursive reachability
    CTE over the same banded pairs."""
    from apollon_spark.ml.dedup import (lsh_candidate_pairs, minhash_docs,
                                        resolve_dup_clusters)
    docs = _docs(spark, sf_dir)
    eligible = docs.where(F.col("n_tok") >= _SHINGLE_K)
    sigs = minhash_docs(eligible, _MINHASH_N, _SHINGLE_K, _MINHASH_SEED)
    pairs = lsh_candidate_pairs(sigs, n_bands=4)
    return resolve_dup_clusters(docs, pairs)


def _q_asof_options(spark, sf_dir):
    """Every pd.merge_asof option in ONE gate (consolidated so the full
    registered set fits the driver's 50-query evaluation window):
    tolerance (matches further back than 1h null), forward (next
    purchase at-or-after, oracled via negated-time ASOF), nearest
    (closer of both sides, ties to backward) and strict
    (allow_exact=False: rt < t). Each variant is tagged by a ``mode``
    column; per-option property coverage stays in tests/test_asof.py."""
    from apollon_spark.operators.asof import asof_join
    clicks, purch = _click_purchase(spark, sf_dir)
    variants = {
        "tolerance": dict(tolerance=3_600_000_000.0),
        "forward": dict(direction="forward"),
        "nearest": dict(direction="nearest"),
        "strict": dict(allow_exact=False),
    }
    out = None
    for mode, kw in variants.items():
        part = asof_join(clicks, purch, on="t_us", right_on="rt",
                         by="user_id", value_cols=["purchase_value"],
                         strategy="union", **kw) \
            .select(F.lit(mode).alias("mode"), "user_id", "event_id",
                    "t_us", "purchase_value")
        out = part if out is None else out.unionByName(part)
    return out


def _q_sessionize(spark, sf_dir):
    from apollon_spark.operators.sessionize import session_bounds, sessionize
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"), "value")
    sess = sessionize(ev, on="t_us", gap=1_800_000_000, by="user_id")
    return (session_bounds(sess, on="t_us", by="user_id")
            .withColumnRenamed("session_start", "s_start")
            .withColumnRenamed("session_end", "s_end"))


def _q_locf(spark, sf_dir):
    """The full fill family in one gate over the same sparse stream:
    unbounded forward fill, bounded pandas-ffill(limit=3) parity
    (stale-data guard: observations stop propagating after 3 rows),
    and edge-clip backfill (forward fill then backward fill of the
    leading gap)."""
    from apollon_spark.operators.backfill import fill_edges_clip, locf
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.when(F.col("event_type") == "click", F.col("value"))
        .alias("click_value")) \
        .withColumn("cv_l3", F.col("click_value")) \
        .withColumn("cv", F.col("click_value"))
    filled = locf(ev, ["click_value"], on="t_us", by="user_id")
    filled = locf(filled, ["cv_l3"], on="t_us", by="user_id", limit=3)
    filled = fill_edges_clip(filled, ["cv"], on="t_us", by="user_id")
    return filled.select("user_id", "event_id",
                         F.round("click_value", 6).alias("click_value"),
                         F.round("cv_l3", 6).alias("cv_l3"),
                         F.round("cv", 6).alias("cv"))


def _q_lag_delta(spark, sf_dir):
    """Lag/lead deltas, gradient, flux PLUS the 2-lag delay embedding
    (Takens coordinates v1=lead 3, v2=lead 6; rows without a complete
    embedding keep null coordinates) — the windowed-shift family in
    one gate."""
    from apollon_spark.operators.backfill import (delay_embed_cols,
                                                  lag_lead_delta)
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"), "value")
    out = lag_lead_delta(ev, "value", on="t_us", by="user_id")
    de = delay_embed_cols(ev, "value", on="t_us", delay=3, m_dim=3,
                          by="user_id").select(
        "user_id", "event_id",
        F.round("value_d1", 6).alias("v1"),
        F.round("value_d2", 6).alias("v2"))
    return out.select(
        "user_id", "event_id",
        F.round("value_delta", 6).alias("delta"),
        F.round("value_grad", 6).alias("grad"),
        F.round(F.greatest("value_grad", F.lit(0.0)), 6).alias("flux")) \
        .join(de, ["user_id", "event_id"], "left")


def _q_dedup_exact(spark, sf_dir):
    from apollon_spark.ml.dedup import exact_dedup
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    return exact_dedup(documents, "text", "doc_id") \
        .select("doc_id", "dup_count")


def _q_minhash(spark, sf_dir):
    """MinHash signature components joined with the per-doc SimHash —
    both fingerprint families verified in one gate (the batched-numpy
    hot paths are tested equal to the SQL folds in tests/test_dedup.py;
    the SQL forms back the DuckDB oracle)."""
    from apollon_spark.ml.dedup import minhash_docs, simhash_docs
    docs = _docs(spark, sf_dir)
    eligible = docs.where(F.col("n_tok") >= _SHINGLE_K)
    sigs = minhash_docs(eligible, _MINHASH_N, _SHINGLE_K, _MINHASH_SEED)
    sh = simhash_docs(docs, _SIMHASH_BITS).select(
        "doc_id", F.col("sh").alias("simhash"))
    return sigs.select(
        "doc_id", F.posexplode("signature").alias("h_idx", "sig")) \
        .join(sh, "doc_id")


def _q_lsh_pairs(spark, sf_dir):
    # MinHash-LSH candidate mining — the banded bucket join that
    # replaces the O(n^2) comparison; value-oracled against the same
    # banding in DuckDB
    from apollon_spark.ml.dedup import lsh_candidate_pairs, minhash_docs
    docs = _docs(spark, sf_dir).where(F.col("n_tok") >= _SHINGLE_K)
    sigs = minhash_docs(docs, _MINHASH_N, _SHINGLE_K, _MINHASH_SEED)
    return lsh_candidate_pairs(sigs, n_bands=4)


def _q_media_frame_plan(spark, sf_dir):
    # video frame-sampling plan: metadata-only projection (the binary
    # payload column is pruned at the scan); synth_media's metadata is
    # a deterministic closed form, so DuckDB can regenerate it
    from apollon_spark.ml.multimodal import frame_sample_plan, synth_media
    media = synth_media(spark, 32)
    return frame_sample_plan(media, every_ms=250).select(
        "media_id", "duration_ms", "frame_ts_ms")


def _q_jaccard_pairs(spark, sf_dir):
    from apollon_spark.ml.dedup import jaccard_col
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(F.col("doc_id") < 60) \
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                F.array_distinct(F.split("text", " ")).alias("words"))
    a = documents.select(F.col("doc_id").alias("id_a"),
                         F.col("words").alias("wa"))
    b = documents.select(F.col("doc_id").alias("id_b"),
                         F.col("words").alias("wb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(jaccard_col(F.col("wa"), F.col("wb")), 6)
                    .alias("jaccard"))
            .where(F.col("jaccard") >= 0.3))


def _q_knn_cosine(spark, sf_dir):
    import numpy as np
    from apollon_spark.ml.simsearch import cosine_pairs_above
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.where(F.col("vec_id") < 3).orderBy("vec_id") \
        .select("vec_id", "embedding").collect()
    queries = np.array([r["embedding"] for r in qrows], dtype="float64")
    q_ids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    pairs = cosine_pairs_above(emb, queries, q_ids, threshold=0.2)
    return pairs.select("q_id", "id", F.round("sim", 6).alias("sim"))


def _q_text_profile(spark, sf_dir):
    from apollon_spark.ml.textstats import scrub_cols, text_profile
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    prof = text_profile(documents)
    # The fixture text is PII-free, so exercise the scrubber on text
    # augmented with deterministic per-row PII (same concat in the
    # DuckDB oracle) — value-oracles all four regexp_replace kinds.
    aug = F.concat(F.col("text"), F.lit(" contact u"), F.col("doc_id"),
                   F.lit("@ex.com via https://ex.com/d/"), F.col("doc_id"),
                   F.lit(" at 10.20.30.40 ref 9876543210"))
    scrubbed, counts = scrub_cols(aug)
    prof = prof.withColumn("text_scrubbed", scrubbed)
    for name, col in counts.items():
        prof = prof.withColumn(name, col.cast("int"))
    return prof.select("doc_id", "n_words", "n_chars", "n_tokens_est",
                       "quality", "lang_pred", "text_scrubbed",
                       "n_email", "n_url", "n_ip", "n_digits")


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    out = (li.where(F.col("l_shipdate") <= F.lit("2001-09-02"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(dec("l_quantity")).alias("sq"),
                F.sum(dec("l_extendedprice")).alias("sb"),
                F.sum(dec("l_extendedprice")
                      * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .alias("sd"),
                F.count("*").alias("n")))
    return out.select(
        "l_returnflag", "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sb").cast("double").alias("sum_base"),
        F.col("sd").cast("double").alias("sum_disc"),
        "n")


def _q_topk_orders(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (orders.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("o_orderpriority", "rank", "o_orderkey",
                    F.round("o_totalprice", 2).alias("total")))


def _q_window_count_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (ev.withColumn(
        "win_id", F.expr("unix_micros(cast(ts as timestamp)) div 300000000"))
        .groupBy("event_type", "win_id")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 4).alias("val_sum")))


def _q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (ctx=512): integer-exact
    per-sequence profile. The oracle re-derives the packing from a
    window cumsum + token unnest — fine at sf0.01; the engine side
    uses the two-phase offsets + slice explosion that scale."""
    from apollon_spark.operators.packing import pack_profile
    return pack_profile(_docs(spark, sf_dir), 512)


def _q_contamination(spark, sf_dir):
    """Benchmark-contamination scan PLUS the CCNet-style bigram-LM
    quality score, both against the same md5-prefix benchmark split:
    distinct 3-gram broadcast join for the overlap fraction, and the
    add-α bigram model counted on the benchmark slice for mean_logp
    (late r04 — the ln/avg cross-engine risk is the same one
    hmm_estep's log-likelihood already carries at 6dp)."""
    from apollon_spark.ml.curation import (benchmark_split,
                                           contamination_check,
                                           ngram_lm_score)
    train, bench = benchmark_split(_docs(spark, sf_dir))
    cont = contamination_check(train, bench, 3)
    lm = ngram_lm_score(train, bench)
    return (cont.join(lm, "doc_id")
            .select("doc_id", "n_grams", "n_hit", "hit_frac",
                    "n_bigrams", F.round("mean_logp", 6).alias("mean_logp")))


def _q_sample_stratified(spark, sf_dir):
    """Two deterministic sampling modes in one gate: per-source quota
    (md5 shuffle order, mode='quota', k=rank) and source-mixture
    resampling with fractional upsampling weights (data-mixing
    ratios; mode='mix', k=copy index — src0 x2.0, src1 x1.5,
    src2 x0.25, src3 x0.5, all other sources dropped)."""
    from apollon_spark.ml.curation import mixture_sample, sample_stratified
    docs = _docs(spark, sf_dir)
    quota = sample_stratified(docs, quota=40).select(
        F.lit("quota").alias("mode"), "source", "doc_id",
        F.col("rk").cast("int").alias("k"))
    mix = mixture_sample(
        docs, {"src0": 2.0, "src1": 1.5, "src2": 0.25, "src3": 0.5}).select(
        F.lit("mix").alias("mode"), "source", "doc_id",
        F.col("copy").cast("int").alias("k"))
    return quota.unionByName(mix)


def _q_vocab_topk(spark, sf_dir):
    """Corpus token-frequency table: top-32 tokens by occurrences
    with document frequency."""
    from apollon_spark.ml.curation import vocab_stats
    return vocab_stats(_docs(spark, sf_dir), top_k=32)


def _q_rolling_stats(spark, sf_dir):
    """Sliding-frame mean/min/max/sum plus the exact order-statistic
    median (Spark ``percentile`` and DuckDB ``quantile_cont``
    interpolate identically) over the same rows frame."""
    from apollon_spark.operators.backfill import rolling_stats
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"), "value")
    out = rolling_stats(ev, "value", on="t_us", before=3, after=2,
                        by="user_id")
    w = (Window.partitionBy("user_id").orderBy("t_us").rowsBetween(-3, 2))
    return out.select(
        "user_id", "event_id",
        F.round("value_win_mean", 6).alias("w_mean"),
        F.round("value_win_min", 6).alias("w_min"),
        F.round("value_win_max", 6).alias("w_max"),
        F.round("value_win_sum", 6).alias("w_sum"),
        F.round(F.expr("percentile(value, 0.5)").over(w), 6)
        .alias("w_med"))


def _q_normalize_stats(spark, sf_dir):
    """Per-group z-score (tools.py:222-231) and +-1-sigma smoothing
    (tools.py:201-219) in one gate — both windowed-aggregate
    normalizers over the same grouping, no second join."""
    from apollon_spark.operators.backfill import smooth_stat, standardize
    ev = _events(spark, sf_dir).select("user_id", "event_id", "value")
    out = smooth_stat(standardize(ev, ["value"], by="user_id"),
                      "value", by="user_id")
    return out.select("user_id", "event_id",
                      F.round("value_z", 6).alias("z"),
                      F.round("value_smooth", 6).alias("smoothed"))


def _q_join_revenue(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (orders.join(customer,
                        orders["o_custkey"] == customer["c_custkey"])
            .join(F.broadcast(nation),
                  customer["c_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name")
            .agg(F.sum(dec).alias("rev"), F.count("*").alias("n_orders"))
            .select("n_name", F.col("rev").cast("double").alias("revenue"),
                    "n_orders"))


def _q_onset_gather(spark, sf_dir):
    from apollon_spark.onsets import by_onsets_gather
    docs = _docs(spark, sf_dir)
    ons = docs.select(
        "doc_id",
        F.explode(F.array(
            F.expr("cast(n_tok div 4 as int)"),
            F.expr("cast(n_tok div 2 as int)"),
            (F.col("n_tok") - 3).cast("int"))).alias("frame"))
    gathered = by_onsets_gather(docs, ons, n_perseg=8)
    wsum = F.aggregate("window", F.lit(0).cast("long"),
                       lambda acc, x: acc + x)
    return gathered.select("doc_id", "frame", wsum.alias("wsum"))


def _q_extend_energy(spark, sf_dir):
    """Extend+pad framing (the trickiest Segmentation corner,
    segment.py:207-216) verified end-to-end: per-segment energy on the
    extended grid, oracle re-derives the padded slices in pure SQL."""
    from apollon_spark.operators.framing import FramingParams, segment_docs
    p = FramingParams(32, 16, True, True)
    segs = segment_docs(_docs(spark, sf_dir), p)
    energy = F.aggregate("frame", F.lit(0.0), lambda a, x: a + x * x)
    return segs.select("doc_id", "seg_idx", "center", energy.alias("energy"))


def _q_cosine_neardup(spark, sf_dir):
    from apollon_spark.ml.dedup import cosine_near_dups
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # exclude pairs within 1e-4 of the threshold (mirrored in the
    # oracle): Spark's left-to-right fold and DuckDB's GROUP BY sum are
    # non-associative, so a pair exactly at the cutoff could flip
    return cosine_near_dups(emb, "vec_id", "embedding", threshold=0.2,
                            scope=F.col("vec_id") < 200) \
        .where(F.abs(F.col("cos_sim") - 0.2) > 1e-4)


def _q_cosine_neardup_lsh(spark, sf_dir):
    """Banded sign-hyperplane candidate mining + exact-cosine verify —
    value-oracled end-to-end: the DuckDB oracle re-derives the SAME
    deterministic hyperplanes (seeded rng embedded as SQL literals),
    bands, buckets and cosine filter. Threshold-epsilon guard mirrors
    ``cosine_neardup`` (fold-order rounding could flip a pair exactly
    at the cutoff)."""
    from apollon_spark.ml.dedup import cosine_near_dups_lsh
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_near_dups_lsh(emb, "vec_id", "embedding", threshold=0.4,
                                n_planes=6, n_bands=8) \
        .where(F.abs(F.col("cos_sim") - 0.4) > 1e-4)


def _q_ann_rerank(spark, sf_dir):
    """LSH-ANN candidate mining + exact re-rank scoring, rank-free so
    it can be value-oracled (the top-k window cut is separately oracled
    by ``topk_orders``): multi-probe Hamming-1 bucket join, exact
    cosine on candidates, threshold with an epsilon guard."""
    import numpy as np
    from apollon_spark.ml.simsearch import lsh_ann_candidates
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.where(F.col("vec_id") < 3).orderBy("vec_id") \
        .select("vec_id", "embedding").collect()
    queries = np.array([r["embedding"] for r in qrows], dtype="float64")
    q_ids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    scored = lsh_ann_candidates(emb, queries, q_ids, n_planes=4, seed=11)
    return (scored
            .where((F.col("sim") >= 0.2)
                   & (F.abs(F.col("sim") - 0.2) > 1e-4))
            .select("q_id", "id", F.round("sim", 6).alias("sim")))


def _q_battery_paths(spark, sf_dir):
    """Registry consolidation (r04, 50-gate cap): the fast-path and
    halo-split batteries in ONE path-tagged gate. Both pipelines still
    execute in full and value-check against the same time-domain SQL
    (split == unsplit is bit-equal, pytest-proven, so the oracle is
    the battery SQL twice with path tags). Bench times the halves
    separately."""
    fast = _q_battery_time(spark, sf_dir) \
        .select(F.lit("fast").alias("path"), "*")
    split = _q_features_split(spark, sf_dir) \
        .select(F.lit("split").alias("path"), "*")
    return fast.unionByName(split)


def _q_dup_passages(spark, sf_dir):
    """Exact duplicate-passage detection (fixed-k variant of Lee et
    al. ACL'22 exact substring dedup), method-tagged union of BOTH
    faces: 'occur' = every position whose 8-token window content
    appears in >= 2 distinct docs with the content's corpus doc- and
    occurrence-counts (pos, a=n_docs, b=n_occur); 'cut' (late r04) =
    the maximal removal spans under keep-one-canonical semantics
    (pos=span_start, a=span_end, b=n_windows). md5 content keys are
    byte-identical in Spark and DuckDB, so window explosion, corpus
    aggregate, span join, canonical row_number pick AND the
    gaps-and-islands merge all value-oracle."""
    from apollon_spark.ml.dedup import (duplicate_passage_spans,
                                        passage_removal_spans)
    docs = _docs(spark, sf_dir)
    occ = duplicate_passage_spans(docs, k=8, key="md5", min_docs=2) \
        .select(F.lit("occur").alias("method"), "doc_id",
                F.col("pos").cast("long").alias("pos"),
                F.col("n_docs").cast("long").alias("a"),
                F.col("n_occur").cast("long").alias("b"))
    cut = passage_removal_spans(docs, k=8, key="md5", min_docs=2) \
        .select(F.lit("cut").alias("method"), "doc_id",
                F.col("span_start").cast("long").alias("pos"),
                F.col("span_end").cast("long").alias("a"),
                F.col("n_windows").cast("long").alias("b"))
    return occ.unionByName(cut)


def _q_cosine_semantic(spark, sf_dir):
    """SemDeDup pair mining (Abbas et al., arXiv:2303.09540): route
    every embedding to its nearest of 8 explicit centroids (= the
    first 8 corpus vectors, the ``ivf_ann`` determinism device), then
    exact cosine ONLY within clusters. Value-oracled end-to-end: the
    DuckDB side re-derives routing (argmin with the same lowest-
    cluster tiebreak) and scoring from the same parquet doubles.
    Threshold-epsilon guard mirrors ``cosine_neardup``."""
    import numpy as np
    from apollon_spark.ml.semdedup import semantic_dup_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    crows = emb.where(F.col("vec_id") < 8).orderBy("vec_id") \
        .select("embedding").collect()
    cents = np.array([r["embedding"] for r in crows], dtype="float64")
    return semantic_dup_pairs(emb, 0.4, centroids=cents) \
        .where(F.abs(F.col("cos_sim") - 0.4) > 1e-4) \
        .select("id_a", "id_b", "cos_sim")


def _q_cosine_neardup_all(spark, sf_dir):
    """Registry consolidation (r04, 50-gate cap): brute-force,
    LSH-mined and SemDeDup within-cluster embedding near-dup in ONE
    method-tagged gate — same device as asof_strategies. Bench still
    times the halves separately (bench.py)."""
    brute = _q_cosine_neardup(spark, sf_dir) \
        .select(F.lit("brute").alias("method"), "id_a", "id_b", "cos_sim")
    lsh = _q_cosine_neardup_lsh(spark, sf_dir) \
        .select(F.lit("lsh").alias("method"), "id_a", "id_b", "cos_sim")
    sem = _q_cosine_semantic(spark, sf_dir) \
        .select(F.lit("semantic").alias("method"), "id_a", "id_b",
                "cos_sim")
    return brute.unionByName(lsh).unionByName(sem)


def _q_ann_all(spark, sf_dir):
    """Registry consolidation (r04, 50-gate cap): the LSH-ANN top-5
    rank cut and the rank-free rerank threshold cut in ONE
    method-tagged gate (rerank rows carry rank 0 — the cut is
    deliberately rank-free there). Bench times the halves
    separately."""
    topk = _q_ann_lsh(spark, sf_dir) \
        .select(F.lit("topk").alias("method"), "q_id", "rank", "id", "sim")
    rerank = _q_ann_rerank(spark, sf_dir) \
        .select(F.lit("rerank").alias("method"), "q_id",
                F.lit(0).alias("rank"), "id", "sim")
    return topk.unionByName(rerank)


# Fixed 2-state E-step parameters for the hmm_estep gate: λ in the
# token range [0,255], exactly-representable binary fractions for Γ/δ
# so the literals parse identically in both engines.
_ESTEP_LAM = (16.0, 128.0)
_ESTEP_GAMMA = ((0.75, 0.25), (0.375, 0.625))
_ESTEP_DELTA = (0.5, 0.5)

# peak_scan gate params: tumbling-4 token energy as the deterministic
# ODF, ±2 neighborhood, the reference's default alpha, absolute delta
_PEAK_WIN, _PEAK_NB, _PEAK_NA = 4, 2, 2
_PEAK_ALPHA, _PEAK_DELTA = 0.1, 0.5

# onsets gate params: FluxOnsetDetector at 16/8 framing (docs are short
# token series), hamming window, defaults elsewhere (alpha 0.1, fps
# 9000 per FeatureConfig); the oracle replays the same constants
_ONS_N, _ONS_HOP, _ONS_BINS = 16, 8, 9
_ONS_NB, _ONS_NA, _ONS_ALPHA, _ONS_DELTA = 2, 2, 0.1, 0.05
_ONS_FPS = 9000


def _q_peak_scan(spark, sf_dir):
    """The FilterPeakPicker scan (reference onsets.py:227-262) value-
    oracled row-for-row: a deterministic time-domain ODF (tumbling
    token energy — no FFT, so it is SQL-expressible) runs through the
    REAL peak-scan kernel (apollon_spark/onsets.py peak_flag_series:
    the clip-indexed window conds and the recursive smoother
    g[n+1]=max(v, αg+(1−α)v)), emitting per-row condition verdicts.
    The DuckDB oracle replays conds 1-2 as edge-corrected window SQL
    and cond 3 as a recursive CTE — extending the som_train unrolling
    precedent to the stateful-scan family (VERDICT r03 #1a). Energies
    are int64 window sums cast to double (< 2^53, exact), identical
    whether summed in numpy or SQL, so every comparison is bit-stable.

    FUSED like detect_onsets: energy series + scan in one mapInPandas
    — Scan -> Project -> MapInPandas, zero shuffles (the composed
    odf-groupBy form via onsets.peak_flags is the generic operator;
    its energy agg is separately oracled by `tumbling`). Measured
    12.5s (per-group applyInPandas) -> 2.8s (batched gather) -> ~0.7s
    (fused) at sf0.1."""
    import numpy as np
    import pandas as pd

    from apollon_spark.onsets import peak_flag_series
    from apollon_spark.session import spread_compact
    w = _PEAK_WIN

    def gen(batches):
        for pdf in batches:
            out = []
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                t = np.asarray(toks, dtype="int64")
                if t.size == 0:
                    continue
                n_win = (t.size + w - 1) // w
                sq = np.zeros(n_win * w, dtype="int64")
                sq[:t.size] = t * t
                vals = sq.reshape(n_win, w).sum(axis=1).astype("float64")
                c12, c3 = peak_flag_series(
                    vals, _PEAK_NA, _PEAK_NB, _PEAK_ALPHA, _PEAK_DELTA)
                out.append(pd.DataFrame({
                    "doc_id": np.repeat(doc_id, n_win),
                    "win_id": np.arange(n_win, dtype="int32"),
                    "value": vals,
                    "cond12": c12.astype("int32"),
                    "cond3": c3.astype("int32"),
                    "is_peak": (c12 & c3).astype("int32")}))
            if out:
                yield pd.concat(out, ignore_index=True)

    src = spread_compact(_docs(spark, sf_dir).select("doc_id", "tokens"))
    return src.mapInPandas(
        gen, "doc_id string, win_id int, value double, "
             "cond12 int, cond3 int, is_peak int")


def _q_hmm_estep(spark, sf_dir):
    """ONE FULL EM iteration of the Poisson HMM on FIXED (λ,Γ,δ),
    value-oracled: per (doc, t) the scaled forward variables, scale
    factors and smoothed posteriors from the REAL forward-backward
    recurrences (apollon_spark/hmm.py estep_posteriors_m2, reference
    hmm/poisson.py:78-98), PLUS — since late r04 — the M-STEP update
    (λ', Γ', δ') and the iteration's log-likelihood (em_update_m2;
    poisson_em's exact update formulas, reference
    hmm/poisson.py:100-118) as per-doc columns. The emission and
    row-max tables are finite 256-entry literals embedded bit-exactly
    via mantissa·2^exp; the recursions are recursive CTEs and the
    M-step is pure aggregation over them — the som_train unrolling
    precedent applied to EM TRAINING, not just inference (VERDICT r03
    #1b, extended). Docs need n_tok >= 2 (the ξ transition sums are
    empty at T=1; poisson_em itself degenerates there)."""
    from apollon_spark.hmm import EM_STEP_COLS, em_step_docs
    docs = _docs(spark, sf_dir)
    out = em_step_docs(docs, _ESTEP_LAM, _ESTEP_GAMMA, _ESTEP_DELTA)
    cols = ["alpha0", "cscale", "post0", "post1"] + EM_STEP_COLS
    return out.select(
        "doc_id", "t", *[F.round(c, 6).alias(c) for c in cols])


# --- spectral / iterative gates. Since r05 EVERY gate is value-
# --- oracled: hmm via the 2-iteration EM training unroll and
# --- similarity_position via em2 descriptors -> SQL SOM epochs;
# --- features_battery, onsets and nonlinear via literal-basis /
# --- unrolled-recursion SQL (late r04). ------------------------------------

def _q_features_battery(spark, sf_dir):
    """The FULL spectral battery (energy/rms/spl/centroid/spread/
    skewness/kurtosis/flux/fspl/loudness/sharpness), value-oracled
    since r04 via a 544-entry literal DFT basis + literal Bark bank /
    sharpness weights at 6-decimal rounding (see _features_battery_sql).
    The entropy column is projected away: with_entropy=False makes it
    constant NaN (spectral.py:190) — zero information, and NaN vs NULL
    canonicalization differs cross-engine; the entropy kernel itself is
    pytest-verified (tests/test_kernels_extra.py)."""
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features
    cfg = FeatureConfig(framing=FramingParams(32, 16))
    feats = extract_features(_docs(spark, sf_dir), cfg)
    rounded = [_round6(c).alias(c)
               for c in ["energy", "rms", "spl", "centroid", "spread",
                         "skewness", "kurtosis", "flux", "fspl",
                         "loudness", "sharpness"]]
    return feats.select("doc_id", "seg_idx", "center", "ts", *rounded)


def _q_features_split(spark, sf_dir):
    """The halo-split skew path (split_docs_halo + chunked battery +
    reassembly), projected to its SQL-expressible time-domain columns
    so the SPLIT pipeline gets a value-oracle of its own (pytest
    separately proves split == unsplit bit-equal on every column;
    the full-battery row shape stays covered by features_battery)."""
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig, extract_features
    cfg = FeatureConfig(framing=FramingParams(32, 16))
    feats = extract_features(_docs(spark, sf_dir).where(F.col("n_tok") >= 32),
                             cfg, split=True, chunk_segs=3)
    return feats.select(
        "doc_id", "seg_idx", "center",
        F.round("energy", 6).alias("energy"),
        F.round("rms", 6).alias("rms"),
        F.round("spl", 6).alias("spl"))


def _q_hmm(spark, sf_dir):
    """EM TRAINING value-oracled by the 2-iteration fixed-seed unroll
    (VERDICT r04 #3, closing the r04 rows-only gate): two CHAINED full
    EM iterations per doc — iteration 2's (λ,Γ,δ) is iteration 1's
    M-step output through the binary fixed-point ``_quant16`` handoff
    — with per-iteration parameters, log-likelihoods and the ll
    improvement (the convergence test ``poisson_em`` applies each
    round; ``converged`` uses the reference's tol=1e-5 on the rounded
    dll so the flag is grid-deterministic cross-engine). The DuckDB
    oracle replays iteration 1 exactly as hmm_estep does (literal
    emission tables + recursive CTEs), then builds iteration 2's
    per-doc emission tables by the division recursion
    e(x)=e(x-1)·(λ/x) and runs the second forward-backward as
    recursive CTEs on them. The full data-dependent-convergence fit
    (`fit_hmm_docs`, reference hmm/poisson.py:78-118) runs on the
    SAME _estep/_em_update kernels (pytest: em_update_m2 ==
    poisson_em(max_iter=1) pre-sort state; regime-switching fixture)
    and stays driveable via `--stage hmm`; dll can round to ±0.0, so
    it goes through _round6."""
    from apollon_spark.hmm import EM2_ITER_COLS, em_two_iter_docs
    docs = _docs(spark, sf_dir)
    out = em_two_iter_docs(docs, _ESTEP_LAM, _ESTEP_GAMMA, _ESTEP_DELTA)
    iter_cols = [f"{c}_{t}" for t in ("1", "2") for c in EM2_ITER_COLS]
    dll = _round6("dll")
    return out.select(
        "doc_id", "n_tok",
        *[_round6(c).alias(c) for c in iter_cols],
        dll.alias("dll"),
        (F.abs(dll) < F.lit(1e-5)).cast("int").alias("converged"))


def _q_onsets(spark, sf_dir):
    """The FULL fused flux onset detector (reference FluxOnsetDetector,
    onsets.py:179-216): framing -> hamming rfft -> spectral flux ->
    per-doc mean floor -> FilterPeakPicker scan -> (doc_id, frame,
    time). Value-oracled since r04: with n_perseg=16 the DFT is a
    144-entry literal basis (mantissa-exact window·cos/sin products),
    np.gradient flux is lead/lag window SQL, and the peak scan reuses
    the peak_scan gate's recursive-CTE device — so the one remaining
    FFT stage is SQL-expressible at this segment size. Output frames
    are integers (time = frame/fps, an exact IEEE division of an
    integer), so the value hash is immune to the ~1-ulp cross-engine
    drift in the float intermediates; verified tuple-exact at sf0.001,
    sf0.01 and sf0.1."""
    from apollon_spark.onsets import detect_onsets
    from apollon_spark.operators.framing import FramingParams
    from apollon_spark.spectral import FeatureConfig
    docs = _docs(spark, sf_dir).where(F.col("n_tok") >= 32)
    cfg = FeatureConfig(framing=FramingParams(_ONS_N, _ONS_HOP))
    return detect_onsets(docs, cfg, n_before=_ONS_NB, n_after=_ONS_NA,
                         alpha=_ONS_ALPHA, delta=_ONS_DELTA)


def _q_som_train(spark, sf_dir):
    """Distributed batch-SOM TRAINING value-oracled end-to-end: with
    explicit init weights (the first 16 embedding vectors), the
    2-epoch fit is a pure function of the data — the DuckDB oracle
    re-derives the full recursion (BMU argmin -> neighborhood-weighted
    means -> next epoch on the updated weights) with the
    grid-distance/kernel matrices embedded as exact literals. Output =
    final weights in (unit, dim_idx, w) long form. BMU *assignment* is
    separately oracled by ``bmu_fixed``; the sampled-init training
    path stays covered by tests/test_som.py."""
    import numpy as np
    from apollon_spark.som import SomParams, fit_batch_som
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", F.col("embedding").cast("array<double>")
                .alias("embedding"))
    wrows = emb.where(F.col("vec_id") < 16).orderBy("vec_id").collect()
    w0 = np.array([r["embedding"] for r in wrows], "float64")
    data = emb.where(F.col("vec_id") >= 16)
    weights, _ = fit_batch_som(data, "embedding",
                               SomParams(4, 4, n_iter=2), w0=w0)
    rows = [(u, j, round(float(weights[u, j]), 6))
            for u in range(weights.shape[0])
            for j in range(weights.shape[1])]
    return spark.createDataFrame(rows, "unit int, dim_idx int, w double")


def _q_bmu_fixed(spark, sf_dir):
    # BMU assignment against FIXED weights (the first 16 embedding
    # vectors) — unlike the trained-SOM gate this is fully
    # SQL-expressible, so the broadcast-argmin operator itself gets a
    # value oracle; ties broken by lowest unit index in both engines
    import numpy as np
    from apollon_spark.som import assign_bmu
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", F.col("embedding").cast("array<double>")
                .alias("embedding"))
    wrows = emb.where(F.col("vec_id") < 16).orderBy("vec_id").collect()
    weights = np.array([r["embedding"] for r in wrows], dtype="float64")
    return assign_bmu(emb.where(F.col("vec_id") >= 16), "embedding",
                      weights).select(
        "vec_id", "bmu", F.round("bmu_dist", 6).alias("bmu_dist"))


def _q_ann_lsh(spark, sf_dir):
    """Full LSH-ANN pipeline end-to-end with a deterministic
    rounded-sim top-5 cut: multi-probe bucket mining + exact-cosine
    scoring (the ann_rerank math) + row_number over
    (round(sim,6) DESC, id) — rank ordering on the rounded key is
    engine-reproducible, so the whole pipeline value-oracles (the
    operator's own raw-sim cut stays pytest-verified)."""
    import numpy as np
    from apollon_spark.ml.simsearch import lsh_ann_candidates
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.where(F.col("vec_id") < 3).orderBy("vec_id") \
        .select("vec_id", "embedding").collect()
    queries = np.array([r["embedding"] for r in qrows], dtype="float64")
    q_ids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    scored = lsh_ann_candidates(emb, queries, q_ids, n_planes=4, seed=11)
    w = Window.partitionBy("q_id").orderBy(
        F.round("sim", 6).desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("q_id", "rank", "id", F.round("sim", 6).alias("sim")))


def _q_media_features(spark, sf_dir):
    """Decode-stub feature extraction over binary media payloads, in
    scalar long form (one row per (media_id, dim_idx)). No rounding:
    every value is an exact dyadic rational (u32/2^32), bit-identical
    between the distributed sha256 pipeline and the oracle's
    independent hashlib re-derivation."""
    from apollon_spark.ml.multimodal import extract_media_features, synth_media
    media = synth_media(spark, 32)
    feats = extract_media_features(media, dim=8)
    return feats.select(
        "media_id", "kind",
        F.posexplode("feature").alias("dim_idx", "value"))


def _q_nonlinear(spark, sf_dir):
    """Per-doc nonlinear battery, value-oracled since r04: the
    windowed-correlogram mean (max(corrcoef,0)^4 over 4 delays,
    features.py:76-119), acf lag-1 and the first-negative-acf lag all
    replay in SQL (_nonlinear_sql). The cdim column is projected away:
    the Bader kernel needs >= 2400 samples (signal/cdim.c:172-177) and
    the contract corpus tops out at 99 tokens, so it is constant NaN
    here — zero information, NaN/NULL hashing undefined cross-engine;
    cdim itself stays behaviorally pytest-verified
    (tests/test_kernels_extra.py). acf_min_lag note: the engine reads
    signs off the FFT acf while the oracle uses exact integer lag sums
    — non-negative token signals make every lag sum >= 0 and the
    measured |acf| floor at sf0.1 is 6e-6, five decades above FFT
    noise, so the integer column is stable (verified value-exact at
    sf0.001/0.01/0.1)."""
    from apollon_spark.nonlinear import extract_nonlinear
    docs = _docs(spark, sf_dir).where(F.col("n_tok") >= 64)
    out = extract_nonlinear(docs, corr_wlen=10, corr_delay=5)
    return out.select(
        "doc_id",
        F.round("correlogram", 6).alias("correlogram"),
        F.round("acf_lag1", 6).alias("acf_lag1"),
        "acf_min_lag")


def _q_ivf_ann(spark, sf_dir):
    """Full IVF pipeline with explicit centroids (the first 8
    embedding vectors, derived in SQL by the oracle — same device as
    som_train's w0): nearest-centroid routing, n_probe=3 probing,
    exact-cosine scoring and a deterministic rounded-sim top-5 cut.
    kmeans++ centroid TRAINING stays pytest-verified
    (tests/test_simsearch.py)."""
    import numpy as np
    from apollon_spark.ml.simsearch import ivf_candidates
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.where(F.col("vec_id") < 3).orderBy("vec_id") \
        .select("vec_id", "embedding").collect()
    queries = np.array([r["embedding"] for r in qrows], dtype="float64")
    q_ids = np.array([r["vec_id"] for r in qrows], dtype="int64")
    crows = emb.where(F.col("vec_id") < 8).orderBy("vec_id") \
        .select("embedding").collect()
    cents = np.array([r["embedding"] for r in crows], dtype="float64")
    scored = ivf_candidates(emb, queries, q_ids, n_probe=3,
                            centroids=cents)
    w = Window.partitionBy("q_id").orderBy(
        F.round("sim", 6).desc(), F.col("id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("q_id", "rank", "id", F.round("sim", 6).alias("sim")))


def _q_similarity_position(spark, sf_dir):
    """The apollon end-game (HMM descriptors -> Γ-SOM -> BMU
    positions), value-oracled since r05 (VERDICT r04 #4, closing the
    LAST rows-only gate): the per-doc EM descriptor is the
    2-iteration unrolled Γ₂ (the hmm gate's bit-oracled training
    device) instead of the data-dependent-convergence fit, the SOM is
    the 2-epoch hellinger batch fit on explicit init weights (the
    som_train device — w0 = the 9 lexicographically-first docs'
    descriptors, epoch kernels as exact literals), and the BMU
    assignment is the bmu_fixed device under the hellinger_stm
    metric. Every stage runs the REAL production kernels
    (em_two_iter_docs, fit_batch_som, assign_bmu); the DuckDB oracle
    chains the em2 CTEs into the SOM epoch recursion in SQL. The
    free-convergence pipeline (fit_similarity_map) stays covered by
    tests/test_similarity.py and the CLI som stage."""
    from apollon_spark.hmm import em_two_iter_docs
    from apollon_spark.som import SomParams, assign_bmu, fit_batch_som
    em2 = em_two_iter_docs(_docs(spark, sf_dir),
                           _ESTEP_LAM, _ESTEP_GAMMA, _ESTEP_DELTA)
    desc = em2.select(
        "doc_id",
        F.array("g00_2", "g01_2", "g10_2", "g11_2").alias("gamma_flat"))
    desc = desc.cache()
    import numpy as np
    w0 = np.array([r["gamma_flat"] for r in
                   desc.orderBy("doc_id").limit(9).collect()], "float64")
    p = SomParams(3, 3, n_iter=2, metric="hellinger")
    weights, _ = fit_batch_som(desc, "gamma_flat", p, w0=w0)
    out = assign_bmu(desc, "gamma_flat", weights, metric="hellinger",
                     round_scale=6)
    # the cache served its purpose (w0 collect + 2 eager SOM epochs
    # read it); drop the blocks NOW so repeated bench calls don't
    # accumulate copies in executor storage — the final BMU pass
    # recomputes the em2 kernel once, the same recompute-over-pin
    # economics as every other gate
    desc.unpersist()
    return out.select("doc_id", "bmu",
                      F.round("bmu_dist", 6).alias("bmu_dist"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 gates — the driver evaluates at most the first 50
    keys, so the registered set is consolidated to fit (near-duplicate
    option gates merged: asof tolerance/forward/nearest/strict ->
    asof_options, asof union+bucketed strategies -> asof_strategies,
    locf_limit + backfill_clip -> locf, rolling_median
    -> rolling_stats, standardize+smooth_stat -> normalize_stats,
    reassembly -> frames_agg, delay_embed -> lag_delta, simhash ->
    minhash; r04: cosine_neardup_lsh -> cosine_neardup,
    ann_rerank -> ann_lsh, and features_split -> battery_time,
    method/path-tagged unions freeing the slots the new
    peak_scan/hmm_estep/dup_passages gates take; per-option coverage
    stays in pytest and the bench still times merged halves
    separately).
    New gates and any that missed an evaluation window in a previous
    round lead the dict. Since r05 every gate is value-oracled (zero
    rows-only entries)."""
    return {
        # newest gates + any that missed an evaluation window — first
        "peak_scan": _q_peak_scan,
        "hmm_estep": _q_hmm_estep,
        "dup_passages": _q_dup_passages,
        "pack_sequences": _q_pack_sequences,
        "contamination": _q_contamination,
        "sample_stratified": _q_sample_stratified,
        "vocab_topk": _q_vocab_topk,
        "ivf_ann": _q_ivf_ann,
        "media_features": _q_media_features,
        "nonlinear": _q_nonlinear,
        "similarity_position": _q_similarity_position,
        "dup_clusters": _q_dup_clusters,
        # value-oracled gates
        "docs_profile": _q_docs_profile,
        "frames_agg": _q_frames_agg,
        "tumbling": _q_tumbling,
        "sliding": _q_sliding,
        "segment_meta": _q_segment_meta,
        "seg_energy": _q_seg_energy,
        "battery_time": _q_battery_paths,
        "acf_profile": _q_acf_profile,
        "scalar_funcs": _q_scalar_funcs,
        "window_vectors": _q_window_vectors,
        "causal_energy": _q_causal_energy,
        "asof_strategies": _q_asof_strategies,
        "asof_options": _q_asof_options,
        "sessionize": _q_sessionize,
        "locf": _q_locf,
        "lag_delta": _q_lag_delta,
        "dedup_exact": _q_dedup_exact,
        "minhash": _q_minhash,
        "jaccard_pairs": _q_jaccard_pairs,
        "lsh_pairs": _q_lsh_pairs,
        "media_frame_plan": _q_media_frame_plan,
        "knn_cosine": _q_knn_cosine,
        "text_profile": _q_text_profile,
        "tpch_q1": _q_tpch_q1,
        "topk_orders": _q_topk_orders,
        "window_count_events": _q_window_count_events,
        "bmu_fixed": _q_bmu_fixed,
        "som_train": _q_som_train,
        "rolling_stats": _q_rolling_stats,
        "normalize_stats": _q_normalize_stats,
        "join_revenue": _q_join_revenue,
        "onset_gather": _q_onset_gather,
        "cosine_neardup": _q_cosine_neardup_all,
        "extend_energy": _q_extend_energy,
        "ann_lsh": _q_ann_all,
        # features_battery and onsets gained value oracles late r04
        # (literal DFT basis); hmm graduated in r05 via the
        # 2-iteration training unroll
        "features_battery": _q_features_battery,
        "hmm": _q_hmm,
        "onsets": _q_onsets,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

_W = f"WITH {DUCKDB_DOCS_CTE.strip()}"
_WF = f"WITH {DUCKDB_DOCS_CTE.strip()}, {DUCKDB_FRAMES_CTE.strip()}"


def _minhash_sigs_cte() -> str:
    # fold order must equal the Spark fold: ((x0 % M)*p + x1) % M * p + x2) % M
    params = hash_params(_MINHASH_N, _MINHASH_SEED)
    shingle = (
        "list_transform(range(1, n_tok - 1), i -> "
        "(((((CAST(tokens[i] AS BIGINT) % 2147483647) * 1000003 "
        "+ CAST(tokens[i+1] AS BIGINT)) % 2147483647) * 1000003 "
        "+ CAST(tokens[i+2] AS BIGINT)) % 2147483647))")
    sig_exprs = ", ".join(
        f"list_min(list_transform(sh, s -> ({a} * s + {b}) % 2147483647)) "
        f"AS sig_{j}"
        for j, (a, b) in enumerate(params))
    sig_cols = ", ".join(f"sig_{j}" for j in range(_MINHASH_N))
    return f"""
{_W},
shingled AS (
  SELECT doc_id, {shingle} AS sh FROM docs WHERE n_tok >= {_SHINGLE_K}
),
sigs AS (SELECT doc_id, [{sig_cols}] AS signature
         FROM (SELECT doc_id, {sig_exprs} FROM shingled))"""


def _simhash_cte() -> str:
    """CTE fragment (no WITH) deriving per-doc SimHash from docs."""
    bit_terms = []
    for b in range(_SIMHASH_BITS):
        vote = (f"list_sum(list_transform(mixed, m -> "
                f"CASE WHEN (m & {1 << b}) != 0 THEN 1 ELSE -1 END))")
        bit_terms.append(
            f"CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END")
    total = " + ".join(bit_terms)
    return f"""
mix AS (
  SELECT doc_id,
         list_transform(tokens, x ->
           (CAST(x AS BIGINT) * 2654435761) % 4294967296) AS mixed
  FROM docs
),
sh AS (SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM mix)"""


def _minhash_sql() -> str:
    # MinHash components joined with the per-doc SimHash (merged gate)
    return f"""
{_minhash_sigs_cte()},
{_simhash_cte().strip()}
SELECT s.doc_id,
       CAST(generate_subscripts(signature, 1) - 1 AS INT) AS h_idx,
       unnest(signature) AS sig,
       sh.simhash
FROM sigs s JOIN sh USING (doc_id)
"""


def _lsh_pairs_sql(n_bands: int = 4) -> str:
    rows = _MINHASH_N // n_bands
    return f"""
{_minhash_sigs_cte()},
banded AS (
  SELECT doc_id, CAST(bd.band AS INT) AS band,
         signature[bd.band * {rows} + 1 : bd.band * {rows} + {rows}]
           AS band_sig
  FROM sigs, (SELECT unnest(range(0, {n_bands})) AS band) bd
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
"""


def _dup_clusters_sql(n_bands: int = 4) -> str:
    """Recursive-reachability re-derivation of the dedup-resolution
    gate: banded MinHash pairs -> undirected edges -> per-node min
    reachable id (= the component id the Spark min-label propagation
    converges to) -> per-cluster canonical pick."""
    rows = _MINHASH_N // n_bands
    cte = _minhash_sigs_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""
{cte},
banded AS (
  SELECT doc_id, CAST(bd.band AS INT) AS band,
         signature[bd.band * {rows} + 1 : bd.band * {rows} + {rows}]
           AS band_sig
  FROM sigs, (SELECT unnest(range(0, {n_bands})) AS band) bd
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
verdict AS (
  SELECT d.doc_id, d.n_tok,
         COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM docs d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       CAST(CASE WHEN row_number() OVER (
              PARTITION BY cluster_id
              ORDER BY n_tok DESC, doc_id ASC) = 1
            THEN 1 ELSE 0 END AS INT) AS keep
FROM verdict
"""


def _exact_double(v: float) -> str:
    """A DuckDB expression evaluating to EXACTLY the float64 ``v``.
    Plain decimal literals are parsed through DECIMAL (measured: only
    1/3072 repr() literals survive bit-exact in DuckDB 1.0.0, and
    ~20% are 1 ulp off even inside a ::DOUBLE[][] cast), so encode as
    mantissa * 2^exp instead: the <=53-bit integer mantissa casts
    exactly and pow(2.0, e) is a power of two — the product is a pure
    exponent shift, no rounding (verified 3072/3072 exact)."""
    import math
    m, e = math.frexp(float(v))
    return f"(CAST({int(m * (1 << 53))} AS DOUBLE) * pow(2.0, {e - 53}))"


def _planes_literal(planes) -> str:
    """Hyperplane matrix as a DuckDB DOUBLE[][] expression whose
    values are bit-identical to the seeded-rng planes the Spark
    workers derive (see ``_exact_double``) — a 1-ulp plane
    perturbation could flip a bucket sign for an embedding whose
    projection lands within summation error of zero."""
    return ("[" + ",".join(
        "[" + ",".join(_exact_double(v) for v in row) + "]"
        for row in planes) + "]")


_EMB_DIM = 64  # embeddings.parquet dimension at every generated SF


def _lsh_sims_cte(n_planes: int = 4, seed: int = 11) -> str:
    """WITH ... sims fragment: LSH-ANN mining + scoring in DuckDB —
    the seeded hyperplanes embedded as literals, buckets re-derived as
    sign sums, the multi-probe set {bucket} U {bucket XOR (1<<b)},
    candidates re-scored with exact cosine (sign convention matches
    lsh_bucket_stage: strictly > 0; signs are scale-invariant so raw
    embeddings stand in for the normalized queries). Shared by the
    ann_rerank (threshold cut) and ann_lsh (rank cut) oracles."""
    from apollon_spark.ml.simsearch import hyperplanes
    pls = _planes_literal(hyperplanes(_EMB_DIM, n_planes, seed))
    rng = f"range(1,{_EMB_DIM + 1})"
    bucket = " + ".join(
        f"(CASE WHEN list_sum(list_transform({rng}, i -> "
        f"CAST(e[i] AS DOUBLE) * pl[{p + 1}][i])) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes))
    probe_list = ", ".join(
        ["qb"] + [f"xor(qb, {1 << b})" for b in range(n_planes)])
    return f"""
WITH pl_t AS (SELECT {pls}::DOUBLE[][] AS pl),
b AS (
  SELECT CAST(vec_id AS BIGINT) AS id, embedding AS e,
         {bucket} AS bucket
  FROM embeddings, pl_t
),
q AS (SELECT id AS q_id, e AS qe, bucket AS qb FROM b WHERE id < 3),
probes AS (
  SELECT q_id, qe, unnest([{probe_list}]) AS pb FROM q
),
cand AS (
  SELECT p.q_id, b.id, p.qe, b.e FROM probes p JOIN b ON b.bucket = p.pb
),
sims AS (
  SELECT q_id, id,
     list_sum(list_transform({rng}, i -> CAST(qe[i] AS DOUBLE) * e[i]))
     / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * x)))
        * sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x))))
       AS sim
  FROM cand
)"""


def _battery_time_sql() -> str:
    """Time-domain battery columns (energy/rms/spl) for framing 32/16
    with extend+pad (segment.py:189-219 count formula): the oracle for
    BOTH battery_time (fast path) and features_split (halo-split path)
    — pytest proves split == unsplit bit-equal, so one SQL covers
    both pipelines' value semantics."""
    return f"""
{_WF},
meta AS (
  SELECT doc_id,
         CAST((n_tok + 32 + ((((-(n_tok - 32)) % 16) + 16) % 16 % 32) - 16)
              // 16 AS BIGINT) AS n_segs
  FROM docs WHERE n_tok >= 32
),
segs AS (
  SELECT doc_id, unnest(range(0, n_segs)) AS seg_idx FROM meta
),
agg AS (
  SELECT s.doc_id, CAST(s.seg_idx AS INT) AS seg_idx,
         CAST(s.seg_idx * 16 AS BIGINT) AS center,
         coalesce(sum(CAST(f.token AS DOUBLE) * f.token), 0.0) AS energy
  FROM segs s LEFT JOIN frames f
    ON f.doc_id = s.doc_id
   AND f.position >= s.seg_idx * 16 - 16 AND f.position < s.seg_idx * 16 + 16
  GROUP BY s.doc_id, s.seg_idx
)
SELECT doc_id, seg_idx, center,
       round(energy, 6) AS energy,
       round(sqrt(energy / 32), 6) AS rms,
       round(CASE WHEN energy > 0
                  THEN 20 * log10(sqrt(energy / 32) / 2e-5)
                  ELSE 0.0 END, 6) AS spl
FROM agg
"""


def _nonlinear_sql(wlen: int = 10, n_delay: int = 5) -> str:
    """nonlinear oracle: windowed correlogram (sliding window means /
    centered sum-of-squares / lagged covariances as bounded
    list_transform sums — wlen=10 keeps each term a 10-element fold),
    acf lag-1 as the EXACT integer ratio sum(x_t*x_{t+1})/sum(x_t^2)
    (the engine's FFT acf differs by ~1e-12, absorbed by the 6dp
    rounding both sides apply), and first-negative-lag via exact
    integer lag sums. O(n_tok * wlen * n_delay) per doc plus one
    O(n_tok^2) sign scan — gate-scale docs are <= 99 tokens."""
    return f"""
WITH {DUCKDB_DOCS_CTE.strip()},
d AS (SELECT doc_id, tokens, n_tok FROM docs WHERE n_tok >= 64),
w AS (
  SELECT doc_id, tokens, n_tok,
         CAST(unnest(range(n_tok - {wlen} + 1)) AS INT) AS t
  FROM d
),
ws AS (
  SELECT doc_id, n_tok, t,
         list_sum(list_transform(range({wlen}),
             i -> CAST(tokens[t + i + 1] AS DOUBLE))) / {wlen} AS m
  FROM w
),
ws2 AS (
  SELECT w.doc_id, w.n_tok, w.t, s.m,
         list_sum(list_transform(range({wlen}),
             i -> (CAST(w.tokens[w.t + i + 1] AS DOUBLE) - s.m)
                  * (CAST(w.tokens[w.t + i + 1] AS DOUBLE) - s.m))) AS ss
  FROM w JOIN ws s ON s.doc_id = w.doc_id AND s.t = w.t
),
pairs AS (
  SELECT w.doc_id, w.t, dd.d, b.ss AS ss1, l.ss AS ss2,
         list_sum(list_transform(range({wlen}),
             i -> (CAST(w.tokens[w.t + i + 1] AS DOUBLE) - b.m)
                  * (CAST(w.tokens[w.t + dd.d + i + 1] AS DOUBLE) - l.m)))
           AS cov
  FROM w
  CROSS JOIN (SELECT unnest(range(1, {n_delay})) AS d) dd
  JOIN ws2 b ON b.doc_id = w.doc_id AND b.t = w.t
  JOIN ws2 l ON l.doc_id = w.doc_id AND l.t = w.t + dd.d
  WHERE w.t < w.n_tok - {wlen} - {n_delay}
),
corr AS (
  SELECT doc_id,
         sum(pow(greatest(CASE WHEN sqrt(ss1 * ss2) > 0
                               THEN cov / sqrt(ss1 * ss2)
                               ELSE 0.0 END, 0.0), 4))
           / count(*) AS correlogram
  FROM pairs GROUP BY doc_id
),
acf1 AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(n_tok),
              i -> CAST(tokens[i + 1] AS BIGINT) * tokens[i + 1]))
           AS DOUBLE) AS s0,
         CAST(list_sum(list_transform(range(n_tok - 1),
              i -> CAST(tokens[i + 1] AS BIGINT) * tokens[i + 2]))
           AS DOUBLE) AS s1
  FROM d
),
neg AS (
  SELECT x.doc_id, min(x.k) AS min_lag
  FROM (
    SELECT d.doc_id, CAST(unnest(range(1, d.n_tok)) AS INT) AS k,
           d.tokens, d.n_tok
    FROM d
  ) x
  WHERE list_sum(list_transform(range(x.n_tok - x.k),
          i -> CAST(x.tokens[i + 1] AS BIGINT) * x.tokens[i + x.k + 1])) < 0
  GROUP BY x.doc_id
)
SELECT c.doc_id,
       round(c.correlogram, 6) AS correlogram,
       round(CASE WHEN a.s0 = 0 THEN 0.0 ELSE a.s1 / a.s0 END, 6) AS acf_lag1,
       CAST(coalesce(n.min_lag, -1) AS INT) AS acf_min_lag
FROM corr c
JOIN acf1 a USING (doc_id)
LEFT JOIN neg n USING (doc_id)
"""


def _dft_grad_ctes(n: int, hop: int) -> str:
    """The literal-DFT CTE block SHARED by _features_battery_sql and
    _onsets_sql: segs (frame index explosion off a prior ``meta`` CTE
    carrying (doc_id, tokens, n_tok, n_segs)), the mantissa-exact
    hamming-DFT ``basis`` VALUES table at size ``n``, the windowed
    matmul ``spec``, normalized magnitudes ``mag``, and np.gradient's
    edge-stencil ``grad``. Parameterized here ONCE so a fix to the
    framing arithmetic or the basis literal format cannot desync the
    two oracles (they share these semantics by construction; only
    their ``meta`` n_segs formula and flux projection differ)."""
    import math

    import numpy as np

    from apollon_spark.functions.windows import get_window
    nbins = n // 2 + 1
    win = get_window("hamming", n)
    norm_c = _exact_double(math.sqrt(win.sum() ** 2))
    ang = 2.0 * np.pi * np.outer(np.arange(nbins), np.arange(n)) / n
    wc = np.cos(ang) * win
    ws = np.sin(ang) * win
    basis = ",".join(
        f"({k},{t},{_exact_double(wc[k, t])},{_exact_double(ws[k, t])})"
        for k in range(nbins) for t in range(n))
    return f"""segs AS (
  SELECT doc_id, tokens, n_tok, n_segs,
         CAST(unnest(range(n_segs)) AS INT) AS s
  FROM meta
),
basis(k, t, wc, ws) AS (VALUES {basis}),
spec AS (
  SELECT g.doc_id, g.s, g.n_segs, b.k,
         sum(CASE WHEN {hop}*g.s - {hop} + b.t BETWEEN 0 AND g.n_tok - 1
                  THEN CAST(g.tokens[{hop}*g.s - {hop} + b.t + 1] AS DOUBLE)
                  ELSE 0.0 END * b.wc) AS re,
         sum(CASE WHEN {hop}*g.s - {hop} + b.t BETWEEN 0 AND g.n_tok - 1
                  THEN CAST(g.tokens[{hop}*g.s - {hop} + b.t + 1] AS DOUBLE)
                  ELSE 0.0 END * b.ws) AS im
  FROM segs g CROSS JOIN basis b
  GROUP BY g.doc_id, g.s, g.n_segs, b.k
),
mag AS (
  SELECT doc_id, s, n_segs, k,
         sqrt((re/{norm_c}*2)*(re/{norm_c}*2)
              + (im/{norm_c}*2)*(im/{norm_c}*2)) AS m
  FROM spec
),
grad AS (
  SELECT doc_id, s, n_segs,
         CASE WHEN s = 0 THEN lead(m) OVER wk - m
              WHEN s = n_segs - 1 THEN m - lag(m) OVER wk
              ELSE (lead(m) OVER wk - lag(m) OVER wk) / 2.0 END AS gr
  FROM mag
  WINDOW wk AS (PARTITION BY doc_id, k ORDER BY s)
)"""


def _features_battery_sql() -> str:
    """features_battery oracle: the FULL spectral battery replayed in
    SQL at framing 32/16. Build-time numpy precomputes every constant
    matrix as mantissa-exact literals — the 17x32 windowed DFT basis
    (the onsets-gate device at battery size), the rfftfreq axis, the
    NONZERO entries of the 24x17 Bark triangular bank
    (critical_bands.py:68-91) and the z·max(1, 0.066·e^0.171z)
    sharpness weights (critical_bands.py:94-124) — so the only runtime
    cross-engine math is +,*,/ ,sqrt,log10,pow. Semantics replayed
    exactly: power_distr's zero-total->1 guard, the spread=0->sigma=1
    moment guard, np.gradient's one-sided flux edges per doc, fspl's
    max(1,·) floor, cb_level's 10e-12 ref, loud_part's eps floor over
    ALL 24 bands (the 6 all-zero high bands each contribute eps), and
    sharpness' whole-doc scalar denominator as a partition sum. Both
    sides round to 6 decimals, absorbing the ~1-ulp FFT-vs-basis and
    libm drift (verified value-exact at sf0.001/0.01/0.1)."""
    import numpy as np

    from apollon_spark.functions import kernels as K
    n, hop, fps = 32, 16, 9000
    nbins = n // 2 + 1
    frqs = K.rfftfreq(n, fps)
    bank = K.bark_filter_bank(frqs)
    frq_lits = ",".join(f"({k},{_exact_double(frqs[k])})"
                        for k in range(nbins))
    bankw = ",".join(f"({b},{k},{_exact_double(bank[b, k])})"
                     for b in range(24) for k in range(nbins)
                     if bank[b, k] != 0.0)
    z = np.arange(1, 25, dtype="float64")
    zw = z * np.maximum(1.0, 0.066 * np.exp(0.171 * z))
    bands = ",".join(f"({b},{_exact_double(zw[b])})" for b in range(24))
    eps = _exact_double(float(np.finfo("float64").eps))
    ref = _exact_double(10e-12)
    splref = _exact_double(2e-5)
    return f"""
WITH {DUCKDB_DOCS_CTE.strip()},
meta AS (
  SELECT doc_id, tokens, n_tok,
         CAST((n_tok + {n} + ((({n} - n_tok) % {hop} + {hop}) % {hop} % {n})
               - {hop}) // {hop} AS INT) AS n_segs
  FROM docs WHERE n_tok >= {n}
),
{_dft_grad_ctes(n, hop)},
frq(k, f) AS (VALUES {frq_lits}),
bankw(b, k, w) AS (VALUES {bankw}),
bands(b, zw) AS (VALUES {bands}),
tdom AS (
  SELECT doc_id, s, n_segs,
         CAST(list_sum(list_transform(range({n}), t ->
           CASE WHEN {hop}*s - {hop} + t BETWEEN 0 AND n_tok - 1
                THEN CAST(tokens[{hop}*s - {hop} + t + 1] AS BIGINT)
                     * tokens[{hop}*s - {hop} + t + 1]
                ELSE 0 END)) AS DOUBLE) AS energy
  FROM segs
),
mtot AS (
  SELECT doc_id, s, n_segs,
         CASE WHEN sum(m) = 0 THEN 1.0 ELSE sum(m) END AS tot,
         sum((m/{splref})*(m/{splref})) AS pw
  FROM mag GROUP BY doc_id, s, n_segs
),
cen0 AS (
  SELECT m.doc_id, m.s, sum(f.f * m.m / t.tot) AS centroid
  FROM mag m JOIN frq f USING (k)
  JOIN mtot t ON t.doc_id = m.doc_id AND t.s = m.s
  GROUP BY m.doc_id, m.s
),
cen AS (
  SELECT m.doc_id, m.s, c0.centroid,
         sqrt(sum((f.f - c0.centroid) * (f.f - c0.centroid)
                  * m.m / t.tot)) AS spread
  FROM mag m JOIN frq f USING (k)
  JOIN mtot t ON t.doc_id = m.doc_id AND t.s = m.s
  JOIN cen0 c0 ON c0.doc_id = m.doc_id AND c0.s = m.s
  GROUP BY m.doc_id, m.s, c0.centroid
),
moments AS (
  SELECT m.doc_id, m.s, c.centroid, c.spread,
         sum(pow((f.f - c.centroid)
                 / (CASE WHEN c.spread = 0 THEN 1.0 ELSE c.spread END), 3)
             * m.m / t.tot) AS skewness,
         sum(pow((f.f - c.centroid)
                 / (CASE WHEN c.spread = 0 THEN 1.0 ELSE c.spread END), 4)
             * m.m / t.tot) AS kurtosis
  FROM mag m JOIN frq f USING (k)
  JOIN mtot t ON t.doc_id = m.doc_id AND t.s = m.s
  JOIN cen c ON c.doc_id = m.doc_id AND c.s = m.s
  GROUP BY m.doc_id, m.s, c.centroid, c.spread
),
flux AS (
  SELECT doc_id, s, sum(greatest(gr, 0.0)) AS flux
  FROM grad GROUP BY doc_id, s
),
cbr AS (
  SELECT m.doc_id, m.s, bw.b, sum(m.m * bw.w) AS cbr
  FROM mag m JOIN bankw bw USING (k)
  GROUP BY m.doc_id, m.s, bw.b
),
cball AS (
  SELECT ds.doc_id, ds.s, bd.b, bd.zw, coalesce(c.cbr, 0.0) AS cbr,
         pow(10.0 * log10(greatest(coalesce(c.cbr, 0.0), {ref}) / {ref}),
             0.23) AS ls
  FROM (SELECT DISTINCT doc_id, s FROM segs) ds
  CROSS JOIN bands bd
  LEFT JOIN cbr c ON c.doc_id = ds.doc_id AND c.s = ds.s AND c.b = bd.b
),
loud AS (
  SELECT doc_id, s,
         sum(ls) AS loudness,
         sum(cbr * zw) AS sharp_num,
         sum(greatest(ls, {eps})) AS loud_part
  FROM cball GROUP BY doc_id, s
),
sharp AS (
  SELECT doc_id, s, loudness,
         sharp_num / sum(loud_part) OVER (PARTITION BY doc_id) AS sharpness
  FROM loud
)
SELECT t.doc_id, t.s AS seg_idx,
       CAST({hop} * t.s AS BIGINT) AS center,
       CAST({hop} * t.s AS BIGINT) / {fps}.0 AS ts,
       round(t.energy, 6) + 0.0 AS energy,
       round(sqrt(t.energy / {n}), 6) + 0.0 AS rms,
       round(CASE WHEN t.energy > 0
                  THEN 20 * log10(sqrt(t.energy / {n}) / {splref})
                  ELSE 0.0 END, 6) + 0.0 AS spl,
       round(mo.centroid, 6) + 0.0 AS centroid,
       round(mo.spread, 6) + 0.0 AS spread,
       round(mo.skewness, 6) + 0.0 AS skewness,
       round(mo.kurtosis, 6) + 0.0 AS kurtosis,
       round(fl.flux, 6) + 0.0 AS flux,
       round(10.0 * log10(greatest(1.0, mt.pw)), 6) + 0.0 AS fspl,
       round(sh.loudness, 6) + 0.0 AS loudness,
       round(sh.sharpness, 6) + 0.0 AS sharpness
FROM tdom t
JOIN moments mo ON mo.doc_id = t.doc_id AND mo.s = t.s
JOIN flux fl ON fl.doc_id = t.doc_id AND fl.s = t.s
JOIN mtot mt ON mt.doc_id = t.doc_id AND mt.s = t.s
JOIN sharp sh ON sh.doc_id = t.doc_id AND sh.s = t.s
"""


def _ann_rerank_sql(n_planes: int = 4, seed: int = 11,
                    thr: float = 0.2) -> str:
    return f"""
{_lsh_sims_cte(n_planes, seed)}
SELECT q_id, id, round(sim, 6) AS sim FROM sims
WHERE sim >= {thr} AND abs(sim - {thr}) > 1e-4
"""


def _ann_lsh_sql(n_planes: int = 4, seed: int = 11, k: int = 5) -> str:
    """ann_lsh oracle: same mining + scoring as ann_rerank, cut by
    row_number over the ROUNDED sim (deterministic cross-engine sort
    key; matches the gate's window exactly)."""
    return f"""
{_lsh_sims_cte(n_planes, seed)}
SELECT q_id, CAST(rank AS INT) AS rank, id, sim FROM (
  SELECT q_id, id, round(sim, 6) AS sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round(sim, 6) DESC, id) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def _peak_scan_sql() -> str:
    """peak_scan oracle: the FilterPeakPicker scan replayed in SQL.
    Conds 1-2 (clip-indexed window max / mean+delta, reference
    onsets.py:246-248) as window functions — max over the truncated
    window equals the edge-padded max (the repeats are duplicates of
    in-window values), and the edge-padded MEAN is reconstructed
    exactly by adding the missing repeat counts times the edge values
    before the single division. Cond 3's recursive smoother
    g[n+1]=max(v, αg+(1−α)v) (onsets.py:255-256) is a recursive CTE
    stepping win_id in lockstep across all docs. Energies are
    integer-valued doubles (< 2^53), so every sum is exact and the
    comparisons are bit-stable cross-engine."""
    w, nb, na = _PEAK_WIN, _PEAK_NB, _PEAK_NA
    width = nb + na + 1
    return f"""
WITH RECURSIVE {DUCKDB_DOCS_CTE.strip()}, {DUCKDB_FRAMES_CTE.strip()},
vals AS (
  SELECT doc_id, CAST(position // {w} AS INT) AS win_id,
         CAST(sum(CAST(token AS BIGINT) * token) AS DOUBLE) AS value
  FROM frames GROUP BY doc_id, position // {w}
),
stats AS (
  SELECT doc_id, win_id, value,
         count(*) OVER (PARTITION BY doc_id) AS n,
         max(value) OVER w5 AS wmax,
         sum(value) OVER w5 AS wsum,
         first_value(value) OVER (PARTITION BY doc_id ORDER BY win_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vfirst,
         last_value(value) OVER (PARTITION BY doc_id ORDER BY win_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vlast
  FROM vals
  WINDOW w5 AS (PARTITION BY doc_id ORDER BY win_id
                ROWS BETWEEN {nb} PRECEDING AND {na} FOLLOWING)
),
c12 AS (
  SELECT doc_id, win_id, value,
         CASE WHEN value >= wmax AND value >=
           ((wsum + greatest(0, {nb} - win_id) * vfirst
                  + greatest(0, {na} - (n - 1 - win_id)) * vlast)
            / {width}.0) + {_PEAK_DELTA}
         THEN 1 ELSE 0 END AS cond12
  FROM stats
),
scan AS (
  SELECT doc_id, win_id, value,
         greatest(value,
           {_PEAK_ALPHA}*CAST(0.0 AS DOUBLE)
           + {1 - _PEAK_ALPHA}*value) AS g,
         CASE WHEN value >= greatest(value,
           {_PEAK_ALPHA}*CAST(0.0 AS DOUBLE)
           + {1 - _PEAK_ALPHA}*value) THEN 1 ELSE 0 END AS cond3
  FROM vals WHERE win_id = 0
  UNION ALL
  SELECT v.doc_id, v.win_id, v.value,
         greatest(v.value,
           {_PEAK_ALPHA}*s.g + {1 - _PEAK_ALPHA}*v.value) AS g,
         CASE WHEN v.value >= greatest(v.value,
           {_PEAK_ALPHA}*s.g + {1 - _PEAK_ALPHA}*v.value)
              THEN 1 ELSE 0 END AS cond3
  FROM scan s JOIN vals v ON v.doc_id = s.doc_id AND v.win_id = s.win_id + 1
)
SELECT c.doc_id, c.win_id, c.value,
       CAST(c.cond12 AS INT) AS cond12, CAST(s.cond3 AS INT) AS cond3,
       CAST(c.cond12 * s.cond3 AS INT) AS is_peak
FROM c12 c JOIN scan s ON s.doc_id = c.doc_id AND s.win_id = c.win_id
"""


def _onsets_sql() -> str:
    """onsets oracle: the fused flux onset detector replayed end-to-end
    in SQL. Framing (extend x pad, segment.py:207-216 semantics) is the
    closed-form n_segs/center arithmetic; the 16-point hamming rfft is
    a 144-row literal basis table (window·cos / window·sin products as
    mantissa·2^exp exact doubles — the same device as hmm_estep's
    emission table, applied to the DFT matrix); np.gradient spectral
    flux (features.py:280-305) is lead/lag window SQL with the one-
    sided edge stencils; the per-doc mean floor is greatest(flux, avg
    over doc); the FilterPeakPicker scan reuses _peak_scan_sql's
    edge-corrected window conds + recursive-CTE smoother. Output
    (doc_id, frame, time) is integer-derived — frame = hop·win_id and
    time = frame/fps are bit-identical cross-engine — so the ~1-ulp
    FFT-vs-basis-matmul drift in float intermediates cannot reach the
    hash: a flip would need two UNRELATED float comparisons within one
    ulp (verified tuple-exact at sf0.001/0.01/0.1)."""
    n, hop = _ONS_N, _ONS_HOP
    nb, na = _ONS_NB, _ONS_NA
    a = _exact_double(_ONS_ALPHA)
    b = _exact_double(1.0 - _ONS_ALPHA)
    d = _exact_double(_ONS_DELTA)
    return f"""
WITH RECURSIVE {DUCKDB_DOCS_CTE.strip()},
meta AS (
  SELECT doc_id, tokens, n_tok,
         CAST((n_tok + {hop} + (({n} - n_tok) % {hop} + {hop}) % {hop})
              // {hop} AS INT) AS n_segs
  FROM docs WHERE n_tok >= 32
),
{_dft_grad_ctes(n, hop)},
flux AS (
  SELECT doc_id, s, n_segs, sum(greatest(gr, 0.0)) AS fx
  FROM grad GROUP BY doc_id, s, n_segs
),
vals AS (
  SELECT doc_id, s AS win_id, n_segs AS n,
         greatest(fx, avg(fx) OVER (PARTITION BY doc_id)) AS value
  FROM flux
),
stats AS (
  SELECT doc_id, win_id, n, value,
         max(value) OVER w5 AS wmax,
         sum(value) OVER w5 AS wsum,
         first_value(value) OVER (PARTITION BY doc_id ORDER BY win_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vfirst,
         last_value(value) OVER (PARTITION BY doc_id ORDER BY win_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS vlast
  FROM vals
  WINDOW w5 AS (PARTITION BY doc_id ORDER BY win_id
                ROWS BETWEEN {nb} PRECEDING AND {na} FOLLOWING)
),
c12 AS (
  SELECT doc_id, win_id,
         CASE WHEN value >= wmax AND value >=
           ((wsum + greatest(0, {nb} - win_id) * vfirst
                  + greatest(0, {na} - (n - 1 - win_id)) * vlast)
            / {nb + na + 1}.0) + {d}
         THEN 1 ELSE 0 END AS cond12
  FROM stats
),
scan AS (
  SELECT doc_id, win_id, value,
         greatest(value, {a}*CAST(0.0 AS DOUBLE) + {b}*value) AS g,
         CASE WHEN value >= greatest(value,
           {a}*CAST(0.0 AS DOUBLE) + {b}*value) THEN 1 ELSE 0 END AS cond3
  FROM vals WHERE win_id = 0
  UNION ALL
  SELECT v.doc_id, v.win_id, v.value,
         greatest(v.value, {a}*sc.g + {b}*v.value) AS g,
         CASE WHEN v.value >= greatest(v.value, {a}*sc.g + {b}*v.value)
              THEN 1 ELSE 0 END AS cond3
  FROM scan sc JOIN vals v ON v.doc_id = sc.doc_id
                          AND v.win_id = sc.win_id + 1
)
SELECT c.doc_id,
       CAST({hop} * c.win_id AS BIGINT) AS frame,
       CAST({hop} * c.win_id AS BIGINT) / {_ONS_FPS}.0 AS time
FROM c12 c JOIN scan s ON s.doc_id = c.doc_id AND s.win_id = c.win_id
WHERE c.cond12 = 1 AND s.cond3 = 1
"""


def _hmm_iter1_ctes() -> str:
    """The SHARED iteration-1 EM CTE block (docs -> window table ->
    literal emission join -> fwd/bwd recursions -> posteriors -> ξ
    sums -> per-doc M-step update), used by BOTH _hmm_estep_sql (the
    per-(doc,t) E-step gate) and _hmm_em2_sql (the 2-iteration
    training unroll). Emission tables are mantissa·2^exp literals of
    the SAME float64s the Spark workers look up, fwd/bwd replay
    ``estep_posteriors_m2``'s exact IEEE operation order, and ``upd1``
    carries the full unrounded iteration-1 update (λ',Γ',δ',ll).

    MATERIALIZED matters: DuckDB inlines CTEs by default, so a
    recursive CTE referenced inside ANOTHER recursion (bwd joins fwd
    every iteration) is recomputed from scratch each iteration —
    quadratic in max doc length and ~340x slower at sf0.01 (180s vs
    0.5s measured). xb is pinned before the recursions and fwd/bwd
    get materialized snapshots (fwdm/bwdm) that all downstream
    consumers read."""
    from apollon_spark.hmm import estep_b_table, estep_bmax_table
    btab = estep_b_table(_ESTEP_LAM)
    bmax_tab = estep_bmax_table(_ESTEP_LAM)
    bvals = ",".join(
        f"({x}, {_exact_double(btab[x, 0])}, {_exact_double(btab[x, 1])},"
        f" {_exact_double(bmax_tab[x])})"
        for x in range(btab.shape[0]))
    (g00, g01), (g10, g11) = (
        (_exact_double(v) for v in row) for row in _ESTEP_GAMMA)
    d0, d1 = (_exact_double(v) for v in _ESTEP_DELTA)
    return f"""{DUCKDB_DOCS_CTE.strip()},
xs AS (
  SELECT doc_id, CAST(generate_subscripts(tokens,1)-1 AS INT) AS t,
         unnest(tokens) AS x, n_tok
  FROM docs WHERE n_tok >= 2
),
btab(x, b0, b1, bm) AS (VALUES {bvals}),
xb AS MATERIALIZED (
  SELECT xs.doc_id, xs.t, xs.n_tok, xs.x, b.b0, b.b1, b.bm
  FROM xs JOIN btab b USING (x)),
fwd AS (
  SELECT doc_id, t,
         ({d0}*b0)+({d1}*b1) AS c,
         ({d0}*b0)/(({d0}*b0)+({d1}*b1)) AS a0,
         ({d1}*b1)/(({d0}*b0)+({d1}*b1)) AS a1
  FROM xb WHERE t = 0
  UNION ALL
  SELECT x.doc_id, x.t,
         ((f.a0*{g00} + f.a1*{g10})*x.b0)
           + ((f.a0*{g01} + f.a1*{g11})*x.b1) AS c,
         ((f.a0*{g00} + f.a1*{g10})*x.b0)
           / (((f.a0*{g00} + f.a1*{g10})*x.b0)
              + ((f.a0*{g01} + f.a1*{g11})*x.b1)) AS a0,
         ((f.a0*{g01} + f.a1*{g11})*x.b1)
           / (((f.a0*{g00} + f.a1*{g10})*x.b0)
              + ((f.a0*{g01} + f.a1*{g11})*x.b1)) AS a1
  FROM fwd f JOIN xb x ON x.doc_id = f.doc_id AND x.t = f.t + 1
),
fwdm AS MATERIALIZED (SELECT * FROM fwd),
bwd AS (
  SELECT doc_id, t, 1.0::DOUBLE AS be0, 1.0::DOUBLE AS be1
  FROM xs WHERE t = n_tok - 1
  UNION ALL
  SELECT bw.doc_id, bw.t - 1,
         ({g00}*(x.b0*bw.be0) + {g01}*(x.b1*bw.be1)) / f.c AS be0,
         ({g10}*(x.b0*bw.be0) + {g11}*(x.b1*bw.be1)) / f.c AS be1
  FROM bwd bw
  JOIN xb x ON x.doc_id = bw.doc_id AND x.t = bw.t
  JOIN fwdm f ON f.doc_id = bw.doc_id AND f.t = bw.t
  WHERE bw.t > 0
),
bwdm AS MATERIALIZED (SELECT * FROM bwd),
posts AS MATERIALIZED (
  SELECT f.doc_id, f.t, f.a0, f.a1, f.c, b.be0, b.be1,
         (f.a0*b.be0)/((f.a0*b.be0)+(f.a1*b.be1)) AS post0,
         (f.a1*b.be1)/((f.a0*b.be0)+(f.a1*b.be1)) AS post1
  FROM fwdm f JOIN bwdm b ON b.doc_id = f.doc_id AND b.t = f.t
),
trans AS (
  -- xi transition sums S_ij = sum_t a_i[t] * (b_j[t+1]*be_j[t+1]/c[t+1])
  SELECT f.doc_id,
         sum(f.a0 * (x2.b0 * p2.be0 / p2.c)) AS s00,
         sum(f.a0 * (x2.b1 * p2.be1 / p2.c)) AS s01,
         sum(f.a1 * (x2.b0 * p2.be0 / p2.c)) AS s10,
         sum(f.a1 * (x2.b1 * p2.be1 / p2.c)) AS s11
  FROM fwdm f
  JOIN xb x2 ON x2.doc_id = f.doc_id AND x2.t = f.t + 1
  JOIN posts p2 ON p2.doc_id = f.doc_id AND p2.t = f.t + 1
  GROUP BY f.doc_id
),
upd AS (
  SELECT p.doc_id,
         sum(p.post0 * x.x) / greatest(sum(p.post0), 1e-300) AS lam0_next,
         sum(p.post1 * x.x) / greatest(sum(p.post1), 1e-300) AS lam1_next,
         max(CASE WHEN p.t = 0 THEN p.post0 END) AS delta0_next,
         max(CASE WHEN p.t = 0 THEN p.post1 END) AS delta1_next,
         sum(ln(p.c)) + sum(x.bm) AS ll
  FROM posts p JOIN xb x ON x.doc_id = p.doc_id AND x.t = p.t
  GROUP BY p.doc_id
),
upd1 AS MATERIALIZED (
  SELECT u.doc_id, u.lam0_next, u.lam1_next,
         ({g00}*t2.s00) / (({g00}*t2.s00) + ({g01}*t2.s01)) AS g00_next,
         ({g01}*t2.s01) / (({g00}*t2.s00) + ({g01}*t2.s01)) AS g01_next,
         ({g10}*t2.s10) / (({g10}*t2.s10) + ({g11}*t2.s11)) AS g10_next,
         ({g11}*t2.s11) / (({g10}*t2.s10) + ({g11}*t2.s11)) AS g11_next,
         u.delta0_next, u.delta1_next, u.ll
  FROM upd u JOIN trans t2 ON t2.doc_id = u.doc_id
)"""


def _hmm_estep_sql() -> str:
    """hmm_estep oracle: ONE FULL EM iteration on fixed (λ,Γ,δ)
    replayed in SQL — see ``_hmm_iter1_ctes`` for the device (literal
    emission tables, exact-IEEE-order recursions, materialization
    discipline). Everything rounds to 6 decimals on both sides (the
    only runtime cross-engine math is +,*,/ and ln)."""
    return f"""
WITH RECURSIVE {_hmm_iter1_ctes()}
SELECT p.doc_id, p.t,
       round(p.a0, 6) AS alpha0,
       round(p.c, 6) AS cscale,
       round(p.post0, 6) AS post0,
       round(p.post1, 6) AS post1,
       round(u.lam0_next, 6) AS lam0_next,
       round(u.lam1_next, 6) AS lam1_next,
       round(u.g00_next, 6) AS g00_next,
       round(u.g01_next, 6) AS g01_next,
       round(u.g10_next, 6) AS g10_next,
       round(u.g11_next, 6) AS g11_next,
       round(u.delta0_next, 6) AS delta0_next,
       round(u.delta1_next, 6) AS delta1_next,
       round(u.ll, 6) AS ll
FROM posts p
JOIN upd1 u ON u.doc_id = p.doc_id
"""


def _hmm_em2_sql() -> str:
    """hmm oracle: TWO chained EM iterations (the training unroll,
    VERDICT r04 #3). Iteration 1 is the shared ``_hmm_iter1_ctes``
    block; the handoff quantizes (λ',Γ',δ') onto the 2^-16 binary
    grid with EXACT IEEE ops (floor + power-of-two scaling — unlike
    decimal round, identical across engines), so iteration 2 starts
    from bit-identical parameters. Iteration 2's per-doc emission
    tables are built by the division recursion e(x)=e(x-1)·(λ/x)
    (so e(x)=λ^x/x! with no pow/lgamma; w=e·e^{-λ} is the true pmf,
    b=w/rowmax matches estep_b_table's normalized form and
    bm=ln(rowmax) the bmax table) — exactly the operation order of
    ``_ratio_emission_tables`` on the Spark side. The second
    forward-backward + M-step replays the same recursive-CTE shapes
    with per-doc Γ/δ carried through the recursion rows. Runtime
    cross-engine math stays {+,*,/,ln} plus one exp per (doc,
    state) of a bit-identical quantized argument.

    Division-by-zero audit (DuckDB yields NULL where IEEE yields
    NaN/Inf — the features_battery entropy divergence class): every
    scale factor c > 0 by construction (emission rows are row-max-
    normalized to 1 and the quantized Γ/δ floor at 2^-16, so each
    step's numerator has a strictly positive term); the M-step γ
    denominators need a state with zero forward mass at EVERY t,
    which requires λ' floored to 2^-16 while the doc carries large
    tokens — impossible, since λ' is that state's posterior-weighted
    token mean. No reachable 0/0 or x/0 on integer-token input."""
    return f"""
WITH RECURSIVE {_hmm_em2_ctes()}
SELECT q.doc_id, CAST(q.n_tok AS INT) AS n_tok,
       round(q.lam0_1, 6) AS lam0_1,
       round(q.lam1_1, 6) AS lam1_1,
       round(q.g00_1, 6) AS g00_1,
       round(q.g01_1, 6) AS g01_1,
       round(q.g10_1, 6) AS g10_1,
       round(q.g11_1, 6) AS g11_1,
       round(q.delta0_1, 6) AS delta0_1,
       round(q.delta1_1, 6) AS delta1_1,
       round(q.ll1, 6) AS ll_1,
       round(u.lam0_2, 6) AS lam0_2,
       round(u.lam1_2, 6) AS lam1_2,
       round(g.g00_2, 6) AS g00_2,
       round(g.g01_2, 6) AS g01_2,
       round(g.g10_2, 6) AS g10_2,
       round(g.g11_2, 6) AS g11_2,
       round(u.delta0_2, 6) AS delta0_2,
       round(u.delta1_2, 6) AS delta1_2,
       round(u.ll2, 6) AS ll_2,
       round(u.ll2 - q.ll1, 6) + 0.0 AS dll,
       CAST(abs(round(u.ll2 - q.ll1, 6) + 0.0) < 1e-5 AS INT) AS converged
FROM qe q
JOIN upd2 u ON u.doc_id = q.doc_id
JOIN u2g g ON g.doc_id = q.doc_id
"""


def _q16(col: str) -> str:
    """The SQL twin of ``hmm._quant16``: nearest-2^-16-grid rounding
    (floor + 0.5, exact IEEE ops, half-up tie rule) floored at one
    grid step."""
    return (f"greatest(floor(u.{col}*65536.0 + 0.5)/65536.0, "
            f"1.0/65536.0)")


def _hmm_em2_ctes() -> str:
    """The FULL 2-iteration CTE chain (iteration-1 block + quantized
    handoff + per-doc emission recursion + second forward-backward +
    M-step), shared by ``_hmm_em2_sql`` and ``_similarity_sql`` —
    ends with ``upd2``/``u2g`` carrying iteration-2 (λ,Γ,δ,ll) per
    doc."""
    quant = ",\n         ".join(
        f"{_q16(src)} AS {dst}"
        for src, dst in [("lam0_next", "l0"), ("lam1_next", "l1"),
                         ("g00_next", "g00q"), ("g01_next", "g01q"),
                         ("g10_next", "g10q"), ("g11_next", "g11q"),
                         ("delta0_next", "d0q"), ("delta1_next", "d1q")])
    return f"""{_hmm_iter1_ctes()},
qe AS MATERIALIZED (
  SELECT u.doc_id, m.xm, m.n_tok, u.ll AS ll1,
         u.lam0_next AS lam0_1, u.lam1_next AS lam1_1,
         u.g00_next AS g00_1, u.g01_next AS g01_1,
         u.g10_next AS g10_1, u.g11_next AS g11_1,
         u.delta0_next AS delta0_1, u.delta1_next AS delta1_1,
         {quant},
         exp(-{_q16("lam0_next")}) AS e0c,
         exp(-{_q16("lam1_next")}) AS e1c
  FROM upd1 u
  JOIN (SELECT doc_id, max(x) AS xm, max(n_tok) AS n_tok
        FROM xs GROUP BY doc_id) m ON m.doc_id = u.doc_id
),
ex AS (
  SELECT doc_id, 0 AS x, 1.0::DOUBLE AS e0, 1.0::DOUBLE AS e1, l0, l1, xm
  FROM qe
  UNION ALL
  SELECT doc_id, x + 1,
         e0 * (l0 / CAST(x + 1 AS DOUBLE)),
         e1 * (l1 / CAST(x + 1 AS DOUBLE)),
         l0, l1, xm
  FROM ex WHERE x < xm
),
b2 AS MATERIALIZED (
  SELECT e.doc_id, e.x,
         (e.e0*q.e0c)/greatest(e.e0*q.e0c, e.e1*q.e1c) AS b0,
         (e.e1*q.e1c)/greatest(e.e0*q.e0c, e.e1*q.e1c) AS b1,
         ln(greatest(e.e0*q.e0c, e.e1*q.e1c)) AS bm
  FROM ex e JOIN qe q ON q.doc_id = e.doc_id
),
xb2 AS MATERIALIZED (
  SELECT xs.doc_id, xs.t, xs.n_tok, xs.x, b.b0, b.b1, b.bm
  FROM xs JOIN b2 b ON b.doc_id = xs.doc_id AND b.x = xs.x),
fwd2 AS (
  SELECT x.doc_id, x.t,
         (q.d0q*x.b0)+(q.d1q*x.b1) AS c,
         (q.d0q*x.b0)/((q.d0q*x.b0)+(q.d1q*x.b1)) AS a0,
         (q.d1q*x.b1)/((q.d0q*x.b0)+(q.d1q*x.b1)) AS a1,
         q.g00q AS g00, q.g01q AS g01, q.g10q AS g10, q.g11q AS g11
  FROM xb2 x JOIN qe q ON q.doc_id = x.doc_id WHERE x.t = 0
  UNION ALL
  SELECT x.doc_id, x.t,
         ((f.a0*f.g00 + f.a1*f.g10)*x.b0)
           + ((f.a0*f.g01 + f.a1*f.g11)*x.b1) AS c,
         ((f.a0*f.g00 + f.a1*f.g10)*x.b0)
           / (((f.a0*f.g00 + f.a1*f.g10)*x.b0)
              + ((f.a0*f.g01 + f.a1*f.g11)*x.b1)) AS a0,
         ((f.a0*f.g01 + f.a1*f.g11)*x.b1)
           / (((f.a0*f.g00 + f.a1*f.g10)*x.b0)
              + ((f.a0*f.g01 + f.a1*f.g11)*x.b1)) AS a1,
         f.g00, f.g01, f.g10, f.g11
  FROM fwd2 f JOIN xb2 x ON x.doc_id = f.doc_id AND x.t = f.t + 1
),
fwd2m AS MATERIALIZED (SELECT * FROM fwd2),
bwd2 AS (
  SELECT x.doc_id, x.t, 1.0::DOUBLE AS be0, 1.0::DOUBLE AS be1,
         q.g00q AS g00, q.g01q AS g01, q.g10q AS g10, q.g11q AS g11
  FROM xs x JOIN qe q ON q.doc_id = x.doc_id WHERE x.t = x.n_tok - 1
  UNION ALL
  SELECT bw.doc_id, bw.t - 1,
         (bw.g00*(x.b0*bw.be0) + bw.g01*(x.b1*bw.be1)) / f.c AS be0,
         (bw.g10*(x.b0*bw.be0) + bw.g11*(x.b1*bw.be1)) / f.c AS be1,
         bw.g00, bw.g01, bw.g10, bw.g11
  FROM bwd2 bw
  JOIN xb2 x ON x.doc_id = bw.doc_id AND x.t = bw.t
  JOIN fwd2m f ON f.doc_id = bw.doc_id AND f.t = bw.t
  WHERE bw.t > 0
),
bwd2m AS MATERIALIZED (SELECT * FROM bwd2),
posts2 AS MATERIALIZED (
  SELECT f.doc_id, f.t, f.a0, f.a1, f.c, b.be0, b.be1,
         (f.a0*b.be0)/((f.a0*b.be0)+(f.a1*b.be1)) AS post0,
         (f.a1*b.be1)/((f.a0*b.be0)+(f.a1*b.be1)) AS post1
  FROM fwd2m f JOIN bwd2m b ON b.doc_id = f.doc_id AND b.t = f.t
),
trans2 AS (
  SELECT f.doc_id,
         sum(f.a0 * (x2.b0 * p2.be0 / p2.c)) AS s00,
         sum(f.a0 * (x2.b1 * p2.be1 / p2.c)) AS s01,
         sum(f.a1 * (x2.b0 * p2.be0 / p2.c)) AS s10,
         sum(f.a1 * (x2.b1 * p2.be1 / p2.c)) AS s11
  FROM fwd2m f
  JOIN xb2 x2 ON x2.doc_id = f.doc_id AND x2.t = f.t + 1
  JOIN posts2 p2 ON p2.doc_id = f.doc_id AND p2.t = f.t + 1
  GROUP BY f.doc_id
),
upd2 AS MATERIALIZED (
  SELECT p.doc_id,
         sum(p.post0 * x.x) / greatest(sum(p.post0), 1e-300) AS lam0_2,
         sum(p.post1 * x.x) / greatest(sum(p.post1), 1e-300) AS lam1_2,
         max(CASE WHEN p.t = 0 THEN p.post0 END) AS delta0_2,
         max(CASE WHEN p.t = 0 THEN p.post1 END) AS delta1_2,
         sum(ln(p.c)) + sum(x.bm) AS ll2
  FROM posts2 p JOIN xb2 x ON x.doc_id = p.doc_id AND x.t = p.t
  GROUP BY p.doc_id
),
u2g AS (
  SELECT t.doc_id,
         (q.g00q*t.s00) / ((q.g00q*t.s00) + (q.g01q*t.s01)) AS g00_2,
         (q.g01q*t.s01) / ((q.g00q*t.s00) + (q.g01q*t.s01)) AS g01_2,
         (q.g10q*t.s10) / ((q.g10q*t.s10) + (q.g11q*t.s11)) AS g10_2,
         (q.g11q*t.s11) / ((q.g10q*t.s10) + (q.g11q*t.s11)) AS g11_2
  FROM trans2 t JOIN qe q ON q.doc_id = t.doc_id
)"""



def _ivf_ann_sql(n_cents: int = 8, n_probe: int = 3, k: int = 5) -> str:
    """ivf_ann oracle: explicit centroids = the first ``n_cents``
    embedding vectors; nearest-centroid routing (argmin, ties ->
    lowest list — row_number ORDER BY d, list), per-query n_probe
    nearest lists (stable argsort convention, same tiebreak), exact
    cosine inside probed lists, rounded-sim top-k cut."""
    rng = f"range(1,{_EMB_DIM + 1})"
    d_expr = (f"list_sum(list_transform({rng}, i -> "
              f"(CAST(x[i] AS DOUBLE) - cv[i]) * "
              f"(CAST(x[i] AS DOUBLE) - cv[i])))")
    return f"""
WITH c AS (
  SELECT CAST(vec_id AS BIGINT) AS list, embedding AS cv
  FROM embeddings WHERE vec_id < {n_cents}
),
v AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding AS e FROM embeddings),
dv AS (
  SELECT v.id, c.list, {d_expr.replace('x[', 'v.e[')} AS d
  FROM v CROSS JOIN c
),
assign AS (
  SELECT id, list FROM (
    SELECT id, list,
           row_number() OVER (PARTITION BY id ORDER BY d, list) AS rn
    FROM dv) WHERE rn = 1
),
q AS (SELECT id AS q_id, e AS qe FROM v WHERE id < 3),
dq AS (
  SELECT q.q_id, c.list, {d_expr.replace('x[', 'q.qe[')} AS d
  FROM q CROSS JOIN c
),
probes AS (
  SELECT q_id, list FROM (
    SELECT q_id, list,
           row_number() OVER (PARTITION BY q_id ORDER BY d, list) AS rn
    FROM dq) WHERE rn <= {n_probe}
),
cand AS (SELECT p.q_id, a.id FROM probes p JOIN assign a USING (list)),
sims AS (
  SELECT cand.q_id, cand.id,
     list_sum(list_transform({rng}, i -> CAST(q.qe[i] AS DOUBLE) * v.e[i]))
     / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))
        * sqrt(list_sum(list_transform(v.e, x -> CAST(x AS DOUBLE) * x))))
       AS sim
  FROM cand JOIN q ON q.q_id = cand.q_id JOIN v ON v.id = cand.id
)
SELECT q_id, CAST(rank AS INT) AS rank, id, sim FROM (
  SELECT q_id, id, round(sim, 6) AS sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round(sim, 6) DESC, id) AS rank
  FROM sims
) WHERE rank <= {k}
"""


def _cosine_lsh_sql(n_planes: int = 6, n_bands: int = 8, seed: int = 11,
                    thr: float = 0.4) -> str:
    """cosine_near_dups_lsh re-derived in DuckDB: same seeded
    (n_bands*n_planes, dim) plane matrix as literals, per-band sign
    buckets (convention matches the bucketize kernel: >= 0), banded
    self-join on (band, bucket), exact cosine verify with the
    threshold-epsilon guard."""
    import numpy as np
    pl = np.random.default_rng(seed).standard_normal(
        (n_bands * n_planes, _EMB_DIM))
    pls = _planes_literal(pl)
    rng = f"range(1,{_EMB_DIM + 1})"
    bucket = " + ".join(
        f"(CASE WHEN list_sum(list_transform({rng}, i -> "
        f"CAST(e[i] AS DOUBLE) * pl[band * {n_planes} + {p + 1}][i])) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes))
    return f"""
WITH pl_t AS (SELECT {pls}::DOUBLE[][] AS pl),
v AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding AS e
      FROM embeddings),
banded AS (
  SELECT id, band, {bucket} AS bkt
  FROM v, pl_t, (SELECT unnest(range(0, {n_bands})) AS band)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bkt = b.bkt AND a.id < b.id
),
sc AS (
  SELECT p.id_a, p.id_b,
     round(list_sum(list_transform({rng}, i ->
               CAST(va.e[i] AS DOUBLE) * vb.e[i]))
     / (sqrt(list_sum(list_transform(va.e, x -> CAST(x AS DOUBLE) * x)))
        * sqrt(list_sum(list_transform(vb.e, x -> CAST(x AS DOUBLE) * x)))),
       6) AS cos_sim
  FROM pairs p JOIN v va ON va.id = p.id_a JOIN v vb ON vb.id = p.id_b
)
SELECT id_a, id_b, cos_sim FROM sc
WHERE cos_sim >= {thr} AND abs(cos_sim - {thr}) > 1e-4
"""


def _som_train_sql(n_rows: int = 4, n_cols: int = 4, n_iter: int = 2,
                   dim: int = 64) -> str:
    """The batch-SOM training recursion in DuckDB: per epoch, BMU =
    argmin_unit of the squared euclidean distance (ties -> lowest
    unit, matching cdist argmin), then every unit's new weight is the
    neighborhood-kernel-weighted mean of the data (den == 0 keeps the
    old weight, matching the np.where(mask) update). The per-epoch
    gaussian kernel matrices h[bmu, unit] depend only on the lattice
    and the radius decay schedule, so they are embedded as exact
    literals (``_exact_double``); init weights = the first n_units
    embedding rows, derived in SQL."""
    from apollon_spark.som import (SomGrid, SomParams, _decay_radius,
                                   gauss_kernel, grid_dists)
    p = SomParams(n_rows, n_cols, n_iter=n_iter)
    grid = SomGrid(n_rows, n_cols)
    gd = grid_dists(grid, "euclidean")
    n_units = grid.n_units
    rng = f"range(1,{dim + 1})"

    def h_cte(epoch: int) -> str:
        h = gauss_kernel(gd, _decay_radius(p, epoch))
        vals = ",".join(
            f"({b},{u},{_exact_double(h[b, u])})"
            for b in range(n_units) for u in range(n_units))
        return (f"h{epoch}(bmu, unit, hv) AS "
                f"(SELECT * FROM (VALUES {vals}) t(bmu, unit, hv))")

    # epoch 0 scores against the array-typed w0; later epochs against
    # the (unit, j, w) long form produced by the previous update
    parts = [h_cte(e) for e in range(n_iter)]
    parts.append(
        f"w0 AS (SELECT CAST(vec_id AS INT) AS unit, embedding AS w "
        f"FROM embeddings WHERE vec_id < {n_units})")
    parts.append(
        f"data AS (SELECT vec_id, embedding AS e FROM embeddings "
        f"WHERE vec_id >= {n_units})")
    parts.append(
        f"dims AS (SELECT CAST(unnest(range(1, {dim + 1})) AS INT) AS j)")
    parts.append(f"""
d0 AS (
  SELECT data.vec_id, w0.unit,
         list_sum(list_transform({rng}, i ->
           (CAST(e[i] AS DOUBLE) - w[i]) * (CAST(e[i] AS DOUBLE) - w[i])))
           AS d2
  FROM data, w0)""")
    for e in range(n_iter):
        prev_w = "w0.w[u.j]" if e == 0 else f"wl{e}.w"
        prev_join = ("JOIN w0 ON w0.unit = u.unit" if e == 0
                     else f"JOIN wl{e} ON wl{e}.unit = u.unit "
                          f"AND wl{e}.j = u.j")
        parts.append(f"""
b{e} AS (SELECT vec_id, unit AS bmu FROM
  (SELECT vec_id, unit,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, unit) AS rn
   FROM d{e}) WHERE rn = 1)""")
        parts.append(f"""
u{e} AS (
  SELECT h{e}.unit, dims.j,
         sum(h{e}.hv * CAST(data.e[dims.j] AS DOUBLE)) AS num,
         sum(h{e}.hv) AS den
  FROM data JOIN b{e} USING (vec_id) JOIN h{e} ON h{e}.bmu = b{e}.bmu,
       dims
  GROUP BY h{e}.unit, dims.j)""")
        parts.append(f"""
wl{e + 1} AS (
  SELECT u.unit, u.j,
         CASE WHEN u.den > 0 THEN u.num / u.den ELSE {prev_w} END AS w
  FROM u{e} u {prev_join})""")
        if e + 1 < n_iter:
            parts.append(f"""
d{e + 1} AS (
  SELECT data.vec_id, wl{e + 1}.unit,
         sum((CAST(data.e[wl{e + 1}.j] AS DOUBLE) - wl{e + 1}.w)
             * (CAST(data.e[wl{e + 1}.j] AS DOUBLE) - wl{e + 1}.w)) AS d2
  FROM data, wl{e + 1} GROUP BY data.vec_id, wl{e + 1}.unit)""")
    return (f"WITH {', '.join(parts)}\n"
            f"SELECT unit, CAST(j - 1 AS INT) AS dim_idx, "
            f"round(w, 6) AS w FROM wl{n_iter}")


def _similarity_sql(n_rows: int = 3, n_cols: int = 3,
                    n_iter: int = 2) -> str:
    """similarity_position oracle: the em2 CTE chain produces the
    per-doc iteration-2 Γ descriptors, then the SOM epoch recursion
    runs IN SQL under the hellinger_stm metric (mean over stochastic-
    matrix rows of sqrt(0.5·Σ(√a−√w)²) — sqrt is IEEE
    correctly-rounded, so it adds nothing to the cross-engine
    surface): per epoch BMU = argmin (ties -> lowest unit), unit
    update = neighborhood-kernel-weighted mean with den==0 keeping
    the old weight (the som_train device, re-derived for the
    4-dim Γ space), final pass = bmu_fixed's argmin + rounded
    distance. Init weights = the 9 lexicographically-first docs'
    descriptors, derived in SQL."""
    from apollon_spark.som import (SomGrid, SomParams, _decay_radius,
                                   gauss_kernel, grid_dists)
    p = SomParams(n_rows, n_cols, n_iter=n_iter, metric="hellinger")
    gd = grid_dists(SomGrid(n_rows, n_cols), "euclidean")
    n_units = n_rows * n_cols

    def h_cte(e: int) -> str:
        h = gauss_kernel(gd, _decay_radius(p, e))
        vals = ",".join(f"({b},{u},{_exact_double(h[b, u])})"
                        for b in range(n_units) for u in range(n_units))
        return (f"h{e}(bmu, unit, hv) AS "
                f"(SELECT * FROM (VALUES {vals}) t(bmu, unit, hv))")

    def hd(a: str, w: str) -> str:
        def row(i: int, j: int) -> str:
            return (f"sqrt(0.5*((sqrt({a}{i})-sqrt({w}{i}))"
                    f"*(sqrt({a}{i})-sqrt({w}{i}))"
                    f" + (sqrt({a}{j})-sqrt({w}{j}))"
                    f"*(sqrt({a}{j})-sqrt({w}{j}))))")
        return f"(({row(0, 1)} + {row(2, 3)}) / 2.0)"

    parts = [h_cte(e) for e in range(n_iter)]
    parts.append(
        "descs AS MATERIALIZED (SELECT doc_id, g00_2 AS a0, g01_2 AS a1, "
        "g10_2 AS a2, g11_2 AS a3 FROM u2g)")
    parts.append(f"""
w0t AS (
  SELECT * FROM (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS unit,
                        a0 AS c0, a1 AS c1, a2 AS c2, a3 AS c3
                 FROM descs) WHERE unit < {n_units})""")
    for e in range(n_iter):
        parts.append(f"""
d{e} AS (SELECT d.doc_id, w.unit, {hd('d.a', 'w.c')} AS dist
  FROM descs d, w{e}t w)""")
        parts.append(f"""
b{e} AS (SELECT doc_id, unit AS bmu FROM (
  SELECT doc_id, unit,
         row_number() OVER (PARTITION BY doc_id ORDER BY dist, unit) AS rn
  FROM d{e}) WHERE rn = 1)""")
        parts.append(f"""
u{e} AS (
  SELECT h{e}.unit,
         sum(h{e}.hv * d.a0) AS n0, sum(h{e}.hv * d.a1) AS n1,
         sum(h{e}.hv * d.a2) AS n2, sum(h{e}.hv * d.a3) AS n3,
         sum(h{e}.hv) AS den
  FROM descs d JOIN b{e} USING (doc_id) JOIN h{e} ON h{e}.bmu = b{e}.bmu
  GROUP BY h{e}.unit)""")
        parts.append(f"""
w{e + 1}t AS (
  SELECT u.unit,
         CASE WHEN u.den > 0 THEN u.n0/u.den ELSE w.c0 END AS c0,
         CASE WHEN u.den > 0 THEN u.n1/u.den ELSE w.c1 END AS c1,
         CASE WHEN u.den > 0 THEN u.n2/u.den ELSE w.c2 END AS c2,
         CASE WHEN u.den > 0 THEN u.n3/u.den ELSE w.c3 END AS c3
  FROM u{e} u JOIN w{e}t w ON w.unit = u.unit)""")
    parts.append(f"""
dfin AS (SELECT d.doc_id, w.unit, {hd('d.a', 'w.c')} AS dist
  FROM descs d, w{n_iter}t w)""")
    return (f"WITH RECURSIVE {_hmm_em2_ctes()},\n"
            + ",\n".join(parts)
            + """
SELECT doc_id, CAST(unit AS INT) AS bmu, round(dist, 6) AS bmu_dist
FROM (SELECT doc_id, unit, dist,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(dist, 6), unit) AS rn
      FROM dfin) WHERE rn = 1
""")


def _media_features_sql(n: int = 32, dim: int = 8) -> str:
    """Expected media features as a literal table, re-derived here with
    hashlib INDEPENDENTLY of the Spark pipeline (DuckDB's sha256()
    accepts only VARCHAR, so the byte-level chain can't run in SQL;
    synth_media reads no test data, so the expected output is a pure
    function of (n, dim) exactly like media_frame_plan's regenerated
    metadata). Values are exact dyadic rationals u32/2^32 — no
    rounding on either side; emitted as CAST(u32 AS DOUBLE)/2^32
    because a plain decimal literal is parsed through DECIMAL and
    lands 1 ulp off for ~9% of values, while the integer cast and
    power-of-two division are both exact (verified)."""
    import hashlib

    import numpy as np
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 8
        need, buf, h = dim * 4, b"", payload
        while len(buf) < need:
            h = hashlib.sha256(h).digest()
            buf += h
        u32s = np.frombuffer(buf[:need], dtype="<u4")
        rows.extend(
            f"('m{i:06d}', 'image', CAST({j} AS INT), "
            f"CAST({int(u)} AS DOUBLE) / 4294967296.0)"
            for j, u in enumerate(u32s))
    return ("SELECT * FROM (VALUES " + ",\n".join(rows)
            + ") AS t(media_id, kind, dim_idx, value)")


def _text_profile_sql() -> str:
    from apollon_spark.ml.textstats import LANG_MARKERS, SCRUB_PATTERNS
    langs = sorted(LANG_MARKERS)
    # PII scrub on the same augmented text as the Spark gate: chained
    # regexp_replace + per-kind counts on the progressively scrubbed
    # string (patterns are RE2/Java-parity by design, pinned by
    # tests/test_textstats.py::test_scrub_duckdb_parity).
    aug = ("text || ' contact u' || doc_id || '@ex.com via "
           "https://ex.com/d/' || doc_id || "
           "' at 10.20.30.40 ref 9876543210'")
    scrub_expr, scrub_cnts = aug, []
    for kind, pat, repl in SCRUB_PATTERNS:
        scrub_cnts.append(
            f"CAST(len(regexp_extract_all({scrub_expr}, '{pat}')) AS INT)"
            f" AS n_{kind}")
        scrub_expr = f"regexp_replace({scrub_expr}, '{pat}', '{repl}', 'g')"
    score_exprs = ", ".join(
        "CAST(len(list_filter(ws, w -> w IN ({lst}))) AS DOUBLE) / n "
        "AS s_{lang}".format(
            lst=", ".join(f"'{m}'" for m in LANG_MARKERS[lang]), lang=lang)
        for lang in langs)
    # argmax with alphabetical tiebreak == the Spark fold in lang_id_col
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs[i + 1:])
        branches.append(f"WHEN {conds} THEN '{lang}'")
    case_lang = ("CASE " + " ".join(branches)
                 + f" ELSE '{langs[-1]}' END")
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    return f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         string_split(lower(text), ' ') AS ws,
         greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) AS n
  FROM documents
),
scored AS (SELECT doc_id, text, n, {score_exprs} FROM base)
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       CAST(length(text) AS INT) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT)
         + (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
         AS n_tokens_est,
       round(
         0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)
         + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' ')))
         + 0.3 * (CASE WHEN length(text) * 1.0 / len(string_split(text, ' '))
                       BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END), 6)
         AS quality,
       CASE WHEN {gmax} > 0 THEN {case_lang} ELSE 'und' END AS lang_pred,
       {scrub_expr} AS text_scrubbed,
       {', '.join(scrub_cnts)}
FROM scored
"""


def oracle_sql() -> dict[str, str]:
    grad = """CASE
        WHEN lagv IS NULL AND leadv IS NULL THEN 0.0
        WHEN lagv IS NULL THEN leadv - value
        WHEN leadv IS NULL THEN value - lagv
        ELSE (leadv - lagv) / 2.0 END"""
    out = {
        "docs_profile": f"""
{_W},
g2 AS (
  SELECT doc_id,
         unnest(list_transform(range(0, n_tok - 1),
           i -> CAST(tokens[i + 1] AS BIGINT) * 256
              + CAST(tokens[i + 2] AS BIGINT))) AS gram
  FROM docs WHERE n_tok >= 2
),
c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram),
bi AS (SELECT doc_id, max(c) AS max2, CAST(sum(c) AS BIGINT) AS tot2
       FROM c2 GROUP BY doc_id),
g3 AS (
  SELECT doc_id,
         unnest(list_transform(range(0, n_tok - 2),
           i -> CAST(tokens[i + 1] AS BIGINT) * 65536
              + CAST(tokens[i + 2] AS BIGINT) * 256
              + CAST(tokens[i + 3] AS BIGINT))) AS gram
  FROM docs WHERE n_tok >= 3
),
c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY doc_id, gram),
tri AS (SELECT doc_id,
               CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup3,
               CAST(sum(c) AS BIGINT) AS tot3
        FROM c3 GROUP BY doc_id)
SELECT d.doc_id, n_tok, source,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(tokens, x -> CAST(x AS BIGINT))),
         (a, x) -> (a * 31 + x + 1) % 2147483647) AS fingerprint,
       CASE WHEN n_tok > 0
            THEN CAST(len(list_distinct(tokens)) AS DOUBLE)
                 / CAST(n_tok AS DOUBLE)
            ELSE 0.0 END AS distinct_frac,
       CASE WHEN COALESCE(tot2, 0) > 0
            THEN CAST(max2 AS DOUBLE) / CAST(tot2 AS DOUBLE)
            ELSE 0.0 END AS top2_frac,
       CASE WHEN COALESCE(tot3, 0) > 0
            THEN CAST(dup3 AS DOUBLE) / CAST(tot3 AS DOUBLE)
            ELSE 0.0 END AS dup3_frac
FROM docs d LEFT JOIN bi USING (doc_id) LEFT JOIN tri USING (doc_id)
""",
        "frames_agg": f"""
{_WF},
agg AS (
  SELECT doc_id, count(*) AS n_pos,
         CAST(sum(CAST(token AS BIGINT)) AS BIGINT) AS tok_sum,
         CAST(sum(CAST(token AS BIGINT) * (position + 1)) AS BIGINT) AS tok_wsum
  FROM frames GROUP BY doc_id
),
ok AS (
  SELECT d.doc_id, (list(f.token ORDER BY f.position) = d.tokens) AS ok
  FROM docs d JOIN frames f ON d.doc_id = f.doc_id
  GROUP BY d.doc_id, d.tokens
)
SELECT agg.*, ok.ok FROM agg JOIN ok USING (doc_id)
""",
        "tumbling": f"""
{_WF}
SELECT doc_id, CAST(position // 16 AS BIGINT) AS win_id, count(*) AS n,
       CAST(sum(CAST(token AS BIGINT) * token) AS BIGINT) AS energy,
       round(avg(token), 6) AS tok_mean
FROM frames GROUP BY doc_id, position // 16
""",
        "sliding": f"""
{_WF}
SELECT doc_id, position,
       round(avg(token) OVER w, 6) AS win_mean,
       min(token) OVER w AS win_min,
       max(token) OVER w AS win_max
FROM frames
WINDOW w AS (PARTITION BY doc_id ORDER BY position
             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
""",
        "segment_meta": f"""
{_W},
meta AS (
  SELECT doc_id,
         CAST((n_tok + 32 + ((((-(n_tok - 32)) % 16) + 16) % 16 % 32) - 16)
              // 16 AS BIGINT) AS n_segs
  FROM docs WHERE n_tok >= 32
)
SELECT doc_id, n_segs,
       CAST(16 * n_segs * (n_segs - 1) / 2 AS BIGINT) AS center_sum,
       CAST(-16 AS BIGINT) AS start_min,
       CAST((n_segs - 1) * 16 + 16 AS BIGINT) AS stop_max
FROM meta
""",
        "seg_energy": f"""
{_WF},
segs AS (
  SELECT doc_id, unnest(range(0, (n_tok - 16) // 16)) AS seg_idx
  FROM docs WHERE n_tok >= 32
)
SELECT s.doc_id, CAST(s.seg_idx AS INT) AS seg_idx,
       CAST(sum(CAST(f.token AS BIGINT) * f.token) AS DOUBLE) AS energy
FROM segs s JOIN frames f
  ON f.doc_id = s.doc_id
 AND f.position >= s.seg_idx * 16 AND f.position < s.seg_idx * 16 + 32
GROUP BY s.doc_id, s.seg_idx
""",
        "window_vectors": """
WITH names(name) AS (VALUES ('rect'), ('hamming'), ('hann'),
                            ('blackman'), ('bartlett')),
grid AS (
  SELECT name, unnest(range(0, 32)) AS i FROM names
)
SELECT name, CAST(i AS INT) AS i,
       round(CASE name
         WHEN 'rect' THEN 1.0
         WHEN 'hamming' THEN 0.54 - 0.46 * cos(2 * pi() * i / 32)
         WHEN 'hann' THEN 0.5 - 0.5 * cos(2 * pi() * i / 32)
         WHEN 'blackman' THEN 0.42 - 0.5 * cos(2 * pi() * i / 32)
                              + 0.08 * cos(4 * pi() * i / 32)
         WHEN 'bartlett' THEN 1.0 - abs(2.0 * i / 32 - 1.0)
       END, 9) AS w
FROM grid
""",
        "scalar_funcs": """
WITH f AS (
  SELECT vec_id, 20.0 + vec_id * 10.0 AS frq FROM embeddings
)
SELECT vec_id,
       round(1125.0 * ln(1.0 + frq / 700.0), 6) AS mel,
       round(700.0 * (exp((1125.0 * ln(1.0 + frq / 700.0)) / 1125.0)
                      - 1.0), 6) AS f_rt,
       round(13.0 * atan(0.00076 * frq)
             + 3.5 * atan(pow(frq / 7500.0, 2)), 6) AS bark,
       round((148693636.0 * frq * frq)
             / ((frq * frq + 424.36) * (frq * frq + 148693636.0)), 6)
         AS cw,
       round(pow(10.0, 0.05 * 60.0) * 2e-5, 9) AS amp60
FROM f
""",
        "acf_profile": f"""
{_W},
base AS (
  SELECT doc_id, tokens, n_tok FROM docs WHERE n_tok BETWEEN 16 AND 64
),
lagged AS (
  SELECT doc_id, tokens, n_tok, unnest(range(0, 8)) AS lag FROM base
),
parts AS (
  SELECT doc_id, CAST(lag AS INT) AS lag,
         list_sum(list_transform(range(1, n_tok - lag + 1),
             i -> CAST(tokens[i] AS DOUBLE) * tokens[i + lag])) AS raw,
         list_sum(list_transform(tokens,
             x -> CAST(x AS DOUBLE) * x)) AS energy,
         tokens[1 : n_tok - lag] AS xs,
         tokens[lag + 1 : n_tok] AS ys,
         n_tok - lag AS m
  FROM lagged
),
pear AS (
  SELECT doc_id, lag, raw, energy,
         list_sum(list_transform(range(1, m + 1),
             i -> (CAST(xs[i] AS DOUBLE) - list_sum(xs) * 1.0 / m)
                * (CAST(ys[i] AS DOUBLE) - list_sum(ys) * 1.0 / m))) AS rxy,
         list_sum(list_transform(xs,
             x -> (CAST(x AS DOUBLE) - list_sum(xs) * 1.0 / m)
                * (CAST(x AS DOUBLE) - list_sum(xs) * 1.0 / m))) AS xx,
         list_sum(list_transform(ys,
             y -> (CAST(y AS DOUBLE) - list_sum(ys) * 1.0 / m)
                * (CAST(y AS DOUBLE) - list_sum(ys) * 1.0 / m))) AS yy
  FROM parts
)
SELECT doc_id, lag,
       round(CASE WHEN energy = 0 THEN 0.0 ELSE raw / energy END, 6)
         AS acf,
       round(CASE WHEN lag = 0 THEN 1.0
                  WHEN xx * yy = 0 THEN 0.0
                  ELSE rxy / (xx * yy) END, 6)
         AS acf_pearson
FROM pear
""",
        # r04 consolidation: fast + halo-split batteries path-tagged
        # in one gate; split==unsplit is bit-equal (pytest), so the
        # identical battery SQL value-oracles both branches
        "battery_time": f"""
SELECT 'fast' AS path, * FROM ({_battery_time_sql()})
UNION ALL
SELECT 'split' AS path, * FROM ({_battery_time_sql()})
""",
        "causal_energy": f"""
{_WF},
segs AS (
  SELECT doc_id, unnest(range(0, CAST(ceil(n_tok / 16.0) AS BIGINT)))
           AS seg_idx
  FROM docs WHERE n_tok >= 32
)
SELECT s.doc_id, CAST(s.seg_idx AS INT) AS seg_idx,
       CAST(s.seg_idx * 16 AS BIGINT) AS center,
       CAST(coalesce(sum(CAST(f.token AS BIGINT) * f.token), 0) AS DOUBLE)
         AS energy
FROM segs s LEFT JOIN frames f
  ON f.doc_id = s.doc_id
 AND f.position >= s.seg_idx * 16 - 31 AND f.position <= s.seg_idx * 16
GROUP BY s.doc_id, s.seg_idx
""",
        "asof_strategies": """
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS t_us
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, epoch_us(ts) AS rt,
                  round(value, 6) AS purchase_value
           FROM events WHERE event_type = 'purchase'),
     j AS (SELECT c.user_id, c.event_id, c.t_us, p.purchase_value
           FROM c ASOF LEFT JOIN p
             ON c.user_id = p.user_id AND c.t_us >= p.rt)
SELECT 'union' AS strategy, * FROM j
UNION ALL
SELECT 'bucketed' AS strategy, * FROM j
""",
        "asof_options": """
WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
                  -epoch_us(ts) AS neg_t
           FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, epoch_us(ts) AS rt, -epoch_us(ts) AS neg_rt,
                  round(value, 6) AS purchase_value
           FROM events WHERE event_type = 'purchase'),
bk AS (SELECT c.event_id, p.rt AS brt, p.purchase_value AS bval
       FROM c ASOF LEFT JOIN p
         ON c.user_id = p.user_id AND c.t_us >= p.rt),
fw AS (SELECT c.event_id, p.rt AS frt, p.purchase_value AS fval
       FROM c ASOF LEFT JOIN p
         ON c.user_id = p.user_id AND c.neg_t >= p.neg_rt)
SELECT 'tolerance' AS mode, c.user_id, c.event_id, c.t_us,
       CASE WHEN c.t_us - bk.brt <= 3600000000
            THEN bk.bval END AS purchase_value
FROM c JOIN bk USING (event_id)
UNION ALL
SELECT 'forward' AS mode, c.user_id, c.event_id, c.t_us, fw.fval
FROM c JOIN fw USING (event_id)
UNION ALL
SELECT 'nearest' AS mode, c.user_id, c.event_id, c.t_us,
       CASE WHEN bk.brt IS NULL THEN fw.fval
            WHEN fw.frt IS NULL THEN bk.bval
            WHEN (fw.frt - c.t_us) < (c.t_us - bk.brt) THEN fw.fval
            ELSE bk.bval END AS purchase_value
FROM c JOIN bk USING (event_id) JOIN fw USING (event_id)
UNION ALL
SELECT 'strict' AS mode, c.user_id, c.event_id, c.t_us, p.purchase_value
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.t_us > p.rt
""",
        "sessionize": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
           AS prev_t
  FROM events
),
marked AS (
  SELECT *, CASE WHEN prev_t IS NULL OR t_us - prev_t > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM e
),
sessions AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(t_us) AS s_start, max(t_us) AS s_end,
       count(*) AS n_rows
FROM sessions GROUP BY user_id, session_id
""",
        "locf": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CASE WHEN event_type = 'click' THEN value END AS cv
  FROM events
),
fwd AS (
  SELECT user_id, event_id, t_us, cv,
         last_value(cv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY t_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cvf
  FROM e
)
SELECT user_id, event_id,
       round(cvf, 6) AS click_value,
       round(last_value(cv IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY t_us
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
         AS cv_l3,
       round(last_value(cvf IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY t_us DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cv
FROM fwd
""",
        "lag_delta": f"""
WITH e AS (
  SELECT user_id, event_id, value,
         lag(value) OVER w AS lagv,
         lead(value) OVER w AS leadv,
         lead(value, 3) OVER w AS lead3,
         lead(value, 6) OVER w AS lead6
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
)
SELECT user_id, event_id,
       round(value - lagv, 6) AS delta,
       round({grad}, 6) AS grad,
       round(greatest({grad}, 0.0), 6) AS flux,
       CASE WHEN lead6 IS NOT NULL THEN round(lead3, 6) END AS v1,
       round(lead6, 6) AS v2
FROM e
""",
        "dedup_exact": """
WITH groups AS (
  SELECT text, min(CAST(doc_id AS VARCHAR)) AS doc_id,
         count(*) AS dup_count
  FROM documents GROUP BY text
)
SELECT doc_id, dup_count FROM groups
""",
        "bmu_fixed": """
WITH w AS (
  SELECT vec_id AS unit, embedding AS wv
  FROM embeddings WHERE vec_id < 16
),
v AS (
  SELECT vec_id, embedding AS ev FROM embeddings WHERE vec_id >= 16
),
d AS (
  SELECT v.vec_id, w.unit,
         sqrt(list_sum(list_transform(range(1, len(v.ev) + 1),
              i -> (CAST(v.ev[i] AS DOUBLE) - w.wv[i])
                   * (CAST(v.ev[i] AS DOUBLE) - w.wv[i])))) AS dist
  FROM v CROSS JOIN w
),
ranked AS (
  SELECT vec_id, unit, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, unit) AS rn
  FROM d
)
SELECT vec_id, CAST(unit AS INT) AS bmu,
       round(dist, 6) AS bmu_dist
FROM ranked WHERE rn = 1
""",
        "minhash": _minhash_sql(),
        "lsh_pairs": _lsh_pairs_sql(),
        "dup_clusters": _dup_clusters_sql(),
        "peak_scan": _peak_scan_sql(),
        "hmm_estep": _hmm_estep_sql(),
        "hmm": _hmm_em2_sql(),
        "similarity_position": _similarity_sql(),
        "onsets": _onsets_sql(),
        "features_battery": _features_battery_sql(),
        "nonlinear": _nonlinear_sql(),
        # exact duplicate-passage spans: md5 content keys are
        # byte-identical cross-engine; DuckDB range() end is exclusive
        # where Spark sequence() is inclusive, hence the +1
        "dup_passages": f"""
{_W},
keys AS (
  SELECT doc_id,
         list_transform(range(0, n_tok - 8 + 1),
           i -> md5(array_to_string(list_transform(tokens[i + 1 : i + 8],
                x -> CAST(x AS VARCHAR)), ','))) AS ks
  FROM docs WHERE n_tok >= 8
),
p AS (
  SELECT doc_id,
         CAST(generate_subscripts(ks, 1) - 1 AS INT) AS pos,
         unnest(ks) AS pkey
  FROM keys
),
d AS (
  SELECT pkey, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occur
  FROM p GROUP BY pkey HAVING count(DISTINCT doc_id) >= 2
),
-- keep-one-canonical removal spans: drop the globally-first
-- (doc_id, pos) occurrence of each duplicated content, merge the
-- rest per doc via gaps-and-islands, cover [min(pos), max(pos) + k)
noncanon AS (
  SELECT doc_id, pos FROM (
    SELECT p.doc_id, p.pos,
           row_number() OVER (PARTITION BY p.pkey
                              ORDER BY p.doc_id, p.pos) AS rk
    FROM p JOIN d USING (pkey)
  ) WHERE rk > 1
),
brk AS (
  -- island breaks only when the gap between consecutive starts
  -- EXCEEDS k (= 8): windows <= k apart overlap/touch, so start-
  -- adjacency islands would emit overlapping spans (two levels:
  -- DuckDB forbids nesting lag inside the running sum's window)
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                        ORDER BY pos) > 8
              THEN 1 ELSE 0 END AS b
  FROM noncanon
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS g
  FROM brk
),
cutspans AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + 8 AS BIGINT) AS span_end,
         CAST(count(*) AS BIGINT) AS n_windows
  FROM isl GROUP BY doc_id, g
)
SELECT 'occur' AS method, p.doc_id, CAST(p.pos AS BIGINT) AS pos,
       d.n_docs AS a, d.n_occur AS b
FROM p JOIN d USING (pkey)
UNION ALL
SELECT 'cut' AS method, doc_id, span_start AS pos,
       span_end AS a, n_windows AS b
FROM cutspans
""",
        # r04 consolidation: topk cut + rank-free rerank cut union
        # under one method-tagged gate (rerank rows carry rank 0)
        "ann_lsh": f"""
SELECT 'topk' AS method, q_id, rank, id, sim
FROM ({_ann_lsh_sql()})
UNION ALL
SELECT 'rerank' AS method, q_id, CAST(0 AS INT) AS rank, id, sim
FROM ({_ann_rerank_sql()})
""",
        "ivf_ann": _ivf_ann_sql(),
        "media_features": _media_features_sql(),
        "som_train": _som_train_sql(),
        "media_frame_plan": """
WITH meta AS (
  SELECT printf('m%06d', i) AS media_id,
         CAST(1000 + i * 10 AS INT) AS duration_ms
  FROM (SELECT unnest(range(0, 32)) AS i)
)
SELECT media_id, duration_ms,
       CAST(unnest(range(0, duration_ms, 250)) AS INT) AS frame_ts_ms
FROM meta
""",
        "jaccard_pairs": """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_distinct(string_split(text, ' ')) AS words
  FROM documents WHERE doc_id < 60
)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
               / len(list_distinct(a.words || b.words)), 6) AS jaccard
  FROM d a JOIN d b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.3
""",
        "knn_cosine": """
WITH q AS (SELECT vec_id AS q_id, embedding AS qe
           FROM embeddings WHERE vec_id < 3),
p AS (SELECT q.q_id, e.vec_id AS id, unnest(q.qe) AS a,
             unnest(e.embedding) AS b
      FROM q, embeddings e),
sims AS (
  SELECT q_id, id,
         sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))
           / (sqrt(sum(CAST(a AS DOUBLE) * a)) *
              sqrt(sum(CAST(b AS DOUBLE) * b))) AS sim
  FROM p GROUP BY q_id, id
)
SELECT q_id, id, round(sim, 6) AS sim FROM sims WHERE sim >= 0.2
""",
        "text_profile": _text_profile_sql(),
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "topk_orders": """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rank
  FROM orders
)
SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey,
       round(o_totalprice, 2) AS total
FROM ranked WHERE rank <= 3
""",
        "window_count_events": """
SELECT event_type, epoch_us(ts) // 300000000 AS win_id,
       count(*) AS n, round(sum(value), 4) AS val_sum
FROM events GROUP BY event_type, epoch_us(ts) // 300000000
""",
        "pack_sequences": f"""
{_W},
off AS (
  SELECT doc_id, tokens,
         COALESCE(CAST(sum(CAST(n_tok AS BIGINT)) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS off
  FROM docs
),
tok AS (
  SELECT doc_id,
         off + generate_subscripts(tokens, 1) - 1 AS g,
         unnest(tokens) AS token
  FROM off
)
SELECT CAST(g // 512 AS BIGINT) AS seq_id,
       count(*) AS n_tok,
       CAST(sum(CAST(token AS BIGINT)) AS BIGINT) AS tok_sum,
       CAST(sum(CAST(token AS BIGINT) * (g % 512 + 1)) AS BIGINT) AS tok_wsum,
       count(DISTINCT doc_id) AS n_docs,
       arg_min(doc_id, g) AS first_doc,
       arg_max(doc_id, g) AS last_doc
FROM tok GROUP BY g // 512
""",
        "contamination": f"""
{_W},
lab AS (
  SELECT doc_id, tokens, n_tok,
         substr(md5(doc_id || ':bench'), 1, 1) = '0' AS is_bench
  FROM docs
),
bg AS (
  SELECT DISTINCT unnest(list_transform(range(0, n_tok - 2),
           i -> CAST(tokens[i + 1] AS BIGINT) * 65536
              + CAST(tokens[i + 2] AS BIGINT) * 256
              + CAST(tokens[i + 3] AS BIGINT))) AS gram
  FROM lab WHERE is_bench AND n_tok >= 3
),
dg AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(0, n_tok - 2),
           i -> CAST(tokens[i + 1] AS BIGINT) * 65536
              + CAST(tokens[i + 2] AS BIGINT) * 256
              + CAST(tokens[i + 3] AS BIGINT)))) AS gram
  FROM lab WHERE NOT is_bench AND n_tok >= 3
),
hits AS (
  SELECT dg.doc_id, count(*) AS n_grams, count(bg.gram) AS n_hit
  FROM dg LEFT JOIN bg USING (gram) GROUP BY dg.doc_id
),
-- CCNet-style bigram LM counted on the SAME benchmark slice:
-- P(t|s) = (c2 + 0.1) / (c1 + 0.1*256); ctx = gram // 256 (integer
-- division — a double cast would ROUND in DuckDB where Spark
-- truncates)
bc2 AS (
  SELECT gram, count(*) AS c2 FROM (
    SELECT unnest(list_transform(range(0, n_tok - 1),
             i -> CAST(tokens[i + 1] AS BIGINT) * 256
                + CAST(tokens[i + 2] AS BIGINT))) AS gram
    FROM lab WHERE is_bench AND n_tok >= 2
  ) GROUP BY gram
),
bc1 AS (SELECT gram // 256 AS ctx, sum(c2) AS c1 FROM bc2 GROUP BY ctx),
tg AS (
  SELECT doc_id, gram, gram // 256 AS ctx FROM (
    SELECT doc_id, unnest(list_transform(range(0, n_tok - 1),
             i -> CAST(tokens[i + 1] AS BIGINT) * 256
                + CAST(tokens[i + 2] AS BIGINT))) AS gram
    FROM lab WHERE NOT is_bench AND n_tok >= 2
  )
),
lmsc AS (
  SELECT tg.doc_id, count(*) AS n_bigrams,
         avg(ln((COALESCE(bc2.c2, 0) + 0.1)
                / (COALESCE(bc1.c1, 0) + 0.1 * 256))) AS mean_logp
  FROM tg LEFT JOIN bc2 USING (gram) LEFT JOIN bc1 USING (ctx)
  GROUP BY tg.doc_id
)
SELECT l.doc_id,
       COALESCE(n_grams, 0) AS n_grams,
       COALESCE(n_hit, 0) AS n_hit,
       CASE WHEN COALESCE(n_grams, 0) > 0
            THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
            ELSE 0.0 END AS hit_frac,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       round(COALESCE(mean_logp, 0.0), 6) AS mean_logp
FROM (SELECT doc_id FROM lab WHERE NOT is_bench) l
LEFT JOIN hits USING (doc_id)
LEFT JOIN lmsc USING (doc_id)
""",
        "sample_stratified": f"""
{_W}
SELECT 'quota' AS mode, source, doc_id, CAST(rk AS INT) AS k FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id || ':strat'), doc_id) AS rk
  FROM docs
) WHERE rk <= 40
UNION ALL
SELECT 'mix' AS mode, source, doc_id,
       CAST(unnest(range(1, n_copies + 1)) AS INT) AS k
FROM (
  SELECT source, doc_id,
         (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
               ELSE 0 END)
         + (CASE WHEN substr(md5(doc_id || ':mix'), 1, 4) <
                 (CASE source WHEN 'src1' THEN '8000'
                       WHEN 'src2' THEN '4000'
                       WHEN 'src3' THEN '8000'
                       ELSE '0000' END)
            THEN 1 ELSE 0 END) AS n_copies
  FROM docs
) WHERE n_copies > 0
""",
        "vocab_topk": f"""
{_WF}
SELECT CAST(rank AS INT) AS rank, token, n_occur, n_docs FROM (
  SELECT token, count(*) AS n_occur,
         count(DISTINCT doc_id) AS n_docs,
         row_number() OVER (ORDER BY count(*) DESC, token) AS rank
  FROM frames GROUP BY token
) WHERE rank <= 32
""",
        "rolling_stats": """
SELECT user_id, event_id,
       round(avg(value) OVER w, 6) AS w_mean,
       round(min(value) OVER w, 6) AS w_min,
       round(max(value) OVER w, 6) AS w_max,
       round(sum(value) OVER w, 6) AS w_sum,
       round(quantile_cont(value, 0.5) OVER w, 6) AS w_med
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING)
""",
        "normalize_stats": """
WITH s AS (
  SELECT user_id, event_id, value,
         avg(value) OVER (PARTITION BY user_id) AS mu,
         stddev_pop(value) OVER (PARTITION BY user_id) AS sd
  FROM events
)
SELECT user_id, event_id,
       round(CASE WHEN sd > 0 THEN (value - mu) / sd ELSE 0.0 END, 6) AS z,
       round(CASE WHEN value >= mu - sd AND value <= mu + sd
                  THEN mu ELSE value END, 6) AS smoothed
FROM s
""",
        "join_revenue": """
SELECT n.n_name,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "onset_gather": f"""
{_W},
ons AS (
  SELECT doc_id, tokens, n_tok,
         unnest([n_tok // 4, n_tok // 2, n_tok - 3]) AS frame
  FROM docs
),
clipped AS (
  SELECT doc_id, frame,
         greatest(0, least(frame, n_tok - 1)) AS pos, tokens, n_tok
  FROM ons
)
SELECT doc_id, CAST(frame AS INT) AS frame,
       CAST(coalesce(list_sum(list_transform(
         tokens[pos + 1 : least(pos + 8, n_tok)],
         x -> CAST(x AS BIGINT))), 0) AS BIGINT) AS wsum
FROM clipped
""",
        # r04 consolidation: brute-force scope + LSH-mined near-dup
        # union under one method-tagged gate
        "cosine_neardup": f"""
SELECT 'brute' AS method, id_a, id_b, cos_sim FROM (
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding
           FROM embeddings WHERE vec_id < 200),
p AS (SELECT a.id AS id_a, b.id AS id_b,
             unnest(a.embedding) AS x, unnest(b.embedding) AS y
      FROM e a JOIN e b ON a.id < b.id),
sims AS (
  SELECT id_a, id_b,
         round(sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
               / (sqrt(sum(CAST(x AS DOUBLE) * x)) *
                  sqrt(sum(CAST(y AS DOUBLE) * y))), 6) AS cos_sim
  FROM p GROUP BY id_a, id_b
)
SELECT id_a, id_b, cos_sim FROM sims
WHERE cos_sim >= 0.2 AND abs(cos_sim - 0.2) > 1e-4
)
UNION ALL
SELECT 'lsh' AS method, id_a, id_b, cos_sim FROM ({_cosine_lsh_sql()})
UNION ALL
SELECT 'semantic' AS method, id_a, id_b, cos_sim FROM (
-- SemDeDup within-cluster pairs: centroids = the first 8 corpus
-- vectors; L2 argmin routing (ties -> lowest cluster, matching
-- np.argmin); exact cosine only inside clusters
WITH e AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding
           FROM embeddings),
c AS (SELECT CAST(vec_id AS INT) AS cl, embedding AS cv
      FROM embeddings WHERE vec_id < 8),
d AS (SELECT e.id, c.cl,
             list_sum(list_transform(range(1,{_EMB_DIM + 1}), i ->
               (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
               * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))) AS d2
      FROM e CROSS JOIN c),
assign AS MATERIALIZED (
  SELECT id, cl FROM (
    SELECT id, cl, row_number() OVER (PARTITION BY id
                                      ORDER BY d2, cl) AS rn
    FROM d) WHERE rn = 1),
p AS (SELECT x.id AS id_a, y.id AS id_b,
             unnest(ea.embedding) AS ax, unnest(eb.embedding) AS ay
      FROM assign x
      JOIN assign y ON x.cl = y.cl AND x.id < y.id
      JOIN e ea ON ea.id = x.id
      JOIN e eb ON eb.id = y.id),
sims AS (
  SELECT id_a, id_b,
         round(sum(CAST(ax AS DOUBLE) * CAST(ay AS DOUBLE))
               / (sqrt(sum(CAST(ax AS DOUBLE) * ax)) *
                  sqrt(sum(CAST(ay AS DOUBLE) * ay))), 6) AS cos_sim
  FROM p GROUP BY id_a, id_b
)
SELECT id_a, id_b, cos_sim FROM sims
WHERE cos_sim >= 0.4 AND abs(cos_sim - 0.4) > 1e-4
)
""",
        "extend_energy": f"""
{_W},
p AS (
  SELECT doc_id, n_tok,
         ((32 - n_tok) % 16 + 16) % 16 AS pad_len,
         list_concat(list_concat([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0], tokens),
             list_transform(range(0, 16 + ((32 - n_tok) % 16 + 16) % 16),
                            i -> 0)) AS padded
  FROM docs WHERE n_tok >= 32
),
segs AS (
  SELECT doc_id, unnest(range(0, (n_tok + 16 + pad_len) // 16)) AS seg_idx,
         padded FROM p
)
SELECT doc_id, CAST(seg_idx AS INT) AS seg_idx,
       CAST(seg_idx * 16 AS BIGINT) AS center,
       CAST(list_sum(list_transform(padded[seg_idx*16+1 : seg_idx*16+32],
            x -> CAST(x AS BIGINT) * x)) AS DOUBLE) AS energy
FROM segs
""",
    }
    return out
