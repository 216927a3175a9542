"""Checkpointed feature job: lineage records + idempotent resume."""
import os

import numpy as np

from apollon_spark.datagen import synth_docs
from apollon_spark.operators.framing import FramingParams
from apollon_spark.pipeline import read_lineage, run_feature_job
from apollon_spark.spectral import FeatureConfig


def test_run_and_resume(spark, tmp_path):
    out = str(tmp_path / "job")
    docs = synth_docs(spark, 8, whales=False)
    cfg = FeatureConfig(framing=FramingParams(128, 64))

    s1 = run_feature_job(spark, docs, out, cfg, n_buckets=4)
    assert s1["buckets_done"] == 4 and s1["buckets_skipped"] == 0
    lineage = read_lineage(out)
    assert len(lineage) == 4
    assert sum(r["rows_in"] for r in lineage) == 8
    assert all(r["wall_sec"] > 0 for r in lineage)
    assert all(r["params_hash"] == s1["params_hash"] for r in lineage)

    feats = spark.read.parquet(os.path.join(out, "features"))
    n_rows = feats.count()
    assert n_rows == s1["rows_out"] > 0

    # resume: everything skips, output unchanged
    s2 = run_feature_job(spark, docs, out, cfg, n_buckets=4)
    assert s2["buckets_done"] == 0 and s2["buckets_skipped"] == 4
    assert spark.read.parquet(os.path.join(out, "features")).count() == n_rows

    # partial failure: drop one marker -> exactly one bucket reruns,
    # same checksum as before (idempotent)
    before = {r["bucket"]: r["checksum"] for r in lineage}
    os.remove(os.path.join(out, "_done", "bucket=2"))
    s3 = run_feature_job(spark, docs, out, cfg, n_buckets=4)
    assert s3["buckets_done"] == 1 and s3["buckets_skipped"] == 3
    after = {r["bucket"]: r["checksum"] for r in read_lineage(out)}
    assert after == before

    # changed params: markers from the old cfg must NOT be trusted —
    # every bucket reruns under the new hash (stale-resume bug, r02)
    cfg2 = FeatureConfig(framing=FramingParams(64, 32))
    s4 = run_feature_job(spark, docs, out, cfg2, n_buckets=4)
    assert s4["params_hash"] != s1["params_hash"]
    assert s4["buckets_done"] == 4 and s4["buckets_skipped"] == 0
    assert all(r["params_hash"] == s4["params_hash"]
               for r in read_lineage(out))


def test_generic_bucketed_job_resume(spark, tmp_path):
    """run_bucketed_job (the generalized harness behind the features
    stage) gives any per-doc transform the same marker/lineage/resume
    contract — exercised here with the text-profile transform."""
    import pandas as pd

    from apollon_spark.ml.textstats import text_profile
    from apollon_spark.pipeline import read_lineage, run_bucketed_job
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(12)],
        "text": [f"some text number {i} with words" for i in range(12)],
    }))
    out = str(tmp_path / "tp")
    params = {"stage": "textstats", "text_col": "text"}
    tf = lambda part: text_profile(part)  # noqa: E731

    s1 = run_bucketed_job(spark, docs, out, tf, params,
                          n_buckets=3, job_id="textstats")
    assert s1["buckets_done"] == 3 and s1["rows_out"] == 12
    lineage = read_lineage(out)
    assert len(lineage) == 3
    assert sum(r["rows_in"] for r in lineage) == 12
    # resume: nothing reruns
    s2 = run_bucketed_job(spark, docs, out, tf, params,
                          n_buckets=3, job_id="textstats")
    assert s2["buckets_done"] == 0 and s2["buckets_skipped"] == 3
    # params change invalidates every marker
    s3 = run_bucketed_job(spark, docs, out, tf, {**params, "v": 2},
                          n_buckets=3, job_id="textstats")
    assert s3["buckets_done"] == 3 and s3["buckets_skipped"] == 0
    # output is readable as one partitioned dataset
    got = spark.read.parquet(out + "/textstats").count()
    assert got == 12


def test_bucket_count_change_invalidates_markers(spark, tmp_path):
    """Resuming with a different n_buckets must rerun EVERYTHING:
    bucket membership is crc32(doc_id) % n_buckets, so old markers
    answer a different partitioning — honoring them would duplicate
    every doc whose slice moved (n_buckets is folded into the params
    hash)."""
    import pandas as pd

    from apollon_spark.ml.textstats import text_profile
    from apollon_spark.pipeline import run_bucketed_job
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(12)],
        "text": [f"some text number {i} with words" for i in range(12)],
    }))
    out = str(tmp_path / "tp2")
    params = {"stage": "textstats", "text_col": "text"}
    tf = lambda part: text_profile(part)  # noqa: E731

    s1 = run_bucketed_job(spark, docs, out, tf, params,
                          n_buckets=2, job_id="textstats")
    assert s1["buckets_done"] == 2
    s2 = run_bucketed_job(spark, docs, out, tf, params,
                          n_buckets=3, job_id="textstats")
    assert s2["buckets_done"] == 3 and s2["buckets_skipped"] == 0
    # the combined dataset holds each doc exactly once: the 3-bucket
    # run overwrote bucket=0/1 and wrote bucket=2 fresh
    got = spark.read.parquet(out + "/textstats")
    assert got.count() == 12
    assert got.select("doc_id").distinct().count() == 12

    # shrink back to 2: the stale bucket=2 slice (whose docs the
    # 2-bucket run re-writes into buckets 0/1) must be removed, else
    # the combined dataset duplicates them
    s3 = run_bucketed_job(spark, docs, out, tf, params,
                          n_buckets=2, job_id="textstats")
    assert s3["buckets_done"] == 2
    assert s3.get("stale_buckets_removed") == 1
    got = spark.read.parquet(out + "/textstats")
    assert got.count() == 12
    assert got.select("doc_id").distinct().count() == 12


def test_ingest_roundtrip_token_equality(spark, tmp_path, sf_dir):
    """The north-rule per-row invariant: the ingested table (plain
    parquet AND the doc_id-bucketed layout) preserves every token
    array EXACTLY — integer-for-integer equality against the source
    derivation, not just counts."""
    from apollon_spark import storage
    from apollon_spark.tokenize import docs_from_documents

    src = docs_from_documents(spark, sf_dir)
    want = {r["doc_id"]: list(r["tokens"]) for r in src.collect()}

    plain = str(tmp_path / "ingest_plain")
    storage.write_table(src, plain)
    got = {r["doc_id"]: list(r["tokens"])
           for r in storage.read_table(spark, plain).collect()}
    assert got == want

    storage.write_bucketed(src, "ingest_tok_eq", ["doc_id"], 4,
                           sort_cols=["n_tok"],
                           path=str(tmp_path / "ingest_bucketed"))
    got_b = {r["doc_id"]: list(r["tokens"])
             for r in spark.table("ingest_tok_eq").collect()}
    assert got_b == want
