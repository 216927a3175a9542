"""Physical-plan regression gates: the scale properties SCALE.md
claims must be visible in the plans themselves."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from apollon_spark.datagen import synth_docs
from apollon_spark.operators.framing import FramingParams
from apollon_spark.spectral import FeatureConfig, extract_features


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fast_path_has_no_exchange(spark, sf_dir):
    from apollon_spark.tokenize import docs_from_documents
    docs = docs_from_documents(spark, sf_dir)
    out = extract_features(docs, FeatureConfig(framing=FramingParams(64, 32)))
    plan = _plan(out)
    assert "Exchange" not in plan          # Scan -> Project -> MapInPandas
    assert "MapInPandas" in plan


def test_split_path_has_halo_exchange(spark):
    docs = synth_docs(spark, 4, whales=False)
    out = extract_features(docs, FeatureConfig(framing=FramingParams(64, 32)),
                           split=True, chunk_segs=8)
    plan = _plan(out)
    assert "RoundRobinPartitioning" in plan      # the halo exchange
    assert plan.count("Exchange") <= 3           # halo + sharpness window (AQE may stage)


def test_scan_prunes_columns(spark, sf_dir):
    """A query touching only (doc_id, source) must not scan the
    text-heavy column."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.groupBy("source").agg(F.countDistinct("doc_id"))
    plan = _plan(q)
    read = plan.split("ReadSchema:")[-1]
    assert "doc_id" in read and "source" in read
    assert "text" not in read


def test_ann_paths_broadcast_and_bound_shuffles(spark):
    """ANN candidate mining must broadcast the tiny query/probe tables
    (never shuffle the corpus against them) and keep total exchanges
    bounded: bucket keys + the top-k window, nothing more."""
    from apollon_spark.ml.simsearch import ivf_topk, lsh_ann_topk
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((300, 8))
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(300, dtype="int64"),
        "embedding": list(vecs)}))
    queries, q_ids = vecs[:2], np.arange(2, dtype="int64")

    lsh = lsh_ann_topk(df, queries, q_ids, k=3, n_planes=4)
    plan = _plan(lsh)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # exchanges: broadcasts + the id-join + the per-query window sort;
    # the redundant candidate dedup (removed r02) would add one more
    assert plan.count("Exchange hashpartitioning") <= 3, plan

    ivf = ivf_topk(df, queries, q_ids, k=3, n_centroids=4, n_probe=2)
    plan = _plan(ivf)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_bucketed_join_is_colocated(spark, tmp_path):
    """Two tables bucketed by the same key into the same bucket count
    must sort-merge join with ZERO Exchange operators — the co-located
    join layout SCALE.md recommends for docs x model tables."""
    from apollon_spark.storage import write_bucketed
    import pandas as pd
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(64)],
        "n_tok": np.arange(64)}))
    model = spark.createDataFrame(pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(64)],
        "score": np.random.default_rng(0).random(64)}))
    write_bucketed(docs, "bdocs", ["doc_id"], 4, sort_cols=["doc_id"],
                   path=str(tmp_path / "bdocs"))
    write_bucketed(model, "bmodel", ["doc_id"], 4, sort_cols=["doc_id"],
                   path=str(tmp_path / "bmodel"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bdocs").join(spark.table("bmodel"), "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 64
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bdocs")
        spark.sql("DROP TABLE IF EXISTS bmodel")


def test_pack_sequences_bounded_exchanges(spark):
    """Packing must show exactly the SCALE.md shuffle budget: one
    range exchange (doc_id order, asserted on the pre-checkpoint
    cumsum frame — the public path pins it via localCheckpoint, which
    truncates the visible downstream plan), one hash exchange (seq_id
    assembly), one broadcast (partition base offsets) — and NO
    single-partition global-sort window."""
    import re

    from apollon_spark.operators.packing import _meta_cumsum, pack_sequences
    docs = synth_docs(spark, 32, whales=False)

    # the range shuffle lives in the (checkpointed) cumsum frame: it
    # must be tokens-free — offsets bookkeeping rides only
    # (doc_id, n_tok), ~16 B/doc
    meta_plan = _plan(_meta_cumsum(docs, n_buckets=4))
    assert "rangepartitioning" in meta_plan.lower()     # doc_id ranges
    range_subtree = meta_plan[meta_plan.index("rangepartitioning"):]
    feed = re.search(r"Project \[([^\]]*)\]", range_subtree).group(1)
    assert "tokens" not in feed and "doc_id" in feed and "n_tok" in feed
    assert not re.search(r"Sort \[[^\]]*\], true", meta_plan)

    out = pack_sequences(docs, 256, n_buckets=4)
    plan = _plan(out)
    assert "BroadcastExchange" in plan                  # base offsets
    # the pinned offsets frame surfaces as an in-memory scan — the
    # checkpoint that keeps both consumers on one materialization
    assert "ExistingRDD" in plan
    # no GLOBAL sort anywhere (a bare Window.orderBy cumsum would show
    # Sort [...], true — the single-task funnel the two-phase form avoids)
    assert not re.search(r"Sort \[[^\]]*\], true", plan)
    # shuffle budget: seq_id hash (+ joins/broadcasts); the token
    # payload itself rides only the seq_id exchange at this scale
    assert plan.count("Exchange") <= 7


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast; the corpus side must not
    self-shuffle before the per-doc aggregate."""
    from apollon_spark.ml.curation import benchmark_split, contamination_check
    docs = synth_docs(spark, 16, whales=False)
    train, bench = benchmark_split(docs)
    plan = _plan(contamination_check(train, bench))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_packing_offsets_join_colocated_on_bucketed_docs(spark, tmp_path):
    """VERDICT r03 #3b: packing.py claims the offsets->tokens equi-join
    is co-located for free under the ingest stage's doc_id-bucketed
    layout. Pin it: on a bucketed docs table the token-payload side
    joins with NO Exchange (only the tiny offsets side shuffles to the
    bucket count — 1 hash exchange total), while the same join on an
    unbucketed frame pays a second, corpus-sized exchange."""
    from apollon_spark.operators.packing import _offsets
    from apollon_spark.storage import write_bucketed
    docs = synth_docs(spark, 64, whales=False)
    write_bucketed(docs, "pack_bdocs", ["doc_id"], 4, sort_cols=["n_tok"],
                   path=str(tmp_path / "pack_bdocs"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_bucketed = _plan(_offsets(spark.table("pack_bdocs"),
                                       n_buckets=4))
        plan_plain = _plan(_offsets(docs, n_buckets=4))
        assert plan_bucketed.count("Exchange hashpartitioning") == 1, \
            plan_bucketed
        assert plan_plain.count("Exchange hashpartitioning") == 2, \
            plan_plain
        # and the bucketed scan really is the join's direct child
        # subtree (bucket pruning metadata present, no exchange above)
        assert "SelectedBucketsCount" in plan_bucketed
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pack_bdocs")


def test_passage_spans_recomputes_not_checkpoints(spark):
    """duplicate_passage_spans consumes the window table twice (corpus
    aggregate + span join) and must RECOMPUTE it, not checkpoint it:
    the exploded table is ~7x the input bytes, so pinning it is the
    wrong trade (measured 78s pinned vs 45s recomputed at 17.7M
    windows) — the plan shows two numpy-kernel MapInPandas branches
    and NO checkpoint scan."""
    from apollon_spark.ml.dedup import duplicate_passage_spans
    from apollon_spark.tokenize import docs_from_documents
    docs = docs_from_documents(spark, "/root/testdata/sf0.001")
    plan = _plan(duplicate_passage_spans(docs, k=8, key="hash"))
    assert "ExistingRDD" not in plan, plan
    # exactly the two key-kernel branches (source is a pure SQL scan)
    assert plan.count("MapInPandas") == 2, plan


def test_semdedup_plan_shape(spark):
    """SemDeDup's scale claims, visible in the plan: no cartesian
    product anywhere (the pair search is an equi-join on cluster id),
    and the candidate self-join runs on the keys-only routing table —
    embedding payloads appear in the scoring joins, not the bucket
    join."""
    from apollon_spark.ml.semdedup import semantic_dup_pairs
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 8))
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(200, dtype="int64"),
        "embedding": list(vecs)}))
    pairs = semantic_dup_pairs(df, 0.5, centroids=vecs[:4])
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_passage_canonical_pick_is_aggregate_not_window(spark):
    """The keep-one canonical pick must be min-by-struct aggregation,
    never a per-pkey sorted window: one boilerplate k-gram with
    billions of occurrences would make `row_number() over
    partitionBy(pkey)` a full single-task sort (WindowGroupLimit only
    pushes `rank <= k`, not `rank > 1` complements), while the
    aggregate partial-combines the hot key map-side and leaves only a
    skew-splittable equi-join (VERDICT r04 #2). The only window in the
    plan is the per-doc island merge."""
    from apollon_spark.ml.dedup import passage_removal_spans
    from apollon_spark.tokenize import docs_from_documents
    docs = docs_from_documents(spark, "/root/testdata/sf0.001")
    plan = _plan(passage_removal_spans(docs, k=8, key="hash"))
    assert "row_number" not in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "pkey" not in line, line
    # the min(struct(doc_id, pos)) canonical aggregate is present
    assert "min(struct" in plan.replace("_minstruct", ""), plan


def test_em_two_iter_docs_plan_is_one_arrow_pass(spark):
    """The 2-iteration EM training unroll (the r05 hmm gate kernel)
    must stay the per-doc shuffle-free shape: Scan -> Project ->
    [spread_compact round-robin] -> ONE MapInPandas. No aggregation
    exchange, no join — both EM iterations and the quantized handoff
    run inside one Arrow pass per doc."""
    from apollon_spark.hmm import em_two_iter_docs
    from apollon_spark.tokenize import docs_from_documents
    docs = docs_from_documents(spark, "/root/testdata/sf0.001")
    out = em_two_iter_docs(docs, (16.0, 128.0),
                           ((0.75, 0.25), (0.375, 0.625)), (0.5, 0.5))
    plan = _plan(out)
    assert plan.count("MapInPandas") == 1, plan
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan
    # the only exchange is the deliberate small-input spread
    assert plan.count("Exchange") <= 1, plan


def test_cluster_and_group_canonical_picks_are_aggregates(spark):
    """The dup-cluster and SemDeDup-group canonical picks must be
    min-by-struct aggregates, not per-key row_number windows: both
    PROJECT the rank into a keep column (no rank<=k filter follows),
    so WindowGroupLimit can never bound them and a billion-member
    duplicate cluster/group would serialize into one task's sort —
    the passage-pick scale-killer class (VERDICT r04 #2), closed for
    all three canonical picks in r05."""
    import pandas as pd

    from apollon_spark.ml.dedup import resolve_dup_clusters
    from apollon_spark.ml.semdedup import semantic_dedup
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [str(i) for i in range(8)],
        "n_tok": [5, 6, 7, 8, 9, 10, 11, 12]}))
    pairs = spark.createDataFrame(pd.DataFrame({
        "id_a": ["0", "2"], "id_b": ["1", "3"]}))
    plan = _plan(resolve_dup_clusters(docs, pairs))
    assert "row_number" not in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "cluster_id" not in line, line
    assert "min(struct" in plan, plan

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8))
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(40, dtype="int64"),
        "embedding": list(vecs)}))
    plan = _plan(semantic_dedup(emb, 0.5, centroids=vecs[:4]))
    assert "row_number" not in plan, plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "group_id" not in line, line
