"""Sequence packing: concatenate pre-tokenized docs in deterministic
doc_id order and re-chunk into fixed-context training sequences
(the canonical "concat-and-chunk" LLM pre-training layout).

Semantics: let ``off(d)`` be the total token count of all docs with a
smaller doc_id. Token ``p`` of doc ``d`` has global position
``g = off(d) + p`` and lands in sequence ``g div ctx_len`` at offset
``g mod ctx_len``. Flattening all packed sequences in seq_id order
reproduces the source corpus token-for-token (BASELINE input_hint:
exact token-array equality is the per-row invariant — tested in
tests/test_packing.py against a numpy concat oracle).

Scale design (10^12 sequences):

* NO global window sort. A bare ``Window.orderBy("doc_id")`` cumsum
  funnels the corpus through one task. Offsets are computed in two
  phases instead: one range shuffle partitions docs by doc_id, a
  per-partition Arrow pass computes local cumsums (zero extra
  shuffle), and the B per-partition totals (B = #partitions, driver
  side, tiny) are prefix-summed and broadcast back. Output offsets
  are independent of where the sampled range boundaries fall.
* NO per-token explosion. Each doc contributes one row per training
  sequence it overlaps (1 + crossings), carrying an array slice —
  shuffle rows are O(docs + boundary crossings), not O(tokens), and
  the shuffled payload is the corpus token data exactly once (the
  irreducible cost of repacking).
* Per-seq state is bounded by ctx_len (collect_list of slices whose
  sizes sum to <= ctx_len), so no group can blow an executor.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _meta_cumsum(docs: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Un-materialized per-partition cumsum frame
    (doc_id, n_tok, _pid, _loc_off) over the tokens-free meta
    projection, range-partitioned by doc_id. Exposed separately so the
    plan test can pin the range shuffle's properties (the public path
    checkpoints this frame, which truncates its visible plan)."""
    n_buckets = n_buckets or max(
        docs.sparkSession.sparkContext.defaultParallelism, 1)
    meta = (docs.select("doc_id", "n_tok")
            .repartitionByRange(n_buckets, "doc_id")
            .sortWithinPartitions("doc_id"))

    out_schema = T.StructType(meta.schema.fields + [
        T.StructField("_pid", T.IntegerType()),
        T.StructField("_loc_off", T.LongType()),
    ])

    def cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        running = 0
        prev_id = None
        for pdf in batches:
            # duplicate-doc_id guard, O(1) on top of the pass we are
            # already making: the range partitioner sends equal keys
            # to one partition and the partition is sorted, so any
            # duplicate is ADJACENT here. A repeated doc_id (e.g. a
            # mixture-resampled corpus fed straight to packing) would
            # otherwise fan out through the offsets equi-join and
            # silently multiply token payloads — observed 52x
            # inflation on a 70-copy mixture. Make ids unique first
            # (the CLI sample stage suffixes '#copy').
            ids = pdf["doc_id"]
            dup = ids[ids.duplicated()]
            if len(dup) == 0 and prev_id is not None and len(ids) \
                    and ids.iloc[0] == prev_id:
                dup = ids.iloc[:1]
            if len(dup):
                raise ValueError(
                    f"pack_sequences: duplicate doc_id {dup.iloc[0]!r} "
                    f"in the input — packing requires unique doc ids "
                    f"(a resampled corpus must suffix its copies, see "
                    f"the CLI sample stage)")
            if len(ids):
                prev_id = ids.iloc[-1]
            n = pdf["n_tok"].astype("int64")
            loc = n.cumsum() - n + running
            running = int(running + n.sum())
            pdf = pdf.assign(_pid=pid, _loc_off=loc.astype("int64"))
            yield pdf

    return meta.mapInPandas(cumsum, schema=out_schema)


def _offsets(docs: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """(doc_id, tokens, n_tok, off) with off = sum of n_tok over all
    docs with a strictly smaller doc_id.

    The cumsum runs on a tokens-FREE (doc_id, n_tok) meta frame —
    ~16 B/doc — so the heavy token payload never rides the range
    shuffle and never crosses the Arrow boundary for bookkeeping:
    one tiny range shuffle + per-partition Arrow cumsum (no window
    shuffle) + a B-row driver-side prefix sum broadcast back, then
    one equi-join attaches offsets to the token arrays (co-located
    for free when docs use the ingest stage's doc_id-bucketed
    layout). The cumsum frame is eagerly localCheckpointed below, so
    the meta pass executes ONCE; its two consumers (totals collect,
    offsets join) both read the pinned result."""
    # materialize ONCE before the two consumers: repartitionByRange
    # re-samples its boundaries on every execution (the sample seed
    # varies per job), so without pinning, a row's _pid in the offsets
    # join could disagree with the base offsets collected from the
    # totals job — silently corrupting offsets corpus-wide as soon as
    # partitions are big enough for partial range sampling (>~100
    # rows/partition). localCheckpoint trades executor-loss
    # recomputability for plan truncation, same call as dedup.py.
    local = _meta_cumsum(docs, n_buckets).localCheckpoint(eager=True)
    totals = {
        int(r["_pid"]): int(r["tot"])
        for r in local.groupBy("_pid").agg(F.sum("n_tok").alias("tot")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    spark = docs.sparkSession
    base_df = spark.createDataFrame(
        [(pid, b) for pid, b in base.items()] or [(0, 0)],
        schema="_pid int, _base long")
    offsets = (local.join(F.broadcast(base_df), "_pid")
               .select("doc_id",
                       (F.col("_base") + F.col("_loc_off")).alias("off")))
    return (docs.select("doc_id", "tokens", "n_tok")
            .join(offsets, "doc_id"))


def doc_seq_slices(docs: DataFrame, ctx_len: int,
                   n_buckets: int | None = None) -> DataFrame:
    """One row per (doc, overlapped training sequence):
    (doc_id, seq_id, pos_start, chunk) where ``chunk`` is the doc's
    token slice landing in ``seq_id`` starting at in-sequence offset
    ``pos_start``."""
    offd = _offsets(docs, n_buckets).where(F.col("n_tok") > 0)
    ctx = F.lit(int(ctx_len))
    first_seq = F.expr(f"off div {int(ctx_len)}")
    last_seq = F.expr(f"(off + n_tok - 1) div {int(ctx_len)}")
    ex = offd.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    start_g = F.greatest(F.col("seq_id") * ctx, F.col("off"))
    end_g = F.least((F.col("seq_id") + 1) * ctx, F.col("off") + F.col("n_tok"))
    return ex.select(
        "doc_id", "seq_id",
        (start_g - F.col("seq_id") * ctx).cast("int").alias("pos_start"),
        F.slice(F.col("tokens"), (start_g - F.col("off") + 1).cast("int"),
                (end_g - start_g).cast("int")).alias("chunk"))


def pack_sequences(docs: DataFrame, ctx_len: int,
                   n_buckets: int | None = None) -> DataFrame:
    """Pack the corpus into fixed-length training sequences.

    Returns (seq_id, tokens array<int> with size <= ctx_len — only the
    final sequence may be short — n_tok, n_docs, first_doc, last_doc,
    boundaries). ``boundaries`` lists each contributing doc's start
    offset within the sequence (boundaries[0] may be mid-doc carry-in
    at offset 0) — the metadata a trainer needs to build block-causal
    attention masks / reset position ids at document starts."""
    sl = doc_seq_slices(docs, ctx_len, n_buckets)
    parts = F.sort_array(F.collect_list(F.struct("pos_start", "doc_id", "chunk")))
    return (sl.groupBy("seq_id")
            .agg(parts.alias("parts"),
                 F.count("*").alias("n_docs"),
                 F.min_by("doc_id", "pos_start").alias("first_doc"),
                 F.max_by("doc_id", "pos_start").alias("last_doc"))
            .select(
                "seq_id",
                F.flatten(F.col("parts.chunk")).alias("tokens"),
                F.size(F.flatten(F.col("parts.chunk"))).cast("int").alias("n_tok"),
                "n_docs", "first_doc", "last_doc",
                F.col("parts.pos_start").alias("boundaries")))


def pack_profile(docs: DataFrame, ctx_len: int,
                 n_buckets: int | None = None) -> DataFrame:
    """Integer-exact per-sequence profile of the packed layout (the
    oracle-gate shape): token count, token sum, in-sequence
    position-weighted token sum (weight = pos_in_seq + 1), contributing
    doc count and first/last doc_id."""
    packed = pack_sequences(docs, ctx_len, n_buckets)
    t = F.col("tokens")
    wsum = F.aggregate(
        F.zip_with(t, F.sequence(F.lit(1), F.size(t)),
                   lambda x, i: x.cast("long") * i.cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    return packed.select(
        "seq_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.aggregate(t, F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("tok_sum"),
        wsum.alias("tok_wsum"),
        "n_docs", "first_doc", "last_doc")
