"""Sequence packing (concat-and-chunk) vs a numpy oracle.

The invariant under test is the BASELINE input_hint's per-row
contract: flattening the packed sequences in seq_id order reproduces
the source corpus token-for-token (exact integer equality, no
tolerance)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from apollon_spark.operators.packing import (doc_seq_slices, pack_profile,
                                             pack_sequences)


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(d, list(map(int, t)), len(t)) for d, t in rows],
        schema="doc_id string, tokens array<int>, n_tok int")


def _numpy_pack(rows, ctx):
    """Oracle: concat in doc_id order, chunk into ctx-sized windows."""
    flat, bounds = [], []
    for d, t in sorted(rows):
        bounds.append((d, len(flat), len(flat) + len(t)))
        flat.extend(t)
    seqs = {}
    for s in range(0, len(flat), ctx):
        sid = s // ctx
        docs_in = [d for d, a, b in bounds
                   if a < min(s + ctx, len(flat)) and b > s and a != b]
        seqs[sid] = (flat[s:s + ctx], docs_in)
    return flat, seqs


FIXTURE = [
    ("d3", [7, 8, 9, 10, 11]),
    ("d1", [1, 2, 3]),
    ("d2", [4, 5, 6]),
    ("d5", []),                      # empty doc contributes nothing
    ("d4", list(range(20, 49))),     # long doc spanning several seqs
]


@pytest.mark.parametrize("ctx", [1, 4, 8, 64])
def test_pack_exact_token_equality(spark, ctx):
    df = _docs_df(spark, FIXTURE)
    packed = pack_sequences(df, ctx).orderBy("seq_id").collect()
    flat, seqs = _numpy_pack([(d, t) for d, t in FIXTURE], ctx)
    assert len(packed) == len(seqs)
    rebuilt = []
    for row in packed:
        want_tokens, want_docs = seqs[row["seq_id"]]
        assert list(row["tokens"]) == want_tokens, row["seq_id"]
        assert row["n_tok"] == len(want_tokens)
        assert row["n_docs"] == len(want_docs)
        assert row["first_doc"] == want_docs[0]
        assert row["last_doc"] == want_docs[-1]
        rebuilt.extend(row["tokens"])
    assert rebuilt == flat                       # corpus round-trip
    sizes = [r["n_tok"] for r in packed]
    assert all(s == ctx for s in sizes[:-1])     # only the tail is short
    assert 0 < sizes[-1] <= ctx


def test_pack_offsets_match_global_sort(spark):
    """Two-phase offsets == the naive global-window cumsum."""
    from apollon_spark.operators.packing import _offsets
    rng = np.random.RandomState(7)
    rows = [(f"doc_{i:04d}", rng.randint(0, 256, rng.randint(0, 30)).tolist())
            for i in range(200)]
    df = _docs_df(spark, rows)
    got = {r["doc_id"]: r["off"]
           for r in _offsets(df, n_buckets=8).collect()}
    acc, want = 0, {}
    for d, t in sorted(rows):
        want[d] = acc
        acc += len(t)
    assert got == want


def test_pack_random_corpus_roundtrip(spark):
    rng = np.random.RandomState(11)
    rows = [(f"doc_{i:04d}", rng.randint(0, 256, rng.randint(0, 40)).tolist())
            for i in range(120)]
    ctx = 13
    df = _docs_df(spark, rows)
    packed = pack_sequences(df, ctx, n_buckets=8).orderBy("seq_id").collect()
    flat = [x for _, t in sorted(rows) for x in t]
    rebuilt = [x for r in packed for x in r["tokens"]]
    assert rebuilt == flat


def test_pack_profile_matches_arrays(spark):
    df = _docs_df(spark, FIXTURE)
    prof = {r["seq_id"]: r for r in pack_profile(df, 8).collect()}
    for row in pack_sequences(df, 8).collect():
        p = prof[row["seq_id"]]
        toks = list(row["tokens"])
        assert p["tok_sum"] == sum(toks)
        assert p["tok_wsum"] == sum(x * (i + 1) for i, x in enumerate(toks))
        assert p["n_tok"] == len(toks)
        assert p["n_docs"] == row["n_docs"]


def test_pack_empty_and_tiny(spark):
    empty = _docs_df(spark, [])
    assert pack_sequences(empty, 8).count() == 0
    one = _docs_df(spark, [("a", [5])])
    got = pack_sequences(one, 1024).collect()
    assert len(got) == 1 and list(got[0]["tokens"]) == [5]


def test_doc_seq_slices_row_count(spark):
    """Shuffle rows are O(docs + crossings), not O(tokens)."""
    df = _docs_df(spark, FIXTURE)
    n_rows = doc_seq_slices(df, 8).count()
    flat, seqs = _numpy_pack([(d, t) for d, t in FIXTURE], 8)
    want = sum(len(docs) for _, docs in seqs.values())
    assert n_rows == want
    assert n_rows < len(flat)                    # strictly sub-token


def test_pack_boundaries_metadata(spark):
    """boundaries = each contributing doc's start offset in the
    sequence, ascending, starting at the carry-in (offset 0 when a doc
    spans in from the previous sequence)."""
    df = _docs_df(spark, FIXTURE)
    ctx = 8
    flat, seqs = _numpy_pack([(d, t) for d, t in FIXTURE], ctx)
    starts = {}
    acc = 0
    for d, t in sorted((d, t) for d, t in FIXTURE if t):
        starts[d] = acc
        acc += len(t)
    for row in pack_sequences(df, ctx).collect():
        s = row["seq_id"] * ctx
        want = [max(starts[d] - s, 0) for d in seqs[row["seq_id"]][1]]
        assert list(row["boundaries"]) == want, row["seq_id"]
        assert row["boundaries"][0] == 0 or starts[row["first_doc"]] >= s


def test_pack_roundtrip_property(spark):
    """Property-based round-trip: for ANY corpus shape (empty docs,
    docs much longer than ctx, ctx=1), flattening the packed
    sequences in seq_id order reproduces concat-in-doc_id-order
    exactly, and every sequence except the tail is full. Few examples
    (each runs real Spark jobs), wide generator instead."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    doc_lens = st.lists(st.integers(min_value=0, max_value=70),
                        min_size=0, max_size=25)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(lens=doc_lens, ctx=st.integers(min_value=1, max_value=32),
           seed=st.integers(min_value=0, max_value=2**31 - 1))
    def prop(lens, ctx, seed):
        rng = np.random.RandomState(seed)
        rows = [(f"doc_{i:03d}", rng.randint(0, 999, n).tolist())
                for i, n in enumerate(lens)]
        packed = (pack_sequences(_docs_df(spark, rows), ctx, n_buckets=4)
                  .orderBy("seq_id").collect())
        flat = [x for _, t in sorted(rows) for x in t]
        rebuilt = [x for r in packed for x in r["tokens"]]
        assert rebuilt == flat
        sizes = [r["n_tok"] for r in packed]
        assert all(s == ctx for s in sizes[:-1])
        if sizes:
            assert 0 < sizes[-1] <= ctx
        assert [r["seq_id"] for r in packed] == list(range(len(packed)))

    prop()


def test_pack_offsets_partial_range_sampling(spark):
    """Regression: with >~100 rows per range partition the boundary
    sampler goes partial and re-samples per execution — offsets must
    still be exact (the cumsum frame is pinned before its two
    consumers read it)."""
    from apollon_spark.operators.packing import _offsets
    n = 20_000
    df = spark.range(n).selectExpr(
        "printf('doc_%07d', id) AS doc_id",
        "array(cast(id % 251 as int)) AS tokens",
        "cast(1 as int) AS n_tok")
    got = {r["doc_id"]: r["off"]
           for r in _offsets(df, n_buckets=16).select("doc_id", "off").collect()}
    assert len(got) == n
    for i in (0, 1, 9_999, 19_998, n - 1):
        assert got[f"doc_{i:07d}"] == i
    assert sorted(got.values()) == list(range(n))


def test_pack_raises_on_duplicate_doc_ids(spark):
    """Repeated doc_ids (a mixture-resampled corpus fed straight to
    packing) would fan out through the offsets equi-join and silently
    multiply token payloads — observed 52x inflation on a 70-copy
    mixture. The cumsum kernel detects adjacent duplicates (equal
    keys land in one sorted range partition) and raises instead."""
    import pandas as pd
    import pytest as _pytest

    from apollon_spark.operators.packing import pack_sequences
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "b", "a", "c"],
        "tokens": [[1, 2], [3], [1, 2], [4, 5]],
        "n_tok": [2, 1, 2, 2]}))
    with _pytest.raises(Exception, match="duplicate doc_id"):
        pack_sequences(docs, ctx_len=4).count()
