"""Deduplication operators for large-scale training-data pipelines.

All hash families use explicit integer arithmetic (no engine-native
hash functions) so results are deterministic and reproducible in plain
ANSI SQL — important both for the correctness oracle and for
cross-engine lineage audits.

Scale notes: exact dedup is one hash-shuffle; MinHash-LSH turns the
O(n^2) pair problem into |bands| equi-join buckets (the classic
shingle -> minhash -> band -> bucket-join pipeline); SimHash gives a
64-bit near-dup key that can be prefix-bucketed.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE = 2_147_483_647          # 2^31 - 1
_A0, _B0 = 1_103_515_245, 12_345  # LCG-style deterministic hash params


def hash_params(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine hash family
    h_j(x) = (a_j * x + b_j) mod (2^31 - 1)."""
    out = []
    a, b = _A0 + seed, _B0 + seed
    for _ in range(n_hashes):
        a = (a * 40_014) % (MERSENNE - 1) + 1
        b = (b * 40_692 + 1) % MERSENNE
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per distinct content value; returns the
    surviving rows plus ``dup_count``.

    Scale shape: groups and joins on ``sha2(content, 256)`` — a
    32-byte key — so the shuffles never carry the raw content (at
    100 TB a groupBy on the text column would shuffle the whole corpus
    twice). 256-bit collisions are negligible (~2^-128 at any corpus
    size); the raw content survives only in the final projection."""
    key = F.unhex(F.sha2(F.col(content_col).cast("string"), 256))
    hashed = df.withColumn("__content_h", key)
    groups = (
        hashed.select("__content_h", id_col)
        .groupBy("__content_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
    )
    return (hashed.join(groups, ["__content_h", id_col], "inner")
            .drop("__content_h"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature_col(arr: Column, n_hashes: int, seed: int = 7) -> Column:
    """MinHash signature of an array<int> column: for each hash j,
    min over elements of (a_j * x + b_j) mod (2^31-1). Pure array SQL
    (JVM-side), no UDF.

    Implemented as ONE fold over the array carrying all n_hashes
    running minima (indexed zip_with lambda). The naive form —
    n_hashes separate ``array_min(transform(arr, ...))`` projections —
    re-inlines ``arr``'s expression per hash and measured 300x slower
    at sf0.1 once ``arr`` was itself a shingle transform."""
    params = hash_params(n_hashes, seed)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    acc0 = F.array_repeat(F.lit(MERSENNE + 1).cast("long"), n_hashes)
    idx = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    return F.aggregate(
        arr, acc0,
        lambda acc, x: F.zip_with(
            acc, idx,
            lambda m, j: F.least(
                m, (F.element_at(a_arr, j + 1) * x.cast("long")
                    + F.element_at(b_arr, j + 1)) % MERSENNE)))


def token_shingles(arr: Column, k: int) -> Column:
    """k-gram shingles of an array<int> column, each folded to one int
    via a rolling polynomial hash (mod 2^31-1). Docs shorter than k
    yield an empty shingle array (F.sequence(1, n-k+1) would otherwise
    DESCEND through 0 and hit the 1-based element_at)."""
    def fold(i: Column) -> Column:
        acc = F.lit(0).cast("long")
        for j in range(k):
            acc = (acc * 1_000_003 + F.element_at(arr, i + j).cast("long")) % MERSENNE
        return acc
    n = F.size(arr)
    return F.when(
        n >= k, F.transform(F.sequence(F.lit(1), n - (k - 1)), fold)
    ).otherwise(F.array().cast("array<long>"))


def minhash_docs(docs: DataFrame, n_hashes: int = 16, shingle_k: int = 3,
                 seed: int = 7, id_col: str = "doc_id",
                 arr_col: str = "tokens") -> DataFrame:
    """(id, signature array<long>) over token shingles.

    Arrow-vectorized numpy kernel (exact same int64 arithmetic as the
    SQL form — tested equal). Catalyst's higher-order functions are
    CodegenFallback (interpreted), which made the pure-SQL fold 20-100x
    slower under a Generate; the batched numpy path is the hot path,
    ``minhash_signature_col`` remains for SQL composition.

    Precondition: tokens must be NON-NEGATIVE. numpy's ``%`` returns
    the sign of the divisor while Spark/DuckDB ``%`` returns the sign
    of the dividend, so the bit-identical-to-SQL claim (and the DuckDB
    oracle) holds only for tokens >= 0 — true for every tokenizer id
    space this engine targets (and asserted for the fixtures in
    tests/test_dedup.py). Same applies to ``simhash_docs``."""
    import numpy as np
    import pandas as pd

    params = hash_params(n_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)
    k = shingle_k

    def gen(batches):
        for pdf in batches:
            ids, sigs = [], []
            for rid, toks in zip(pdf[id_col], pdf[arr_col]):
                t = np.asarray(toks, dtype=np.int64)
                if t.size < k:
                    continue
                sh = t[:t.size - k + 1] % MERSENNE
                for j in range(1, k):
                    sh = (sh * 1_000_003 + t[j:t.size - k + 1 + j]) % MERSENNE
                hv = (a_vec[None, :] * sh[:, None] + b_vec[None, :]) % MERSENNE
                ids.append(rid)
                sigs.append(hv.min(axis=0))
            if ids:   # an all-short batch yields nothing (an empty
                      # frame would carry untyped columns Arrow rejects)
                yield pd.DataFrame({id_col: ids, "signature": sigs})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, arr_col).mapInPandas(
        gen, f"{id_col} {id_type}, signature array<long>")


def _band_sigs(sigs: DataFrame, n_bands: int, id_col: str,
               keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, [keep_cols...,] band, band_sig) — signature sliced into
    n_bands keys; ``keep_cols`` ride along (e.g. the full signature
    for estimator scoring without a second corpus join)."""
    return sigs.select(
        id_col, *keep_cols,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.slice(
                    "signature",
                    b * (F.size("signature") / n_bands).cast("int") + 1,
                    (F.size("signature") / n_bands).cast("int")),
            )).alias("band", "band_sig"))


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int,
                        id_col: str = "doc_id") -> DataFrame:
    """Band the signatures and self-join on (band, band-signature) —
    the bucket join that replaces the O(n^2) comparison. Returns
    distinct candidate pairs (id_a < id_b)."""
    banded = _band_sigs(sigs, n_bands, id_col)
    # materialize before the self-join: otherwise each side recomputes
    # the signature stage — two full corpus scans for keys that are a
    # few longs per (doc, band). LAZY localCheckpoint (MEMORY_AND_DISK
    # blocks): same no-CacheManager-leak property as eager (blocks are
    # reference-GC'd with the returned frame), but the materialization
    # happens inside the one join job that consumes it instead of as a
    # separate synchronous job up front — measured 25% faster at sf0.1
    # (eager 1.01s vs lazy 0.77s vs no-checkpoint double-compute
    # 1.06s; the r03 eager switch was the BENCH_r03 lsh_pairs drift).
    # Eager stays only where TWO separate jobs must see one
    # materialization (packing offsets, the CC loop). Tradeoff
    # unchanged: truncated lineage means a lost executor fails the job
    # instead of recomputing (batch-retry is the recovery path).
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col(f"a.band") == F.col("b.band"))
               & (F.col("a.band_sig") == F.col("b.band_sig"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs_between(sigs_new: DataFrame, sigs_all: DataFrame,
                                n_bands: int,
                                id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs where at least one side is in
    ``sigs_new`` (which must be a subset of ``sigs_all``): bands each
    side and equi-joins new-banded x all-banded on (band, band_sig) —
    per-batch cost scales with the NEW side's bucket collisions, never
    a store-vs-store self-join. Pairs are normalized to id_a < id_b
    (a new-new pair appears from both orientations and dedups)."""
    a = _band_sigs(sigs_new, n_bands, id_col).alias("a")
    b = _band_sigs(sigs_all, n_bands, id_col).alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_sig") == F.col("b.band_sig"))
               & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
        .select(F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
                .alias("id_a"),
                F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
                .alias("id_b"))
        .distinct()
    )


def signature_est_jaccard_udf():
    """Arrow-batched MinHash-agreement estimator: fraction of equal
    signature slots, one numpy comparison per batch instead of an
    interpreted ``aggregate(zip_with(...))`` fold per pair (the
    measured 20-100x HOF-vs-numpy penalty; the SQL fold is kept as the
    oracle form in tests/test_dedup.py)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def est(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if not len(sa):
            return pd.Series([], dtype="float64")
        a = np.stack(sa.to_numpy())
        b = np.stack(sb.to_numpy())
        return pd.Series((a == b).mean(axis=1))

    return est


def jaccard_col(arr_a: Column, arr_b: Column) -> Column:
    """Exact Jaccard over distinct elements (verification step after
    LSH candidate generation)."""
    da, db = F.array_distinct(arr_a), F.array_distinct(arr_b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    union = F.size(F.array_union(da, db)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup_pairs(docs: DataFrame, n_hashes: int = 16,
                        n_bands: int = 4, shingle_k: int = 3,
                        threshold: float = 0.7, seed: int = 7,
                        id_col: str = "doc_id",
                        arr_col: str = "tokens") -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH buckets ->
    exact-Jaccard verify on shingle sets. Returns (id_a, id_b, jaccard)
    pairs above threshold."""
    # signatures via the batched-numpy path (bit-identical to the SQL
    # fold, tested; the fold is interpreted CodegenFallback — the
    # measured 20-100x penalty); shingle sets are recomputed only for
    # the exact-verify join, where the candidate set is small
    sigs = minhash_docs(docs, n_hashes, shingle_k, seed, id_col, arr_col)
    cands = lsh_candidate_pairs(sigs, n_bands, id_col)
    sh = docs.select(id_col, token_shingles(F.col(arr_col), shingle_k)
                     .alias("shingles"))
    a = sh.select(F.col(id_col).alias("id_a"),
                  F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"),
                  F.col("shingles").alias("sh_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b",
                jaccard_col(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(arr: Column, n_bits: int = 32) -> Column:
    """SimHash over an array<int> column: element x is mixed by a
    Knuth multiplier, then each bit votes +-1; the sign vector is the
    fingerprint. Pure integer SQL."""
    mixed = F.transform(
        arr, lambda x: (x.cast("long") * 2_654_435_761) % 4_294_967_296)
    bits = []
    for b in range(n_bits):
        vote = F.aggregate(
            mixed, F.lit(0).cast("long"),
            lambda acc, m: acc + F.when(
                m.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1))
        bits.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bits[0]
    for bit in bits[1:]:
        out = out + bit
    return out.cast("long")


def simhash_docs(docs: DataFrame, n_bits: int = 32, id_col: str = "doc_id",
                 arr_col: str = "tokens") -> DataFrame:
    """(id, sh) SimHash fingerprints — Arrow-vectorized numpy kernel
    with exactly the same integer arithmetic as ``simhash_col``
    (tested equal). The SQL form runs n_bits interpreted
    ``F.aggregate`` folds per row (Catalyst HOFs are CodegenFallback,
    the same 20-100x penalty measured for minhash); this is the hot
    path, ``simhash_col`` remains for SQL composition and the
    oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(n_bits, dtype=np.int64)
        for pdf in batches:
            ids, shs = [], []
            for rid, toks in zip(pdf[id_col], pdf[arr_col]):
                t = np.asarray(toks, dtype=np.int64)
                mixed = (t * 2_654_435_761) % 4_294_967_296
                bits = (mixed[:, None] >> shifts) & 1        # (n, n_bits)
                votes = (2 * bits - 1).sum(axis=0)
                sh = int(((votes > 0).astype(np.int64) << shifts).sum())
                ids.append(rid)
                shs.append(sh)
            if ids:
                yield pd.DataFrame({id_col: ids, "sh": shs})

    # preserve the caller's id type (long ids must stay long: a string
    # schema would both crash Arrow conversion and make downstream
    # id_a < id_b comparisons lexicographic)
    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, arr_col).mapInPandas(
        gen, f"{id_col} {id_type}, sh long")


def hamming_distance_col(a: Column, b: Column, n_bits: int = 32) -> Column:
    """Popcount of XOR via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      n_bits: int = 32, n_blocks: int | None = None,
                      id_col: str = "doc_id",
                      arr_col: str = "tokens") -> DataFrame:
    """Near-dup pairs by SimHash with EXACT recall: the fingerprint is
    split into ``n_blocks`` (default ``max_hamming + 1``) bit-slices —
    by pigeonhole, any pair within ``max_hamming`` flipped bits agrees
    EXACTLY on at least one block (Manku/Jain/Sarma, WWW'07 §3), so a
    bucket equi-join on (block, block_value) finds every qualifying
    pair. Candidate generation stays an equi-join (n_blocks rows per
    doc, never a product); Hamming is verified exactly inside buckets.

    The r01/r02 single-prefix probe missed any pair whose differing
    bits touched the prefix (~59% of hamming-3 pairs at 8/32 prefix
    bits); recall is now 1.0 by construction
    (tests/test_dedup.py::test_simhash_near_dups_recall_is_exact)."""
    n_blocks = n_blocks if n_blocks is not None else max_hamming + 1
    n_blocks = max(1, min(n_blocks, n_bits))
    if n_blocks <= max_hamming:
        raise ValueError(
            f"n_blocks={n_blocks} <= max_hamming={max_hamming}: the "
            "pigeonhole guarantee needs at least max_hamming+1 blocks")
    sh = simhash_docs(docs, n_bits, id_col, arr_col)
    # block widths: n_bits split as evenly as possible
    base_w, extra = divmod(n_bits, n_blocks)
    block_exprs, off = [], 0
    for i in range(n_blocks):
        w = base_w + (1 if i < extra else 0)
        block_exprs.append(
            F.shiftright("sh", off).bitwiseAND(F.lit((1 << w) - 1)))
        off += w
    blocks = sh.select(
        id_col, "sh",
        F.posexplode(F.array(*block_exprs)).alias("blk", "bval"))
    # materialize before the self-join — without this each side
    # recomputes the per-token simhash UDF stage (same rationale and
    # tradeoff as lsh_candidate_pairs above)
    blocks = blocks.localCheckpoint(eager=True)
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.bval") == F.col("b.bval"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                hamming_distance_col(F.col("a.sh"), F.col("b.sh"), n_bits)
                .alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact, for candidate sets / small scopes)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, arr_col: str, k: int,
                        threshold: float, scope: Column | None = None) -> DataFrame:
    """All-pairs k-gram Jaccard above threshold. O(n^2) within the
    optional ``scope`` filter — use LSH first at scale."""
    base = df.where(scope) if scope is not None else df
    sh = base.select(id_col,
                     F.array_distinct(token_shingles(F.col(arr_col), k))
                     .alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                jaccard_col(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Exact duplicate-passage detection (substring-granular dedup)
# ---------------------------------------------------------------------------
#
# Doc-level dedup misses the common web-corpus failure mode: distinct
# documents sharing long verbatim spans (boilerplate, licenses, quoted
# articles). The published remedy is exact substring deduplication
# (Lee et al., "Deduplicating Training Data Makes Language Models
# Better", ACL 2022 — suffix arrays over the corpus). This engine
# implements the fixed-granularity variant that maps onto Spark
# primitives: every length-k token window gets a content key; a window
# whose key occurs in >= min_docs distinct docs is a duplicated
# passage. Consecutive duplicated window starts merge into maximal
# spans downstream (a trainer cuts [pos, pos+k) unions).
#
# Key functions: "md5" builds the key as md5 of the comma-joined
# tokens — byte-identical in Spark and DuckDB, so the whole operator
# value-oracles; "hash" is a batched-numpy 64-bit polynomial rolling
# hash (8-byte keys, the cheaper shuffle and ~100x cheaper key
# computation at corpus scale; no DuckDB twin, pytest-parity against
# the md5 path instead).


def _passage_keys_expr(k: int, key: str) -> str:
    if key != "md5":
        raise ValueError(f"unknown expr key {key!r}")
    gram = (f"transform(slice(tokens, i + 1, {k}), "
            "x -> cast(x as string))")
    return (f"transform(sequence(0, n_tok - {k}), "
            f"i -> md5(concat_ws(',', {gram})))")


_ROLL_A = np.uint64(1099511628211)       # FNV-1a prime, odd => bijective *A


def _rolling_keys(t: np.ndarray, k: int) -> np.ndarray:
    """Vectorized 64-bit polynomial window keys over an int token
    array: key_i = sum_j t[i+j] * A^(k-1-j) mod 2^64 (uint64
    wraparound IS the modulus — no bigint, no strings). Content-equal
    windows always collide; adversarial engineered collisions are
    possible in a linear hash, which is why the md5 path stays the
    exactness/oracle form."""
    w = np.lib.stride_tricks.sliding_window_view(
        t.astype(np.uint64), k)
    weights = _ROLL_A ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    return (w * weights[None, :]).sum(axis=1, dtype=np.uint64) \
        .view(np.int64)


def _doc_passages(docs: DataFrame, k: int, key: str) -> DataFrame:
    """(doc_id, pos, pkey): one row per length-k token window.

    ``key="md5"`` stays a pure column expression (cross-engine oracle
    parity). ``key="hash"`` runs the batched-numpy rolling-hash kernel
    in one mapInPandas: the nested higher-order-function form
    (transform(sequence) over transform(slice) + concat_ws +
    xxhash64) is CodegenFallback-interpreted and built a string per
    window — measured 267s for 59.5M windows at the sf1 spot-bench
    (~4.5 µs/window); the numpy kernel is pure uint64 arithmetic over
    strided views (same 20-100x HOF-vs-numpy penalty the minhash
    kernel documents)."""
    if key == "md5":
        return (docs.where(F.col("n_tok") >= k)
                .select("doc_id",
                        F.posexplode(F.expr(_passage_keys_expr(k, key)))
                        .alias("pos", "pkey")))
    if key != "hash":
        raise ValueError(f"unknown key {key!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
                t = np.asarray(toks, dtype="int64")
                if t.size < k:
                    continue
                keys = _rolling_keys(t, k)
                out.append(pd.DataFrame({
                    "doc_id": np.repeat(doc_id, keys.size),
                    "pos": np.arange(keys.size, dtype="int32"),
                    "pkey": keys}))
            if out:
                yield pd.concat(out, ignore_index=True)

    from ..session import spread_compact
    src = spread_compact(docs.select("doc_id", "tokens"))
    return src.mapInPandas(gen, "doc_id string, pos int, pkey long")


def _dup_table(passages: DataFrame, min_docs: int) -> DataFrame:
    return (passages.groupBy("pkey")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occur"))
            .where(F.col("n_docs") >= min_docs))


def duplicate_passages(docs: DataFrame, k: int = 16, key: str = "hash",
                       min_docs: int = 2) -> DataFrame:
    """Corpus-wide duplicated-passage table: (pkey, n_docs, n_occur)
    for every length-k window content appearing in >= ``min_docs``
    distinct docs.

    Scale: the window explosion is O(tokens) rows carrying only
    (doc_id, key) — the irreducible cost of exact substring dedup;
    the groupBy(pkey) combines map-side and its output is bounded by
    the number of DISTINCT duplicated contents, which on real corpora
    is orders of magnitude below the window count."""
    return _dup_table(_doc_passages(docs, k, key), min_docs)


def duplicate_passage_spans(docs: DataFrame, k: int = 16,
                            key: str = "hash",
                            min_docs: int = 2) -> DataFrame:
    """Per-doc duplicated window starts: (doc_id, pos, n_docs,
    n_occur) for every position whose length-k window content is
    shared with >= ``min_docs``-1 other docs. Consecutive positions
    form the maximal spans a trainer masks or cuts.

    Scale: the window table feeds BOTH the corpus aggregate and the
    span join and is RECOMPUTED for each — deliberately the opposite
    of the lsh_candidate_pairs checkpoint pattern. The banded LSH keys
    are far SMALLER than the corpus, so pinning them wins; the
    exploded window table is ~7x the INPUT bytes (one ~30 B row per
    token), so materializing it costs more than running the cheap
    numpy key kernel twice — measured at 17.7M windows: spans 78s
    with a lazy checkpoint vs 45s recomputing (the checkpoint write +
    two reads of the blown-up table dominate). The join against the
    (much smaller) duplicated-content table is a pkey equi-join
    co-partitioned with the groupBy that produced it; plan-tested to
    carry no checkpoint scan."""
    p = _doc_passages(docs, k, key)
    return (p.join(_dup_table(p, min_docs), "pkey")
            .select("doc_id", "pos", "n_docs", "n_occur"))


def merge_passage_spans(spans: DataFrame, k: int) -> DataFrame:
    """Merge duplicated window STARTS into maximal NON-OVERLAPPING
    token spans per doc (the intervals a trainer actually cuts): two
    k-windows starting at p and q (p < q) overlap or touch whenever
    q - p <= k, so an island breaks only when the gap between
    consecutive starts EXCEEDS k — not merely when starts stop being
    consecutive (start-adjacency islands produced OVERLAPPING spans
    for gaps in (1, k], which double-counted coverage in
    ``passage_dup_stats`` and broke the 'maximal' contract). The
    island covers tokens [min(pos), max(pos) + k).

    Returns (doc_id, span_start, span_end, n_windows); span_end is
    EXCLUSIVE, spans are disjoint with > k - 1 uncovered tokens
    between them, and n_windows counts the merged starts.

    Scale: one window over (doc_id)-partitioned span starts — the
    DUPLICATED subset, not the corpus — then a groupBy on the island
    key; both shuffle feature-scale rows."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    islands = spans.select(
        "doc_id", "pos",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).alias("_isl"))
    return (islands.groupBy("doc_id", "_isl")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + k).alias("span_end"),
                 F.count("*").alias("n_windows"))
            .drop("_isl")
            .select("doc_id", "span_start", "span_end", "n_windows"))


def passage_dup_stats(docs: DataFrame, k: int = 16, key: str = "hash",
                      min_docs: int = 2) -> DataFrame:
    """Per-doc duplication coverage (the curation filter signal): the
    fraction of a doc's tokens lying inside a duplicated span.

    Returns (doc_id, n_tok, n_dup_tokens, dup_frac) for EVERY doc
    (0.0 when nothing is duplicated). Computed from the MERGED spans,
    so overlapping windows are not double-counted."""
    spans = duplicate_passage_spans(docs, k, key, min_docs)
    merged = merge_passage_spans(spans, k)
    per_doc = (merged.groupBy("doc_id")
               .agg(F.sum(F.col("span_end") - F.col("span_start"))
                    .alias("n_dup_tokens")))
    return (docs.select("doc_id", "n_tok")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id", "n_tok",
                F.coalesce("n_dup_tokens", F.lit(0)).alias("n_dup_tokens"))
            .withColumn(
                "dup_frac",
                F.when(F.col("n_tok") > 0,
                       # spans can run past n_tok only if pos+k does,
                       # which the window construction forbids
                       F.col("n_dup_tokens").cast("double")
                       / F.col("n_tok").cast("double"))
                .otherwise(F.lit(0.0))))


def passage_removal_spans(docs: DataFrame, k: int = 16,
                          key: str = "hash",
                          min_docs: int = 2) -> DataFrame:
    """The spans a trainer actually CUTS (Lee et al. ACL'22 keep-one
    semantics): every duplicated window occurrence EXCEPT one
    canonical occurrence per content — deterministically the globally
    first by (doc_id, pos) — merged into maximal per-doc token spans.

    Returns (doc_id, span_start, span_end, n_windows), span_end
    exclusive — feed to ``excise_passages``.

    Keep-one is per-content BEST-EFFORT, not a survival guarantee:
    a content's canonical occurrence can still fall inside ANOTHER
    content's cut span (k=2 example: docs [x,y] / [x,y,z] / [y,z,q] —
    (y,z)'s canonical home in the middle doc is itself cut as a
    non-canonical (x,y) occurrence, so (y,z) survives nowhere). What
    IS guaranteed UNDER ``key="md5"``: a token is only ever cut when
    its window content verifiably appears elsewhere in the corpus,
    and the cut set is a deterministic function of the corpus. The
    default ``key="hash"`` trades that guarantee for speed: it keys
    windows by a 64-bit linear rolling hash, so a hash collision
    marks a non-duplicated window as duplicated and the cut silently
    removes clean tokens — at trillion-token scale birthday
    collisions are EXPECTED (~n²/2⁶⁵ colliding window pairs), so
    destructive cuts at that scale should pass ``key="md5"`` (the
    CLI exposes ``--passage-key``). Resolving the keep-one
    interaction exactly requires the suffix-array maximal-match
    machinery of the original paper, out of scope for the fixed-k
    variant.

    Scale: the canonical pick is a map-side-combinable
    ``groupBy(pkey).agg(min(struct(doc_id, pos)))`` — struct ordering
    is lexicographic by field, so min-by-struct IS "globally first by
    (doc_id, pos)" — followed by the same co-partitioned pkey
    equi-join the span machinery already uses, filtered to
    occurrences != canonical. The r04 form (`row_number() over
    Window.partitionBy(pkey)` filtered to rank > 1) was a named
    scale-killer: one boilerplate k-gram with billions of occurrences
    is a full sort of a single hot partition in one task, and Spark's
    WindowGroupLimit pushdown only bounds `rank <= k` limits, never
    `rank > 1` complements. The aggregate form partial-aggregates the
    hot key on every map task, and the residual hot-key JOIN (1
    canon row vs n_occur rows) is skew-splittable by AQE — windows
    are not. Everything upstream is the duplicate_passage_spans
    machinery."""
    p = _doc_passages(docs, k, key)
    occ = p.join(_dup_table(p, min_docs).select("pkey"), "pkey")
    canon = (occ.groupBy("pkey")
             .agg(F.min(F.struct("doc_id", "pos")).alias("_c")))
    noncanon = (occ.join(canon, "pkey")
                .where((F.col("doc_id") != F.col("_c.doc_id"))
                       | (F.col("pos") != F.col("_c.pos")))
                .select("doc_id", "pos"))
    return merge_passage_spans(noncanon, k)


def excise_passages(docs: DataFrame,
                    spans: DataFrame) -> DataFrame:
    """Cut (exclusive-end) token spans out of each doc: returns the
    doc row with ``tokens`` rewritten as the in-order concatenation of
    the complement slices, ``n_tok`` updated, ``n_removed`` appended
    (a pre-existing ``n_removed`` column is summed in, so chained
    excisions compose cleanly and report CUMULATIVE tokens removed),
    and EVERY OTHER doc column (source etc.) carried through — the
    output keeps the canonical docs shape so it feeds the downstream
    stages (mixing stratifies on source, packing reads n_tok) without
    a manual re-join. Docs with no spans pass through (n_removed = 0).
    Compose with ``passage_removal_spans`` for Lee et al.'s
    remove-all-but-one substring dedup; note the paper's own caveat
    applies — cutting can create NEW adjacencies, so one pass is not
    a fixed point.

    Scale: spans collapse to one tiny per-doc list (span-scale
    groupBy); the token payload moves ONCE through the left join +
    Arrow pass; the pass-through columns rejoin on doc_id (one
    id-keyed shuffle of the token-free remainder)."""
    span_lists = (spans.groupBy("doc_id")
                  .agg(F.sort_array(F.collect_list(F.struct(
                      F.col("span_start").alias("s"),
                      F.col("span_end").alias("e")))).alias("_spans")))
    src = (docs.select("doc_id", "tokens")
           .join(span_lists, "doc_id", "left"))

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, toks, sp in zip(pdf["doc_id"], pdf["tokens"],
                                        pdf["_spans"]):
                t = np.asarray(toks, dtype="int32")
                if sp is None or len(sp) == 0:
                    out.append((doc_id, t, len(t), 0))
                    continue
                keep = np.ones(len(t), dtype=bool)
                for iv in sp:
                    keep[iv["s"]:iv["e"]] = False
                kept = t[keep]
                out.append((doc_id, kept, len(kept),
                            int(len(t) - len(kept))))
            if out:
                yield pd.DataFrame(out, columns=[
                    "doc_id", "tokens", "n_tok", "n_removed"])

    out = src.mapInPandas(
        cut, "doc_id string, tokens array<int>, n_tok int, n_removed int")
    # n_removed is excluded from the passthrough (it is THIS pass's
    # output column): composing a second excision on a frame that
    # still carries a prior pass's n_removed would otherwise emit two
    # ambiguous n_removed columns. A prior count is instead SUMMED
    # into the new column, so chained excisions report cumulative
    # tokens removed (what excise_to_fixpoint totals by hand).
    prior = "n_removed" in docs.columns
    passthru = [c for c in docs.columns
                if c not in ("doc_id", "tokens", "n_tok", "n_removed")]
    if passthru or prior:
        right_cols = passthru + (["n_removed"] if prior else [])
        right = docs.select(
            "doc_id", *[F.col(c).alias(f"_prior_{c}" if c == "n_removed"
                                       else c) for c in right_cols])
        out = out.join(right, "doc_id")
        if prior:
            out = (out.withColumn(
                "n_removed", F.col("n_removed") + F.col("_prior_n_removed"))
                .drop("_prior_n_removed"))
    return out


def excise_to_fixpoint(docs: DataFrame, k: int = 16, key: str = "hash",
                       min_docs: int = 2, max_rounds: int = 8,
                       stats: dict | None = None) -> DataFrame:
    """Iterate ``passage_removal_spans`` + ``excise_passages`` until
    NO duplicated k-window remains (cutting creates new adjacencies
    across the seams, so one pass is not a fixed point — the caveat on
    ``excise_passages``). Terminates because every round with spans
    strictly removes tokens; each round eager-localCheckpoints the cut
    corpus (truncates the compounding join lineage, same device as the
    CC loops) and the emptiness probe is a LIMIT-1 count, not a full
    aggregate.

    Raises RuntimeError when ``max_rounds`` is exhausted with spans
    still present — a partially-deduped corpus returned silently would
    be the same corruption mode the CC loops guard against. ``stats``
    (optional dict) receives {"rounds": n, "tokens_removed": m} for
    THIS run only: a pre-existing ``n_removed`` column on the input
    (a prior excision's output) is dropped at entry, else
    ``excise_passages``'s cumulative-sum passthrough would fold the
    prior run's removals into round 0's total."""
    cur = docs.drop("n_removed") if "n_removed" in docs.columns else docs
    removed_total = 0
    for r in range(max_rounds + 1):
        spans = passage_removal_spans(cur, k, key, min_docs)
        if spans.limit(1).count() == 0:
            if stats is not None:
                stats["rounds"] = r
                stats["tokens_removed"] = removed_total
            return cur
        if r == max_rounds:
            break
        cut = excise_passages(cur, spans)
        cut = cut.localCheckpoint(eager=True)
        removed_total += cut.agg(F.sum("n_removed")).first()[0] or 0
        cur = cut.drop("n_removed")
    raise RuntimeError(
        f"excise_to_fixpoint: duplicated {k}-windows still present "
        f"after {max_rounds} rounds ({removed_total} tokens removed) "
        f"— raise max_rounds or k")


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates
# ---------------------------------------------------------------------------

def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<double>`` columns in pure array
    SQL (JVM-side fold, no Python): dot / (|a| * |b|). Zero-norm
    vectors yield 0.0 (under ANSI mode a bare division would abort the
    whole job on one degenerate row)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    denom = na * nb
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def cosine_near_dups(vectors: DataFrame, id_col: str, vec_col: str,
                     threshold: float, scope: Column | None = None) -> DataFrame:
    """Exact all-pairs embedding-cosine near-dup mining above
    ``threshold``. O(n^2) within the optional ``scope`` — the
    correctness baseline; use ``cosine_near_dups_lsh`` at scale."""
    base = vectors.where(scope) if scope is not None else vectors
    v = base.select(F.col(id_col).cast("long").alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    sim = F.round(cosine_col(F.col("va"), F.col("vb")), 6)
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", sim.alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def cosine_near_dups_lsh(vectors: DataFrame, id_col: str, vec_col: str,
                         threshold: float, n_planes: int = 8,
                         n_bands: int = 4, seed: int = 11) -> DataFrame:
    """Scale path: sign-hyperplane LSH candidate generation, then exact
    cosine on candidates only. Each band hashes the embedding with
    ``n_planes`` random hyperplanes; a pair is a candidate when it
    collides in ANY band, so the self-join runs on (band, bucket) keys
    instead of n^2. Candidate volume is bounded by bucket collisions;
    raise n_planes to tighten buckets, n_bands to raise recall. Recall
    is probabilistic (standard SimHash-LSH behavior), exactness only of
    the final cosine filter.

    Hot paths are vectorized: ALL band buckets come from one
    (n_bands*n_planes, dim) matmul per Arrow batch, and candidate
    scoring is one einsum per batch — no per-row SQL folds."""
    weights = (1 << np.arange(n_planes)).astype("int64")

    v = vectors.select(F.col(id_col).cast("long").alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"))

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # hyperplanes derived per-worker from (seed, dim) — identical
        # everywhere, no driver-side first() job, and an empty input
        # just yields nothing
        pl = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy())
            if pl is None:
                pl = np.random.default_rng(seed).standard_normal(
                    (n_bands * n_planes, x.shape[1]))
            bits = (x @ pl.T >= 0).reshape(len(pdf), n_bands, n_planes)
            bkts = bits @ weights                       # (n, n_bands)
            # keys only: the vector payloads stay out of the candidate
            # join/dedup shuffles and are joined back once per pair
            yield pd.DataFrame({
                "id": np.repeat(pdf["id"].to_numpy(), n_bands),
                "band": np.tile(np.arange(n_bands, dtype="int32"),
                                len(pdf)),
                "bkt": bkts.ravel()})

    ids = v.mapInPandas(bucketize, "id long, band int, bkt long")
    # materialize the keys table before the self-join: without this,
    # each join side recomputes the bucketize stage — i.e. TWO full
    # corpus scans (vectors and all) to build keys that are ~20 bytes
    # per (doc, band). LAZY localCheckpoint = MEMORY_AND_DISK blocks
    # (spills instead of evicting) that are reference-GC'd with the
    # frame — no CacheManager entry to leak across repeated calls —
    # materialized inside the join job itself rather than as an extra
    # synchronous job (see lsh_candidate_pairs: the eager variant was
    # the BENCH_r03 drift).
    ids = ids.localCheckpoint(eager=False)
    a, b = ids.alias("a"), ids.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkt") == F.col("b.bkt"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    cand = (pairs
            .join(v.select(F.col("id").alias("id_a"),
                           F.col("v").alias("va")), "id_a")
            .join(v.select(F.col("id").alias("id_b"),
                           F.col("v").alias("vb")), "id_b"))

    from .simsearch import _cos_sim_udf
    cos_sim = _cos_sim_udf()

    return (cand.select("id_a", "id_b",
                        F.round(cos_sim("va", "vb"), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components + canonical pick)
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, max_iter: int = 25,
                         algorithm: str = "propagate",
                         stats: dict | None = None) -> DataFrame:
    """Connected components over an undirected pair list
    (``id_a``, ``id_b``): returns (node, cluster_id) where cluster_id
    is the lexicographically smallest node id reachable from ``node``.
    Only nodes that appear in a pair are returned.

    ``algorithm="propagate"`` (default): iterative min-label
    propagation with pointer jumping — each round every node takes the
    min of its own label, its neighbors' labels, and its label's label
    (path halving). Plain propagation needs O(diameter) rounds; the
    pointer-jump join cuts that to O(log d). Near-dup components are
    band-collision cliques, so observed convergence is 2-3 rounds.

    ``algorithm="star"``: the large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — same equi-join primitive, provably O(log^2 n) rounds
    and per-round edge count never grows, the safe choice for
    adversarial long-chain graphs (e.g. a 10^12-edge crawl graph with
    transitively-chained near-dups). tests/test_dedup.py pins a
    10^4-node path graph converging well inside the round budget.

    Every round materializes via eager localCheckpoint: truncates the
    iterative lineage (else the plan doubles per round) and gives the
    convergence-check count and next round one shared execution.
    Deterministic: min() over node ids, no sampling, no rng.

    Raises RuntimeError if the round budget is exhausted before
    convergence — partially-propagated labels are silent corruption
    (wrong cluster ids downstream), so a loud stop is the only safe
    behavior (ADVICE r03). ``stats`` (optional dict) receives
    {"rounds": n} for scale diagnostics (SCALE.md appendix).
    """
    if algorithm == "star":
        return _cc_star(pairs, max_iter, stats=stats)
    edges = (pairs.select(F.col("id_a").alias("src"),
                          F.col("id_b").alias("dst"))
             .union(pairs.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    changed = -1
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = (edges.join(labels.withColumnRenamed("node", "dst"), "dst")
               .groupBy("src").agg(F.min("label").alias("nbr_label"))
               .withColumnRenamed("src", "node"))
        stepped = (labels.join(nbr, "node", "left")
                   .select("node",
                           F.least("label", F.coalesce("nbr_label",
                                                       "label"))
                           .alias("label"), F.col("label").alias("_old")))
        # pointer jump: label <- label(label)
        jump = (labels.select(F.col("node").alias("label"),
                              F.col("label").alias("jmp_label")))
        nxt = (stepped.join(jump, "label", "left")
               .select("node",
                       F.least("label", F.coalesce("jmp_label", "label"))
                       .alias("label"), "_old")
               .localCheckpoint(eager=True))
        changed = nxt.where(F.col("label") != F.col("_old")).count()
        labels = nxt.drop("_old")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components: labels did not converge within "
            f"{max_iter} rounds ({changed} still changing) — raise "
            f"max_iter or use algorithm='star' for long-chain graphs")
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", F.col("label").alias("cluster_id"))


def _cc_star(pairs: DataFrame, max_iter: int = 25,
             stats: dict | None = None) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14, Algorithm "Two-Phase"). Each round:

    * large-star — for every node u with (symmetrized) neighborhood
      N(u): connect every STRICTLY LARGER neighbor v > u to
      m = min(N(u) ∪ {u});
    * small-star — orient every edge toward its smaller endpoint,
      then for every u: connect every neighbor (all now ≤ u) and u
      itself to m = min(N(u) ∪ {u}).

    Both steps preserve connectivity and never increase the edge
    count; at the fixed point every component is a star centered on
    its minimum node, so the final (v, m) edges ARE the labels.
    Convergence is screened with an order-insensitive edge-set
    checksum (count + bit_xor of xxhash64 — XOR can't overflow under
    ANSI mode and edges are distinct, so it's a set checksum); a
    checksum match then triggers ONE exact set-equality check
    (equal counts + one-sided exceptAll empty) before the loop
    accepts the fixed point, so a ~2^-64 checksum collision costs an
    extra round instead of silently wrong labels.

    Raises RuntimeError when the round budget is exhausted (same
    loud-stop contract as the propagate loop).
    """
    # canonical undirected, dedup'd, self-loop-free pair list
    edges = (pairs.select(
        F.least("id_a", "id_b").alias("u"),
        F.greatest("id_a", "id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True))

    def checksum(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h")
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    prev = checksum(edges)
    prev_edges = edges
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star over symmetrized adjacency
        sym = edges.union(edges.select(F.col("v").alias("u"),
                                       F.col("u").alias("v")))
        mins = (sym.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        large = (sym.join(mins, "u")
                 .where(F.col("v") > F.col("u"))
                 .select(F.least("v", "m").alias("u"),
                         F.greatest("v", "m").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct())
        # small-star on edges oriented toward the larger endpoint:
        # group by the larger node; all its listed neighbors are <= it
        oriented = large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        smins = (oriented.groupBy("u")
                 .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        small = (oriented.join(smins, "u")
                 .select(F.explode(F.array("u", "v")).alias("n"), "m")
                 .select(F.least("n", "m").alias("u"),
                         F.greatest("n", "m").alias("v"))
                 .where(F.col("u") != F.col("v"))
                 .distinct()
                 .localCheckpoint(eager=True))
        edges = small
        cur = checksum(edges)
        if cur == prev:
            # exact verification of the screened fixed point: counts
            # already match, so one-sided exceptAll-empty proves set
            # equality (both frames are distinct'd)
            if prev_edges.exceptAll(edges).limit(1).count() == 0:
                converged = True
                break
        prev = cur
        prev_edges = edges
    if not converged:
        raise RuntimeError(
            f"connected_components(star): edge set did not reach a "
            f"fixed point within {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    # fixed point = stars around component minima: (u=min, v=member)
    members = edges.select(F.col("v").alias("node"),
                           F.col("u").alias("cluster_id"))
    roots = (edges.select(F.col("u").alias("node")).distinct()
             .withColumn("cluster_id", F.col("node")))
    # nodes seen ONLY in self-pairs were dropped by the u != v
    # canonicalization; return them as singletons so both algorithms
    # honor the same "every node that appears in a pair" contract
    touched = edges.select("u").union(edges.select(F.col("v").alias("u")))
    selfonly = (pairs.where(F.col("id_a") == F.col("id_b"))
                .select(F.col("id_a").alias("node")).distinct()
                .join(touched.distinct()
                      .withColumnRenamed("u", "node"), "node",
                      "left_anti")
                .withColumn("cluster_id", F.col("node")))
    return members.union(roots).union(selfonly)


def resolve_dup_clusters(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         size_col: str = "n_tok",
                         max_iter: int = 25,
                         algorithm: str = "propagate") -> DataFrame:
    """Full dedup verdict per doc: group near-dup ``pairs`` into
    clusters (connected components) and pick one canonical doc per
    cluster — the standard resolution step after any pair miner
    (exact, MinHash-LSH, SimHash, embedding-cosine).

    Returns (id_col, cluster_id, cluster_size, keep) covering EVERY
    doc: docs in no pair form singleton clusters with keep=1. The
    canonical doc is the one with the largest ``size_col`` (ties:
    smallest id) — "keep the longest version" curation semantics.

    Scale: components run over the pair list only (candidate-scale,
    not corpus-scale); the verdict join back to docs is one shuffle on
    the id. The canonical pick and cluster_size are ONE map-side-
    combinable ``groupBy(cluster_id)`` aggregate (min-by-struct over
    (-size, id) — lexicographic struct ordering IS "largest size,
    ties smallest id") joined back on cluster_id. The r04 form was a
    per-cluster ``row_number()`` window with the rank PROJECTED into
    the keep column — no rank filter follows, so Spark's
    WindowGroupLimit cannot bound it, and one boilerplate page
    duplicated a billion times would have been a single task's full
    sort (the same scale-killer class as the passage canonical pick,
    VERDICT r04 #2); the aggregate form partial-combines the hot
    cluster map-side and the residual join is AQE skew-splittable.
    """
    comp = connected_components(
        pairs.select(F.col("id_a").cast("string").alias("id_a"),
                     F.col("id_b").cast("string").alias("id_b")),
        max_iter=max_iter, algorithm=algorithm)
    base = (docs.select(F.col(id_col), F.col(size_col))
            .join(comp.withColumnRenamed("node", id_col), id_col, "left")
            .select(id_col, size_col,
                    F.coalesce("cluster_id", F.col(id_col))
                    .alias("cluster_id")))
    canon = (base.groupBy("cluster_id")
             .agg(F.count("*").alias("cluster_size"),
                  F.min(F.struct((-F.col(size_col)).alias("ns"),
                                 F.col(id_col).alias("cid")))
                  .alias("_c")))
    return (base.join(canon, "cluster_id")
            .select(id_col, "cluster_id", "cluster_size",
                    (F.col("_c.cid") == F.col(id_col)).cast("int")
                    .alias("keep")))
