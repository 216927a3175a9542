"""Curation operators vs pure-python oracles (exact, no tolerance)."""
import hashlib
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from apollon_spark.ml.curation import (BENCH_SALT, MIX_SALT, RATE_SALT,
                                       STRAT_SALT, benchmark_split,
                                       contamination_check, doc_ngrams,
                                       repetition_metrics, sample_rate,
                                       sample_stratified, vocab_stats)


def _coin(doc_id: str, salt: str) -> str:
    return hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(3)
    rows = []
    for i in range(150):
        n = int(rng.randint(0, 40))
        toks = rng.randint(0, 256, n).tolist()
        rows.append((f"doc_{i:04d}", toks, n,
                     ["web", "book", "code"][i % 3]))
    # a doc that repeats a benchmark doc's content (guaranteed overlap)
    rows.append(("doc_copy", rows[0][1], rows[0][2], "web"))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    return df, rows


def _grams(toks, k, distinct=True):
    g = [sum(toks[i + j] * 256 ** (k - 1 - j) for j in range(k))
         for i in range(len(toks) - k + 1)]
    return set(g) if distinct else g


def test_doc_ngrams_exact(spark, corpus):
    df, rows = corpus
    got = {}
    for r in doc_ngrams(df, 3).collect():
        got.setdefault(r["doc_id"], set()).add(r["gram"])
    for d, toks, n, _ in rows:
        if n >= 3:
            assert got.get(d, set()) == _grams(toks, 3), d


def test_contamination_oracle(spark, corpus):
    df, rows = corpus
    bench_ids = {d for d, *_ in rows if _coin(d, BENCH_SALT)[0] == "0"}
    assert bench_ids, "fixture must produce a non-empty benchmark"
    train, bench = benchmark_split(df)
    assert {r["doc_id"] for r in bench.select("doc_id").collect()} == bench_ids
    out = {r["doc_id"]: r for r in contamination_check(train, bench).collect()}
    bench_grams = set()
    for d, toks, n, _ in rows:
        if d in bench_ids and n >= 3:
            bench_grams |= _grams(toks, 3)
    for d, toks, n, _ in rows:
        if d in bench_ids:
            assert d not in out
            continue
        g = _grams(toks, 3) if n >= 3 else set()
        r = out[d]
        assert r["n_grams"] == len(g)
        assert r["n_hit"] == len(g & bench_grams)
        want = len(g & bench_grams) / len(g) if g else 0.0
        assert r["hit_frac"] == want, d            # bit-exact single division


def test_sample_stratified_deterministic(spark, corpus):
    df, rows = corpus
    out = sample_stratified(df, quota=5).collect()
    per_src = Counter(r["source"] for r in out)
    assert all(v == 5 for v in per_src.values())
    for src in {s for *_, s in rows}:
        ids = sorted((_coin(d, STRAT_SALT), d)
                     for d, *_, s in rows if s == src)[:5]
        want = [d for _, d in ids]
        got = sorted((r["rk"], r["doc_id"]) for r in out if r["source"] == src)
        assert [d for _, d in got] == want


def test_sample_rate_threshold(spark, corpus):
    df, rows = corpus
    got = {r["doc_id"] for r in sample_rate(df, "4000").select("doc_id").collect()}
    want = {d for d, *_ in rows if _coin(d, RATE_SALT)[:4] < "4000"}
    assert got == want


def test_sample_rate_hex_normalized(spark, corpus):
    """Uppercase thresholds must behave identically to lowercase
    (md5 hex is lowercase; raw string-compare would silently skew the
    rate), and malformed thresholds must error loudly."""
    df, _ = corpus
    lo = {r["doc_id"] for r in sample_rate(df, "c000").select("doc_id").collect()}
    hi = {r["doc_id"] for r in sample_rate(df, "C000").select("doc_id").collect()}
    assert lo == hi and lo
    for bad in ("C00", "c0000", "zzzz", ""):
        with pytest.raises(ValueError):
            sample_rate(df, bad)


def test_sampling_coins_independent(spark, corpus):
    """Composed stages draw independent coins: sample_rate('1000')
    (keep md5-prefix < '1000', i.e. prefix '0') must NOT coincide
    with benchmark_split's prefix-'0' benchmark set — with a shared
    unsalted hash, every surviving doc of the composed pipeline would
    land in the benchmark and train would be empty."""
    df, rows = corpus
    kept = sample_rate(df, "1000")
    train, bench = benchmark_split(kept)
    n_kept, n_bench = kept.count(), bench.count()
    assert n_kept > 0
    assert train.count() > 0, "train empty => coins fully correlated"
    # the benchmark share of the sampled docs stays near 1/16
    assert n_bench < n_kept / 2


def test_vocab_stats_oracle(spark, corpus):
    df, rows = corpus
    occ, dfreq = Counter(), Counter()
    for d, toks, *_ in rows:
        occ.update(toks)
        dfreq.update(set(toks))
    ranked = sorted(occ, key=lambda t: (-occ[t], t))[:32]
    got = vocab_stats(df, 32).orderBy("rank").collect()
    assert [r["token"] for r in got] == ranked
    for r in got:
        assert r["n_occur"] == occ[r["token"]]
        assert r["n_docs"] == dfreq[r["token"]]


def test_repetition_metrics_oracle(spark, corpus):
    df, rows = corpus
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    for d, toks, n, _ in rows[:60] + [rows[-1]]:
        r = out[d]
        assert r["distinct_frac"] == (len(set(toks)) / n if n else 0.0)
        bi = Counter(_grams(toks, 2, distinct=False))
        assert r["top2_frac"] == (max(bi.values()) / sum(bi.values()) if bi else 0.0)
        tri = Counter(_grams(toks, 3, distinct=False))
        dup = sum(c for c in tri.values() if c > 1)
        assert r["dup3_frac"] == (dup / sum(tri.values()) if tri else 0.0)


def test_repetition_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [("rep", [1, 2] * 20, 40), ("ok", list(range(40)), 40)],
        "doc_id string, tokens array<int>, n_tok int")
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert out["rep"]["dup3_frac"] == 1.0
    assert out["ok"]["dup3_frac"] == 0.0
    assert out["rep"]["top2_frac"] > 0.4
    assert out["rep"]["distinct_frac"] == 2 / 40


def test_mixture_sample_oracle(spark, corpus):
    from apollon_spark.ml.curation import mixture_sample
    df, rows = corpus
    weights = {"web": 1.5, "book": 0.25, "code": 2.0}
    out = mixture_sample(df, weights).collect()
    got = Counter((r["source"], r["doc_id"]) for r in out)
    for r in out:
        assert 1 <= r["copy"] <= got[(r["source"], r["doc_id"])]
    for d, _, _, s in rows:
        w = weights[s]
        fw = int(w)
        thr = format(min(int((w - fw) * 65536), 65535), "04x")
        bonus = 1 if _coin(d, MIX_SALT)[:4] < thr else 0
        want = fw + bonus
        assert got.get((s, d), 0) == want, (d, s, w)
    # realized ratios track the weights on a uniform hash
    n_src = Counter(s for *_, s in rows)
    for s, w in weights.items():
        realized = sum(v for (src, _), v in got.items() if src == s) / n_src[s]
        assert abs(realized - w) < 0.35, (s, realized, w)


def test_mixture_sample_expected_counts_and_clamp(spark):
    """VERDICT r03 #6: expected copy counts across fractional weights
    on a large population (binomial 4-sigma bounds), plus the
    65535/65536 frac clamp edge: a weight of k + (1 - epsilon) must
    threshold at 'ffff' — keeping ~65535/65536 of the stratum — and
    NEVER overflow to a 5-hex-digit threshold that would corrupt the
    4-char string comparison."""
    from apollon_spark.ml.curation import mixture_sample
    n_per = 3000
    rows = [(f"d{s}_{i:05d}", [1], 1, s)
            for s in ("a", "b", "c") for i in range(n_per)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    weights = {"a": 0.5, "b": 1.25, "c": 2.9999999}  # c hits the clamp
    out = mixture_sample(df, weights).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    for s, w in weights.items():
        fw = int(w)
        frac = min(int((w - fw) * 65536), 65535) / 65536
        mean = n_per * (fw + frac)
        sd = (n_per * frac * (1 - frac)) ** 0.5
        assert abs(got[s] - mean) <= 4 * sd + 1, (s, got[s], mean, sd)
    # clamp edge exactly: threshold for c is 'ffff', so the only
    # dropped bonus coins are md5 prefixes equal to 'ffff'
    c_docs = [d for d, *_ in rows if d.startswith("dc")]
    drop = sum(1 for d in c_docs if _coin(d, MIX_SALT)[:4] >= "ffff")
    assert got["c"] == n_per * 3 - drop
    # determinism: a second run is identical
    out2 = mixture_sample(df, weights).groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in out2} == got


def test_contamination_hash_packing_large_vocab(spark):
    """VERDICT r03 #7: the xxhash64 packing path gives exact k-gram
    contamination on token ids far beyond the base-256 precondition
    (real tokenizer vocab sizes), k=5, against a pure-python
    tuple-set oracle."""
    rng = np.random.RandomState(17)
    k = 5
    docs_rows, bench_rows = [], []
    for i in range(60):
        n = int(rng.randint(0, 30))
        toks = rng.randint(0, 200_000, n).tolist()   # >> 256
        docs_rows.append((f"doc_{i:03d}", toks, n, "web"))
    for i in range(10):
        n = int(rng.randint(k, 20))
        toks = rng.randint(0, 200_000, n).tolist()
        bench_rows.append((f"bench_{i:02d}", toks, n, "eval"))
    # guaranteed overlap: one corpus doc embeds a benchmark doc
    docs_rows.append(("doc_copy", bench_rows[0][1] + [7, 7, 7],
                      bench_rows[0][2] + 3, "web"))
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    docs = spark.createDataFrame(docs_rows, schema)
    bench = spark.createDataFrame(bench_rows, schema)

    got = {r["doc_id"]: r for r in
           contamination_check(docs, bench, k=k, packing="hash").collect()}

    bench_grams = set()
    for _, toks, n, _ in bench_rows:
        bench_grams |= {tuple(toks[i:i + k]) for i in range(n - k + 1)}
    for d, toks, n, _ in docs_rows:
        grams = {tuple(toks[i:i + k]) for i in range(max(n - k + 1, 0))}
        r = got[d]
        assert r["n_grams"] == len(grams), d
        assert r["n_hit"] == len(grams & bench_grams), d
    assert got["doc_copy"]["n_hit"] > 0


def test_shuffle_corpus_deterministic_permutation(spark):
    """Global shuffle: reading partitions in order yields the md5
    permutation; deterministic across reruns; independent salts give
    different orders; packing on shuffle-key-prefixed ids packs the
    permuted corpus exactly (round-trip equality)."""
    import numpy as np

    from apollon_spark.ml.curation import shuffle_corpus, shuffle_key
    from apollon_spark.operators.packing import pack_sequences
    rng = np.random.RandomState(7)
    rows = [(f"doc_{i:04d}", rng.randint(0, 256, 5).tolist(), 5, "s")
            for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")

    def order_of(salt):
        sh = shuffle_corpus(docs, salt=salt, n_partitions=8)
        # partition-order read == the permutation: reattach the key
        # and verify global sortedness across partition boundaries
        pdf = (sh.withColumn("_k", shuffle_key(salt))
               .withColumn("_p", F.spark_partition_id())
               .toPandas())
        for p in range(8):
            part = pdf[pdf["_p"] == p]["_k"]
            assert part.is_monotonic_increasing        # sorted within
        bounds = pdf.groupby("_p")["_k"].agg(["min", "max"]).sort_index()
        assert (bounds["max"].values[:-1] <= bounds["min"].values[1:]).all()
        return pdf.sort_values(["_p"]).reset_index(drop=True)["doc_id"]

    o1, o2 = order_of("s1"), order_of("s1")
    assert o1.tolist() == o2.tolist()                  # deterministic
    assert o1.tolist() != order_of("s2").tolist()      # salt-independent
    assert sorted(o1.tolist()) == sorted(r[0] for r in rows)

    # pack in shuffled order via prefixed ids: flattening the packed
    # sequences replays the corpus in md5(doc_id) order exactly
    pref = docs.withColumn(
        "doc_id", F.concat(shuffle_key("s1"), F.lit(":"), F.col("doc_id")))
    packed = pack_sequences(pref, ctx_len=64).toPandas() \
        .sort_values("seq_id")
    flat = [t for toks in packed["tokens"] for t in toks]
    want_order = sorted(rows, key=lambda r: __import__("hashlib").md5(
        f"{r[0]}:s1".encode()).hexdigest())
    want = [t for r in want_order for t in r[1]]
    assert flat == want


def test_quality_filter_rules(spark):
    """Each Gopher rule trips on a doc violating exactly it; a clean
    doc passes everything (keep=1). All rules are word-level over the
    TEXT (not the mod-256 token ids — see the docstring), words split
    on whitespace runs, stopwords matched after punctuation strip."""
    import pandas as pd

    from apollon_spark.ml.curation import quality_filter

    rng = np.random.default_rng(11)

    def varied(n):
        # distinct-ish 4-7 letter words, stopword-seasoned
        out = []
        for i in range(n):
            if i % 9 == 0:
                out.append(["the", "and", "of", "is"][i % 4])
            else:
                out.append("".join(
                    chr(97 + c) for c in
                    rng.integers(0, 26, int(rng.integers(4, 8)))))
        return out

    clean = " ".join(varied(90))
    rows = [
        {"doc_id": "clean", "text": clean},
        # newline-separated words still count (whitespace-run split)
        {"doc_id": "newlines", "text": "\n".join(varied(90))},
        {"doc_id": "short", "text": "the fox ran far off and was fed"},
        {"doc_id": "wlen", "text": " ".join(["a"] * 58 + ["the", "and"])},
        {"doc_id": "symbols",
         "text": " ".join(["the##", "and..."] * 30 + varied(30))},
        {"doc_id": "nostop",
         "text": " ".join(f"w{i:03d}xx" for i in range(60))},
        # one phrase looped: distinct/top-bigram/dup-trigram all trip
        {"doc_id": "repeat",
         "text": " ".join(["the cat sat on the mat"] * 15)},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["doc_id"]: r.asDict() for r in quality_filter(df).collect()}

    assert out["clean"]["keep"] == 1
    assert all(out["clean"][c] for c in out["clean"] if c.startswith("ok_"))
    assert out["newlines"]["ok_len"] and out["newlines"]["keep"] == 1
    assert not out["short"]["ok_len"] and out["short"]["keep"] == 0
    assert not out["wlen"]["ok_wlen"] and out["wlen"]["keep"] == 0
    assert not out["symbols"]["ok_symbols"] and out["symbols"]["keep"] == 0
    assert not out["nostop"]["ok_stopwords"] and out["nostop"]["keep"] == 0
    rep = out["repeat"]
    assert not rep["ok_distinct"] and not rep["ok_dup3"] \
        and rep["keep"] == 0
    # a dominant bigram trips ok_top2 specifically
    top2 = spark.createDataFrame(pd.DataFrame([
        {"doc_id": "t2", "text": " ".join(["alpha beta"] * 40)}]))
    t2 = quality_filter(top2).collect()[0]
    assert not t2["ok_top2"] and t2["keep"] == 0
    # stopwords count through punctuation ('the;' etc.)
    punct = spark.createDataFrame(pd.DataFrame([
        {"doc_id": "p",
         "text": " ".join(["The;", "and,"] + varied(58))}]))
    pout = quality_filter(punct).collect()[0]
    assert pout["ok_stopwords"]
    # long docs are NOT doomed by the capped tokenizer: 1500 varied
    # words keep distinct_frac word-level
    long_doc = spark.createDataFrame(pd.DataFrame([
        {"doc_id": "long", "text": " ".join(varied(1500))}]))
    lout = quality_filter(long_doc).collect()[0]
    assert lout["ok_distinct"] and lout["keep"] == 1
    # thresholds are overridable
    loose = {r["doc_id"]: r["keep"]
             for r in quality_filter(df, min_words=5).collect()}
    assert loose["short"] == 1


def test_budget_mixture_weights(spark):
    """The planner's multipliers hit the token budget at the requested
    ratios (exact arithmetic check on the plan, realized-token check
    through mixture_sample within quantization + coin tolerance)."""
    import pandas as pd

    from apollon_spark.ml.curation import (budget_mixture_weights,
                                           mixture_sample)
    rng = np.random.default_rng(3)
    rows = []
    for i in range(400):
        src = ["web", "code", "books"][i % 3]
        n = int(rng.integers(20, 120))
        rows.append({"doc_id": f"d{i:04d}", "source": src,
                     "tokens": list(range(n)), "n_tok": n})
    df = spark.createDataFrame(pd.DataFrame(rows))
    supply = {r[0]: r[1] for r in
              df.groupBy("source").agg(F.sum("n_tok")).collect()}

    ratios = {"web": 0.5, "code": 0.3, "books": 0.2, "ghost": 0.4}
    budget = 30_000
    w = budget_mixture_weights(df, ratios, budget)
    assert "ghost" not in w                      # absent source dropped
    # exact plan arithmetic: multiplier * supply == budget * ratio/0.1+0.3+0.5
    tot = 0.5 + 0.3 + 0.2
    for s in ("web", "code", "books"):
        np.testing.assert_allclose(
            w[s] * supply[s], budget * ratios[s] / tot, rtol=1e-12)

    # realized tokens through mixture_sample land near the budget
    copies = mixture_sample(df, w)
    realized = (copies.join(df.select("doc_id", "n_tok"), "doc_id")
                .agg(F.sum("n_tok")).first()[0])
    assert abs(realized - budget) / budget < 0.15

    # oversubscription: a budget above total supply -> multipliers > 1
    big = budget_mixture_weights(df, {"web": 1.0}, supply["web"] * 3)
    assert big["web"] > 2.5

    import pytest as _pytest
    with _pytest.raises(ValueError):
        budget_mixture_weights(df, {"ghost": 1.0}, 1000)
    with _pytest.raises(ValueError):
        budget_mixture_weights(df, ratios, 0)


def test_ngram_lm_score(spark):
    """Bigram LM scoring matches a numpy oracle exactly (same counts,
    same add-alpha formula), ranks in-domain text above junk, and
    zero-fills docs too short for a bigram."""
    import math

    import pandas as pd

    from apollon_spark.ml.curation import ngram_lm_score
    rng = np.random.default_rng(5)
    # reference: a markov-ish in-domain stream over ids 0..15
    ref_rows = []
    for i in range(40):
        toks = [int(t) for t in
                np.cumsum(rng.integers(0, 3, 50)) % 16]
        ref_rows.append({"doc_id": f"r{i}", "tokens": toks,
                         "n_tok": len(toks)})
    ref = spark.createDataFrame(pd.DataFrame(ref_rows))
    doc_rows = [
        {"doc_id": "indomain",
         "tokens": [int(t) for t in np.cumsum(rng.integers(0, 3, 60)) % 16]},
        {"doc_id": "junk",
         "tokens": [int(t) for t in rng.integers(100, 256, 60)]},
        {"doc_id": "tiny", "tokens": [3]},
    ]
    for r in doc_rows:
        r["n_tok"] = len(r["tokens"])
    docs = spark.createDataFrame(pd.DataFrame(doc_rows))
    alpha, V = 0.1, 256
    got = {r["doc_id"]: r.asDict()
           for r in ngram_lm_score(docs, ref, alpha=alpha).collect()}

    # numpy oracle
    c2, c1 = {}, {}
    for r in ref_rows:
        t = r["tokens"]
        for a, b in zip(t, t[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    for r in doc_rows:
        t = r["tokens"]
        if len(t) < 2:
            assert got[r["doc_id"]]["n_bigrams"] == 0
            assert got[r["doc_id"]]["mean_logp"] == 0.0
            continue
        lps = [math.log((c2.get((a, b), 0) + alpha)
                        / (c1.get(a, 0) + alpha * V))
               for a, b in zip(t, t[1:])]
        want = sum(lps) / len(lps)
        assert got[r["doc_id"]]["n_bigrams"] == len(lps)
        np.testing.assert_allclose(got[r["doc_id"]]["mean_logp"], want,
                                   rtol=1e-12)
    assert got["indomain"]["mean_logp"] > got["junk"]["mean_logp"] + 1.0


def test_ngram_lm_score_large_vocab(spark):
    """Base-V packing scores real-vocab token ids exactly: ids >= 256
    with vocab_size=32000 match the numpy oracle; the base-256
    collision pair ((0,256) vs (1,0)) stays distinct; bad vocab_size
    rejects."""
    import math

    import pandas as pd
    import pytest as _pytest

    from apollon_spark.ml.curation import ngram_lm_score
    ref_rows = [
        {"doc_id": "r0", "tokens": [0, 256, 0, 256, 0, 256]},
        {"doc_id": "r1", "tokens": [1, 0, 1, 0]},
        {"doc_id": "r2", "tokens": [31999, 500, 31999, 500]},
    ]
    doc_rows = [{"doc_id": "d0", "tokens": [0, 256, 0, 1, 0, 31999, 500]}]
    for r in ref_rows + doc_rows:
        r["n_tok"] = len(r["tokens"])
    ref = spark.createDataFrame(pd.DataFrame(ref_rows))
    docs = spark.createDataFrame(pd.DataFrame(doc_rows))
    alpha, V = 0.1, 32000
    got = ngram_lm_score(docs, ref, alpha=alpha,
                         vocab_size=V).collect()[0]

    c2, c1 = {}, {}
    for r in ref_rows:
        t = r["tokens"]
        for a, b in zip(t, t[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    t = doc_rows[0]["tokens"]
    lps = [math.log((c2.get((a, b), 0) + alpha)
                    / (c1.get(a, 0) + alpha * V))
           for a, b in zip(t, t[1:])]
    assert got["n_bigrams"] == len(lps)
    np.testing.assert_allclose(got["mean_logp"], sum(lps) / len(lps),
                               rtol=1e-12)
    # (0,256) must not alias (1,0): their ref counts differ (3 vs 2)
    assert c2[(0, 256)] != c2[(1, 0)]
    with _pytest.raises(ValueError):
        ngram_lm_score(docs, ref, vocab_size=1)
    with _pytest.raises(ValueError):
        ngram_lm_score(docs, ref, vocab_size=4_000_000_000)


def test_ngram_lm_score_shuffle_fallback(spark):
    """VERDICT r04 #5: above broadcast_threshold observed-bigram rows
    the model joins must fall back to shuffle equi-joins (a 100k-vocab
    reference slice's observed-bigram table can outgrow any sane
    broadcast). With threshold=0 the scores must be IDENTICAL to the
    broadcast path, and the physical plan must not broadcast the
    bigram model."""
    import pandas as pd

    from apollon_spark.ml.curation import ngram_lm_score
    rng = np.random.default_rng(9)
    rows = []
    for i in range(20):
        toks = [int(t) for t in np.cumsum(rng.integers(0, 3, 40)) % 16]
        rows.append({"doc_id": f"d{i}", "tokens": toks,
                     "n_tok": len(toks)})
    ref = spark.createDataFrame(pd.DataFrame(rows[:10]))
    docs = spark.createDataFrame(pd.DataFrame(rows))

    bc = {r["doc_id"]: r.asDict()
          for r in ngram_lm_score(docs, ref).collect()}
    sh_df = ngram_lm_score(docs, ref, broadcast_threshold=0)
    sh = {r["doc_id"]: r.asDict() for r in sh_df.collect()}
    assert set(bc) == set(sh)
    for k in bc:
        assert bc[k]["n_bigrams"] == sh[k]["n_bigrams"]
        np.testing.assert_allclose(bc[k]["mean_logp"], sh[k]["mean_logp"],
                                   rtol=0, atol=1e-12)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # AQE may still auto-broadcast tiny test tables; disable so the
        # plan assertion reflects the hint decision, not table size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (ngram_lm_score(docs, ref, broadcast_threshold=0)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
