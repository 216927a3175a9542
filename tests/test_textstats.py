"""Text curation stats."""
import pandas as pd
from pyspark.sql import functions as F

from apollon_spark.ml.textstats import (SCRUB_PATTERNS, fingerprint_col,
                                        lang_id_col, scrub_text,
                                        text_profile)


def test_text_profile(spark):
    pdf = pd.DataFrame({
        "doc_id": ["1", "2", "3"],
        "text": ["the cat and the dog of a house in is",
                 "der hund und die katze ist nicht ein",
                 "zzz qqq www"]})
    out = text_profile(spark.createDataFrame(pdf)).toPandas() \
        .set_index("doc_id")
    assert out.loc["1", "lang_pred"] == "en"
    assert out.loc["2", "lang_pred"] == "de"
    assert out.loc["3", "lang_pred"] == "und"
    assert out.loc["1", "n_words"] == 10
    assert (out["quality"] >= 0).all() and (out["quality"] <= 1).all()


def test_scrub_text(spark):
    pdf = pd.DataFrame({
        "doc_id": ["1", "2", "3", "4"],
        "text": [
            "mail me at jane.doe+spam@example.co.uk today",
            "see https://example.com/a?b=1 and http://t.co/xyz",
            "server 10.0.0.1 called 12345678901 twice",
            "clean text with no pii at all",
        ]})
    out = scrub_text(spark.createDataFrame(pdf)).toPandas() \
        .set_index("doc_id")
    assert out.loc["1", "text_scrubbed"] == "mail me at <EMAIL> today"
    assert out.loc["1", "n_email"] == 1
    assert out.loc["2", "text_scrubbed"] == "see <URL> and <URL>"
    assert out.loc["2", "n_url"] == 2
    assert out.loc["3", "text_scrubbed"] == "server <IP> called <NUM> twice"
    assert out.loc["3", "n_ip"] == 1 and out.loc["3", "n_digits"] == 1
    assert out.loc["4", "text_scrubbed"] == out.loc["4", "text"]
    assert (out.loc["4", ["n_email", "n_url", "n_ip", "n_digits"]] == 0).all()


def test_scrub_precedence(spark):
    """URLs (incl. mailto: and userinfo forms) mask whole before the
    email pass runs, so a URL with an embedded address becomes one
    <URL> — not scheme + <EMAIL> + path fragments; digits inside an
    already-masked URL are not re-masked."""
    pdf = pd.DataFrame({
        "doc_id": ["1", "2"],
        "text": [
            "write mailto:bob@corp.io or https://x.io/12345678901",
            "fetch https://user@example.com/path then email me@site.org",
        ]})
    out = (scrub_text(spark.createDataFrame(pdf)).toPandas()
           .set_index("doc_id"))
    assert out.loc["1", "text_scrubbed"] == "write <URL> or <URL>"
    assert out.loc["1", "n_url"] == 2 and out.loc["1", "n_email"] == 0
    assert out.loc["1", "n_digits"] == 0
    # the ADVICE r03 case: userinfo URL stays one URL, bare email still
    # masks as email
    assert out.loc["2", "text_scrubbed"] == "fetch <URL> then email <EMAIL>"
    assert out.loc["2", "n_url"] == 1 and out.loc["2", "n_email"] == 1


def test_scrub_duckdb_parity(spark):
    """The patterns are RE2-compatible by design: DuckDB's
    regexp_replace(g)/len-diff count over the same strings must produce
    identical scrubbed text and counts (the same property the oracle
    gate relies on for text SQL)."""
    import duckdb
    texts = [
        "a@b.io and c.d-e@f.org meet at https://ex.com/p?q=1#frag",
        "ip 192.168.1.255 vs version 1.2.3 and num 9876543210",
        "edge: http://trailing.dot/. then a@b.c.",
        "userinfo https://bob@ex.com/p and mailto:eve@ex.org ok",
        "nothing here",
    ]
    sdf = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = scrub_text(sdf).toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    expr = "text"
    cnts = []
    for kind, pat, repl in SCRUB_PATTERNS:
        cnts.append(
            f"len(regexp_extract_all({expr}, '{pat}')) AS n_{kind}")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = con.execute(
        f"SELECT {expr} AS text_scrubbed, {', '.join(cnts)} FROM t"
    ).fetchdf()
    assert got["text_scrubbed"].tolist() == want["text_scrubbed"].tolist()
    for kind, _, _ in SCRUB_PATTERNS:
        assert got[f"n_{kind}"].tolist() == want[f"n_{kind}"].tolist(), kind


def test_fingerprint_order_sensitive(spark):
    pdf = pd.DataFrame({"id": [1, 2, 3],
                        "arr": [[1, 2, 3], [3, 2, 1], [1, 2, 3]]})
    out = spark.createDataFrame(pdf).select(
        "id", fingerprint_col(F.col("arr")).alias("fp")).toPandas() \
        .set_index("id")
    assert out.loc[1, "fp"] == out.loc[3, "fp"]
    assert out.loc[1, "fp"] != out.loc[2, "fp"]
