"""Text curation stats."""
import pandas as pd
from pyspark.sql import functions as F

from apollon_spark.ml.textstats import (fingerprint_col, lang_id_col,
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


def test_fingerprint_order_sensitive(spark):
    pdf = pd.DataFrame({"id": [1, 2, 3],
                        "arr": [[1, 2, 3], [3, 2, 1], [1, 2, 3]]})
    out = spark.createDataFrame(pdf).select(
        "id", fingerprint_col(F.col("arr")).alias("fp")).toPandas() \
        .set_index("id")
    assert out.loc[1, "fp"] == out.loc[3, "fp"]
    assert out.loc[1, "fp"] != out.loc[2, "fp"]
