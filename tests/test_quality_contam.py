"""Repetition quality + contamination check: gram builder vs a Python
reference, planted boilerplate is flagged, planted benchmark overlap
is found, and clean docs stay clean."""

import pandas as pd
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.plans.textops import _word_grams


def _grams_py(text, n):
    ws = text.split(" ")
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def test_gram_builder_matches_python(spark):
    texts = ["a b c d e", "one two", "x", "", "p q r p q r p q r"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = (df.select("doc_id", F.split("text", " ").alias("ws"))
           .select("doc_id", _word_grams(3).alias("g")).toPandas()
           .set_index("doc_id").g)
    for i, t in enumerate(texts):
        want = _grams_py(t, 3) if len(t.split(" ")) >= 3 else []
        assert list(got.loc[i]) == want, t


def test_repetition_flags_boilerplate(spark, tmp_path):
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["spam ham eggs " * 40 + "spam ham eggs",
                 " ".join(f"w{i}" for i in range(100))],
        "lang": ["en", "en"], "source": ["t", "t"],
        "n_chars": [10, 10]})
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{sf}/documents.parquet")
    from extract_sf_r_parallel_spark.plans.textops import q_rep_ngram
    out = q_rep_ngram(spark, sf).toPandas().set_index("doc_id")
    assert out.loc[0, "dup_frac"] > 0.95      # pure boilerplate
    assert out.loc[0, "top_frac"] > 0.3       # one gram dominates
    assert out.loc[1, "dup_frac"] == 0.0      # all-unique doc


def test_contamination_finds_planted_overlap(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon zeta"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 97 * 5],              # 485 % 97 == 0 → benchmark
        "text": ["clean words only here today now",
                 "prefix " + shared + " suffix",
                 "bench text with " + shared + " inside"],
        "lang": ["en"] * 3, "source": ["t"] * 3, "n_chars": [1] * 3})
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite") \
        .parquet(f"{sf}/documents.parquet")
    from extract_sf_r_parallel_spark.plans.textops import q_contam_check
    out = q_contam_check(spark, sf).toPandas()
    assert list(out.doc_id) == [1]             # only the planted doc
    assert out.n_shared.iloc[0] == 3           # 6 shared words → 3 4-grams
    assert out.n_bench_docs.iloc[0] == 1
