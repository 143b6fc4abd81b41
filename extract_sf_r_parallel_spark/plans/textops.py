"""Text-analysis queries over the documents table (training-data
pipeline ops: token counting, quality scoring, language-ID heuristic,
dedup). SQL-parity subset here (DuckDB-oracled); the richer NumPy
variants (n-gram langid, fingerprints, MinHash) live in functions/ and
operators/ and are checked by pytest oracles instead.

Determinism: outputs are integers, strings, or ratios of exact
integers — all hash bit-identically across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

ORACLE: dict[str, str] = {}


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- exact dedup via content hash (hash-groupBy; md5 identical on both
# engines). Degenerate on this corpus (all texts distinct) but the
# operator is the point.
def q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.withColumn("content_hash", F.md5(F.col("text")))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


ORACLE["dedup_exact"] = """
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# --- bucket dedup (blocking key = (lang, n_chars)): the grouping shape
# of LSH banding with a trivial key
def q_dedup_bucket(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang", "n_chars")
        .agg(F.min("doc_id").alias("canonical_id"),
             F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > 1)
    )


ORACLE["dedup_bucket"] = """
SELECT lang, n_chars, MIN(doc_id) AS canonical_id, COUNT(*) AS bucket_size
FROM documents GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


# --- token counting (whitespace tokenizer; corpus is single-spaced —
# verified in tests)
def q_token_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("len_chars"),
        (F.length("text").cast("double") / n_tokens).alias("avg_token_span"),
    )


ORACLE["token_stats"] = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS len_chars,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_span
FROM documents
"""


# --- quality scoring: structural ratios (length / marker-word counts)
def q_text_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n_the = (F.length("text") - F.length(F.expr("replace(text, 'the', '')"))) / 3
    n_data = (F.length("text") - F.length(F.expr("replace(text, 'data', '')"))) / 4
    return d.select(
        "doc_id",
        n_the.cast("long").alias("n_the"),
        n_data.cast("long").alias("n_data"),
        (n_the.cast("double") * 1000 / F.length("text")).alias("the_density"),
    )


ORACLE["text_quality"] = """
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS BIGINT) AS n_the,
       CAST((length(text) - length(replace(text, 'data', ''))) / 4 AS BIGINT) AS n_data,
       CAST((length(text) - length(replace(text, 'the', ''))) / 3 AS DOUBLE) * 1000
         / length(text) AS the_density
FROM documents
"""


# --- language-ID heuristic (marker-token decision list; deterministic
# CASE chain on both engines)
def q_lang_markers(spark, sf_dir):
    d = _docs(spark, sf_dir)
    pred = (
        F.when(F.col("text").like("% the %"), F.lit("en"))
        .when(F.col("text").like("% la %") | F.col("text").like("% le %"), F.lit("fr"))
        .when(F.col("text").like("% der %") | F.col("text").like("% und %"), F.lit("de"))
        .otherwise(F.lit("unknown"))
    )
    return (
        d.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE["lang_markers"] = """
SELECT lang,
       CASE WHEN text LIKE '% the %' THEN 'en'
            WHEN text LIKE '% la %' OR text LIKE '% le %' THEN 'fr'
            WHEN text LIKE '% der %' OR text LIKE '% und %' THEN 'de'
            ELSE 'unknown' END AS pred_lang,
       COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_bucket": q_dedup_bucket,
    "token_stats": q_token_stats,
    "text_quality": q_text_quality,
    "lang_markers": q_lang_markers,
}
