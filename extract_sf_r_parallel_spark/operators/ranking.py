"""BM25 relevance scoring over a document corpus — the classic
quality/relevance ranker a training-data pipeline uses to select or
weight documents against a topic query (and the scoring backbone of
retrieval-based data curation).

Spark-first shape: one explode of the token array filtered to the
query vocabulary BEFORE any shuffle (the filter prunes ~|Q|/|V| of the
exploded rows at the scan), then two small aggregations — per-term
document frequency (|Q| rows, broadcast back) and per-(doc, term)
term frequency — and one scalar corpus-stats aggregate broadcast via
crossJoin. Everything is built-in JVM expressions; no UDFs.

Scale notes (100 TB): df/tf are classic map-side-combinable counts;
the df table is |query| rows (broadcast), corpus stats one row
(broadcast), so the only real shuffle is the (doc_id, term) tf
aggregation over query-term hits — a tiny filtered subset of the
token stream. Scoring is embarrassingly parallel per document.

The reference has no ranking (two batch R scripts); this extends the
text family (plans/textops.py) the same way dedup/ANN do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "tfidf_topk"]


def bm25_scores(docs: DataFrame, terms: Sequence[str],
                k1: float = 1.2, b: float = 0.75,
                text_col: str = "text", id_col: str = "doc_id",
                decimals: int = 6) -> DataFrame:
    """Okapi BM25 score of every document against the bag `terms`
    (must be distinct), with the +1 idf smoothing
    (idf = ln((N − df + 0.5)/(df + 0.5) + 1) — never negative).
    Tokenization is the engine's corpus convention: split on a single
    space (plans/textops.py token_stats). Returns
    (id_col, dl, bm25): document length in tokens and the score
    rounded to `decimals` (absorbs cross-engine libm-ln ulps; docs
    containing no query term score exactly 0)."""
    terms = list(terms)
    assert len(set(terms)) == len(terms), "query terms must be distinct"
    base = docs.select(
        id_col, F.split(F.col(text_col), " ").alias("_toks"))
    base = base.withColumn("dl", F.size("_toks"))
    stats = base.agg(F.count(F.lit(1)).alias("_n"),
                     F.avg("dl").alias("_avgdl"))
    hits = base.select(id_col, "dl", F.explode("_toks").alias("term")) \
        .filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term") \
        .agg(F.countDistinct(id_col).alias("_df"))
    tf = hits.groupBy(id_col, "dl", "term") \
        .agg(F.count(F.lit(1)).alias("_tf"))
    j = tf.join(F.broadcast(dfreq), "term") \
        .crossJoin(F.broadcast(stats))
    contrib = (
        F.log((F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
              + 1.0)
        * F.col("_tf") * (k1 + 1.0)
        / (F.col("_tf")
           + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl")))
    )
    sc = j.groupBy(id_col).agg(F.sum(contrib).alias("_s"))
    return base.select(id_col, "dl").join(sc, id_col, "left").select(
        id_col, "dl",
        F.round(F.coalesce("_s", F.lit(0.0)), decimals).alias("bm25"))


def tfidf_topk(docs: DataFrame, k: int = 3, min_len: int = 4,
               text_col: str = "text", id_col: str = "doc_id"
               ) -> DataFrame:
    """Per-document top-k KEYWORD EXTRACTION by tf·idf — the other
    classic use of the tf/df statistics BM25 ranks with: instead of
    scoring documents against a fixed query, surface each document's
    most distinctive terms (corpus curation: topic labeling, dedup
    explainability, domain tagging). Terms shorter than `min_len`
    characters are dropped (the cheap stopword screen).

    Determinism across engines: the idf here is the RAW ratio variant
    idf = N/df (monotone in the usual ln(N/df), so the top-k set for
    any fixed tie rule is the log variant's top-k whenever ln is
    injective on distinct ratios — and unlike ln it is bit-exact:
    score = double(tf·N)/df is ONE IEEE division of exact integers,
    identical on every engine, no rounding step, no libm). Ties break
    by term ascending. Returns (doc_id, term, tf, df, rnk, score).

    Scale: tf and df are map-side-combinable counts over the exploded
    token stream (the explode is scan-side, never shuffled raw); df
    joins back by term — a shuffle join at real vocabulary sizes, NOT
    broadcast (vocab of a 100 TB corpus won't fit); the top-k window
    partitions by doc_id, which the tf aggregation already
    co-partitioned, so AQE plans it shuffle-free."""
    from pyspark.sql import Window as W
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")) \
        .filter(F.length("term") >= min_len)
    n_docs = docs.select(F.count(F.lit(1)).alias("_n"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score",
                          (F.col("tf") * F.col("_n")).cast("double")
                          / F.col("df")))
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(id_col, "term", "tf", "df", "rnk", "score"))
