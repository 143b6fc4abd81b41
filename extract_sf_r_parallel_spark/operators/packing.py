"""Concat-and-chunk sequence packing — the training-batch layout op of
every large-LM data pipeline: documents are concatenated in a
deterministic order and the token stream is cut into fixed-budget
chunks; each document is assigned the chunk containing its first
token. Pure window arithmetic (one cumulative sum per stream), no
state machine, no Python — which is precisely why this formulation
(the one GPT-style pipelines actually use) scales where greedy
first-fit bin packing (a prefix-dependent recurrence) would serialize.

At 100 TB the stream key is (lang, shard): the window is per-key, so
each shard's cumsum runs independently after one hash shuffle, and
chunk ids are made globally unique by prefixing the stream key.
Membership is append-stable per stream: appending documents with
larger order keys never reassigns existing ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_chunks", "chunk_summary"]


def pack_chunks(docs: DataFrame, tokens: Column | str,
                budget: int, stream_cols: list[str],
                order_col: str = "doc_id") -> DataFrame:
    """Assign every document a training-chunk id: within each stream
    (partition by `stream_cols`, ordered by `order_col`), chunk_id =
    floor(tokens_before / budget) and chunk_offset = tokens_before mod
    budget — i.e. the chunk and intra-chunk position of the document's
    first token after concatenation. Documents longer than the
    remaining budget straddle into following chunks (n_chunks_spanned
    reports how many)."""
    tok = F.col(tokens) if isinstance(tokens, str) else tokens
    w = (Window.partitionBy(*stream_cols).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(tok).over(w), F.lit(0))
    return (docs
            .withColumn("n_tokens", tok.cast("long"))
            .withColumn("chunk_id", F.floor(before / budget).cast("long"))
            .withColumn("chunk_offset", (before % budget).cast("long"))
            .withColumn(
                "n_chunks_spanned",
                (F.floor((before + F.col("n_tokens") - 1) / budget)
                 - F.floor(before / budget) + 1).cast("long")))


def chunk_summary(packed: DataFrame, stream_cols: list[str],
                  order_col: str = "doc_id") -> DataFrame:
    """Per-chunk fill report over a pack_chunks result: documents
    STARTING in each chunk, their token total, and the id range —
    the table a packing job emits for monitoring fill efficiency.
    `order_col` must match the one given to pack_chunks (ADVICE r05:
    a caller ordering by another column gets its id range from that
    column, not a hardcoded doc_id)."""
    return (packed.groupBy(*stream_cols, "chunk_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("chunk_tokens"),
                 F.min(order_col).alias("first_doc"),
                 F.max(order_col).alias("last_doc")))
