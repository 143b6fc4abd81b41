"""BPE vocabulary induction — the tokenizer-training step of an LLM
data pipeline (Sennrich et al.'s byte-pair encoding, the public
algorithm behind GPT/Llama tokenizers), distributed:

- the corpus collapses to a (word, count) table first — pair counting
  then costs O(distinct words), not O(corpus), the standard trick;
- each merge round is ONE map-side-combinable aggregation (adjacent
  pairs exploded from the split representation, weighted by word
  count) plus a driver-side argmax of the tiny pair table — the
  iterative-algorithm pattern shared with Lloyd IVF and Weiszfeld;
- the merge rewrite is a pure-Column double `replace` over the
  space-padded representation. Literal left-to-right non-overlapping
  replace has IDENTICAL semantics in the JVM and DuckDB (probed), and
  the second pass folds the odd members of "ababab" runs, which makes
  the rewrite equal to greedy left-to-right BPE merging — and, more
  importantly for the driver gate, deterministic and engine-portable.

Ties in the best-pair choice break lexicographically on the pair
string — same rule on both engines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["learn_bpe", "bpe_token_freqs"]

_SAFE_PAIR = re.compile(r"^[0-9A-Za-z]+ [0-9A-Za-z]+$")


def _pair_counts(reprs: DataFrame, cnt: str) -> DataFrame:
    t = F.split(F.trim(F.col("repr")), " ")
    pairs = F.when(
        F.size(F.col("_t")) >= 2,
        F.expr("transform(sequence(0, size(_t)-2), "
               "i -> concat(_t[i], ' ', _t[i+1]))")
    ).otherwise(F.expr("cast(array() as array<string>)"))
    return (reprs.withColumn("_t", t)
            .withColumn("_p", F.explode(pairs))
            .groupBy("_p").agg(F.sum(cnt).alias("total")))


def learn_bpe(words: DataFrame, iters: int = 3, word: str = "word",
              cnt: str = "cnt") -> tuple[list[tuple[str, str, int]],
                                         DataFrame]:
    """Run `iters` BPE merges over a (word, count) table. Returns the
    merge list [(pair, merged, total), …] and the final representation
    frame (word, cnt, repr — space-padded token string)."""
    reprs = words.select(
        F.col(word).alias("word"), F.col(cnt).alias(cnt),
        F.concat(F.lit(" "),
                 F.concat_ws(" ", F.split(F.col(word), "")),
                 F.lit(" ")).alias("repr"))
    merges: list[tuple[str, str, int]] = []
    for _ in range(iters):
        best = _pair_counts(reprs, cnt) \
            .orderBy(F.desc("total"), F.asc("_p")).first()
        if best is None:
            break
        pair, total = best["_p"], int(best["total"])
        if not _SAFE_PAIR.fullmatch(pair):
            raise ValueError(
                f"learn_bpe: pair {pair!r} has non-alphanumeric symbols; "
                "the literal-replace rewrite only supports [0-9A-Za-z] "
                "corpora (escape handling not implemented)")
        merged = pair.replace(" ", "")
        merges.append((pair, merged, total))
        rewrite = (f"replace(replace(repr, ' {pair} ', ' {merged} '), "
                   f"' {pair} ', ' {merged} ')")
        reprs = reprs.withColumn("repr", F.expr(rewrite))
    return merges, reprs


def bpe_token_freqs(reprs: DataFrame, cnt: str = "cnt") -> DataFrame:
    """Corpus token-frequency table under the learned merges —
    (token, freq); merged symbols appear as single tokens."""
    return (reprs
            .withColumn("token",
                        F.explode(F.split(F.trim(F.col("repr")), " ")))
            .groupBy("token").agg(F.sum(cnt).alias("freq")))
