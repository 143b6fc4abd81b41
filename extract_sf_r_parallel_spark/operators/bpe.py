"""BPE vocabulary induction — the tokenizer-training step of an LLM
data pipeline (Sennrich et al.'s byte-pair encoding, the public
algorithm behind GPT/Llama tokenizers), distributed:

- the corpus collapses to a (word, count) table first — pair counting
  then costs O(distinct words), not O(corpus), the standard trick;
- each merge round is ONE map-side-combinable aggregation (adjacent
  pairs exploded from the split representation, weighted by word
  count) plus a driver-side argmax of the tiny pair table — the
  iterative-algorithm pattern shared with Lloyd IVF and Weiszfeld;
- the merge rewrite is a pure-Column aggregate() fold over the token
  array — TRUE left-to-right greedy merging (canonical BPE), which a
  literal string replace cannot reproduce on same-symbol runs (the
  match consumes the shared delimiter). The DuckDB oracle replays the
  same left-greedy semantics positionally (pair-match flags + run
  parity), so the two engines stay value-identical.

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
                "p1/p2/merged are interpolated into the aggregate() SQL "
                "expression as unescaped string literals, so only "
                "[0-9A-Za-z] corpora are supported")
        merged = pair.replace(" ", "")
        merges.append((pair, merged, total))
        p1, p2 = pair.split(" ", 1)
        # TRUE left-to-right greedy merge as an aggregate() fold over
        # the token array: merge the current token into the
        # accumulator's tail iff (tail, current) == (p1, p2). The
        # merged symbol p1||p2 can never equal p1 (p2 is non-empty),
        # so a just-merged tail never re-merges — exactly canonical
        # BPE. (A literal string replace is NOT equivalent: matching
        # " d d " consumes the shared delimiter, so a run "d d d d"
        # folds to [dd, d, dd] instead of the canonical [dd, dd, d] —
        # caught by the hypothesis property test on same-symbol runs.)
        rewrite = (
            "concat(' ', concat_ws(' ', aggregate(split(trim(repr), ' '), "
            "cast(array() as array<string>), "
            f"(acc, x) -> IF(size(acc) > 0 "
            f"AND element_at(acc, -1) = '{p1}' AND x = '{p2}', "
            f"concat(slice(acc, 1, size(acc) - 1), array('{merged}')), "
            "concat(acc, array(x))))), ' ')")
        reprs = reprs.withColumn("repr", F.expr(rewrite))
    return merges, reprs


def bpe_token_freqs(reprs: DataFrame, cnt: str = "cnt") -> DataFrame:
    """Corpus token-frequency table under the learned merges —
    (token, freq); merged symbols appear as single tokens."""
    return (reprs
            .withColumn("token",
                        F.explode(F.split(F.trim(F.col("repr")), " ")))
            .groupBy("token").agg(F.sum(cnt).alias("freq")))
