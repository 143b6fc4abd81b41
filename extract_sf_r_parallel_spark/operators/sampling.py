"""Deterministic dataset splitting and stratified sampling — the
reproducibility primitives of a training-data pipeline: every row's
train/val/test assignment (and every sampling decision) is a pure
function of its id and a salt, so reruns, backfills, and incremental
appends land rows in the same split with no stored state and no RNG.

Spark-first shape: one md5 over (id || ':' || salt), the first 8 hex
chars parsed to an integer bucket, compared against precomputed
thresholds — all built-in JVM expressions, no UDFs, no shuffle (the
assignment is a row-local projection; only the stats queries on top
aggregate). md5 is bit-identical across engines, which is what makes
the driver's DuckDB oracle replay every assignment exactly.

Scale notes (100 TB): assignment is embarrassingly parallel and
filter-pushdown-friendly (a split filter prunes at the scan when the
split column is materialized/partitioned on); changing the salt
re-rolls every assignment — version salts like schema ("v1:train").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_split", "stratified_sample",
           "domain_mix"]

_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str,
                buckets: int = _BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(id ':' salt) — the
    first 8 hex chars (32 bits) parsed base-16. Deterministic and
    engine-portable (md5 is md5 everywhere)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_split(df: DataFrame,
               weights: Sequence[tuple[str, float]] = (
                   ("train", 0.8), ("val", 0.1), ("test", 0.1)),
               id_col: str = "doc_id", salt: str = "split",
               out: str = "split",
               buckets: int = _BUCKETS) -> DataFrame:
    """Label every row with its split: bucket < floor(0.8·buckets) →
    train, < floor(0.9·buckets) → val, else test (cumulative
    thresholds, floor'd to exact integers so both engines compare the
    same boundary). Weights must sum to 1."""
    ws = list(weights)
    assert abs(sum(w for _, w in ws) - 1.0) < 1e-9, "weights must sum to 1"
    b = hash_bucket(F.col(id_col), salt, buckets)
    cum = 0.0
    expr = None
    for name, w in ws[:-1]:
        cum += w
        t = int(cum * buckets)
        expr = F.when(b < t, name) if expr is None else expr.when(b < t, name)
    expr = expr.otherwise(ws[-1][0]) if expr is not None else F.lit(ws[0][0])
    return df.withColumn(out, expr)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      salt: str = "sample", default_rate: float = 0.0,
                      buckets: int = _BUCKETS) -> DataFrame:
    """Keep each row with its stratum's EXACT deterministic rate:
    bucket < floor(rate·buckets). The per-stratum rate map is a
    literal CASE chain (strata are few — languages, sources, quality
    tiers); rows in unlisted strata keep `default_rate`. The classic
    rebalancing op (downsample the dominant language, keep the rare
    ones) with reproducible membership."""
    b = hash_bucket(F.col(id_col), salt, buckets)
    t = None
    for k, r in rates.items():
        c = F.when(F.col(strata_col) == k, int(r * buckets))
        t = c if t is None else t.when(F.col(strata_col) == k, int(r * buckets))
    t = t.otherwise(int(default_rate * buckets)) if t is not None \
        else F.lit(int(default_rate * buckets))
    return df.filter(b < t)


def domain_mix(df: DataFrame, weights: dict[str, int],
               strata_col: str = "lang", id_col: str = "doc_id",
               salt: str = "mix", buckets: int = _BUCKETS,
               prefix_bins: int = 4096) -> DataFrame:
    """Domain/language mixing at exact integer proportions — the
    corpus-rebalancing op of LLM data pipelines ("2 parts web to 1
    part code"): with integer weights w_s, the largest feasible batch
    is B = min_s floor(n_s / w_s) and each stratum keeps EXACTLY
    kept_s = w_s·B rows — the kept_s smallest by (md5 bucket, id), so
    membership is deterministic, append-stable in distribution, and
    replayable by an oracle.

    Scale shape (the point of this operator): a naive per-stratum
    ORDER BY … LIMIT kept_s sorts a whole stratum in one task. Here
    selection is an exact distributed k-th order statistic instead:
    (1) one groupBy builds a per-stratum histogram over `prefix_bins`
    bucket ranges (strata × bins rows — independent of data size);
    (2) the driver walks each histogram to the bin holding the k-th
    value; (3) every row in a lower bin is kept by a plain FILTER (no
    sort anywhere), and only the single boundary bin — expected
    n_s/prefix_bins rows — is ranked by (bucket, id) to take the
    remainder. Strata absent from `weights` are dropped (weight 0).

    Build-time cost: two small collect()s (stratum counts and the
    histogram), both O(strata · bins) — plan parameters, not data."""
    for s, w in weights.items():
        if not (isinstance(w, int) and w > 0):
            raise ValueError(f"domain_mix: weight for {s!r} must be a "
                             f"positive int, got {w!r}")
    width = -(-buckets // prefix_bins)  # ceil
    bkt = hash_bucket(F.col(id_col), salt, buckets)
    base = (df.filter(F.col(strata_col).isin(*weights))
            .withColumn("_bkt", bkt)
            .withColumn("_pfx", (F.col("_bkt") / width).cast("long")))

    counts = {r[0]: r[1] for r in
              base.groupBy(strata_col).count().collect()}
    if set(counts) != set(weights) or not counts:
        missing = sorted(set(weights) - set(counts))
        raise ValueError(f"domain_mix: strata with no rows: {missing}")
    batch = min(counts[s] // w for s, w in weights.items())
    kept = {s: w * batch for s, w in weights.items()}

    hist: dict[str, dict[int, int]] = {s: {} for s in weights}
    for r in base.groupBy(strata_col, "_pfx").count().collect():
        hist[r[0]][r[1]] = r[2]
    boundary: dict[str, tuple[int, int]] = {}  # stratum -> (pfx, take)
    for s in weights:
        cum, p_star, take = 0, prefix_bins, 0
        for p in sorted(hist[s]):
            if cum + hist[s][p] >= kept[s]:
                p_star, take = p, kept[s] - cum
                break
            cum += hist[s][p]
        boundary[s] = (p_star, take)

    def _case(m: dict[str, int]) -> F.Column:
        c = None
        for s, v in m.items():
            w = F.when(F.col(strata_col) == s, F.lit(v))
            c = w if c is None else c.when(F.col(strata_col) == s, F.lit(v))
        return c

    p_col = _case({s: b for s, (b, _) in boundary.items()})
    t_col = _case({s: t for s, (_, t) in boundary.items()})
    below = base.filter(F.col("_pfx") < p_col)
    from pyspark.sql import Window as _W
    rn = F.row_number().over(
        _W.partitionBy(strata_col).orderBy("_bkt", id_col))
    edge = (base.filter(F.col("_pfx") == p_col)
            .withColumn("_rn", rn)
            .filter(F.col("_rn") <= t_col).drop("_rn"))
    return below.unionByName(edge).drop("_bkt", "_pfx")
