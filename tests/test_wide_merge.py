"""The capstone wide-merge artifact (C_…R:1194-1208, D_…R:595-608):
14 footprint layers (temporal + age) + 5 wetland classes (neither)
pivoted to <layer>_<METRIC> columns and inner-merged on (PKEY, SS,
YEAR). The reference asserts its final table keeps exactly one row per
point (83,439 — C_…R:707-709); this is that invariant at fixture
scale, plus the full column inventory."""

from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.plans.registry import (
    _WM_CLASSES,
    _WM_LAYERS,
    q_wide_merge,
)

SF_DIR = "/root/testdata/sf0.001"


def test_wide_merge_row_invariant_and_columns(spark):
    out = q_wide_merge(spark, SF_DIR)
    n_points = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderkey") % 10 == 0).count())
    # the inner merge must preserve the point count: both sides emit
    # every point densely (LEFT semantics), so nothing drops
    assert out.count() == n_points

    cols = set(out.columns)
    assert {"PKEY", "SS", "YEAR"} <= cols
    want = set()
    for L in _WM_LAYERS:
        want |= {f"{L}_NEAR_DIST"}
        for r in (150, 565):
            want |= {f"{L}_AREA{r}", f"{L}_PROP{r}", f"{L}_MEANAGE_{r}"}
    for C in _WM_CLASSES:
        want |= {f"{C}_NEAR_DIST"}
        for r in (150, 565):
            want |= {f"{C}_AREA{r}", f"{C}_PROP{r}"}
    assert cols == {"PKEY", "SS", "YEAR"} | want
    assert len(cols) == 3 + 14 * 7 + 5 * 5

    # one row per key triple (the merge is keyed, not fanned out)
    assert out.select("PKEY", "SS", "YEAR").distinct().count() == n_points
