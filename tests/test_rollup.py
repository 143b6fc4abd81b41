"""OLAP rollup: subtotal algebra must be internally consistent and
grouping_id must separate subtotal rows from real NULL keys."""

from extract_sf_r_parallel_spark.plans.relational import q_rollup_agg

SF = "/root/testdata/sf0.001"


def test_rollup_subtotal_algebra(spark):
    got = q_rollup_agg(spark, SF).toPandas()
    leaves = got[got.gid == 0]
    flags = got[got.gid == 1]
    total = got[got.gid == 3]
    assert len(total) == 1
    assert total.n.iloc[0] == leaves.n.sum() == flags.n.sum()
    # per-flag subtotal = sum of its leaves
    for f, grp in leaves.groupby("l_returnflag"):
        assert flags[flags.l_returnflag == f].n.iloc[0] == grp.n.sum()
    # subtotal rows null out exactly the aggregated columns
    assert flags.l_linestatus.isna().all()
    assert total.l_returnflag.isna().all() and total.l_linestatus.isna().all()
    assert leaves.l_returnflag.notna().all() and leaves.l_linestatus.notna().all()
