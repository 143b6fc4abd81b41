"""Large-star/small-star connected components (VERDICT r03 next-#3):
O(log n)-round contraction must label long-chain graphs that min-label
propagation cannot finish within any reasonable round budget — and the
min-label path must now fail loudly instead of returning wrong labels
(ADVICE r03)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _path_pairs(spark, n):
    """0-1-2-…-(n-1): the adversarial diameter-(n-1) chain."""
    return spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))


def test_star_path_graph_10k_converges_fast(spark):
    n = 10_000
    labels = connected_components_star(_path_pairs(spark, n), rounds=15)
    got = labels.agg(F.countDistinct("component").alias("c"),
                     F.max("component").alias("mx"),
                     F.count(F.lit(1)).alias("n")).first()
    assert got["c"] == 1 and got["mx"] == 0 and got["n"] == n


def test_star_matches_label_propagation_on_shallow_graph(spark):
    """Random multi-component graph with small diameters: both
    algorithms must produce identical component labelings."""
    rng = np.random.default_rng(11)
    edges = []
    for comp in range(40):
        base = comp * 1000
        members = base + rng.permutation(30)[: 5 + comp % 20]
        hub = int(members.min())
        # star + a few chords → diameter ≤ 4
        for m in members:
            if int(m) != hub:
                edges.append((hub, int(m)))
        for _ in range(3):
            a, b = rng.choice(members, 2, replace=False)
            if a != b:
                edges.append((int(a), int(b)))
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = connected_components_star(pairs).toPandas() \
        .sort_values("id").reset_index(drop=True)
    lab = connected_components(pairs).toPandas() \
        .sort_values("id").reset_index(drop=True)
    assert (star["id"].to_numpy() == lab["id"].to_numpy()).all()
    assert (star["component"].to_numpy() == lab["component"].to_numpy()).all()


def test_star_singletons_and_two_cliques(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11)], "id_a long, id_b long")
    got = dict(connected_components_star(pairs).collect())
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_label_propagation_raises_on_exhaustion(spark):
    """A 60-node path with a 3-round budget cannot converge; silent
    partial labels would poison dedup_canonical (ADVICE r03)."""
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_path_pairs(spark, 60), max_iters=3)


def test_star_budget_exhaustion_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(_path_pairs(spark, 4000), rounds=1)
