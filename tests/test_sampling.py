"""Deterministic split / stratified sampling: assignment is a pure
function of (id, salt) — stable across reruns and appends — with
proportions near the requested weights."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_split_proportions_and_determinism(spark, docs):
    got = hash_split(docs).groupBy("split").count().toPandas() \
        .set_index("split")["count"]
    n = got.sum()
    assert abs(got["train"] / n - 0.8) < 0.06
    assert abs(got.get("val", 0) / n - 0.1) < 0.05
    assert abs(got.get("test", 0) / n - 0.1) < 0.05
    # rerun → identical assignment, row for row
    a = hash_split(docs).select("doc_id", "split").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = hash_split(docs).select("doc_id", "split").toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_split_stable_under_append(spark, docs):
    """An incremental append must not move existing rows between
    splits — the property RNG-based randomSplit lacks."""
    first = hash_split(docs.filter(F.col("doc_id") < 100)) \
        .select("doc_id", "split").toPandas().set_index("doc_id")
    full = hash_split(docs).select("doc_id", "split").toPandas() \
        .set_index("doc_id")
    joined = first.join(full, rsuffix="_full")
    assert (joined["split"] == joined["split_full"]).all()


def test_split_salt_rerolls(spark, docs):
    a = hash_split(docs, salt="v1").select("doc_id", "split").toPandas()
    b = hash_split(docs, salt="v2").select("doc_id", "split").toPandas()
    m = a.merge(b, on="doc_id")
    assert (m["split_x"] != m["split_y"]).any()


def test_stratified_rates(spark, docs):
    rates = {"en": 0.5, "de": 1.0}
    out = stratified_sample(docs, rates, default_rate=0.0) \
        .groupBy("lang").count().toPandas().set_index("lang")["count"]
    base = docs.groupBy("lang").count().toPandas() \
        .set_index("lang")["count"]
    assert out.get("de", 0) == base["de"]            # rate 1.0 keeps all
    assert set(out.index) <= {"en", "de"}            # default 0 drops rest
    assert abs(out.get("en", 0) / base["en"] - 0.5) < 0.12
    # membership is deterministic
    i1 = set(stratified_sample(docs, rates, default_rate=0.0)
             .select("doc_id").toPandas()["doc_id"])
    i2 = set(stratified_sample(docs, rates, default_rate=0.0)
             .select("doc_id").toPandas()["doc_id"])
    assert i1 == i2


# ----------------------------------------------------------- domain_mix
def test_domain_mix_exact_proportions_and_membership(spark):
    import hashlib

    import pandas as pd
    from extract_sf_r_parallel_spark.operators.sampling import domain_mix

    rng_rows = []
    sizes = {"a": 217, "b": 71, "c": 64}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rng_rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rng_rows, "doc_id long, lang string")
    weights = {"a": 3, "b": 1, "c": 1}
    got = domain_mix(df, weights, salt="t").toPandas()
    batch = min(sizes[s] // w for s, w in weights.items())  # 64
    assert dict(got.lang.value_counts()) == {
        s: w * batch for s, w in weights.items()}

    # membership must be EXACTLY the k smallest by (bucket, id)
    def bkt(doc_id):
        h = hashlib.md5(f"{doc_id}:t".encode()).hexdigest()
        return int(h[:8], 16) % 1_000_000

    pdf = pd.DataFrame(rng_rows, columns=["doc_id", "lang"])
    pdf["bkt"] = pdf.doc_id.map(bkt)
    want = set()
    for s, w in weights.items():
        sub = pdf[pdf.lang == s].sort_values(["bkt", "doc_id"])
        want |= set(sub.doc_id.head(w * batch))
    assert set(got.doc_id) == want


def test_domain_mix_invariant_to_bin_count(spark):
    from extract_sf_r_parallel_spark.operators.sampling import domain_mix
    df = spark.createDataFrame(
        [(i, "x" if i % 3 else "y") for i in range(300)],
        "doc_id long, lang string")
    a = domain_mix(df, {"x": 2, "y": 1}, prefix_bins=4096).toPandas()
    b = domain_mix(df, {"x": 2, "y": 1}, prefix_bins=7).toPandas()
    assert set(a.doc_id) == set(b.doc_id)


def test_domain_mix_rejects_bad_input(spark):
    import pytest as _pytest
    from extract_sf_r_parallel_spark.operators.sampling import domain_mix
    df = spark.createDataFrame([(1, "x")], "doc_id long, lang string")
    with _pytest.raises(ValueError, match="positive int"):
        domain_mix(df, {"x": 0})
    with _pytest.raises(ValueError, match="no rows"):
        domain_mix(df, {"x": 1, "zz": 1})
