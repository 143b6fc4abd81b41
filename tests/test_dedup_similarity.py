"""Spark-level checks for dedup + similarity: planted near-duplicates
must be found by MinHash+LSH; LSH-ANN recall vs brute force; exact
dedup counts."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.functions import hashing as H
from extract_sf_r_parallel_spark.operators import dedup as D
from extract_sf_r_parallel_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(80):
        toks = list(rng.choice(vocab, 60))
        rows.append((i, " ".join(toks)))
    # plant near-duplicates: ids 1000+i are 95%-copies of i for i<10
    for i in range(10):
        toks = rows[i][1].split()
        for j in rng.choice(60, 3, replace=False):
            toks[j] = f"alt{j}"
        rows.append((1000 + i, " ".join(toks)))
    # plant exact duplicates of ids 20, 21
    rows.append((2020, rows[20][1]))
    rows.append((2021, rows[21][1]))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs).toPandas()
    assert len(out) == 90  # 92 rows, 2 exact dups collapsed
    assert set(out[out.n_copies > 1]["doc_id"]) == {20, 21}


def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5, bands=16).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    for i in range(10):
        assert (i, 1000 + i) in found, f"planted near-dup {i} missed"
    # jaccard values match the exact oracle
    pdf = docs.toPandas().set_index("doc_id")["text"]
    for r in pairs.itertuples():
        want = H.jaccard(H.shingle_hashes(pdf[r.id_a]), H.shingle_hashes(pdf[r.id_b]))
        assert r.jaccard == pytest.approx(want, rel=1e-12)


def test_ngram_jaccard_blocked(spark, docs):
    d = docs.withColumn("lang", F.lit("en"))
    pairs = D.ngram_jaccard_pairs(d, threshold=0.5, block_col="lang").toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    for i in range(10):
        assert (i, 1000 + i) in found


@pytest.fixture(scope="module")
def vectors(spark):
    # clustered vectors (realistic embeddings have cluster structure;
    # uniform-random Gaussians have near-orthogonal NNs that no LSH
    # family can bucket well)
    rng = np.random.default_rng(17)
    centers = rng.standard_normal((12, 32)) * 3.0
    base = np.stack([centers[i % 12] + 0.4 * rng.standard_normal(32)
                     for i in range(120)])
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(120)]
    # planted neighbours: 500+i ≈ i + tiny noise
    for i in range(15):
        v = base[i] + 0.05 * rng.standard_normal(32)
        rows.append((500 + i, v.astype(np.float32).tolist()))
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_brute_force_topk_exact(spark, vectors):
    out = S.brute_force_topk(vectors, vectors, k=1).toPandas()
    got = dict(zip(out.qid, out.nid))
    # numpy oracle
    pdf = vectors.toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack([np.asarray(v, np.float64) for v in pdf.embedding])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    for r, qid in enumerate(ids):
        best = sims[r].max()
        cands = ids[np.flatnonzero(np.isclose(sims[r], best, atol=1e-12))]
        assert got[qid] in cands
    for i in range(15):
        assert got[500 + i] == i and got[i] == 500 + i


def test_matmul_topk_matches_jvm_brute_force(spark, vectors):
    """The broadcast-matmul fast path must agree with the JVM
    higher-order-function brute force after 5-dp rounding."""
    a = S.brute_force_topk(vectors, vectors, k=3, round_dp=5).toPandas()
    b = S.matmul_topk(vectors, vectors, k=3, round_dp=5).toPandas()
    ka = set(zip(a.qid, a.rk, a.nid))
    kb = set(zip(b.qid, b.rk, b.nid))
    assert ka == kb


def test_ivf_ann_recall(spark, vectors):
    """IVF (k-means quantizer + cluster equi join) recall vs brute
    force — the inverted-file sibling of the LSH path."""
    brute = S.brute_force_topk(vectors, vectors, k=1).toPandas()
    ann = S.ivf_topk(vectors, vectors, dim=32, k=1,
                     n_clusters=12, n_probe=4).toPandas()
    bm = dict(zip(brute.qid, brute.nid))
    am = dict(zip(ann.qid, ann.nid))
    hits = sum(1 for q, n in bm.items() if am.get(q) == n)
    recall = hits / len(bm)
    assert recall >= 0.8, f"IVF recall too low: {recall:.2f}"
    for i in range(15):  # planted twins (cos ≈ 1 → same cluster)
        assert am.get(500 + i) == i


def test_cosine_dup_pairs_exact(spark, vectors):
    """Embedding-cosine near-dup: planted twins (cos ≈ 1) must all be
    found, and every emitted pair must match the NumPy oracle."""
    out = S.cosine_dup_pairs(vectors, threshold=0.98).toPandas()
    found = set(zip(out.id_a, out.id_b))
    for i in range(15):
        assert (i, 500 + i) in found, f"planted twin {i} missed"
    pdf = vectors.toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.stack([np.asarray(v, np.float64) for v in pdf.embedding])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 6)
    want = set()
    for a in range(len(ids)):
        for b in range(len(ids)):
            if ids[a] < ids[b] and sims[a, b] >= 0.98:
                want.add((ids[a], ids[b]))
    assert found == want


def test_lsh_ann_recall(spark, vectors):
    brute = S.brute_force_topk(vectors, vectors, k=1).toPandas()
    ann = S.lsh_ann_topk(vectors, vectors, dim=32, k=1,
                         n_planes=8, n_tables=8).toPandas()
    bm = dict(zip(brute.qid, brute.nid))
    am = dict(zip(ann.qid, ann.nid))
    hits = sum(1 for q, n in bm.items() if am.get(q) == n)
    recall = hits / len(bm)
    assert recall >= 0.8, f"LSH recall too low: {recall:.2f}"
    # planted twins must be found (their cosine ≈ 1 → same buckets
    # with overwhelming probability across 8 tables)
    for i in range(15):
        assert am.get(500 + i) == i


def test_int_lsh_ann_recall(spark, vectors):
    """The SQL-replayable integer-quantized LSH variant must keep the
    same recall contract as the float-hyperplane one."""
    brute = S.brute_force_topk(vectors, vectors, k=1).toPandas()
    ann = S.lsh_ann_topk_int(vectors, vectors, dim=32, k=1,
                             n_planes=8, n_tables=8).toPandas()
    bm = dict(zip(brute.qid, brute.nid))
    am = dict(zip(ann.qid, ann.nid))
    recall = sum(1 for q, n in bm.items() if am.get(q) == n) / len(bm)
    assert recall >= 0.8, f"int-LSH recall too low: {recall:.2f}"
    for i in range(15):
        assert am.get(500 + i) == i


def test_sampled_ivf_recall(spark, vectors):
    """Corpus-sampled-centroid IVF (the oracled driver variant) keeps
    useful recall without Lloyd refinement."""
    brute = S.brute_force_topk(vectors, vectors, k=1).toPandas()
    ann = S.ivf_topk_sampled(vectors, vectors, k=1,
                             n_clusters=16, n_probe=6).toPandas()
    bm = dict(zip(brute.qid, brute.nid))
    am = dict(zip(ann.qid, ann.nid))
    recall = sum(1 for q, n in bm.items() if am.get(q) == n) / len(bm)
    assert recall >= 0.8, f"sampled-IVF recall too low: {recall:.2f}"


def test_matmul_topk_small_corpus_absent_query(spark):
    """ADVICE r02: with corpus size n <= k and the query id absent from
    the corpus, matmul_topk must return all n neighbours exactly like
    brute_force_topk (the old kk=min(k,n-1) dropped the last one)."""
    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(3)],
        "vec_id: long, embedding: array<float>")
    queries = spark.createDataFrame(
        [(99, [1.0, 0.5, 0.0, 0.0])], "vec_id: long, embedding: array<float>")
    a = S.brute_force_topk(queries, corpus, k=5, round_dp=5).toPandas()
    b = S.matmul_topk(queries, corpus, k=5, round_dp=5).toPandas()
    assert len(a) == len(b) == 3
    sa = a.sort_values("rk").reset_index(drop=True)
    sb = b.sort_values("rk").reset_index(drop=True)
    assert (sa.nid.to_numpy() == sb.nid.to_numpy()).all()
    # and with the query PRESENT in the corpus, self is excluded: n-1 rows
    qp = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.0, 0.0])], "vec_id: long, embedding: array<float>")
    c = S.matmul_topk(qp, corpus, k=5, round_dp=5).toPandas()
    d = S.brute_force_topk(qp, corpus, k=5, round_dp=5).toPandas()
    assert len(c) == len(d) == 2
    assert 1 not in set(c.nid)


def test_block_topk_exact_no_cartesian(spark, vectors):
    """The oversize exact path (block-partitioned matmul) must agree
    with brute force and contain no CartesianProduct node (VERDICT r02
    wrong-#3)."""
    a = S.brute_force_topk(vectors, vectors, k=3, round_dp=5).toPandas()
    # force the oversize route through matmul_topk's gate
    b_df = S.matmul_topk(vectors, vectors, k=3, round_dp=5,
                         max_broadcast_rows=10)
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    b = b_df.toPandas()
    sa = a.sort_values(["qid", "rk"]).reset_index(drop=True)
    sb = b.sort_values(["qid", "rk"]).reset_index(drop=True)
    assert len(sa) == len(sb)
    assert (sa.nid.to_numpy() == sb.nid.to_numpy()).all()
    assert (sa.qid.to_numpy() == sb.qid.to_numpy()).all()
    np.testing.assert_allclose(sa.cos.to_numpy(), sb.cos.to_numpy())


def test_dup_pairs_oversize_path_no_cartesian(spark, vectors):
    """cosine_dup_pairs past the broadcast envelope routes to LSH
    candidates + exact verify — an equi join, never a cross join."""
    d = S.cosine_dup_pairs(vectors, threshold=0.9, max_broadcast_rows=10)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = d.toPandas()
    # the 15 planted twins (cos ≈ 1) are exactly the expected pairs
    pairs = set(zip(got.id_a, got.id_b))
    for i in range(15):
        assert (i, 500 + i) in pairs


def test_dup_pairs_exact_block_path(spark, vectors):
    """exact=True past the broadcast envelope: block-pair sweep must
    equal the broadcast-matmul result exactly, with no cross join."""
    want = S.cosine_dup_pairs(vectors, threshold=0.9).toPandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    d = S.cosine_dup_pairs(vectors, threshold=0.9, max_broadcast_rows=10,
                           exact=True)
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = d.toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got.id_a.to_numpy() == want.id_a.to_numpy()).all()
    assert (got.id_b.to_numpy() == want.id_b.to_numpy()).all()
    np.testing.assert_allclose(got.cos.to_numpy(), want.cos.to_numpy())


def test_connected_components_shapes(spark):
    """Chain, triangle, pair, and an isolated doc: min-label
    propagation must reach the exact component minima."""
    from extract_sf_r_parallel_spark.operators.dedup import (
        connected_components,
        dedup_canonical,
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain → comp 1
         (10, 11), (11, 12), (10, 12),  # triangle → comp 10
         (20, 21)],                     # pair → comp 20
        "id_a: long, id_b: long")
    got = dict(connected_components(pairs).collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12,
                                                 20, 21, 99]],
                                 "doc_id: long")
    canon = dedup_canonical(docs, pairs).toPandas()
    keep = canon[~canon.is_dup].doc_id.tolist()
    assert sorted(keep) == [1, 10, 20, 99]
    assert canon[canon.doc_id == 99].canonical_id.iloc[0] == 99


def test_block_dup_pairs_empty_block_guard(spark):
    """ADVICE r03: a hash block with zero rows used to crash the exact
    block sweep with np.stack ValueError. 3 rows over ≥8 blocks leaves
    most blocks empty — every (i, j) group with an empty side must
    yield no pairs, not an exception."""
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = S.cosine_dup_pairs(df, threshold=0.9, max_broadcast_rows=1,
                             exact=True).toPandas()
    assert set(zip(got.id_a, got.id_b)) == {(1, 2)}


def test_ivf_sampled_validates_centroid_ids(spark):
    """ADVICE r03: ids ≥ n_clusters only → explicit error (not an
    opaque np.stack crash); a partial id prefix → RuntimeWarning."""
    import warnings

    rows = [(100 + i, np.eye(4)[i % 4].tolist()) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="id prefix"):
        S.ivf_topk_sampled(df, df, k=1, n_clusters=4, n_probe=2)
    rows2 = [(i, np.eye(4)[i % 4].tolist()) for i in range(2)] + rows
    df2 = spark.createDataFrame(rows2, "vec_id: long, embedding: array<double>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = S.ivf_topk_sampled(df2, df2, k=1, n_clusters=4, n_probe=2)
        out.count()
        assert any("2/4" in str(x.message) for x in w)


def test_simhash_pairs_banded_blocking(spark, docs):
    """Pigeonhole guarantee: a pair within hamming ≤ 3 MUST surface
    through the 4×16-bit band join. Near-identical planted docs (one
    token changed out of ~40) have tiny hamming distances; the banded
    result must equal the brute-force xor-popcount filter exactly."""
    from extract_sf_r_parallel_spark.functions.hashing import simhash64
    got = D.simhash_pairs(docs, max_hamming=3).toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    sigs = {r.doc_id: simhash64(r.text) for r in pdf.itertuples()}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3:
                want.add((a, b))
    assert set(zip(got.id_a, got.id_b)) == want
    assert (got.hamming <= 3).all()
    with pytest.raises(AssertionError, match="hamming < bands"):
        D.simhash_pairs(docs, max_hamming=4, bands=4)


def test_lloyd_ivf_recall_and_refinement(spark, vectors):
    """Lloyd-refined IVF (the integer-exact driver variant): recall vs
    brute force holds, planted twins land together, and the quantizer
    genuinely moves — its final corpus assignment must differ from the
    random-init (iters=0 ≡ sampled-centroid) assignment somewhere."""
    brute = S.brute_force_topk(vectors, vectors, k=1).toPandas()
    ann = S.ivf_topk_lloyd(vectors, vectors, k=1,
                           n_clusters=16, n_probe=6, iters=2).toPandas()
    bm = dict(zip(brute.qid, brute.nid))
    am = dict(zip(ann.qid, ann.nid))
    recall = sum(1 for q, n in bm.items() if am.get(q) == n) / len(bm)
    assert recall >= 0.8, f"Lloyd-IVF recall too low: {recall:.2f}"
    for i in range(15):
        assert am.get(500 + i) == i
    # the quantizer itself: distributed integer Lloyd must equal an
    # independent local NumPy replay of the same integer recurrence,
    # and two iterations must actually move the centroids
    _, C2, cids = S.lloyd_centroids(vectors, 16, iters=2)
    _, C0, _ = S.lloyd_centroids(vectors, 16, iters=0)
    assert (C2 != C0).any(), "2 Lloyd iterations moved no centroid"
    pdf = vectors.toPandas().sort_values("vec_id")
    Q = np.floor(np.stack([np.asarray(v, np.float64)
                           for v in pdf.embedding]) * 1_000_000 + 0.5) \
        .astype(np.int64)
    C = Q[:16].copy()
    for _ in range(2):
        d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        asg = np.argmin(d2, axis=1)          # first min = smaller cid
        Cn = C.copy()
        for j in range(16):
            m = asg == j
            if m.any():
                s, n = Q[m].sum(axis=0), int(m.sum())
                Cn[j] = (2 * s + n) // (2 * n)
        C = Cn
    np.testing.assert_array_equal(C2, C)


def test_lloyd_ivf_requires_id_prefix(spark, vectors):
    """The id-prefix init convention fails loudly when violated."""
    shifted = vectors.withColumn(
        "vec_id", vectors.vec_id + F.lit(10_000))
    with pytest.raises(ValueError, match="init centroid"):
        S.ivf_topk_lloyd(shifted, shifted, k=1, n_clusters=16)


def test_semantic_dedup_flags_planted_neighbours(spark, vectors):
    """The planted 500+i ≈ i twins share a cluster and cross the
    cosine bar, so exactly one of each pair is flagged; canonical ids
    are cluster minima and are never flagged themselves."""
    out = S.semantic_dedup(vectors, n_clusters=12, threshold=0.9) \
        .toPandas().set_index("vec_id")
    assert len(out) == 135

    # canonical = min id of its cluster, never a dup itself
    for cl, grp in out.groupby("cluster"):
        assert (grp.canonical_id == grp.index.min()).all()
        assert not out.loc[grp.index.min()].is_dup
        assert out.loc[grp.index.min()].cos_canon == 1.0

    # high-threshold flags must be dominated by the planted twins:
    # every planted twin whose canonical is its base partner is caught
    caught = 0
    for i in range(15):
        twin = out.loc[500 + i]
        if twin.canonical_id == i:
            assert twin.is_dup, (i, twin.cos_canon)
            caught += 1
    assert caught >= 10  # most twins land on their base as canonical

    # flags respect the threshold on the rounded score
    assert (out[out.is_dup].cos_canon >= 0.9).all()
    assert (~out[out.cos_canon < 0.9].is_dup).all()
