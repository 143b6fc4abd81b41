"""Wave-5 analytics operators: HyperLogLog sketch (accuracy + merge
semilattice), integer-mass PageRank (vs a serial reference), cohort
retention, PMI collocations, and the blocked edit-distance screen's
positive path (perturbed near-dups actually caught)."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.sketch import (
    hll_estimate, hll_merge, hll_registers)


# ---------------------------------------------------------------- HLL

def test_hll_estimate_within_error_bound(spark):
    # p=9 → m=512, standard error 1.04/sqrt(512) ≈ 4.6%. The hash is
    # fixed so the observed error is deterministic; assert 3σ.
    n = 50_000
    df = spark.range(n).withColumnRenamed("id", "uid")
    regs = [(r.register, r.max_rho)
            for r in hll_registers(df, "uid", p=9).collect()]
    assert len(regs) <= 512
    est = hll_estimate(regs, p=9)
    assert abs(est - n) / n < 0.14


def test_hll_small_range_linear_counting(spark):
    df = spark.range(30).withColumnRenamed("id", "uid")
    regs = [(r.register, r.max_rho)
            for r in hll_registers(df, "uid", p=9).collect()]
    est = hll_estimate(regs, p=9)
    assert abs(est - 30) < 5


def test_hll_merge_equals_union_sketch(spark):
    a = spark.range(0, 6000).withColumnRenamed("id", "uid")
    b = spark.range(4000, 10000).withColumnRenamed("id", "uid")  # overlap
    whole = spark.range(0, 10000).withColumnRenamed("id", "uid")
    merged = hll_merge(hll_registers(a, "uid"), hll_registers(b, "uid"))
    direct = hll_registers(whole, "uid")
    got = {(r.register, r.max_rho) for r in merged.collect()}
    want = {(r.register, r.max_rho) for r in direct.collect()}
    assert got == want  # max-semilattice: merge IS the union's sketch


def test_hll_duplicates_do_not_move_registers(spark):
    once = spark.range(1000).withColumnRenamed("id", "uid")
    thrice = once.unionAll(once).unionAll(once)
    got = {(r.register, r.max_rho)
           for r in hll_registers(thrice, "uid").collect()}
    want = {(r.register, r.max_rho)
            for r in hll_registers(once, "uid").collect()}
    assert got == want


def test_hll_p_out_of_range_raises(spark):
    df = spark.range(10).withColumnRenamed("id", "uid")
    with pytest.raises(ValueError, match="out of"):
        hll_registers(df, "uid", p=3)


# ----------------------------------------------------- PageRank walk

def _serial_pagerank(edges, nodes, iters=3, base=1_000_000):
    g = Counter()
    for s, d in edges:
        g[(s, d)] += 1
    tot = Counter()
    for (s, _), c in g.items():
        tot[s] += c
    mass = {v: base for v in nodes}
    for _ in range(iters):
        inc = defaultdict(int)
        for (s, d), c in g.items():
            inc[d] += mass[s] * c // tot[s]
        mass = {v: (85 * inc.get(v, 0) + 15 * base) // 100 for v in nodes}
    return mass


def test_pagerank_walk_matches_serial(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_pagerank_walk
    got = {r.node: r.mass
           for r in q_pagerank_walk(spark, "/root/testdata/sf0.001").collect()}
    e = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
         .select("user_id", "ts", "event_id",
                 F.regexp_extract("props", r'"k": (\d+)', 1)
                 .cast("long").alias("k"))
         .orderBy("user_id", "ts", "event_id").collect())
    edges, prev_user, prev_k = [], None, None
    for r in e:
        if r.user_id == prev_user:
            edges.append((prev_k, r.k))
        prev_user, prev_k = r.user_id, r.k
    nodes = {r.k for r in e}
    want = _serial_pagerank(edges, nodes)
    assert got == want
    # a sink-free damped walk conserves ≤ total base mass
    assert sum(got.values()) <= len(nodes) * 1_000_000


# ------------------------------------------------------------ cohort

def test_cohort_retention_offsets_nonnegative_and_bounded(spark):
    from extract_sf_r_parallel_spark.plans.relational import (
        q_cohort_retention)
    rows = q_cohort_retention(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.n_active <= r.cohort_size
    # offset 0 = the cohort's own first week: everyone is active
    for r in rows:
        if r.week_offset == 0:
            assert r.n_active == r.cohort_size


# --------------------------------------------------------------- PMI

def test_pmi_bigrams_matches_serial(spark):
    texts = ["a b a b a b c", "a b x y x y", "q r q r q r", "z z z z"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    from extract_sf_r_parallel_spark.plans.textops import q_pmi_bigrams
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        df.withColumn("lang", F.lit("en")) \
          .withColumn("source", F.lit("s")) \
          .withColumn("n_chars", F.length("text")) \
          .write.parquet(os.path.join(td, "documents.parquet"))
        got = {(r.w1, r.w2): (r.c_xy, r.c_x, r.c_y, r.is_colloc)
               for r in q_pmi_bigrams(spark, td).collect()}
    big = Counter()
    for t in texts:
        w = t.split(" ")
        for x, y in zip(w, w[1:]):
            big[(x, y)] += 1
    n = sum(big.values())
    cx, cy = Counter(), Counter()
    for (x, y), c in big.items():
        cx[x] += c
        cy[y] += c
    want = {(x, y): (c, cx[x], cy[y], c * n > 2 * cx[x] * cy[y])
            for (x, y), c in big.items() if c >= 3}
    assert got == want
    assert got[("a", "b")][3]          # a·b is a true collocation
    assert ("z", "z") in got           # run bigram: c=3 from 'z z z z'


# ------------------------------------------------- edit-distance dup

def test_edit_blocks_catches_perturbed_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    near = base[:-10] + "lazy cat x"          # small edit
    far = "completely different content " * 6
    rows = [(0, base), (1, near), (2, far)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("lang", F.lit("en")) \
        .withColumn("source", F.lit("s")) \
        .withColumn("n_chars", F.length("text"))
    import os
    import tempfile
    from extract_sf_r_parallel_spark.plans.textops import q_edit_blocks
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = q_edit_blocks(spark, td).collect()
    # base/near share a length bucket and have tiny prefix distance;
    # far lands in its own bucket (distinct n_chars div 64) → no pair
    by_block = {(r.lang, r.bkt): r for r in out}
    blocks_with_pairs = [r for r in out if r.n_pairs > 0]
    assert len(blocks_with_pairs) == 1
    assert blocks_with_pairs[0].min_dist == 0  # 120-char prefixes equal
    assert blocks_with_pairs[0].n_close == 1


# ------------------------------------------------- streaming HLL

def test_hll_stream_equals_batch_registers(spark):
    from extract_sf_r_parallel_spark.plans.registry import q_hll_stream
    sf = "/root/testdata/sf0.001"
    got = {(r.hour, r.register): r.max_rho
           for r in q_hll_stream(spark, sf).collect()}
    # batch twin in ONE job: same hash/register/rho arithmetic, keyed
    # by hour — stream ≡ batch is the property under test
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":hll"))),
        1, 15), 16, 10).cast("long")
    e = (spark.read.parquet(f"{sf}/events.parquet")
         .select(F.date_trunc("hour", "ts").alias("hour"),
                 h.alias("_h"))
         .select("hour", (F.col("_h") % 512).alias("register"),
                 F.when(F.expr("_h div 512") == 0, F.lit(52))
                 .otherwise(52 - F.length(F.bin(F.expr("_h div 512"))))
                 .alias("rho"))
         .groupBy("hour", "register").agg(F.max("rho").alias("max_rho")))
    want = {(r.hour, r.register): r.max_rho for r in e.collect()}
    assert got == want


# ---------------------------------------------------- Bloom filter

def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from extract_sf_r_parallel_spark.operators.sketch import (
        bloom_bits, bloom_probe)
    members = spark.range(0, 500).withColumnRenamed("id", "key")
    others = spark.range(500, 4500).withColumnRenamed("id", "key")
    bits = bloom_bits(members, "key")          # n=500·k=3 vs m=4096
    got_m = bloom_probe(members, bits, "key").collect()
    assert all(r.in_bloom for r in got_m)      # never a false negative
    got_o = bloom_probe(others, bits, "key").collect()
    fp = sum(r.in_bloom for r in got_o) / len(got_o)
    # load ≈ 1−e^{−kn/m} ≈ 0.31 → fp ≈ 0.31³ ≈ 3%; assert a loose 3×
    assert fp < 0.10


def test_bloom_bits_union_is_filter_of_union(spark):
    from extract_sf_r_parallel_spark.operators.sketch import bloom_bits
    a = spark.range(0, 300).withColumnRenamed("id", "key")
    b = spark.range(200, 600).withColumnRenamed("id", "key")
    merged = bloom_bits(a, "key").unionByName(bloom_bits(b, "key")) \
        .distinct()
    direct = bloom_bits(a.unionByName(b), "key")
    assert {r.bit for r in merged.collect()} == \
           {r.bit for r in direct.collect()}


# ------------------------------------------------ Count-Min sketch

def test_cms_never_undercounts_and_merges_additively(spark):
    from collections import Counter
    from extract_sf_r_parallel_spark.operators.sketch import (
        cms_estimate, cms_grid)
    import pandas as pd
    keys = [i % 40 for i in range(2000)]       # skewed: key k appears 50×
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    grid = [(r.sk_row, r.cell, r.cnt) for r in cms_grid(df, "k").collect()]
    truth = Counter(keys)
    for k, n in truth.items():
        assert cms_estimate(grid, k) >= n      # CMS invariant
    # total mass per sketch row = input size (counts are exact)
    per_row = Counter()
    for r, c, n in grid:
        per_row[r] += n
    assert set(per_row.values()) == {len(keys)}
    # additivity: grid(a) + grid(b) cellwise == grid(a ∪ b)
    a = spark.createDataFrame(pd.DataFrame({"k": keys[:1000]}))
    b = spark.createDataFrame(pd.DataFrame({"k": keys[1000:]}))
    merged = Counter()
    for part in (a, b):
        for r in cms_grid(part, "k").collect():
            merged[(r.sk_row, r.cell)] += r.cnt
    assert merged == {(r, c): n for r, c, n in grid}


# ------------------------------------------- rolling window features

def test_rolling_stats_matches_serial_trailing_hour(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_rolling_stats
    sf = "/root/testdata/sf0.001"
    got = {r.event_id: (r.n_1h, r.sum_1h)
           for r in q_rolling_stats(spark, sf).collect()}
    rows = (spark.read.parquet(f"{sf}/events.parquet")
            .select("user_id", "event_id", "value",
                    F.unix_timestamp("ts").alias("sec")).collect())
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        for r in rs:
            win = [o for o in rs if r.sec - 3599 <= o.sec <= r.sec]
            n = len(win)
            s = round(sum(o.value for o in win), 4)
            assert got[r.event_id][0] == n
            assert abs(got[r.event_id][1] - s) < 1e-9
    # no leakage: a row's window never counts future events
    assert all(n >= 1 for n, _ in got.values())


# ---------------------------------------------------- triangle count

def test_triangles_matches_serial_on_known_graphs(spark):
    import itertools
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from extract_sf_r_parallel_spark.plans.relational import q_triangles

    # build an events fixture whose transition graph is K5 ∪ one
    # 4-cycle (C4 has NO triangles) — walk each edge once per user
    def events_for(edge_walks):
        rows = []
        eid = 0
        for uid, walk in enumerate(edge_walks):
            for i, k in enumerate(walk):
                rows.append((eid, pd.Timestamp("2024-01-01")
                             + pd.Timedelta(seconds=i), uid, "view",
                             1.0, '{"k": %d}' % k))
                eid += 1
        return pd.DataFrame(rows, columns=[
            "event_id", "ts", "user_id", "event_type", "value", "props"])

    # K5 on nodes 0-4: one user walks all edges (Eulerian-ish: just
    # visit every pair adjacently via separate users)
    walks = [[a, b] for a, b in itertools.combinations(range(5), 2)]
    walks += [[10, 11], [11, 12], [12, 13], [13, 10]]       # C4: no tri
    pdf = events_for(walks)
    with tempfile.TemporaryDirectory() as td:
        t = pa.Table.from_pandas(pdf)
        t = t.set_column(t.schema.get_field_index("ts"),
                         "ts", t["ts"].cast(pa.timestamp("us")))
        pq.write_table(t, os.path.join(td, "events.parquet"))
        got = {r.node: r.n_tri for r in q_triangles(spark, td).collect()}
    # K5: every node is in C(4,2) = 6 triangles; C4 nodes in none
    assert got == {n: 6 for n in range(5)}


# ------------------------------------------------ data-quality suite

def test_quality_checks_one_pass_and_detects_planted_faults(spark):
    import pandas as pd
    from extract_sf_r_parallel_spark.operators.quality import (
        accepted_values, in_range, min_rows, not_null, run_checks, unique)
    df = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 2, 4],                 # duplicate
        "val": [5.0, None, 7.0, 99.0],      # null + out-of-range
        "cat": ["a", "b", "zz", "a"],       # bad category
    }))
    got = {r.check_name: (r.metric, r.passed)
           for r in run_checks(df, [
               not_null("val"), unique("id"), in_range("val", 0, 10),
               accepted_values("cat", ["a", "b"]), min_rows(3),
           ]).collect()}
    assert got["not_null(val)"] == (1, False)
    assert got["unique(id)"] == (1, False)
    assert got["in_range(val,0,10)"] == (1, False)     # 99.0 only; null skipped
    assert got["accepted_values(cat,[a,b])"] == (1, False)
    assert got["min_rows(3)"] == (4, True)
    # the suite is ONE scan: a single Aggregate over the source
    from extract_sf_r_parallel_spark.operators.quality import run_checks as rc
    plan = rc(df, [not_null("val"), unique("id"), min_rows(1)]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_quality_checks_all_green_on_clean_table(spark):
    from extract_sf_r_parallel_spark.operators.quality import (
        min_rows, not_null, run_checks, unique)
    df = spark.range(100).withColumnRenamed("id", "k")
    rows = run_checks(df, [not_null("k"), unique("k"),
                           min_rows(100)]).collect()
    assert all(r.passed for r in rows)


# ----------------------------------------------- damped walk / TextRank

def test_damped_walk_matches_serial_on_weighted_graph(spark):
    from extract_sf_r_parallel_spark.operators.graph import damped_walk
    edges = [("a", "b", 2), ("b", "a", 2), ("b", "c", 1),
             ("c", "b", 1), ("c", "a", 3), ("a", "c", 3)]
    df = spark.createDataFrame(edges, "src string, dst string, c long")
    got = {r.node: r.mass for r in damped_walk(df, iters=3).collect()}
    g = {(s, d): c for s, d, c in edges}
    tot = {}
    for (s, _), c in g.items():
        tot[s] = tot.get(s, 0) + c
    mass = {n: 1_000_000 for n in {x for e in edges for x in e[:2]}}
    for _ in range(3):
        inc = {}
        for (s, d), c in g.items():
            inc[d] = inc.get(d, 0) + mass[s] * c // tot[s]
        mass = {n: (85 * inc.get(n, 0) + 15 * 1_000_000) // 100
                for n in mass}
    assert got == mass


def test_textrank_hub_word_outranks_leaf(spark):
    import os
    import tempfile
    from extract_sf_r_parallel_spark.plans.textops import q_textrank
    # 'hub' co-occurs with everything; 'leaf' only with 'hub'
    texts = ["hub %s hub" % w for w in
             ["w1", "w2", "w3", "w4", "w5"] * 3] + ["hub leaf"] * 5
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {r.word: r.mass for r in q_textrank(spark, td).collect()}
    assert got["hub"] == max(got.values())
    assert got["hub"] > got["leaf"]


# --------------------------------------------- SCD2 + batch funnel

def _events_fixture(spark, rows):
    # rows: (user_id, second_offset, event_type, k)
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    pdf = pd.DataFrame(
        [(i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s),
          u, et, 1.0, '{"k": %d}' % k)
         for i, (u, s, et, k) in enumerate(rows)],
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"])
    td = tempfile.mkdtemp()
    t = pa.Table.from_pandas(pdf)
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, os.path.join(td, "events.parquet"))
    return td


def test_scd2_collapses_runs_and_chains_validity(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_scd2_build
    td = _events_fixture(spark, [
        (1, 0, "view", 5), (1, 10, "view", 5), (1, 20, "view", 7),
        (1, 30, "view", 5),          # k returns: NEW interval, not merged
        (2, 0, "view", 9),
    ])
    rows = sorted(q_scd2_build(spark, td).collect(),
                  key=lambda r: (r.user_id, r.valid_from))
    u1 = [r for r in rows if r.user_id == 1]
    assert [(r.k, r.n_events) for r in u1] == [(5, 2), (7, 1), (5, 1)]
    # intervals chain: each valid_to equals the next valid_from
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to == b.valid_from
    assert u1[-1].valid_to is None          # open current row
    u2 = [r for r in rows if r.user_id == 2]
    assert len(u2) == 1 and u2[0].valid_to is None


def test_funnel_requires_strict_order(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_funnel_steps
    td = _events_fixture(spark, [
        # user 1: full ordered funnel
        (1, 0, "view", 0), (1, 10, "click", 0), (1, 20, "purchase", 0),
        # user 2: purchase BEFORE click → only 2 steps
        (2, 0, "view", 0), (2, 5, "purchase", 0), (2, 10, "click", 0),
        # user 3: click before view → view only (click not after t1)
        (3, 5, "view", 0), (3, 0, "click", 0),
        # user 4: never viewed → not in the funnel at all
        (4, 0, "click", 0), (4, 1, "purchase", 0),
    ])
    got = {r.user_id: r.steps_completed
           for r in q_funnel_steps(spark, td).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


# ------------------------------------------------- exact chi-square

def test_ab_chisq_detects_planted_effect_and_null(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_ab_chisq
    # planted STRONG effect: even users always purchase, odd never
    rows = []
    for u in range(40):
        rows.append((u, u, "purchase" if u % 2 == 0 else "view", 0))
    td = _events_fixture(spark, [(u, s, et, k) for (u, s, et, k) in rows])
    r = q_ab_chisq(spark, td).collect()[0]
    assert (r.a, r.b, r.c2, r.d) == (20, 0, 0, 20)
    assert r.significant_95
    # exact-null fixture: identical conversion in both arms
    rows2 = []
    for u in range(40):
        rows2.append((u, u, "purchase" if u < 20 else "view", 0))
    td2 = _events_fixture(spark, rows2)
    r2 = q_ab_chisq(spark, td2).collect()[0]
    assert not r2.significant_95
    # χ² value sanity: num/den reproduces the textbook statistic
    n = r.a + r.b + r.c2 + r.d
    det = r.a * r.d - r.b * r.c2
    assert r.chisq_num100 == 100 * n * det * det


def test_cms_stream_equals_batch_grid(spark):
    from extract_sf_r_parallel_spark.plans.registry import q_cms_stream
    sf = "/root/testdata/sf0.001"
    got = {(r.hour, r.sk_row, r.cell): r.cnt
           for r in q_cms_stream(spark, sf).collect()}
    # batch twin in ONE job: same md5(key ':cms' row) cell arithmetic
    e = (spark.read.parquet(f"{sf}/events.parquet")
         .select(F.date_trunc("hour", "ts").alias("hour"), "user_id",
                 F.explode(F.array(*[F.lit(i) for i in range(4)]))
                 .alias("sk_row")))
    h = F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":cms"),
                       F.col("sk_row").cast("string")))
    cell = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % 256
    want = {(r.hour, r.sk_row, r.cell): r.cnt
            for r in e.withColumn("cell", cell)
            .groupBy("hour", "sk_row", "cell")
            .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want


def test_edit_blocks_caps_oversized_blocks(spark):
    """VERDICT r06 wrong-#3: an oversized (lang, len-bucket) block must
    be truncated to the cap's lowest doc_ids (deterministic), bound
    the pair count at cap·(cap−1)/2, and flag itself loudly."""
    import os
    import tempfile

    from extract_sf_r_parallel_spark.plans.textops import q_edit_blocks

    text = "x" * 70                       # all docs share one block
    rows = [(i, text) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("lang", F.lit("en")) \
        .withColumn("source", F.lit("s")) \
        .withColumn("n_chars", F.length("text"))
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = q_edit_blocks(spark, td, cap=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.truncated and r.n_docs == 12
    assert r.n_pairs == 5 * 4 // 2        # capped, not 12·11/2
    assert r.min_dist == 0 and r.n_close == r.n_pairs


def test_ewma_closed_form_equals_serial_fold(spark):
    """The unrolled 2^{n-1}-scaled weighted sum must equal the serial
    EWMA recursion s_i = (x_i + s_{i-1}) / 2 seeded at the oldest
    event — checked exactly in scaled-integer space per user."""
    from fractions import Fraction

    from extract_sf_r_parallel_spark.plans.relational import q_ewma_features

    sf = "/root/testdata/sf0.001"
    got = {r.user_id: (r.n_used, r.ewma_num, r.ewma_den)
           for r in q_ewma_features(spark, sf).collect()}
    import duckdb
    con = duckdb.connect()
    rows = con.sql(f"""
        SELECT user_id, CAST(FLOOR(value * 10000) AS BIGINT) AS xu
        FROM '{sf}/events.parquet'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) <= 8
        ORDER BY user_id, ts, event_id""").fetchall()
    byu: dict = {}
    for u, xu in rows:
        byu.setdefault(u, []).append(xu)   # oldest → newest
    assert set(byu) == set(got)
    for u, xs in byu.items():
        s = Fraction(xs[0])                # seed = oldest
        for x in xs[1:]:
            s = (Fraction(x) + s) / 2
        n_used, num, den = got[u]
        assert n_used == len(xs) and den == 2 ** (len(xs) - 1)
        assert Fraction(num, den) == s, u
