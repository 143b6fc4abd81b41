"""Property tests (hypothesis) for the wave-5 kernels: the Hilbert
fold, the sketches, and BPE. Randomized inputs, serial references —
the properties the fixed driver fixtures can't sweep."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(max_examples=15, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


# ------------------------------------------------------------ Hilbert

@given(bits=st.integers(min_value=2, max_value=5))
@SET
def test_hilbert_bijective_at_any_order(spark, bits):
    import pandas as pd
    from extract_sf_r_parallel_spark.operators.hilbert import (
        with_hilbert_code)
    n = 1 << bits
    cells = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pd.DataFrame(cells, columns=["x", "y"]))
    codes = [r.hd for r in
             with_hilbert_code(df, extent=float(n), bits=bits).collect()]
    assert sorted(codes) == list(range(n * n))


# ------------------------------------------------------------ sketches

@given(members=st.sets(st.integers(min_value=0, max_value=10_000),
                       min_size=1, max_size=60))
@SET
def test_bloom_never_false_negative(spark, members):
    from extract_sf_r_parallel_spark.operators.sketch import (
        bloom_bits, bloom_probe)
    df = spark.createDataFrame([(m,) for m in members], "key long")
    bits = bloom_bits(df, "key")
    assert all(r.in_bloom for r in bloom_probe(df, bits, "key").collect())


@given(keys=st.lists(st.integers(min_value=0, max_value=30),
                     min_size=1, max_size=200))
@SET
def test_cms_point_estimates_never_undercount(spark, keys):
    from extract_sf_r_parallel_spark.operators.sketch import (
        cms_estimate, cms_grid)
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    grid = [(r.sk_row, r.cell, r.cnt) for r in cms_grid(df, "k").collect()]
    for k, n in Counter(keys).items():
        assert cms_estimate(grid, k) >= n


@given(n=st.integers(min_value=1, max_value=400))
@SET
def test_hll_registers_bounded_and_duplicate_free(spark, n):
    from extract_sf_r_parallel_spark.operators.sketch import hll_registers
    df = spark.range(n).withColumnRenamed("id", "uid")
    regs = hll_registers(df, "uid", p=6).collect()
    assert len(regs) <= 64
    assert len({r.register for r in regs}) == len(regs)
    assert all(1 <= r.max_rho <= 55 for r in regs)


# ---------------------------------------------------------------- BPE

@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1,
    max_size=12))
@SET
def test_bpe_matches_greedy_serial_on_random_corpora(spark, words):
    from extract_sf_r_parallel_spark.operators.bpe import (
        bpe_token_freqs, learn_bpe)
    from tests.test_bpe import serial_bpe
    wc = Counter(words)
    df = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    merges, reprs = learn_bpe(df, iters=2)
    freqs = {r.token: r.freq for r in bpe_token_freqs(reprs).collect()}
    want_m, want_f = serial_bpe(dict(wc), 2)
    assert merges == want_m
    assert freqs == want_f
