"""Brute-force pins for the r07 wave-M queries: audio_resample vs a
per-sample Python interpolator (plus an exactness check against the
float resampler), mediancut_split vs a serial Heckbert first cut,
simpson_diversity vs dict counts, benford_digits vs str() heads."""

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import (
    audio_resample, mediancut_split)

SF = "/root/testdata/sf0.001"


def _clip_df(spark, s):
    return spark.createDataFrame(pd.DataFrame([{
        "clip_id": "t0", "bytes": np.asarray(s, dtype="<i2").tobytes(),
        "sr": np.int32(16000), "n_samples": np.int32(len(s)),
        "fmt": "s16le"}]))


def test_audio_resample_matches_serial(spark):
    rng = np.random.default_rng(67)
    s = rng.integers(-32768, 32768, 4096).astype(np.int16)
    got = audio_resample(_clip_df(spark, s)).toPandas().iloc[0]
    s64 = s.astype(np.int64)
    out2 = []
    k = 0
    while 3 * k <= 2 * (len(s) - 1):
        if k % 2 == 0:
            out2.append(2 * int(s64[3 * k // 2]))
        else:
            a = (3 * k - 1) // 2
            out2.append(int(s64[a]) + int(s64[a + 1]))
        k += 1
    out2 = np.array(out2)
    # the scaled-integer stream IS the float linear interpolation ×2
    pos = np.arange(len(out2)) * 1.5
    interp = np.interp(pos, np.arange(len(s64)), s64.astype(float))
    assert np.array_equal(out2, (2 * interp).astype(np.int64))
    assert got.n_out == len(out2) == 2 * (len(s) - 1) // 3 + 1
    assert got.sum_abs2 == np.abs(out2).sum()
    assert got.energy4 == (out2 * out2).sum()
    assert got.max_abs2 == np.abs(out2).max()


def test_mediancut_matches_serial(spark):
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(11), "h": np.int32(9), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = mediancut_split(spark.createDataFrame(pdf)).toPandas().iloc[0]
    rngs = [int(img[..., c].max()) - int(img[..., c].min())
            for c in range(3)]
    split = rngs.index(max(rngs))
    v = np.sort(img[..., split].ravel().astype(np.int64))
    med = int(v[(len(v) + 1) // 2 - 1])
    assert got.split_c == split and got.med_v == med
    assert got.n_lo == int((v <= med).sum())
    assert got.n_hi == int((v > med).sum())
    assert got.n_lo + got.n_hi == 9 * 11
    assert got.n_lo >= got.n_hi  # lower median ⇒ lo half ≥ hi half


def test_simpson_diversity_matches_dicts(spark):
    got = (E.queries()["simpson_diversity"](spark, SF).toPandas()
           .set_index("user_id").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    for uid, g in ev.groupby("user_id"):
        c = g.event_type.value_counts()
        row = got.loc[uid]
        n = len(g)
        assert row.n == n
        assert row.sum_c2 == int((c ** 2).sum())
        assert row.div_num == n * n - int((c ** 2).sum())
        best = c.max()
        assert row.top_type == min(t for t, k in c.items() if k == best)


def test_benford_digits_matches_str_heads(spark):
    got = (E.queries()["benford_digits"](spark, SF).toPandas()
           .set_index("digit").sort_index())
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    cents = np.round(o.o_totalprice * 100).astype(np.int64)
    heads = cents.astype(str).str[0].astype(int)
    counts = heads.value_counts().sort_index()
    n = len(cents)
    assert list(got.index) == list(counts.index)
    for d in counts.index:
        row = got.loc[d]
        assert row.n_d == counts[d] and row.n == n
        assert row.dev9 == 9 * counts[d] - n
        nxt = counts.get(d + 1)
        assert row.ge_next == (True if nxt is None else counts[d] >= nxt)
