"""Brute-force pins for the r07 wave-P queries: hotspot_stream vs the
batch tile rollup (streaming == batch equivalence), terrain_profile
vs a serial DDA + peak walk, rake_scores vs a dict-based RAKE
recomputation at sf0.001."""

import numpy as np
import pandas as pd

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979


def test_hotspot_stream_equals_batch_rollup(spark):
    got = E.queries()["hotspot_stream"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "value"])
    ev["hour"] = ev.ts.dt.floor("h")
    ev["gx"] = (((ev.event_id * 48271 + 13) % _P1) % 20000) // 2000
    ev["gy"] = (((ev.event_id * 69621 + 7) % _P2) % 20000) // 2000
    want = (ev.groupby(["hour", "gx", "gy"])
            .agg(n=("value", "size"), sum_value=("value", "sum"))
            .reset_index())
    want["sum_value"] = want.sum_value.round(4)
    g = (got.sort_values(["hour", "gx", "gy"]).reset_index(drop=True))
    w = (want.sort_values(["hour", "gx", "gy"]).reset_index(drop=True))
    assert len(g) == len(w)
    assert (g.n.to_numpy() == w.n.to_numpy()).all()
    assert np.allclose(g.sum_value, w.sum_value, atol=1e-9)


def test_terrain_profile_matches_serial_walk(spark):
    got = (E.queries()["terrain_profile"](spark, SF).toPandas()
           .set_index("s").sort_index())
    W = 20000
    for s in range(0, 200, 7):       # spot-check a deterministic slice
        x0 = ((s * 48271 + 13) % _P1) % W
        y0 = ((s * 69621 + 7) % _P2) % W
        x1 = ((s * 16807 + 3) % _P1) % W
        y1 = ((s * 65539 + 11) % _P2) % W
        n = max(abs(x1 - x0), abs(y1 - y0), 1)
        vals = []
        for t in range(n + 1):
            x = x0 + (2 * t * (x1 - x0) + n + 40000 * n) // (2 * n) - 20000
            y = y0 + (2 * t * (y1 - y0) + n + 40000 * n) // (2 * n) - 20000
            cx, cy = x // 25, y // 25
            vals.append(((cx * 2654435761 + cy * 40503 + 7)
                         % 4294967291) % 1000)
        row = got.loc[s]
        assert row.n_samples == n + 1
        assert row.sum_v == sum(vals)
        assert row.peak_v == max(vals)
        assert row.peak_t == vals.index(max(vals))


def test_rake_scores_matches_dicts(spark):
    got = (E.queries()["rake_scores"](spark, SF).toPandas()
           .set_index("w").sort_index())
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    freq: dict = {}
    deg: dict = {}
    for r in docs.itertuples():
        phrase: list = []
        for w in r.text.split(" ") + ["the"]:    # sentinel flush
            if w in ("a", "the"):
                for x in phrase:
                    freq[x] = freq.get(x, 0) + 1
                    deg[x] = deg.get(x, 0) + len(phrase)
                phrase = []
            else:
                phrase.append(w)
    assert set(got.index) == set(freq)
    for w in freq:
        row = got.loc[w]
        assert row.freq == freq[w] and row.deg == deg[w]
        assert row.score_milli == 1000 * deg[w] // freq[w]
        assert row.deg >= row.freq  # every phrase has length ≥ 1
