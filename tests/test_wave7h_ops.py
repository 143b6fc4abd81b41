"""Brute-force pins for the r07 wave-L queries: lm_novelty vs a
dict-count recomputation, str_pack vs a serial Sort-Tile-Recursive
packer (with the balance invariant), map_algebra vs the full NumPy
two-band calculator, and template_match vs scipy-free explicit
correlation plus a planted-template localization check."""

import numpy as np
import pandas as pd

import __spark_entry__ as E
from extract_sf_r_parallel_spark.operators.multimodal import (
    TMPL5, template_match)

SF = "/root/testdata/sf0.001"

_P1, _P2 = 999983, 999979
WINDOW = 20000


def test_lm_novelty_matches_dict_counts(spark):
    got = (E.queries()["lm_novelty"](spark, SF).toPandas()
           .set_index("doc_id").sort_index())
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    per_doc = {}
    tot: dict = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        bis = list(zip(ws[:-1], ws[1:]))
        per_doc[r.doc_id] = bis
        for b in bis:
            tot[b] = tot.get(b, 0) + 1
    for did, bis in per_doc.items():
        if not bis:
            assert did not in got.index
            continue
        row = got.loc[did]
        assert row.n_bigrams == len(bis)
        assert row.n_unique == sum(tot[b] == 1 for b in bis)
        assert row.n_rare == sum(tot[b] <= 3 for b in bis)


def test_str_pack_matches_serial_and_balances(spark):
    got = E.queries()["str_pack"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type"])
    ev["x"] = ((ev.event_id * 48271 + 13) % _P1) % WINDOW
    ev["y"] = ((ev.event_id * 69621 + 7) % _P2) % WINDOW
    want = {}
    for layer, g in ev.groupby("event_type"):
        pts = sorted(zip(g.x, g.y, g.event_id))
        n = len(pts)
        slabs: dict = {}
        for rx, (x, y, i) in enumerate(pts, 1):
            slabs.setdefault((rx - 1) * 8 // n, []).append((y, i, x))
        for slab, sp in slabs.items():
            sp.sort()
            ns = len(sp)
            leaves: dict = {}
            for ry, (y, i, x) in enumerate(sp, 1):
                leaves.setdefault((ry - 1) * 8 // ns, []).append((x, y))
            for leaf, pl in leaves.items():
                xs = [p[0] for p in pl]
                ys = [p[1] for p in pl]
                want[(layer, slab, leaf)] = (
                    len(pl), min(xs), max(xs), min(ys), max(ys))
    assert {(r.layer, r.slab, r.leaf):
            (r.n_pts, r.x_lo, r.x_hi, r.y_lo, r.y_hi)
            for r in got.itertuples()} == want
    # STR balance invariant: leaf counts within a layer differ ≤ 2
    # (one rounding per cut level)
    for layer, g in got.groupby("layer"):
        assert g.n_pts.max() - g.n_pts.min() <= 2, layer


def test_map_algebra_matches_numpy(spark):
    got = (E.queries()["map_algebra"](spark, SF).toPandas()
           .set_index(["bx", "by"]).sort_index())
    n = 800
    cx, cy = np.meshgrid(np.arange(n, dtype=np.int64),
                         np.arange(n, dtype=np.int64), indexing="ij")
    a = ((cx * 2654435761 + cy * 40503 + 7) % 4294967291) % 1000
    b = ((cx * 40503 + cy * 2654435761 + 11) % 4294967291) % 1000
    d, sm = a - b, a + b
    df = pd.DataFrame({"bx": (cx // 25).ravel(), "by": (cy // 25).ravel(),
                       "d": d.ravel(), "sm": sm.ravel()})
    grp = df.groupby(["bx", "by"])
    assert (got.n_cells == 625).all() and len(got) == 1024
    assert (got.sum_d == grp.d.sum()).all()
    assert (got.n_high == grp.apply(
        lambda g: int((5 * g.d > g.sm).sum()), include_groups=False)).all()
    assert (got.n_low == grp.apply(
        lambda g: int((5 * g.d < -g.sm).sum()), include_groups=False)).all()


def _img_df(spark, v):
    img = np.repeat(v[..., None].astype(np.uint8), 3, axis=2)
    return spark.createDataFrame(pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(v.shape[1]), "h": np.int32(v.shape[0]),
        "fmt": "raw", "caption": "", "phash": np.int64(0)}]))


def test_template_match_finds_planted_template(spark):
    # plant an amplified copy of the positive template parts at (6, 9)
    v = np.zeros((20, 25), dtype=np.int64)
    v[6:11, 9:14] = np.where(TMPL5 > 0, 255, 0)
    got = template_match(_img_df(spark, v)).toPandas().iloc[0]
    assert (got.best_r, got.best_c) == (6, 9)
    assert got.best_score == int((TMPL5 * v[6:11, 9:14]).sum())


def test_template_match_matches_explicit_correlation(spark):
    rng = np.random.default_rng(61)
    v = rng.integers(0, 256, (17, 23), dtype=np.int64)
    got = template_match(_img_df(spark, v)).toPandas().iloc[0]
    H, W = v.shape
    best = None
    for r in range(H - 4):
        for c in range(W - 4):
            s = int((TMPL5 * v[r:r + 5, c:c + 5]).sum())
            if best is None or s > best[2]:
                best = (r, c, s)
    assert (got.best_r, got.best_c, got.best_score) == best
