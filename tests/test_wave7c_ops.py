"""Brute-force pins for the r07 wave-D operators: quadtree_leaves
(vs a serial recursive PR-quadtree), audio_pitch (vs whole-array
NumPy autocorrelation + the tie rule on a perfectly periodic clip),
run_length_stats (vs a scanline RLE dict), and the inline wave-D
queries (cusum_change / gap_fill / bellman_hops / box_iou_join /
acf_lags) vs sequential pandas/NumPy recomputations at sf0.001."""

import re

import numpy as np
import pandas as pd

from extract_sf_r_parallel_spark.operators.multimodal import (
    audio_pitch, run_length_stats)
from extract_sf_r_parallel_spark.operators.quadtree import quadtree_leaves

SF = "/root/testdata/sf0.001"


# --- quadtree ---------------------------------------------------------------

def _serial_quadtree(pts, window, max_level, cap):
    out = {}

    def rec(lvl, cx, cy):
        side = window // (1 << lvl)
        mine = [(x, y) for x, y in pts
                if x // side == cx and y // side == cy]
        if not mine:
            return
        if len(mine) <= cap or lvl == max_level:
            out[(lvl, cx, cy)] = len(mine)
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(lvl + 1, 2 * cx + dx, 2 * cy + dy)

    rec(0, 0, 0)
    return out


def test_quadtree_matches_serial_recursion(spark):
    rng = np.random.default_rng(31)
    # skewed: one dense cluster + uniform background
    n_bg, n_cl = 300, 500
    xs = np.concatenate([rng.integers(0, 20000, n_bg),
                         rng.integers(1000, 1700, n_cl)])
    ys = np.concatenate([rng.integers(0, 20000, n_bg),
                         rng.integers(9000, 9700, n_cl)])
    pdf = pd.DataFrame({"id": np.arange(len(xs)), "x": xs, "y": ys})
    got = quadtree_leaves(spark.createDataFrame(pdf), window=20000,
                          max_level=5, cap=40).toPandas()
    want = _serial_quadtree(list(zip(xs.tolist(), ys.tolist())),
                            20000, 5, 40)
    assert {(r.lvl, r.cx, r.cy): r.n_points
            for r in got.itertuples()} == want
    # partition invariants: every point in exactly one leaf; only
    # max-level leaves may exceed cap; the dense cluster forced depth
    assert got.n_points.sum() == len(xs)
    assert (got[got.lvl < 5].n_points <= 40).all()
    assert got.lvl.max() >= 4 and got.lvl.min() <= 2
    assert (got.side == 20000 // (2 ** got.lvl)).all()


# --- audio pitch ------------------------------------------------------------

def _clips_df(spark, waves):
    rows = [{"clip_id": f"t{i:04d}",
             "bytes": np.asarray(s, dtype="<i2").tobytes(),
             "sr": np.int32(16000), "n_samples": np.int32(len(s)),
             "fmt": "s16le"} for i, s in enumerate(waves)]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_audio_pitch_periodic_and_tie_rule(spark):
    # period-40 square wave: R(40) == R(80) exactly (two full periods)
    # → the tie rule must pick the SMALLEST lag
    t = np.arange(2048)
    sq = np.where((t // 20) % 2 == 0, 10000, -10000).astype(np.int16)
    got = audio_pitch(_clips_df(spark, [sq])).toPandas().iloc[0]
    assert got.best_lag == 40
    assert got.r_best == 512 * 10000 * 10000
    assert got.f0_milli == 16000 * 1000 // 40


def test_audio_pitch_matches_numpy(spark):
    rng = np.random.default_rng(37)
    s = rng.integers(-32768, 32768, 4096).astype(np.int16)
    got = audio_pitch(_clips_df(spark, [s])).toPandas().iloc[0]
    s64 = s.astype(np.int64)
    lags = list(range(32, 97, 8))
    acf = [int(s64[:512] @ s64[L:L + 512]) for L in lags]
    i = int(np.argmax(acf))
    assert got.best_lag == lags[i]
    assert got.r_best == acf[i]
    assert got.r_lag32 == acf[0]


# --- run length -------------------------------------------------------------

def test_run_length_matches_scanline_rle(spark):
    rng = np.random.default_rng(41)
    h, w = 7, 11
    v = (rng.integers(0, 4, (h, w)) * 64).astype(np.uint8)
    img = np.repeat(v[..., None], 3, axis=2)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = run_length_stats(spark.createDataFrame(pdf)).toPandas().iloc[0]
    runs = []
    for row in (v >> 6):
        cur = 1
        for a, b in zip(row[:-1], row[1:]):
            if a == b:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
    assert got.n_px == h * w
    assert got.n_runs == len(runs)
    assert got.max_run == max(runs)
    assert got.mean_run_milli == h * w * 1000 // len(runs)


# --- inline wave-D queries vs pandas ---------------------------------------

def _day(ts: pd.Series) -> pd.Series:
    micros = ts.to_numpy().astype("datetime64[us]").astype("int64")
    return pd.Series(micros // 86_400_000_000, index=ts.index)


def test_cusum_change_matches_pandas(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_cusum_change
    got = q_cusum_change(spark, SF).toPandas().set_index("l_suppkey")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_shipdate"])
    li["day"] = _day(li.l_shipdate)
    for sk, g in li.groupby("l_suppkey"):
        daily = g.groupby("day").size().sort_index()
        n, total = len(daily), int(daily.sum())
        pref = daily.cumsum()
        d = (n * pref - np.arange(1, n + 1) * total).abs()
        r = got.loc[sk]
        assert (r.n_days, r.total) == (n, total)
        assert r.max_absd == d.max()
        assert r.cp_day == d.index[d.values == d.max()].min()


def test_gap_fill_matches_pandas(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_gap_fill
    got = q_gap_fill(spark, SF).toPandas().set_index("l_suppkey")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_quantity"])
    li["day"] = _day(li.l_shipdate)
    li["q"] = li.l_quantity.astype("int64")
    for sk, g in li.groupby("l_suppkey"):
        daily = g.groupby("day").q.sum().sort_index()
        days = daily.index.to_numpy()
        n_days = int(days[-1] - days[0] + 1)
        n_miss = s_interp = max_gap = 0
        for i in range(len(days) - 1):
            dp, dn = int(days[i]), int(days[i + 1])
            vp, vn = int(daily.iloc[i]), int(daily.iloc[i + 1])
            gap = dn - dp - 1
            if gap:
                n_miss += gap
                max_gap = max(max_gap, gap)
                for d in range(dp + 1, dn):
                    s_interp += (1000 * (vp * (dn - d) + vn * (d - dp))
                                 ) // (dn - dp)
        r = got.loc[sk]
        assert (r.n_days, r.n_missing) == (n_days, n_miss)
        assert r.sum_interp_milli == s_interp
        assert r.max_gap == max_gap


def test_bellman_hops_matches_serial_relaxation(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_bellman_hops
    got = {r.node: r.dist for r in
           q_bellman_hops(spark, SF).toPandas().itertuples()}
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "props"])
    ev["k"] = ev.props.map(
        lambda p: int(re.search(r'"k": (\d+)', p).group(1)))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    edges = set()
    for _, g in ev.groupby("user_id"):
        ks = g.k.tolist()
        edges.update(zip(ks[:-1], ks[1:]))
    dist = {k: 0 for k in ev.k.unique() if k % 10 == 0}
    for _ in range(3):
        nxt = dict(dist)
        for (u, v) in edges:
            if u in dist:
                w = (u + v) % 9 + 1
                nxt[v] = min(nxt.get(v, 1 << 60), dist[u] + w)
        dist = nxt
    assert got == dist


def test_box_iou_join_matches_allpairs(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        q_box_iou_join)
    got = q_box_iou_join(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    ids = ev.event_id[ev.event_id % 20 == 0].to_numpy()
    x0 = (ids * 48271 + 13) % 999983 % 20000 % 1800
    y0 = (ids * 69621 + 7) % 999979 % 20000 % 1800
    x1 = x0 + (ids % 7) * 20 + 40
    y1 = y0 + (ids // 7 % 7) * 20 + 40
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] >= ids[j]:
                continue
            iw = min(x1[i], x1[j]) - max(x0[i], x0[j])
            ih = min(y1[i], y1[j]) - max(y0[i], y0[j])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            areas = ((x1[i] - x0[i]) * (y1[i] - y0[i])
                     + (x1[j] - x0[j]) * (y1[j] - y0[j]))
            if 6 * inter >= areas:
                want.add((ids[i], ids[j], inter, areas - inter,
                          1000 * inter // (areas - inter)))
    assert {tuple(r) for r in got.itertuples(index=False)} == want


def test_acf_lags_matches_numpy(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import q_acf_lags
    got = q_acf_lags(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts"])
    tx = (ev.event_id * 48271 + 13) % 999983 % 20000 // 2000
    ty = (ev.event_id * 69621 + 7) % 999979 % 20000 // 2000
    day = _day(ev.ts)
    counts = (pd.DataFrame({"tx": tx, "ty": ty, "day": day})
              .groupby(["tx", "ty", "day"]).size())
    all_days = sorted(day.unique())
    cd = counts.to_dict()
    for (gtx, gty), sub in counts.groupby(level=[0, 1]):
        c = np.array([cd.get((gtx, gty, d), 0) for d in all_days],
                     dtype=np.int64)
        n, s = len(c), int(c.sum())
        u = n * c - s
        den = int(u @ u)
        rows = got[(got.tx == gtx) & (got.ty == gty)]
        if den == 0:
            assert rows.empty
            continue
        for lag in (1, 2, 3):
            num = int(u[:-lag] @ u[lag:])
            r = rows[rows.lag == lag].iloc[0]
            assert (r.num, r.den) == (num, den)
            assert abs(r.acf - round(num / den, 9)) < 1e-12


# --- wave E ------------------------------------------------------------------

def test_point_sample_matches_numpy_bilinear(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        q_point_sample)
    got = q_point_sample(spark, SF).toPandas().set_index("id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    ids = ev.event_id.to_numpy()
    x = (ids * 48271 + 13) % 999983 % 20000
    y = (ids * 69621 + 7) % 999979 % 20000

    def rval(cx, cy):
        return (cx * 2654435761 + cy * 40503 + 7) % 4294967291 % 1000

    n_checked = 0
    for i in range(len(ids)):
        if not (13 <= x[i] <= 19987 and 13 <= y[i] <= 19987):
            assert ids[i] not in got.index
            continue
        fx, fy = (2 * x[i] - 25) // 50, (2 * y[i] - 25) // 50
        tx, ty = 2 * x[i] - 50 * fx - 25, 2 * y[i] - 50 * fy - 25
        want = ((50 - tx) * (50 - ty) * rval(fx, fy)
                + tx * (50 - ty) * rval(fx + 1, fy)
                + (50 - tx) * ty * rval(fx, fy + 1)
                + tx * ty * rval(fx + 1, fy + 1))
        r = got.loc[ids[i]]
        assert r.val2500 == want
        assert r.val == want / 2500.0
        n_checked += 1
    assert n_checked == len(got)
    # bilinear bound: every sample within [min, max] of its 4 corners
    assert got.val.between(0, 999).all()


def test_voronoi_assign_matches_numpy(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        q_voronoi_assign)
    got = (q_voronoi_assign(spark, SF).toPandas()
           .set_index("site").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    ids = ev.event_id.to_numpy()
    x = (ids * 48271 + 13) % 999983 % 20000
    y = (ids * 69621 + 7) % 999979 % 20000
    s = np.arange(16)
    sx = (s * 7919 + 53) % 19000 + 500
    sy = (s * 104729 + 97) % 19000 + 500
    d2 = (x[:, None] - sx) ** 2 + (y[:, None] - sy) ** 2
    site = d2.argmin(axis=1)  # argmin picks the first (smallest id) tie
    for j in np.unique(site):
        m = site == j
        r = got.loc[j]
        assert r.n_points == m.sum()
        assert r.sum_d2 == d2[m, j].sum()
        assert (r.sum_x, r.sum_y) == (x[m].sum(), y[m].sum())
    assert got.n_points.sum() == len(ids)


def test_kcore_matches_serial_peeling(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_kcore
    got = {r.node: r.deg for r in
           q_kcore(spark, SF).toPandas().itertuples()}
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "props"])
    ev["k"] = ev.props.map(
        lambda p: int(re.search(r'"k": (\d+)', p).group(1)))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    edges = set()
    for _, g in ev.groupby("user_id"):
        ks = g.k.tolist()
        for a, b in zip(ks[:-1], ks[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    alive = {n for e in edges for n in e}
    deg = {}
    for _ in range(3):
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= 3}
    assert got == {n: deg[n] for n in alive}


def test_image_moments_matches_numpy(spark):
    from extract_sf_r_parallel_spark.operators.multimodal import (
        image_moments)
    rng = np.random.default_rng(43)
    h, w = 9, 13
    v = rng.integers(0, 256, (h, w)).astype(np.uint8)
    img = np.repeat(v[..., None], 3, axis=2)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = image_moments(spark.createDataFrame(pdf)).toPandas().iloc[0]
    ys, xs = np.mgrid[0:h, 0:w]
    v64 = v.astype(np.int64)
    m = int(v64.sum())
    m10, m01 = int((v64 * xs).sum()), int((v64 * ys).sum())
    m20, m02 = int((v64 * xs ** 2).sum()), int((v64 * ys ** 2).sum())
    m11 = int((v64 * xs * ys).sum())
    assert (got.mass, got.m10, got.m01) == (m, m10, m01)
    assert got.mu20m == m * m20 - m10 * m10
    assert got.mu02m == m * m02 - m01 * m01
    assert got.mu11m == m * m11 - m10 * m01
    # a wide horizontal bar must read as wider-than-tall
    bar = np.zeros((16, 16, 3), dtype=np.uint8)
    bar[7:9, 1:15] = 200
    pdf2 = pd.DataFrame([{
        "image_id": "t1", "bytes": bar.tobytes(),
        "w": np.int32(16), "h": np.int32(16), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    assert image_moments(
        spark.createDataFrame(pdf2)).toPandas().iloc[0].elong == 1


# --- wave F ------------------------------------------------------------------

def test_dow_seasonal_matches_pandas(spark):
    from extract_sf_r_parallel_spark.plans.relational import q_dow_seasonal
    got = (q_dow_seasonal(spark, SF).toPandas()
           .set_index(["l_suppkey", "dow"]).sort_index())
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_quantity"])
    li["day"] = _day(li.l_shipdate)
    li["q"] = li.l_quantity.astype("int64")
    daily = li.groupby(["l_suppkey", "day"]).q.sum().reset_index()
    daily["dow"] = daily.day % 7
    for (sk, dow), g in daily.groupby(["l_suppkey", "dow"]):
        tot = daily[daily.l_suppkey == sk]
        n_tot, sum_tot = len(tot), int(tot.q.sum())
        r = got.loc[(sk, dow)]
        assert (r.n_days, r.sum_v) == (len(g), int(g.q.sum()))
        assert r.effect_num == n_tot * int(g.q.sum()) - len(g) * sum_tot
        assert r.effect_den == n_tot * len(g)
    # seasonal effects sum to zero per supplier when weighted by n_days
    chk = got.reset_index().groupby("l_suppkey").apply(
        lambda d: int((d.effect_num).sum()), include_groups=False)
    assert (chk == 0).all()


def test_dbscan_classify_matches_brute(spark):
    from extract_sf_r_parallel_spark.plans.spatial_queries import (
        q_dbscan_classify)
    got = (q_dbscan_classify(spark, SF).toPandas()
           .set_index("id").sort_index())
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    ids = ev.event_id.to_numpy()
    x = (ids * 48271 + 13) % 999983 % 20000
    y = (ids * 69621 + 7) % 999979 % 20000
    d2 = ((x[:, None] - x) ** 2 + (y[:, None] - y) ** 2)
    nb = (d2 <= 300 * 300)           # self included on the diagonal
    n_nb = nb.sum(axis=1)
    is_core = n_nb >= 5
    near_core = (nb & is_core).any(axis=1)
    for i in range(len(ids)):
        r = got.loc[ids[i]]
        assert r.n_nb == n_nb[i]
        want = ("core" if is_core[i]
                else "border" if near_core[i] else "noise")
        assert r.cls == want
    assert len(got) == len(ids)


def test_hough_lines_detects_planted_line(spark):
    from extract_sf_r_parallel_spark.operators.multimodal import hough_lines
    # a black image with one bright VERTICAL line at x=20: every edge
    # pixel shares x ∈ {19, 21} → θ=0 (cos=1024) wins with a dominant
    # rho bucket; and the vote count matches the two edge columns
    h, w = 64, 64
    v = np.zeros((h, w), dtype=np.uint8)
    v[:, 20] = 255
    img = np.repeat(v[..., None], 3, axis=2)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = hough_lines(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert got.best_theta == 0
    # θ=0: rho = (x·1024 + 131072) // 4096 — x=19 and x=21 land in
    # buckets 36 and 37; each column has h−2 interior edge pixels
    assert got.best_count == h - 2
    assert got.best_rho in (36, 37)
    assert got.n_edges == 2 * (h - 2)


def test_hough_lines_matches_numpy_votes(spark):
    from extract_sf_r_parallel_spark.operators.multimodal import hough_lines
    rng = np.random.default_rng(47)
    h, w = 24, 31
    v = rng.integers(0, 256, (h, w)).astype(np.uint8)
    img = np.repeat(v[..., None], 3, axis=2)
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": img.tobytes(),
        "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
        "caption": "", "phash": np.int64(0)}])
    got = hough_lines(spark.createDataFrame(pdf)).toPandas().iloc[0]
    v64 = v.astype(np.int64)
    gx = ((v64[:-2, 2:] + 2 * v64[1:-1, 2:] + v64[2:, 2:])
          - (v64[:-2, :-2] + 2 * v64[1:-1, :-2] + v64[2:, :-2]))
    gy = ((v64[2:, :-2] + 2 * v64[2:, 1:-1] + v64[2:, 2:])
          - (v64[:-2, :-2] + 2 * v64[:-2, 1:-1] + v64[:-2, 2:]))
    ys, xs = np.nonzero(np.abs(gx) + np.abs(gy) >= 800)
    xs, ys = xs + 1, ys + 1
    assert got.n_edges == len(xs)
    cos = (1024, 887, 512, 0, -512, -887)
    sin = (0, 512, 887, 1024, 887, 512)
    acc = {}
    for t in range(6):
        rho = (xs * cos[t] + ys * sin[t] + 131072) // 4096
        for rr in rho:
            acc[(t, int(rr))] = acc.get((t, int(rr)), 0) + 1
    best = max(acc.items(), key=lambda kv: (kv[1], -kv[0][0], -kv[0][1]))
    mx = max(acc.values())
    cands = sorted(k for k, c in acc.items() if c == mx)
    assert got.best_count == mx
    assert (got.best_theta, got.best_rho) == cands[0]


# --- wave G ------------------------------------------------------------------

def test_pq_encode_matches_numpy(spark):
    from extract_sf_r_parallel_spark.operators.similarity import (
        pq_centroid, pq_encode)
    got = (pq_encode(spark.read.parquet(f"{SF}/embeddings.parquet"))
           .toPandas().set_index("vec_id").sort_index())
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    cb = np.array([[[pq_centroid(s, c, j) for j in range(8)]
                    for c in range(4)] for s in range(8)])
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        packed = 0
        err = 0.0
        for s in range(8):
            d = ((v[8 * s:8 * s + 8] - cb[s]) ** 2).sum(axis=1)
            # ties → smallest code (argmin picks first)
            c = int(np.argmin(d))
            packed += c * 4 ** s
            err += float(d[c])
        g = got.loc[r.vec_id]
        assert g.packed == packed
        assert abs(g.err6 - round(err, 6)) < 1e-9
    assert got.packed.between(0, 4 ** 8 - 1).all()


def test_audio_fingerprint_matches_numpy_and_banding_recall(spark):
    from extract_sf_r_parallel_spark.operators.multimodal import (
        audio_fingerprint)
    from extract_sf_r_parallel_spark.data import synth
    from extract_sf_r_parallel_spark.plans.registry import (
        q_audio_fp_dedup)
    clips = synth.audio_pdf(60)
    dec = clips[clips.fmt == "s16le"].reset_index(drop=True)
    got = (audio_fingerprint(spark.createDataFrame(dec))
           .toPandas().set_index("clip_id"))
    fps = {}
    for r in dec.itertuples():
        s = np.frombuffer(r.bytes, dtype="<i2",
                          count=r.n_samples).astype(np.int64)
        en = (s[:17 * 64] ** 2).reshape(17, 64).sum(axis=1)
        fp = int(((en[1:] > en[:-1]).astype(np.int64)
                  << np.arange(16)).sum())
        assert got.loc[r.clip_id].fp == fp
        fps[r.clip_id] = fp
    # banding completeness: the banded screen finds EVERY hamming≤2
    # pair the unbanded quadratic screen finds (pigeonhole: 3 bands
    # > max hamming 2) — recall proven, not assumed
    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(fps[a] ^ fps[b]).count("1") <= 2:
                want.add((a, b))
    full = q_audio_fp_dedup(spark, SF).toPandas()
    got_pairs = {(r.id_a, r.id_b) for r in full.itertuples()
                 if r.id_a in fps and r.id_b in fps}
    assert got_pairs == want
