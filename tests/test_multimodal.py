"""Multimodal pipeline: decode invariants (input_hint: PSNR ≥ 40 dB —
∞ for our lossless codecs — caption equality, phash stability),
resize, deterministic pixel embeddings feeding similarity, and the
clearly-marked video stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.data import codec, synth
from extract_sf_r_parallel_spark.operators import multimodal as M
from extract_sf_r_parallel_spark.operators.similarity import brute_force_topk

from .conftest import IMAGES_SCHEMA


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(synth.images_pdf(60), IMAGES_SCHEMA)


def test_decode_stats_phash_invariant(spark, images):
    out = M.decode_stats(images).toPandas()
    assert len(out) == 60
    assert out["phash_ok"].all()  # lossless round-trip: phash identical
    assert ((out[["mean_r", "mean_g", "mean_b"]] > 100)
            & (out[["mean_r", "mean_g", "mean_b"]] < 155)).all().all()


def test_resize_images(spark, images):
    out = M.resize_images(images, 16, 16).toPandas()
    for r in out.itertuples():
        img = codec.png_decode(bytes(r.bytes))
        assert img.shape == (16, 16, 3)


def test_pixel_embed_feeds_similarity(spark, images):
    emb = M.pixel_embed(images)
    pdf = emb.toPandas()
    assert all(len(v) == 64 for v in pdf.embedding)
    norms = [np.linalg.norm(np.asarray(v, np.float64)) for v in pdf.embedding]
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    nn = brute_force_topk(emb, emb, k=1, id_q="image_id", id_c="image_id").toPandas()
    assert len(nn) == 60


def test_frame_sample_passthrough_and_unknown_fmt(spark, images):
    ok = M.frame_sample(images).toPandas()
    assert len(ok) == 60 and (ok["frame_idx"] == 0).all()
    vid = images.withColumn("fmt", F.lit("mp4"))
    with pytest.raises(Exception, match="NotImplementedError|video codec"):
        M.frame_sample(vid).collect()


def test_cpnv_container_roundtrip():
    """CPNV encode → decode is lossless per frame, and the header walk
    selects exactly idx % every_n == 0 without touching other frames."""
    frames = [synth.pixel_plane(1000 + j, 24 * 16 * 3).reshape(16, 24, 3)
              for j in range(5)]
    data = codec.cpnv_encode(frames)
    assert codec.cpnv_frame_count(data) == 5
    back = codec.cpnv_decode(data)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert (a == b).all()
    picks = list(codec.cpnv_iter_frames(data, every_n=2))
    assert [i for i, _ in picks] == [0, 2, 4]
    for i, png in picks:
        assert (codec.png_decode(png) == frames[i]).all()


def test_frame_sample_cpnv_videos(spark):
    """Real video frame sampling: every_n=2 over videos with 3..7
    frames must emit ⌈nf/2⌉ decodable PNG rows per video, pixels equal
    to the generator's closed form."""
    vids = synth.videos_pdf(10)
    df = spark.createDataFrame(vids)
    out = M.frame_sample(df, every_n=2).toPandas()
    for i in range(10):
        nf = 3 + i % 5
        sel = out[out.image_id == f"vid{i:08d}"].sort_values("frame_idx")
        assert sel.frame_idx.tolist() == list(range(0, nf, 2))
        h = 32 if i % 2 == 0 else 48
        for r in sel.itertuples():
            img = codec.png_decode(bytes(r.bytes))
            want = synth.pixel_plane(
                42 * 1_000_003 + 500_000 + i * 64 + r.frame_idx,
                h * 32 * 3).reshape(h, 32, 3)
            assert (img == want).all()
    # sampled frames feed the rest of the multimodal family unchanged
    stats = M.pixel_embed(
        M.frame_sample(df, every_n=3)
        .withColumn("image_id",
                    F.concat_ws("#", "image_id", "frame_idx"))).toPandas()
    assert all(len(v) == 64 for v in stats.embedding)


def test_cjpg_lossy_codec_psnr_bound(spark):
    """The from-scratch lossy codec must honor the input_hint bound:
    decoded pixels PSNR ≥ 40 dB — provably, since the orthonormal DCT
    maps step²/12 quantization MSE straight to pixel MSE (≥43.9 dB at
    step=6 before clipping). Checked on the worst case (uniform noise),
    the Lehmer fixture planes, and smooth ramps, odd dims included."""
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (37, 53, 3), dtype=np.uint8),
            synth.pixel_plane(9001, 48 * 64 * 3).reshape(48, 64, 3)]
    x = np.linspace(0, 255, 64)
    imgs.append(np.clip(np.stack(
        [np.add.outer(x, x)[:40, :64] / 2] * 3, -1), 0, 255).astype(np.uint8))
    for img in imgs:
        data = codec.cjpg_encode(img)
        assert data == codec.cjpg_encode(img)  # deterministic
        back = codec.cjpg_decode(data)
        assert back.shape == img.shape
        assert codec.psnr(img, back) >= 40.0

    # the Spark decode path accepts fmt="cjpg" end-to-end, and the
    # perceptual hash survives the lossy round-trip almost unchanged
    import pandas as pd
    rows = []
    for i in range(6):
        img = synth.pixel_plane(7000 + i, 64 * 64 * 3).reshape(64, 64, 3)
        rows.append({"image_id": f"cj{i}", "bytes": codec.cjpg_encode(img),
                     "w": np.int32(64), "h": np.int32(64), "fmt": "cjpg",
                     "caption": "", "phash": np.int64(codec.phash64(img))})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = M.decode_stats(df).toPandas()
    assert len(out) == 6
    # phash_ok compares the ORIGINAL phash to the decoded one; lossy
    # may flip a few of 64 bits, so assert closeness explicitly instead
    for r in rows:
        back = codec.cjpg_decode(bytes(r["bytes"]))
        ham = bin(int(np.uint64(np.int64(codec.phash64(back)))
                      ^ np.uint64(np.int64(r["phash"])))).count("1")
        assert ham <= 8


def test_ahash_dedup_groups_planted_neardups(spark):
    """Planted near-dups (i≡1 mod 4 perturbs i−1) must mostly collide
    under the integer aHash, with NO false merges between genuinely
    distinct images; knife-edge bit flips (a block sum exactly at the
    image mean crossing over) are legitimate aHash behavior, so recall
    is asserted ≥ 0.8 exact and == 1.0 at Hamming ≤ 4."""
    n = 96
    images = spark.createDataFrame(synth.neardup_images_pdf(n))
    got = M.image_dup_groups(images).toPandas() \
        .set_index("image_id").sort_index()
    pairs = [(f"img{i-1:08d}", f"img{i:08d}")
             for i in range(1, n) if i % 4 == 1]

    # no false merges: any group >1 must be a planted pair
    planted = {p for pr in pairs for p in pr}
    merged = got[got.group_size > 1]
    for iid, r in merged.iterrows():
        assert iid in planted, f"false merge: {iid}"
        assert r.group_size == 2

    exact = sum(got.loc[a, "ahash"] == got.loc[b, "ahash"]
                for a, b in pairs)
    assert exact >= 0.8 * len(pairs), (exact, len(pairs))

    # Hamming-tolerant recall: every planted pair within 4 bits
    ham = [sum(x != y for x, y in zip(got.loc[a, "ahash"],
                                      got.loc[b, "ahash"]))
           for a, b in pairs]
    assert max(ham) <= 4, ham

    # canonical labeling: colliding pair → both rows carry the min id
    for a, b in pairs:
        if got.loc[a, "ahash"] == got.loc[b, "ahash"]:
            assert got.loc[b, "canonical_id"] == a
            assert got.loc[a, "canonical_id"] == a


def _flood_blobs(mask):
    """Independent reference: BFS flood fill (no union-find)."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    sizes = []
    for sy in range(h):
        for sx in range(w):
            if not mask[sy, sx] or seen[sy, sx]:
                continue
            stack, sz = [(sy, sx)], 0
            seen[sy, sx] = True
            while stack:
                y, x = stack.pop()
                sz += 1
                for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                    if (0 <= ny < h and 0 <= nx < w and mask[ny, nx]
                            and not seen[ny, nx]):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            sizes.append(sz)
    return sizes


def test_blob_stats_matches_flood_fill(spark, images):
    got = M.blob_stats(images).toPandas().set_index("image_id")
    pdf = synth.images_pdf(60)
    assert len(got) == 60
    for r in pdf.itertuples():
        img = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
        sizes = _flood_blobs(img[..., 0] >= 192)
        row = got.loc[r.image_id]
        assert row.n_fg == sum(sizes)
        assert row.n_blobs == len(sizes)
        assert row.max_blob == (max(sizes) if sizes else 0)


def test_blob_stats_degenerate_masks(spark):
    import pandas as pd
    # all-background and all-foreground synthetic images
    lo = np.zeros((8, 8, 3), dtype=np.uint8)
    hi = np.full((8, 8, 3), 255, dtype=np.uint8)
    rows = [
        {"image_id": "blank", "bytes": codec.encode_image(lo, "raw"),
         "w": 8, "h": 8, "fmt": "raw", "caption": "", "phash": 0},
        {"image_id": "solid", "bytes": codec.encode_image(hi, "raw"),
         "w": 8, "h": 8, "fmt": "raw", "caption": "", "phash": 0},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), IMAGES_SCHEMA)
    got = M.blob_stats(df).toPandas().set_index("image_id")
    assert tuple(got.loc["blank"][["n_fg", "n_blobs", "max_blob"]]) == (0, 0, 0)
    assert tuple(got.loc["solid"][["n_fg", "n_blobs", "max_blob"]]) == (64, 1, 64)


def test_hist_equalize_properties(spark, images):
    """Equalization invariants: max remap = 255 for non-constant
    images, sums match a direct per-pixel numpy remap, and a constant
    image maps to all-zero."""
    import pandas as pd
    got = M.hist_equalize_stats(images).toPandas().set_index("image_id")
    pdf = synth.images_pdf(60)
    for r in pdf.itertuples():
        v = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)[..., 0]
        hist = np.bincount(v.ravel(), minlength=256).astype(np.int64)
        cdf = np.cumsum(hist)
        cdfmin = int(cdf[hist > 0].min())
        # direct per-pixel remap (not via the histogram) = independent path
        eq_px = ((cdf[v.ravel()] - cdfmin) * 255) // (v.size - cdfmin)
        row = got.loc[r.image_id]
        assert row.eq_sum == int(eq_px.sum())
        assert row.eq_max == 255
        assert row.eq_distinct == len(np.unique(eq_px))

    solid = np.full((8, 8, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame(pd.DataFrame([{
        "image_id": "solid", "bytes": codec.encode_image(solid, "raw"),
        "w": 8, "h": 8, "fmt": "raw", "caption": "", "phash": 0}]),
        IMAGES_SCHEMA)
    row = M.hist_equalize_stats(df).collect()[0]
    assert (row.eq_sum, row.eq_distinct, row.eq_max) == (0, 1, 0)


def test_crop_stats_matches_direct_slice(spark, images):
    import pandas as pd
    pdf = synth.images_pdf(60)
    pdf["ox"] = (pdf.index * 7 % (pdf.w - 15)).astype("int32")
    pdf["oy"] = (pdf.index * 11 % (pdf.h - 15)).astype("int32")
    df = spark.createDataFrame(pdf)
    got = M.crop_stats(df, "ox", "oy", size=16).toPandas() \
        .set_index("image_id")
    for r in pdf.itertuples():
        v = codec.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)[..., 0]
        chip = v[r.oy:r.oy + 16, r.ox:r.ox + 16].astype(np.int64)
        assert got.loc[r.image_id].chip_sum == chip.sum()
        assert got.loc[r.image_id].chip_max == chip.max()


def test_crop_stats_out_of_bounds_raises(spark, images):
    import pandas as pd
    pdf = synth.images_pdf(3)
    pdf["ox"] = [0, 0, 100]   # 100 > w-16 for every fixture size
    pdf["oy"] = 0
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="outside"):
        M.crop_stats(df, "ox", "oy", size=16).collect()


def test_median_stats_matches_direct_median(spark):
    import numpy as np
    from extract_sf_r_parallel_spark.data import synth, codec
    from extract_sf_r_parallel_spark.operators.multimodal import median_stats
    pdf = synth.images_pdf(9)
    got = {r.image_id: (r.sum_median, r.n_changed, r.max_absdiff)
           for r in median_stats(spark.createDataFrame(pdf)).collect()}
    for r in pdf.itertuples():
        v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0].astype(np.int64)
        med = np.zeros((r.h - 2, r.w - 2), dtype=np.int64)
        for i in range(1, r.h - 1):
            for j in range(1, r.w - 1):
                med[i - 1, j - 1] = int(np.median(v[i - 1:i + 2, j - 1:j + 2]))
        ctr = v[1:-1, 1:-1]
        want = (int(med.sum()), int((med != ctr).sum()),
                int(np.abs(med - ctr).max()))
        assert got[r.image_id] == want


def test_median_stats_flattens_salt_noise(spark):
    # a constant image with isolated salt pixels: the median filter
    # restores every interior pixel, so sum_median = const·area and
    # every salted interior pixel counts as changed
    import numpy as np
    import pandas as pd
    from extract_sf_r_parallel_spark.data import codec
    from extract_sf_r_parallel_spark.operators.multimodal import median_stats
    h = w = 16
    img = np.full((h, w, 3), 50, dtype=np.uint8)
    salted = [(3, 4), (8, 9), (12, 5)]     # isolated → 8 clean neighbors
    for (i, j) in salted:
        img[i, j, 0] = 255
    raw = codec.encode_image(img, "png")
    df = spark.createDataFrame(pd.DataFrame(
        [("salt0", raw, w, h, "png", "cap", 0)],
        columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]))
    r = median_stats(df).collect()[0]
    assert r.sum_median == 50 * (h - 2) * (w - 2)
    assert r.n_changed == len(salted)
    assert r.max_absdiff == 205


def test_orient_hist_matches_direct_binning(spark):
    import numpy as np
    from extract_sf_r_parallel_spark.data import synth, codec
    from extract_sf_r_parallel_spark.operators.multimodal import orient_hist
    pdf = synth.images_pdf(9)
    got = {}
    for r in orient_hist(spark.createDataFrame(pdf)).collect():
        got[(r.image_id, r.obin)] = r.n
    want = {}
    for r in pdf.itertuples():
        v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0].astype(np.int64)
        for i in range(1, r.h - 1):
            for j in range(1, r.w - 1):
                win = v[i - 1:i + 2, j - 1:j + 2]
                gx = int((win[:, 2] * np.array([1, 2, 1])).sum()
                         - (win[:, 0] * np.array([1, 2, 1])).sum())
                gy = int((win[2, :] * np.array([1, 2, 1])).sum()
                         - (win[0, :] * np.array([1, 2, 1])).sum())
                if gx == 0 and gy == 0:
                    b = -1
                else:
                    b = 4 * (gy < 0) + 2 * (gx < 0) + (abs(gy) > abs(gx))
                want[(r.image_id, b)] = want.get((r.image_id, b), 0) + 1
    assert got == want


def test_orient_hist_bins_cover_interior(spark):
    from extract_sf_r_parallel_spark.data import synth
    from extract_sf_r_parallel_spark.operators.multimodal import orient_hist
    pdf = synth.images_pdf(6)
    rows = orient_hist(spark.createDataFrame(pdf)).collect()
    per_img = {}
    for r in rows:
        assert -1 <= r.obin <= 7
        per_img[r.image_id] = per_img.get(r.image_id, 0) + r.n
    for r in pdf.itertuples():
        assert per_img[r.image_id] == (r.h - 2) * (r.w - 2)


def test_glcm_stats_matches_direct_and_separates_texture(spark):
    import numpy as np
    import pandas as pd
    from extract_sf_r_parallel_spark.data import codec
    from extract_sf_r_parallel_spark.operators.multimodal import glcm_stats
    # smooth gradient vs checkerboard: contrast must separate them
    h = w = 16
    smooth = np.repeat(np.linspace(0, 255, w).astype(np.uint8)[None, :],
                       h, axis=0)[..., None].repeat(3, axis=2)
    checker = (np.indices((h, w)).sum(axis=0) % 2 * 255).astype(np.uint8)
    checker = checker[..., None].repeat(3, axis=2)
    rows = [("smooth", codec.encode_image(smooth, "png"), w, h, "png", "c", 0),
            ("checker", codec.encode_image(checker, "png"), w, h, "png", "c", 0)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption",
                       "phash"]))
    got = {r.image_id: r for r in glcm_stats(df).collect()}
    assert got["smooth"].contrast < got["checker"].contrast
    # checkerboard: every horizontal pair flips 0<->3 → contrast 9/pair
    assert got["checker"].contrast == 9 * got["checker"].n_pairs
    # direct replay for the smooth image
    lv = (smooth[..., 0] // 64).astype(int)
    pairs = {}
    for i in range(h):
        for j in range(w - 1):
            k = (lv[i, j], lv[i, j + 1])
            pairs[k] = pairs.get(k, 0) + 1
    want_contrast = sum((a - b) ** 2 * c for (a, b), c in pairs.items())
    want_energy = sum(c * c for c in pairs.values())
    assert got["smooth"].contrast == want_contrast
    assert got["smooth"].energy == want_energy


def test_glcm_stats_levels_validation(spark):
    import pytest as _pytest
    from extract_sf_r_parallel_spark.data import synth
    from extract_sf_r_parallel_spark.operators.multimodal import glcm_stats
    df = spark.createDataFrame(synth.images_pdf(1))
    with _pytest.raises(ValueError, match="must divide 256"):
        glcm_stats(df, levels=7)


def test_motion_stats_static_vs_cut(spark):
    import numpy as np
    import pandas as pd
    from extract_sf_r_parallel_spark.data import codec
    from extract_sf_r_parallel_spark.operators.multimodal import motion_stats
    h = w = 16
    a = np.full((h, w, 3), 10, dtype=np.uint8)
    b = a.copy(); b[5, 5, 0] = 14              # tiny motion: one pixel +4
    c = np.full((h, w, 3), 200, dtype=np.uint8)  # hard cut
    static = codec.cpnv_encode([a, a, a])
    cutty = codec.cpnv_encode([a, b, c])
    single = codec.cpnv_encode([a])
    df = spark.createDataFrame(pd.DataFrame(
        [("static", static, w, h, "cpnv", "s", 0),
         ("cutty", cutty, w, h, "cpnv", "s", 0),
         ("single", single, w, h, "cpnv", "s", 0)],
        columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]))
    rows = motion_stats(df).collect()
    got = {(r.image_id, r.frame_idx): (r.motion_l1, r.max_px_diff)
           for r in rows}
    assert got[("static", 1)] == (0, 0)
    assert got[("static", 2)] == (0, 0)
    assert got[("cutty", 1)] == (4, 4)                  # one pixel, +4
    assert got[("cutty", 2)] == ((200 - 10) * h * w - 4, 190)
    assert not any(k[0] == "single" for k in got)       # no pairs


def test_harris_stats_matches_direct_formula(spark):
    """harris_stats must equal the direct NumPy evaluation of
    R16 = 16(AB − C²) − (A+B)² over Sobel gradients + 3×3 box sums."""
    import numpy as np

    from extract_sf_r_parallel_spark.data import codec, synth
    from extract_sf_r_parallel_spark.operators.multimodal import harris_stats

    pdf = synth.images_pdf(27)
    pdf = pdf[(pdf.w == 32) & (pdf.h == 32)].reset_index(drop=True)
    got = {r.image_id: r for r in
           harris_stats(spark.createDataFrame(pdf),
                        thresh=2_000_000_000_000).collect()}
    assert len(got) == len(pdf) > 0
    for r in pdf.itertuples():
        v = codec.decode_image(r.bytes, r.fmt, r.w, r.h)[..., 0] \
            .astype(np.int64)
        gx = ((v[:-2, 2:] + 2 * v[1:-1, 2:] + v[2:, 2:])
              - (v[:-2, :-2] + 2 * v[1:-1, :-2] + v[2:, :-2]))
        gy = ((v[2:, :-2] + 2 * v[2:, 1:-1] + v[2:, 2:])
              - (v[:-2, :-2] + 2 * v[:-2, 1:-1] + v[:-2, 2:]))

        def box(a):
            return (a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
                    + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
                    + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:])

        A, B, C = box(gx * gx), box(gy * gy), box(gx * gy)
        r16 = 16 * (A * B - C * C) - (A + B) * (A + B)
        g = got[r.image_id]
        assert g.n_pos == int((r16 > 0).sum())
        assert g.n_corners == int((r16 > 2_000_000_000_000).sum())
        assert g.max_r16 == int(r16.max())
        assert g.sum_r16_m == int((r16[r16 > 0] // (1 << 20)).sum())
        # a corner is rarer than a positive response — threshold bites
        assert 0 < g.n_corners < g.n_pos
