"""BM25 scoring: exact agreement with an independent pure-Python
reimplementation on the corpus fixture, plus ranking sanity."""

import math

import pandas as pd

from extract_sf_r_parallel_spark.operators.ranking import bm25_scores

SF_DIR = "/root/testdata/sf0.001"
TERMS = ("table", "join", "spark")
K1, B = 1.2, 0.75


def _py_bm25(texts):
    toks = {d: t.split(" ") for d, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {q: sum(q in v for v in toks.values()) for q in TERMS}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for q in TERMS:
            tf = v.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        out[d] = (len(v), round(s, 6))
    return out


def test_bm25_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = bm25_scores(docs, TERMS).toPandas().set_index("doc_id")
    texts = dict(docs.select("doc_id", "text").toPandas()
                 .itertuples(index=False, name=None))
    want = _py_bm25(texts)
    assert len(got) == len(want)
    for d, (dl, s) in want.items():
        assert got.loc[d, "dl"] == dl
        assert abs(got.loc[d, "bm25"] - s) < 1e-6, (d, got.loc[d, "bm25"], s)


def test_bm25_ranking_sanity(spark):
    """A doc stuffed with a rare query term outranks one without any;
    term-free docs score exactly 0."""
    pdf = pd.DataFrame([
        {"doc_id": 0, "text": "spark spark spark row column"},
        {"doc_id": 1, "text": "row column value part"},
        {"doc_id": 2, "text": "table row"},
    ])
    got = bm25_scores(spark.createDataFrame(pdf), TERMS) \
        .toPandas().set_index("doc_id")
    assert got.loc[0, "bm25"] > got.loc[2, "bm25"] > 0
    assert got.loc[1, "bm25"] == 0.0
