"""Sequence packing: chunk assignment must equal a serial reference,
straddling docs span the right number of chunks, and membership is
append-stable (adding later docs never moves earlier ones)."""

import pandas as pd
import pytest

from extract_sf_r_parallel_spark.operators.packing import (
    chunk_summary,
    pack_chunks,
)

BUDGET = 100


def _serial(pdf):
    """Serial concat-and-chunk reference."""
    out = []
    for lang, g in pdf.groupby("lang"):
        pos = 0
        for _, r in g.sort_values("doc_id").iterrows():
            first, last = pos, pos + r.n_tokens - 1
            out.append((r.doc_id, first // BUDGET, first % BUDGET,
                        last // BUDGET - first // BUDGET + 1))
            pos += r.n_tokens
    return pd.DataFrame(out, columns=[
        "doc_id", "chunk_id", "chunk_offset", "n_chunks_spanned"])


@pytest.fixture(scope="module")
def docs_pdf():
    import numpy as np
    rng = np.random.default_rng(31)
    n = 300
    return pd.DataFrame({
        "doc_id": np.arange(n),
        "lang": rng.choice(["en", "de", "fr"], n),
        # mix of tiny docs and budget-straddling giants
        "n_tokens": rng.choice([3, 17, 60, 99, 101, 250, 450], n),
    })


def test_pack_matches_serial_reference(spark, docs_pdf):
    got = pack_chunks(spark.createDataFrame(docs_pdf), "n_tokens",
                      BUDGET, ["lang"]) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    want = _serial(docs_pdf).sort_values("doc_id").reset_index(drop=True)
    for c in ["chunk_id", "chunk_offset", "n_chunks_spanned"]:
        assert got[c].tolist() == want[c].tolist(), c


def test_pack_append_stable(spark, docs_pdf):
    base = docs_pdf[docs_pdf.doc_id < 200]
    got_base = pack_chunks(spark.createDataFrame(base), "n_tokens",
                           BUDGET, ["lang"]).toPandas()
    got_full = pack_chunks(spark.createDataFrame(docs_pdf), "n_tokens",
                           BUDGET, ["lang"]).toPandas()
    merged = got_base.merge(got_full, on="doc_id", suffixes=("_b", "_f"))
    assert (merged.chunk_id_b == merged.chunk_id_f).all()
    assert (merged.chunk_offset_b == merged.chunk_offset_f).all()


def test_chunk_summary_conserves_tokens(spark, docs_pdf):
    packed = pack_chunks(spark.createDataFrame(docs_pdf), "n_tokens",
                         BUDGET, ["lang"])
    summ = chunk_summary(packed, ["lang"]).toPandas()
    assert summ.chunk_tokens.sum() == docs_pdf.n_tokens.sum()
    assert summ.n_docs.sum() == len(docs_pdf)
    # chunk ids are dense enough: every stream starts at chunk 0
    assert (summ.groupby("lang").chunk_id.min() == 0).all()
