"""Pure-Python oracles for the text ops that the driver records
rows-only (fingerprints, BPE-ish tokens, langid, quality)."""

import numpy as np

from extract_sf_r_parallel_spark.functions import hashing as H
from extract_sf_r_parallel_spark.functions import text as TX


def test_rolling_fingerprint_known_values():
    # oracle: direct polynomial evaluation
    t = "abc"
    want = ((ord("a") * 1_000_003 + ord("b")) * 1_000_003 + ord("c")) % ((1 << 61) - 1)
    assert H.rolling_fingerprint(t) == want
    assert H.rolling_fingerprint("abc") != H.rolling_fingerprint("acb")


def test_bpe_token_count():
    assert TX.bpe_token_count("hello world") == 2
    assert TX.bpe_token_count("a1b!!c") == 5  # a | 1 | b | !! | c
    assert TX.bpe_token_count("it's 42.5%") == 7  # it|'|s|42|.|5|%
    # exact oracle: regex [A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+
    import re
    for s in ["it's 42.5%", "x  y", "...", ""]:
        assert TX.bpe_token_count(s) == len(
            re.findall(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+", s))


def test_langid_profiles():
    assert TX.langid_score("the cat and the dog running") == "en"
    assert TX.langid_score("le chat et la maison une belle") == "fr"
    assert TX.langid_score("der hund und ich schnell") == "de"
    assert TX.langid_score("zzz qqq") == "unknown"


def test_shingles_and_jaccard():
    a = H.shingle_hashes("the quick brown fox jumps", 3)
    b = H.shingle_hashes("the quick brown fox leaps", 3)
    assert len(a) == 3 and len(b) == 3
    j = H.jaccard(a, b)
    # shares 2 of 4 distinct shingles → 2/4
    assert j == 0.5
    assert H.jaccard(a, a) == 1.0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(5)
    base = [f"tok{i}" for i in range(200)]
    doc_a = " ".join(base)
    # 10% token perturbation → high jaccard
    toks = list(base)
    for i in rng.choice(200, 20, replace=False):
        toks[i] = f"alt{i}"
    doc_b = " ".join(toks)
    sa = H.shingle_hashes(doc_a)
    sb = H.shingle_hashes(doc_b)
    true_j = H.jaccard(sa, sb)
    siga = H.minhash_signature(sa, 256)
    sigb = H.minhash_signature(sb, 256)
    est = (siga == sigb).mean()
    assert abs(est - true_j) < 0.12


def test_simhash_near_vs_far():
    a = " ".join(f"tok{i}" for i in range(100))
    b = a.replace("tok5", "alt5").replace("tok50", "alt50")
    c = " ".join(f"other{i}" for i in range(100))
    ha, hb, hc = H.simhash64(a), H.simhash64(b), H.simhash64(c)
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(ha, hb) < ham(ha, hc)
    assert ham(ha, hb) <= 16
