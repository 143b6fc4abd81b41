"""BPE induction: merges and token frequencies must match a serial
reference implementation (greedy left-to-right merging), including
repeated-pair runs where naive single-pass replace under-merges."""

from collections import Counter

from pyspark.sql import functions as F

from extract_sf_r_parallel_spark.operators.bpe import (
    bpe_token_freqs, learn_bpe)


def serial_bpe(word_counts: dict, iters: int):
    reprs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(iters):
        pc = Counter()
        for w, toks in reprs.items():
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += word_counts[w]
        if not pc:
            break
        # tie rule: max count, then lexicographically SMALLEST pair str
        top = max(pc.values())
        cand = sorted(" ".join(p) for p, c in pc.items() if c == top)
        pair = tuple(cand[0].split(" ", 1))
        # left-to-right greedy merge
        for w, toks in reprs.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == pair:
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            reprs[w] = out
        merges.append((" ".join(pair), pair[0] + pair[1], pc[pair]))
    freqs = Counter()
    for w, toks in reprs.items():
        for t in toks:
            freqs[t] += word_counts[w]
    return merges, dict(freqs)


def _run(spark, word_counts, iters):
    df = spark.createDataFrame(list(word_counts.items()),
                               "word string, cnt long")
    merges, reprs = learn_bpe(df, iters=iters)
    freqs = {r.token: r.freq for r in bpe_token_freqs(reprs).collect()}
    return merges, freqs


def test_classic_sennrich_example(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got_m, got_f = _run(spark, wc, 4)
    want_m, want_f = serial_bpe(wc, 4)
    assert got_m == want_m
    assert got_f == want_f
    assert got_m[0][0] == "e s"       # 'es' is the classic first merge


def test_repeated_pair_runs_merge_greedily(spark):
    wc = {"aaaa": 3, "aaa": 2, "ab": 1}
    got_m, got_f = _run(spark, wc, 1)
    want_m, want_f = serial_bpe(wc, 1)
    assert got_m == want_m == [("a a", "aa", 3 * 3 + 2 * 2)]
    # greedy: 'aaaa' → [aa, aa], 'aaa' → [aa, a]
    assert got_f == want_f
    assert got_f["aa"] == 3 * 2 + 2


def test_corpus_words_are_replace_safe(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    bad = words.filter(~F.col("w").rlike("^[0-9A-Za-z]+$")).count()
    assert bad == 0
