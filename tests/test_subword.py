"""Distributed BPE merge learning vs a pure-Python reference.

The reference implements the same contract: weighted adjacent-pair
counts over the word vocabulary, most-frequent pair wins with
lexicographic tie-break, single-pass left-to-right non-overlapping
merge, stop when no pair reaches min_pair_count.
"""

from __future__ import annotations

from collections import Counter

import pytest

from ds_ga1004_bigdata_project_spark.functions.subword import bpe_learn


def _ref_bpe(texts, n_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    vocab = {w: [c for c in w] for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        cands = [(n, p) for p, n in pc.items() if n >= min_pair_count]
        if not cands:
            break
        # most frequent pair; lexicographic min on ties
        best = sorted(cands, key=lambda x: (-x[0], x[1][0], x[1][1]))[0]
        n, (l, r) = best
        merges.append((rank, l, r, l + r, n))
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "LOW lowest newest",
]


def test_merges_match_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    got = [(r.merge_rank, r.left, r.right, r.merged, r.pair_count)
           for r in bpe_learn(df, n_merges=12).orderBy("merge_rank").collect()]
    want, _ = _ref_bpe(CORPUS, 12)
    assert got == want
    assert len(got) >= 6  # the corpus genuinely supports many merges


def test_final_vocab_segmentation_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    _, vocab_df = bpe_learn(df, n_merges=8, return_vocab=True)
    got = {r.word: list(r.syms) for r in vocab_df.collect()}
    _, want = _ref_bpe(CORPUS, 8)
    assert got == want


def test_early_stop_when_no_pair_reaches_min_count(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    out = bpe_learn(df, n_merges=5, min_pair_count=2).collect()
    assert out == []  # every pair occurs once


def test_single_pass_merge_is_non_overlapping(spark):
    # "aaaa" x3: pair (a,a) counts 9; one merge pass yields aa,aa (not aaa,a).
    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")],
                               "doc_id long, text string")
    merges, vocab = bpe_learn(df, n_merges=1, return_vocab=True)
    m = merges.collect()
    assert [(r.left, r.right, r.pair_count) for r in m] == [("a", "a", 9)]
    assert list(vocab.collect()[0].syms) == ["aa", "aa"]


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    a = bpe_learn(df, n_merges=10).collect()
    b = bpe_learn(df, n_merges=10).collect()
    assert a == b


def test_invalid_n_merges_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_learn(df, n_merges=0)


def test_fertility_matches_reference(spark):
    from ds_ga1004_bigdata_project_spark.functions.subword import (
        bpe_fertility)

    rows = [(i, t, "en" if i % 2 == 0 else "de")
            for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in
           bpe_fertility(df, n_merges=8, group_col="lang").collect()}

    _, vocab = _ref_bpe(CORPUS, 8)
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0, set()])
    for i, t in enumerate(CORPUS):
        lang = "en" if i % 2 == 0 else "de"
        for w in t.lower().split():
            if not w:
                continue
            agg[lang][0] += 1
            agg[lang][1] += len(vocab[w])
            agg[lang][2].add(w)
    for lang, (nw, ns, dw) in agg.items():
        assert got[lang]["n_words"] == nw
        assert got[lang]["n_subtokens"] == ns
        assert got[lang]["distinct_words"] == len(dw)
        assert got[lang]["fertility"] == pytest.approx(
            round(ns / nw, 4), abs=0)


def test_fertility_every_corpus_word_is_encodable(spark):
    # the vocab join must cover EVERY corpus word (inner join loses none):
    # total word count in == n_words out
    from ds_ga1004_bigdata_project_spark.functions.subword import (
        bpe_fertility)

    df = spark.createDataFrame([(i, t, "x") for i, t in enumerate(CORPUS)],
                               "doc_id long, text string, lang string")
    out = bpe_fertility(df, n_merges=4, group_col="lang").collect()
    total_in = sum(len(t.lower().split()) for t in CORPUS)
    assert sum(r["n_words"] for r in out) == total_in
