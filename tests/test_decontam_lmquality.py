"""Benchmark decontamination (n-gram overlap) and bigram-LM quality scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tsidx.decontam import decontaminate, doc_ngrams, ngram_overlap
from tsidx.lmquality import (
    bigram_lm_score,
    doc_bigrams,
    dsir_log_weights,
    dsir_resample,
    ppl_buckets,
    train_bigram_lm,
)

# corpus: doc 0 is a verbatim benchmark leak, doc 1 a partial overlap,
# doc 2 clean, doc 3 too short for 3-grams, doc 4 repeats one gram.
CORPUS = [
    (0, "alpha beta gamma delta epsilon"),
    (1, "alpha beta gamma zeta eta theta iota"),
    (2, "one two three four five six"),
    (3, "tiny doc"),
    (4, "x y z x y z x y z"),
]
BENCH = [(100, "alpha beta gamma delta epsilon kappa")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(BENCH, "doc_id long, text string")


def test_doc_ngrams_short_doc_yields_null_row(corpus):
    rows = doc_ngrams(corpus.where("doc_id = 3"), n=3).collect()
    assert [(r["doc_id"], r["gram"]) for r in rows] == [(3, None)]


def test_doc_ngrams_distinct_within_doc(corpus):
    # doc 4 has 7 trigram positions but only 3 distinct trigrams
    grams = sorted(
        r["gram"] for r in doc_ngrams(corpus.where("doc_id = 4"), n=3).collect()
    )
    assert grams == ["x y z", "y z x", "z x y"]


def test_ngram_overlap(corpus, bench):
    got = {
        r["doc_id"]: r
        for r in ngram_overlap(corpus, bench, n=3, tau=0.5).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    # doc 0: 3 trigrams, all inside the benchmark text -> fully contaminated
    assert (got[0]["n_grams"], got[0]["n_hit"]) == (3, 3)
    assert got[0]["overlap_frac"] == 1.0 and got[0]["contaminated"]
    # doc 1: 5 trigrams, only "alpha beta gamma" is shared
    assert (got[1]["n_grams"], got[1]["n_hit"]) == (5, 1)
    assert not got[1]["contaminated"]
    # doc 2: clean
    assert (got[2]["n_hit"], got[2]["contaminated"]) == (0, False)
    # doc 3: too short -> 0 grams, frac defined as 0.0, not contaminated
    assert (got[3]["n_grams"], got[3]["overlap_frac"]) == (0, 0.0)
    assert not got[3]["contaminated"]


def test_decontaminate_drops_only_flagged(corpus, bench):
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=3, tau=0.5).collect()
    )
    assert kept == [1, 2, 3, 4]


def test_overlap_threshold_boundary(corpus, bench):
    # tau exactly equal to the achieved fraction counts as contaminated
    got = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_overlap(corpus, bench, n=3, tau=0.2).collect()
    }
    assert got[1]  # 1/5 == 0.2 >= tau


def test_doc_bigrams_counts(corpus):
    rows = doc_bigrams(corpus.where("doc_id = 4")).collect()
    assert len(rows) == 8  # 9 tokens -> 8 adjacent pairs, multiplicity kept
    assert sum(1 for r in rows if (r["w1"], r["w2"]) == ("x", "y")) == 3


def test_doc_bigrams_single_token(spark):
    one = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    assert doc_bigrams(one).count() == 0


def test_bigram_lm_self_score_hand_computed(spark):
    # two docs, tiny closed vocab: verify one probability end-to-end
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    alpha = 0.1
    got = {r["doc_id"]: r for r in bigram_lm_score(docs, alpha=alpha).collect()}
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; c1: a=3, b=2; V=3
    p_ab = (3 + alpha) / (3 + alpha * 3)
    p_ba = (1 + alpha) / (2 + alpha * 3)
    p_bc = (1 + alpha) / (2 + alpha * 3)
    want0 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    want1 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got[0]["n_bigrams"] == 3
    assert abs(got[0]["xent"] - want0) < 1e-9
    assert abs(got[1]["xent"] - want1) < 1e-9
    assert abs(got[0]["ppl"] - math.exp(want0)) < 1e-9


def test_bigram_lm_short_doc_null_score(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "solo")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert got[1]["n_bigrams"] == 0
    assert got[1]["xent"] is None and got[1]["ppl"] is None


def test_bigram_lm_external_model_unseen_bigrams(spark):
    # train on one corpus, score another containing an unseen bigram —
    # smoothing must give it a finite positive NLL
    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    score = spark.createDataFrame([(0, "b b")], "doc_id long, text string")
    model = train_bigram_lm(train)
    got = bigram_lm_score(score, model=model).collect()[0]
    alpha = 0.1
    # c(b,.) = 1 (from "b a"), c(b,b) = 0, V = 2
    want = -math.log(alpha / (1 + alpha * 2))
    assert abs(got["xent"] - want) < 1e-9


def test_fluent_scores_lower_than_scrambled(spark):
    # the CCNet property: a doc made of the corpus's dominant bigram
    # pattern scores lower xent than one of rare transitions
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "mat the on sat cat the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["xent"] for r in bigram_lm_score(docs).collect()}
    assert got[0] < got[100]


def test_ppl_buckets_head_tail_and_null(spark):
    # 20 fluent docs + 1 scrambled: terciles of 21 values land on the
    # fluent xent, so fluent -> bucket 0 (head) and scrambled -> 2 (tail);
    # a 1-token doc has no bigrams -> NULL bucket.
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((100, "mat the on sat cat the"))
    rows.append((101, "solo"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bucket"] for r in ppl_buckets(docs, 3).collect()}
    assert all(got[i] == 0 for i in range(20))
    assert got[100] == 2
    assert got[101] is None


def test_ppl_buckets_monotone_in_xent(spark):
    # buckets must be a non-decreasing function of xent_r
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows += [(100 + i, f"w{i} the cat sat q{i}") for i in range(6)]
    rows.append((200, "mat the on sat cat the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["xent_r"], r["bucket"]) for r in ppl_buckets(docs, 3).collect()
    )
    buckets = [b for _, b in out]
    assert buckets == sorted(buckets)
    assert set(buckets) <= {0, 1, 2}


def test_dsir_log_weights_hand_computed(spark):
    # raw corpus: "a b" and "a c"; target: just "a b". V=3, alpha=0.1.
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], "doc_id long, text string"
    )
    target = docs.where("doc_id = 0")
    alpha = 0.1
    got = {r["doc_id"]: r for r in dsir_log_weights(docs, target).collect()}
    # doc 0, bigram (a,b): t12=1, t1=1; c12=1, c1=2
    want0 = math.log((1 + alpha) / (1 + alpha * 3)) - math.log(
        (1 + alpha) / (2 + alpha * 3)
    )
    # doc 1, bigram (a,c): t12=0, t1=1; c12=1, c1=2
    want1 = math.log(alpha / (1 + alpha * 3)) - math.log(
        (1 + alpha) / (2 + alpha * 3)
    )
    assert got[0]["n_bigrams"] == 1 and got[1]["n_bigrams"] == 1
    assert abs(got[0]["log_w"] - want0) < 1e-9
    assert abs(got[1]["log_w"] - want1) < 1e-9
    assert got[0]["log_w"] > got[1]["log_w"]


def test_dsir_prefers_target_like_docs(spark):
    # docs resembling the target domain get higher importance weights
    rows = [(i, "stocks rose as markets rallied today") for i in range(5)]
    rows += [(10 + i, "the cat sat on the mat again") for i in range(5)]
    rows.append((100, "solo"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id < 5")
    got = {r["doc_id"]: r for r in dsir_log_weights(docs, target).collect()}
    assert got[0]["log_w"] > got[10]["log_w"]
    assert got[100]["log_w"] is None and got[100]["n_bigrams"] == 0


def test_dsir_resample_top_quantile_and_short_docs(spark):
    # 40 scoreable docs + 1 short: frac=0.5 keeps exactly the top half
    # by perturbed key; the short doc is never kept
    rows = [(i, f"stocks w{i % 7} rose as markets w{i % 5} rallied") for i in range(40)]
    rows.append((100, "solo"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id % 4 = 0")
    out = dsir_resample(docs, target, 0.5).collect()
    got = {r["doc_id"]: r for r in out}
    assert not got[100]["keep"] and got[100]["key_r"] is None
    keyed = sorted(
        ((r["key_r"], r["doc_id"]) for r in out if r["key_r"] is not None),
        reverse=True,
    )
    kept = {r["doc_id"] for r in out if r["keep"]}
    # the kept set is a prefix of the descending key order, ~half the docs
    assert 19 <= len(kept) <= 21
    assert kept == {d for _, d in keyed[: len(kept)]}


def test_dsir_resample_seed_decorrelates(spark):
    rows = [(i, f"stocks w{i % 7} rose as markets w{i % 5} rallied") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id % 4 = 0")
    k0 = {r["doc_id"] for r in dsir_resample(docs, target, 0.5).collect() if r["keep"]}
    k1 = {
        r["doc_id"]
        for r in dsir_resample(docs, target, 0.5, seed=1).collect()
        if r["keep"]
    }
    assert k0 != k1  # different seeds draw different samples


def test_plans_no_corpus_shuffle_on_decontam(corpus, bench):
    # the benchmark side must broadcast: no SortMergeJoin/shuffle of the
    # corpus gram stream in the physical plan
    plan = ngram_overlap(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ----------------------------------------------------------- stupid backoff


def _sb_ref(corpus_rows, lam=0.4):
    """Independent pure-Python stupid-backoff replay."""
    from collections import Counter

    tri, bi, uni = Counter(), Counter(), Counter()
    n_tok = 0
    for _, text in corpus_rows:
        t = text.split()
        n_tok += len(t)
        uni.update(t)
        bi.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    out = {}
    for doc_id, text in corpus_rows:
        t = text.split()
        nlls = []
        for a, b, c in zip(t, t[1:], t[2:]):
            if tri[(a, b, c)] > 0:
                s = tri[(a, b, c)] / bi[(a, b)]
            elif bi[(b, c)] > 0:
                s = lam * bi[(b, c)] / uni[b]
            else:
                s = lam * lam * max(uni[c], 1) / n_tok
            nlls.append(-math.log(s))
        out[doc_id] = (len(nlls), sum(nlls) / len(nlls) if nlls else None)
    return out


def test_backoff_lm_matches_python_replay(spark, corpus):
    from tsidx.lmquality import backoff_lm_score

    ref = _sb_ref(CORPUS)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["xent"])
        for r in backoff_lm_score(corpus).collect()
    }
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0]
        if ref[d][1] is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(ref[d][1], rel=1e-12)


def test_backoff_lm_external_model_unseen_floor(spark, corpus):
    """Scoring docs whose vocabulary the model has never seen exercises
    every backoff level incl. the max(c3, 1)/N unigram floor."""
    from tsidx.lmquality import backoff_lm_score, train_backoff_lm

    model = train_backoff_lm(corpus)
    new = spark.createDataFrame(
        [(9, "totally unseen words here"), (10, "alpha beta gamma")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in backoff_lm_score(new, model=model).collect()
    }
    n_tok = sum(len(t.split()) for _, t in CORPUS)
    # doc 9: both trigrams bottom out at the unseen floor lam^2 * 1/N
    floor_nll = -math.log(0.4 * 0.4 * 1.0 / n_tok)
    assert rows[9]["n_trigrams"] == 2
    assert rows[9]["xent"] == pytest.approx(floor_nll, rel=1e-12)
    # doc 10: the corpus contains "alpha beta gamma" twice -> c123=2, c12=2
    assert rows[10]["xent"] == pytest.approx(-math.log(1.0), abs=1e-12)
