"""Text-analysis operators: language-ID heuristic, token counts, quality."""

from __future__ import annotations

import pytest

from tsidx.textstats import lang_id_heuristic, quality_signals, token_counts

DOCS = [
    (0, "the cat is in the house and it is warm"),
    (1, "el gato que vive en la casa y los perros"),
    (2, "le chat est dans la maison et les chiens"),
    (3, "der hund ist nicht in das haus und die katze"),
    (4, "zzz qqq xxx"),                         # no profile hits -> unk
    (5, "numbers 123 and, punct-uation! here."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id_heuristic(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "unk"


def test_token_counts(docs):
    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert got[0]["n_ws_tokens"] == 10
    # "numbers 123 and, punct-uation! here." ->
    # letters: numbers, and, punct, uation, here (5); digits: 123 (1);
    # punctuation: , - ! . (4)
    assert got[5]["n_ws_tokens"] == 5
    assert got[5]["n_bpe_pieces"] == 10


def test_quality_signals(docs):
    got = {r["doc_id"]: r for r in quality_signals(docs).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 10
    assert r0["ttr_r"] == 0.8  # "the" and "is" repeat
    assert 0.0 < r0["stopword_ratio_r"] <= 1.0
    assert got[4]["stopword_ratio_r"] == 0.0
    assert got[5]["punct_ratio_r"] > 0.0


def test_conversation_stats(spark):
    from tsidx.textstats import conversation_stats

    rows = [
        ("c0", 0, "user", "one two three"),
        ("c0", 1, "assistant", "four five"),
        ("c0", 2, "user", ""),  # empty turn counts 0 tokens
        ("c1", 0, "system", "  padded   text  "),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {r["conv_id"]: r for r in conversation_stats(df).collect()}
    c0, c1 = got["c0"], got["c1"]
    assert (c0["n_turns"], c0["total_tokens"], c0["n_roles"]) == (3, 5, 2)
    assert c0["avg_tokens_r"] == round(5 / 3, 4)
    assert (c1["n_turns"], c1["total_tokens"], c1["n_roles"]) == (1, 2, 1)


def test_quality_filter_rules(spark):
    from tsidx.textstats import quality_filter

    rows = [
        (0, "the cat sat on the mat and it was warm"),   # clean -> keep
        (1, "ok"),                                       # too short (r_len)
        (2, "aa aa aa aa aa aa aa aa aa the"),           # repeat-dominated
        (3, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( the"),  # symbol-heavy
        (4, "zzz qqq xxx www vvv uuu ttt sss"),          # no stopwords
        (5, "the extraordinarily incomprehensibilities "
            "overgeneralizations counterrevolutionaries "
            "institutionalizations"),                    # mean tok len > 12
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["r_len"] is False
    assert got[2]["keep"] is False and got[2]["r_repeat"] is False
    assert got[3]["keep"] is False and got[3]["r_symbol"] is False
    assert got[4]["keep"] is False and got[4]["r_stop"] is False
    assert got[5]["keep"] is False and got[5]["r_mean"] is False
    # rule independence: doc 2's failure is ONLY the repetition rule
    assert got[2]["r_len"] is True and got[2]["r_stop"] is True


def test_quality_filter_empty_text(spark):
    from tsidx.textstats import quality_filter

    docs = spark.createDataFrame([(0, ""), (1, "   ")], "doc_id long, text string")
    got = quality_filter(docs).collect()
    assert all(r["keep"] is False for r in got)  # fails r_len, never crashes


def test_sample_mix_deterministic(spark):
    from tsidx.textstats import sample_mix

    import pyspark.sql.functions as F

    docs = (
        spark.range(2000)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("role"),
        )
    )
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    kept1 = sorted(r["doc_id"] for r in sample_mix(docs, rates).collect())
    kept2 = sorted(
        r["doc_id"]
        for r in sample_mix(docs.repartition(13), rates).collect()
    )
    assert kept1 == kept2  # partition-layout independent
    by_role = {s: 0 for s in "abc"}
    for d in kept1:
        by_role["abc"[d % 3]] += 1
    assert by_role["a"] == 667            # rate 1.0 keeps every 'a' row
    assert by_role["c"] == 0              # rate 0.0 drops every 'c' row
    assert 233 <= by_role["b"] <= 433     # rate 0.5 ± sampling noise
    # a different seed draws a different (same-rate) sample
    kept_seed1 = sorted(
        r["doc_id"] for r in sample_mix(docs, rates, seed=1).collect()
    )
    assert kept_seed1 != kept1
    assert by_role["a"] + by_role["b"] == len(kept1)


def test_sample_mix_unlisted_stratum_dropped(spark):
    from tsidx.textstats import sample_mix

    docs = spark.createDataFrame(
        [(0, "a"), (1, "mystery")], "doc_id long, role string"
    )
    kept = sample_mix(docs, {"a": 1.0}).collect()
    assert [r["doc_id"] for r in kept] == [0]


def test_redact_text(spark):
    from tsidx.textstats import redact_text

    rows = [
        (0, "email me at alice.smith+x@example.co.uk today"),
        (1, "call +1 (555) 123-4567 or 555 867 5309 now"),
        (2, "order 123456 shipped"),
        (3, "clean text with no pii at all"),
        (4, "short num 12345 stays"),  # 5 digits < number rule's 6
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_text(docs).collect()}
    assert got[0]["text"] == "email me at <EMAIL> today"
    assert got[0]["n_redactions"] == 1
    assert "<PHONE>" in got[1]["text"] and "555" not in got[1]["text"]
    assert got[2]["text"] == "order <NUM> shipped"
    # a 9+ digit run is phone-shaped: the earlier phone rule wins (documented)
    nine = redact_text(
        spark.createDataFrame([(9, "ref 123456789 x")], "doc_id long, text string")
    ).collect()[0]
    assert nine["text"] == "ref <PHONE> x"
    assert got[3]["text"] == rows[3][1] and got[3]["n_redactions"] == 0
    assert got[4]["text"] == rows[4][1]  # under-threshold number untouched


def test_redact_rule_order(spark):
    """Email wins over the number rule on its digit runs."""
    from tsidx.textstats import redact_text

    docs = spark.createDataFrame(
        [(0, "reach 123456789@example.com ok")], "doc_id long, text string"
    )
    r = redact_text(docs).collect()[0]
    assert r["text"] == "reach <EMAIL> ok"
    assert r["n_redactions"] == 1


def test_sample_mix_rate_monotone(spark):
    """Property: the sample at rate r1 is a subset of the sample at r2>=r1
    (same seed) — threshold sampling on one fixed hash is nested."""
    import pyspark.sql.functions as F

    from tsidx.textstats import sample_mix

    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        import pytest

        pytest.skip("hypothesis not installed")

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("role")
    ).cache()
    docs.count()

    @settings(max_examples=8, deadline=None)
    @given(
        r1=st.floats(min_value=0.0, max_value=1.0),
        r2=st.floats(min_value=0.0, max_value=1.0),
        seed=st.integers(min_value=0, max_value=3),
    )
    def check(r1, r2, seed):
        lo, hi = sorted([r1, r2])
        a = {r["doc_id"] for r in sample_mix(docs, {"s": lo}, seed=seed).collect()}
        b = {r["doc_id"] for r in sample_mix(docs, {"s": hi}, seed=seed).collect()}
        assert a <= b

    check()


def test_sample_mix_not_periodic_mod_m(spark):
    """ids congruent mod SAMPLE_MOD must NOT share verdicts: the hash
    mixes both base-M digits, so the keep stripe does not repeat with
    period M over large id spaces."""
    import pyspark.sql.functions as F

    from tsidx.textstats import SAMPLE_MOD, sample_mix

    base = list(range(0, 400))
    ids = base + [i + SAMPLE_MOD for i in base] + [i + 2 * SAMPLE_MOD for i in base]
    docs = spark.createDataFrame(
        [(i, "s") for i in ids], "doc_id long, role string"
    )
    kept = {r["doc_id"] for r in sample_mix(docs, {"s": 0.5}).collect()}
    v0 = [i in kept for i in base]
    v1 = [i + SAMPLE_MOD in kept for i in base]
    v2 = [i + 2 * SAMPLE_MOD in kept for i in base]
    assert v0 != v1 and v0 != v2 and v1 != v2
    # and each shifted block still keeps ~half (uniformity preserved)
    for v in (v1, v2):
        assert 120 <= sum(v) <= 280


def test_mixture_rates_water_fill(spark):
    # srcA: 100 tokens, srcB: 300 tokens, srcC unlisted.
    # weights 0.5/0.5 -> T = min(100/0.5, 300/0.5) = 200;
    # rateA = 0.5*200/100 = 1.0 (binding), rateB = 0.5*200/300 = 1/3.
    from tsidx.textstats import mixture_rates

    rows = [(i, " ".join(["tok"] * 10), "srcA") for i in range(10)]
    rows += [(100 + i, " ".join(["tok"] * 10), "srcB") for i in range(30)]
    rows += [(500 + i, "x y", "srcC") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: r
        for r in mixture_rates(docs, {"srcA": 0.5, "srcB": 0.5}).collect()
    }
    assert got["srcA"]["n_tokens"] == 100 and got["srcB"]["n_tokens"] == 300
    assert abs(got["srcA"]["rate"] - 1.0) < 1e-12
    assert abs(got["srcB"]["rate"] - 1 / 3) < 1e-12
    assert got["srcC"]["rate"] == 0.0
    assert got["srcA"]["expected_tokens"] == 100.0
    assert got["srcB"]["expected_tokens"] == 100.0


def test_mixture_sample_binding_stratum_kept_whole(spark):
    from tsidx.textstats import mixture_sample

    rows = [(i, " ".join(["tok"] * 10), "srcA") for i in range(20)]
    rows += [(1000 + i, " ".join(["tok"] * 10), "srcB") for i in range(200)]
    rows += [(9000 + i, "x y", "srcC") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = mixture_sample(docs, {"srcA": 0.5, "srcB": 0.5}).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # binding stratum (rate 1.0) is kept whole; unlisted stratum dropped
    assert by_src["srcA"] == set(range(20))
    assert "srcC" not in by_src
    # srcB keeps ~rate = 0.1 of 200 docs (hash-Bernoulli, wide tolerance)
    assert 8 <= len(by_src["srcB"]) <= 36


def test_group_split_no_leakage_and_proportions(spark):
    from tsidx.textstats import group_split

    rows = [(i, f"c{i // 4}") for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, conv_id string")
    out = group_split(docs, {"train": 0.8, "valid": 0.1, "test": 0.1}).collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], set()).add(r["split"])
    # leakage-safe: every group maps to exactly one split
    assert all(len(s) == 1 for s in by_conv.values())
    splits = [next(iter(s)) for s in by_conv.values()]
    n = len(splits)
    assert 0.7 < splits.count("train") / n < 0.9
    assert 0.05 < splits.count("valid") / n < 0.16
    assert 0.05 < splits.count("test") / n < 0.16


def test_group_split_deterministic_and_seeded(spark):
    from tsidx.textstats import group_split

    docs = spark.createDataFrame(
        [(i, f"c{i}") for i in range(500)], "doc_id long, conv_id string"
    )
    fr = {"train": 0.5, "valid": 0.5}
    a = {r["conv_id"]: r["split"] for r in group_split(docs, fr).collect()}
    b = {r["conv_id"]: r["split"] for r in group_split(docs, fr).collect()}
    assert a == b  # same seed -> identical assignment
    c = {r["conv_id"]: r["split"] for r in group_split(docs, fr, seed=1).collect()}
    assert a != c  # different seed -> different assignment


def test_group_split_fracs_must_sum_to_one(spark):
    import pytest as _pytest

    from tsidx.textstats import group_split

    docs = spark.createDataFrame([(1, "c")], "doc_id long, conv_id string")
    with _pytest.raises(ValueError):
        group_split(docs, {"train": 0.5, "valid": 0.1})


def test_group_split_matches_pure_python_md5(spark):
    """Differential check against a third implementation: replicate the
    md5-hash -> cumulative-interval assignment with hashlib and compare
    every group's split."""
    import hashlib

    from tsidx.textstats import SAMPLE_MOD, group_split

    fracs = {"train": 0.8, "valid": 0.1, "test": 0.1}
    docs = spark.createDataFrame(
        [(i, f"conv-{i}") for i in range(300)], "doc_id long, conv_id string"
    )
    got = {
        r["conv_id"]: r["split"] for r in group_split(docs, fracs).collect()
    }

    bounds = []
    cum = 0.0
    for label in sorted(fracs):
        cum += fracs[label]
        bounds.append((label, cum))

    def expect(conv):
        h = int(hashlib.md5(f"{conv}:0".encode()).hexdigest()[:15], 16) % SAMPLE_MOD
        for label, upper in bounds[:-1]:
            if h < upper * SAMPLE_MOD:
                return label
        return bounds[-1][0]

    assert got == {f"conv-{i}": expect(f"conv-{i}") for i in range(300)}


def test_sample_fixed_n_exact_and_deterministic(spark):
    import hashlib

    from tsidx.textstats import sample_fixed_n

    rows = [(i, "s%d" % (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_fixed_n(df, 5, seed=9).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert {len(v) for v in by_src.values()} == {5}
    # matches the single-node selection: n smallest md5(seed:id) per group
    for src, members in by_src.items():
        ids = [i for i, s in rows if s == src]
        want = sorted(ids, key=lambda d: hashlib.md5(f"9:{d}".encode()).hexdigest())[:5]
        got = [r["doc_id"] for r in sorted(members, key=lambda r: r["sample_rank"])]
        assert got == want, (src, got, want)
    # partitioning-invariant
    again = {
        (r["doc_id"], r["sample_rank"])
        for r in sample_fixed_n(df.repartition(7), 5, seed=9).collect()
    }
    assert again == {(r["doc_id"], r["sample_rank"]) for r in out}


def test_sample_fixed_n_small_stratum_keeps_all(spark):
    from tsidx.textstats import sample_fixed_n

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    out = sample_fixed_n(df, 10, seed=0).collect()
    assert len(out) == 3
