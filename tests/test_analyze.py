"""Analyzer chain: character folding composing with the index build."""

import pytest

from tsidx.analyze import ACCENT_DST, ACCENT_SRC, analyze, fold_expr


def test_fold_table_is_one_to_one():
    assert len(ACCENT_SRC) == len(ACCENT_DST)
    assert len(set(ACCENT_SRC)) == len(ACCENT_SRC)


@pytest.fixture(scope="module")
def folded(spark):
    df = spark.createDataFrame(
        [
            (0, "Héllo, WÖRLD!"),
            (1, "naïve  café'å"),
            (2, "don't stop"),
            (3, "ŁÓDŹ señor"),
        ],
        "doc_id long, text string",
    )
    return {r["doc_id"]: r["text"] for r in analyze(df).collect()}


def test_fold_lower_accent_punct(folded):
    assert folded[0].split() == ["hello", "world"]
    assert folded[1].split() == ["naive", "cafe", "a"]
    # punctuation becomes a boundary, not a deletion: don't -> don t
    assert folded[2].split() == ["don", "t", "stop"]
    assert folded[3].split() == ["lodz", "senor"]


def test_fold_stages_optional(spark):
    df = spark.createDataFrame([(0, "Héllo, W!")], "doc_id long, text string")
    no_punct = analyze(df, strip_punct=False).collect()[0]["text"]
    assert no_punct == "hello, w!"
    # with folding off, the ASCII punct class eats the unfolded accent too
    no_lower = analyze(df, lower=False, fold_accents=False).collect()[0]["text"]
    assert no_lower == "H llo  W "
    keep_all = analyze(df, lower=False, fold_accents=False, strip_punct=False)
    assert keep_all.collect()[0]["text"] == "Héllo, W!"


def test_analyzer_composes_with_build(spark):
    """An index over analyzed text has folded terms: the punctuation-attached
    tokens the reference keeps (by;) fold into clean terms, and accented
    variants of a word collapse into one posting list."""
    from tsidx.build import build_index

    rows = [
        ("c0", 0, "user", "Merge the tablé!", None),
        ("c0", 1, "agent", "merge, THE TABLE", None),
    ]
    docs = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    idx = build_index(analyze(docs), block_size=16)
    dfs = {r["term"]: r["df"] for r in idx.terms.collect()}
    assert dfs == {"merg": 2, "the": 2, "tabl": 2}


def test_fold_text_byte_parity_with_fold_expr(spark):
    """The driver-side query folder and the Column expression produce
    identical bytes on every accent-table char and assorted punctuation,
    for every stage combination."""
    from itertools import product

    from tsidx.analyze import ACCENT_SRC, fold_text

    samples = [
        "Héllo, WÖRLD!",
        ACCENT_SRC,
        ACCENT_SRC.upper(),
        "a-b_c.d'e\"f(g)h[i]j{k}l<m>n;o:p!q?r/s\\t|u",
        "tabs\tand\nnewlines stay",
        "mixed ÀçĐénts & symbols #123",
        "",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    for lower, acc, punct in product([True, False], repeat=3):
        got = {
            r["i"]: r["text"]
            for r in analyze(
                df, lower=lower, fold_accents=acc, strip_punct=punct
            ).collect()
        }
        for i, s in enumerate(samples):
            assert got[i] == fold_text(
                s, lower=lower, fold_accents=acc, strip_punct=punct
            ), (lower, acc, punct, s)


def test_analyzed_index_query_roundtrip(spark):
    """End-to-end: index analyzed docs, fold the user's accented query,
    match and rank."""
    from tsidx.analyze import fold_text
    from tsidx.build import build_index
    from tsidx.query import QueryEngine

    rows = [
        ("c0", 0, "user", "Crème brûlée recipe!", None),
        ("c0", 1, "agent", "naïve merge strategy", None),
    ]
    docs = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    idx = build_index(analyze(docs), block_size=16)
    eng = QueryEngine(idx)
    hits = [r["doc_id"] for r in eng.match(fold_text("CRÈME brülée?")).collect()]
    assert hits == [0]
    hits2 = [r["doc_id"] for r in eng.match(fold_text("naive")).collect()]
    assert hits2 == [1]
