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
