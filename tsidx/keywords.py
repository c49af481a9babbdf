"""RAKE keyword extraction — Rose, Engel, Cramer & Cowley 2010 ("Automatic
Keyword Extraction from Individual Documents"), the standard
unsupervised multi-word keyword extractor.

Candidate phrases are maximal token runs between stopwords; each word
scores ``deg(w) / freq(w)`` (``freq`` = occurrences in the doc's
candidate phrases, ``deg`` = sum of the lengths of the phrases those
occurrences sit in — long-phrase membership boosts a word); a phrase
scores the sum of its words' scores, and the top *m* distinct phrases
per doc are the keywords. Unlike the tf-idf ``top_terms_per_doc``
(tsidx/vectors.py), RAKE is corpus-free — it needs NO index, NO df, and
extracts multi-word phrases.

Plan shape (every shuffle keyed by doc_id — bounded, never corpus-wide):

- phrase segmentation is a map-only JVM expression chain: mark
  stopwords with a ``\\x01`` sentinel inside the token array, join,
  split on the sentinel, drop empties (no Python, no regex backtracking
  over raw text);
- word stats are ONE (doc_id, word) aggregation;
- phrase scores re-join the stats and fold word scores in sorted-word
  order (the engine-reproducible double-accumulation discipline);
- per-doc top-m ranks on (rounded score desc, phrase) through the
  row_number window whose WindowGroupLimit applies map-side
  (shuffle O(docs * m), the ``doc_keywords`` precedent).

No reference counterpart; training-data/fulltext extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["RAKE_STOPWORDS", "rake_phrases", "rake_keywords"]

RAKE_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
)

_SENTINEL = "\x01"


def rake_phrases(
    docs: DataFrame,
    *,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, phrase_id, phrase)`` — candidate phrases: maximal token
    runs between stopwords (case-insensitive stopword match, tokens kept
    verbatim), in document order. Map-only."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    marked = F.transform(
        toks,
        lambda t: F.when(
            F.array_contains(stop_arr, F.lower(t)), F.lit(_SENTINEL)
        ).otherwise(t),
    )
    phrases = F.filter(
        F.split(
            F.array_join(marked, " "), rf"\s*{_SENTINEL}\s*"
        ),
        lambda p: p != "",
    )
    return (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.posexplode(phrases).alias("phrase_id", "phrase"))
    )


def rake_keywords(
    docs: DataFrame,
    top_m: int = 5,
    *,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """``(id_col, phrase, score_r, rank)`` — each doc's top *m* distinct
    RAKE phrases ranked by (score desc, phrase). See module docstring."""
    ph = rake_phrases(
        docs, stopwords=stopwords, id_col=id_col, text_col=text_col
    )
    ph = ph.withColumn("pw", F.split("phrase", " ")).withColumn(
        "plen", F.size("pw")
    )
    # ph feeds word stats AND phrase scoring: materialize the (cheap,
    # map-only) segmentation once
    ph = ph.localCheckpoint(eager=False)
    words = ph.select(
        id_col, "phrase_id", "plen", F.explode("pw").alias("w")
    )
    stats = words.groupBy(id_col, "w").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    wscore = (F.col("deg").cast("double") / F.col("freq")).alias("wscore")
    scored = (
        words.join(stats.select(id_col, "w", wscore), [id_col, "w"])
        .groupBy(id_col, "phrase_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("w", "wscore"))),
                F.lit(0.0),
                lambda acc, x: acc + x["wscore"],
            ).alias("score")
        )
        .join(ph.select(id_col, "phrase_id", "phrase"), [id_col, "phrase_id"])
    )
    # identical phrases in one doc score identically: keep one
    distinct = scored.groupBy(id_col, "phrase").agg(
        F.first("score").alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.round("score", round_digits)), F.asc("phrase")
    )
    return (
        distinct.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_m))
        .select(
            id_col,
            "phrase",
            F.round("score", round_digits).alias("score_r"),
            "rank",
        )
    )
