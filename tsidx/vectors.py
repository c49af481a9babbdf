"""Sparse tf-idf document vectors — the feature-export side of the index.

Training pipelines (clustering, linear probes, retrieval distillation)
consume the corpus as sparse vectors; the inverted index already holds
exactly that data as (term, doc_id, tf) postings plus the (term, df)
dictionary. Exporting is therefore a re-projection of the index, not a
re-tokenization of the corpus.

Scale shape: ONE full posting decode (Arrow, gaps-only streams stay
pruned where tf is enough) with the idf factor broadcast from the
dictionary — **no shuffle at all** for the COO export; the optional L2
normalization adds the single (doc_id) aggregation it provably needs.
Weights use the engine's canonical Lucene idf (SURVEY §7.3), so exported
features are consistent with BM25 ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tfidf_rows", "top_terms_per_doc"]


def tfidf_rows(engine, normalized: bool = False) -> DataFrame:
    """(doc_id, term, w): the corpus as sparse tf-idf vectors in COO form,
    ``w = tf · ln((N - df + 0.5) / (df + 0.5) + 1)``.

    With ``normalized=True`` each document's weights are L2-normalized
    (one extra (doc_id) aggregation + broadcast-sized join per partition
    of the norms table).
    """
    n = int(engine.index.meta["n_docs"])
    idf = F.log(
        (F.lit(float(n)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    dictionary = engine.index.terms.select("term", idf.alias("idf"))
    rows = engine._live(engine.posting_rows_all()).select(
        "doc_id", "term", "tf"
    )
    coo = rows.join(F.broadcast(dictionary), "term").select(
        "doc_id", "term", (F.col("tf").cast("double") * F.col("idf")).alias("w")
    )
    if not normalized:
        return coo
    norms = coo.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    return coo.join(norms, "doc_id").select(
        "doc_id", "term", (F.col("w") / F.col("nrm")).alias("w")
    )


def top_terms_per_doc(
    engine, m: int = 5, normalized: bool = False
) -> DataFrame:
    """(doc_id, term, w, rank): each document's *m* highest-tf-idf terms —
    the keyword-extraction / document-labeling view used for routing,
    cluster naming, and weak supervision over a training corpus.

    Deterministic total order: rank by ``(-w, term)``, so equal-weight
    terms (same tf and df) break ties lexicographically on every engine.

    Scale shape: the shuffle-free COO projection plus ONE (doc_id)
    window; Spark's WindowGroupLimit pushes the ``rank <= m`` bound
    map-side, so the shuffle carries O(docs x m) rows, not the full
    posting volume.
    """
    from pyspark.sql import Window

    if m <= 0:
        raise ValueError("top_terms_per_doc: m must be positive")
    coo = tfidf_rows(engine, normalized)
    w = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        coo.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
    )
