"""Term co-occurrence statistics (PMI) over an inverted index.

Related-terms analytics — "which terms appear in the same documents more
often than chance" — computed from the index itself, not by re-tokenizing
the corpus: the (term, df) dictionary provides marginals for free and the
posting blocks provide the (doc_id, term) incidence via the gaps-only
decode (tf/dl streams pruned from the scan).

No reference counterpart (the reference engine has no corpus analytics);
this is a standard fulltext/feature-engineering extension in the spirit of
SURVEY §2.4.

Scale design: per-doc pair generation is quadratic in the number of
*band* terms per document, so the df band is the safety valve — hot terms
(stopword-like, df above *max_df*) are excluded before pairing, exactly
like the hot-shingle cap in tsidx/dedup.py. With a band of b terms/doc
the sorted-array combination explode emits exactly b(b-1)/2 rows per doc
(no self-join, no b² pre-filter volume): one (doc_id) shuffle to gather
each doc's band terms, one (term_a, term_b) shuffle for the pair counts,
both uniform unless the band is misconfigured (calling without *max_df*
warns). The dictionary band is broadcast (vocabularies are ~10^6 rows
even at 10^12 docs; the mid-df band is far smaller).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_pmi"]


def cooccurrence_pmi(
    engine,
    min_df: int = 2,
    max_df: int | None = None,
    min_pair: int = 2,
) -> DataFrame:
    """(term_a, term_b, df_ab, pmi) for unordered term pairs co-occurring
    in at least *min_pair* documents, over the df band [min_df, max_df].

    pmi = ln(df_ab · N / (df_a · df_b)) — positive when the pair
    co-occurs more often than independent terms would.
    """
    if max_df is None:
        warnings.warn(
            "cooccurrence_pmi without max_df: hot terms make the doc_id "
            "self-join quadratic; set a df cap at scale",
            stacklevel=2,
        )
    n = int(engine.index.meta["n_docs"])
    band = engine.index.terms.filter(F.col("df") >= int(min_df))
    if max_df is not None:
        band = band.filter(F.col("df") <= int(max_df))
    band = band.select("term", "df")
    # posting blocks of band terms only, then gaps-only decode; the block
    # scan is filtered by a broadcast join (the band is dictionary-sized)
    blocks = engine.index.postings.join(
        F.broadcast(band.select("term")), "term"
    )
    rows = engine._live(engine.posting_doc_ids(blocks))
    # Pair generation: one (doc_id) shuffle collects each doc's band terms
    # into a sorted array (unique per doc by construction of the posting
    # rows), then ordered pairs explode JVM-side as (term_a, rest-of-array)
    # combinations — exactly b(b-1)/2 rows per doc. A doc_id self-join
    # would sort-merge the same exchange and emit b² rows before the
    # a < b filter: twice the generate volume plus the join sort.
    docs_terms = rows.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("term")).alias("ts")
    )
    pairs = (
        docs_terms.select(
            F.posexplode("ts").alias("i", "term_a"), F.col("ts")
        )
        .select(
            "term_a",
            F.explode(
                F.slice("ts", F.col("i") + F.lit(2), F.size("ts"))
            ).alias("term_b"),
        )
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("df_ab"))
        .filter(F.col("df_ab") >= int(min_pair))
    )
    da = band.select(
        F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    db = band.select(
        F.col("term").alias("term_b"), F.col("df").alias("df_b")
    )
    pmi = F.log(
        (F.col("df_ab") * F.lit(n)).cast("double")
        / (F.col("df_a") * F.col("df_b")).cast("double")
    )
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .select("term_a", "term_b", "df_ab", pmi.alias("pmi"))
    )
