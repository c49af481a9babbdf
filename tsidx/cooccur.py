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

__all__ = ["cooccurrence_pmi", "collocations_llr", "segment_query", "LLR_SIG_P001"]


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


def collocations_llr(
    docs: DataFrame,
    *,
    min_pair: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(w1, w2, pair_count, llr_r)`` — adjacent-bigram collocations
    ranked by Dunning's log-likelihood ratio (G², "Accurate Methods for
    the Statistics of Surprise and Coincidence", CL 1993). Unlike PMI
    (which over-rewards rare pairs), G² weighs evidence mass, so it is
    the standard phrase-induction statistic at corpus scale.

    Contingency per ordered pair over the corpus bigram stream:
    ``k11 = c(w1 w2)``, row marginal ``r1 = c(w1 ·)``, column marginal
    ``c1 = c(· w2)``, ``N`` = total bigrams;
    ``G² = 2·Σ k_ij·ln(N·k_ij / (row_i·col_j))`` over the four cells,
    zero-count cells contributing 0. ``llr_r`` is rounded to 4 decimals
    so the statistic is engine-stable (same convention as lm_quality's
    xent_r).

    Scale design: ONE corpus-scale aggregation (the (w1, w2) bigram
    count — partial-agg combines per partition before the shuffle);
    the pair table is lazily ``localCheckpoint``-ed so the N collect
    materializes it ONCE and both marginals plus the final join reuse
    that vocabulary²-bounded result instead of re-expanding the corpus
    lineage (plan-audited: without the checkpoint Catalyst re-scans the
    corpus three times). N is a 1-row aggregate. The marginal joins are
    vocabulary-bounded — no hint, AQE picks the strategy. Token
    convention matches tsidx/lmquality.py (raw whitespace tokens via
    doc_bigrams).
    """
    from tsidx.lmquality import doc_bigrams

    bg = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("k11"))
        .localCheckpoint(eager=False)
    )
    rows = c12.groupBy("w1").agg(F.sum("k11").alias("r1"))
    cols = c12.groupBy("w2").agg(F.sum("k11").alias("c1"))
    n = c12.agg(F.sum("k11").alias("n")).collect()[0]["n"]  # 1-row agg
    if n is None or int(n) == 0:
        return c12.select(
            "w1",
            "w2",
            F.col("k11").alias("pair_count"),
            F.lit(0.0).alias("llr_r"),
        ).limit(0)
    n = int(n)

    def term(k: str, row: str, col: str) -> str:
        # k * ln(N*k / (row*col)) with the exact operand order mirrored
        # in the oracle SQL so the doubles agree before rounding
        return (
            f"(CASE WHEN {k} > 0 THEN cast({k} as double) * "
            f"ln((cast({n} as double) * cast({k} as double)) / "
            f"(cast({row} as double) * cast({col} as double))) "
            f"ELSE 0.0 END)"
        )

    g2 = (
        "round(2.0 * ("
        + " + ".join(
            [
                term("k11", "r1", "c1"),
                term(f"(r1 - k11)", "r1", f"({n} - c1)"),
                term(f"(c1 - k11)", f"({n} - r1)", "c1"),
                term(
                    f"({n} - r1 - c1 + k11)", f"({n} - r1)", f"({n} - c1)"
                ),
            ]
        )
        + "), 4)"
    )
    return (
        c12.filter(F.col("k11") >= int(min_pair))
        .join(rows, "w1")
        .join(cols, "w2")
        .select(
            "w1",
            "w2",
            F.col("k11").cast("long").alias("pair_count"),
            F.expr(g2).alias("llr_r"),
        )
    )


#: chi-square critical value at p = 0.001 (1 dof) — the conventional
#: significance bar for G^2 collocation tests
LLR_SIG_P001 = 10.83


def segment_query(
    collocations: DataFrame, query: str, *, threshold: float = LLR_SIG_P001
) -> DataFrame:
    """``(seg_idx, segment)`` — query segmentation by collocation
    strength: adjacent query tokens merge into one segment when their
    corpus G² (from a prebuilt :func:`collocations_llr` table) clears
    *threshold* (default 10.83, the chi² p=0.001 bar) — the classic
    query-segmentation signal (Bergsma & Wang 2007 use exactly
    corpus-association thresholds). "new york pizza" segments as
    ["new york", "pizza"] when c(new, york) is significant and
    c(york, pizza) is not.

    Plan: the collocation table is the per-corpus artifact (built once,
    vocabulary²-bounded); segmentation filters it to the query's
    ``|q| - 1`` adjacent pairs (pushed compound predicate), collects
    those rows, and merges driver-side — O(|q|) state. Pairs absent
    from the table (below its min_pair floor) split by definition.
    Raw-token convention matches :func:`collocations_llr`.
    """
    spark = collocations.sparkSession
    toks = query.split()
    schema = "seg_idx int, segment string"
    if not toks:
        return spark.createDataFrame([], schema)
    pairs = list(zip(toks, toks[1:]))
    llr: dict[tuple[str, str], float] = {}
    if pairs:
        cond = None
        for a, b in set(pairs):
            c = (F.col("w1") == a) & (F.col("w2") == b)
            cond = c if cond is None else (cond | c)
        rows = collocations.filter(cond).collect()  # <= |q|-1 rows
        llr = {(r["w1"], r["w2"]): float(r["llr_r"]) for r in rows}
    segments: list[list[str]] = [[toks[0]]]
    for i, pair in enumerate(pairs):
        if llr.get(pair, 0.0) >= float(threshold):
            segments[-1].append(toks[i + 1])
        else:
            segments.append([toks[i + 1]])
    return spark.createDataFrame(
        [(i, " ".join(s)) for i, s in enumerate(segments)], schema
    )
