"""Classifier-based corpus filtering: multinomial Naive Bayes over tokens.

GPT-3 (Brown et al. 2020, App. A) and LLaMA filtered CommonCrawl with a
linear classifier trained on curated-vs-raw text; the Spark-first
equivalent here is a two-class multinomial Naive Bayes whose training is
ONE token-count aggregation and whose scoring is one broadcast-or-AQE
model join — both fully expressible as DataFrame ops, so the whole
pipeline stays JVM-side and oracle-checkable.

Model: per-term log-odds under add-alpha smoothing

    logodds(t) = ln((c_pos(t) + a) / (N_pos + a*V))
               - ln((c_neg(t) + a) / (N_neg + a*V))

scored per document as ``prior + sum over tokens (with repetition) of
logodds``, where unseen terms contribute the constant
``ln(a/(N_pos+a*V)) - ln(a/(N_neg+a*V))`` and ``prior`` is the labeled
doc-count log ratio.

Scale design (100 TB corpus, labeled seed set much smaller):
- Training is one ``explode -> groupBy(term)`` partial aggregation over
  the SEED set only (the corpus is not touched); the model table is
  vocabulary-bounded (10^7-10^8 rows at web scale).
- The four scalars (N_pos, N_neg, V, doc counts) come from one 1-row
  aggregate — a bounded collect per repo conventions.
- Scoring is one corpus scan: explode -> join the model on ``term``
  (NO broadcast hint — vocabulary tables can exceed broadcast size at
  web scale; AQE picks BHJ while small and skew-splits the SMJ on hot
  stopword terms) -> unique-key ``groupBy(doc_id)`` sum.
- Float determinism: per-term log-odds are stored as **micro-nat
  integers** (``lo6 = round(logodds * 1e6)``, a BIGINT) and the per-doc
  score is an exact integer sum divided once at the end — integer
  accumulation is order-independent, so the score is bit-identical
  across partitionings and engines.  (Summing 6-decimal-rounded DOUBLES
  instead puts scores exactly on round-half boundaries — the values sit
  on a 1e-6 grid — and addition order then flips the displayed digit;
  measured on the sf0.01 gate corpus before this design.)

No reference equivalent (the reference has no classifier); this is a
training-data-pipeline operator per the build brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_nb", "nb_score", "nb_filter"]


def _token_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # Bind the split as its own projection (never inline it into a
    # higher-order lambda — the O(tokens^2) re-evaluation trap).
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )


def train_nb(
    labeled: DataFrame,
    *,
    positive,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> tuple[DataFrame, dict]:
    """Train the two-class NB model on a labeled seed set.

    Returns ``(model, params)``: ``model`` is a vocabulary-bounded
    ``(term, logodds, lo6)`` DataFrame — ``lo6`` is the micro-nat
    integer the scorer accumulates, ``logodds = lo6 / 1e6`` for
    inspection; ``params`` carries ``default``/``default6``
    (unseen-term log-odds), ``prior``/``prior6`` (labeled doc-count log
    ratio), and the raw counts. Rows whose label is NULL are ignored.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    lab = labeled.where(F.col(label_col).isNotNull())
    is_pos = (F.col(label_col) == F.lit(positive)).cast("long")
    toks = lab.select(
        is_pos.alias("_pos"), F.col(id_col), F.col(text_col)
    )
    stream = _token_stream(toks, "_pos", text_col)
    counts = stream.groupBy("term").agg(
        F.sum("_pos").alias("c_pos"),
        F.sum(F.lit(1) - F.col("_pos")).alias("c_neg"),
    )
    # One bounded 1-row aggregate for the scalars.
    doc_counts = toks.agg(
        F.sum("_pos").alias("d_pos"),
        F.sum(F.lit(1) - F.col("_pos")).alias("d_neg"),
    ).collect()[0]
    tot = counts.agg(
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
        F.count("*").alias("v"),
    ).collect()[0]
    n_pos, n_neg, v = int(tot["n_pos"] or 0), int(tot["n_neg"] or 0), int(tot["v"])
    d_pos, d_neg = int(doc_counts["d_pos"] or 0), int(doc_counts["d_neg"] or 0)
    if v == 0 or d_pos == 0 or d_neg == 0:
        raise ValueError(
            f"need both classes non-empty with vocabulary: "
            f"d_pos={d_pos} d_neg={d_neg} V={v}"
        )
    denom_pos = n_pos + alpha * v
    denom_neg = n_neg + alpha * v
    lo6 = F.round(
        (
            F.log((F.col("c_pos") + F.lit(alpha)) / F.lit(denom_pos))
            - F.log((F.col("c_neg") + F.lit(alpha)) / F.lit(denom_neg))
        )
        * F.lit(1e6),
        0,
    ).cast("long")
    model = counts.select(
        "term",
        lo6.alias("lo6"),
    ).withColumn("logodds", F.col("lo6") / F.lit(1e6))
    default6 = round(
        (math.log(alpha / denom_pos) - math.log(alpha / denom_neg)) * 1e6
    )
    prior6 = round((math.log(d_pos) - math.log(d_neg)) * 1e6)
    params = {
        "default6": default6,
        "prior6": prior6,
        "default": default6 / 1e6,
        "prior": prior6 / 1e6,
        "alpha": alpha,
        "n_pos": n_pos,
        "n_neg": n_neg,
        "vocab": v,
        "d_pos": d_pos,
        "d_neg": d_neg,
    }
    return model, params


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    params: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 3,
) -> DataFrame:
    """``(id_col, n_tokens, score, positive)`` for every corpus doc.

    ``score = prior + sum(logodds or default per token)``, rounded to
    ``round_to`` decimals; ``positive = score > 0``. One corpus scan,
    no-hint model join, unique-key doc agg.  The sum runs over the
    micro-nat integers (``lo6``) with a LONG accumulator and divides
    once — order-independent, so the score is engine- and
    partitioning-stable bit for bit.
    """
    stream = _token_stream(docs, id_col, text_col)
    joined = stream.join(model.select("term", "lo6"), on="term", how="left")
    agg = joined.groupBy(id_col).agg(
        F.count("term").alias("n_tokens"),
        F.sum(
            F.coalesce(F.col("lo6"), F.lit(int(params["default6"])))
        ).alias("_s6"),
    )
    score = F.round(
        (F.col("_s6") + F.lit(int(params["prior6"]))) / F.lit(1e6), round_to
    )
    return agg.select(
        id_col,
        "n_tokens",
        score.alias("score"),
        (score > 0).alias("positive"),
    )


def nb_filter(
    docs: DataFrame,
    model: DataFrame,
    params: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """The pipeline action: corpus docs the classifier scores above
    ``threshold`` (same single-scan plan; the flag join keys on the
    unique ``id_col``)."""
    flags = nb_score(
        docs, model, params, id_col=id_col, text_col=text_col
    ).select(id_col, "score")
    return (
        docs.join(flags, on=id_col, how="left")
        .where(F.col("score") > F.lit(float(threshold)))
        .drop("score")
    )
