"""Text-analysis operators for corpus curation (training-data pipeline).

All pure DataFrame plans over built-in JVM functions (whole-stage codegen,
no Python in the hot path): language identification by stopword-profile
scoring, token counting (whitespace and a BPE-ish regex segmentation),
and quality-scoring signals. Each has a DuckDB-oracle twin in
``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LANG_PROFILES",
    "lang_id_heuristic",
    "token_counts",
    "quality_signals",
    "conversation_stats",
    "BPE_PIECE_RE",
]

# Minimal public stopword profiles (top function words per language). The
# heuristic scores a doc per language by profile-hit ratio; deterministic
# alphabetical tiebreak. "unk" when nothing matches.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "un"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "est"),
}

# BPE-ish segmentation: letter runs, digit runs, single punctuation marks.
# Deliberately ASCII-class-based so Spark (Java regex) and DuckDB (RE2)
# agree exactly.
BPE_PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def lang_id_heuristic(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """(id, lang_pred, best_hits): argmax over per-language stopword hit
    counts; ties break alphabetically; zero hits -> 'unk'."""
    profiles = profiles or LANG_PROFILES
    toks = _tokens(text_col)
    hit_cols = []
    for lang in sorted(profiles):
        words = F.array(*[F.lit(w) for w in profiles[lang]])
        hits = F.size(
            F.filter(toks, lambda t: F.array_contains(words, t))
        )
        hit_cols.append((lang, hits))
    best = F.greatest(*[h for _, h in hit_cols])
    pred = F.lit("unk")
    # alphabetical tiebreak: first language reaching the max wins — build
    # the conditional from last to first so earlier langs take precedence
    for lang, hits in reversed(hit_cols):
        pred = F.when((best > 0) & (hits == best), F.lit(lang)).otherwise(pred)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        best.cast("long").alias("best_hits"),
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_pieces): whitespace tokens and BPE-ish
    regex pieces (letter runs / digit runs / single punctuation)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PIECE_RE))
        .cast("long")
        .alias("n_bpe_pieces"),
    )


def conversation_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
) -> DataFrame:
    """(conv_id, n_turns, total_tokens, avg_tokens_r, n_roles):
    conversation-level rollup of the transcripts table — the
    curation-side view (length filtering, role-mix checks, packing
    budgets) of the per-turn corpus the index is built over.

    One (conv_id) shuffle over JVM expressions; conversations are bounded
    (turn counts, not corpus size), so no key is data-scale hot.
    """
    n_tok = F.when(
        F.trim(F.col(text_col)) == "", F.lit(0)
    ).otherwise(F.size(_tokens(text_col)))
    return transcripts.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        F.round(F.avg(n_tok), 4).alias("avg_tokens_r"),
        F.count_distinct(F.col(role_col)).cast("long").alias("n_roles"),
    )


def quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = LANG_PROFILES["en"],
) -> DataFrame:
    """Per-doc quality-scoring signals: token count, type-token ratio,
    mean token length, stopword ratio, punctuation ratio."""
    toks = _tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_chars = F.length(F.col(text_col))
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^A-Za-z0-9 ]"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(nd.cast("double") / n, 4).alias("ttr_r"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / n,
            4,
        ).alias("mean_tok_len_r"),
        F.round(n_sw.cast("double") / n, 4).alias("stopword_ratio_r"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio_r"),
    )
