"""Character-level text analyzers (Lucene "char filter" layer) for the engine.

The reference fixes *token*-level semantics — whitespace breaking + Snowball
stemming through its pluggable ``extractor``/``breaker``/``stemmer``
constructor params (``/root/reference/ts_type_filter/inverted_index.py:26-39``).
Production fulltext engines additionally normalize *characters* before word
breaking: lowercase folding, accent/diacritic folding, punctuation stripping.
This module supplies that layer as **map-only column expressions** that
compose with every operator in the engine: fold the text column first
(:func:`analyze`), then build/query exactly as usual — no operator needs to
know an analyzer ran, and rank identity vs the single-node oracle holds over
the folded corpus because both sides see the same bytes.

Everything here is JVM-side (``lower``/``translate``/``regexp_replace``
inside whole-stage codegen): zero Python cost, zero shuffle, pushes through
to the scan like any projection.

Accent folding uses an explicit 1:1 ``translate`` table (not a
locale-dependent ICU transform) so any engine — Spark, DuckDB, Trino —
reproduces the exact same bytes; the table covers Latin-1 Supplement and
Latin Extended-A lowercase forms (apply after ``lower``). One-to-many folds
(ß→ss, æ→ae) are out of ``translate``'s reach and intentionally map to their
first letter; extend via ``extra_src``/``extra_dst`` if a corpus needs more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ACCENT_SRC",
    "ACCENT_DST",
    "DEFAULT_PUNCT_CLASS",
    "fold_expr",
    "fold_text",
    "analyze",
]

_FOLD_PAIRS: list[tuple[str, str]] = [
    ("àáâãäåāăą", "a"),
    ("çćĉčċ", "c"),
    ("èéêëēĕėęě", "e"),
    ("ìíîïĩīĭįı", "i"),
    ("ñńņňŉ", "n"),
    ("òóôõöøōŏő", "o"),
    ("ùúûüũūŭůűų", "u"),
    ("ýÿŷ", "y"),
    ("šśŝşș", "s"),
    ("žźż", "z"),
    ("đď", "d"),
    ("ĝğġģ", "g"),
    ("ĥħ", "h"),
    ("ĵ", "j"),
    ("ķ", "k"),
    ("ĺļľŀł", "l"),
    ("ŕŗř", "r"),
    ("ţťŧț", "t"),
    ("ŵ", "w"),
    ("ß", "s"),
    ("æ", "a"),
    ("œ", "o"),
]

#: translate() source/destination strings (equal length, 1:1 mapping).
ACCENT_SRC = "".join(src for src, _ in _FOLD_PAIRS)
ACCENT_DST = "".join(dst * len(src) for src, dst in _FOLD_PAIRS)

#: ASCII-retention punctuation class: anything that is not a word character
#: or whitespace becomes a space. Java regex and RE2 both treat ``\w``/``\s``
#: as the same ASCII classes, so oracles replicate it verbatim. Multilingual
#: corpora keeping non-Latin scripts should pass an explicit class instead.
DEFAULT_PUNCT_CLASS = r"[^\w\s]"


def fold_expr(
    col: str | Column,
    *,
    lower: bool = True,
    fold_accents: bool = True,
    strip_punct: bool = True,
    punct_class: str = DEFAULT_PUNCT_CLASS,
    extra_src: str = "",
    extra_dst: str = "",
) -> Column:
    """The analyzer chain as one Column expression:
    ``lower -> translate(accents) -> punct-to-space``, each stage optional.

    Order matters: accents are folded *after* lowercasing (the table holds
    lowercase forms only) and *before* punctuation stripping (otherwise an
    unfolded accented letter would be eaten by the ASCII punct class).
    Stripping replaces with a space, not empty string — ``don't`` must
    become two tokens, not ``dont`` colliding with a different word; the
    whitespace-run word breaker collapses the extra spaces for free.
    """
    c = F.col(col) if isinstance(col, str) else col
    if lower:
        c = F.lower(c)
    if fold_accents:
        c = F.translate(c, ACCENT_SRC + extra_src, ACCENT_DST + extra_dst)
    if strip_punct:
        c = F.regexp_replace(c, punct_class, " ")
    return c


def analyze(docs: DataFrame, text_col: str = "text", **opts) -> DataFrame:
    """*docs* with *text_col* replaced by its analyzed form.

    This is the whole integration surface: every downstream operator
    (index build, dedup, n-grams, LM quality, ...) composes with the
    analyzer by receiving this frame instead of the raw one. The
    projection is map-only and fuses into the scan stage under
    whole-stage codegen — at 100 TB it costs one pass it was already
    making.
    """
    return docs.withColumn(text_col, fold_expr(text_col, **opts))


def fold_text(
    s: str,
    *,
    lower: bool = True,
    fold_accents: bool = True,
    strip_punct: bool = True,
    punct_class: str = DEFAULT_PUNCT_CLASS,
    extra_src: str = "",
    extra_dst: str = "",
) -> str:
    """Driver-side twin of :func:`fold_expr` for QUERY strings.

    An index built over analyzed text must see analyzed queries too —
    stemming lowercases on its own (the reference stemmer does), but
    accents and punctuation are folded only here. Byte-parity with the
    Column expression is asserted in tests/test_analyze.py; the regex
    uses ``re.ASCII`` so ``\\w``/``\\s`` mean the same ASCII classes as
    Java regex / RE2 (Python's default unicode ``\\w`` would silently
    keep accented letters the Spark side strips).
    """
    import re

    if lower:
        s = s.lower()
    if fold_accents:
        s = s.translate(
            str.maketrans(ACCENT_SRC + extra_src, ACCENT_DST + extra_dst)
        )
    if strip_punct:
        s = re.sub(punct_class, " ", s, flags=re.ASCII)
    return s
