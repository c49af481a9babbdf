"""Dictionary-acceleration indexes: SymSpell deletion neighborhoods and a
character-trigram inverted index over the (term, df) dictionary.

``QueryEngine.suggest_terms`` / ``match_regex`` scan the whole dictionary
per query with a levenshtein / contains predicate. That is fine while the
dictionary is small relative to the query latency budget, but a production
fulltext engine precomputes dictionary-side structures so a did-you-mean or
infix-wildcard query probes a bounded key set instead of scanning
~10^7-10^8 stems per query at 10^12-turn scale:

- **SymSpell deletes index** (Garbe 2012, public algorithm): for every
  dictionary term, every string reachable by deleting <= d characters maps
  back to the term. If ``lev(a, b) <= d`` then *a* and *b* share at least
  one <= d-deletion variant (each edit consumes at most one character of
  each side), so probing the query token's own deletion variants yields a
  candidate superset; a final ``levenshtein <= d`` filter makes the result
  EXACTLY the rows the full scan returns. Index size is dictionary-bounded:
  O(vocab * L^d) rows of short strings, never corpus-scale.

- **Trigram index** (the pg_trgm / Lucene n-gram wildcard idea): every
  length-3 substring of each term maps to the term. An infix query ``*q*``
  with ``len(q) >= 3`` probes q's trigrams, keeps terms containing ALL of
  them, then applies the exact ``contains`` predicate — again a candidate
  superset narrowed to the exact scan result. Shorter infixes fall back to
  the dictionary scan (no index can prune them).

Both structures are deterministic pure functions of the dictionary, build
with JVM-only expressions (one dictionary-bounded explode, no Python in the
hot path), and persist through :mod:`tsidx.io` like any other index table
so probes get ``PushedFilters`` row-group pruning on the key column.

Reference anchor: the dictionary these structures index is the posting-list
key space of the reference Index (ts_type_filter/inverted_index.py:44).
Neither structure exists in the reference — its dict probe is O(1)
in-process; these are the distributed analog for the two query shapes a
term-sorted table cannot prune (edit distance and infix containment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "deletion_variants",
    "deletes_index",
    "symspell_terms",
    "trigram_index",
    "contains_terms",
]

# all <= 1-char deletions of every non-empty string in the array column
# `vars`; 1-char terms delete to "" (kept — it is a legitimate key linking
# all 1-char terms at d=1), and "" itself produces nothing.
_EXPAND_DELETES = (
    "transform(filter(vars, t -> length(t) > 0), "
    "t -> transform(sequence(1, length(t)), "
    "i -> concat(substr(t, 1, i - 1), substr(t, i + 1))))"
)


def deletion_variants(token: str, max_dist: int) -> list[str]:
    """Every string reachable from *token* by deleting <= max_dist chars
    (token itself included) — the driver-side probe key set. Bounded:
    |keys| <= 1 + L + L*(L-1)/2 + ... (L = len(token))."""
    out = {token}
    frontier = {token}
    for _ in range(max_dist):
        frontier = {v[:i] + v[i + 1:] for v in frontier for i in range(len(v))}
        out |= frontier
    return sorted(out)


def deletes_index(terms: DataFrame, max_dist: int = 1) -> DataFrame:
    """(del_key, term): the SymSpell deletion neighborhood of the dictionary.

    One pass over the (term, df) dictionary: each term fans out to its
    <= *max_dist*-deletion variants (term itself included, so exact hits
    probe the same table). JVM-only nested ``transform`` expressions; the
    explode is dictionary-bounded (O(vocab * L^max_dist) short-string rows
    at 10^12-doc scale — gigabytes, not the corpus). Persist with
    ``tsidx.io.write_table(df.sortWithinPartitions("del_key"), path)`` so
    probes prune row groups on ``del_key``.
    """
    df = terms.select("term").withColumn("vars", F.array("term"))
    for _ in range(int(max_dist)):
        df = df.withColumn(
            "vars",
            F.array_union(
                F.col("vars"),
                F.array_distinct(F.flatten(F.expr(_EXPAND_DELETES))),
            ),
        )
    return df.select(F.explode("vars").alias("del_key"), "term")


def symspell_terms(
    terms: DataFrame,
    token: str,
    max_dist: int = 1,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """(term, df, dist): dictionary terms within *max_dist* edits of
    *token* — row-identical to the full-dictionary levenshtein scan
    (``QueryEngine.suggest_terms``), via the deletes-index probe.

    Plan: the token's own deletion variants (driver-side, bounded) become a
    pushed ``del_key IN`` filter on the deletes index; candidate terms
    (a superset by the SymSpell sharing lemma) semi-join the dictionary and
    pass through the exact ``levenshtein <= d`` predicate. Per-query work is
    |keys| ~ L^d index probes instead of a vocab-wide scan.
    """
    if deletes is None:
        deletes = deletes_index(terms, max_dist)
    keys = deletion_variants(token, int(max_dist))
    cand = (
        deletes.filter(F.col("del_key").isin(keys)).select("term").distinct()
    )
    dist = F.levenshtein(F.col("term"), F.lit(token))
    return (
        terms.join(cand, "term", "semi")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= int(max_dist))
        .select("term", "df", "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
    )


def trigram_index(terms: DataFrame) -> DataFrame:
    """(gram, term): every distinct length-3 character substring of each
    dictionary term (terms shorter than 3 chars carry no grams — the probe
    falls back to a scan for them). Dictionary-bounded: <= L-2 rows per
    term. Persist sorted by ``gram`` for pushed-probe row-group pruning."""
    grams = F.expr(
        "array_distinct(transform(sequence(1, length(term) - 2), "
        "i -> substr(term, i, 3)))"
    )
    return terms.filter(F.length("term") >= 3).select(
        F.explode(grams).alias("gram"), "term"
    )


def query_grams(infix: str) -> list[str]:
    """The distinct trigrams of an infix query (empty when len < 3)."""
    return sorted({infix[i: i + 3] for i in range(len(infix) - 2)})


def contains_terms(
    terms: DataFrame, infix: str, grams: DataFrame | None = None
) -> DataFrame:
    """(term, df): dictionary terms containing *infix* — row-identical to
    ``terms.filter(col("term").contains(infix))``, via the trigram index
    when the infix is long enough to have trigrams.

    Plan: the infix's trigrams become a pushed ``gram IN`` probe; a term
    qualifies as a candidate only if it carries ALL of them (an aggregate
    over the probe rows, bounded by the candidates' count), then the exact
    ``contains`` predicate runs on the candidate set only. ``len(infix) <
    3`` cannot be pruned by any n-gram index — it falls back to the
    dictionary scan, which is the exact same predicate.
    """
    if len(infix) < 3:
        return terms.filter(F.col("term").contains(infix)).select(
            "term", "df"
        )
    if grams is None:
        grams = trigram_index(terms)
    qg = query_grams(infix)
    # (gram, term) rows are unique by construction (array_distinct in
    # trigram_index), so count(*) == count_distinct(gram) and the agg
    # partial-combines map-side; rebuild the index if you hand-author one
    # with duplicate rows.
    cand = (
        grams.filter(F.col("gram").isin(qg))
        .groupBy("term")
        .agg(F.count("*").alias("ng"))
        .filter(F.col("ng") == len(qg))
        .select("term")
    )
    return (
        terms.join(cand, "term", "semi")
        .filter(F.col("term").contains(infix))
        .select("term", "df")
    )
