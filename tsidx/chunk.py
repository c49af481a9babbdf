"""Token-window chunking and line-level boilerplate removal.

Two standard training-data / RAG preparation operators the reference
does not ship (it indexes whole menu descriptions;
``/root/reference/ts_type_filter/src/ts_type_filter/index.py`` treats
each item as one unit):

- **chunk_docs** — split every document into fixed-size token windows
  (optionally overlapping).  This is the universal pre-step for
  fixed-context pretraining, embedding, and RAG ingestion: a 100 TB
  corpus of arbitrary-length documents becomes a corpus of bounded
  training rows.
- **strip_boilerplate_lines** — RefinedWeb / CCNet-style line-level
  dedup: lines that repeat across at least ``min_docs`` distinct
  documents (navigation bars, cookie banners, license footers) are
  removed from every document while the rest of each document is kept
  in order.

Scale design (100 TB corpus):

- Chunking is **map-only**: split -> ``transform(sequence(...))`` over
  ``slice`` -> ``posexplode``.  Pure JVM expressions inside whole-stage
  codegen; zero shuffles; output partitioning inherits the scan.
- Boilerplate detection shuffles **8-byte line hashes** (xxhash64 of
  the trimmed line), never line text, for the document-frequency
  aggregation (map-side combine; per-doc ``array_distinct`` first so a
  doc repeating one line 10^6 times contributes one row).  The strip
  join keys on the same 8-byte hash and carries **no broadcast hint**
  — the boilerplate set is data-dependent (could be large on a
  boilerplate-heavy crawl), so AQE picks broadcast-vs-shuffle and
  skew-splits if one template line dominates.
- Document reassembly is ONE bounded (doc_id) shuffle: per-doc line
  counts are bounded by document length, and doc_id keys are unique
  (no skew by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "chunk_docs",
    "cdc_chunks",
    "split_lines",
    "boilerplate_lines",
    "strip_boilerplate_lines",
    "cdc_dup_chunks",
]


def chunk_docs(
    docs: DataFrame,
    size: int,
    stride: int | None = None,
    *,
    min_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, chunk_id, n_tokens, chunk)`` — fixed token windows.

    Window ``k`` (0-based ``chunk_id``) covers tokens
    ``[1 + k*stride, 1 + k*stride + size)`` (1-based slice positions);
    every start position ``<= len(tokens)`` is emitted, and trailing
    windows shorter than ``min_tokens`` tokens are dropped.
    ``stride`` defaults to ``size`` (non-overlapping); ``stride < size``
    gives overlapping windows for RAG-style context stitching.

    Map-only plan: the token array is bound as its own projection
    before the lambda references it (an inlined ``split`` re-evaluates
    per element — the O(tokens^2) trap measured 16x in
    ``tsidx.lmquality``), then ``transform(sequence(...))`` + ``slice``
    + ``posexplode``. No shuffle.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    stride = size if stride is None else stride
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if not 1 <= min_tokens <= size:
        raise ValueError(f"min_tokens must be in [1, size], got {min_tokens}")
    with_t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    # One entry per start position 1 + k*stride <= size(_t); slice caps
    # the final window at the document end.
    chunks = F.expr(
        f"transform(sequence(0, CAST(floor((size(_t) - 1) / {stride}) AS INT)),"
        f" k -> slice(_t, 1 + k * {stride}, {size}))"
    )
    out = with_t.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_c")
    )
    return out.where(F.size("_c") >= min_tokens).select(
        id_col,
        "chunk_id",
        F.size("_c").alias("n_tokens"),
        F.array_join("_c", " ").alias("chunk"),
    )


def cdc_chunks(
    docs: DataFrame,
    *,
    k: int = 3,
    mod: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, chunk_id, n_tokens, chunk)`` — content-defined
    chunking: cut AFTER token ``i`` (1-based, ``i >= k``) whenever the
    md5-derived hash of the k-token gram ending at ``i`` is ``0 mod
    mod``. The LBFS/rsync boundary rule lifted to token streams: chunk
    boundaries are a pure function of LOCAL content, so an insertion or
    deletion re-chunks only its neighborhood — unlike fixed windows
    (:func:`chunk_docs`) where one edit shifts every later chunk. The
    chunk-level-dedup-friendly splitter for crawl snapshots that drift
    between dumps; expected chunk length ≈ *mod* tokens.

    The hash is ``conv(substr(md5(gram), 1, 15), 16, 10) % mod`` — the
    engine-reproducible md5 convention shared with
    ``tsidx.textstats.group_split`` (any engine replays the exact
    boundaries; the DuckDB oracle twin does).

    Map-only plan: token array bound as its own projection, cut
    positions via ``filter(sequence(...))``, chunk ranges assembled
    from the boundary array, ``posexplode``. Zero shuffles.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if mod < 1:
        raise ValueError(f"mod must be >= 1, got {mod}")
    with_t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_t")
    )
    gram_hash = (
        f"cast(conv(substring(md5(concat_ws(' ', slice(_t, i - {k} + 1, {k}))),"
        f" 1, 15), 16, 10) as bigint) % {mod}"
    )
    # cut positions (cuts strictly inside the doc; a cut at the last
    # token is harmless — the trailing empty range is suppressed by the
    # distinct boundary assembly below)
    with_b = with_t.select(
        id_col,
        "_t",
        F.expr(
            f"array_distinct(concat(array(0),"
            f" filter(sequence({k}, greatest(size(_t), {k})),"
            f"        i -> i <= size(_t) AND ({gram_hash}) = 0),"
            f" array(size(_t))))"
        ).alias("_b"),
    )
    chunks = F.expr(
        "transform(sequence(1, size(_b) - 1),"
        " j -> slice(_t, element_at(_b, j) + 1,"
        "            element_at(_b, j + 1) - element_at(_b, j)))"
    )
    return (
        with_b.select(id_col, F.posexplode(chunks).alias("chunk_id", "_c"))
        .select(
            id_col,
            F.col("chunk_id").cast("long"),
            F.size("_c").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "_c").alias("chunk"),
        )
    )


def split_lines(
    docs: DataFrame,
    *,
    delim: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, line_no, line)`` — one row per line, 0-based order.

    Map-only ``posexplode(split(...))``; the delimiter is a literal
    (regex-escaped), not a pattern.
    """
    import re

    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(delim), -1)).alias(
            "line_no", "line"
        ),
    )


def _line_hash(col) -> F.Column:
    return F.xxhash64(F.trim(col))


def boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    *,
    delim: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(line, n_docs)`` — trimmed lines occurring in >= ``min_docs``
    distinct documents (the boilerplate inspection view; empty lines
    excluded).

    The document-frequency agg groups on the trimmed line string so the
    line survives for inspection; partial aggregation prunes repeats
    map-side and per-doc ``array_distinct`` bounds pathological
    repetition before the explode.
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    import re

    per_doc = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.expr(
                    "filter(transform(split({t}, '{d}', -1), x -> trim(x)),"
                    " x -> x <> '')".format(
                        t=text_col, d=re.escape(delim).replace("'", "\\'")
                    )
                )
            )
        ).alias("line"),
    )
    return (
        per_doc.groupBy("line")
        .agg(F.count(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    *,
    delim: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every document with its boilerplate lines removed.

    Returns ``(id_col, text, n_lines, n_removed)`` — ``text`` is the
    surviving lines rejoined with ``delim`` in original order (empty
    string when every line was boilerplate), ``n_lines`` the original
    line count, ``n_removed`` how many were dropped.  Lines are matched
    by trimmed content; empty/whitespace-only lines are never treated
    as boilerplate (they survive).

    Plan: one line-hash df agg over 8-byte keys -> no-hint join of the
    line stream against the ``df >= min_docs`` hash set (AQE chooses
    broadcast vs shuffle) -> ONE bounded (doc_id) shuffle to reassemble
    (``sort_array(collect_list(struct(line_no, line)))`` — per-doc line
    counts are document-bounded, doc_id keys unique).
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    lines = split_lines(docs, delim=delim, id_col=id_col, text_col=text_col)
    keyed = lines.withColumn("_h", _line_hash(F.col("line")))
    hot = (
        keyed.where(F.trim("line") != "")
        .select(id_col, "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_h")
    )
    # Whitespace-only lines survive by construction: the hot set never
    # contains the empty-trim hash (stripping them would silently merge
    # paragraphs), so the anti-join keeps them.
    survivors = keyed.join(hot, on="_h", how="left_anti")
    rebuilt = survivors.groupBy(id_col).agg(
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(line_no, line)))"
                   ", s -> s.line)"),
            delim,
        ).alias("_kept"),
        F.count("*").alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (
        totals.join(rebuilt, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("_kept"), F.lit("")).alias("text"),
            "n_lines",
            (
                F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("int").alias("n_removed"),
        )
    )


def cdc_dup_chunks(
    docs: DataFrame,
    *,
    k: int = 3,
    mod: int = 16,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(chash, n_docs, n_occ)`` — content-defined CHUNK-level dedup:
    chunks (by 60-bit md5 hash) appearing in at least *min_docs*
    distinct docs. The storage-dedup / crawl-drift detector: because
    :func:`cdc_chunks` boundaries are functions of local content, the
    SAME passage chunked inside two different documents yields the same
    chunks, so shared passages surface as duplicate chunk hashes even
    when the surrounding documents differ — fixed windows
    (:func:`chunk_docs`) would misalign after the first divergence.

    Plan: the map-only CDC pass, then the chunk text is hashed
    MAP-SIDE to the engine-reproducible 60-bit md5 key (the
    ``group_split`` convention) so only 8-byte keys shuffle to ONE
    (chash) aggregation; raw chunk text never crosses the exchange.
    """
    ch = cdc_chunks(docs, k=k, mod=mod, id_col=id_col, text_col=text_col)
    chash = F.expr(
        "cast(conv(substring(md5(chunk), 1, 15), 16, 10) as bigint)"
    )
    return (
        ch.select(F.col(id_col).alias("doc_id"), chash.alias("chash"))
        .groupBy("chash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= int(min_docs))
    )
