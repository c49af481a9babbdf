"""Tokenization with the reference engine's exact semantics.

Reference behavior being reproduced (file:line cites into /root/reference):

- word breaking: ``text.strip().split()`` — Python whitespace split, no empty
  tokens, punctuation stays attached (``ts_type_filter/inverted_index.py:26-33``;
  goldens show terms like ``by;`` / ``thrall,``,
  ``documentation/inverted-index.md:157,166``);
- stemming: Snowball-English with lowercasing, applied per token
  (``inverted_index.py:6-11,61``) — vendored in :mod:`tsidx.porter2`;
- per-document term dedup happens *after* stemming (``inverted_index.py:61``);
  our tf extension counts occurrences *before* dedup (SURVEY §2.4 N2) and
  document length ``dl`` is the pre-dedup token count.

The Spark-facing entry point is :func:`tokenize_map_in_pandas`, an Arrow-batched
``mapInPandas`` generator factory: one pass over each input batch emits
exploded ``(doc_id, term, tf, dl)`` rows. Word breaking uses the vectorized
``pandas.Series.str.split()`` (same semantics as ``str.split()``); stemming is
memoized per task (Zipf distribution makes the cache hit rate high), so the
per-unique-token Python cost is amortized across the batch.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable, Iterator

from tsidx.porter2 import stem

__all__ = [
    "break_on_whitespace",
    "stem_tokens",
    "term_freqs",
    "query_terms",
    "tokenize_map_in_pandas",
    "stem_array_udf",
    "TOKENS_SCHEMA",
]

# Output schema of the tokenizer mapInPandas stage.
TOKENS_SCHEMA = "doc_id long, term string, tf int, dl int"


def break_on_whitespace(text: str) -> list[str]:
    """Whitespace word breaker, identical to ``inverted_index.py:26-33``."""
    return text.strip().split()


def stem_tokens(text: str, _cache: dict | None = None) -> list[str]:
    """Stems of the tokens of *text*, pre-dedup, in token order."""
    cache = _cache if _cache is not None else {}
    out = []
    for tok in break_on_whitespace(text):
        s = cache.get(tok)
        if s is None:
            s = stem(tok)
            cache[tok] = s
        out.append(s)
    return out


def term_freqs(text: str, _cache: dict | None = None) -> tuple[Counter, int]:
    """``(Counter{term: tf}, dl)`` for one document text."""
    stems = stem_tokens(text, _cache)
    return Counter(stems), len(stems)


def query_terms(query: str | list[str], _cache: dict | None = None) -> list[str]:
    """Distinct stemmed query terms, sorted (canonical order for scoring).

    Query normalization matches ``Index.match`` (``inverted_index.py:87-92``):
    a string or list of strings, each word-broken then stemmed into one set.
    """
    parts = [query] if isinstance(query, str) else list(query)
    terms: set[str] = set()
    for part in parts:
        terms.update(stem_tokens(part, _cache))
    return sorted(terms)


def tokenize_map_in_pandas(
    doc_id_col: str = "doc_id", text_col: str = "text"
) -> "callable":
    """Factory for a ``mapInPandas`` function emitting (doc_id, term, tf, dl).

    Usage::

        terms = docs.mapInPandas(tokenize_map_in_pandas(), schema=TOKENS_SCHEMA)
    """

    def _tokenize(batches: Iterable) -> Iterator:
        import pandas as pd

        cache: dict[str, str] = {}
        for pdf in batches:
            doc_ids = pdf[doc_id_col].to_numpy()
            # Vectorized whitespace split — same semantics as str.split().
            token_lists = pdf[text_col].str.split()
            out_doc, out_term, out_tf, out_dl = [], [], [], []
            for doc_id, tokens in zip(doc_ids, token_lists):
                if tokens is None:
                    continue
                counts: Counter = Counter()
                for tok in tokens:
                    s = cache.get(tok)
                    if s is None:
                        s = stem(tok)
                        cache[tok] = s
                    counts[s] += 1
                dl = len(tokens)
                for term, tf in counts.items():
                    out_doc.append(doc_id)
                    out_term.append(term)
                    out_tf.append(tf)
                    out_dl.append(dl)
            yield pd.DataFrame(
                {"doc_id": out_doc, "term": out_term, "tf": out_tf, "dl": out_dl}
            )

    return _tokenize


def stem_array_udf():
    """Arrow-batched pandas UDF ``text -> array<string>`` of stemmed
    whitespace tokens — the column-level form of :func:`stem_tokens` for
    operators that need the stem *sequence* (n-gram stats, streaming
    trends) rather than exploded tf rows. Stems are memoized per batch
    (Zipf amortization, same as the build path).

    Defined via explicit ``__annotations__`` because this module uses
    postponed annotation evaluation, which pandas_udf's eval-type
    inference cannot resolve from string hints.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    from tsidx.porter2 import stem

    def _fn(texts):
        cache: dict[str, str] = {}

        def one(t):
            if not t:
                return []
            return [cache.setdefault(w, stem(w)) for w in t.split()]

        return texts.map(one)

    _fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(ArrayType(StringType()))(_fn)
