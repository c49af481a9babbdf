"""Single-node oracle: ground truth for rank-identity tests.

A from-scratch re-implementation of the observable behavior of the reference
``Index`` (``/root/reference/ts_type_filter/inverted_index.py:35-153``) plus
the canonical BM25 top-k specification (SURVEY §7.3) that binds this oracle
and the Spark engine. Differences from the reference by design:

- documents are addressed by dense integer ``doc_id`` in insertion order
  (the reference keeps opaque objects in ``_documents_in_order``; insertion
  order *is* its docID space, ``inverted_index.py:42,53,99-101``);
- term frequencies and document lengths are retained (the reference discards
  them at ``inverted_index.py:61``); match semantics are unaffected;
- BM25: Lucene-style idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``, k1=1.2,
  b=0.75, contributions summed in sorted-term order (canonical accumulation
  so the distributed engine can be bit-identical), ties broken by ascending
  doc_id.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from tsidx.tokenize import query_terms, term_freqs

__all__ = ["OracleIndex", "K1", "B", "bm25_idf"]

K1 = 1.2
B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    """Lucene-style non-negative idf (SURVEY §7.3)."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_id, text) rows."""

    # term -> list[(doc_id, tf)] in ascending doc_id (== insertion) order
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    doc_lengths: dict[int, int] = field(default_factory=dict)
    pinned: set[int] = field(default_factory=set)
    _stem_cache: dict = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doc_lengths)

    def add(self, doc_id: int, text: str) -> None:
        """Ingest one document. Duplicate doc_ids are rejected, mirroring the
        reference's duplicate-document check (``inverted_index.py:49-50``)."""
        if doc_id in self.doc_lengths:
            raise ValueError(f"duplicate doc_id {doc_id}")
        counts, dl = term_freqs(text, self._stem_cache)
        self.doc_lengths[doc_id] = dl
        for term, tf in counts.items():
            self.postings.setdefault(term, []).append((doc_id, tf))

    def add_corpus(self, texts: list[str], start_id: int = 0) -> None:
        for i, text in enumerate(texts):
            self.add(start_id + i, text)

    def pin(self, doc_id: int) -> None:
        """Reference ``Index.pin`` (``inverted_index.py:67-68``)."""
        self.pinned.add(doc_id)

    # ------------------------------------------------------------------ query

    def match(self, query: str | list[str]) -> list[int]:
        """Disjunctive boolean retrieval, reference ``Index.match`` semantics
        (``inverted_index.py:71-101``): union of posting lists of the stemmed
        query terms, union pinned docs, results in docID (insertion) order;
        unknown terms contribute nothing."""
        hit: set[int] = set(self.pinned)
        for term in query_terms(query, self._stem_cache):
            for doc_id, _tf in self.postings.get(term, ()):
                hit.add(doc_id)
        return sorted(hit)

    def bm25_contributions(self, query: str | list[str]) -> dict[int, list[tuple[str, float]]]:
        """Per-doc (term, contribution) lists in sorted-term order."""
        n = self.n_docs
        avgdl = (sum(self.doc_lengths.values()) / n) if n else 0.0
        per_doc: dict[int, list[tuple[str, float]]] = {}
        for term in query_terms(query, self._stem_cache):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = bm25_idf(n, len(plist))
            for doc_id, tf in plist:
                dl = self.doc_lengths[doc_id]
                # parenthesization matches the engine expression exactly
                # (bit-identical IEEE754 evaluation order)
                contrib = idf * ((tf * (K1 + 1.0)) / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl)))
                per_doc.setdefault(doc_id, []).append((term, contrib))
        return per_doc

    def bm25_topk(self, query: str | list[str], k: int) -> list[tuple[int, float]]:
        """Deterministic BM25 top-k: score = sum of contributions in sorted-
        term order; order by (-score, doc_id)."""
        scores: list[tuple[int, float]] = []
        for doc_id, contribs in self.bm25_contributions(query).items():
            total = 0.0
            for _term, c in contribs:  # already in sorted-term order
                total += c
            scores.append((doc_id, total))
        scores.sort(key=lambda p: (-p[1], p[0]))
        return scores[:k]

    # ------------------------------------------------------------- statistics

    def statistics(self) -> dict:
        """Counts matching the reference ``statistics()`` output
        (``inverted_index.py:131-153``): documents, unique terms, postings."""
        return {
            "num_documents": self.n_docs,
            "num_unique_terms": len(self.postings),
            "num_postings": sum(len(p) for p in self.postings.values()),
        }

    def document_frequencies(self) -> list[tuple[str, int]]:
        """(term, df) sorted by descending df, stable in first-seen term order
        for ties — matching the reference frequency table sort
        (``inverted_index.py:148-149``)."""
        return sorted(
            ((t, len(p)) for t, p in self.postings.items()),
            key=lambda item: item[1],
            reverse=True,
        )
