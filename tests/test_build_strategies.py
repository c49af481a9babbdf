"""Build-strategy cross-validation: fused and explode plans must produce
byte-identical posting blocks (they are independent implementations of the
same logical build)."""

from __future__ import annotations

from tsidx.build import build_index


def _blocks(idx):
    rows = idx.postings.select(
        "term", "block_id", "block_df", "min_doc", "max_doc", "max_tf",
        "min_dl", "sum_tf", "doc_gaps", "tfs", "dls",
    ).collect()
    return sorted(
        (
            r["term"], r["block_id"], r["block_df"], r["min_doc"],
            r["max_doc"], r["max_tf"], r["min_dl"], r["sum_tf"],
            bytes(r["doc_gaps"]), bytes(r["tfs"]), bytes(r["dls"]),
        )
        for r in rows
    )


def test_fused_equals_explode(spark, sonnets_transcripts):
    fused = build_index(sonnets_transcripts, block_size=32, strategy="fused")
    explode = build_index(sonnets_transcripts, block_size=32, strategy="explode")
    assert _blocks(fused) == _blocks(explode)
    assert fused.meta["total_tokens"] == explode.meta["total_tokens"]
    assert fused.meta["avgdl"] == explode.meta["avgdl"]
    t1 = sorted(tuple(r) for r in fused.terms.collect())
    t2 = sorted(tuple(r) for r in explode.terms.collect())
    assert t1 == t2
