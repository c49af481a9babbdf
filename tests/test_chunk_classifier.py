"""Tests for round-3 additions: chunking, line-boilerplate dedup, the NB
quality classifier, semantic decontamination, alpha mixture, and full-query
correction — each differentially checked against an independent pure-Python
(or numpy) reference implementation."""

from __future__ import annotations

import math

import pytest


# ---------------------------------------------------------------------------
# chunk_docs
# ---------------------------------------------------------------------------

DOCS = [
    (0, "a b c d e f g h i j"),
    (1, "one two three"),
    (2, "solo"),
    (3, "x y z w v u t"),
]


def _py_chunks(text, size, stride, min_tokens):
    toks = text.strip().split()
    out = []
    k = 0
    while 1 + k * stride <= len(toks):
        c = toks[k * stride : k * stride + size]
        if len(c) >= min_tokens:
            out.append((k, len(c), " ".join(c)))
        k += 1
    return out


@pytest.mark.parametrize(
    "size,stride,min_tokens",
    [(4, None, 1), (4, 2, 1), (3, 3, 3), (5, 1, 2), (1, 1, 1)],
)
def test_chunk_docs_matches_python(spark, size, stride, min_tokens):
    from tsidx.chunk import chunk_docs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk)
        for r in chunk_docs(
            df, size, stride, min_tokens=min_tokens
        ).collect()
    }
    want = {}
    for doc_id, text in DOCS:
        for k, n, c in _py_chunks(text, size, stride or size, min_tokens):
            want[(doc_id, k)] = (n, c)
    assert got == want


def test_chunk_docs_rejects_bad_args(spark):
    from tsidx.chunk import chunk_docs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_docs(df, 0)
    with pytest.raises(ValueError):
        chunk_docs(df, 4, 0)
    with pytest.raises(ValueError):
        chunk_docs(df, 4, min_tokens=5)


def test_chunk_docs_is_map_only(spark):
    from tsidx.chunk import chunk_docs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = chunk_docs(df, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# line boilerplate
# ---------------------------------------------------------------------------

LINE_DOCS = [
    (0, "keep me\ncookie banner\nunique zero"),
    (1, "cookie banner\nunique one\nfooter text"),
    (2, "unique two\nfooter text\ncookie banner"),
    (3, "all original\nnothing shared"),
    (4, "cookie banner"),  # whole doc is boilerplate
    (5, "  cookie banner  \nspaced"),  # trimmed match
]


def test_boilerplate_lines(spark):
    from tsidx.chunk import boilerplate_lines

    df = spark.createDataFrame(LINE_DOCS, "doc_id long, text string")
    got = {
        (r.line, r.n_docs)
        for r in boilerplate_lines(df, min_docs=2).collect()
    }
    assert got == {("cookie banner", 5), ("footer text", 2)}


def test_strip_boilerplate_lines(spark):
    from tsidx.chunk import strip_boilerplate_lines

    df = spark.createDataFrame(LINE_DOCS, "doc_id long, text string")
    out = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in strip_boilerplate_lines(df, min_docs=2).collect()
    }
    assert out[0] == ("keep me\nunique zero", 3, 1)
    assert out[1] == ("unique one", 3, 2)
    assert out[2] == ("unique two", 3, 2)
    assert out[3] == ("all original\nnothing shared", 2, 0)
    assert out[4] == ("", 1, 1)  # fully-boilerplate doc survives, empty
    assert out[5] == ("spaced", 2, 1)  # trimmed-content matching


def test_strip_keeps_whitespace_only_lines(spark):
    from tsidx.chunk import strip_boilerplate_lines

    df = spark.createDataFrame(
        [(0, "a\n\nb"), (1, "a\n\nc"), (2, "a\n \nd")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(df, min_docs=2).collect()
    }
    # 'a' repeats in 3 docs -> stripped; blank lines never do.
    assert out[0] == "\nb"
    assert out[2] == " \nd"


# ---------------------------------------------------------------------------
# NB classifier
# ---------------------------------------------------------------------------


def _py_nb(labeled, positive, alpha):
    c_pos, c_neg = {}, {}
    n_pos = n_neg = d_pos = d_neg = 0
    vocab = set()
    for _id, text, lab in labeled:
        toks = text.strip().split()
        pos = lab == positive
        if pos:
            d_pos += 1
        else:
            d_neg += 1
        for t in toks:
            vocab.add(t)
            if pos:
                c_pos[t] = c_pos.get(t, 0) + 1
                n_pos += 1
            else:
                c_neg[t] = c_neg.get(t, 0) + 1
                n_neg += 1
    v = len(vocab)
    dp, dn = n_pos + alpha * v, n_neg + alpha * v
    lo6 = {
        t: round(
            (
                math.log((c_pos.get(t, 0) + alpha) / dp)
                - math.log((c_neg.get(t, 0) + alpha) / dn)
            )
            * 1e6
        )
        for t in vocab
    }
    default6 = round((math.log(alpha / dp) - math.log(alpha / dn)) * 1e6)
    prior6 = round((math.log(d_pos) - math.log(d_neg)) * 1e6)
    return lo6, default6, prior6


LABELED = [
    (0, "good clean prose with many words", "hq"),
    (1, "clean text of high quality prose", "hq"),
    (2, "spam spam buy now spam", "lq"),
    (3, "buy buy cheap spam now", "lq"),
    (4, "prose with quality words", "hq"),
]

SCORE_DOCS = [
    (10, "clean quality prose"),
    (11, "spam buy cheap"),
    (12, "words unseen zebra"),
    (13, "spam prose"),
]


def test_train_nb_matches_python(spark):
    from tsidx.classifier import train_nb

    df = spark.createDataFrame(LABELED, "doc_id long, text string, label string")
    model, params = train_nb(df, positive="hq", alpha=0.5)
    want_lo6, want_default6, want_prior6 = _py_nb(LABELED, "hq", 0.5)
    got = {r.term: (r.lo6, r.logodds) for r in model.collect()}
    assert {t: l for t, (l, _) in got.items()} == want_lo6
    for t, (l, disp) in got.items():
        assert disp == pytest.approx(l / 1e6)
    assert params["default6"] == want_default6
    assert params["prior6"] == want_prior6


def test_nb_score_matches_python(spark):
    from tsidx.classifier import nb_filter, nb_score, train_nb

    lab = spark.createDataFrame(LABELED, "doc_id long, text string, label string")
    docs = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    model, params = train_nb(lab, positive="hq", alpha=0.5)
    lo6, default6, prior6 = _py_nb(LABELED, "hq", 0.5)

    got = {r.doc_id: (r.score, r.positive) for r in
           nb_score(docs, model, params).collect()}
    for doc_id, text in SCORE_DOCS:
        s6 = prior6 + sum(lo6.get(t, default6) for t in text.split())
        s = round(s6 / 1e6, 3)
        assert got[doc_id] == (pytest.approx(s), s > 0)

    kept = {r.doc_id for r in nb_filter(docs, model, params).collect()}
    assert kept == {d for d, (s, p) in got.items() if p}


def test_train_nb_needs_both_classes(spark):
    from tsidx.classifier import train_nb

    df = spark.createDataFrame(
        [(0, "a b", "hq"), (1, "c d", "hq")],
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError):
        train_nb(df, positive="hq")


# ---------------------------------------------------------------------------
# semantic decontamination (max_sim_vs_set)
# ---------------------------------------------------------------------------


def test_max_sim_vs_set_matches_numpy(spark):
    import numpy as np

    from tsidx.ann import max_sim_vs_set

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).round(3)
    vecs[17] = vecs[5] * 2.0  # planted near-dup of a ref vector (cos = 1)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = df.where("vec_id % 5 = 0")  # ids 0, 5, ..., 35
    got = {
        r.vec_id: (r.max_sim, r.flagged)
        for r in max_sim_vs_set(df, ref, tau=0.9).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    ref_ids = [i for i in range(40) if i % 5 == 0]
    for i in range(40):
        want = max(sims[i, j] for j in ref_ids)
        assert got[i][0] == pytest.approx(want, abs=1e-9)
        assert got[i][1] == (want >= 0.9)
    # every ref member flags itself (max_sim = 1)
    for i in ref_ids:
        assert got[i] == (pytest.approx(1.0), True)


def test_max_sim_exclude_self(spark):
    import numpy as np

    from tsidx.ann import max_sim_vs_set

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(12, 6)).round(3)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = df.where("vec_id % 3 = 0")
    got = {
        r.vec_id: r.max_sim
        for r in max_sim_vs_set(df, ref, tau=0.9, exclude_self=True).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for i in range(12):
        want = max(sims[i, j] for j in range(0, 12, 3) if j != i)
        assert got[i] == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# alpha mixture
# ---------------------------------------------------------------------------


def test_alpha_mixture_rates(spark):
    from tsidx.textstats import alpha_mixture_rates

    rows = (
        [(i, "w " * 10, "big") for i in range(90)]
        + [(100 + i, "w " * 10, "mid") for i in range(9)]
        + [(200, "w " * 10, "small")]
    )
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: (r.n_tokens, r.weight, r.rate, r.expected_tokens)
        for r in alpha_mixture_rates(df, alpha=0.5).collect()
    }
    n = {"big": 900, "mid": 90, "small": 10}
    tot = sum(v ** 0.5 for v in n.values())
    w = {s: v ** 0.5 / tot for s, v in n.items()}
    t_fill = min(n[s] / w[s] for s in n)
    for s in n:
        n_s, weight, rate, exp = out[s]
        assert n_s == n[s]
        assert weight == pytest.approx(w[s])
        assert rate == pytest.approx(w[s] * t_fill / n[s])
        assert exp == pytest.approx(round(w[s] * t_fill, 4))
    # alpha < 1: the smallest stratum binds (rate 1), dominant downsampled
    assert out["small"][2] == pytest.approx(1.0)
    assert out["big"][2] < out["mid"][2] < 1.0


def test_alpha_one_is_natural_proportions(spark):
    from tsidx.textstats import alpha_mixture_rates

    df = spark.createDataFrame(
        [(0, "a b c", "x"), (1, "d e", "y")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r.rate for r in alpha_mixture_rates(df, alpha=1.0).collect()}
    assert out["x"] == pytest.approx(1.0)
    assert out["y"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# correct_query
# ---------------------------------------------------------------------------


def test_correct_query(spark):
    from tsidx.build import build_index
    from tsidx.query import QueryEngine

    rows = [
        ("c0", 0, "user", "merge table scan", "", None),
        ("c0", 1, "user", "merge table hash", "", None),
        ("c0", 2, "user", "window merge sort", "", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    eng = QueryEngine(build_index(df, block_size=4))
    out = {r.pos: (r.token, r.suggestion, r.dist) for r in
           eng.correct_query("mergee tabel zzzzzz scan").collect()}
    # OOV tokens correct to the nearest dictionary stem; hopeless ones
    # return NULL; in-vocab tokens self-correct at dist 0.
    assert out[0][1] == "merg" and 0 < out[0][2] <= 2
    assert out[1] == ("tabel", "tabl", 1)
    assert out[2] == ("zzzzzz", None, None)
    assert out[3] == ("scan", "scan", 0)


# ---------------------------------------------------------------------------
# cdc_chunks (content-defined chunking)
# ---------------------------------------------------------------------------


def _md5_mod(gram: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % mod


def _py_cdc(text: str, k: int, mod: int):
    # Spark's split(trim(x), '\s+') yields [''] for empty text — one
    # empty token, one empty chunk; mirror that convention here
    toks = text.strip().split() or [""]
    n = len(toks)
    cuts = [
        i
        for i in range(k, n + 1)
        if _md5_mod(" ".join(toks[i - k : i]), mod) == 0
    ]
    bounds = [0] + sorted(set(cuts) | {n} if n else {n})
    bounds = sorted(set(bounds))
    out = []
    for j in range(len(bounds) - 1):
        c = toks[bounds[j] : bounds[j + 1]]
        out.append((j, len(c), " ".join(c)))
    return out


@pytest.mark.parametrize("k,mod", [(3, 4), (2, 8), (1, 2), (4, 1000000)])
def test_cdc_chunks_matches_python(spark, k, mod):
    import random

    from tsidx.chunk import cdc_chunks

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(20)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 60))))
        for i in range(25)
    ] + [(100, ""), (101, "one"), (102, "a b c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df, k=k, mod=mod).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.n_tokens, r.chunk))
    for d in got:
        got[d].sort()
    want = {d: _py_cdc(t, k, mod) for d, t in docs}
    assert got == want
    # chunks reassemble the document exactly
    for d, t in docs:
        assert " ".join(c for _, _, c in got[d]) == " ".join(t.strip().split())


def test_cdc_chunks_stable_under_insertion(spark):
    """The content-defined property: an insertion near the head re-chunks
    only its neighborhood — chunks further than k tokens past the edit
    are identical in both versions."""
    import random

    from tsidx.chunk import cdc_chunks

    rng = random.Random(9)
    vocab = [f"t{i}" for i in range(30)]
    body = [rng.choice(vocab) for _ in range(400)]
    orig = " ".join(body)
    edited = " ".join(body[:5] + ["INSERTED"] + body[5:])
    df = spark.createDataFrame(
        [(0, orig), (1, edited)], "doc_id long, text string"
    )
    by_doc = {0: set(), 1: set()}
    for r in cdc_chunks(df, k=3, mod=8).collect():
        by_doc[r.doc_id].add(r.chunk)
    shared = by_doc[0] & by_doc[1]
    # the overwhelming majority of chunks survive the edit (fixed windows
    # would share almost nothing: every boundary after the insert shifts)
    assert len(shared) >= 0.7 * len(by_doc[0])


def test_cdc_chunks_rejects_bad_params(spark):
    from tsidx.chunk import cdc_chunks

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        cdc_chunks(df, k=0)
    with pytest.raises(ValueError):
        cdc_chunks(df, mod=0)


def test_cdc_chunks_is_map_only(spark):
    from tsidx.chunk import cdc_chunks

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = cdc_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cdc_dup_chunks_detects_shared_passage(spark):
    """The same passage embedded in two different documents must yield
    shared chunk hashes; a doc with unrelated text must share none."""
    from tsidx.chunk import cdc_chunks, cdc_dup_chunks

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (0, "intro words here " + shared + "closing remarks"),
        (1, "totally different opening " + shared),
        (2, "unrelated content with no overlap at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dups = cdc_dup_chunks(docs, k=3, mod=4).collect()
    assert len(dups) > 0
    assert all(r["n_docs"] == 2 for r in dups)  # only docs 0 and 1 share
    # cross-check against the chunk strings themselves
    ch = cdc_chunks(docs, k=3, mod=4).collect()
    by_chunk = {}
    for r in ch:
        by_chunk.setdefault(r["chunk"], set()).add(r["doc_id"])
    want_shared = sum(1 for s in by_chunk.values() if len(s) >= 2)
    assert len(dups) == want_shared
    shared_docs = set().union(
        *(s for s in by_chunk.values() if len(s) >= 2)
    )
    assert shared_docs == {0, 1}
