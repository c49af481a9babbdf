"""Similarity-search operators: exact top-k, LSH recall bound, dup pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsidx.ann import (
    cosine_dup_pairs_exact,
    cosine_topk,
    embedding_dup_pairs,
    lsh_bucketed_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


def test_cosine_topk_shape_and_order(emb, queries):
    got = cosine_topk(emb, queries, k=5).collect()
    assert len(got) == 40  # 8 queries x 5
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        sims = [r["sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r["vec_id"] != q for r in rows)  # self excluded


def test_cosine_topk_matches_numpy(emb, queries):
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    got = cosine_topk(emb, queries, k=3).collect()
    for r in got[:9]:
        a, b = vecs[r["query_id"]], vecs[r["vec_id"]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["sim"] - want) < 1e-9


def test_lsh_recall_bound(emb, queries):
    """LSH top-k must recover a solid fraction of the exact top-k."""
    # random 64-dim corpus: nearest neighbors sit at cosine ~0.3-0.5, so
    # collision probability per table is low — few planes, many tables
    exact = cosine_topk(emb, queries, k=10).collect()
    approx = lsh_bucketed_topk(
        emb, queries, k=10, n_planes=4, n_tables=16
    ).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # every approx sim must be a true cosine (verified candidates)
    exact_sims = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-9


def test_lsh_deterministic(emb, queries):
    a = sorted(map(tuple, lsh_bucketed_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, lsh_bucketed_topk(emb, queries, k=5).collect()))
    assert a == b


def test_dup_pairs_lsh_subset_of_exact(emb):
    """LSH dup pairs are exact-cosine-verified, so every returned pair must
    appear in the brute-force set at the same threshold."""
    tau = 0.4
    exact = {(r["id_a"], r["id_b"]) for r in
             cosine_dup_pairs_exact(emb, tau).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_dup_pairs(emb, tau=tau, n_planes=4, n_tables=6).collect()}
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.3  # candidate recall sanity


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def test_ivf_assign_covers_corpus(emb):
    from tsidx.ann import ivf_assign, ivf_train_centroids

    cents = ivf_train_centroids(emb, n_centroids=8, n_iters=1)
    assert len(cents) == 8 and len(cents[0]) == 64
    assigned = ivf_assign(emb, cents)
    rows = assigned.collect()
    assert len(rows) == emb.count()  # map-only: every vector exactly once
    assert all(0 <= r["cid"] < 8 for r in rows)


def test_ivf_recall_bound(emb, queries):
    """Probing half the centroid lists must recover a solid fraction of the
    exact top-k even on an unclustered random corpus."""
    from tsidx.ann import cosine_topk, ivf_topk

    exact = cosine_topk(emb, queries, k=10).collect()
    approx = ivf_topk(
        emb, queries, k=10, n_centroids=16, n_probes=8, n_iters=2
    ).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every returned sim is a true cosine (exact scoring of candidates)
    exact_sims = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-9


def test_ivf_deterministic_and_amortizable(emb, queries):
    from tsidx.ann import ivf_assign, ivf_topk, ivf_train_centroids

    a = sorted(map(tuple, ivf_topk(emb, queries, k=5, n_centroids=8).collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=5, n_centroids=8).collect()))
    assert a == b
    # precomputed centroids + assignment (the persistent-index path) give
    # the identical result
    cents = ivf_train_centroids(emb, n_centroids=8, n_iters=2)
    assigned = ivf_assign(emb, cents)
    c = sorted(map(tuple, ivf_topk(
        emb, queries, k=5, centroids=cents, assigned=assigned
    ).collect()))
    assert a == c


def test_ivf_write_read_roundtrip(spark, emb, queries, tmp_path):
    """Persisted IVF index gives identical results; probing reads only the
    probed cid partitions (partition pruning on the lists directory)."""
    from tsidx.ann import ivf_assign, ivf_read, ivf_topk, ivf_train_centroids, ivf_write

    cents = ivf_train_centroids(emb, n_centroids=8, n_iters=2)
    assigned = ivf_assign(emb, cents)
    path = str(tmp_path / "ivf")
    ivf_write(assigned, cents, path)
    loaded, cents2 = ivf_read(spark, path)
    assert cents2 == cents
    a = sorted(map(tuple, ivf_topk(
        emb, queries, k=5, centroids=cents, assigned=assigned
    ).collect()))
    b = sorted(map(tuple, ivf_topk(
        emb, queries, k=5, centroids=cents2, assigned=loaded
    ).collect()))
    assert a == b
    import os

    assert any(d.startswith("cid=") for d in os.listdir(os.path.join(path, "lists")))


def test_ivf_full_probe_equals_exact(emb, queries):
    """Probing every centroid degrades to exact brute force — rank and sims
    must match cosine_topk exactly."""
    from tsidx.ann import cosine_topk, ivf_topk

    exact = sorted(
        (r["query_id"], r["vec_id"], round(r["sim"], 9))
        for r in cosine_topk(emb, queries, k=10).collect()
    )
    full = sorted(
        (r["query_id"], r["vec_id"], round(r["sim"], 9))
        for r in ivf_topk(
            emb, queries, k=10, n_centroids=8, n_probes=8
        ).collect()
    )
    assert exact == full


def test_quantize_int8_matches_numpy(emb):
    """Quantization rule floor(x*127/max|x| + 0.5), verified independently."""
    import numpy as np

    from tsidx.ann import quantize_int8

    got = {r["vec_id"]: list(r["qvec"])
           for r in quantize_int8(emb).limit(2000).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for vid, q in got.items():
        v = vecs[vid]
        ma = np.abs(v).max()
        want = (np.floor(v * 127.0 / ma + 0.5).astype(np.int64) if ma > 0
                else np.zeros(len(v), dtype=np.int64))
        assert q == want.tolist(), vid
        assert max(abs(x) for x in q) <= 127


def test_quantize_int8_zero_vector(spark):
    from tsidx.ann import quantize_int8

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: list(r["qvec"]) for r in quantize_int8(df).collect()}
    assert got[0] == [0, 0, 0]
    assert got[1] == [64, -127, 32]  # floor(x*127/2 + .5)


def test_quantized_topk_recall_vs_exact(emb, queries):
    """int8 quantization must preserve nearly all of the exact top-k."""
    from tsidx.ann import quantized_cosine_topk

    k = 10
    exact = cosine_topk(emb, queries, k=k).collect()
    quant = quantized_cosine_topk(emb, queries, k=k).collect()
    ex: dict = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    qt: dict = {}
    for r in quant:
        qt.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(ex[q] & qt[q]) / k for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    # sims are close to the float sims, not just overlapping ids
    exact_sims = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact}
    for r in quant:
        key = (r["query_id"], r["vec_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 0.02


def test_quantized_topk_prequantized_roundtrip(spark, emb, queries, tmp_path):
    """Stored-quantized corpus path == on-the-fly quantization path."""
    from tsidx.ann import quantize_read, quantize_write, quantized_cosine_topk

    path = str(tmp_path / "qvecs")
    quantize_write(emb, path)
    stored = quantize_read(spark, path)
    a = sorted(map(tuple, quantized_cosine_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, quantized_cosine_topk(
        stored, queries, k=5, emb_col="qvec", corpus_quantized=True).collect()))
    assert a == b


def test_semdedup_recovers_planted_dups(spark, emb):
    """SemDeDup (cluster-bucketed) finds planted near-copies; the exact
    all-pairs twin is the ground truth."""
    from tsidx.ann import cosine_dup_pairs_exact, semdedup_keep, semdedup_pairs

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = base.filter(F.col("vec_id") % 13 == 0).select(
        (F.col("vec_id") + 50000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + 0.1 *"
            " element_at(embedding, ((i + 1) % size(embedding)) + 1))"
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_dup_pairs_exact(corpus, tau=0.95).collect()
    }
    assert exact  # the plant produced true near-dups
    assert all(b - a == 50000 for a, b in exact)
    approx = {
        (r["id_a"], r["id_b"])
        for r in semdedup_pairs(corpus, tau=0.95, n_centroids=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))
    # no false positives: every reported pair really is >= tau
    assert approx <= exact

    kept = semdedup_keep(corpus, tau=0.95, n_centroids=8)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # every dropped id is the higher id of a reported pair
    dropped = {b for _, b in approx}
    assert kept_ids == (
        {r["vec_id"] for r in corpus.select("vec_id").collect()} - dropped
    )


def test_semdedup_no_pairs_on_spread_corpus(emb):
    """The raw synthetic embeddings have max pairwise cosine ~0.51:
    at the SemDeDup operating point nothing is a duplicate."""
    from tsidx.ann import semdedup_pairs

    assert semdedup_pairs(emb, tau=0.95, n_centroids=8).count() == 0


def test_rocchio_matches_numpy_differential(emb, queries):
    """Full numpy replay of the Rocchio pipeline (same roundings, same
    tiebreaks) must reproduce the engine's top-k lists exactly."""
    import numpy as np

    from tsidx.ann import rocchio_topk

    fb_k, k, alpha, beta = 4, 6, 1.0, 0.75
    got = rocchio_topk(emb, queries, k=k, fb_k=fb_k, alpha=alpha, beta=beta).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    qs = {r["query_id"]: np.array(r["q_emb"], dtype=np.float64) for r in queries.collect()}

    def topk(qid, qv, n):
        sims = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            s = float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            sims.append((-s, vid))
        sims.sort()
        return [vid for _, vid in sims[:n]]

    for qid, qv in qs.items():
        fb = topk(qid, qv, fb_k)
        cent = np.round(np.mean([vecs[i] for i in fb], axis=0), 6)
        q2 = np.round(alpha * qv + beta * cent, 6)
        want = topk(qid, q2, k)
        assert [vid for vid, _ in by_q[qid]] == want, qid


def test_rocchio_pulls_query_toward_feedback_cluster(spark):
    """Planted geometry: after feedback from the tight cluster, a second
    cluster member overtakes an isolated vector that pass 1 ranked higher."""
    from tsidx.ann import rocchio_topk

    rows = [
        (0, [1.0, 0.0]),          # the query vector
        (1, [0.95, 0.3122]),      # isolated, very close to q
        (2, [0.6, 0.8]),          # cluster member A
        (3, [0.55, 0.835]),       # cluster member B
        (4, [0.58, 0.8146]),      # cluster member C
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    base = [r["vec_id"] for r in cosine_topk(emb, q, k=4).collect()]
    assert base[0] == 1  # pass 1: the isolated near-duplicate wins
    rocchio = [
        r["vec_id"]
        for r in rocchio_topk(emb, q, k=4, fb_k=3, alpha=0.0, beta=1.0).collect()
    ]
    # alpha=0: pure centroid query; fb = {1, 2, 4} and its centroid sits
    # between the cluster members, so one of them overtakes the isolated
    # pass-1 winner
    assert rocchio[0] in (2, 3, 4)


def test_mean_pool_exact_and_ordered(spark):
    """Pooled vector = per-dimension mean in dimension order; rounding
    pins the dims; singleton groups pool to themselves."""
    from tsidx.ann import mean_pool

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 30.0]),
            (0, [3.0, 4.0, -10.0]),
            (1, [5.0, 6.0, 7.0]),
        ],
        "grp long, embedding array<float>",
    )
    got = {r["grp"]: r["embedding"] for r in mean_pool(df, "grp").collect()}
    assert got[0] == [2.0, 3.0, 10.0]
    assert got[1] == [5.0, 6.0, 7.0]
    r6 = {r["grp"]: r["embedding"]
          for r in mean_pool(df, "grp", round_dims=6).collect()}
    assert r6[0] == [2.0, 3.0, 10.0]


def test_mean_pool_composes_with_cosine_topk(spark):
    """Conv-level retrieval: pooled groups ranked by cosine."""
    from tsidx.ann import cosine_topk, mean_pool

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pooled = mean_pool(
        df.withColumn("grp", (F.col("vec_id") / 4).cast("long")), "grp"
    ).withColumnRenamed("grp", "vec_id")
    queries = pooled.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got = cosine_topk(pooled, queries, k=3).collect()
    # numpy ground truth
    import collections
    groups = collections.defaultdict(list)
    for i, v in rows:
        groups[i // 4].append(np.array(v))
    pv = {g: np.mean(vs, axis=0) for g, vs in groups.items()}
    for qid in (0, 1):
        sims = sorted(
            ((float(np.dot(pv[qid], v) / (np.linalg.norm(pv[qid]) * np.linalg.norm(v))), g)
             for g, v in pv.items() if g != qid),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        mine = [(r["sim"], r["vec_id"]) for r in got if r["query_id"] == qid]
        assert [g for _, g in sims] == [g for _, g in mine]
        for (ws, _), (gs, _) in zip(sims, mine):
            assert gs == pytest.approx(ws, rel=1e-6)


# ------------------------------------------------------------- mutual kNN


def test_mutual_knn_pairs_reciprocity(spark):
    from tsidx.ann import mutual_knn_pairs

    # hand-built topk table: 1<->2 mutual, 1->3 one-directional,
    # 4<->5 mutual
    rows = [
        (1, 2, 0.9), (1, 3, 0.8),
        (2, 1, 0.9), (2, 5, 0.1),
        (3, 4, 0.7),
        (4, 5, 0.95), (5, 4, 0.95),
    ]
    topk = spark.createDataFrame(
        rows, "query_id long, vec_id long, sim double"
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in mutual_knn_pairs(topk).collect()
    }
    assert set(got) == {(1, 2), (4, 5)}
    assert got[(1, 2)] == pytest.approx(0.9)


def test_mutual_knn_matches_brute_force(spark, emb):
    """Over real vectors: mutual pairs == python reciprocal top-k."""
    import numpy as np

    from tsidx.ann import cosine_topk, mutual_knn_pairs

    rows = emb.filter("vec_id < 60").collect()
    emb_frame = emb.filter("vec_id < 60")
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=float)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    k = 3
    top = {}
    for i, vid in enumerate(ids):
        order = sorted(
            ((float(sims[i, j]), -ids[j]) for j in range(len(ids)) if j != i),
            reverse=True,
        )[:k]
        top[vid] = {-nid for _, nid in order}
    want = {
        (a, b)
        for a in top
        for b in top[a]
        if a < b and a in top.get(b, set())
    }
    from pyspark.sql import functions as F

    queries = emb_frame.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_pairs(
            cosine_topk(emb_frame, queries, k=k)
        ).collect()
    }
    assert got == want
