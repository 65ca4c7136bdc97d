"""operators.clustering: k-means assignments cross-checked against
an independent numpy Lloyd reference (same hash-pick init, same
decimal-mean update, same (d2, cluster_id) tie-break) — a third
implementation besides the Spark plan and its DuckDB oracle twin —
plus the r5 scale contract: k is a configured constant decoupled
from corpus size, and assignment work is O(n·k), not n²/stride.
"""

from __future__ import annotations

import hashlib
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from galaxy_spark.operators import clustering, similarity
from galaxy_spark.operators.similarity import _dot
from galaxy_spark.tables import load_table

SF = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.1"


def _hash_pick(ids, k, salt="km"):
    return sorted(ids, key=lambda i: (
        hashlib.md5(f"{salt}:{i}".encode()).hexdigest(), i))[:k]


def _numpy_lloyd(ids, vecs, k=16, n_iter=2):
    vecs = vecs.astype(np.float64)
    cent_ids = _hash_pick(ids, k)
    cents = {i: vecs[ids.index(i)] for i in cent_ids}
    asg = {}
    for it in range(n_iter):
        asg = {}
        for vid, v in zip(ids, vecs):
            best = None
            for cid in sorted(cents):
                c = cents[cid]
                d2 = (float(np.dot(v, v))
                      - 2.0 * float(np.dot(v, c))
                      + float(np.dot(c, c)))
                if best is None or (d2, cid) < best[:2]:
                    best = (d2, cid)
            asg[vid] = best[1]
        if it < n_iter - 1:
            new = {}
            for cid in set(asg.values()):
                members = [vecs[ids.index(v)] for v, c in asg.items()
                           if c == cid]
                # decimal(18,9) member sums, one double division —
                # the operator's exact update arithmetic
                dims = []
                for d in range(vecs.shape[1]):
                    tot = sum((Decimal(repr(float(m[d])))
                               .quantize(Decimal("1.000000000"),
                                         ROUND_HALF_UP)
                               for m in members), Decimal(0))
                    dims.append(float(tot) / len(members))
                new[cid] = np.array(dims)
            cents = new
    return asg


def test_kmeans_assignments_match_numpy_reference(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float32)
    expect = _numpy_lloyd(ids, vecs)
    got = {r["vec_id"]: r["cluster_id"]
           for r in clustering.kmeans_assign(emb).collect()}
    diff = {v: (got[v], expect[v]) for v in got if got[v] != expect[v]}
    # numpy np.dot reassociates the fold, so a handful of boundary
    # assignments MAY differ if two centroids are within float ulp —
    # on this fixture none are; exact agreement is the assertion
    assert not diff, f"{len(diff)} assignment mismatches: " \
                     f"{dict(list(diff.items())[:5])}"


def test_k_decoupled_from_corpus_size(spark):
    """The scale fix itself: the same k=16 on a 500-row corpus and a
    2000-row corpus — centroid COUNT must not grow with n (the r4
    stride init yielded n/32 centroids, quadratic assignment)."""
    for sf in (SF, SF_BIG):
        emb = load_table(spark, sf, "embeddings")
        cent = similarity.hash_pick_centroids(emb, 16, "km")
        assert len(cent) == 16, sf
        n_clusters = (clustering.kmeans_assign(emb, k=16, n_iter=1)
                      .select("cluster_id").distinct().count())
        assert n_clusters <= 16, sf


def test_gemm_candidates_linear_and_contain_argmin(spark):
    """Assignment cost contract: the GEMM prune emits ~1 candidate
    row per vector (O(n), not n×k), and the exact-fold argmin over
    those candidates equals the full n×k crossJoin-fold argmin —
    the prune never drops the true assignment."""
    emb = load_table(spark, SF, "embeddings")
    v = emb.select(F.col("vec_id"), F.col("embedding").alias("vec"),
                   _dot(F.col("embedding"), F.col("embedding"))
                   .alias("vsq"))
    cent = similarity.hash_pick_centroids(emb, 16, "km")
    n = v.count()
    cand = similarity.gemm_centroid_candidates(v, cent, metric="l2")
    n_cand = cand.count()
    assert n <= n_cand <= 1.05 * n, \
        f"candidate blowup: {n_cand} rows for {n} vectors"

    got = {(r.vec_id, r.cluster_id)
           for r in clustering._assign_exact(v, cent)
           .select("vec_id", "cluster_id").collect()}
    # full n×k fold argmin — the pre-r5 plan, as the reference
    cent_df = similarity.centroid_frame(spark, cent, "cluster_id",
                                        "cvec")
    cent_df = cent_df.withColumn("csq", _dot(F.col("cvec"),
                                             F.col("cvec")))
    d2 = (F.col("vsq") - F.lit(2.0) * _dot(F.col("vec"), F.col("cvec"))
          + F.col("csq"))
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster_id")
    want = {(r.vec_id, r.cluster_id) for r in
            v.crossJoin(F.broadcast(cent_df)).withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster_id").collect()}
    assert got == want


def test_second_moments_recover_numpy_covariance(spark):
    """The integer micro-unit second moments must reconstruct the
    true covariance matrix: cov = S/n - mean_i*mean_j from the
    query's exact sums agrees with numpy's population covariance to
    the micro-quantization error (64 products, each off by < 1e-6/2
    -> elementwise tolerance ~1e-6), and the reconstructed matrix
    is symmetric PSD (eigenvalues >= -1e-9) — i.e., it is genuinely
    usable for PCA/whitening, not just hash-stable."""
    import numpy as np

    from galaxy_spark.registry import all_queries
    from galaxy_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["embeddings_second_moments"](spark, sf).collect()
    n = rows[0].n_vecs
    S = np.zeros((64, 64))
    for r in rows:
        S[r.i - 1, r.j - 1] = S[r.j - 1, r.i - 1] = r.sum_micro / 1e6
    X = np.stack([np.asarray(r.embedding, dtype=np.float32)
                  for r in load_table(spark, sf, "embeddings")
                  .select("embedding").collect()]).astype(np.float64)
    assert n == X.shape[0]
    mean = X.mean(axis=0)
    cov_q = S / n - np.outer(mean, mean)
    cov_np = np.cov(X, rowvar=False, bias=True)
    assert np.max(np.abs(cov_q - cov_np)) < 2e-6
    evals = np.linalg.eigvalsh(cov_q)
    assert evals.min() > -1e-9
