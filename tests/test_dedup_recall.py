"""Recall pins at ORACLE scale (sf0.01) for the approximate tiers
whose driver oracle is the exact all-pairs / brute-force SQL.

These queries' correctness contract is: candidate generation has
recall 1.0 at driver-check scale, and the emitted values are exact
re-computation inside candidates — so output == exact answer. The
oracle harness asserts that at SF_ORACLE (sf0.001 default); THESE
tests pin it at sf0.01, the scale the driver actually hash-checks,
because LSH/banding recall is data- and scale-dependent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from galaxy_spark.operators import dedup, similarity
from galaxy_spark.tables import load_table

SF_DRIVER = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_minhash_equals_exact_at_driver_scale(spark):
    docs = load_table(spark, SF_DRIVER, "documents")
    exact = _pairs(dedup.shingle_pairs_jaccard(docs, n=5)
                   .filter(F.col("jaccard") >= 0.5))
    mh = _pairs(dedup.minhash_near_dups(docs, n=5, n_hashes=32, bands=8,
                                        threshold=0.5))
    assert mh == exact, f"missed={exact - mh} extra={mh - exact}"


def test_simhash_equals_exact_at_driver_scale(spark):
    docs = load_table(spark, SF_DRIVER, "documents")
    exact = _pairs(dedup.shingle_pairs_jaccard(docs, n=3)
                   .filter(F.col("jaccard") >= 0.5))
    sh = _pairs(dedup.simhash_band_near_dups(docs, n=3, bands=17,
                                             hamming_max=16, threshold=0.5))
    assert sh == exact, f"missed={exact - sh} extra={sh - exact}"


def test_lsh_topk_recall_and_purity_at_driver_scale(spark):
    """The hyperplane-LSH tiers are algorithm-mirrored at the driver
    (integer-exact signatures reproduce the candidate set in SQL),
    so recall 1.0 is NOT the contract — honest pruning is. Pin the
    measured floor on this uniformly-random corpus (0.50 observed;
    collision math predicts ~0.58 mean) and that every emitted
    neighbor is a true candidate re-ranked exactly."""
    emb = load_table(spark, SF_DRIVER, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    key = lambda df: {(r.q_id, r.neighbor_id) for r in df.collect()}
    exact = key(similarity.cosine_topk(q, emb, k=5))
    lsh = key(similarity.lsh_topk(q, emb, k=5, dim=64))
    # floor pinned just under the observed 0.50: the signature is
    # deterministic, so a drop below 0.45 is a real regression, not
    # noise (ADVICE r3: 0.4 was loose enough to hide one)
    assert len(lsh & exact) / len(exact) >= 0.45


def test_embedding_lsh_near_dup_recall_and_pruning_at_driver_scale(spark):
    """Near-dup LSH blocking: no false positives ever (exact verify
    inside buckets), measured recall floor (0.69 observed at
    cos>=0.4 on uniform data; ~1.0 for real near-dups at cos>=0.8),
    and the blocking must actually PRUNE — the candidate set stays
    under half of all pairs, which is what the r2 recall-1.0-tuned
    config (2 planes = near-pass-through) violated."""
    emb = load_table(spark, SF_DRIVER, "embeddings")
    exact = _pairs(dedup.embedding_near_dup(emb, threshold=0.4))
    lsh = _pairs(similarity.lsh_near_dup_pairs(emb, threshold=0.4, dim=64))
    assert lsh <= exact                      # exact verify: no extras
    # observed 0.695 (deterministic); 0.65 floor trips on any real
    # regression where the old 0.6 would not (ADVICE r3)
    assert len(lsh & exact) / max(len(exact), 1) >= 0.65
    # threshold=-1 keeps every candidate pair the blocking emits
    n = emb.count()
    n_cand = similarity.lsh_near_dup_pairs(emb, threshold=-1.0,
                                           dim=64).count()
    assert n_cand < 0.5 * n * (n - 1) / 2, "LSH filter is pass-through"


def test_semantic_cluster_dedup_recall_and_purity_at_driver_scale(spark):
    """Semantic (k-means-partitioned) dedup: within-cluster pairs
    are an exact-cosine SUBSET of the all-pairs tier (purity 1.0 by
    construction), recall is the price of missing cross-cluster
    pairs. On this uniformly-random corpus every cos>=0.4 pair is
    WEAK (none reach 0.6), the hardest case for cluster
    co-assignment. Re-measured for the r5 fixed-k hash-pick init
    (k=8: 0.458 at sf0.01 — above the r4 stride config's 0.407;
    k=16 measured 0.288, which is why the query pins k=8). Real
    near-dup corpora (cos -> 1) co-assign with probability -> 1;
    the floor pinned here trips if the kmeans stage regresses."""
    from galaxy_spark.registry import all_queries
    qs = all_queries()
    sem = {(r.id_a, r.id_b)
           for r in qs["dedup_semantic_clusters"](spark, SF_DRIVER).collect()}
    exact = {(r.id_a, r.id_b)
             for r in qs["dedup_embedding_cosine"](spark, SF_DRIVER).collect()}
    assert sem <= exact, "within-cluster exact cosine must not invent pairs"
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.43, f"recall regressed: {recall:.3f}"


def test_cluster_shard_skew_guard_subset_and_bounded(spark):
    """shard_oversized_clusters: (a) every sub-shard stays near the
    cap (hash balance), (b) sharded pair search returns a SUBSET of
    the unsharded within-cluster pairs (the guard only removes
    comparisons — purity unaffected), (c) clusters under the cap are
    untouched (identical pair set when the cap exceeds every
    cluster)."""
    from galaxy_spark.operators import clustering

    emb = load_table(spark, SF_DRIVER, "embeddings")
    a = (clustering.kmeans_assign(emb, k=8, n_iter=2)
         .select("vec_id", "cluster_id")
         .join(emb.select("vec_id", "embedding"), "vec_id")
         .localCheckpoint(eager=True))

    def pairs(df, col):
        return {(r.id_a, r.id_b) for r in
                similarity.within_cluster_candidates(
                    df, threshold=0.4, cluster_col=col).collect()}

    base = pairs(a, "cluster_id")
    capped = similarity.shard_oversized_clusters(a, max_cluster_size=20)
    sizes = {r.cluster_shard: r.n for r in
             capped.groupBy("cluster_shard")
             .agg(F.count("*").alias("n")).collect()}
    # hash balance: shards target <=20; allow 2x slack for hash noise
    assert max(sizes.values()) <= 40, sizes
    sharded = pairs(capped, "cluster_shard")
    assert sharded <= base                       # (b) subset only
    assert len(sharded) < len(base)              # the cap really bites
    # (c) cap above every cluster -> no-op
    loose = similarity.shard_oversized_clusters(a, max_cluster_size=10**6)
    assert pairs(loose, "cluster_shard") == base


def test_prefix_filter_lossless_and_smaller_index(spark):
    """Prefix filtering must (a) return EXACTLY the full-index
    exact-Jaccard pairs (losslessness is the PPJoin theorem, here
    pinned empirically) and (b) generate strictly fewer candidate
    pairs than the share-any-shingle index — the point of the
    technique."""
    from pyspark.sql import Window

    from galaxy_spark.operators.text import word_ngrams
    from galaxy_spark.tables import load_table

    docs = load_table(spark, SF_DRIVER, "documents")
    full = dedup.shingle_pairs_jaccard(docs, n=5) \
        .filter(F.col("jaccard") >= 0.5)
    pref = dedup.prefix_filter_jaccard(docs, n=5, threshold=0.5)
    full_pairs = {(r.id_a, r.id_b, round(r.jaccard, 6))
                  for r in full.collect()}
    pref_pairs = {(r.id_a, r.id_b, round(r.jaccard, 6))
                  for r in pref.collect()}
    assert pref_pairs == full_pairs and full_pairs

    # candidate volume: prefix index self-join pairs vs full index
    sh = docs.select(F.col("doc_id").alias("id"),
                     word_ngrams(F.col("text"), 5).alias("shingles")) \
        .withColumn("n_sh", F.size("shingles"))
    ex = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy("df", "shingle")
    plen = (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(0.5)).cast("int")
            + F.lit(1))
    prefix = (ex.join(dfreq, "shingle")
              .withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= plen).select("id", "shingle"))

    def n_cands(index):
        return (index.alias("a")
                .join(index.alias("b"),
                      (F.col("a.shingle") == F.col("b.shingle"))
                      & (F.col("a.id") < F.col("b.id")))
                .select("a.id", "b.id").distinct().count())

    full_c, pref_c = n_cands(ex.select("id", "shingle")), n_cands(prefix)
    assert pref_c < full_c * 0.7, (pref_c, full_c)


def test_ppjoin_prefix_len_exact_at_float_boundaries(spark):
    """The prefix bound |d| - ceil(t*|d|) + 1 must use the EXACT
    rational value of t*n, not the float product: t=0.1, n=80 gives
    8.000000000000002 in binary, whose naive ceil (9) shortens the
    prefix by one token and silently breaks losslessness. Pin the
    Spark expression against exact Decimal arithmetic over a grid
    that includes every (t, n) pair where the float product sits a
    few ulps off an integer."""
    import math
    from decimal import Decimal

    from galaxy_spark.operators.dedup import ppjoin_prefix_len

    thresholds = [0.1, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6, 0.7, 0.75,
                  0.8, 0.9, 0.333333, 0.123456]
    ns = list(range(1, 201))
    df = spark.createDataFrame([(n,) for n in ns], "n_sh int")
    for t in thresholds:
        got = {r.n_sh: r.p for r in df.select(
            "n_sh", ppjoin_prefix_len(F.col("n_sh"), t).alias("p"))
            .collect()}
        for n in ns:
            exact = n - math.ceil(Decimal(str(t)) * n) + 1
            assert got[n] == exact, (t, n, got[n], exact)


def test_winnowing_covers_high_jaccard_pairs_at_driver_scale(spark):
    """Winnowing's POSITIONAL guarantee, checked empirically at the
    driver's scale: every pair the exact 5-shingle Jaccard tier
    calls a near-dup at >= 0.5 shares long common runs, so the
    winnowing candidates (k=3, w=4: any shared 6-word run yields a
    shared fingerprint) must contain all of them — and stay a
    CANDIDATE set, not all-pairs (bounded extras, each sharing >= 2
    retained fingerprints)."""
    from galaxy_spark.registry import all_queries

    docs = load_table(spark, SF_DRIVER, "documents")
    exact = _pairs(dedup.shingle_pairs_jaccard(docs, n=5)
                   .filter(F.col("jaccard") >= 0.5))
    win = {(r.doc_a, r.doc_b) for r in
           all_queries()["dedup_winnowing_pairs"](
               spark, SF_DRIVER).collect()}
    assert exact, "ground truth empty: dataset lost its near-dups"
    assert exact <= win, f"guarantee violated: missed {exact - win}"
    n_docs = docs.count()
    assert len(win) < n_docs, \
        "winnowing degenerated toward all-pairs"
