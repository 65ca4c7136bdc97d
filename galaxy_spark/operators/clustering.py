"""Embedding-space clustering: mini k-means (Lloyd iterations) on
the ``embeddings`` table.

Why it's here: diversity sampling, cluster-balanced mixtures, and
semantic-dedup recipes all start from "assign every embedding to one
of k centroids" (public recipes: SemDeDup / Abbas et al. 2023,
k-means-based data pruning). IVF (``operators/similarity.py``) uses
the stride pick as a stateless coarse quantizer; this operator adds
the Lloyd refinement loop that turns the same init into actual
cluster structure.

Engine-exact determinism (what lets a SQL oracle mirror the
algorithm): centroid updates sum per-dimension values as
DECIMAL(18,9) — order-independent exact arithmetic — then divide
once as double; distances are three sequential double dot-folds
(``_dot``, same expression shape as the cosine oracles). Every
assignment is therefore bit-reproducible in any engine, and
tie-breaks are (distance, centroid_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from galaxy_spark.operators.similarity import _dot


def kmeans_assign(emb: DataFrame, stride: int = 32, n_iter: int = 2,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Lloyd's k-means for ``n_iter`` assignment rounds from a
    deterministic stride init (``id % stride == 0``, the IVF pick).
    Returns the final assignment ``(vec_id, cluster_id, d2)``.

    Distances expand as ``(|v|^2 - 2 v.c) + |c|^2`` with both norms
    FOLDED ONCE per vector / per centroid — the per-pair work is a
    single dot fold instead of three (n*k pairs dominate, so this
    is a ~3x cut on the hot path). The expansion's operation order
    is identical in the SQL mirror, so assignments stay
    engine-exact.

    Plan shape per round: one broadcast of the centroid set (k rows,
    k = n/stride) onto the vector scan + an argmin window keyed by
    vector id, then (between rounds) one per-dimension aggregation
    (posexplode -> groupBy (cluster, dim) -> decimal mean) that is
    ~dim x the centroid count in rows — tiny. No driver-side
    actions: the full ``n_iter``-round lineage is ONE lazy plan.
    Empty clusters drop out of the centroid set exactly as they do
    in the SQL mirror.
    """
    v = emb.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("vec"),
                   _dot(F.col(vec_col), F.col(vec_col)).alias("vsq"))
    cent = v.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cluster_id"), F.col("vec").alias("cvec"),
        F.col("vsq").alias("csq"))
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster_id")
    asg = None
    for it in range(n_iter):
        d2 = (F.col("vsq") - F.lit(2.0) * _dot(F.col("vec"), F.col("cvec"))
              + F.col("csq"))
        asg = (v.crossJoin(F.broadcast(cent))
               .withColumn("d2", d2)
               .withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("vec_id", "cluster_id", "d2"))
        if it < n_iter - 1:
            dims = (asg.join(v.select("vec_id", "vec"), "vec_id")
                    .select("cluster_id",
                            F.posexplode("vec").alias("pos", "val"))
                    .groupBy("cluster_id", "pos")
                    .agg((F.sum(F.col("val").cast("decimal(18,9)"))
                          .cast("double") / F.count("*")).alias("m")))
            cent = (dims.groupBy("cluster_id")
                    .agg(F.array_sort(
                        F.collect_list(F.struct("pos", "m"))).alias("pm"))
                    .select("cluster_id",
                            F.transform("pm", lambda s: s["m"])
                            .alias("cvec")))
            cent = cent.withColumn(
                "csq", _dot(F.col("cvec"), F.col("cvec")))
    return asg
