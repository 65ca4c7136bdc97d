"""operators.clustering: k-means assignments cross-checked against
an independent numpy Lloyd reference (same stride init, same
decimal-mean update, same (d2, cluster_id) tie-break) — a third
implementation besides the Spark plan and its DuckDB oracle twin.
"""

from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP

import numpy as np

from galaxy_spark.operators import clustering
from galaxy_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _numpy_lloyd(ids, vecs, stride=32, n_iter=2):
    vecs = vecs.astype(np.float64)
    cent_ids = [i for i in ids if i % stride == 0]
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
