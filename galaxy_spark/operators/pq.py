"""Product quantization (PQ) for approximate nearest neighbor.

The fourth ANN tier next to exact/GEMM, LSH, and IVF
(operators/similarity.py): compress each vector to M subspace
centroid codes (M=16 x 6-bit codes = 12 bytes a vector at the
query-surface setting, ~21x smaller than float32), then score
queries against the CODES via an asymmetric-distance lookup table
(ADC, Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search") — the corpus's float vectors are never touched
at query time.

Scale story (100 TB): code assignment is ONE Arrow mapInPandas
pass against broadcast-captured centroids (no crossJoin, no
shuffle — fixed k decoupled from corpus size, the r5 k-means/IVF
fix applied from day one); the ADC lookup table is |Q|·M·k rows
(bounded by the query contract) and broadcasts; the only exchange
is the final per-(query, vector) fold, which partial-aggregates
map-side from M rows to 1 before shuffling.

Determinism contract (how the DuckDB oracle mirrors bit-for-bit):
- centroid pick: hash_pick_centroids (md5 order, SQL twin), sorted
  by cent_id so argmin tie-breaks agree;
- subspace distances: sequential left-fold float64 sums in ALL
  THREE evaluators — DuckDB's list_sum, Python's seq_dot, and
  numpy's small-axis reduction (numpy switches to pairwise
  summation only above 8 elements / 128-element blocks; sub_dim=4
  stays sequential), over identical float64 values (float32 widens
  exactly; subtract/multiply are single correctly-rounded ops);
- argmin ties: numpy argmin returns the FIRST minimum == lowest
  cent_id (the centroid axis is sorted by id) == the SQL
  ``ORDER BY dist, cent_id`` tie-break;
- ADC partial sums: per-entry dot rounded at 1e-6 engine-side then
  summed as DECIMAL, so partition/order can't move a score
  (repo-wide pattern).

An earlier revision assigned codes with per-centroid Spark
expression columns; at M=16, k=64 that is 1024 HOF aggregates per
row — 57 s at sf0.01 vs 0.4 s for this Arrow pass (and the fully
unrolled variant overflowed janino's 64 KB method limit, silently
dropping the projection out of codegen).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seq_dot(a: list[float], b: list[float]) -> float:
    """Python twin of the engines' left-fold dot product: identical
    IEEE result to DuckDB's list_sum (same order, same float64
    ops)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def pq_codes(corpus: DataFrame, cents: list, n_sub: int, sub_dim: int,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Assign each corpus vector its PQ code per subspace: the
    cent_id minimizing the subspace squared L2 distance (ties ->
    lowest cent_id). ``cents`` must be sorted by id ascending so
    numpy's first-minimum argmin IS the lowest-cent_id tie-break.

    Returns (id, s, code) long-format rows from one Arrow
    mapInPandas pass — scan-local, centroids ride the closure
    (k·dim floats, bounded by configuration), no join, no shuffle.
    sub_dim must be <= 8 so numpy's reduction stays a sequential
    left fold (see module docstring).
    """
    assert sub_dim <= 8, "sub_dim > 8 breaks numpy seq-fold parity"
    assert all(cents[i][0] < cents[i + 1][0] for i in range(len(cents) - 1))
    ids = np.array([int(c) for c, _ in cents], dtype=np.int64)
    C = np.array([v for _, v in cents], dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            vid = pdf["id"].to_numpy()
            n = len(vid)
            out_id = np.repeat(vid, n_sub)
            out_s = np.tile(np.arange(n_sub, dtype=np.int32), n)
            codes = np.empty((n, n_sub), dtype=np.int64)
            for s in range(n_sub):
                lo, hi = s * sub_dim, (s + 1) * sub_dim
                D = V[:, None, lo:hi] - C[None, :, lo:hi]
                dist = (D * D).sum(axis=2)
                codes[:, s] = ids[dist.argmin(axis=1)]
            yield pd.DataFrame({"id": out_id, "s": out_s,
                                "code": codes.reshape(-1)})

    return (corpus
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInPandas(gen, "id long, s int, code long"))


def adc_lut_rows(queries: list, cents: list, n_sub: int,
                 sub_dim: int) -> list[tuple]:
    """Asymmetric-distance lookup table: (q_id, s, cent_id,
    dot(q_s, cent_s)) — |Q|·n_sub·k rows, computed driver-side from
    the already-collected (bounded) queries and centroids with the
    engines' own fold order. Values are UNROUNDED: the caller
    applies ``F.round(_, 6)`` engine-side, so the only rounding
    equivalence relied on is Spark-F.round == DuckDB-ROUND (proven
    repo-wide), never Python's ``round``."""
    rows = []
    for q_id, q_vec in queries:
        for s in range(n_sub):
            lo, hi = s * sub_dim, (s + 1) * sub_dim
            for cent_id, c_vec in cents:
                rows.append((int(q_id), s, int(cent_id),
                             seq_dot(q_vec[lo:hi], c_vec[lo:hi])))
    return rows
