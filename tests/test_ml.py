"""Sufficient-statistics model fitting (queries/ml.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from galaxy_spark.registry import all_queries
from galaxy_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_ols_matches_numpy_polyfit(spark):
    """The closed-form normal-equation solve off the integer
    statistics must agree with numpy's least squares on the SAME
    cents-quantized data — pinning the algebra independently of
    the DuckDB oracle (which shares the statistics formulation)."""
    rows = all_queries()["ml_ols_price_on_quantity"](spark, SF).collect()
    assert len(rows) == 3  # A / N / R

    li = (load_table(spark, SF, "lineitem")
          .select("l_returnflag",
                  F.round(F.col("l_quantity") * 100, 0).cast("long")
                  .alias("xi"),
                  F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                  .alias("yi"))
          .collect())
    for r in rows:
        x = np.array([t.xi for t in li if t.l_returnflag == r.returnflag],
                     dtype=np.float64)
        y = np.array([t.yi for t in li if t.l_returnflag == r.returnflag],
                     dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert r.slope == pytest.approx(slope, rel=1e-6, abs=1e-4)
        assert r.intercept_cents == pytest.approx(intercept,
                                                  rel=1e-6, abs=1e-2)
        cc = np.corrcoef(x, y)[0, 1]
        assert r.r2 == pytest.approx(cc * cc, rel=1e-6, abs=1e-6)
        assert 0.0 <= r.r2 <= 1.0


def test_kmv_sketch_is_min_k_monoid(spark):
    """KMV mergeability: the k smallest hashes of a union equal the
    k smallest of the two sides' sketches merged — the property
    that lets per-partition / per-corpus sketches union without
    re-reading data."""
    od = load_table(spark, SF, "orders")
    hv = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")),
                            1, 12), 16, 10).cast("long").alias("hv")
    k = 32
    a = od.filter(F.col("o_orderstatus") == "F").select(hv).distinct()
    b = od.filter(F.col("o_orderstatus") == "O").select(hv).distinct()
    direct = [r.hv for r in
              a.union(b).distinct().orderBy("hv").limit(k).collect()]
    ska = [r.hv for r in a.orderBy("hv").limit(k).collect()]
    skb = [r.hv for r in b.orderBy("hv").limit(k).collect()]
    merged = sorted(set(ska) | set(skb))[:k]
    assert merged == direct
