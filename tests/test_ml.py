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


def test_per_part_ols_degenerate_groups_null_identically(spark,
                                                         tmp_path):
    """The per-key fit's whole point is surviving degenerate
    groups: a 1-row group and an all-equal-x group must yield NULL
    slope/intercept (zero x-variance), a constant-y group NULL R²
    — and the Spark query and its DuckDB oracle must agree on the
    synthetic corpus exactly (the sf corpora have no degenerate
    part, so this path needs its own data)."""
    import duckdb

    from galaxy_spark.registry import all_oracles, all_queries
    from tests.oracle_harness import compare

    # synthetic lineitem: part 1 = healthy fit; part 2 = single
    # row; part 3 = constant x; part 4 = constant y
    rows = [
        (1, 1.0, 10.0), (1, 2.0, 21.0), (1, 3.0, 29.0),
        (2, 5.0, 50.0),
        (3, 4.0, 10.0), (3, 4.0, 20.0),
        (4, 1.0, 7.0), (4, 2.0, 7.0), (4, 9.0, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "l_partkey long, l_quantity double, "
              "l_extendedprice double")
    d = str(tmp_path / "synth")
    import os

    os.makedirs(d)
    df.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"'{d}/lineitem.parquet/*.parquet'")
    got = all_queries()["ml_ols_per_part"](spark, d)
    probs = compare(got, con, all_oracles()["ml_ols_per_part"])
    assert not probs, probs

    by_key = {r.partkey: r for r in got.collect()}
    assert by_key[1].slope is not None and by_key[1].r2 is not None
    assert by_key[2].slope is None and by_key[2].intercept_cents is None
    assert by_key[3].slope is None
    assert by_key[4].slope is not None and by_key[4].r2 is None
    assert by_key[4].slope == 0.0


def test_per_part_ols_output_is_o_groups_one_exchange(spark):
    """The grouped-map-UDF alternative ships O(rows) through the
    shuffle and materializes whole groups; the statistics plan must
    show ONE exchange with map-side partial aggregation, and the
    output row count equals the group count exactly."""
    from galaxy_spark.plans import exchange_count, physical_plan
    from galaxy_spark.registry import all_queries

    df = all_queries()["ml_ols_per_part"](spark, SF)
    assert exchange_count(df) == 1
    assert "partial_" in physical_plan(df), \
        "statistics must fold map-side"
    n_groups = (load_table(spark, SF, "lineitem")
                .select("l_partkey").distinct().count())
    assert df.count() == n_groups


def test_per_part_ols_scales_to_many_groups(spark, tmp_path):
    """1e5 synthetic keys through the REGISTERED query (not a
    lookalike aggregation — the r8 review caught a tautological
    version of this test that never invoked product code): the
    result is exactly |groups| rows off one partial-aggregated
    exchange. This is the scale regime where a grouped-map Pandas
    UDF plan dies first."""
    import os

    from pyspark.sql import functions as F2

    from galaxy_spark.plans import exchange_count
    from galaxy_spark.registry import all_queries

    n_keys = 100_000
    d = str(tmp_path / "many")
    os.makedirs(d)
    (spark.range(0, n_keys * 4)
     .select((F2.col("id") % n_keys).alias("l_partkey"),
             ((F2.col("id") % 97) / 10.0 + 1.0).alias("l_quantity"),
             (((F2.col("id") % 97) * 3 + F2.col("id") % 11) / 10.0)
             .alias("l_extendedprice"))
     .write.mode("overwrite")
     .parquet(os.path.join(d, "lineitem.parquet")))

    df = all_queries()["ml_ols_per_part"](spark, d)
    assert exchange_count(df) == 1
    assert df.count() == n_keys
    # every 4-row group has x-variance: fits must be non-NULL
    assert df.filter("slope IS NULL").count() == 0
