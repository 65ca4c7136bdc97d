"""Partitioned sink layout + partition pruning on read-back."""

from __future__ import annotations

from pyspark.sql import functions as F

from galaxy_spark.cdc.envelope import envelope_from_events
from galaxy_spark.plans import partition_filters
from galaxy_spark.sinks import read_partitioned, write_partitioned
from galaxy_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_partitioned_write_and_pruning(spark, tmp_path):
    env = envelope_from_events(load_table(spark, SF_SMOKE, "events"))
    out = str(tmp_path / "routed")
    write_partitioned(env, out, ("database", "table"))

    back = read_partitioned(spark, out)
    assert back.count() == env.count()

    pruned = back.filter((F.col("database") == "db0")
                         & (F.col("table") == "click"))
    pf = partition_filters(pruned)
    assert any("database" in f for f in pf), \
        "partition predicate must prune directories, not filter rows"
    exp = env.filter((F.col("database") == "db0")
                     & (F.col("table") == "click")).count()
    assert pruned.count() == exp > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must join with ZERO
    exchanges — the co-located fact-fact join layout."""
    from galaxy_spark.plans import exchange_count
    from galaxy_spark.sinks import write_bucketed

    orders = load_table(spark, SF_SMOKE, "orders") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem") \
        .select("l_orderkey", "l_quantity")
    try:
        write_bucketed(orders, "b_orders", "o_orderkey", 8,
                       str(tmp_path / "b_orders"), sort_col="o_orderkey")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8,
                       str(tmp_path / "b_lineitem"), sort_col="l_orderkey")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey) \
                   .groupBy("o_custkey") \
                   .agg(F.sum("l_quantity").alias("qty"))
        # the ONLY exchange is the final groupBy — the join itself
        # rides the bucket layout
        assert exchange_count(joined) <= 1
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey) \
                      .groupBy("o_custkey").agg(F.sum("l_quantity").alias("qty"))
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_preserves_data(spark, tmp_path):
    from galaxy_spark.sinks import compact

    out = str(tmp_path / "many_small")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(40).write.mode("overwrite").parquet(out)  # 40 small files
    import glob
    assert len(glob.glob(out + "/*.parquet")) == 40

    before = sorted(map(tuple, spark.read.parquet(out).collect()))
    n = compact(spark, out, target_file_mb=256)
    files = glob.glob(out + "/*.parquet")
    assert len(files) == n == 1   # tiny data -> one file
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == before
