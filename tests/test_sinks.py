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
