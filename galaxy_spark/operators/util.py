"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Fan a narrow input out to the session's parallelism BEFORE
    expensive per-row compute (shingling, hashing, Pandas-UDF
    stages).

    Small test corpora arrive as one parquet file -> a 1-partition
    scan, which would otherwise run the whole downstream expression
    tree single-threaded. At real scale the scan already yields >=
    parallelism splits and this is a no-op (checked via the physical
    partition count, so no shuffle is added when none is needed).
    Passing key columns makes the exchange a hash partitioning that
    a following groupBy on the same keys can reuse (no second
    shuffle).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *cols) if cols else df.repartition(n)
