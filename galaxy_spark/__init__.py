"""galaxy_spark — a PySpark-native analytics/CDC engine.

A from-scratch re-expression of the capabilities of the reference
engine dollarkillerx/galaxy (a MySQL CDC stream processor; see
SURVEY.md) on idiomatic Spark primitives:

- CDC envelope + filters + projections + DDL  -> galaxy_spark.cdc
- Streaming assembly, windows, stateful ops,
  continuous aggregates                       -> galaxy_spark.streaming
- Sources (kafka/file/rate/jdbc builders)     -> galaxy_spark.sources
- Sinks (partitioned + bucketed layouts)      -> galaxy_spark.sinks
- Control plane (task lifecycle, metrics)     -> galaxy_spark.control
- Dedup / similarity / text / multimodal /
  custom joins (as-of, range, salted)         -> galaxy_spark.operators
- Public Column-function namespace            -> galaxy_spark.functions
- Physical-plan audit helpers                 -> galaxy_spark.plans
- Query registry + oracle contract            -> galaxy_spark.registry,
                                                 galaxy_spark.queries
- Session / table IO helpers                  -> galaxy_spark.session,
                                                 galaxy_spark.tables

Full operator-by-operator coverage map: COVERAGE.md.
"""

__version__ = "0.2.0"
