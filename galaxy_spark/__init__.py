"""galaxy_spark — a PySpark-native analytics/CDC engine.

A from-scratch re-expression of the capabilities of the reference
engine dollarkillerx/galaxy (a MySQL CDC stream processor; see
SURVEY.md) on idiomatic Spark primitives:

- CDC envelope + filters + projections  -> galaxy_spark.cdc
- Streaming assembly (source->sink)     -> galaxy_spark.streaming
- Control plane (task lifecycle)        -> galaxy_spark.control
- Relational query surface              -> galaxy_spark.operators.relational
- LLM-data-pipeline operators           -> galaxy_spark.operators.{dedup,similarity,text,multimodal}
- Session / table IO helpers            -> galaxy_spark.session, galaxy_spark.tables
"""

__version__ = "0.1.0"
