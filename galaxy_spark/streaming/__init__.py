"""Structured Streaming assembly: CDC pipeline (source -> envelope
transforms -> keyed sink), windowing/watermark helpers, streaming
dedup. The batch twins of these transforms are oracle-checked in
galaxy_spark.queries; here the same column expressions run against
``readStream`` sources.
"""
