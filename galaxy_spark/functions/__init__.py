"""galaxy_spark.functions — the engine's public column-function
surface, mirroring the ``pyspark.sql.functions`` import style:

    from galaxy_spark import functions as GF
    docs.select(GF.token_count("text"), GF.bpe_token_count("text"))

Everything here is a pure ``Column`` expression (JVM-side,
whole-stage-codegen'd) — no Python UDFs. Functions needing a
DataFrame (LSH pipelines, mapInPandas media stages) live in
``galaxy_spark.operators`` instead.
"""

from __future__ import annotations

from galaxy_spark.operators.dedup import hamming64, minhash_signature, simhash64
from galaxy_spark.operators.similarity import (
    cosine,
    hyperplane_signature,
)
from galaxy_spark.operators.text import (
    BPE_TOKEN_RE,
    STOPWORDS,
    bpe_token_count,
    char_ngram_profile,
    language_id,
    punct_count,
    quality_score,
    rolling_fingerprint,
    stopword_count,
    token_count,
    tokens,
    word_ngrams,
)

__all__ = [
    "BPE_TOKEN_RE",
    "STOPWORDS",
    "bpe_token_count",
    "char_ngram_profile",
    "cosine",
    "hamming64",
    "hyperplane_signature",
    "language_id",
    "minhash_signature",
    "punct_count",
    "quality_score",
    "rolling_fingerprint",
    "simhash64",
    "stopword_count",
    "token_count",
    "tokens",
    "word_ngrams",
]
