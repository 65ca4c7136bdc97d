"""Corpus-hygiene queries: eval-set decontamination, PII redaction,
cross-document duplicated-span detection, and temperature-weighted
mixture sampling.

These are the remaining first-class steps of a public LLM
training-data recipe (GPT-3 App. C / Gopher §A / PaLM §6 style)
not yet covered by ``queries/llm.py`` (per-document analysis) and
``queries/curation.py`` (corpus-level curation):

- **decontamination** — drop/flag training documents that share a
  long word n-gram with any document of the held-out eval split;
- **PII redaction** — scan-local regex scrubbing of emails / IPv4
  addresses / phone numbers;
- **duplicated spans** — the cross-document repeated-n-gram report
  that substring-level dedup (Lee et al., "Deduplicating Training
  Data Makes Language Models Better") builds its cut list from;
- **temperature sampling** — the alpha-weighted mixture rebalance
  (rate_i = (min_count/count_i)^(1-alpha)) interpolating between
  natural (alpha=1) and uniform (alpha=0) source mixtures.

Every query carries a full DuckDB value oracle (result-contract).
Tokenization and hash-Bernoulli conventions are shared with
``queries/llm.py`` / ``queries/curation.py`` so the oracle SQL
states the same algorithm the Spark plan runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from galaxy_spark.operators import text
from galaxy_spark.queries.llm import _TOKS
from galaxy_spark.registry import register
from galaxy_spark.tables import load_table


def _grams_sql(n: int) -> str:
    """Distinct word n-grams of ``tk`` — DuckDB twin of
    ``operators.text.word_ngrams`` (inclusive list slice:
    ``tk[i:i+n-1]`` is n elements)."""
    return (f"list_distinct(list_transform("
            f"range(1, greatest(len(tk)-{n - 1},0)+1), "
            f"i -> array_to_string(tk[i:i+{n - 1}], ' ')))")


# ------------------------------------------------------------------
# Eval-set n-gram decontamination
# ------------------------------------------------------------------

_DECON_N = 6          # overlap gram length (13 in GPT-3; 6 here so
                      # the 10-99-token synthetic docs can collide)
_EVAL_MOD = 20        # doc_id % 20 == 0 -> held-out eval split


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), g AS (
        SELECT doc_id, {_grams_sql(_DECON_N)} AS gs FROM t
    ), ev AS (
        SELECT DISTINCT unnest(gs) AS gram FROM g
        WHERE doc_id % {_EVAL_MOD} = 0
    ), tr AS (
        SELECT doc_id,
               unnest(CASE WHEN len(gs) = 0 THEN [NULL] ELSE gs END)
                   AS gram
        FROM g WHERE doc_id % {_EVAL_MOD} <> 0
    )
    SELECT tr.doc_id,
           CAST(COUNT(ev.gram) AS INTEGER) AS n_hit_ngrams,
           (COUNT(ev.gram) > 0) AS contaminated
    FROM tr LEFT JOIN ev ON tr.gram = ev.gram
    GROUP BY tr.doc_id
    """,
)
def decontaminate_ngram_overlap(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every TRAINING document that
    shares at least one {n}-word n-gram with the eval split
    (doc_id % {mod} == 0) — the GPT-3 Appendix-C / PaLM §6 overlap
    rule, with the gram length shortened to fit the corpus.

    Shape at scale: the eval split is small by definition, so its
    distinct gram set broadcasts; training grams are a scan-local
    explode, the broadcast hash join marks hits without shuffling a
    byte of corpus data, and the per-document hit count folds
    map-side (explode keeps a document's grams in one partition, so
    the doc_id-keyed exchange carries ONE row per document, not one
    per gram). No join-back pass: the count aggregates directly off
    the marked explode. ``explode_outer`` keeps gram-less (short)
    documents in the report as uncontaminated rows — the oracle
    mirrors with a NULL-injecting CASE.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = text.word_ngrams(F.col("text"), _DECON_N)
    ev = (docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
          .select(F.explode(grams).alias("gram"))
          .distinct()
          .withColumn("hit", F.lit(True)))
    return (docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
            .select("doc_id", F.explode_outer(grams).alias("gram"))
            .join(F.broadcast(ev), "gram", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.when(F.col("hit"), 1).otherwise(0))
                 .cast("int").alias("n_hit_ngrams"))
            .select("doc_id", "n_hit_ngrams",
                    (F.col("n_hit_ngrams") > 0).alias("contaminated")))


decontaminate_ngram_overlap.__doc__ = decontaminate_ngram_overlap.__doc__.format(
    n=_DECON_N, mod=_EVAL_MOD)


# ------------------------------------------------------------------
# PII redaction
# ------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): char classes, bounded repeats, \b.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# The synthetic corpus contains no digits or '@' at all (verified:
# zero regexp matches for \d across every sf), so the query injects
# deterministic PII per document — identically in the Spark plan and
# the oracle SQL — and then redacts it. The injection is the test
# harness; the OPERATOR is the count+redact column algebra, which
# tests/test_hygiene.py also pins on handwritten realistic rows.
_SYNTH_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com at 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 100 AS VARCHAR)"
    " || ' or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def pii_counts_and_redact(df: DataFrame, text_col: str = "text"):
    """(n_emails, n_ips, n_phones, redacted) columns for ``text_col``.

    Pure scan-local column algebra — regexp_count + chained
    regexp_replace, zero shuffles, whole-stage codegen'd. Email is
    replaced first so the IP pass can never bite a local-part digit
    run (and the redaction tokens themselves contain no digits).
    """
    c = F.col(text_col)
    counts = (F.regexp_count(c, F.lit(_EMAIL_RE)).cast("int"),
              F.regexp_count(c, F.lit(_IPV4_RE)).cast("int"),
              F.regexp_count(c, F.lit(_PHONE_RE)).cast("int"))
    red = F.regexp_replace(c, _EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, _IPV4_RE, "<IP>")
    red = F.regexp_replace(red, _PHONE_RE, "<PHONE>")
    return counts, red


@register(
    "pii_redact_documents",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, {_SYNTH_SQL} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IPV4_RE}')) AS INTEGER)
               AS n_ips,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER)
               AS n_phones,
           regexp_replace(
               regexp_replace(
                   regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_IPV4_RE}', '<IP>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM s
    """,
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact emails / IPv4s / phone numbers.

    See ``pii_counts_and_redact`` for the operator (scan-local,
    shuffle-free) and ``_SYNTH_SQL`` for why the corpus run injects
    synthetic PII first. Regex subset chosen for Java-regex / RE2
    semantic identity; DuckDB needs the explicit 'g' flag Spark
    implies.
    """
    docs = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
        F.lit(" or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    s = docs.select("doc_id", synth.alias("t"))
    (n_em, n_ip, n_ph), red = pii_counts_and_redact(s, "t")
    return s.select("doc_id",
                    n_em.alias("n_emails"), n_ip.alias("n_ips"),
                    n_ph.alias("n_phones"), red.alias("clean_text"))


# ------------------------------------------------------------------
# Cross-document duplicated n-gram spans
# ------------------------------------------------------------------

_SPAN_N = 8


@register(
    "dedup_ngram_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS tk FROM documents
    ), g AS (
        SELECT doc_id, unnest({_grams_sql(_SPAN_N)}) AS gram FROM t
    )
    SELECT gram, CAST(COUNT(*) AS INTEGER) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM g GROUP BY gram HAVING COUNT(*) >= 2
    """,
)
def dedup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span report: every {n}-word n-gram occurring in 2+
    documents, with its document count and lowest containing doc_id
    — the cut-list input of substring-level dedup (Lee et al. 2021),
    at n-gram rather than suffix-array granularity.

    Shape at scale: grams are distinct per document (scan-local),
    so the single gram-keyed aggregation counts documents directly;
    map-side partial aggregation absorbs heavy-hitter grams (a
    boilerplate span shared by millions of docs arrives at the
    reducer as one partial per map task, not one row per doc).
    HAVING >= 2 prunes the long unique tail before any sort or sink.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(text.word_ngrams(F.col("text"), _SPAN_N)).alias("gram"))
    return (g.groupBy("gram")
            .agg(F.count("*").cast("int").alias("n_docs"),
                 F.min("doc_id").alias("first_doc"))
            .filter(F.col("n_docs") >= 2))


dedup_ngram_spans.__doc__ = dedup_ngram_spans.__doc__.format(n=_SPAN_N)


# ------------------------------------------------------------------
# EXACT substring-dedup cut spans (Lee et al. 2022 shape)
# ------------------------------------------------------------------

_SUB_L = 32   # seed length (chars): spans >= L are found EXACTLY


@register(
    "dedup_substring_spans",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, CAST(off AS BIGINT) AS off,
               CAST(('0x' || substr(md5(substr(text,
                   CAST(off AS INTEGER), {_SUB_L})), 1, 15))
                   AS BIGINT) AS h
        FROM (SELECT doc_id, text,
                     unnest(range(1, greatest(
                         length(text) - {_SUB_L} + 2, 1))) AS off
              FROM documents)
    ), s AS (
        SELECT doc_id, off FROM (
            SELECT doc_id, off,
                   COUNT(*) OVER (PARTITION BY h) AS n_occ
            FROM g) WHERE n_occ >= 2
    ), brk AS (
        SELECT doc_id, off,
               CASE WHEN off > COALESCE(MAX(off + {_SUB_L} - 1) OVER (
                   PARTITION BY doc_id ORDER BY off
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   -1) THEN 1 ELSE 0 END AS new_island
        FROM s
    ), isl AS (
        SELECT doc_id, off,
               SUM(new_island) OVER (
                   PARTITION BY doc_id ORDER BY off) AS island
        FROM brk
    )
    SELECT doc_id,
           CAST(MIN(off) AS BIGINT) AS span_start,
           CAST(MAX(off) + {_SUB_L} - 1 AS BIGINT) AS span_end,
           CAST(MAX(off) + {_SUB_L} - MIN(off) AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_seeds
    FROM isl GROUP BY doc_id, island
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT substring-dedup cut spans (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    shape): every MAXIMAL character span of length >= {L} whose
    every {L}-char window recurs elsewhere in the corpus —
    upgrading ``dedup_ngram_spans`` (which reports duplicated GRAMS)
    to the actual per-document CUT LIST [span_start, span_end] a
    substring-level deduper removes.

    Method — fixed-length seeds instead of a suffix array, same
    answer for spans >= {L}: a duplicated region of length M >= {L}
    contains M-{L}+1 duplicated {L}-char windows at CONSECUTIVE
    offsets, so (1) emit every {L}-char window as a 60-bit seed key
    (md5-slice, == the oracle's '0x' cast) at (doc, off) — one row
    per character position, the linear-size leaf table a suffix
    array would also materialize; (2) keep positions whose seed key
    occurs >= 2 times corpus-wide (self-repeats within one doc
    count — they are cut targets too); (3) merge overlapping
    surviving seeds per document (gaps-and-islands over a running
    max-end window) into maximal spans. Exactness: every reported
    span is a real duplicated region boundary-for-boundary up to
    seed-key collisions — 2^-60/pair here (negligible through
    sf-scale corpora); a trillion-position corpus should widen the
    key to the full digest (the plan is unchanged; the shuffle
    doubles).

    Scale shape: the expensive per-char window hashing runs ONCE
    (the exploded seed frame is localCheckpointed — expensive +
    multiply-consumed, the repo's checkpoint rule); duplicate
    detection is a two-phase ``groupBy(h).count()`` whose partial
    aggregation absorbs hot seeds MAP-SIDE (one boilerplate
    license-header or whitespace seed with 10^8 occurrences
    contributes one partial row per map task, not 10^8 rows to one
    task — the COUNT-window variant it replaces shuffled every
    occurrence of a key into ONE window task, the textbook skewed-
    key full shuffle), followed by an h-keyed LEFT SEMI join back
    under AQE skew-join (session default), then the doc-keyed
    island merge (the window sort is per-doc, bounded by doc
    length; the final (doc, island) rollup reuses the doc_id
    partitioning — doc_id subsumes the clustering, no extra
    exchange). Seeds are 8-byte keys, not raw windows, so the
    shuffles are O(corpus chars) x 24 bytes regardless of {L}; no
    all-pairs, no crossJoin, no suffix sort across the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_pos = F.length("text") - _SUB_L + 1
    # Three measured plan decisions (sf0.1, local[32]):
    # (1) hash every window INSIDE a per-doc transform() BEFORE the
    #     explode — exploding positions first and hashing after
    #     carries the full document text on every position row
    #     through the generate (12.5 s -> 8.4 s);
    # (2) duplicate detection as two-phase groupBy(h).count() + semi
    #     join-back over a localCheckpointed seed frame — r8 used a
    #     COUNT window over h (measured faster when the scan reran:
    #     the un-persisted join-back variant recomputed every window
    #     hash, 8.4 -> 4.6 s), but a window over partitionBy(h)
    #     shuffles EVERY occurrence of a hot seed into one task —
    #     Spark cannot split a window partition, so one boilerplate
    #     seed pins a task at corpus scale. Checkpointing the seed
    #     frame removes the re-scan penalty the window was buying;
    #     partial agg absorbs hot keys map-side and AQE splits any
    #     skewed join partition (r9, the r8 verdict's one weak);
    # (3) 60-bit BIGINT seed keys (md5-slice conv, == the oracle's
    #     '0x' cast) instead of 32-char digests — the h exchange
    #     and sort move 8-byte keys, 4x less shuffle per position
    #     (4.6 -> 4.2 s here; the gap widens with corpus size).
    hashes = F.when(n_pos >= 1, F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda i: F.conv(F.substring(
            F.md5(F.substr(F.col("text"), i, F.lit(_SUB_L))),
            1, 15), 16, 10).cast("long")
    )).otherwise(F.array().cast("array<long>"))
    # Checkpoint the COMPACT per-doc hash arrays (8 B/char), not the
    # exploded (doc, off, h) frame (24 B/char): the md5 work runs
    # once, both consumers re-explode from storage (cheap column
    # work, no rehash). The repartition BEFORE the checkpoint does
    # double duty: it parallelizes the per-char hashing across the
    # cluster even when the input arrives in few partitions (one
    # small parquet file here; at corpus scale the exchange moves
    # raw text once, O(corpus bytes)) and gives the checkpointed
    # RDD — whose partitioning every downstream stage inherits — a
    # cluster-wide layout instead of the scan's. The partition
    # count is EXPLICIT (defaultParallelism): AQE coalesces a
    # column-only repartition by the tiny PRE-hash bytes and would
    # serialize the hashing — the x24 post-explode expansion is
    # invisible to it.
    hashed = (docs.repartition(
                  spark.sparkContext.defaultParallelism, "doc_id")
              .select("doc_id", hashes.alias("hs"))
              .localCheckpoint(eager=False))
    g = (hashed.select("doc_id", F.posexplode("hs").alias("p0", "h"))
         .select("doc_id", (F.col("p0") + 1).cast("long").alias("off"),
                 "h"))
    dup = (g.groupBy("h").agg(F.count("*").alias("n_occ"))
           .filter(F.col("n_occ") >= 2).select("h"))
    s = g.join(dup, "h", "left_semi").select("doc_id", "off")

    w = Window.partitionBy("doc_id").orderBy("off")
    prev_end = F.max(F.col("off") + _SUB_L - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = s.withColumn(
        "new_island",
        F.when(F.col("off") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0))
    isl = brk.withColumn("island", F.sum("new_island").over(w))
    return (isl.groupBy("doc_id", "island")
            .agg(F.min("off").alias("span_start"),
                 (F.max("off") + _SUB_L - 1).alias("span_end"),
                 (F.max("off") + _SUB_L - F.min("off"))
                 .alias("span_len"),
                 F.count("*").alias("n_seeds"))
            .drop("island"))


dedup_substring_spans.__doc__ = dedup_substring_spans.__doc__.format(
    L=_SUB_L)


# ------------------------------------------------------------------
# Temperature-weighted mixture sampling
# ------------------------------------------------------------------

_ALPHA = 0.3          # mixture temperature (multilingual-sampling
                      # convention: alpha=1 natural, alpha=0 uniform)


@register(
    "mixture_temperature_sampling",
    oracle=f"""
    WITH c AS (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
    ), mm AS (
        SELECT MIN(cnt) AS m FROM c
    ), r AS (
        SELECT lang,
               CASE WHEN cnt = m THEN 'g'
                    ELSE printf('%08x',
                         CAST(floor(pow(m * 1.0 / cnt, {1 - _ALPHA})
                                    * 4294967296.0) AS BIGINT)) END
                   AS thr
        FROM c, mm
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN r ON d.lang = r.lang
    WHERE substring(md5('temp42:' || d.doc_id), 1, 8) < r.thr
    """,
)
def mixture_temperature_sampling(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture over LANGUAGE strata: keep
    language i at rate (min_count / count_i)^(1-alpha) — alpha=1
    keeps the natural mixture, alpha=0 is the uniform rebalance of
    ``mixture_resample_balanced``, alpha={a} interpolates: the
    low-resource upweighting rule of the multilingual-training
    literature (language, not source, is the stratum that rule is
    defined over — and the corpus's sources are uniform by
    construction, so a source-keyed rebalance would be a no-op).
    Same layout-independent md5 Bernoulli and in-plan threshold
    computation as the balanced variant: one count agg, one
    broadcast, one scan-local filter — no corpus shuffle.

    Cross-engine determinism: the only float op is one pow per
    STRATUM (not per row); tests/test_hygiene.py pins that every
    per-language threshold sits far from an integer boundary of the
    floor(rate * 2^32) quantization, so a last-ulp pow difference
    between the JVM and C runtimes cannot flip any threshold.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    # scalar min via an empty-partition window over the |langs|-row
    # frame, NOT counts.agg + crossJoin: the crossJoin form plans
    # the counts subtree under BOTH consumers and re-scans the
    # corpus (the re-planning trap mixture_resample_balanced
    # documents and avoids the same way — r9 review)
    m = F.min("cnt").over(Window.partitionBy())
    thr = F.when(
        F.col("cnt") == m, F.lit("g")
    ).otherwise(F.format_string(
        "%08x",
        F.floor(F.pow(m * F.lit(1.0) / F.col("cnt"),
                      F.lit(1 - _ALPHA))
                * F.lit(4294967296.0)).cast("long")))
    rates = counts.select("lang", thr.alias("thr"))
    h = F.substring(
        F.md5(F.concat_ws(":", F.lit("temp42"),
                          F.col("doc_id").cast("string"))), 1, 8)
    return (docs.join(F.broadcast(rates), "lang")
            .filter(h < F.col("thr"))
            .select("doc_id", "lang"))


# ------------------------------------------------------------------
# Column profiling (ANALYZE-style corpus stats)
# ------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _profile_union_sql() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
    SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
           COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str
    FROM documents""")
    return " UNION ALL ".join(parts)


@register("profile_columns_documents", oracle=_profile_union_sql())
def profile_columns_documents(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile: per column, row/null/distinct
    counts and min/max (rendered as strings so one report schema
    covers every column type) — the stats pass a pipeline runs
    before choosing dedup keys, partition columns, or mixture
    strata.

    Spark shape: ONE corpus pass computes every measure (the oracle
    unions 5 single-column scans instead — DuckDB re-scans, Spark
    doesn't); the multi-column exact COUNT(DISTINCT) plans as one
    Expand (xN rows on the agg, still map-side partial), and the
    final stack() unpivot is driver-trivial on the 1-row aggregate.
    At 100 TB swap exact distinct for approx_count_distinct — the
    Expand multiplier is the one piece of this plan that grows with
    column count; the swap is a one-line change per measure and the
    report contract (string-rendered values) doesn't move.
    COUNT(CASE) keeps every count BIGINT in both engines (the r4
    HUGEINT convention).
    """
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__dist, {c}__min, {c}__max"
        for c in _PROFILE_COLS)
    return row.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_str, max_str)")


# ------------------------------------------------------------------
# Embedding storage quantization (int8)
# ------------------------------------------------------------------

@register(
    "embeddings_quantize_int8",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), m AS (
        SELECT vec_id, vec,
               greatest(list_max(list_transform(vec, x -> abs(x))),
                        1e-12) / 127.0 AS scale
        FROM v
    )
    SELECT vec_id, scale,
           list_transform(vec,
               x -> CAST(floor(x / scale + 0.5) AS INTEGER)) AS qvec,
           ROUND(list_sum(list_transform(range(1, 65),
               i -> abs(vec[i] - CAST(floor(vec[i] / scale + 0.5)
                                      AS INTEGER) * scale))) / 64.0, 6)
               AS mean_abs_err
    FROM m
    """,
)
def embeddings_quantize_int8(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4x
    storage/bandwidth compression step ANN indexes and training
    loaders apply before shipping vectors. Per vector:
    scale = max|x|/127, q_i = floor(x_i/scale + 0.5) (explicit
    floor-based rounding: identical semantics in the JVM and C, no
    banker's-rounding divergence), plus the mean absolute
    reconstruction error, bounded by scale/2 per element
    (pinned in tests/test_hygiene.py).

    Scan-local column algebra, zero shuffles. ``scale`` is
    materialized as a COLUMN before the per-element lambdas capture
    it — capturing the max-abs EXPRESSION would re-evaluate it per
    element in interpreted higher-order functions (the
    captured-lambda trap, SCALE.md).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    base = (emb.select(
        "vec_id", v.alias("vec"),
        (F.greatest(mx, F.lit(1e-12)) / F.lit(127.0)).alias("scale")))
    s = F.col("scale")
    q = F.transform("vec", lambda x: F.floor(x / s + F.lit(0.5)).cast("int"))
    with_q = base.select("vec_id", "vec", "scale", q.alias("qvec"))
    err_terms = F.zip_with(
        "vec", "qvec", lambda x, qq: F.abs(x - qq.cast("double") * s))
    mean_err = (F.aggregate(err_terms, F.lit(0.0), lambda a, x: a + x)
                / F.lit(64.0))
    return with_q.select(
        "vec_id", "scale", "qvec",
        F.round(mean_err, 6).alias("mean_abs_err"))


_WSAMPLE_K = 100


@register(
    "sample_weighted_no_replacement",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ROUND(ln((CAST('0x' || substring(md5('wsamp42:' ||
                             CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
                         + 0.5) / 281474976710656.0)
                     / n_chars, 12) AS es_key
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, es_key FROM keyed
    ORDER BY es_key DESC, doc_id LIMIT {_WSAMPLE_K}
    """,
)
def sample_weighted_no_replacement(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    2006): each row gets key ln(u)/w (the log form of u^(1/w)) for
    a deterministic hash-uniform u and weight w = n_chars; the k
    largest keys ARE a weighted sample without replacement — the
    one-pass, merge-friendly formulation (per-partition top-k, no
    per-draw sequential state), which is why it is THE distributed
    weighted sampler. Here it draws a length-biased corpus sample,
    the "prefer longer documents" mixture knob.

    Cross-engine float determinism, per the SCALE.md rules: u =
    (hash48 + 0.5) / 2^48 is EXACTLY the same double in both
    engines (49-bit integer + power-of-two scale, both within the
    53-bit mantissa); ln is the only libm call (<= 1 ulp spread)
    and the key is ROUND(_, 12)-quantized — a measured double's
    expansion never terminates at a rounding boundary, so a last-
    ulp ln difference cannot flip the quantized key; rounded-key
    ties break on doc_id. Spark's global ORDER BY+LIMIT plans as
    TakeOrderedAndProject — parallel partial top-k, no single
    reducer.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0)
    h48 = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit("wsamp42"),
                          F.col("doc_id").cast("string"))), 1, 12),
        16, 10).cast("long")
    u = (h48 + F.lit(0.5)) / F.lit(281474976710656.0)
    key = F.round(F.log(u) / F.col("n_chars"), 12)
    return (docs.select("doc_id", "n_chars", key.alias("es_key"))
            .orderBy(F.desc("es_key"), "doc_id")
            .limit(_WSAMPLE_K))


@register(
    "quality_mad_outliers",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
        FROM events
    ), hist AS (
        SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) AS c
        FROM v GROUP BY 1, 2
    ), n_per AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
        FROM hist GROUP BY 1
    ), cum AS (
        SELECT event_type, vc, c,
               CAST(SUM(c) OVER (PARTITION BY event_type
                                 ORDER BY vc) AS BIGINT) AS cum
        FROM hist
    ), med AS (
        SELECT cum.event_type, CAST(MIN(vc) AS BIGINT) AS median_cents
        FROM cum JOIN n_per ON cum.event_type = n_per.event_type
        WHERE cum.cum >= (n_per.n + 1) // 2
        GROUP BY 1
    ), dev AS (
        SELECT v.event_type, ABS(v.vc - med.median_cents) AS dv
        FROM v JOIN med ON v.event_type = med.event_type
    ), dhist AS (
        SELECT event_type, dv, CAST(COUNT(*) AS BIGINT) AS c
        FROM dev GROUP BY 1, 2
    ), dcum AS (
        SELECT event_type, dv, c,
               CAST(SUM(c) OVER (PARTITION BY event_type
                                 ORDER BY dv) AS BIGINT) AS cum
        FROM dhist
    ), mad AS (
        SELECT dcum.event_type, CAST(MIN(dv) AS BIGINT) AS mad_cents
        FROM dcum JOIN n_per ON dcum.event_type = n_per.event_type
        WHERE dcum.cum >= (n_per.n + 1) // 2
        GROUP BY 1
    )
    SELECT n_per.event_type, n_per.n,
           med.median_cents, mad.mad_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dev
            WHERE dev.event_type = n_per.event_type
              AND dev.dv > 5 * mad.mad_cents) AS n_outliers
    FROM n_per
    JOIN med ON n_per.event_type = med.event_type
    JOIN mad ON n_per.event_type = mad.event_type
    """,
)
def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median and MAD (median
    absolute deviation) of event values per event_type, plus the
    count of points beyond 5 MADs — the estimator data-quality
    monitors use where mean/stddev would be dragged by the very
    outliers they hunt (50% breakdown point vs 0%).

    The scalable exact-selection pattern (NOT a per-group window
    sort, which is the repo's documented skew hazard): quantize to
    int64 cents, build a per-group DISTINCT-VALUE histogram (one
    partial-aggregated exchange — heavy groups collapse to their
    value cardinality map-side), then take the k-th order statistic
    as MIN(value) where the running count crosses ceil(n/2); the
    running sum's window orders only the distinct-value rows, not
    the data. The MAD repeats the same two steps on |x - median|.
    Everything is integer arithmetic — no float anywhere — so both
    engines agree exactly; the lower median keeps even-sized groups
    integral. At 100 TB with unbounded value cardinality, the
    histogram step swaps for the mergeable fixed-bin sketch
    (agg_histogram_quantile_value_bound) at the cost of bin-width
    error; this exact form is also its certification instrument.
    """
    ev = load_table(spark, sf_dir, "events")
    # every frame below feeds 2-3 downstream subtrees, and the
    # re-evaluations COMPOUND down the med -> dev -> mad chain —
    # un-barriered, the final plan held EIGHTEEN scans of the raw
    # events parquet with zero ReusedExchange (the r14 barrier
    # audit's worst case). Each reused frame checkpoints: the two
    # O(rows) frames (v, dev) carry two ints/row; hist is
    # value-cardinality; med/mad are |types| rows.
    v = (ev.select("event_type",
                   F.round(F.col("value") * 100, 0).cast("long")
                   .alias("vc"))
         .localCheckpoint(eager=False))

    def _kth_smallest(vals: DataFrame, col: str, out: str) -> DataFrame:
        """MIN(col) where the per-group running count crosses
        ceil(n/2), off a distinct-value histogram."""
        hist = (vals.groupBy("event_type", col).agg(
            F.count("*").alias("c"))
            .localCheckpoint(eager=False))   # cum-window + n_per
        w = (Window.partitionBy("event_type").orderBy(col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        n_per = hist.groupBy("event_type").agg(F.sum("c").alias("n"))
        return (hist.withColumn("cum", F.sum("c").over(w))
                .join(F.broadcast(n_per), "event_type")
                .filter(F.col("cum") >= F.floor((F.col("n") + 1) / 2))
                .groupBy("event_type")
                .agg(F.min(col).alias(out))
                .localCheckpoint(eager=False))   # joined 2-3x

    med = _kth_smallest(v, "vc", "median_cents")
    dev = (v.join(F.broadcast(med), "event_type")
           .select("event_type",
                   F.abs(F.col("vc") - F.col("median_cents")).alias("dv"))
           .localCheckpoint(eager=False))
    mad = _kth_smallest(dev, "dv", "mad_cents")
    n_per = v.groupBy("event_type").agg(F.count("*").alias("n"))
    out = (dev.join(F.broadcast(mad), "event_type")
           .groupBy("event_type")
           .agg(F.sum(F.when(F.col("dv") > 5 * F.col("mad_cents"), 1)
                      .otherwise(0)).alias("n_outliers")))
    return (n_per.join(F.broadcast(med), "event_type")
            .join(F.broadcast(mad), "event_type")
            .join(F.broadcast(out), "event_type")
            .select("event_type", "n", "median_cents", "mad_cents",
                    "n_outliers"))
