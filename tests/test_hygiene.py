"""Semantic unit tests for the corpus-hygiene surface
(queries/hygiene.py). The sf0.001 oracle equivalence runs in
tests/test_oracle.py like every other registered query; these tests
pin the SEMANTICS on handwritten rows — contamination logic on known
overlaps, PII redaction on realistic strings (the corpus run injects
synthetic PII because the testdata contains none), threshold-margin
guards for the cross-engine float pow."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import functions as F

from galaxy_spark.queries.hygiene import (_ALPHA, _DECON_N, _EVAL_MOD,
                                          pii_counts_and_redact)
from galaxy_spark.registry import all_queries

SF_DRIVER = "/root/testdata/sf0.01"
SF_ORACLE = "/root/testdata/sf0.001"


def test_pii_redaction_on_realistic_rows(spark):
    rows = [
        (1, "reach me at jane.doe+spam@corp.example.org today"),
        (2, "server 192.168.0.1 and 10.0.255.7 rebooted"),
        (3, "call 555-867-5309 or 555-000-1234 x2"),
        (4, "mixed: bob@x.io on 172.16.0.9 dial 800-555-0199"),
        (5, "nothing sensitive here 1234-56"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    (n_em, n_ip, n_ph), red = pii_counts_and_redact(df)
    out = {r.doc_id: r for r in df.select(
        "doc_id", n_em.alias("e"), n_ip.alias("i"), n_ph.alias("p"),
        red.alias("t")).collect()}
    assert (out[1].e, out[1].i, out[1].p) == (1, 0, 0)
    assert out[1].t == "reach me at <EMAIL> today"
    assert (out[2].e, out[2].i, out[2].p) == (0, 2, 0)
    assert out[2].t == "server <IP> and <IP> rebooted"
    assert (out[3].e, out[3].i, out[3].p) == (0, 0, 2)
    assert out[3].t == "call <PHONE> or <PHONE> x2"
    assert (out[4].e, out[4].i, out[4].p) == (1, 1, 1)
    assert out[4].t == "mixed: <EMAIL> on <IP> dial <PHONE>"
    assert (out[5].e, out[5].i, out[5].p) == (0, 0, 0)
    assert out[5].t == rows[4][1]


def test_decontamination_flags_known_overlap(spark):
    """doc 20 is eval (20 % 20 == 0); doc 21 repeats six of its
    words in order (one shared 6-gram); doc 22 shares words but
    never six consecutively; doc 23 is too short for any 6-gram."""
    ev = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (20, ev),
        (21, "prefix alpha beta gamma delta epsilon zeta suffix"),
        (22, "alpha beta gamma X delta epsilon zeta eta"),
        (23, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    from galaxy_spark.operators import text as T
    grams = T.word_ngrams(F.col("text"), _DECON_N)
    evg = (docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
           .select(F.explode(grams).alias("gram")).distinct()
           .withColumn("hit", F.lit(True)))
    out = {r.doc_id: r for r in
           (docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
            .select("doc_id", F.explode_outer(grams).alias("gram"))
            .join(F.broadcast(evg), "gram", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.when(F.col("hit"), 1).otherwise(0))
                 .cast("int").alias("n"))).collect()}
    assert out[21].n == 1
    assert out[22].n == 0
    assert out[23].n == 0          # kept in the report, uncontaminated


def test_decontamination_reports_every_train_doc(spark):
    q = all_queries()["decontaminate_ngram_overlap"]
    rows = q(spark, SF_ORACLE).collect()
    import duckdb as d
    n_train = d.sql(
        f"SELECT COUNT(*) FROM '{SF_ORACLE}/documents.parquet' "
        f"WHERE doc_id % {_EVAL_MOD} <> 0").fetchone()[0]
    assert len(rows) == n_train
    assert any(r.contaminated for r in rows)   # non-degenerate corpus


def test_temperature_thresholds_far_from_quantization_boundary():
    """The query's only cross-engine float op: floor(pow(m/cnt,
    1-alpha) * 2^32), once per language stratum. Java Math.pow and C
    std::pow agree to <=1 ulp; assert every stratum's product sits
    >= 1000 ulp-equivalents (1e-4 abs) from the floor boundary at
    BOTH check scales, so no last-ulp divergence can flip a
    threshold."""
    for sf in (SF_ORACLE, SF_DRIVER):
        cnts = [c for (c,) in duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf}/documents.parquet' "
            f"GROUP BY lang").fetchall()]
        m = min(cnts)
        for c in cnts:
            if c == m:
                continue
            x = math.pow(m / c, 1 - _ALPHA) * 4294967296.0
            frac = x - math.floor(x)
            assert 1e-4 < frac < 1 - 1e-4, (sf, c, x)


def test_temperature_rates_monotone_and_interpolating(spark):
    """Bigger strata keep a smaller fraction; every stratum keeps at
    least the uniform (alpha=0) rate and at most everything."""
    q = all_queries()["mixture_temperature_sampling"]
    kept = q(spark, SF_DRIVER).groupBy("lang").count().collect()
    tot = {l: c for (l, c) in duckdb.sql(
        f"SELECT lang, COUNT(*) FROM '{SF_DRIVER}/documents.parquet' "
        f"GROUP BY lang").fetchall()}
    m = min(tot.values())
    frac = {r.lang: r["count"] / tot[r.lang] for r in kept}
    # smallest stratum kept whole
    small = min(tot, key=tot.get)
    assert frac[small] == 1.0
    # monotone: larger stratum -> smaller kept fraction (within
    # Bernoulli noise; compare expected rates instead of samples)
    for lang, c in tot.items():
        rate = (m / c) ** (1 - _ALPHA)
        assert m / c <= rate <= 1.0
        # sampled fraction within 0.15 of the target rate
        assert abs(frac.get(lang, 0.0) - rate) < 0.15, (lang, frac, rate)


def test_ngram_spans_match_duplicate_structure(spark):
    """Every reported span really occurs in n_docs distinct docs
    (cross-checked in DuckDB), and exact-duplicate documents force
    shared spans."""
    q = all_queries()["dedup_ngram_spans"]
    rows = q(spark, SF_ORACLE).collect()
    assert rows
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_ORACLE}/documents.parquet'")
    # spot-check 5 spans
    for r in rows[:5]:
        n = con.sql(
            "SELECT COUNT(*) FROM documents WHERE "
            "contains(' ' || regexp_replace(trim(text), '\\s+', ' ', 'g')"
            " || ' ', ' ' || ? || ' ')",
            params=[r.gram]).fetchone()[0]
        assert n == r.n_docs, (r.gram, n, r.n_docs)
    con.close()


def test_int8_quantization_bounds_and_reconstruction(spark):
    """Every quantized component is in [-127, 127], reconstruction
    error per element stays under scale/2, and the reported mean
    error agrees with a numpy recomputation."""
    import numpy as np

    rows = all_queries()["embeddings_quantize_int8"](
        spark, SF_ORACLE).collect()
    emb = {r.vec_id: r.embedding for r in
           spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()}
    assert rows
    for r in rows[:50]:
        q = np.array(r.qvec)
        assert q.min() >= -127 and q.max() <= 127
        x = np.array(emb[r.vec_id], dtype=np.float64)
        recon = q * r.scale
        assert np.max(np.abs(x - recon)) <= r.scale / 2 + 1e-12
        assert abs(np.mean(np.abs(x - recon)) - r.mean_abs_err) < 1e-6


def test_weighted_sample_is_length_biased_and_plans_topk(spark):
    """Efraimidis-Spirakis with w = n_chars must (a) bias toward
    longer documents — sample mean length clearly above the corpus
    mean — while (b) still giving short docs nonzero probability,
    and (c) plan the global top-k as TakeOrderedAndProject (parallel
    partial top-k), not a single-reducer global sort."""
    from galaxy_spark.queries.hygiene import sample_weighted_no_replacement
    from galaxy_spark.tables import load_table

    sf = "/root/testdata/sf0.01"
    df = sample_weighted_no_replacement(spark, sf)
    sample = df.collect()
    corpus_mean = load_table(spark, sf, "documents") \
        .agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean * 1.15, (sample_mean, corpus_mean)
    assert len(sample) == 100
    assert len({r.doc_id for r in sample}) == 100  # without replacement

    from galaxy_spark.plans import physical_plan
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_mad_outliers_matches_numpy_reference(spark):
    """The distinct-value-histogram order-statistic selection must
    land on exactly numpy's lower median (and the MAD built from
    it) — pinning the selection algebra independently of the DuckDB
    oracle, which shares the formulation."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from galaxy_spark.registry import all_queries
    from galaxy_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["quality_mad_outliers"](spark, sf).collect()
    assert len(rows) >= 3

    ev = (load_table(spark, sf, "events")
          .select("event_type",
                  F.round(F.col("value") * 100, 0).cast("long").alias("vc"))
          .collect())
    for r in rows:
        x = np.sort([t.vc for t in ev if t.event_type == r.event_type])
        k = math.floor((len(x) + 1) / 2)
        med = int(x[k - 1])                      # lower median
        assert r.median_cents == med
        d = np.sort(np.abs(x - med))
        assert r.mad_cents == int(d[k - 1])
        assert r.n_outliers == int((d > 5 * r.mad_cents).sum())


def test_char_entropy_codepoint_parity_on_non_bmp_text(spark,
                                                       tmp_path):
    """The entropy scan must count Unicode CODEPOINTS, not UTF-16
    code units: an emoji is one character in both engines (the r8
    review caught F.split(text, '') walking surrogate halves —
    latent on the ASCII sf corpora, wrong on real text)."""
    import os

    import duckdb

    from galaxy_spark.registry import all_oracles, all_queries
    from tests.oracle_harness import compare

    rows = [(1, "ab\U0001F600\U0001F600cd"), (2, "aaaa"), (3, "")]
    d = str(tmp_path / "unicode")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{d}/documents.parquet/*.parquet'")
    got = all_queries()["quality_char_entropy"](spark, d)
    probs = compare(got, con, all_oracles()["quality_char_entropy"])
    assert not probs, probs
    by = {r.doc_id: r for r in got.collect()}
    assert by[1].n_chars == 6 and by[1].n_distinct == 5
    assert by[2].entropy_nats == 0.0
    assert 3 not in by              # empty doc drops out
