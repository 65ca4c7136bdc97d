"""Value pins for the r5 linear-time rewrites of the text operators
(language_id contains-probes, char_ngram_profile zip_with form,
rolling_fingerprint split-to-chars): each must be value-identical to
an independent Python reference of the ORIGINAL definition on real
fixture documents — the rewrites changed complexity, never values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from galaxy_spark.operators import text
from galaxy_spark.operators.text import LID_MARKERS
from galaxy_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _docs(spark, n=150):
    return load_table(spark, SF_SMOKE, "documents") \
        .select("doc_id", "text").limit(n)


def test_char_ngram_profile_matches_python_reference(spark):
    rows = _docs(spark).withColumn(
        "bg", text.char_ngram_profile(F.col("text"), 2)).collect()
    assert rows
    for r in rows:
        low = r.text.lower()
        want = list(dict.fromkeys(
            low[i:i + 2] for i in range(len(low) - 1)))
        assert r.bg == want, r.doc_id


def test_char_ngram_trigrams_and_short_strings(spark):
    df = spark.createDataFrame(
        [("abcd",), ("ab",), ("a",), ("",)], "text string")
    got = [r.g for r in df.select(
        text.char_ngram_profile(F.col("text"), 3).alias("g")).collect()]
    assert got == [["abc", "bcd"], [], [], []]


def test_language_id_matches_python_reference(spark):
    rows = _docs(spark, 300).withColumn(
        "pred", text.language_id(F.col("text"))).collect()
    assert rows
    for r in rows:
        low = r.text.lower()
        scores = {lang: sum(m in low for m in ms)
                  for lang, ms in LID_MARKERS.items()}
        best = max(scores.values())
        want = "und" if best == 0 else \
            next(lang for lang in LID_MARKERS if scores[lang] == best)
        assert r.pred == want, (r.doc_id, scores)


def test_rolling_fingerprint_matches_python_reference(spark):
    rows = _docs(spark).withColumn(
        "fp", text.rolling_fingerprint(F.col("text"))).collect()
    for r in rows:
        h = 0
        for ch in r.text:
            h = (h * 257 + ord(ch)) % 1_000_000_007
        assert r.fp == h, r.doc_id
    # empty text folds to 0 (the value the pre-r5 form and the SQL
    # oracle both produce)
    df = spark.createDataFrame([("",)], "text string")
    assert df.select(text.rolling_fingerprint(
        F.col("text")).alias("fp")).collect()[0].fp == 0


def test_word_ngrams_matches_python_reference(spark):
    import re
    rows = _docs(spark).withColumn(
        "g3", text.word_ngrams(F.col("text"), 3)).collect()
    assert rows
    for r in rows:
        toks = [t for t in re.split(r"\s+", r.text.strip()) if t]
        want = list(dict.fromkeys(
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)))
        assert r.g3 == want, r.doc_id


def test_chunk_windows_udtf_parity(spark):
    """Python UDTF (Spark 4 table-function surface) computing the
    sliding-window chunker row-by-row must emit exactly the rows of
    the built-in-expression query. The UDTF is the API-surface
    twin; the registered query stays on built-ins because per-row
    Python is the documented slow path."""
    from pyspark.sql.functions import udtf

    from galaxy_spark.queries.indexing import (_CHUNK_S, _CHUNK_W,
                                               text_chunk_windows)

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class Chunker:
        def eval(self, text: str):
            toks = text.strip().split()
            t = len(toks)
            overflow = max(t - _CHUNK_W, 0)
            n = 1 + overflow // _CHUNK_S + (1 if overflow % _CHUNK_S else 0)
            for i in range(n):
                lo = i * _CHUNK_S
                hi = min(lo + _CHUNK_W, t)
                yield i, " ".join(toks[lo:hi]), hi - lo

    spark.udtf.register("chunker", Chunker)
    sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf}/documents.parquet") \
        .createOrReplaceTempView("docs_udtf_src")
    got = {(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
           for r in spark.sql(
               "SELECT d.doc_id, c.* FROM docs_udtf_src d, "
               "LATERAL chunker(d.text) c").collect()}
    want = {(r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
            for r in text_chunk_windows(spark, sf).collect()}
    assert got == want and len(want) > 500


def test_chunk_windows_boundary_lengths(spark):
    """Chunk-count and slice arithmetic at the exact boundaries the
    corpus never hits: empty-ish, single-token, exactly one window
    (32), one over (33), exactly window+stride (56), and one over
    (57). Compared against a plain-Python reference of the
    documented semantics (short final chunk, min one chunk)."""
    from galaxy_spark.queries.indexing import _CHUNK_S, _CHUNK_W

    def expected(n_tokens):
        toks = [f"t{i}" for i in range(n_tokens)]
        overflow = max(n_tokens - _CHUNK_W, 0)
        n = 1 + overflow // _CHUNK_S + (1 if overflow % _CHUNK_S else 0)
        out = []
        for i in range(n):
            lo, hi = i * _CHUNK_S, min(i * _CHUNK_S + _CHUNK_W, n_tokens)
            out.append((i, " ".join(toks[lo:hi]), hi - lo))
        return out

    lengths = [0, 1, 2, 31, 32, 33, 55, 56, 57, 80, 81]
    rows = [(n, " ".join(f"t{i}" for i in range(n))) for n in lengths]
    # whitespace-only text must behave exactly like the empty doc:
    # one chunk, empty text, n_tokens=0 (doc_id -1 shares expected(0))
    rows.append((-1, "   \t  "))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from galaxy_spark.operators import text as text_ops
    got = {}
    for r in text_ops.chunk_windows(df, _CHUNK_W, _CHUNK_S).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_text, r.n_tokens))
    for n in lengths:
        assert sorted(got[n]) == expected(n), f"length {n}"
    assert sorted(got[-1]) == expected(0), "whitespace-only doc"


def test_bpe_encode_consistent_with_training_merges(spark):
    """encode(vocab) must be consistent with the training-side
    symbol stream: re-encoding every document in plain Python with
    the merge table that text_bpe_merge_steps REPORTS (independent
    greedy left-to-right implementation, no Spark fold involved)
    must reproduce text_bpe_encode's per-doc unit counts exactly.
    This pins train->apply end to end: a drift in either the merge
    selection or the fold semantics breaks the equality."""
    import re

    from galaxy_spark.registry import all_queries

    queries = all_queries()
    steps = queries["text_bpe_merge_steps"](spark, SF_SMOKE).collect()
    merges = [tuple(r.merged_pair.split(" ", 1))
              for r in sorted(steps, key=lambda r: r.step)]
    assert len(merges) == 3

    def n_units(word: str) -> int:
        if word == "":
            return 1          # engines: split('')=[''] -> one unit
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = {r.doc_id: (r.n_words, r.n_units)
           for r in queries["text_bpe_encode"](spark,
                                               SF_SMOKE).collect()}
    docs = (load_table(spark, SF_SMOKE, "documents")
            .select("doc_id", "text").collect())
    want = {}
    for r in docs:
        words = re.split(r"\s+", r.text.strip())
        want[r.doc_id] = (len(words),
                          sum(n_units(w) for w in words))
    assert got == want


def test_rolling_fingerprint_utf8_bytes_non_bmp(spark):
    """The fingerprint folds UTF-8 BYTES — identical on ASCII, and
    WELL-DEFINED on non-BMP text (the per-character contract walked
    UTF-16 code units in Spark but codepoints in the oracle; latent
    on ASCII corpora — r9 review). Truth here is a pure-Python byte
    fold, engine-independent."""
    from galaxy_spark.operators.text import rolling_fingerprint

    texts = ["hello", "", "café", "ab\U0001D11E",
             "\U0001F600\U0001F600 mixed ß text"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: r.fp for r in df.select(
        "doc_id", rolling_fingerprint("text").alias("fp")).collect()}

    def fold(s):
        h = 0
        for b in s.encode("utf-8"):
            h = (h * 257 + b) % 1_000_000_007
        return h

    assert got == {i: fold(t) for i, t in enumerate(texts)}


def test_bpe_symbolization_codepoint_true_non_bmp(spark):
    """BPE pair counting must walk CODEPOINTS: a non-BMP word like
    an emoji pair must produce whole-character pairs, not UTF-16
    surrogate halves (r9 review — same bug class as the fingerprint
    and entropy fixes). Truth is a pure-Python pair count."""
    from collections import Counter

    from pyspark.sql import functions as F

    from galaxy_spark.operators.text import codepoint_chars

    words = ["\U0001F600ab", "héllo", "xy"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    chars = codepoint_chars(F.col("word"))
    m = F.size(chars) - 1
    pairs = F.zip_with(F.slice(chars, 1, m), F.slice(chars, 2, m),
                       lambda a, b: F.concat(a, b))
    got = Counter(r.pair for r in
                  df.select(F.explode(pairs).alias("pair")).collect())
    want = Counter(w[i:i + 2] for w in words for i in range(len(w) - 1))
    assert got == want
    # and the empty/1-char guards
    one = spark.createDataFrame([("",), ("a",)], "word string")
    assert one.select(F.size(codepoint_chars(F.col("word")))
                      .alias("n")).collect()[0].n in (0, 1)
