"""Text-analysis operators over a document corpus.

All pure column algebra (split/regexp/aggregate) — JVM-side, no
Python UDFs in the hot path, so they whole-stage-codegen and scale
linearly with input splits. Designed for a ``documents``-shaped
table (``doc_id, text, lang, source, n_chars``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: small multilingual stopword set used by the quality score and the
#: n-gram language-ID heuristic (deterministic, no external models)
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

TOKEN_SPLIT_RE = r"\s+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(F.trim(text), TOKEN_SPLIT_RE)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column | str) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def punct_count(text: Column | str) -> Column:
    """Number of punctuation chars (regexp-count, codegen'd)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.length(col) - F.length(F.regexp_replace(col, r"[\.,;:!\?'\"]", ""))


def quality_score(text: Column | str) -> Column:
    """Heuristic quality, ~[0,1]: length + stopword presence −
    punctuation excess. Mirrors the shape of C4/Gopher-style filters
    (public recipe), not any proprietary scorer. The punctuation
    penalty is unclamped, so punctuation-dominated text scores
    BELOW zero (down to −1 for all-punctuation) — deliberately kept
    (more negative = worse, and the certified oracles mirror the
    exact expression); treat the range as (−1, 1], not [0, 1].
    """
    n_tok = token_count(text).cast("double")
    col = F.col(text) if isinstance(text, str) else text
    stop_ratio = stopword_count(text) / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(text) / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * length_term + F.lit(0.5) * F.least(stop_ratio * 5, F.lit(1.0))
        - punct_ratio, 4)


def word_ngrams(text: Column | str, n: int) -> Column:
    """Distinct word n-grams ('shingles') -> array<string>.

    Zips ``n`` shifted views of the token array (arguments evaluate
    once per row). The index-transform form captured ``toks`` in its
    lambda — captured expressions re-evaluate per ELEMENT in
    interpreted higher-order functions, so every n-gram re-ran the
    regex tokenizer: O(n_tokens·len) per document (the language_id
    trap, r5)."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, 1 + j, m),
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(grams)


def char_ngram_profile(text: Column | str, n: int = 2) -> Column:
    """Distinct character n-grams of the lowercased text.

    Built by zipping ``n`` shifted views of the split-to-chars
    array: every array argument evaluates ONCE per row. The r1-r4
    form (``transform(sequence, i -> substring(low, i, n))``)
    captured ``low`` inside the lambda, and captured expressions
    re-evaluate per ELEMENT in interpreted higher-order functions —
    O(len²) per document (the same trap that made language_id 156 s
    at sf0.1 before it dropped profiles entirely)."""
    col = F.col(text) if isinstance(text, str) else text
    chars = F.filter(F.split(F.lower(col), ""), lambda c: c != "")
    m = F.greatest(F.size(chars) - (n - 1), F.lit(0))
    grams = F.slice(chars, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(chars, 1 + j, m),
                           lambda a, b: F.concat(a, b))
    return F.array_distinct(grams)


def rolling_fingerprint(text: Column | str, base: int = 257,
                        mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash of the whole text -> bigint.

    Deterministic document fingerprint: h = fold(h*base + byte) mod p
    over the text's UTF-8 BYTES (fully JVM-side via ``F.aggregate``).
    Same construction as public Rabin-Karp fingerprinting. ``mod``
    must satisfy mod*base + 255 < 2^63 (no int64 overflow).

    Why bytes, not characters (r9 review): the O(n) per-char walk
    (``split(text, '')``) is a UTF-16 code-unit walk in Spark —
    non-BMP characters split into surrogate halves, the exact bug
    class the r8 review fixed in quality_char_entropy — while the
    codepoint-exact ``substr(i, 1)`` walk is O(len^2) per document
    (each substr re-scans the UTF-8 bytes; measured 1.8 s vs 0.5 s
    at sf0.1). Folding UTF-8 bytes gets BOTH: one O(n) pass over
    the hex expansion (ASCII-safe by construction — no surrogate
    semantics anywhere), identical values on ASCII corpora, and an
    oracle any engine reproduces from hex(encode(text)). The hex
    pair split uses Java regex's ``\\G`` anchor (fixed-width
    2-char groups in one pass)."""
    col = F.col(text) if isinstance(text, str) else text
    hx = F.hex(F.encode(col, "UTF-8"))
    pairs = F.filter(F.split(hx, r"(?<=\G..)"), lambda c: c != "")
    codes = F.transform(pairs,
                        lambda c: F.conv(c, 16, 10).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + c) % F.lit(mod),
    )


#: per-language marker bigrams (public n-gram-LID recipe à la
#: Cavnar-Trenkle, shrunk to a fixed marker table); dict order IS
#: the tie-break precedence (first language wins)
LID_MARKERS = {
    "en": ("th", "he", "in", "er", "an"),
    "es": ("de", "la", "os", "el", "en"),
    "de": ("en", "er", "ch", "de", "ei"),
    "fr": ("le", "de", "es", "en", "on"),
    "zh": ("zh", "ng", "sh", "ia", "ua"),
}


def language_id(text: Column | str) -> Column:
    """Tiny deterministic n-gram language-ID heuristic: the
    best-scoring language code, or 'und' when no marker matches.

    A language's score — |distinct-bigram-profile ∩ markers| — is
    identically "how many of its marker bigrams occur ANYWHERE in
    the lowercased text" (the profile is distinct, the marker set is
    distinct), so it evaluates as 5 linear ``contains`` probes
    instead of materializing the bigram profile. The r1-r4 version
    built ``array_distinct(transform(sequence(...), substring))``
    and referenced it 5× — higher-order functions run interpreted
    with NO subexpression elimination, and each element re-evaluated
    ``lower(text)``, making the plan O(5·len²) per document: 156 s
    exec at sf0.1 (caught by the r5 full-surface bench), ~0.2 s as
    contains probes. Tie-break (first language in LID_MARKERS order)
    and every score are value-identical; the driver oracle — which
    materializes the profile per row in a CTE, where that IS linear
    — is unchanged.
    """
    col = F.col(text) if isinstance(text, str) else text
    low = F.lower(col)

    def score(ms: tuple) -> Column:
        s = None
        for m in ms:
            hit = F.contains(low, F.lit(m)).cast("int")
            s = hit if s is None else s + hit
        return s

    scores = {lang: score(ms) for lang, ms in LID_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.when(best == 0, F.lit("und"))
    for lang, s in scores.items():
        out = out.when(s == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


#: GPT-2-style pre-tokenizer regex (contractions | words | numbers |
#: punctuation runs | whitespace), restricted to ASCII classes so
#: Java-regex (Spark) and RE2 (DuckDB) agree on its semantics
BPE_TOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token count: GPT-2 pre-tokenizer segments counted
    entirely JVM-side (``regexp_extract_all``), no Python."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach token/stopword/punct counts + quality score."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        stopword_count(text_col).alias("n_stopwords"),
        punct_count(text_col).alias("n_punct"),
        quality_score(text_col).alias("quality"),
    )


def chunk_windows(df, window: int, stride: int,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Sliding token-window chunks: (id, chunk_idx, chunk_text,
    n_tokens) with a short final chunk and min one chunk per doc.
    Entirely scan-local built-ins (tokenize, chunk-count
    arithmetic, per-chunk slices) — shared by the registered
    query, its DuckDB oracle's formula, the UDTF parity twin, and
    the boundary-length tests, so the semantics live in ONE place.

    Empty/whitespace-only documents are DEFINED to yield exactly
    one chunk ``(chunk_idx=0, chunk_text='', n_tokens=0)`` — the
    same rows a Python ``text.split()`` twin emits under the
    min-one-chunk rule. ``F.split('')`` yields ``['']`` (one empty
    token), so the empty string is removed from the token array
    first; non-empty trimmed text never produces empty tokens, so
    this only changes the degenerate case.
    """
    from pyspark.sql import functions as F

    if window < 1 or stride < 1 or stride > window:
        # stride > window would skip tokens between chunks AND
        # compute a negative trailing-slice length that F.slice
        # rejects at runtime — refuse with a clear error instead
        raise ValueError(
            f"chunk_windows: need 1 <= stride <= window, got "
            f"window={window} stride={stride} (stride > window "
            "drops tokens between chunks)")
    tk = F.array_remove(tokens(F.col(text_col)), "")
    t = F.size(tk)
    overflow = F.greatest(t - window, F.lit(0))
    n_chunks = (F.lit(1) + F.floor(overflow / stride).cast("int")
                + F.when(overflow % stride > 0, 1).otherwise(0))
    base = df.select(F.col(id_col), tk.alias("__tk"), t.alias("__t"),
                     F.explode(F.sequence(F.lit(0), n_chunks - 1))
                     .alias("chunk_idx"))
    start = 1 + F.col("chunk_idx") * stride
    end = F.least(F.col("chunk_idx") * stride + window, F.col("__t"))
    return base.select(
        id_col, F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(F.slice(F.col("__tk"), start, end - start + 1), " ")
        .alias("chunk_text"),
        (end - start + 1).cast("int").alias("n_tokens"))


def codepoint_chars(col: Column | str) -> Column:
    """Codepoint-true character array — NOT ``F.split(col, '')``,
    which walks Java UTF-16 code units and halves non-BMP
    characters into lone surrogates (the r8/r9 review bug class:
    latent on ASCII corpora, wrong on real text, and divergent from
    any oracle that walks codepoints). The substr-per-index walk is
    O(len^2) in the string length — fine for WORD-length inputs
    (the BPE symbolizers); document-length inputs should use the
    explode form quality_char_entropy documents. Empty string ->
    empty array (split('') would yield [''])."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(n >= 1, F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substr(c, i, F.lit(1)))
    ).otherwise(F.array().cast("array<string>"))
