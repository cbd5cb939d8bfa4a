"""Gopher-style repetition / quality filters for training corpora.

Implements the document-quality heuristics published with Gopher
(Rae et al. 2021, "Scaling Language Models", §A1.1) and reused by
C4/RefinedWeb-class pipelines: word-shape gates, symbol/bullet/ellipsis
ratios, duplicate line/paragraph fractions (count- and character-
weighted), top n-gram character fraction, and duplicated n-gram
character fraction.

Spark-first design: every word/line metric is a single whole-stage-
codegen projection over the scan (higher-order array functions, zero
Python); the two n-gram families are computed in ONE exploded pass —
both gram sizes are unioned with an `n` tag before a single
``groupBy(doc_id)`` so the corpus is shuffled once, with map-side
partial aggregation, then broadcast-free left-joined back on the same
key.  At 100 TB the shuffle payload is (doc_id, gram) pairs — a few %
of input bytes — and partitions by doc_id like every other stage.

Duplicated n-gram character fractions use the standard overlapping-
occurrence approximation (count * len(gram) / len(text), as in Dolma /
DataTrove): exact char-coverage would need per-position interval
merging, which no published pipeline does at scale either.

Each metric has a row-for-row DuckDB oracle in
``__spark_entry__.oracle_sql()['text_gopher_quality']``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's stopword gate list (the paper's "must contain at least two
# of": the, be, to, of, and, that, have, with).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_PREFIXES = ("- ", "* ", "•")   # -, *, •
ELLIPSIS_SUFFIXES = ("...", "…")      # ..., …


def _r6(c: Column) -> Column:
    return F.round(c, 6)


def _dup_fracs(parts: Column, prefix: str) -> list:
    """Duplicate-count fraction and duplicate-character fraction over an
    array of strings (lines or paragraphs)."""
    n = F.size(parts)
    n_dist = F.size(F.array_distinct(parts))
    chars = F.aggregate(parts, F.lit(0), lambda a, x: a + F.length(x))
    chars_dist = F.aggregate(F.array_distinct(parts), F.lit(0),
                             lambda a, x: a + F.length(x))
    return [
        _r6((n - n_dist).cast("double") / n).alias(f"dup_{prefix}_frac"),
        _r6(F.when(chars > 0, (chars - chars_dist).cast("double") / chars)
            .otherwise(0.0)).alias(f"dup_{prefix}_char_frac"),
    ]


def _count_occurrences(text: Column, sub: str) -> Column:
    return ((F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit(""))))
            / F.lit(len(sub))).cast("long")


def _grams(arr: Column, n: int) -> Column:
    """Overlapping word n-grams as strings; empty array when the doc is
    shorter than n words (guards Spark's descending sequence())."""
    return F.when(
        F.size(arr) >= n,
        F.transform(F.sequence(F.lit(1), F.size(arr) - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(arr, i, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def gopher_word_line_metrics(docs: DataFrame,
                             text_col: str = "text") -> DataFrame:
    """Per-doc word/line/paragraph metrics — one codegen projection."""
    text = F.col(text_col)
    arr = F.split(text, " ")
    lines = F.split(text, "\n")
    paras = F.split(text, "\n\n")
    n_words = F.size(arr)
    mean_wl = F.aggregate(arr, F.lit(0), lambda a, t: a + F.length(t)) \
        .cast("double") / n_words
    alpha = F.size(F.filter(arr, lambda t: t.rlike("[A-Za-z]")))
    stops = F.size(F.filter(arr, lambda t: t.isin(GOPHER_STOPWORDS)))
    symbols = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    bullet = F.size(F.filter(
        lines, lambda l: F.greatest(*[l.startswith(p)
                                      for p in BULLET_PREFIXES])))
    ellip = F.size(F.filter(
        lines, lambda l: F.greatest(*[l.endswith(sfx)
                                      for sfx in ELLIPSIS_SUFFIXES])))
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        _r6(mean_wl).alias("mean_word_len"),
        _r6(alpha.cast("double") / n_words).alias("frac_alpha_words"),
        stops.cast("long").alias("n_stopwords"),
        _r6(symbols.cast("double") / n_words).alias("symbol_word_ratio"),
        _r6(bullet.cast("double") / F.size(lines)).alias("frac_bullet_lines"),
        _r6(ellip.cast("double") / F.size(lines)).alias("frac_ellipsis_lines"),
        *_dup_fracs(lines, "line"),
        *_dup_fracs(paras, "para"),
    )


def gopher_ngram_metrics(docs: DataFrame, text_col: str = "text",
                         top_n: int = 2, dup_n: int = 5) -> DataFrame:
    """Per-doc (top_{top_n}gram_char_frac, dup_{dup_n}gram_char_frac) in
    a single shuffle: both gram sizes explode into one (doc_id, n, gram)
    stream, one groupBy counts, one groupBy(doc_id) folds both families
    with conditional aggregates.  Ties on the top gram break on the
    lexically greatest gram (max_by on a (count, gram) struct) so the
    result is deterministic and oracle-matchable."""
    text = F.col(text_col)
    arr = F.split(text, " ")
    base = docs.select("doc_id", F.length(text).alias("n_chars"),
                       _grams(arr, top_n).alias("g_top"),
                       _grams(arr, dup_n).alias("g_dup"))
    stream = base.select(
        "doc_id", "n_chars",
        F.explode(F.concat(
            F.transform(F.col("g_top"),
                        lambda g: F.struct(F.lit(top_n).alias("n"),
                                           g.alias("gram"))),
            F.transform(F.col("g_dup"),
                        lambda g: F.struct(F.lit(dup_n).alias("n"),
                                           g.alias("gram"))),
        )).alias("ng"))
    counts = (stream
              .groupBy("doc_id", "n_chars", F.col("ng.n").alias("n"),
                       F.col("ng.gram").alias("gram"))
              .agg(F.count("*").alias("cnt")))
    top_chars = F.max_by(
        F.when(F.col("n") == top_n, F.col("cnt") * F.length("gram")),
        F.when(F.col("n") == top_n,
               F.struct(F.col("cnt"), F.col("gram"))))
    dup_chars = F.sum(
        F.when((F.col("n") == dup_n) & (F.col("cnt") > 1),
               F.col("cnt") * F.length("gram")).otherwise(0))
    per_doc = (counts.groupBy("doc_id", "n_chars")
               .agg(top_chars.alias("top_chars"),
                    dup_chars.alias("dup_chars")))
    return per_doc.select(
        "doc_id",
        _r6(F.coalesce(F.col("top_chars"), F.lit(0)).cast("double")
            / F.col("n_chars")).alias(f"top_{top_n}gram_char_frac"),
        _r6(F.col("dup_chars").cast("double")
            / F.col("n_chars")).alias(f"dup_{dup_n}gram_char_frac"),
    )


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   top_n: int = 2, dup_n: int = 5) -> DataFrame:
    """All Gopher repetition/quality metrics per doc.  The word/line
    projection never shuffles; the n-gram branch shuffles once on
    (doc_id, n, gram) then once on doc_id (partial-agg both times); the
    final join is doc_id-keyed on both sides."""
    wl = gopher_word_line_metrics(docs, text_col)
    ng = gopher_ngram_metrics(docs, text_col, top_n=top_n, dup_n=dup_n)
    top_c, dup_c = f"top_{top_n}gram_char_frac", f"dup_{dup_n}gram_char_frac"
    out = wl.join(ng, "doc_id", "left")
    return out.withColumn(top_c, F.coalesce(F.col(top_c), F.lit(0.0))) \
              .withColumn(dup_c, F.coalesce(F.col(dup_c), F.lit(0.0)))


# Gopher paper §A1.1 thresholds (word-count bounds rescaled by callers
# for short-doc corpora).
DEFAULT_GATES = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,
    max_bullet_frac=0.9, max_ellipsis_frac=0.3,
    min_alpha_frac=0.8, min_stopwords=2,
    max_dup_line_frac=0.3, max_dup_para_frac=0.3,
    max_dup_line_char_frac=0.2, max_dup_para_char_frac=0.2,
    max_top_ngram_char_frac=0.2, max_dup_ngram_char_frac=0.15,
)


def gopher_gate(docs: DataFrame, text_col: str = "text",
                top_n: int = 2, dup_n: int = 5, **overrides) -> DataFrame:
    """gopher_quality + a boolean ``gopher_pass`` column applying the
    paper's thresholds (override any via kwargs)."""
    g = {**DEFAULT_GATES, **overrides}
    unknown = set(overrides) - set(DEFAULT_GATES)
    if unknown:
        raise ValueError(f"unknown gate overrides: {sorted(unknown)}")
    m = gopher_quality(docs, text_col, top_n=top_n, dup_n=dup_n)
    c = F.col
    ok = (
        (c("n_words") >= g["min_words"]) &
        (c("n_words") <= g["max_words"]) &
        (c("mean_word_len") >= g["min_mean_word_len"]) &
        (c("mean_word_len") <= g["max_mean_word_len"]) &
        (c("symbol_word_ratio") <= g["max_symbol_word_ratio"]) &
        (c("frac_bullet_lines") <= g["max_bullet_frac"]) &
        (c("frac_ellipsis_lines") <= g["max_ellipsis_frac"]) &
        (c("frac_alpha_words") >= g["min_alpha_frac"]) &
        (c("n_stopwords") >= g["min_stopwords"]) &
        (c("dup_line_frac") <= g["max_dup_line_frac"]) &
        (c("dup_para_frac") <= g["max_dup_para_frac"]) &
        (c("dup_line_char_frac") <= g["max_dup_line_char_frac"]) &
        (c("dup_para_char_frac") <= g["max_dup_para_char_frac"]) &
        (c(f"top_{top_n}gram_char_frac") <= g["max_top_ngram_char_frac"]) &
        (c(f"dup_{dup_n}gram_char_frac") <= g["max_dup_ngram_char_frac"])
    )
    return m.withColumn("gopher_pass", ok)
