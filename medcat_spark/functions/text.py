"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side built-ins (whole-stage codegen, no Python in the hot path):
token stats, quality scoring, language-ID heuristic, token counting,
document fingerprinting.  Each has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "les"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
}

QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, tok) — 1-based positions, whitespace split."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


def _arr(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per doc: token/type counts, type-token
    ratio, stopword ratio, mean token length, punct ratio."""
    arr = _arr(text_col)
    n_tokens = F.size(arr)
    n_types = F.size(F.array_distinct(arr))
    stop_hits = F.size(F.filter(arr, lambda t: t.isin(QUALITY_STOPWORDS)))
    sum_len = F.aggregate(arr, F.lit(0), lambda acc, t: acc + F.length(t))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", ""))
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        F.round(n_types.cast("double") / n_tokens, 6).alias("type_token_ratio"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(sum_len.cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(n_punct.cast("double") /
                F.length(F.col(text_col)), 6).alias("punct_ratio"),
    )


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (alpha runs, digit runs, and other non-space chars each count;
    long alpha runs count ceil(len/4) subword units)."""
    arr = _arr(text_col)
    ws = F.size(arr)
    bpe = F.aggregate(
        arr, F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"))
    return docs.select("doc_id", ws.cast("long").alias("ws_tokens"),
                       bpe.cast("long").alias("bpe_tokens"))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit-ratio language heuristic: argmax over per-language
    hit counts, ties broken by language code order; 'und' if zero hits."""
    arr = _arr(text_col)
    scores = F.array(*[
        F.struct(
            (-F.size(F.filter(arr, lambda t: t.isin(ws)))).alias("neg_hits"),
            F.lit(lang).alias("lang"))
        for lang, ws in sorted(LANG_STOPWORDS.items())])
    best = F.array_min(scores)
    return docs.select(
        "doc_id",
        F.when(best["neg_hits"] < 0, best["lang"]).otherwise("und").alias("lang_pred"),
        (-best["neg_hits"]).cast("long").alias("hits"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact fingerprint (md5 of text) + bag fingerprint (md5 of the
    sorted distinct token set) for dedup keys."""
    arr = _arr(text_col)
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp_exact"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(arr)), " "))
        .alias("fp_bag"))


def corpus_clean(docs: DataFrame, allow_langs=("en",),
                 min_tokens: int = 10, max_tokens: int = 100_000,
                 min_type_token_ratio: float = 0.2,
                 lang_col: str = "lang",
                 text_col: str = "text") -> DataFrame:
    """Composite training-corpus cleaning pipeline (C4-style): language
    allowlist → per-doc quality gates (token count bounds, type/token
    ratio) → exact-dedup keeper (first doc_id per content hash wins).

    One logical plan: the quality expressions are codegen, the dedup
    keeper is one hash-window — the scan feeds a single pipeline with no
    Python anywhere.  → surviving (doc_id, text, lang, n_tokens,
    type_token_ratio) rows.
    """
    from pyspark.sql.window import Window

    arr = F.split(F.col(text_col), " ")
    n_tokens = F.size(arr)
    n_types = F.size(F.array_distinct(arr))
    ttr = n_types.cast("double") / n_tokens
    base = docs.select("doc_id", text_col, lang_col)
    if allow_langs:
        base = base.where(F.col(lang_col).isin(list(allow_langs)))
    gated = (base
             .withColumn("n_tokens", n_tokens.cast("long"))
             .withColumn("type_token_ratio", F.round(ttr, 6))
             .where((F.col("n_tokens") >= min_tokens)
                    & (F.col("n_tokens") <= max_tokens)
                    & (F.col("type_token_ratio") >= min_type_token_ratio)))
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (gated.withColumn("dup_rank", F.row_number().over(w))
            .where(F.col("dup_rank") == 1)
            .drop("dup_rank"))


def c4_clean(docs: DataFrame, text_col: str = "text",
             min_line_words: int = 5, min_sentences: int = 3) -> DataFrame:
    """C4's line- and page-level cleaning rules (Raffel et al. 2020
    §2.2, the rules that built the C4 corpus): keep only lines that end
    in terminal punctuation, have >= ``min_line_words`` words, and do
    not mention javascript; then gate the page on >= ``min_sentences``
    retained sentences, no curly braces, and no "lorem ipsum".

    One codegen projection — the line filters are higher-order array
    functions over split(text, '\\n'), zero Python, no shuffle at all.
    Returns (doc_id, c4_text, n_lines, n_lines_kept, n_sentences,
    c4_pass).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (F.size(F.split(l, " ")) >= min_line_words)
        & ~F.lower(l).contains("javascript"))
    cleaned = F.array_join(kept, "\n")
    n_sent = (F.length(cleaned)
              - F.length(F.translate(cleaned, ".!?", ""))).cast("long")
    low = F.lower(F.col(text_col))
    return docs.select(
        "doc_id",
        cleaned.alias("c4_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        n_sent.alias("n_sentences"),
        ((n_sent >= min_sentences)
         & ~low.contains("{") & ~low.contains("}")
         & ~low.contains("lorem ipsum")).cast("int").alias("c4_pass"))
