"""Meta-annotation operator (MetaCAT analogue, SURVEY §2.11).

The reference's MetaCAT classifies a token window around each entity
into meta-annotations like Status/Negation (medcat/meta_cat.py:447-517,
636-651: window of cntx_left/cntx_right tokens around the entity
center).  The torch model is not part of the CDB+Vocab parity contract;
this module implements the same dataflow with a deterministic rule
scorer (cue-word hit within the window) so the Spark-side shape —
entity × token-window join, per-entity classification row — is real,
tested, and oracle-checkable.  Swapping in a torch scorer is a drop-in
change inside the same joined relation (batched pandas UDF per window).

Pure DataFrame implementation: tokens exploded once, window membership
expressed as a position-range join (no Python in the path).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default cue lexicon for the rule scorer (public clinical-NLP heuristics
# in the spirit of NegEx; tiny on purpose)
NEGATION_CUES = ["no", "not", "without", "denies", "negative"]


def token_positions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, tok, start): 1-based token positions with char
    offsets (single-space tokenization; for annotate()-produced offsets
    use the ann rows' start/end directly)."""
    arr = F.split(F.col(text_col), " ")
    t = docs.select("doc_id", F.posexplode(arr).alias("pos0", "tok"))
    from pyspark.sql.window import Window
    w = (Window.partitionBy("doc_id").orderBy("pos0")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (t.withColumn("start",
                         F.coalesce(F.sum(F.length("tok") + 1).over(w),
                                    F.lit(0)).cast("int"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok", "start"))


def meta_annotations(ann: DataFrame, docs: DataFrame,
                     cues: List[str] | None = None,
                     meta_name: str = "Negation",
                     window_left: int = 5,
                     text_col: str = "text") -> DataFrame:
    """For each annotation, classify the ``window_left`` tokens before
    the entity: value='present' unless a cue token appears → 'negated'.

    → (doc_id, start, cui, meta_name, value, n_cues)
    """
    cues = cues if cues is not None else NEGATION_CUES
    toks = token_positions(docs, text_col)
    a = ann.select("doc_id", "start", "cui").alias("a")
    # entity's token position = the token whose char start matches
    ent_pos = a.join(toks.alias("t"),
                     (F.col("a.doc_id") == F.col("t.doc_id"))
                     & (F.col("a.start") == F.col("t.start"))) \
        .select(F.col("a.doc_id").alias("doc_id"), F.col("a.start").alias("start"),
                F.col("a.cui").alias("cui"), F.col("t.pos").alias("ent_pos"))
    cue_toks = toks.where(F.col("tok").isin(cues)) \
        .select(F.col("doc_id").alias("c_doc"), F.col("pos").alias("c_pos"))
    hits = (ent_pos.join(
        cue_toks,
        (F.col("doc_id") == F.col("c_doc"))
        & (F.col("c_pos") < F.col("ent_pos"))
        & (F.col("c_pos") >= F.col("ent_pos") - window_left), "left")
        .groupBy("doc_id", "start", "cui", "ent_pos")
        .agg(F.count("c_pos").alias("n_cues")))
    return hits.select(
        "doc_id", "start", "cui",
        F.lit(meta_name).alias("meta_name"),
        F.when(F.col("n_cues") > 0, "negated").otherwise("present").alias("value"),
        "n_cues")
