"""MedMentions (PubTator format) source (reference
medcat/utils/medmentions.py:5-100: original2concept_csv /
original2pure_text / original2json).

PubTator layout per document block (blank-line separated):
    <pmid>|t|<title>
    <pmid>|a|<abstract>
    <pmid>\\t<start>\\t<end>\\t<name>\\t<type_ids(comma)>\\t<cui>

Spark-native: one ``spark.read.text`` scan, line-class split with
native string functions, documents assembled as ``title + ' ' +
abstract`` (the reference's concatenation), annotations as flat gold
rows usable by the stats/kfold harness, and concept rows in the
cdb_build input shape (status 'A', comma type_ids re-joined with '|').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pubtator(spark: SparkSession, path: str) -> dict:
    """→ {'documents': (doc_id, text), 'annotations': (doc_id, start,
    end, value, type_ids, cui), 'concepts': cdb_build input rows}."""
    raw = spark.read.text(path).where(F.length("value") > 0)

    title = raw.where(F.col("value").rlike(r"^[^\t|]+\|t\|")) \
        .select(F.split_part("value", F.lit("|t|"), F.lit(1)).alias("doc_id"),
                F.split_part("value", F.lit("|t|"), F.lit(2)).alias("title"))
    abstract = raw.where(F.col("value").rlike(r"^[^\t|]+\|a\|")) \
        .select(F.split_part("value", F.lit("|a|"), F.lit(1)).alias("doc_id"),
                F.split_part("value", F.lit("|a|"), F.lit(2)).alias("abstract"))
    docs = (title.join(abstract, "doc_id")
            .select("doc_id",
                    F.concat_ws(" ", "title", "abstract").alias("text")))

    p = F.split(F.col("value"), "\t")
    ann = (raw.where(F.col("value").contains("\t"))
           .select(p.getItem(0).alias("doc_id"),
                   p.getItem(1).cast("int").alias("start"),
                   p.getItem(2).cast("int").alias("end"),
                   p.getItem(3).alias("value"),
                   F.regexp_replace(p.getItem(4), ",", "|").alias("type_ids"),
                   F.trim(p.getItem(5)).alias("cui")))

    concepts = (ann.select("cui", F.col("value").alias("name"),
                           F.lit("").alias("ontologies"),
                           F.lit("A").alias("name_status"),
                           "type_ids", F.lit("").alias("description"))
                .distinct())
    return {"documents": docs, "annotations": ann, "concepts": concepts}


def pubtator_to_mct(parsed: dict) -> DataFrame:
    """Flat MCT-shaped gold rows (project 'medmentions', reference
    original2json shape) — feed straight into stats.kfold_stats or the
    supervised trainer."""
    docs = parsed["documents"]
    return (parsed["annotations"].join(docs, "doc_id")
            .select(F.lit("0").alias("project_id"),
                    F.lit("medmentions").alias("project_name"),
                    F.lit("").alias("project_cuis"),
                    "doc_id", "text", "start", "end", "cui", "value",
                    F.lit(True).alias("validated"),
                    F.lit(False).alias("killed"),
                    F.lit(False).alias("deleted")))
