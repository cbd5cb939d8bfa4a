"""SNOMED CT RF2 / UMLS RRF preprocessors as Spark sources.

Real deployments start from ontology release files, not a clean concept
CSV.  These reproduce the reference's preprocessors as DataFrame
transforms producing the cdb_build input schema
(cui, name, ontologies, name_status, type_ids, description):

* SNOMED RF2 (reference medcat/utils/preprocess_snomed.py:316-394
  ``Snomed.to_concept_df``): active concepts × active descriptions,
  FSN (typeId 900000000000003001) → status P, synonym
  (900000000000013009) → status A; per-CUI semantic tag extracted from
  the FSN's trailing "(...)" and hashed to an 8-digit type id
  (sha256 % 10^8 — identical arithmetic, computed driver-side per
  DISTINCT tag and broadcast-joined, so no Python UDF in the row path).
* SNOMED pt2ch (preprocess_snomed.py:427-471 relationship2json with the
  116680003 "IS A" type): one groupBy over active relationships.
* UMLS MRCONSO/MRSTY (medcat/utils/preprocess_umls.py:83-121
  ``UMLS.to_concept_df``): language filter, semantic-type join,
  column renames (CUI/STR/SAB/ISPREF/TUI).
* UMLS pt2ch (preprocess_umls.py:190-257 ``get_pt2ch``): MRHIER
  RELA='isa' rows joined back through the AUI→CUI map.

All joins here are ontology-sized (millions of rows, not the corpus) —
plain shuffle joins with AQE are the right plan; nothing touches the
document path.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FSN_TYPE = "900000000000003001"       # fully specified name -> P
SYNONYM_TYPE = "900000000000013009"   # synonym -> A
ISA_TYPE = "116680003"                # |is a| relationship

# the reference's semantic-tag regex (preprocess_snomed.py:381-382)
_TAG_RE = r"\((\w+\s?.?\s?\w+.?\w+.?\w+.?)\)$"


def _tag_hash(tag: Optional[str]) -> int:
    """8-digit type id from the semantic tag — the reference hashes
    ``str(x)`` where x is NaN for CUIs without an FSN tag, i.e. the
    literal string 'nan' (preprocess_snomed.py:391-393)."""
    s = "nan" if tag is None else str(tag)
    return int(hashlib.sha256(s.encode("utf-8")).hexdigest(), 16) % 10 ** 8


def snomed_concept_df(concepts: DataFrame, descriptions: DataFrame,
                      ontology: str = "SNOMED-CT") -> DataFrame:
    """RF2 concept+description snapshots → cdb_build input rows.

    ``concepts``: (id, active, ...); ``descriptions``:
    (conceptId, active, typeId, term, ...) — the RF2 snapshot columns.
    """
    act_c = concepts.where(F.col("active") == "1").select(F.col("id"))
    act_d = (descriptions.where(F.col("active") == "1")
             .where(F.col("typeId").isin(FSN_TYPE, SYNONYM_TYPE))
             .select("conceptId", "term", "typeId"))
    joined = act_c.join(act_d, act_c["id"] == act_d["conceptId"]) \
        .select(F.col("id").alias("cui"),
                F.col("term").alias("name"),
                F.when(F.col("typeId") == FSN_TYPE, "P").otherwise("A")
                 .alias("name_status"))

    # per-CUI semantic tag from the FSN (P row)
    tags = (joined.where(F.col("name_status") == "P")
            .select("cui", F.regexp_extract("name", _TAG_RE, 1).alias("tag"))
            .withColumn("tag", F.when(F.col("tag") == "", None)
                        .otherwise(F.col("tag")))
            .groupBy("cui").agg(F.first("tag", ignorenulls=True).alias("tag")))

    # distinct tags are few — hash driver-side with the reference's exact
    # arithmetic and broadcast-join the map back
    distinct = [r["tag"] for r in tags.select("tag").distinct().collect()]
    spark = concepts.sparkSession
    tag_map = spark.createDataFrame(
        [(t, str(_tag_hash(t))) for t in distinct] +
        ([] if None in distinct else [(None, str(_tag_hash(None)))]),
        "_tag string, type_ids string")

    with_tags = (joined.join(tags, "cui", "left")
                 .join(F.broadcast(tag_map),
                       F.coalesce(F.col("tag"), F.lit("\0"))
                       == F.coalesce(F.col("_tag"), F.lit("\0")), "left")
                 .drop("_tag"))
    # description_type_ids carries the semantic-tag TEXT and type_ids its
    # hash, matching the reference's concept-df format
    # (preprocess_snomed.py:380-388: description_type_ids = extracted tag,
    # type_ids = hash of it)
    return with_tags.select(
        "cui", "name", F.lit(ontology).alias("ontologies"), "name_status",
        F.col("type_ids"),
        F.col("tag").alias("description_type_ids"))


def snomed_type_id2name(descriptions: DataFrame) -> DataFrame:
    """(type_id, type_name): the addl_info['type_id2name'] table —
    semantic tag text keyed by its hashed 8-digit id (feeds
    project_output's ``types`` projection, reference cat.py:1764)."""
    tags = (descriptions.where((F.col("active") == "1")
                               & (F.col("typeId") == FSN_TYPE))
            .select(F.regexp_extract("term", _TAG_RE, 1).alias("tag"))
            .where(F.col("tag") != "").distinct())
    distinct = [r["tag"] for r in tags.collect()]
    spark = descriptions.sparkSession
    return spark.createDataFrame(
        [(str(_tag_hash(t)), t) for t in sorted(distinct)],
        "type_id string, type_name string")


def snomed_pt2ch(relationships: DataFrame) -> DataFrame:
    """Active |is a| rows → (parent, children array): child sourceId
    IS-A parent destinationId (preprocess_snomed.py relationship2json)."""
    isa = relationships.where((F.col("active") == "1")
                              & (F.col("typeId") == ISA_TYPE))
    return (isa.groupBy(F.col("destinationId").alias("parent"))
            .agg(F.array_sort(F.collect_set("sourceId")).alias("children")))


def read_snomed_rf2(spark: SparkSession, terminology_dir: str) -> dict:
    """Read an RF2 Snapshot Terminology directory (tab-separated, header
    row — preprocess_snomed.py parse_file) → {'concepts': cdb-input DF,
    'pt2ch': parent/children DF}.  File discovery by the standard
    ``sct2_Concept/Description/Relationship`` prefixes."""
    files = os.listdir(terminology_dir)

    def _find(prefix: str) -> Optional[str]:
        for f in sorted(files):
            if f.startswith(prefix) and f.endswith(".txt"):
                return os.path.join(terminology_dir, f)
        return None

    def _read(path: str) -> DataFrame:
        return spark.read.csv(path, sep="\t", header=True)

    con = _read(_find("sct2_Concept"))
    desc = _read(_find("sct2_Description"))
    out = {"concepts": snomed_concept_df(con, desc)}
    rel = _find("sct2_Relationship")
    if rel:
        out["pt2ch"] = snomed_pt2ch(_read(rel))
    return out


# ---------------------------------------------------------------------------
# UMLS RRF
# ---------------------------------------------------------------------------

MRCONSO_COLUMNS = ["CUI", "LAT", "TS", "LUI", "STT", "SUI", "ISPREF", "AUI",
                   "SAUI", "SCUI", "SDUI", "SAB", "TTY", "CODE", "STR",
                   "SRL", "SUPPRESS", "CVF"]
MRSTY_COLUMNS = ["CUI", "TUI", "STN", "STY", "ATUI", "CVF"]
MRHIER_COLUMNS = ["CUI", "AUI", "CXN", "PAUI", "SAB", "RELA", "PTR",
                  "HCD", "CVF"]


def read_rrf(spark: SparkSession, path: str, columns: List[str]) -> DataFrame:
    """Pipe-delimited RRF with trailing separator and no header."""
    parts = F.split(F.col("value"), r"\|")
    return spark.read.text(path).select(
        *[parts.getItem(i).alias(c) for i, c in enumerate(columns)])


def umls_concept_df(mrconso: DataFrame, mrsty: DataFrame,
                    allow_languages: Optional[List[str]] = None) -> DataFrame:
    """MRCONSO × MRSTY → cdb_build input rows (preprocess_umls.py:83-121:
    language filter, TUI join, CUI/STR/SAB/ISPREF/TUI renames; ISPREF's
    'Y'/'N' pass through as name_status and fall back to 'A' in the CDB
    build, matching the reference's cdb_maker default)."""
    langs = allow_languages if allow_languages is not None else ["ENG"]
    df = mrconso
    if langs:
        df = df.where(F.col("LAT").isin(langs))
    sty = mrsty.select("CUI", "TUI").distinct()
    return (df.join(sty, "CUI")
            .select(F.col("CUI").alias("cui"), F.col("STR").alias("name"),
                    F.col("SAB").alias("ontologies"),
                    F.col("ISPREF").alias("name_status"),
                    F.col("TUI").alias("type_ids")))


def umls_pt2ch(mrconso: DataFrame, mrhier: DataFrame,
               allow_languages: Optional[List[str]] = None) -> DataFrame:
    """MRHIER isa rows → (parent, children array) via the AUI→CUI map
    (preprocess_umls.py:190-257); self-parents dropped."""
    langs = allow_languages if allow_languages is not None else ["ENG"]
    conso = mrconso
    if langs:
        conso = conso.where(F.col("LAT").isin(langs))
    aui_cui = conso.select("AUI", F.col("CUI").alias("cui")).distinct()
    isa = mrhier.where(F.col("RELA") == "isa") \
        .select("CUI", "AUI", "PAUI").where(F.col("PAUI") != "")
    # reference merges conso (ISPREF='Y') with hier on (AUI, CUI)
    pref = conso.where(F.col("ISPREF") == "Y") \
        .select("AUI", "CUI").distinct()
    child = isa.join(pref, ["AUI", "CUI"])
    parent = aui_cui.withColumnRenamed("AUI", "PAUI") \
        .withColumnRenamed("cui", "parent_cui")
    pairs = (child.join(parent, "PAUI")
             .where(F.col("parent_cui") != F.col("CUI"))
             .select(F.col("parent_cui").alias("parent"),
                     F.col("CUI").alias("child")).distinct())
    return (pairs.groupBy("parent")
            .agg(F.array_sort(F.collect_set("child")).alias("children")))


def snomed_refset_map(refset: DataFrame) -> DataFrame:
    """Active ExtendedMap refset rows → (cui, codes array) ordered by
    mapPriority (highest first) then mapGroup — the reference's
    map_snomed2icd10 + get_direct_refset_mapping composition
    (preprocess_snomed.py:41-70, 473-481, _map_snomed2refset sort at
    :537-538).  Feeds addl_info['cui2icd10'] / ['cui2opcs4']."""
    act = refset.where(F.col("active") == "1") \
        .select(F.col("referencedComponentId").alias("cui"),
                F.col("mapTarget").alias("code"),
                F.col("mapPriority").cast("int").alias("prio"),
                F.col("mapGroup").cast("int").alias("grp")) \
        .where(F.col("code").isNotNull() & (F.col("code") != ""))
    return (act.groupBy("cui")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct(
                    (-F.col("prio")).alias("nprio"), "grp", "code"))),
                lambda s: s["code"]).alias("codes")))


def refset_dict(refset_map: DataFrame, cuis: Optional[List[str]] = None) -> dict:
    """Collect into the addl_info['cui2icd10'] dict shape.

    ``cuis``: optional allowlist — at UMLS/SNOMED scale the refset is
    millions of rows while the consumer (output projection / regression
    checker) only needs the target CUIs' codes, so semi-join before
    collecting instead of pulling the whole map to the driver."""
    if cuis is not None:
        spark = refset_map.sparkSession
        allow = spark.createDataFrame([(c,) for c in cuis], "cui string")
        refset_map = refset_map.join(F.broadcast(allow), "cui", "left_semi")
    return {r["cui"]: list(r["codes"]) for r in refset_map.collect()}


def pt2ch_dict(pt2ch: DataFrame, cuis: Optional[List[str]] = None,
               hops: int = 3) -> dict:
    """Collect the hierarchy into the addl_info['pt2ch'] dict shape the
    regression checker consumes.

    ``cuis``: optional allowlist of target CUIs — the checker
    (regression.determine_finding) only walks parents (≤2 hops up) and
    children (transitively, but FOUND_* almost always resolves within a
    few hops) of the expected CUIs, so restrict the collected map to the
    ``hops``-hop neighborhood of the allowlist instead of collecting an
    MRHIER-sized map (tens of millions of rows) to the driver.  Each hop
    is one broadcast semi-join; the frontier stays bounded by the
    allowlist's fan-out."""
    if cuis is not None:
        spark = pt2ch.sparkSession
        frontier = spark.createDataFrame(
            [(c,) for c in sorted(set(cuis))], "cui string")
        kept = None
        for _ in range(max(hops, 1)):
            # rows whose parent OR a child is in the frontier
            step = pt2ch.join(
                F.broadcast(frontier),
                (pt2ch["parent"] == frontier["cui"])
                | F.array_contains(pt2ch["children"], frontier["cui"]),
                "left_semi")
            kept = step if kept is None else kept.unionByName(step)
            frontier = (step.select(F.explode("children").alias("cui"))
                        .unionByName(step.select(F.col("parent").alias("cui")))
                        .distinct())
        pt2ch = kept.dropDuplicates(["parent"])
    return {r["parent"]: list(r["children"]) for r in pt2ch.collect()}


def get_all_children(sctid: str, pt2ch: dict) -> List[str]:
    """Transitive closure walk (preprocess_snomed.py:17-39)."""
    result, stack = [], [sctid]
    while stack:
        cur = stack.pop()
        stack.extend(pt2ch.get(cur, []))
        result.append(cur)
    return sorted(set(result))
