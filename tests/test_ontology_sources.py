"""SNOMED RF2 / UMLS RRF preprocessor sources (reference
preprocess_snomed.py:316-394, preprocess_umls.py:83-121,190-257)."""

import hashlib

from medcat_spark.cdb_build import build_cdb_tables
from medcat_spark.sources.ontologies import (MRCONSO_COLUMNS, MRHIER_COLUMNS,
                                             MRSTY_COLUMNS, get_all_children,
                                             pt2ch_dict, read_rrf,
                                             read_snomed_rf2,
                                             snomed_concept_df, snomed_pt2ch,
                                             umls_concept_df, umls_pt2ch)

RF2_CONCEPTS = [("id", "effectiveTime", "active", "moduleId", "definitionStatusId"),
                ("100001", "20240101", "1", "m", "d"),
                ("100002", "20240101", "1", "m", "d"),
                ("100003", "20240101", "0", "m", "d")]  # inactive concept
RF2_DESCRIPTIONS = [
    ("id", "effectiveTime", "active", "moduleId", "conceptId", "languageCode",
     "typeId", "term", "caseSignificanceId"),
    ("d1", "t", "1", "m", "100001", "en", "900000000000003001",
     "Heart attack (disorder)", "c"),
    ("d2", "t", "1", "m", "100001", "en", "900000000000013009",
     "Myocardial infarction", "c"),
    ("d3", "t", "0", "m", "100001", "en", "900000000000013009",
     "Old inactive name", "c"),                       # inactive description
    ("d4", "t", "1", "m", "100002", "en", "900000000000003001",
     "Renal failure (disorder)", "c"),
    ("d5", "t", "1", "m", "100003", "en", "900000000000003001",
     "Gone (disorder)", "c"),                          # inactive concept
]
RF2_RELATIONSHIPS = [
    ("id", "effectiveTime", "active", "moduleId", "sourceId", "destinationId",
     "relationshipGroup", "typeId", "characteristicTypeId", "modifierId"),
    ("r1", "t", "1", "m", "100002", "100001", "0", "116680003", "c", "m"),
    ("r2", "t", "0", "m", "100003", "100001", "0", "116680003", "c", "m"),
    ("r3", "t", "1", "m", "100002", "100001", "0", "999", "c", "m"),  # not isa
]


def _df(spark, rows):
    header, data = rows[0], rows[1:]
    return spark.createDataFrame(data, ", ".join(f"{c} string" for c in header))


def test_snomed_concept_df(spark):
    out = snomed_concept_df(_df(spark, RF2_CONCEPTS),
                            _df(spark, RF2_DESCRIPTIONS))
    rows = {(r["cui"], r["name"]): r for r in out.collect()}
    assert set(rows) == {("100001", "Heart attack (disorder)"),
                         ("100001", "Myocardial infarction"),
                         ("100002", "Renal failure (disorder)")}
    assert rows[("100001", "Heart attack (disorder)")]["name_status"] == "P"
    assert rows[("100001", "Myocardial infarction")]["name_status"] == "A"
    assert rows[("100001", "Myocardial infarction")]["ontologies"] == "SNOMED-CT"
    # semantic-tag hash = reference arithmetic (sha256 % 10^8)
    want = str(int(hashlib.sha256(b"disorder").hexdigest(), 16) % 10 ** 8)
    assert rows[("100001", "Heart attack (disorder)")]["type_ids"] == want
    assert rows[("100001", "Myocardial infarction")]["type_ids"] == want


def test_snomed_pt2ch_and_closure(spark):
    pt2ch = snomed_pt2ch(_df(spark, RF2_RELATIONSHIPS))
    d = pt2ch_dict(pt2ch)
    assert d == {"100001": ["100002"]}  # active isa only
    assert get_all_children("100001", d) == ["100001", "100002"]
    assert get_all_children("100002", d) == ["100002"]


def test_read_snomed_rf2_files(spark, tmp_path):
    term = tmp_path / "Terminology"
    term.mkdir()
    for name, rows in [("sct2_Concept_Snapshot_INT_20240101.txt", RF2_CONCEPTS),
                       ("sct2_Description_Snapshot-en_INT_20240101.txt",
                        RF2_DESCRIPTIONS),
                       ("sct2_Relationship_Snapshot_INT_20240101.txt",
                        RF2_RELATIONSHIPS)]:
        (term / name).write_text("\n".join("\t".join(r) for r in rows) + "\n")
    out = read_snomed_rf2(spark, str(term))
    assert out["concepts"].count() == 3
    assert pt2ch_dict(out["pt2ch"]) == {"100001": ["100002"]}
    # feeds the CDB build directly
    names = build_cdb_tables(out["concepts"])["names"]
    got = {(r["name"], r["cui"]): r["status"] for r in names.collect()}
    assert got[("heart~attack~disorder", "100001")] == "P"
    assert got[("myocardial~infarction", "100001")] == "A"


MRCONSO = [
    # CUI LAT TS LUI STT SUI ISPREF AUI SAUI SCUI SDUI SAB TTY CODE STR SRL SUPPRESS CVF
    "C0001|ENG|P|L1|PF|S1|Y|A1||S100001||SNOMEDCT_US|PT|100001|Heart attack|0|N|",
    "C0001|ENG|S|L2|PF|S2|N|A2||S100001||SNOMEDCT_US|SY|100001|Myocardial infarction|0|N|",
    "C0001|SPA|P|L3|PF|S3|Y|A3||S100001||SNOMEDCT_US|PT|100001|Infarto|0|N|",
    "C0002|ENG|P|L4|PF|S4|Y|A4||S100002||SNOMEDCT_US|PT|100002|Renal failure|0|N|",
]
MRSTY = [
    "C0001|T047|B2.2|Disease or Syndrome|AT1||",
    "C0002|T047|B2.2|Disease or Syndrome|AT2||",
]
MRHIER = [
    # CUI AUI CXN PAUI SAB RELA PTR HCD CVF
    "C0002|A4|1|A1|SNOMEDCT_US|isa|ptr||",
    "C0001|A1|1||SNOMEDCT_US|isa|ptr||",        # root: no parent
]


def _write_rrf(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_umls_concept_df(spark, tmp_path):
    conso = read_rrf(spark, _write_rrf(tmp_path, "MRCONSO.RRF", MRCONSO),
                     MRCONSO_COLUMNS)
    sty = read_rrf(spark, _write_rrf(tmp_path, "MRSTY.RRF", MRSTY),
                   MRSTY_COLUMNS)
    out = umls_concept_df(conso, sty)
    rows = {(r["cui"], r["name"]): r for r in out.collect()}
    # Spanish row filtered by the language filter
    assert set(rows) == {("C0001", "Heart attack"),
                         ("C0001", "Myocardial infarction"),
                         ("C0002", "Renal failure")}
    assert rows[("C0001", "Heart attack")]["name_status"] == "Y"
    assert rows[("C0001", "Heart attack")]["type_ids"] == "T047"
    assert rows[("C0002", "Renal failure")]["ontologies"] == "SNOMEDCT_US"
    # ISPREF flows through the CDB build exactly like the reference
    # cdb_maker: 'Y' is not a valid status -> falls back to 'A';
    # 'N' IS valid (never-direct-link) and passes through
    # (name_status_options = {'A','P','N'}, cdb_maker.py:109,160-161)
    names = build_cdb_tables(out)["names"]
    sts = {(r["name"], r["cui"]): r["status"] for r in names.collect()}
    assert sts[("heart~attack", "C0001")] == "A"          # Y -> A
    assert sts[("myocardial~infarction", "C0001")] == "N"  # N kept


def test_umls_pt2ch(spark, tmp_path):
    conso = read_rrf(spark, _write_rrf(tmp_path, "MRCONSO.RRF", MRCONSO),
                     MRCONSO_COLUMNS)
    hier = read_rrf(spark, _write_rrf(tmp_path, "MRHIER.RRF", MRHIER),
                    MRHIER_COLUMNS)
    d = pt2ch_dict(umls_pt2ch(conso, hier))
    assert d == {"C0001": ["C0002"]}


def test_snomed_refset_map_and_projection(spark, fixture_models):
    from medcat_spark.config import EngineConfig
    from medcat_spark.pipeline import (annotate, broadcast_model,
                                       project_output)
    from medcat_spark.sources.ontologies import refset_dict, snomed_refset_map

    rs = spark.createDataFrame(
        [("C0003", "I21.9", "1", "1", "1"),
         ("C0003", "I25.2", "2", "1", "1"),    # higher priority first
         ("C0005", "N19", "1", "1", "1"),
         ("C0005", "ZZZ", "1", "1", "0")],     # inactive excluded
        "referencedComponentId string, mapTarget string, mapPriority string, "
        "mapGroup string, active string")
    codes = snomed_refset_map(rs)
    assert refset_dict(codes) == {"C0003": ["I25.2", "I21.9"],
                                  "C0005": ["N19"]}

    cdb, vocab = fixture_models
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())
    docs = spark.createDataFrame(
        [("d1", "patient with heart attack and kidney failure")],
        "doc_id string, text string")
    ann = annotate(docs, bc)
    concepts = spark.createDataFrame(
        [("C0003", "Heart attack", ["T047"], ["SNOMED"]),
         ("C0005", "Kidney failure", ["T047"], ["SNOMED"])],
        "cui string, preferred_name string, type_ids array<string>, "
        "ontologies array<string>")
    out = project_output(ann, concepts, icd10=codes).collect()
    got = {r["cui"]: r["icd10"] for r in out}
    assert got["C0003"] == ["I25.2", "I21.9"]
    assert got["C0005"] == ["N19"]
    # a CUI without a mapping gets [] (reference .get(cui, []))
    others = [r["icd10"] for r in out if r["cui"] not in ("C0003", "C0005")]
    assert all(v == [] for v in others)


def test_snomed_type_id2name(spark):
    from medcat_spark.sources.ontologies import snomed_type_id2name
    out = snomed_type_id2name(_df(spark, RF2_DESCRIPTIONS))
    got = {r["type_id"]: r["type_name"] for r in out.collect()}
    want_id = str(int(hashlib.sha256(b"disorder").hexdigest(), 16) % 10 ** 8)
    assert got == {want_id: "disorder"}


PUBTATOR = """\
25763772|t|DCTN4 as a modifier of chronic infection
25763772|a|Pseudomonas aeruginosa infection is common in cystic fibrosis.
25763772\t0\t5\tDCTN4\tT116,T123\tC4308010
25763772\t23\t40\tchronic infection\tT047\tC0151317
25763772\t42\t64\tPseudomonas aeruginosa\tT007\tC0033809

9988722|t|Short title
9988722|a|Short abstract text.
9988722\t0\t5\tShort\tT033\tC0453933
"""


def test_pubtator_source(spark, tmp_path):
    from medcat_spark.sources.medmentions import pubtator_to_mct, read_pubtator
    p = tmp_path / "mm.txt"
    p.write_text(PUBTATOR)
    parsed = read_pubtator(spark, str(p))
    docs = {r["doc_id"]: r["text"] for r in parsed["documents"].collect()}
    assert docs["25763772"] == ("DCTN4 as a modifier of chronic infection "
                                "Pseudomonas aeruginosa infection is common "
                                "in cystic fibrosis.")
    assert docs["9988722"] == "Short title Short abstract text."
    ann = {(r["doc_id"], r["start"]): r for r in
           parsed["annotations"].collect()}
    assert ann[("25763772", 0)]["cui"] == "C4308010"
    assert ann[("25763772", 0)]["type_ids"] == "T116|T123"  # comma -> '|'
    # gold spans align with the reconstructed text
    a = ann[("25763772", 23)]
    assert docs["25763772"][a["start"]:a["end"]] == "chronic infection"
    con = {r["cui"]: r for r in parsed["concepts"].collect()}
    assert con["C0151317"]["name"] == "chronic infection"
    assert con["C0151317"]["name_status"] == "A"
    mct = pubtator_to_mct(parsed)
    assert mct.count() == 4
    assert mct.where("validated").count() == 4
