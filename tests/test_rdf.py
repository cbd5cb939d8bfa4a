"""RDF N-Triples interchange (sources/rdf.py): golden statement lines
(pins the exact wire format incl. the percent-escape chain), hostile-
character round-trips, and RDF-star evidence_count re-attachment keyed
by the full triple."""

import tempfile

from medcat_spark.sources.rdf import (read_ntriples, to_ntriples,
                                      write_ntriples)


def test_ntriples_golden_lines(spark):
    tri = spark.createDataFrame(
        [("cui:A", "cooccurs_with", "cui:B", 3)],
        "subj string, pred string, obj string, n_docs long")
    lines = sorted(r["line"] for r in to_ntriples(tri).collect())
    assert lines == [
        "<< <urn:medcat:cui:A> <urn:medcat:cooccurs_with> "
        '<urn:medcat:cui:B> >> <urn:medcat:evidence_count> "3"'
        "^^<http://www.w3.org/2001/XMLSchema#integer> .",
        "<urn:medcat:cui:A> <urn:medcat:cooccurs_with> "
        "<urn:medcat:cui:B> .",
    ]


def test_ntriples_escape_golden(spark):
    tri = spark.createDataFrame(
        [('a <b>"c"', "p p", "x\\y%z", None)],
        "subj string, pred string, obj string, n_docs long")
    line = to_ntriples(tri).collect()[0]["line"]
    assert line == ("<urn:medcat:a%20%3Cb%3E%22c%22> <urn:medcat:p%20p> "
                    "<urn:medcat:x%5Cy%25z> .")


def test_ntriples_roundtrip_hostile_chars(spark):
    rows = [("cui:A b", "co<oc>curs", 'cui:"B"\\x', 3),
            ("cui:A b", "co<oc>curs", "cui:other", 7),   # same subj, 2 triples
            ("100% {w|eird}^`", "affinity", "cui:D", None)]
    tri = spark.createDataFrame(
        rows, "subj string, pred string, obj string, n_docs long")
    path = tempfile.mkdtemp() + "/nt"
    write_ntriples(tri, path)
    back = sorted((r["subj"], r["pred"], r["obj"], r["n_docs"])
                  for r in read_ntriples(spark, path).collect())
    assert back == sorted(rows)


def test_ntriples_without_counts(spark):
    tri = spark.createDataFrame(
        [("a", "p", "b"), ("c", "p", "d")],
        "subj string, pred string, obj string")
    assert to_ntriples(tri).count() == 2     # no annotation statements
    path = tempfile.mkdtemp() + "/nt"
    write_ntriples(tri, path)
    back = read_ntriples(spark, path)
    assert back.where("n_docs IS NOT NULL").count() == 0
    assert back.count() == 2


def test_ntriples_reader_drops_malformed(spark):
    path = tempfile.mkdtemp()
    with open(path + "/part-000.txt", "w") as f:
        f.write("<urn:medcat:a> <urn:medcat:p> <urn:medcat:b> .\n"
                "# a comment line\n"
                "not a triple at all\n"
                "<urn:medcat:half> <urn:medcat:missing-obj> .\n")
    got = read_ntriples(spark, path).collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in got] == \
        [("a", "p", "b")]
