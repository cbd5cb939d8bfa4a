"""RDF N-Triples interchange for the materialized KG (W3C N-Triples:
one `<subj> <pred> <obj> .` statement per line) — the lingua franca a
triple store ingests, so the engine's graph tables can leave Spark.

Reference parity note: MedCAT itself stops at per-doc entity dicts;
this is consumer-side surface for the north rule's triple tables, like
functions/graph.py.

Everything stays JVM-side: serialization is a codegen concat over
percent-encoded IRI terms (no UDF), the reader is one regexp_extract
per field over spark.read.text, and both directions round-trip any
subject/object containing IRI-hostile characters.  Evidence counts ride
along as RDF-star annotation statements
(`<< <s> <p> <o> >> <…evidence_count> "n"^^xsd:integer .`) so the
weight is keyed by the FULL triple — plain reification would cost four
extra statements per triple."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
COUNT_PRED = "evidence_count"

# characters outside the IRI "unreserved + :/" set we allow in terms;
# percent-encode exactly these ('%' first) so encoding is invertible
_IRI_ESCAPES = [("%", "%25"), ("<", "%3C"), (">", "%3E"), ('"', "%22"),
                (" ", "%20"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"),
                ("^", "%5E"), ("`", "%60"), ("\\", "%5C")]


def _iri_encode(col):
    out = col
    for ch, enc in _IRI_ESCAPES:
        out = F.replace(out, F.lit(ch), F.lit(enc))
    return out


def _iri_decode(col):
    out = col
    for ch, enc in reversed(_IRI_ESCAPES):
        out = F.replace(out, F.lit(enc), F.lit(ch))
    return out


def _iri(name: str, base: str):
    return F.concat(F.lit("<" + base), _iri_encode(F.col(name)),
                    F.lit(">"))


def to_ntriples(triples: DataFrame, base: str = "urn:medcat:") -> DataFrame:
    """(subj, pred, obj[, n_docs]) → one `line` per statement, terms
    percent-encoded into `<base+term>` IRIs.  With an n_docs column
    each triple also emits an RDF-star annotation
    `<< <s> <p> <o> >> <base+evidence_count> "n"^^<xsd:integer> .`.
    Pure whole-stage-codegen projection — no UDF, no shuffle."""
    spo = F.concat(_iri("subj", base), F.lit(" "), _iri("pred", base),
                   F.lit(" "), _iri("obj", base))
    lines = triples.select(F.concat(spo, F.lit(" .")).alias("line"))
    if "n_docs" in triples.columns:
        cnt = F.concat(
            F.lit("<< "), spo, F.lit(" >> <" + base + COUNT_PRED + '> "'),
            F.col("n_docs").cast("string"),
            F.lit('"^^<' + XSD_INTEGER + "> ."))
        lines = lines.unionAll(triples.select(cnt.alias("line")))
    return lines


def write_ntriples(triples: DataFrame, path: str,
                   base: str = "urn:medcat:") -> None:
    """Write the statement lines as partitioned text — each task emits
    its own shard, the layout any bulk triple-store loader consumes."""
    to_ntriples(triples, base).write.mode("overwrite").text(path)


_NT_RE = r'^<([^>]*)> <([^>]*)> <([^>]*)> \.\s*$'
_NTS_RE = (r'^<< <([^>]*)> <([^>]*)> <([^>]*)> >> '
           r'<([^>]*)> "([^"]*)"\^\^<([^>]*)> \.\s*$')


def read_ntriples(spark: SparkSession, path: str,
                  base: str = "urn:medcat:") -> DataFrame:
    """Parse N-Triples(-star) shards back into (subj, pred, obj,
    n_docs): plain IRI statements become triples, quoted-triple
    annotations on the evidence_count predicate re-attach their count
    (null when absent).  regexp_extract over spark.read.text —
    line-splittable at any scale; malformed lines are dropped (count
    them upstream when the input is untrusted)."""
    raw = spark.read.text(path)

    def term(expr):
        return _iri_decode(F.expr(f"substring({expr}, {len(base) + 1})"))

    def grp(rx, i):
        return F.regexp_extract("value", rx, i)

    triples = (raw.where(F.col("value").rlike(_NT_RE))
               .select(term(f"regexp_extract(value, '{_NT_RE}', 1)")
                       .alias("subj"),
                       term(f"regexp_extract(value, '{_NT_RE}', 2)")
                       .alias("pred"),
                       term(f"regexp_extract(value, '{_NT_RE}', 3)")
                       .alias("obj")))
    stars = (raw.where(F.col("value").rlike("^<< "))
             .select(grp(_NTS_RE, 1).alias("s"), grp(_NTS_RE, 2).alias("p"),
                     grp(_NTS_RE, 3).alias("o"), grp(_NTS_RE, 4).alias("ap"),
                     grp(_NTS_RE, 5).alias("lit"),
                     grp(_NTS_RE, 6).alias("dtype")))
    counts = (stars.where((F.col("s") != "")
                          & (F.col("dtype") == XSD_INTEGER)
                          & (F.col("ap") == base + COUNT_PRED))
              .select(_iri_decode(F.expr(f"substring(s, {len(base) + 1})"))
                      .alias("subj"),
                      _iri_decode(F.expr(f"substring(p, {len(base) + 1})"))
                      .alias("pred"),
                      _iri_decode(F.expr(f"substring(o, {len(base) + 1})"))
                      .alias("obj"),
                      F.col("lit").cast("long").alias("n_docs")))
    return triples.join(counts, ["subj", "pred", "obj"], "left")
