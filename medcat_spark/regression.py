"""Template-based regression checker (reference: medcat/utils/regression/,
checking.py:22-131, README grading levels).

Phrases with ``[CONCEPT]`` placeholders are filled from the model's names
for target CUIs; the filled phrase is annotated and graded:

  IDENTICAL    — an annotation exactly spans the filled name with the
                 target CUI
  SMALLER_SPAN — a target-CUI annotation overlaps but does not cover the
                 whole filled span
  FOUND_ANY    — some annotation overlaps the span (wrong CUI)
  FAIL         — nothing overlaps

Runs the production kernel per case; distributable via the same
mapInPandas pattern when suites get large.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import annotate_document
from medcat_spark.core.model import CdbModel, VocabModel

PLACEHOLDER = "[CONCEPT]"


@dataclass
class RegressionCase:
    name: str
    phrase: str          # contains [CONCEPT]
    target_cui: str


def fill_variants(case: RegressionCase, cdb: CdbModel,
                  config: EngineConfig) -> List[Tuple[str, str, int, int]]:
    """(filled_text, used_name, start, end) for every raw-ish name of the
    target CUI (we fill with the '~'-names space-joined, mirroring the
    reference's use of ontology names per placeholder)."""
    out = []
    for name in sorted(cdb.cui2names.get(case.target_cui, ())):
        surface = name.replace(config.separator, " ")
        start = case.phrase.index(PLACEHOLDER)
        text = case.phrase.replace(PLACEHOLDER, surface, 1)
        out.append((text, surface, start, start + len(surface)))
    return out


def grade(case: RegressionCase, cdb: CdbModel, vocab: VocabModel,
          config: EngineConfig) -> List[dict]:
    results = []
    for text, surface, start, end in fill_variants(case, cdb, config):
        ents, _ = annotate_document(text, cdb, vocab, config)
        verdict = "FAIL"
        for e in ents:
            if e.start < end and e.end > start:  # overlap
                if e.cui == case.target_cui:
                    if e.start == start and e.end == end:
                        verdict = "IDENTICAL"
                        break
                    verdict = "SMALLER_SPAN"
                elif verdict == "FAIL":
                    verdict = "FOUND_ANY"
        results.append({"case": case.name, "surface": surface,
                        "target_cui": case.target_cui, "verdict": verdict})
    return results


def run_suite(cases: List[RegressionCase], cdb: CdbModel, vocab: VocabModel,
              config: EngineConfig) -> Dict[str, object]:
    rows = [r for c in cases for r in grade(c, cdb, vocab, config)]
    n = len(rows)
    ident = sum(r["verdict"] == "IDENTICAL" for r in rows)
    ok = sum(r["verdict"] in ("IDENTICAL", "SMALLER_SPAN") for r in rows)
    return {"rows": rows, "n": n,
            "identical_pct": round(100 * ident / n, 2) if n else 0.0,
            "pass_pct": round(100 * ok / n, 2) if n else 0.0}
