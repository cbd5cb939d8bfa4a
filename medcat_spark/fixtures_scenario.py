"""Entity-linking scenario fixtures ported from the reference's own
end-to-end test suite (reference: tests/test_entity_linking.py:44-141,
concept data tests/model_creator/umls_sample.csv, scenario config
tests/model_creator/medcat.txt, training text
tests/model_creator/wikipedia_sample.txt).

These exercise the axes the synthetic fixtures cannot: text whose tokens
are NOT fixed points of the lemmatizer (falling→fall), diacritics
(Ménière), uppercase-acronym gating (MAP vs map/Map, TAXOTERE), and
multi-candidate disambiguation on a shared name (Surgery → two CUIs).

The reference scenario config (medcat.txt) sets
``do_not_normalize = {}`` (every token ≥ min_len_normalize is
lemmatized), ``diacritics = True`` and ``check_upper_case_names = True``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import train_unsupervised
from medcat_spark.core.model import CdbModel, VocabModel
from medcat_spark.fixtures import build_fixture_cdb, det_vec

# one tuple per reference umls_sample.csv row:
# (cui, name, ontologies, name_status, type_ids, description)
SCENARIO_CONCEPT_ROWS: List[Tuple[str, str, str, str, str, str]] = [
    ("C0006826", "Cancer", "MTH|MSH", "P", "T191", "Neoplastic Process"),
    ("C0006826", "Malignant Neoplasms", "MTH", "A", "T191", "Neoplastic Process"),
    ("C0006826", "Malignant tumour", "MTH", "A", "T191", "Neoplastic Process"),
    ("C0242379", "Lung Cancer", "MTH", "P", "T191", "Neoplastic Process"),
    ("C0242379", "Malignant neoplasm of lung", "MTH", "A", "T191", "Neoplastic Process"),
    ("C0242379", "Cancer of Lung", "MTH", "A", "T191", "Neoplastic Process"),
    ("C0007131", "Non-Small Cell Lung Carcinoma", "MTH", "P", "T191", "Neoplastic Process"),
    ("C0007131", "NSCLC", "MTH", "A", "T191", "Neoplastic Process"),
    ("C0149925", "Small cell carcinoma of lung", "MTH", "P", "T191", "Neoplastic Process"),
    ("C0149925", "SCLC", "MTH", "A", "T191", "Neoplastic Process"),
    ("C0543467", "Surgery", "MTH", "P", "T061", "Therapeutic or Preventive Procedure"),
    ("C0543467", "Operative Surgical Procedures", "MTH", "A", "T061", "Therapeutic or Preventive Procedure"),
    ("C0543467", "Operation", "MTH", "A", "T061", "Therapeutic or Preventive Procedure"),
    ("C1274039", "Surgery", "MTH", "P", "T091", "Biomedical Occupation or Discipline"),
    ("C1522449", "Radiotherapy", "MTH", "P", "T061", "Therapeutic or Preventive Procedure"),
    ("C3665472", "Chemotherapy", "MTH", "P", "T061", "Therapeutic or Preventive Procedure"),
    ("C0085639", "Fall", "MTH", "P", "T033", "Finding"),
    ("C0025281", "Ménière's Disease", "MTH", "A", "T047", "Disease or Syndrome"),
    ("C0026045", "MAP", "MTH", "A", "T116", "Amino Acid, Peptide, or Protein"),
    ("C0699967", "Taxotere", "MTH", "A", "T109", "Organical Chemical"),
]

# The scenario test texts and their expected/forbidden CUIs — verbatim
# the reference's assertions (tests/test_entity_linking.py:53-141).
LINKING_TEXT = (
    "Common treatments include surgery, chemotherapy, and radiotherapy. "
    "NSCLC is sometimes treated with surgery, whereas SCLC usually responds "
    "better to chemotherapy and radiotherapy. Of all people with lung cancer "
    "in the US, around 17% to 20% survive for at least five years after "
    "diagnosis.")

SCENARIO_CASES = [
    # (case_id, text, expected cuis, forbidden cuis)
    ("entity_linking", LINKING_TEXT,
     ["C1522449", "C3665472", "C0007131", "C0149925", "C0242379"],
     ["C0006826"]),
    ("lemma_not_required", "In the event of a fall", ["C0085639"], []),
    ("lemma_required", "The patient is afraid of falling.", ["C0085639"], []),
    ("diacritics", "Ménière's disease (MD) is a disorder of the inner ear "
     "that is characterized by episodes of vertigo, tinnitus, hearing loss, "
     "and a fullness in the ear.", ["C0025281"], []),
    ("upper_mid_sentence", "Phosphorylation of the MAP has an effect.",
     ["C0026045"], []),
    ("upper_start_sentence", "MAP groups have been identified.",
     ["C0026045"], []),
    ("lower_non_abbrev", "MedCAT should not map this name to a medical "
     "concept.", [], ["C0026045"]),
    ("title_non_abbrev", "Map should not be linked to a medical concept.",
     [], ["C0026045"]),
    ("upper_non_abbrev", "TAXOTERE is a drug used to treat certain types "
     "of cancer.", ["C0699967"], ["C0026045"]),
]

# Unsupervised-training corpus standing in for wikipedia_sample.txt: the
# reference trains on a lung-cancer passage that contains the scenario
# test sentences; we keep that property (same contexts train and test).
TRAIN_TEXTS = [
    "Lung cancer is a malignant lung tumor characterized by uncontrolled "
    "cell growth in tissues of the lung.",
    "The two main types are small cell carcinoma of lung (SCLC) and "
    "non-small cell lung carcinoma (NSCLC).",
    "Common treatments include surgery, chemotherapy, and radiotherapy.",
    "NSCLC is sometimes treated with surgery, whereas SCLC usually "
    "responds better to chemotherapy and radiotherapy.",
    "Treatment and long-term outcomes depend on the type of cancer and "
    "the stage.",
    "The diagnosis of lung cancer is confirmed by biopsy.",
    "Patients with Ménière's disease report vertigo and hearing loss.",
    "Older patients are afraid of falling and a fall can cause injury.",
    "Phosphorylation of the MAP protein has an effect on microtubules.",
    "TAXOTERE is a drug used in chemotherapy for several types of cancer.",
]

_WORD_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ0-9@]+")


def scenario_config() -> EngineConfig:
    """Reference scenario config (tests/model_creator/medcat.txt)."""
    return EngineConfig(diacritics=True, check_upper_case_names=True,
                        do_not_normalize=frozenset(),
                        spell_check_deep=False)


def build_scenario_vocab(dim: int = 30) -> VocabModel:
    """Word vocab from the training + test texts with deterministic
    vectors (stands in for the scenario's gensim Word2Vec run —
    reference utils/make_vocab.py:123-176)."""
    counts: dict = {}
    for text in TRAIN_TEXTS + [c[1] for c in SCENARIO_CASES]:
        for m in _WORD_RE.finditer(text.lower()):
            w = m.group(0)
            if not w.isdigit():
                counts[w] = counts.get(w, 0) + 1
    v = VocabModel()
    for w in sorted(counts):
        v.add(w, cnt=counts[w] * 100, vec=det_vec(w, dim))
    return v


def scenario_models(seed: int = 42) -> Tuple[CdbModel, VocabModel, EngineConfig]:
    """CDB built from the scenario concept rows + vocab + unsupervised
    training over TRAIN_TEXTS (the reference's create_models flow,
    medcat/utils/model_creator.py)."""
    cfg = scenario_config()
    cdb = build_fixture_cdb(cfg, rows=SCENARIO_CONCEPT_ROWS)
    vocab = build_scenario_vocab()
    train_unsupervised(TRAIN_TEXTS, cdb, vocab, cfg, seed=seed)
    return cdb, vocab, cfg
