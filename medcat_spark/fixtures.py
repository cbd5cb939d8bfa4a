"""Deterministic synthetic fixtures (FIXTURES.md F1-F8; seed-stable).

Mirrors the reference's own test fixtures without any downloads:
  * F1 concepts CSV rows ~ /root/reference/examples/cdb.csv +
    tests/test_cdb_maker.py cases (shared names for disambiguation, a P
    name, multi-word names, an uppercase acronym, skip-token matching);
  * F2 vocab with deterministic vectors (~ tests/helper.py:38-55);
  * F3 interleaved text+media documents per the driver input_hint;
  * F4 trained context vectors derived by running the documented L7
    update rule over a fixed context sequence.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np

from medcat_spark.config import EngineConfig
from medcat_spark.core.annotate import train_unsupervised
from medcat_spark.core.model import CdbModel, VocabModel, prepare_name, strip_parenthesis

VEC_DIM = 30  # small but >1; reference uses 300 (make_vocab.py:129)

# F1 — concept rows: (cui, name, ontologies, name_status, type_ids, description)
CONCEPT_ROWS: List[Tuple[str, str, str, str, str, str]] = [
    ("C0001", "Movar|Movar viruses", "SNOMED", "P", "T109", "movar virus"),
    ("C0002", "CDB", "", "A", "T109", "concept database"),
    ("C0003", "Heart attack|Myocardial infarction", "SNOMED", "P", "T047", "MI"),
    ("C0004", "Attack (behavior)|Attack", "SNOMED", "P", "T055", "attack behavior"),
    ("C0005", "Kidney failure|Renal failure", "SNOMED", "P", "T047", "renal"),
    ("C0006", "Diabetes|Diabetes mellitus", "SNOMED", "P", "T047", "dm"),
    ("C0007", "Second csv|Second column", "", "A", "T109", "from second csv"),
    ("C0008", "Virus|Virus K|Virus M|Virus Z", "SNOMED", "A", "T109", "virus"),
    ("C0009", "Virus", "", "P", "T005", "virus the other one"),
    ("C0010", "High temperature|Fever", "SNOMED", "P", "T033", "fever"),
]

# words used by fixture docs; vectors are deterministic hashes
VOCAB_WORDS = [
    "patient", "history", "severe", "chronic", "acute", "heart", "attack",
    "myocardial", "infarction", "kidney", "renal", "failure", "diabetes",
    "mellitus", "virus", "viruses", "movar", "fever", "temperature", "high",
    "blood", "pressure", "admitted", "hospital", "treatment", "therapy",
    "diagnosis", "presented", "symptoms", "pain", "chest", "left", "right",
    "male", "female", "year", "old", "reported", "onset", "sudden", "cdb",
    "second", "csv", "column", "clinic", "ward", "discharged", "recovered",
    "k", "m", "z",
]


def det_vec(word: str, dim: int = VEC_DIM) -> np.ndarray:
    """Deterministic pseudo-random unit-ish vector from a word hash."""
    h = hashlib.sha256(word.encode()).digest()
    seed = int.from_bytes(h[:8], "big") % (2 ** 32)
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, dim).astype(np.float64)


def build_fixture_vocab(dim: int = VEC_DIM) -> VocabModel:
    v = VocabModel()
    for i, w in enumerate(VOCAB_WORDS):
        v.add(w, cnt=1000 - i * 10, vec=det_vec(w, dim))
    return v


def build_fixture_cdb(config: EngineConfig | None = None,
                      rows=None, full_build: bool = True) -> CdbModel:
    """Driver-side exact CDB build (the Spark job in cdb_build.py must
    produce identical map contents — asserted in tests)."""
    cfg = config or EngineConfig()
    cdb = CdbModel()
    for cui, name, ontologies, name_status, type_ids, description in \
            (rows or CONCEPT_ROWS):
        cui = cui.strip().upper()
        onts = {o.strip() for o in ontologies.upper().split(cfg.multi_separator)
                if o.strip()}
        status = name_status.strip().upper()
        if status not in {"A", "P", "N"}:
            status = "A"
        tids = {t.strip() for t in type_ids.upper().split(cfg.multi_separator)
                if t.strip()}
        names: Dict[str, dict] = {}
        for raw in name.split(cfg.multi_separator):
            raw = raw.strip()
            if not raw:
                continue
            prepare_name(raw, cfg, names)
            if cfg.remove_parenthesis > 0 and status == "P":
                stripped = strip_parenthesis(raw)
                if len(stripped) >= cfg.remove_parenthesis:
                    prepare_name(stripped, cfg, names)
        cdb.add_concept(cui, names, onts, status, tids, description.strip(),
                        full_build=full_build)
    return cdb


# sentence templates embedding fixture concept names: exact, lemmatizable
# plural, 1-edit misspelling, uppercase acronym, skip-token variant
_TEMPLATES = [
    "patient admitted with heart attack and high temperature",
    "history of diabetes mellitus and chronic kidney failure",
    "movar viruses detected in the left ward",
    "Movar    Viruses attacked the sample in CDB",          # skip tokens
    "sudden onset of myocardial infarction reported",
    "severe renal failure with fever and chest pain",
    "diabetis mellitus diagnosed last year",                # 1-edit misspelling
    "the virus k strain recovered from blood",
    "acute attack of pain in the right side",
    "high blood pressure and fever at the clinic",
]

_MEDIA = [("image", "img://scan-{i}.png"), ("audio", "aud://note-{i}.wav")]


def fixture_documents(n_docs: int = 200) -> List[dict]:
    """F3: interleaved text+media docs; deterministic; hot concepts
    ('heart attack', 'fever') appear in >30% of docs to exercise skew."""
    docs = []
    for i in range(n_docs):
        t1 = _TEMPLATES[i % len(_TEMPLATES)]
        t2 = _TEMPLATES[(i * 7 + 3) % len(_TEMPLATES)]
        spans = []
        pos = 0
        spans.append({"kind": "text", "text": t1, "media_ref": None, "offset": pos})
        pos += len(t1)
        if i % 3 == 0:  # interleave a media span occupying a 10-char gap
            kind, ref = _MEDIA[i % 2]
            spans.append({"kind": kind, "text": None,
                          "media_ref": ref.format(i=i), "offset": pos + 1})
            pos += 10
        pos += 1
        spans.append({"kind": "text", "text": t2, "media_ref": None, "offset": pos})
        docs.append({"doc_id": f"doc{i:05d}", "spans": spans})
    return docs


def trained_fixture_models(config: EngineConfig | None = None,
                           seed: int = 42) -> Tuple[CdbModel, VocabModel]:
    """F4: CDB with context vectors trained by the exact sequential rule
    over a fixed corpus (both pipeline and golden generator share this)."""
    cfg = config or EngineConfig()
    cdb = build_fixture_cdb(cfg)
    vocab = build_fixture_vocab()
    corpus = ["the patient presented " + t for t in _TEMPLATES * 3]
    train_unsupervised(corpus, cdb, vocab, cfg, seed=seed)
    return cdb, vocab


def concepts_csv_text() -> str:
    """F1 as CSV text (for the CSV-source test, cdb_maker.py:108-199)."""
    lines = ["cui,name,ontologies,name_status,type_ids,description"]
    for row in CONCEPT_ROWS:
        lines.append(",".join('"%s"' % c if ("," in c or "|" in c) else c
                              for c in row))
    return "\n".join(lines) + "\n"
