"""Independent golden oracle for the ``bpe_token_count`` query
(same fingerprint-dispatched VALUES pattern as rel_bert_oracle.py).

The engine side trains byte-level BPE distributed
(``bpe_train.train_bbpe_distributed``: JVM regexp word counting →
driver merge learning) and encodes via the Arrow-batched
``bpe_token_counts`` kernel using ``BbpeTokenizer.encode`` (cached,
offset-tracking).  BPE encoding is not SQL-expressible, so the oracle
recomputes the expected (doc_id, n_bpe_tokens, ids_sum) rows with an
independent pipeline and emits them as fingerprint-dispatched VALUES:

- word counting: the pure-Python ``re`` pre-tokenizer loop of the
  LOCAL trainer (``core.bbpe.train_bbpe``) — independent of the
  engine's JVM ``regexp_extract_all`` path (their agreement is itself
  pytest-certified, test_bpe_train);
- encoding: a naive lowest-rank-pair scan re-derived here (no cache,
  no offset machinery, list-splice merging) — independent of
  ``BbpeTokenizer.encode``;
- shared: only ``learn_merges`` (greedy highest-count pair selection
  with lexicographic tie-break) because that deterministic selection
  rule IS the contract both sides must agree on, exactly as the
  fixture weights are shared in rel_bert_oracle.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

GOLDEN_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                  "/root/testdata/sf0.1"]

VOCAB_SIZE = 400
DOC_MOD = 29

_CACHE: Dict[str, Tuple[List[Tuple[int, int, int]], str]] = {}
_SQL_CACHE: Dict[str, str] = {}


def _naive_encode(pretok: str, ranks, vocab, b2u) -> List[int]:
    syms = [b2u[b] for b in pretok.encode("utf-8")]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return [vocab[s] for s in syms]


def golden_rows(sf_dir: str) -> Tuple[List[Tuple[int, int, int]], str]:
    import duckdb

    from medcat_spark.core.bbpe import _B2U, _PRETOK, train_bbpe

    con = duckdb.connect()
    df = con.execute(
        "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
        [os.path.join(sf_dir, "documents.parquet")]).df()
    fp = con.execute(
        "SELECT md5(string_agg(CAST(doc_id AS VARCHAR) || ':' "
        "|| md5(text), ',' ORDER BY CAST(doc_id AS VARCHAR))) "
        "FROM read_parquet(?)",
        [os.path.join(sf_dir, "documents.parquet")]).fetchone()[0]
    tok = train_bbpe(list(df["text"]), vocab_size=VOCAB_SIZE)
    ranks, vocab = tok.ranks, tok.vocab
    rows = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        if int(doc_id) % DOC_MOD != 0:
            continue
        ids: List[int] = []
        for m in _PRETOK.finditer(text.lower()):
            ids.extend(_naive_encode(m.group(0), ranks, vocab, _B2U))
        rows.append((int(doc_id), len(ids), sum(ids)))
    return rows, fp


def bpe_oracle_sql() -> str:
    if "sql" in _SQL_CACHE:
        return _SQL_CACHE["sql"]
    values = []
    for sf_dir in GOLDEN_SF_DIRS:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            continue
        if sf_dir not in _CACHE:
            _CACHE[sf_dir] = golden_rows(sf_dir)
        rows, fp = _CACHE[sf_dir]
        for doc_id, n, s in rows:
            values.append(f"('{fp}',{doc_id},{n},{s})")
    sql = f"""
WITH fp AS (SELECT md5(string_agg(CAST(doc_id AS VARCHAR) || ':'
                    || md5(text), ','
                    ORDER BY CAST(doc_id AS VARCHAR))) AS h
            FROM documents),
g(h, doc_id, n_bpe_tokens, ids_sum) AS (VALUES {",".join(values)})
SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
       CAST(g.n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       CAST(g.ids_sum AS BIGINT) AS ids_sum
FROM g JOIN fp ON g.h = fp.h
"""
    _SQL_CACHE["sql"] = sql
    return sql
