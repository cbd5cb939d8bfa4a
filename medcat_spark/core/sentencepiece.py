"""Pure-Python SentencePiece ``tokenizer.model`` reader + encoder.

Real LLaMA-family ``rel_*`` components commonly ship ONLY the
sentencepiece protobuf (no ``tokenizer.json``/``vocab.txt``) — the
reference's RelCAT tokenizer wrapper loads it through HF
``LlamaTokenizer`` (reference: utils/relation_extraction/tokenizer.py,
TokenizerWrapperLlama).  The sentencepiece library is absent from this
environment, so this module walks the protobuf wire format directly
(``sentencepiece_model.proto`` is public) and reimplements the two
public inference algorithms over the extracted pieces:

- ``model_type=UNIGRAM`` (sentencepiece default): Viterbi over piece
  log-probabilities, maximizing the total score of a segmentation;
- ``model_type=BPE`` (what LLaMA ships): iterative merge of the
  adjacent symbol pair whose concatenation has the highest piece score
  (ties broken leftmost), starting from single normalized characters.

Normalization is the offset-preserving subset: whitespace → ``▁``
(U+2581), optional dummy ``▁`` prefix, optional extra-whitespace
collapsing — each normalized char keeps its ORIGINAL char index so
``encode_with_offsets`` returns spans aligned with annotation offsets
(NFKC precompiled charsmaps are intentionally not applied; they would
shift offsets and the medical corpora the engine targets are ASCII-
dominant — divergence is limited to composed-unicode inputs).

Unknown characters fall back to ``<0xNN>`` byte pieces when the model
was trained with ``byte_fallback`` (LLaMA default) and to the UNK piece
otherwise — both per the public sentencepiece semantics.

The module also WRITES a valid minimal ``tokenizer.model`` (the same
wire format), used by the pack exporter and the round-trip tests.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

__all__ = ["SentencePieceTokenizer", "parse_model_bytes",
           "serialize_model", "NORMAL", "UNKNOWN", "CONTROL",
           "USER_DEFINED", "BYTE"]

# piece types (ModelProto.SentencePiece.Type)
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6

_SPACE = "▁"  # ▁


# ---------------------------------------------------------------------------
# protobuf wire-format walk (varint / 64-bit / length-delimited / 32-bit)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message body."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:                       # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:                     # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:                     # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:                     # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _tag(out: bytearray, field: int, wt: int) -> None:
    _write_varint(out, (field << 3) | wt)


def _sub(out: bytearray, field: int, body: bytes) -> None:
    _tag(out, field, 2)
    _write_varint(out, len(body))
    out.extend(body)


def parse_model_bytes(buf: bytes) -> dict:
    """ModelProto → {"pieces": [(piece, score, type)], "model_type":
    int, "byte_fallback": bool, "unk_id": int, "add_dummy_prefix":
    bool, "remove_extra_whitespaces": bool}.

    Field numbers from the public ``sentencepiece_model.proto``:
    ModelProto.pieces=1, .trainer_spec=2, .normalizer_spec=3;
    SentencePiece.piece=1, .score=2, .type=3; TrainerSpec.model_type=3,
    .byte_fallback=35, .unk_id=40; NormalizerSpec.add_dummy_prefix=3,
    .remove_extra_whitespaces=4.
    """
    pieces: List[Tuple[str, float, int]] = []
    model_type = 1
    byte_fallback = False
    unk_id = 0
    add_dummy_prefix = True
    remove_extra_ws = True
    for field, wt, val in _fields(buf):
        if field == 1 and wt == 2:        # SentencePiece
            piece, score, ptype = "", 0.0, NORMAL
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 2:
                    piece = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = int(v2)
            pieces.append((piece, score, ptype))
        elif field == 2 and wt == 2:      # TrainerSpec
            for f2, w2, v2 in _fields(val):
                if f2 == 3 and w2 == 0:
                    model_type = int(v2)
                elif f2 == 35 and w2 == 0:
                    byte_fallback = bool(v2)
                elif f2 == 40 and w2 == 0:
                    unk_id = int(v2)
        elif field == 3 and wt == 2:      # NormalizerSpec
            for f2, w2, v2 in _fields(val):
                if f2 == 3 and w2 == 0:
                    add_dummy_prefix = bool(v2)
                elif f2 == 4 and w2 == 0:
                    remove_extra_ws = bool(v2)
    return {"pieces": pieces, "model_type": model_type,
            "byte_fallback": byte_fallback, "unk_id": unk_id,
            "add_dummy_prefix": add_dummy_prefix,
            "remove_extra_whitespaces": remove_extra_ws}


def serialize_model(pieces: List[Tuple[str, float, int]],
                    model_type: int = 2,
                    byte_fallback: bool = False,
                    unk_id: int = 0,
                    add_dummy_prefix: bool = True,
                    remove_extra_whitespaces: bool = True) -> bytes:
    """Inverse of :func:`parse_model_bytes` (same field subset) — enough
    for sentencepiece-compatible fixtures and pack export."""
    out = bytearray()
    for piece, score, ptype in pieces:
        body = bytearray()
        _sub(body, 1, piece.encode("utf-8"))
        _tag(body, 2, 5)
        body.extend(struct.pack("<f", float(score)))
        _tag(body, 3, 0)
        _write_varint(body, int(ptype))
        _sub(out, 1, bytes(body))
    ts = bytearray()
    _tag(ts, 3, 0)
    _write_varint(ts, int(model_type))
    _tag(ts, 35, 0)
    _write_varint(ts, 1 if byte_fallback else 0)
    _tag(ts, 40, 0)
    _write_varint(ts, int(unk_id))
    _sub(out, 2, bytes(ts))
    ns = bytearray()
    _tag(ns, 3, 0)
    _write_varint(ns, 1 if add_dummy_prefix else 0)
    _tag(ns, 4, 0)
    _write_varint(ns, 1 if remove_extra_whitespaces else 0)
    _sub(out, 3, bytes(ns))
    return bytes(out)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

class SentencePieceTokenizer:
    """Same ``encode_with_offsets`` interface as ``BbpeTokenizer`` /
    ``WordPieceTokenizer`` (core/bbpe.py) so the rel/meta scoring paths
    consume it unchanged."""

    def __init__(self, pieces: List[Tuple[str, float, int]],
                 model_type: int = 2, byte_fallback: bool = False,
                 unk_id: int = 0, add_dummy_prefix: bool = True,
                 remove_extra_whitespaces: bool = True) -> None:
        self.pieces = pieces
        self.model_type = model_type
        self.byte_fallback = byte_fallback
        self.unk_id = unk_id
        self.add_dummy_prefix = add_dummy_prefix
        self.remove_extra_whitespaces = remove_extra_whitespaces
        self.lowercase = False            # sentencepiece models are cased
        self.vocab: Dict[str, int] = {p: i for i, (p, _s, _t)
                                      in enumerate(pieces)}
        self.id2tok: Dict[int, str] = {i: p for p, i in self.vocab.items()}
        # control/unused pieces never match text (sentencepiece skips
        # them during segmentation)
        self.score: Dict[str, float] = {
            p: s for p, s, t in pieces
            if t in (NORMAL, USER_DEFINED, BYTE)}
        self.max_piece_len = max((len(p) for p in self.score), default=1)
        scores = [s for _p, s, t in pieces if t == NORMAL]
        # sentencepiece's unk score: min piece score minus a penalty
        self.unk_score = (min(scores) if scores else 0.0) - 10.0
        self._byte_ids: Optional[List[int]] = None
        if byte_fallback:
            ids = [self.vocab.get("<0x%02X>" % b) for b in range(256)]
            if all(i is not None for i in ids):
                self._byte_ids = ids  # type: ignore[assignment]

    # -- (de)serialization --------------------------------------------------
    @classmethod
    def from_bytes(cls, buf: bytes) -> "SentencePieceTokenizer":
        d = parse_model_bytes(buf)
        return cls(d["pieces"], d["model_type"], d["byte_fallback"],
                   d["unk_id"], d["add_dummy_prefix"],
                   d["remove_extra_whitespaces"])

    @classmethod
    def load(cls, dir_path: str, name: str = "tokenizer"
             ) -> "SentencePieceTokenizer":
        with open(os.path.join(dir_path, f"{name}.model"), "rb") as f:
            return cls.from_bytes(f.read())

    def save(self, dir_path: str, name: str = "tokenizer") -> None:
        os.makedirs(dir_path, exist_ok=True)
        buf = serialize_model(self.pieces, self.model_type,
                              self.byte_fallback, self.unk_id,
                              self.add_dummy_prefix,
                              self.remove_extra_whitespaces)
        with open(os.path.join(dir_path, f"{name}.model"), "wb") as f:
            f.write(buf)

    # -- normalization (offset-preserving) ----------------------------------
    def _normalize(self, text: str) -> Tuple[str, List[int]]:
        """→ (normalized string, original char index per normalized
        char).  Whitespace → ▁; the dummy prefix maps to the first
        real char's index (width handled at span build)."""
        chars: List[str] = []
        idx: List[int] = []
        prev_space = self.remove_extra_whitespaces  # strips leading ws
        for i, ch in enumerate(text):
            if ch.isspace():
                if prev_space and self.remove_extra_whitespaces:
                    continue
                chars.append(_SPACE)
                idx.append(i)
                prev_space = True
            else:
                chars.append(ch)
                idx.append(i)
                prev_space = False
        if self.remove_extra_whitespaces:
            while chars and chars[-1] == _SPACE:
                chars.pop()
                idx.pop()
        if self.add_dummy_prefix and chars:
            chars.insert(0, _SPACE)
            idx.insert(0, idx[0])
        return "".join(chars), idx

    # -- segmentation --------------------------------------------------
    def _segment_unigram(self, ns: str) -> List[Tuple[int, int, int]]:
        """Viterbi: → [(start, end, piece_id)] over the normalized
        string, maximizing the sum of piece scores; -1 piece_id marks a
        char needing unk/byte fallback."""
        n = len(ns)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        best[0] = 0.0
        back: List[Optional[Tuple[int, int]]] = [None] * (n + 1)
        for j in range(1, n + 1):
            lo = max(0, j - self.max_piece_len)
            for i in range(lo, j):
                if best[i] == NEG:
                    continue
                sc = self.score.get(ns[i:j])
                if sc is not None and best[i] + sc > best[j]:
                    best[j] = best[i] + sc
                    back[j] = (i, self.vocab[ns[i:j]])
            if best[j] == NEG and best[j - 1] != NEG:
                best[j] = best[j - 1] + self.unk_score
                back[j] = (j - 1, -1)
        segs: List[Tuple[int, int, int]] = []
        j = n
        while j > 0:
            i, pid = back[j]  # type: ignore[misc]
            segs.append((i, j, pid))
            j = i
        segs.reverse()
        return segs

    def _segment_bpe(self, ns: str) -> List[Tuple[int, int, int]]:
        """Merge-by-score BPE: symbols start as single chars; the
        adjacent pair whose concatenation is the highest-scoring vocab
        piece merges first (leftmost on ties)."""
        bounds = list(range(len(ns) + 1))  # symbol boundaries
        while len(bounds) > 2:
            best_i, best_sc = -1, float("-inf")
            for k in range(len(bounds) - 2):
                sc = self.score.get(ns[bounds[k]:bounds[k + 2]])
                if sc is not None and sc > best_sc:
                    best_i, best_sc = k, sc
            if best_i < 0:
                break
            del bounds[best_i + 1]
        return [(bounds[k], bounds[k + 1],
                 self.vocab.get(ns[bounds[k]:bounds[k + 1]], -1))
                for k in range(len(bounds) - 1)]

    # -- public interface ----------------------------------------------
    def encode_with_offsets(self, text: str
                            ) -> Tuple[List[int], List[Tuple[int, int]]]:
        ns, idx = self._normalize(text)
        if not ns:
            return [], []
        if self.model_type == 1:
            segs = self._segment_unigram(ns)
        else:
            segs = self._segment_bpe(ns)
        ids: List[int] = []
        spans: List[Tuple[int, int]] = []
        for i, j, pid in segs:
            s = idx[i]
            e = idx[j - 1] + 1
            if pid >= 0:
                ids.append(pid)
                spans.append((s, e))
                continue
            # fallback for chars outside the vocab
            seg = ns[i:j]
            if self._byte_ids is not None:
                for ci, ch in enumerate(seg):
                    c0 = idx[i + ci]
                    for b in ch.encode("utf-8"):
                        ids.append(self._byte_ids[b])
                        spans.append((c0, c0 + 1))
            else:
                ids.append(self.unk_id)
                spans.append((s, e))
        return ids, spans

    def encode(self, text: str) -> List[int]:
        return self.encode_with_offsets(text)[0]

    def decode(self, ids: List[int]) -> str:
        out: List[str] = []
        pending: List[int] = []

        def flush():
            if pending:
                out.append(bytes(pending).decode("utf-8",
                                                 errors="replace"))
                pending.clear()

        for i in ids:
            p = self.id2tok.get(i, "")
            if len(p) == 6 and p.startswith("<0x") and p.endswith(">"):
                try:
                    pending.append(int(p[3:5], 16))
                    continue
                except ValueError:
                    pass
            flush()
            out.append(p)
        flush()
        text = "".join(out).replace(_SPACE, " ")
        return text[1:] if text.startswith(" ") and \
            self.add_dummy_prefix else text

    def get_size(self) -> int:
        return len(self.vocab)
