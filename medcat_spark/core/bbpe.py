"""Byte-level BPE tokenizer (pure Python) — the 'bbpe' tokenizer MedCAT
MetaCAT models ship with (reference
medcat/tokenizers/meta_cat_tokenizers.py:30-146 wraps HuggingFace's
ByteLevelBPETokenizer; the saved files are ``bbpe-vocab.json`` +
``bbpe-merges.txt``, meta_cat_tokenizers.py:113-119).

This is the public GPT-2 BPE algorithm (Radford et al. 2019; the
canonical encoder.py published by OpenAI, re-implemented from the
paper/spec, not copied):

  1. pre-tokenize with the GPT-2 regex (contractions, letter runs,
     digit runs, punctuation runs, space handling);
  2. map each pre-token's UTF-8 bytes through the bytes→unicode table
     (so every byte is a printable char and encoding is lossless);
  3. repeatedly merge the lowest-ranked adjacent pair per merges.txt;
  4. look the resulting symbols up in vocab.json.

Divergence note (documented): Python ``re`` lacks ``\\p{L}``/``\\p{N}``;
the pattern below uses ``[^\\W\\d_]``/``\\d`` with Unicode semantics,
which matches the HF pattern for all letters and decimal digits —
non-decimal numerals (Nl/No) fall into the punctuation class instead.
Identical on ASCII clinical text.

``encode_with_offsets`` also returns per-token character spans (needed
to map entity char offsets into token space for MetaCAT windows —
reference utils/meta_cat/data_utils.py prepare_document).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

_PRETOK = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+"
    r"|\s+(?!\S)|\s+")


def bytes_to_unicode() -> Dict[int, str]:
    """The GPT-2 byte→printable-unicode-char table (public spec): keep
    printable latin ranges as-is, shift everything else above U+0100."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


def _get_pairs(word: List[str]) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _lower_preserving_length(text: str) -> str:
    """Lowercase without changing the string length, so token char
    offsets computed on the lowered text align with the ORIGINAL text.
    ``str.lower`` can expand some code points ('İ' → 'i̇'), shifting
    every subsequent offset; keep such chars unlowered instead (their
    byte tokens differ, but annotation spans stay correct).  Unicode
    lowercasing never contracts, so equal total length ⟹ 1:1 mapping."""
    lo = text.lower()
    if len(lo) == len(text):
        return lo
    return "".join(c if len(c.lower()) != 1 else c.lower() for c in text)


class BbpeTokenizer:
    """Loads ``<name>-vocab.json`` + ``<name>-merges.txt`` and encodes
    text to ids with character offsets.  Lossless: ``decode(encode(x))
    == x`` for any string."""

    def __init__(self, vocab: Dict[str, int],
                 merges: List[Tuple[str, str]],
                 lowercase: bool = True) -> None:
        self.vocab = vocab
        self.id2tok = {i: t for t, i in vocab.items()}
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.lowercase = lowercase
        self._cache: Dict[str, List[str]] = {}
        self.unk_id: Optional[int] = vocab.get("<unk>")

    @classmethod
    def load(cls, dir_path: str, name: str = "bbpe",
             lowercase: bool = True) -> "BbpeTokenizer":
        with open(os.path.join(dir_path, f"{name}-vocab.json"),
                  encoding="utf-8") as f:
            vocab = {str(k): int(v) for k, v in json.load(f).items()}
        merges: List[Tuple[str, str]] = []
        with open(os.path.join(dir_path, f"{name}-merges.txt"),
                  encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                if b:
                    merges.append((a, b))
        return cls(vocab, merges, lowercase=lowercase)

    def save(self, dir_path: str, name: str = "bbpe") -> None:
        os.makedirs(dir_path, exist_ok=True)
        with open(os.path.join(dir_path, f"{name}-vocab.json"), "w",
                  encoding="utf-8") as f:
            json.dump(self.vocab, f, ensure_ascii=False)
        inv = sorted(self.ranks.items(), key=lambda kv: kv[1])
        with open(os.path.join(dir_path, f"{name}-merges.txt"), "w",
                  encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for (a, b), _ in inv:
                f.write(f"{a} {b}\n")

    # -- BPE core ---------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        """Merge loop over one byte-mapped pre-token (GPT-2 algorithm)."""
        hit = self._cache.get(token)
        if hit is not None:
            return hit
        word = list(token)
        while len(word) > 1:
            pairs = _get_pairs(word)
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 30))
            if best not in self.ranks:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        if len(self._cache) < 500_000:
            self._cache[token] = word
        return word

    def encode_with_offsets(self, text: str
                            ) -> Tuple[List[int], List[Tuple[int, int]]]:
        """→ (ids, [(char_start, char_end) per id]).  Symbols absent from
        vocab.json map to <unk> when present, else are skipped (HF adds
        every byte to the vocab at train time, so misses only happen with
        truncated vocab files)."""
        if self.lowercase:
            text = _lower_preserving_length(text)
        ids: List[int] = []
        spans: List[Tuple[int, int]] = []
        for m in _PRETOK.finditer(text):
            pre = m.group(0)
            start = m.start()
            # byte-map the pre-token, tracking per-CHAR byte counts so
            # symbol boundaries map back to char offsets
            mapped: List[str] = []
            char_of_byte: List[int] = []
            for ci, ch in enumerate(pre):
                for b in ch.encode("utf-8"):
                    mapped.append(_B2U[b])
                    char_of_byte.append(ci)
            bpos = 0
            for sym in self._bpe("".join(mapped)):
                blen = len(sym)
                c0 = char_of_byte[bpos]
                c1 = char_of_byte[bpos + blen - 1]
                bpos += blen
                tid = self.vocab.get(sym, self.unk_id)
                if tid is None:
                    continue
                ids.append(tid)
                spans.append((start + c0, start + c1 + 1))
        return ids, spans

    def encode(self, text: str) -> List[int]:
        return self.encode_with_offsets(text)[0]

    def decode(self, ids: List[int]) -> str:
        buf = bytearray()
        for i in ids:
            for ch in self.id2tok.get(i, ""):
                buf.append(_U2B[ch])
        return buf.decode("utf-8", errors="replace")

    def get_size(self) -> int:
        return len(self.vocab)


class WordPieceTokenizer:
    """BERT WordPiece (public algorithm: basic whitespace+punct split,
    then greedy longest-prefix match with ``##`` continuations) —
    RelCAT's BERT tokenizer saves ``vocab.txt``
    (utils/relation_extraction/tokenizer.py save_pretrained).  Same
    ``encode_with_offsets`` interface as :class:`BbpeTokenizer`."""

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True,
                 unk_token: str = "[UNK]") -> None:
        self.vocab = vocab
        self.id2tok = {i: t for t, i in vocab.items()}
        self.lowercase = lowercase
        self.unk_id = vocab.get(unk_token, 0)

    @classmethod
    def load(cls, dir_path: str, lowercase: bool = True
             ) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(os.path.join(dir_path, "vocab.txt"),
                  encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, lowercase=lowercase)

    def save(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        inv = sorted(self.vocab.items(), key=lambda kv: kv[1])
        with open(os.path.join(dir_path, "vocab.txt"), "w",
                  encoding="utf-8") as f:
            for t, _i in inv:
                f.write(t + "\n")

    def encode_with_offsets(self, text: str
                            ) -> Tuple[List[int], List[Tuple[int, int]]]:
        if self.lowercase:
            text = _lower_preserving_length(text)
        ids: List[int] = []
        spans: List[Tuple[int, int]] = []
        # basic tokenization: words and single punctuation marks
        for m in re.finditer(r"\w+|[^\w\s]", text):
            word, base = m.group(0), m.start()
            # greedy longest-prefix wordpiece
            start = 0
            pieces: List[Tuple[str, int, int]] = []
            ok = True
            while start < len(word):
                end = len(word)
                cur = None
                while end > start:
                    sub = word[start:end]
                    if start > 0:
                        sub = "##" + sub
                    if sub in self.vocab:
                        cur = (sub, start, end)
                        break
                    end -= 1
                if cur is None:
                    ok = False
                    break
                pieces.append(cur)
                start = cur[2]
            if not ok:
                ids.append(self.unk_id)
                spans.append((base, base + len(word)))
                continue
            for sub, s, e in pieces:
                ids.append(self.vocab[sub])
                spans.append((base + s, base + e))
        return ids, spans

    def encode(self, text: str) -> List[int]:
        return self.encode_with_offsets(text)[0]

    def get_size(self) -> int:
        return len(self.vocab)


def train_bbpe(texts: List[str], vocab_size: int = 500,
               lowercase: bool = True) -> BbpeTokenizer:
    """Minimal BPE trainer (for fixtures/tests — same greedy
    highest-frequency-pair algorithm the public trainers use).  Starts
    from the 256 byte symbols, learns merges until ``vocab_size``."""
    from collections import Counter
    words: Counter = Counter()
    for t in texts:
        if lowercase:
            t = t.lower()
        for m in _PRETOK.finditer(t):
            mapped = "".join(_B2U[b] for b in m.group(0).encode("utf-8"))
            words[tuple(mapped)] += 1
    vocab, merges = learn_merges(words, vocab_size)
    return BbpeTokenizer(vocab, merges, lowercase=lowercase)


def learn_merges(words, vocab_size: int):
    """Greedy BPE merge learning (Sennrich et al. 2016 alg. 1) over a
    word-frequency table ``{tuple(byte-unicode symbols): count}`` —
    O(word types), independent of corpus size, which is exactly why
    every published trainer counts words first and merges second."""
    from collections import Counter
    # seed with ALL 256 byte symbols so decode is total
    vocab_syms = sorted(set(_B2U.values()))
    merges: List[Tuple[str, str]] = []
    while len(vocab_syms) + len(merges) < vocab_size:
        pair_counts: Counter = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pair_counts[(w[i], w[i + 1])] += c
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographic
        (a, b), cnt = max(pair_counts.items(),
                          key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        new_words: Counter = Counter()
        for w, c in words.items():
            lst: List[str] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    lst.append(a + b)
                    i += 2
                else:
                    lst.append(w[i])
                    i += 1
            new_words[tuple(lst)] += c
        words = new_words
    vocab = {s: i for i, s in enumerate(vocab_syms)}
    for a, b in merges:
        vocab[a + b] = len(vocab)
    return vocab, merges
