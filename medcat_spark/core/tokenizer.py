"""P1 tokenizer + P2 skip/punct tagger (pure Python, Spark-free).

Reproduces the reference's ``spacy_split_all`` tokenization semantics
(medcat/preprocessing/tokenizers.py:38-54): a custom spaCy tokenizer whose
prefix/suffix/infix classes are all ``[^A-Za-z0-9@]``, which means

  * maximal runs of ``[A-Za-z0-9@]`` are tokens,
  * every other non-whitespace character is its own single-char token,
  * within a whitespace run, a LEADING ASCII space is the separator and
    emits nothing; every remaining whitespace char becomes its own
    single-char token (the infix class matches whitespace, so the
    whitespace span is split per char) — e.g. ``"Movar    Viruses"``
    (4 spaces) yields 3 single-space tokens between the words.  This is
    load-bearing: whitespace tokens count toward ``max_skip_tokens``
    gaps in NER, which is exactly how the reference's own test sweep
    gets 2 vs 3 entities (tests/test_ner.py:62,80-88).

The P2 tagger (medcat/preprocessing/taggers.py:37-52) flags
``is_punct`` / ``to_skip`` per token.

These run inside Arrow-batched ``mapInPandas`` stages; keeping them as
plain functions over lists makes them unit-testable without Spark.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

from medcat_spark.config import EngineConfig

_TOKEN_RE = re.compile(r"[A-Za-z0-9@]+")
_TOKEN_RE_DIA = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ0-9@]+")
_PUNCT_RE = re.compile(r"[^a-z0-9]+")
_DIGIT_RE = re.compile(r"^[0-9]+$")


@dataclass
class Tok:
    """One token; mirrors the spaCy Token surface the pipeline reads."""
    __slots__ = ("text", "lower", "start", "end", "i",
                 "is_punct", "to_skip", "is_stop", "is_digit", "is_upper", "norm")
    text: str
    lower: str
    start: int  # char offset in document
    end: int    # exclusive
    i: int      # token index (assigned after full tokenization)
    is_punct: bool
    to_skip: bool
    is_stop: bool
    is_digit: bool
    is_upper: bool
    norm: str


def tokenize(text: str, config: EngineConfig) -> List[Tok]:
    """P1: split into tokens with char offsets.

    Equivalent to the reference tokenizer for ASCII inputs; the
    diacritics variant widens the in-token character class
    (tokenizers.py:42-43).
    """
    word_re = _TOKEN_RE_DIA if config.diacritics else _TOKEN_RE
    toks: List[Tok] = []
    i = 0
    n = len(text)
    pos = 0
    while pos < n:
        ch = text[pos]
        if ch.isspace():
            run = pos
            while run < n and text[run].isspace():
                run += 1
            # spaCy tokenizer.pyx: a leading ' ' is consumed as the
            # separator (attached as trailing whitespace of the previous
            # token); the rest of the whitespace span goes through the
            # affix machinery, whose infix class splits it per char.
            start = pos + 1 if ch == " " else pos
            for k in range(start, run):
                toks.append(_mk(text[k], k, k + 1, i))
                i += 1
            pos = run
            continue
        m = word_re.match(text, pos)
        if m:
            toks.append(_mk(m.group(0), m.start(), m.end(), i))
            i += 1
            pos = m.end()
        else:
            toks.append(_mk(ch, pos, pos + 1, i))
            i += 1
            pos += 1
    return toks


def _mk(t: str, start: int, end: int, i: int) -> Tok:
    lower = t.lower()
    return Tok(
        text=t, lower=lower, start=start, end=end, i=i,
        is_punct=False, to_skip=False, is_stop=False,
        is_digit=t.isdigit(),
        is_upper=t.isupper() and any(c.isalpha() for c in t),
        norm=lower,
    )


def tag_skip_and_punct(toks: List[Tok], config: EngineConfig) -> List[Tok]:
    """P2: flag punct / skip tokens.

    Reference: medcat/preprocessing/taggers.py:37-52.  ``punct_checker``
    is ``re.match(r'[^a-z0-9]+', lower)`` (anchored at start only,
    config.py:615); ``word_skipper`` is a fullmatch over
    ``words_to_skip`` (config.py:612-613).
    """
    word_skipper = config.word_skipper()
    stop = config.effective_stopwords()
    keep_punct = config.keep_punct
    for tkn in toks:
        tkn.is_stop = tkn.lower in stop
        if _PUNCT_RE.match(tkn.lower) and tkn.text not in keep_punct:
            tkn.is_punct = True
            tkn.to_skip = True
        elif word_skipper.match(tkn.lower):
            tkn.to_skip = True
        elif config.skip_stopwords and tkn.is_stop:
            tkn.to_skip = True
    return toks
