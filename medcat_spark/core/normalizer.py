"""P3 token normalizer (lite lemmatizer) + P4 Norvig spell check.

Reference semantics (medcat/utils/normalizers.py:160-204):

  * ``norm = lower`` when ``len(lower) < min_len_normalize`` (default 5)
    or the POS tag is in ``do_not_normalize = {VBD,VBG,VBN,VBP,JJS,JJR}``;
    otherwise ``norm = lemma.lower()``.
  * Spell check only for tokens with ``len >= spell_check_len_limit`` (7),
    not punct, not already in the CDB token vocab, containing no digit;
    fix = best known candidate among edits-1 (edits-2 if deep) ranked by
    ``-1/count`` (normalizers.py:17-32, 42-55); the fix is re-normalized.

DOCUMENTED DIVERGENCE: the reference lemmatizes with spaCy
``en_core_web_md`` (config.py:363), unavailable here.  We use a
deterministic rule-based English noun lemmatizer.  Because the reference
skips lemmatization for verb-ish/comparative POS tags, and our rules leave
-ing/-ed/-er/-est forms untouched, behavior is aligned for the dictionary
NER use-case (concept names are noun phrases).  Both the CDB-build job and
the annotation job share THIS normalizer, so name keys and query tokens
normalize consistently — the property the pipeline actually needs
(the reference makes the same assumption: cleaners.py prepare_name and
TokenNormalizer share one spaCy model).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Set

from medcat_spark.config import EngineConfig
from medcat_spark.core.tokenizer import Tok

_CONTAINS_NUMBER = re.compile("[0-9]+")

# Small irregular-noun map (public linguistic knowledge).
_IRREGULAR = {
    "men": "man", "women": "woman", "children": "child", "teeth": "tooth",
    "feet": "foot", "mice": "mouse", "geese": "goose", "people": "person",
    "viruses": "virus", "diagnoses": "diagnosis", "analyses": "analysis",
    "bacteria": "bacterium", "criteria": "criterion", "data": "datum",
    "fungi": "fungus", "nuclei": "nucleus", "stimuli": "stimulus",
    # invariant nouns (singular == plural-looking)
    "diabetes": "diabetes", "series": "series", "species": "species",
    "news": "news", "herpes": "herpes", "measles": "measles",
    "rabies": "rabies", "scabies": "scabies", "sepsis": "sepsis",
    "pancreas": "pancreas", "atlas": "atlas", "gas": "gas",
}

_KEEP_SUFFIX = ("ss", "us", "is", "ous")  # never strip plain trailing 's'


_LEMMA_CACHE: Dict[str, str] = {}


def lemmatize(lower: str) -> str:
    """Deterministic rule-based English noun lemmatizer (lowercase in/out).
    Memoized: corpora repeat a small vocabulary, so the cache turns the
    suffix checks into one dict hit per token occurrence."""
    hit = _LEMMA_CACHE.get(lower)
    if hit is not None:
        return hit
    out = _lemmatize(lower)
    if len(_LEMMA_CACHE) < 1_000_000:
        _LEMMA_CACHE[lower] = out
    return out


def _lemmatize(lower: str) -> str:
    if lower in _IRREGULAR:
        return _IRREGULAR[lower]
    n = len(lower)
    if n > 4 and lower.endswith("ies"):
        return lower[:-3] + "y"
    if n > 4 and lower.endswith(("ches", "shes", "xes", "zes", "sses")):
        return lower[:-2]
    if n > 3 and lower.endswith("s") and not lower.endswith(_KEEP_SUFFIX):
        return lower[:-1]
    return lower


class SpellChecker:
    """Norvig-style checker over the CDB token vocab.

    Reference: medcat/utils/normalizers.py:10-124 (BasicSpellChecker).
    ``P(word) = -1/count`` (inverse-rank proxy, normalizers.py:17-32);
    candidate sets tried in order known([word]) → known(edits1) →
    [word] (→ edits2 when deep).
    """

    def __init__(self, vocab: Dict[str, int], config: EngineConfig) -> None:
        self.vocab = vocab
        self.config = config
        self._fix_cache: Dict[str, Optional[str]] = {}

    def __contains__(self, word: str) -> bool:
        return word in self.vocab

    def P(self, word: str) -> float:
        cnt = self.vocab.get(word, 0)
        return -1 / cnt if cnt != 0 else 0

    def fix(self, word: str) -> Optional[str]:
        """Memoized (fix is a pure function of the word given a fixed
        vocab; the edits-1 candidate generation is ~54*len strings per
        call — the kernel's hottest path without the cache)."""
        if word in self._fix_cache:
            return self._fix_cache[word]
        fix = max(self.candidates(word), key=self.P)
        out = fix if fix != word else None
        if len(self._fix_cache) < 500_000:
            self._fix_cache[word] = out
        return out

    def candidates(self, word: str) -> Iterable[str]:
        if self.config.spell_check_deep:
            return (self.known([word]) or self.known(self.edits1(word))
                    or self.known(self.edits2(word)) or [word])
        return self.known([word]) or self.known(self.edits1(word)) or [word]

    def known(self, words: Iterable[str]) -> Set[str]:
        return set(w for w in words if w in self.vocab)

    def edits1(self, word: str) -> Set[str]:
        letters = "abcdefghijklmnopqrstuvwxyz"
        if self.config.diacritics:
            letters += "àáâãäåæçèéêëìíîïðñòóôõöøùúûüýþÿ"
        splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
        deletes = [L + R[1:] for L, R in splits if R]
        transposes = [L + R[1] + R[0] + R[2:] for L, R in splits if len(R) > 1]
        replaces = [L + c + R[1:] for L, R in splits if R for c in letters]
        inserts = [L + c + R for L, R in splits for c in letters]
        return set(deletes + transposes + replaces + inserts)

    def edits2(self, word: str) -> Iterable[str]:
        return (e2 for e1 in self.edits1(word) for e2 in self.edits1(e1))


def normalize_tokens(toks: List[Tok], config: EngineConfig,
                     spell_checker: Optional[SpellChecker] = None) -> List[Tok]:
    """P3+P4 over a token list (reference TokenNormalizer.__call__,
    normalizers.py:179-204)."""
    min_len = config.min_len_normalize
    do_spell = config.spell_check and spell_checker is not None
    limit = config.spell_check_len_limit
    for tkn in toks:
        if len(tkn.lower) < min_len:
            tkn.norm = tkn.lower
        else:
            tkn.norm = lemmatize(tkn.lower)
        if do_spell:
            if (len(tkn.text) >= limit and not tkn.is_punct
                    and tkn.lower not in spell_checker
                    and not _CONTAINS_NUMBER.search(tkn.lower)):
                fix = spell_checker.fix(tkn.lower)
                if fix is not None:
                    if len(tkn.lower) < min_len:
                        tkn.norm = fix
                    else:
                        tkn.norm = lemmatize(fix)
    return toks


def normalize_name_tokens(tokens: List[str], config: EngineConfig) -> List[str]:
    """The CLEAN name version used by the CDB build (cleaners.py:37-48):
    lower if short, else lemma.lower().  Shared by build + runtime."""
    out = []
    for t in tokens:
        lt = t.lower()
        out.append(lt if len(lt) < config.min_len_normalize else lemmatize(lt))
    return out
