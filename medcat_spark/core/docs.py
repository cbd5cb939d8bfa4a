"""Interleaved text+media document handling (driver input_hint).

Input rows: ``(doc_id: string, spans: array<struct<kind:string, text:string,
media_ref:string, offset:int>>)``.  Only ``kind='text'`` spans are
tokenized; ``offset`` is the char offset of the span in the reconstructed
document.  The per-row invariant vs the reference is span-sequence
equality on ``(kind, text, media_ref, order)`` — the pipeline carries
``spans`` through untouched and maps annotation char offsets back to
``(span_idx, offset-in-span)`` coordinates (SURVEY §7 hard part 4).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import List, Optional, Sequence, Tuple


def reconstruct_text(spans: Sequence[dict]) -> str:
    """Place each text span at its ``offset``; gaps (media regions /
    separators) are filled with spaces so char offsets are stable and
    media regions can never produce tokens (space is the tokenizer's
    separator)."""
    parts: List[str] = []
    pos = 0
    for s in spans:
        if s["kind"] != "text" or s["text"] is None:
            continue
        off = int(s["offset"])
        if off > pos:
            parts.append(" " * (off - pos))
            pos = off
        parts.append(s["text"])
        pos = off + len(s["text"])
    return "".join(parts)


def span_index(spans: Sequence[dict]) -> Tuple[List[int], List[int], List[int]]:
    """Sorted (start_offsets, end_offsets, span_idx) for text spans."""
    starts, ends, idxs = [], [], []
    for i, s in enumerate(spans):
        if s["kind"] == "text" and s["text"] is not None:
            starts.append(int(s["offset"]))
            ends.append(int(s["offset"]) + len(s["text"]))
            idxs.append(i)
    return starts, ends, idxs


def char_to_span(char_off: int, starts: List[int], ends: List[int],
                 idxs: List[int]) -> Tuple[Optional[int], Optional[int]]:
    """Map a char offset in the reconstructed doc to (span_idx, offset
    within that span); (None, None) if it falls in a media/gap region."""
    k = bisect_right(starts, char_off) - 1
    if k >= 0 and char_off < ends[k]:
        return idxs[k], char_off - starts[k]
    return None, None


def spans_signature(spans: Sequence[dict]) -> Tuple:
    """The per-row invariant: (kind, text, media_ref, order) sequence."""
    return tuple((s["kind"], s.get("text"), s.get("media_ref"), i)
                 for i, s in enumerate(spans))
