"""Long-form text chunking for synthesis
(behavioral parity: everyvoice/text/textsplit.py:11-107).

Splits text into chunks around ``desired_length`` characters, preferring
strong sentence boundaries (``!?.``) and falling back to weak ones
(``:;,``), quote-aware. Chunks are synthesized independently and the audio
re-concatenated, which bounds sequence length — the TPU-side equivalent of
sequence parallelism for this workload.

Implementation: two passes over the normalized text. Pass 1 records every
legal cut point (quote-aware boundary scan); pass 2 packs chunks by cursor
arithmetic over those cut points — earliest strong boundary past the
desired length wins, otherwise the latest boundary inside the window,
otherwise a hard cut at the window edge.
"""

from __future__ import annotations

import re
from bisect import bisect_left, bisect_right


def _scan_cut_points(
    text: str, strong_boundaries: str, weak_boundaries: str
) -> tuple[list, list]:
    """One pass over ``text`` collecting legal cut offsets.

    A cut offset ``p`` means "the text may be split between ``text[:p]``
    and ``text[p:]``". A boundary character only counts when it is outside
    double quotes and followed by a space (``text`` is whitespace-normalized
    before scanning, so a space is the only separator that can follow).
    """
    strong_cuts: list = []
    weak_cuts: list = []
    quoted = False
    for idx, char in enumerate(text):
        if char == '"':
            quoted = not quoted
            continue
        if quoted or text[idx + 1 : idx + 2] != " ":
            continue
        if char in strong_boundaries:
            strong_cuts.append(idx + 1)
        elif char in weak_boundaries:
            weak_cuts.append(idx + 1)
    return strong_cuts, weak_cuts


def chunk_text(
    text: str,
    desired_length: int = 100,
    max_length: int = 200,
    strong_boundaries: str = "!?.",
    weak_boundaries: str = ":;,",
) -> list:
    """Split ``text`` into chunks of roughly ``desired_length`` characters.

    >>> chunk_text('Short sentence.')
    ['Short sentence.']
    >>> chunk_text('One. Two. Three.', desired_length=5, max_length=20)
    ['One. Two.', 'Three.']
    """
    assert desired_length < max_length

    text = re.sub(r"\n\n+", "\n", text)
    text = re.sub(r"\s+", " ", text)
    strong_cuts, weak_cuts = _scan_cut_points(
        text, strong_boundaries, weak_boundaries
    )

    chunks: list = []
    cursor = 0
    end = len(text)
    while cursor < end:
        cut = end
        # Preferred: the first strong boundary once the chunk is long
        # enough, as long as it lands before the hard window edge.
        ideal = bisect_left(strong_cuts, cursor + desired_length)
        if ideal < len(strong_cuts) and strong_cuts[ideal] - cursor < max_length:
            cut = strong_cuts[ideal]
        elif end - cursor >= max_length:
            # Overflow: back up to the latest boundary inside the window
            # (strong preferred over weak), or hard-cut at the edge.
            edge = cursor + max_length
            cut = edge
            for cuts in (strong_cuts, weak_cuts):
                backstop = bisect_right(cuts, edge)
                if backstop and cuts[backstop - 1] > cursor:
                    cut = cuts[backstop - 1]
                    break
        piece = text[cursor:cut].strip()
        if piece:
            chunks.append(piece)
        cursor = cut
        while cursor < end and text[cursor] == " ":
            cursor += 1

    non_lexical = rf"^[\s{re.escape(strong_boundaries + weak_boundaries)}]*$"
    return [c for c in chunks if not re.match(non_lexical, c)]
