"""Long-form text chunking for synthesis
(parity: everyvoice/text/textsplit.py:11-107).

Splits text into chunks around ``desired_length`` characters, preferring
strong sentence boundaries (``!?.``) and falling back to weak ones
(``:;,``), quote-aware. Chunks are synthesized independently and the audio
re-concatenated, which bounds sequence length — the TPU-side equivalent of
sequence parallelism for this workload.
"""

from __future__ import annotations

import re


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

    chunks: list = []
    current = ""
    in_quote = False
    strong_splits: list = []
    weak_splits: list = []
    n = len(text)

    def flush():
        nonlocal current, strong_splits, weak_splits
        if current.strip():
            chunks.append(current.strip())
        current = ""
        strong_splits = []
        weak_splits = []

    for pos, char in enumerate(text):
        current += char
        if char == '"':
            in_quote = not in_quote

        next_char = text[pos + 1] if pos + 1 < n else ""
        boundary_here = not in_quote and (
            char == "\n"
            or (char in strong_boundaries and next_char in "\n ")
        )
        if not in_quote:
            if char == "\n" or (char in strong_boundaries and next_char in "\n "):
                strong_splits.append(len(current))
            elif char in weak_boundaries and next_char in "\n ":
                weak_splits.append(len(current))

        if len(current) >= max_length:
            split_at = None
            if strong_splits and len(current) > desired_length / 2:
                split_at = strong_splits[-1]
            elif weak_splits and len(current) > desired_length / 2:
                split_at = weak_splits[-1]
            if split_at:
                chunks.append(current[:split_at].strip())
                current = current[split_at:].lstrip()
            else:
                chunks.append(current.strip())
                current = ""
            strong_splits = []
            weak_splits = []
        elif boundary_here and len(current) >= desired_length:
            flush()

    if current.strip():
        chunks.append(current.strip())

    non_lexical = rf"^[\s{re.escape(strong_boundaries + weak_boundaries)}]*$"
    return [c for c in chunks if c and not re.match(non_lexical, c)]
