"""Deterministic layout-aware text extraction from (synthetic) PDF payloads.

Capability analog of the reference's layout-aware PDF parse (the reference
delegates to docling/docling-parse, reference file
services/ai_service/document_conversion/docling_pdf_loader.py:26-33). This is
a from-scratch kernel over a constrained-but-honest PDF text-object subset:

  * payloads start with the ``%PDF`` magic;
  * text is carried by standard text objects::

        BT /F1 <size> Tf <x> <y> Td (<text>) Tj ET

    with integer x/y in PDF user space (y grows upward) — the subset emitted
    by :mod:`document_ai_spark.sources.pages`.

The kernel does genuine layout analysis, not string grepping:

  1. parse every text object into (x, y, size, text) items;
  2. drop running header/footer bands (y >= 750 or y <= 50) — the PDF analog
     of HTML nav/footer boilerplate;
  3. cluster the remaining items into COLUMNS by x-coordinate gaps
     (1-D region segmentation: a gap > COLUMN_GAP between sorted unique x
     starts a new column — handles one- and two-column layouts);
  4. within a column, sort lines top-to-bottom (y descending, then x) and
     split into paragraph REGIONS wherever the vertical gap between
     consecutive lines exceeds PARA_GAP_FACTOR * font size;
  5. reading order = columns left-to-right, regions top-to-bottom, lines
     joined with a single space inside a region, regions joined "\n\n".

Everything is integer arithmetic + stable sorts => byte-identical output at
any partition count / parallelism level.
"""

from __future__ import annotations

import re
from typing import List, Tuple

PDF_MAGIC = b"%PDF"
COLUMN_GAP = 100          # min horizontal gap (pts) starting a new column
PARA_GAP_FACTOR = 2       # vertical gap > factor*size => paragraph break
HEADER_Y = 750            # y >= this is running-header band
FOOTER_Y = 50             # y <= this is running-footer band

_TEXT_OBJ = re.compile(
    rb"BT\s+/F\d+\s+(\d+)\s+Tf\s+(-?\d+)\s+(-?\d+)\s+Td\s+\((.*?)\)\s+Tj\s+ET",
    re.S,
)


def is_pdf(payload: bytes) -> bool:
    return payload[:4] == PDF_MAGIC


def _parse_items(payload: bytes) -> List[Tuple[int, int, int, str]]:
    """-> list of (x, y, size, text) for every text object, document order."""
    items = []
    for m in _TEXT_OBJ.finditer(payload):
        size = int(m.group(1))
        x = int(m.group(2))
        y = int(m.group(3))
        text = m.group(4).decode("utf-8", errors="replace")
        text = " ".join(text.split())
        if text:
            items.append((x, y, size, text))
    return items


def _cluster_columns(items: List[Tuple[int, int, int, str]]) -> List[List[Tuple[int, int, int, str]]]:
    """1-D x-gap region segmentation into columns, left-to-right."""
    if not items:
        return []
    xs = sorted({x for x, _, _, _ in items})
    # column boundaries where consecutive unique x differ by > COLUMN_GAP
    col_start = {xs[0]: 0}
    col_id = 0
    for prev, cur in zip(xs, xs[1:]):
        if cur - prev > COLUMN_GAP:
            col_id += 1
        col_start[cur] = col_id
    ncols = col_id + 1
    cols: List[List[Tuple[int, int, int, str]]] = [[] for _ in range(ncols)]
    for it in items:
        cols[col_start[it[0]]].append(it)
    return cols


def _column_regions(col: List[Tuple[int, int, int, str]]) -> List[List[str]]:
    """Split one column into paragraph regions by vertical gaps."""
    # top-to-bottom: y descending; stable tiebreak on x then original text
    lines = sorted(col, key=lambda it: (-it[1], it[0]))
    regions: List[List[str]] = []
    cur: List[str] = []
    prev_y = None
    prev_size = None
    for x, y, size, text in lines:
        if prev_y is not None and (prev_y - y) > PARA_GAP_FACTOR * max(prev_size, size):
            if cur:
                regions.append(cur)
            cur = []
        cur.append(text)
        prev_y, prev_size = y, size
    if cur:
        regions.append(cur)
    return regions


def extract_pdf(payload: bytes) -> Tuple[str, List[dict]]:
    """bytes -> (extracted text in reading order, span dicts).

    Spans carry tag='pdf:c<col>r<region>'; densities are 1.0/0.0 (a PDF
    text region has no links).
    """
    items = _parse_items(payload)
    body = [it for it in items if FOOTER_Y < it[1] < HEADER_Y]
    cols = _cluster_columns(body)

    parts: List[str] = []
    tags: List[str] = []
    for ci, col in enumerate(cols):
        for ri, region in enumerate(_column_regions(col)):
            parts.append(" ".join(region))
            tags.append(f"pdf:c{ci}r{ri}")

    spans: List[dict] = []
    pos = 0
    for i, (text, tag) in enumerate(zip(parts, tags)):
        if i > 0:
            pos += 2
        spans.append(
            {
                "block_id": i,
                "char_start": pos,
                "char_end": pos + len(text),
                "tag": tag,
                "text_density": float(len(text)),
                "link_density": 0.0,
            }
        )
        pos += len(text)
    return "\n\n".join(parts), spans
