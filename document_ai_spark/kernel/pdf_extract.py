"""Deterministic layout-aware text extraction from (synthetic) PDF payloads.

Capability analog of the reference's layout-aware PDF parse (the reference
delegates to docling/docling-parse, reference file
services/ai_service/document_conversion/docling_pdf_loader.py:26-33). This is
a from-scratch kernel over an honest PDF content-stream subset:

  * payloads start with the ``%PDF`` magic;
  * document structure: ``N 0 obj … endobj`` objects; a ``/Type/Pages``
    node whose ``/Kids [a 0 R b 0 R …]`` array fixes PAGE ORDER (which may
    differ from document byte order); each ``/Type/Page`` either embeds its
    content stream inline or references it via ``/Contents n 0 R``.
    Payloads with no page tree fall back to all ``stream…endstream``
    sections in document order as a single page (the round-1 subset);
  * content streams are tokenized (not regexed): strings with the full
    PDF escape set (``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r`` ``\\t``
    octal ``\\ddd``, nested balanced parens), numbers, names, arrays, and
    the text operators

        Tf (font size)        Td / TD (relative line translate, ACCUMULATES
        Tm (text matrix —      within a text object; TD also sets leading)
            e,f position)     TL (leading)   T* (next line)   ' (T* + show)
        Tj (show string)      TJ (show array: strings concatenated, a
                                  kerning adjustment <= -180/1000 em is a
                                  word space — the standard heuristic)

The kernel then does genuine layout analysis per page, not string grepping:

  1. every shown string becomes an item (x, y, size, text);
  2. drop running header/footer bands (y >= 750 or y <= 50) — the PDF analog
     of HTML nav/footer boilerplate;
  3. cluster the remaining items into COLUMNS by x-coordinate gaps
     (1-D region segmentation: a gap > COLUMN_GAP between sorted unique x
     starts a new column — handles one- and two-column layouts);
  4. within a column, sort lines top-to-bottom (y descending, then x) and
     split into paragraph REGIONS wherever the vertical gap between
     consecutive lines exceeds PARA_GAP_FACTOR * font size;
  5. reading order = pages in /Kids order, columns left-to-right, regions
     top-to-bottom; lines joined with a single space inside a region,
     regions (and pages) joined "\\n\\n".

Everything is integer-rounded arithmetic + stable sorts => byte-identical
output at any partition count / parallelism level.

Also handled: ``/Filter /FlateDecode`` content streams (zlib-inflated
before tokenizing — the overwhelmingly common real-PDF encoding),
``/Filter /ASCIIHexDecode`` and ``/Filter /ASCII85Decode`` streams, and
hex strings ``<48656C6C6F>``
(decoded per spec: whitespace ignored, odd final digit padded with 0).

Out of scope (documented): font widths / ToUnicode CMaps (text is assumed
to be in a byte-transparent encoding), rotation in Tm (only the e,f
translation is honored), /LZWDecode and filter CHAINS.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

PDF_MAGIC = b"%PDF"
COLUMN_GAP = 100          # min horizontal gap (pts) starting a new column
PARA_GAP_FACTOR = 2       # vertical gap > factor*size => paragraph break
HEADER_Y = 750            # y >= this is running-header band
FOOTER_Y = 50             # y <= this is running-footer band
TJ_SPACE_THRESHOLD = -180  # TJ kerning <= this (1/1000 em) acts as a space

_OBJ_START_RE = re.compile(rb"(\d+)\s+\d+\s+obj")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_AHX_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/ASCIIHexDecode")
_A85_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/ASCII85Decode")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
# direct /Length only — '/Length 4 0 R' must NOT parse as length 4
_LENGTH_DIRECT_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_CONTENTS_ANY_RE = re.compile(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)")
_INT_RE = re.compile(rb"\s*(\d+)")

_DELIMS = b" \t\r\n()[]<>/%"
_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def is_pdf(payload: bytes) -> bool:
    return payload[:4] == PDF_MAGIC


# ---------------------------------------------------------------------------
# document structure: page splitting


_STREAM_START_RE = re.compile(rb"stream\r?\n")


def _scan_objects(payload: bytes) -> dict:
    """num -> object body, by FORWARD scan that skips declared-length
    stream payloads — so binary stream data containing b'endobj' or a
    b'N 0 obj' lookalike can never truncate or split an object (the same
    hazard _stream_bytes guards for b'endstream', one level up). Streams
    with an INDIRECT /Length (N 0 R — the value object may appear later in
    the file, so it cannot be resolved mid-scan) fall back to
    endstream-keyword delimiting; _stream_bytes resolves the actual value
    afterwards, when every object is known."""
    objs: dict = {}
    pos = 0
    n = len(payload)
    while True:
        m = _OBJ_START_RE.search(payload, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        search_from = body_start
        sm = _STREAM_START_RE.search(payload, body_start)
        em_naive = payload.find(b"endobj", body_start)
        if sm is not None and (em_naive == -1 or sm.start() < em_naive):
            # the stream belongs to THIS object: jump over its payload
            lm = _LENGTH_DIRECT_RE.search(payload[body_start : sm.start()])
            if lm:
                search_from = sm.end() + int(lm.group(1))
            else:
                es = payload.find(b"endstream", sm.end())
                search_from = es if es != -1 else n
        em = payload.find(b"endobj", search_from)
        if em == -1:
            objs[num] = payload[body_start:]
            break
        objs[num] = payload[body_start:em]
        pos = em + 6  # len(b"endobj")
    return objs


def _stream_bytes(obj_body: bytes, objs: dict | None = None) -> bytes:
    """Content-stream bytes of one object: delimited by /Length when
    declared — directly, or via an indirect reference resolved against
    ``objs`` (binary flate data may legally contain b'endstream') — else
    by the endstream keyword; inflated when the object dict declares
    /Filter /FlateDecode. A corrupt flate stream contributes nothing
    (per-document error isolation, the kernel stays total)."""
    m = _STREAM_START_RE.search(obj_body)
    if not m:
        return b""
    start = m.end()
    head = obj_body[: m.start()]
    length = None
    lm = _LENGTH_DIRECT_RE.search(head)
    if lm:
        length = int(lm.group(1))
    elif objs is not None:
        rm = _LENGTH_REF_RE.search(head)
        if rm:
            im = _INT_RE.match(objs.get(int(rm.group(1)), b""))
            if im:
                length = int(im.group(1))
    if length is not None:
        data = obj_body[start : start + length]
    else:
        em = obj_body.find(b"endstream", start)
        data = obj_body[start : em if em != -1 else len(obj_body)]
    if _FLATE_RE.search(head):
        import zlib

        try:
            data = zlib.decompress(data)
        except zlib.error:
            return b""
    elif _AHX_RE.search(head):
        # ASCIIHexDecode: hex digits, whitespace ignored, '>' terminates,
        # odd final digit padded with 0 (PDF 32000-1 §7.4.2)
        body = data.split(b">", 1)[0]
        digits = bytes(d for d in body if d in b"0123456789abcdefABCDEF")
        if len(digits) % 2:
            digits += b"0"
        try:
            data = bytes.fromhex(digits.decode("ascii"))
        except ValueError:
            return b""
    elif _A85_RE.search(head):
        # ASCII85Decode (§7.4.3): optional '<~' prefix, '~>' EOD,
        # whitespace ignored, 'z' = four zero bytes. Framing stripped
        # manually — PDF streams usually carry only the trailing EOD.
        import base64

        body = data.strip()
        if body.startswith(b"<~"):
            body = body[2:]
        end = body.find(b"~>")
        if end != -1:
            body = body[:end]
        try:
            data = base64.a85decode(body, ignorechars=b" \t\r\n\v\f")
        except ValueError:
            return b""
    return data


def _split_pages(payload: bytes) -> List[bytes]:
    """-> one content-stream bytes blob per page, in reading (/Kids) order.

    Fallback when no /Pages tree exists: every stream section in document
    order, concatenated as a single page (the constrained round-1 subset,
    kept so simple single-stream payloads and goldens stay stable)."""
    objs = _scan_objects(payload)
    kids: List[int] = []
    for body in objs.values():
        if re.search(rb"/Type\s*/Pages\b", body):
            km = _KIDS_RE.search(body)
            if km:
                kids = [int(r) for r in _REF_RE.findall(km.group(1))]
            break
    if kids:
        pages = []
        for pnum in kids:
            body = objs.get(pnum, b"")
            cm = _CONTENTS_ANY_RE.search(body)
            if cm:
                # single ref or the standard ARRAY form [3 0 R 5 0 R …]:
                # the page's content is the concatenation of every
                # referenced stream, in array order
                refs = [int(r) for r in _REF_RE.findall(cm.group(1))]
                pages.append(
                    b"\n".join(_stream_bytes(objs.get(r, b""), objs) for r in refs)
                )
            else:
                pages.append(_stream_bytes(body, objs))
        return pages
    parts = _STREAM_RE.findall(payload)
    return [b"\n".join(parts) if parts else payload]


# ---------------------------------------------------------------------------
# content-stream tokenizer


def _scan_string(s: bytes, i: int) -> Tuple[str, int]:
    """Scan a PDF literal string starting at s[i] == '(' — handles the
    escape set and balanced nested parens. Returns (decoded, next_index)."""
    assert s[i : i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            nxt = s[i + 1]
            esc = _ESCAPES.get(nxt)
            if esc is not None:
                out += esc
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal \d, \dd or \ddd
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= s[j] <= 0x37:
                    oct_digits.append(s[j])
                    j += 1
                out.append(int(bytes(oct_digits), 8) & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:  # unknown escape: PDF spec says drop the backslash
                out.append(nxt)
                i += 2
            continue
        if c == 0x28:  # (
            depth += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return out.decode("utf-8", errors="replace"), i


def _tokens(stream: bytes) -> Iterator[Tuple[str, object]]:
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c in b" \t\r\n\f\0":
            i += 1
        elif c == b"(":
            text, i = _scan_string(stream, i)
            yield ("str", text)
        elif c == b"[":
            yield ("arr_open", None)
            i += 1
        elif c == b"]":
            yield ("arr_close", None)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and stream[j : j + 1] not in _DELIMS:
                j += 1
            yield ("name", stream[i + 1 : j].decode("latin-1"))
            i = j
        elif c == b"%":  # comment to end of line
            j = stream.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == b"<":
            if stream[i + 1 : i + 2] == b"<":  # dict open <<
                i += 2
            else:  # hex string <48656C6C6F>: whitespace ignored, odd padded
                j = stream.find(b">", i + 1)
                if j == -1:
                    j = n
                digits = bytes(
                    d for d in stream[i + 1 : j] if d in b"0123456789abcdefABCDEF"
                )
                if len(digits) % 2:
                    digits += b"0"
                try:
                    text = bytes.fromhex(digits.decode("ascii")).decode(
                        "utf-8", errors="replace"
                    )
                except ValueError:
                    text = ""
                yield ("str", text)
                i = j + 1 if j < n else n
        elif c == b">":  # dict close (>> or stray)
            i += 1
        else:
            j = i
            while j < n and stream[j : j + 1] not in _DELIMS:
                j += 1
            if j == i:  # stray delimiter (e.g. unmatched ')'): skip it —
                i += 1  # zero-progress here would loop forever
                continue
            tok = stream[i:j].decode("latin-1")
            i = j
            try:
                yield ("num", float(tok))
            except ValueError:
                yield ("op", tok)


# ---------------------------------------------------------------------------
# text-operator interpreter


def _parse_items(stream: bytes) -> List[Tuple[int, int, int, str]]:
    """-> list of (x, y, size, text) for every shown string, document order."""
    items: List[Tuple[int, int, int, str]] = []
    size = 12.0
    line_x = line_y = 0.0        # start of current text line
    leading = 0.0
    nums: List[float] = []       # numeric operand stack
    strs: List[str] = []         # string operand stack (Tj / ')
    arr: List[object] | None = None  # TJ array being collected

    def show(text: str) -> None:
        text = " ".join(text.split())
        if text:
            items.append((int(round(line_x)), int(round(line_y)), int(round(size)), text))

    def tstar() -> None:
        nonlocal line_y
        line_y -= leading

    for kind, val in _tokens(stream):
        if kind == "num":
            (arr if arr is not None else nums).append(val)
        elif kind == "str":
            if arr is not None:
                arr.append(val)
            else:
                strs.append(val)
        elif kind == "arr_open":
            arr = []
        elif kind == "arr_close":
            pass  # keep arr until its operator (TJ) consumes it
        elif kind == "name":
            pass  # font names etc.: operands only
        elif kind == "op":
            op = val
            if op == "BT":
                line_x = line_y = 0.0
                leading = 0.0
            elif op == "Tf":
                if nums:
                    size = nums[-1]
            elif op in ("Td", "TD"):
                if len(nums) >= 2:
                    line_x += nums[-2]
                    line_y += nums[-1]
                    if op == "TD":
                        leading = -nums[-1]
            elif op == "Tm":
                if len(nums) >= 6:
                    line_x, line_y = nums[-2], nums[-1]
            elif op == "TL":
                if nums:
                    leading = nums[-1]
            elif op == "T*":
                tstar()
            elif op == "Tj":
                if strs:
                    show(strs[-1])
            elif op == "'":
                tstar()
                if strs:
                    show(strs[-1])
            elif op == "TJ":
                if arr is not None:
                    pieces: List[str] = []
                    for el in arr:
                        if isinstance(el, str):
                            pieces.append(el)
                        elif el <= TJ_SPACE_THRESHOLD:
                            pieces.append(" ")
                    show("".join(pieces))
            # every operator consumes its operands
            nums = []
            strs = []
            arr = None
    return items


# ---------------------------------------------------------------------------
# layout analysis (per page)


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

    Spans carry tag='pdf:c<col>r<region>' (single page) or
    'pdf:p<page>c<col>r<region>' (multi-page); densities are 1.0/0.0 (a PDF
    text region has no links).
    """
    pages = _split_pages(payload)
    multi = len(pages) > 1

    parts: List[str] = []
    tags: List[str] = []
    for pi, stream in enumerate(pages):
        items = _parse_items(stream)
        body = [it for it in items if FOOTER_Y < it[1] < HEADER_Y]
        for ci, col in enumerate(_cluster_columns(body)):
            for ri, region in enumerate(_column_regions(col)):
                parts.append(" ".join(region))
                tags.append(f"pdf:p{pi}c{ci}r{ri}" if multi else f"pdf:c{ci}r{ri}")

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
