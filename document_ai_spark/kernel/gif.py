"""Pure stdlib+numpy GIF (87a/89a) decoder + encoder twin.

GIF remains a common real web image format (and the historical animation
container); without it the multimodal real-decode path would sniff these
payloads as 'unknown'. Same total-with-ValueError determinism contract as
the other kernel codecs (kernel/media.py, kernel/jpeg.py).

Decoder scope (documented):
  * GIF87a and GIF89a; global and local color tables; interlaced and
    non-interlaced images; extension blocks are skipped (including
    graphic control — transparency does not affect luminance);
  * the FIRST image frame only — for an animated GIF the luminance
    contract is the first frame, matching how a training-data pipeline
    samples a poster frame;
  * LZW per the GIF convention: LSB-first bit packing, variable initial
    code size from the stream, CLEAR/EOI codes, width grows when the
    table reaches 2^width, 12-bit cap with implicit-clear behavior
    (a full table keeps emitting 12-bit codes until CLEAR).

Note this LZW is NOT the PDF variant (kernel/pdf_extract.py): PDF packs
MSB-first with fixed 8-bit roots + EarlyChange; GIF packs LSB-first with
stream-declared root size. They share nothing but the name, so the
implementations are deliberately separate.

Output is (width, height, 2-D uint8 LUMINANCE) of the first frame,
composed onto the logical screen (background-filled) when the frame is
smaller — the same contract as decode_png/decode_bmp/decode_jpeg.

The encoder twin writes single-frame GIF89a with a global color table
(grayscale ramp palette) and real LZW, optionally interlaced — the
deterministic generator for fixtures and the q48 truth corpus.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

_LUMA_R, _LUMA_G, _LUMA_B = 299, 587, 114
_MAX_PIXELS = 16_000_000  # same sampled-media envelope as media.py

# interlace passes: (row offset, row step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """GIF bytes -> (width, height, 2-D uint8 LUMINANCE of frame 1).
    Total with ValueError."""
    try:
        return _decode_gif_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError...
        raise ValueError(f"gif: malformed ({type(exc).__name__}: {exc})")


def _read_color_table(payload: bytes, pos: int, n: int) -> Tuple[np.ndarray, int]:
    raw = payload[pos : pos + 3 * n]
    if len(raw) < 3 * n:
        raise ValueError("gif: short color table")
    tab = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3).astype(np.uint32)
    luma = ((tab[:, 0] * _LUMA_R + tab[:, 1] * _LUMA_G + tab[:, 2] * _LUMA_B) // 1000).astype(
        np.uint8
    )
    return luma, pos + 3 * n


def _skip_subblocks(payload: bytes, pos: int) -> int:
    n = len(payload)
    while pos < n:
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return pos
        pos += ln
    raise ValueError("gif: unterminated sub-blocks")


def _collect_subblocks(payload: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    n = len(payload)
    while pos < n:
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += payload[pos : pos + ln]
        pos += ln
    raise ValueError("gif: unterminated image data")


def _lzw_decode_gif(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-convention LZW: LSB-first packing, CLEAR = 2^mcs, EOI = CLEAR+1,
    width grows when next_code hits 2^width (cap 12 bits — a full table
    keeps the width until CLEAR). Output capped at ``max_pixels``."""
    if not (2 <= min_code_size <= 11):
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    table: List[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: emit what we have (total)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes((i,)) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("gif: pixel data exceeds declared size")
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _decode_gif_inner(payload: bytes) -> Tuple[int, int, np.ndarray]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    width, height = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise ValueError("gif: dimensions out of range")
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (packed & 0x07))
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos = _skip_subblocks(payload, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor (first frame decoded, then done)
        left, top, iw, ih = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        if iw <= 0 or ih <= 0 or iw * ih > _MAX_PIXELS:
            raise ValueError("gif: frame dimensions out of range")
        lct = None
        if ipacked & 0x80:
            lct, pos = _read_color_table(payload, pos, 2 << (ipacked & 0x07))
        luma_tab = lct if lct is not None else gct
        if luma_tab is None:
            raise ValueError("gif: no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _collect_subblocks(payload, pos)
        idx = _lzw_decode_gif(data, mcs, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("gif: short pixel data")
        frame = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            de = np.empty_like(frame)
            src = 0
            for off, step in _GIF_INTERLACE:
                rows = range(off, ih, step)
                for r in rows:
                    de[r] = frame[src]
                    src += 1
            frame = de
        gray_frame = luma_tab[np.minimum(frame, len(luma_tab) - 1)]
        if (left, top, iw, ih) == (0, 0, width, height):
            return width, height, gray_frame
        # compose onto the logical screen, background-filled
        bg = int(gct[min(bg_index, len(gct) - 1)]) if gct is not None else 0
        screen = np.full((height, width), bg, dtype=np.uint8)
        y1 = min(top + ih, height)
        x1 = min(left + iw, width)
        screen[top:y1, left:x1] = gray_frame[: y1 - top, : x1 - left]
        return width, height, screen
    raise ValueError("gif: no image frame")


# ---------------------------------------------------------------------------
# encoder twin (single frame, grayscale ramp palette)


def _lzw_encode_gif(indices: bytes, min_code_size: int) -> bytes:
    """GIF-convention LZW encoder (LSB-first), the decode twin."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes((b,))
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # decoder grows its read width when the TABLE SIZE reaches
        # 2^width; its table is one entry ahead after consuming the code
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes((b,))
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(gray: np.ndarray, interlace: bool = False) -> bytes:
    """2-D uint8 array -> single-frame GIF89a with a 256-entry grayscale
    ramp global color table (pixel value == palette index == luminance,
    so decode is lossless). Deterministic; ``interlace=True`` writes the
    4-pass row order."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("gif: empty image")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | 0x07, 0, 0))  # GCT present, 256 entries
    for i in range(256):
        out += bytes((i, i, i))  # grayscale ramp: luma == index
    out += bytes((0x2C,)) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes((0x40 if interlace else 0x00,))
    if interlace:
        rows = [gray[r] for off, step in _GIF_INTERLACE for r in range(off, h, step)]
        flat = np.concatenate(rows).tobytes() if rows else b""
    else:
        flat = gray.tobytes()
    out += bytes((8,))  # LZW min code size
    lzw = _lzw_encode_gif(flat, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += bytes((0, 0x3B))
    return bytes(out)
