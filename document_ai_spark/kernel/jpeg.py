"""Pure stdlib+numpy baseline JPEG (JFIF) codec.

JPEG is the dominant real web image format; without it the multimodal
real-decode path (operators/multimodal.py) would sniff the most common
payload as 'unknown'. The reference leans on docling's PIL/pillow stack
for image handling (reference docling usage: services/ai_service
dependencies, uv.lock pins) — this is the from-scratch Spark-side
counterpart, same total-with-ValueError determinism contract as the
PNG/BMP/WAV codecs in kernel/media.py.

Decoder scope (documented):
  * Baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2: spectral
    selection + successive approximation — DC first/refine, AC
    first/refine with EOB runs; tables may be redefined between scans;
    scans are decoded streaming so inter-scan DHT/DQT/DRI updates apply).
    Arithmetic coding, lossless and hierarchical modes raise ValueError
    (caller isolates, the external-codec seam).
  * Progressive scans that touch only chroma components are SKIPPED
    (entropy data jumped to the next marker) — the luminance contract
    never needs them, and unlike baseline's interleaved MCUs their bits
    are not entangled with Y.
  * 8-bit precision; 1..4 components; sampling factors 1..4 (covers
    4:4:4, 4:2:2, 4:2:0); restart intervals (DRI + RSTn markers).
  * Output is the LUMINANCE plane (component 1 / Y) — the same
    (width, height, 2-D uint8) contract as decode_png/decode_bmp; chroma
    blocks are entropy-decoded (they must be, to advance the bit
    stream) but not color-converted.

Encoder scope: single-component (grayscale) baseline JFIF with the
ISO/IEC 10918-1 Annex K example luminance quantization + huffman tables,
libjpeg-style quality scaling. It exists as the deterministic
generator/test twin of the decoder (fixtures + q48 truth corpus), like
encode_png/encode_bmp/encode_wav — independent of the decode path
(separate bit-writer, forward DCT, no shared state beyond the public
Annex K constants, which ARE the interchange format).

Everything is a pure function of the payload bytes: no RNG, no wall
clock — features stay byte-identical at any parallelism. The DCT/IDCT
run in float64 (IEEE 754 ops, bit-stable for a fixed numpy) and round
once at the end.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# shared interchange constants (ISO/IEC 10918-1)

# zigzag order: index i of the scan -> (row, col) flattened position
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example luminance quantization table (zigzag order NOT applied;
# this is row-major natural order)
_STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 luminance DC: (bits per code length 1..16, symbol values)
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
# Annex K.5 luminance AC
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: row k = c(k) * cos((2j+1) k pi / 16) / 2
_DCT_M = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _j in range(8):
        _DCT_M[_k, _j] = _c * np.cos((2 * _j + 1) * _k * np.pi / 16.0)


def _huff_decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(code length, code) -> symbol, built by the canonical JPEG code
    assignment (C.2): codes of each length are consecutive, shifted left
    when the length grows."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length); inverse of the canonical assignment."""
    return {v: (c, l) for (l, c), v in _huff_decode_table(bits, vals).items()}


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """JPEG bytes -> (width, height, 2-D uint8 LUMINANCE array). Total
    with ValueError: any malformed/out-of-scope payload raises exactly
    ValueError (caller isolates), like the other kernel codecs."""
    try:
        return _decode_jpeg_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, IndexError, KeyError...
        raise ValueError(f"jpeg: malformed ({type(exc).__name__}: {exc})")


_MAX_PIXELS = 16_000_000  # same sampled-media envelope as media.py
# progressive scan budget: real encoders emit ~10-20 scans; a crafted
# SOF2 payload with thousands of tiny scans would otherwise buy O(blocks)
# Python work per scan — the CPU analog of a zlib bomb (the kernel's
# contract is to ISOLATE such payloads, not chew on them)
_MAX_PROG_SCANS = 64


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG byte
    unstuffing (FF 00 -> FF) and restart-marker awareness: hitting any
    marker (FF xx, xx != 0) ends the current run of bits; RSTn markers
    are consumed by reset()."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: reset() consumes it
            else:
                return False  # EOI or next segment
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("jpeg: bit stream exhausted")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def reset(self) -> None:
        """Byte-align and consume one RSTn marker (F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("jpeg: missing restart marker")


def _huff_read(br: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """F.2.4.3.1 EXTEND: map t low bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(
    br: _BitReader,
    dc_tab: Dict[Tuple[int, int], int],
    ac_tab: Dict[Tuple[int, int], int],
    qtab: np.ndarray,
    pred: int,
) -> Tuple[np.ndarray, int]:
    """One 8x8 block: huffman-decode, dequantize, de-zigzag, IDCT.
    Returns (spatial block float64, new DC predictor)."""
    coef = np.zeros(64, dtype=np.int64)
    t = _huff_read(br, dc_tab)
    if t > 15:
        raise ValueError("jpeg: bad DC category")
    pred += _extend(br.read_bits(t), t)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _huff_read(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC index out of range")
        coef[k] = _extend(br.read_bits(s), s)
        k += 1
    dq = np.zeros(64, dtype=np.float64)
    dq[_ZIGZAG] = coef * qtab  # qtab is stored in zigzag order
    block = _DCT_M.T @ dq.reshape(8, 8) @ _DCT_M
    return block, pred


def _next_marker(payload: bytes, pos: int) -> int:
    """Index of the next real marker (FF xx, xx not 00/FF/RSTn) at or
    after ``pos`` — used to skip a scan's entropy-coded data."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        nxt = payload[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
        elif nxt == 0xFF:  # fill byte
            pos += 1
        else:
            return pos
    return n


def _ac_refine_block(br: _BitReader, ac_tab, coef, ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement for one block (G.1.2.3 /
    libjpeg decode_mcu_AC_refine). ``coef`` is the block's zigzag-order
    int64 view; returns the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_read(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            s_val = 0
            if s == 0:
                if r < 15:
                    # unlike the first-scan form, the current block is a
                    # member of this EOB run and is consumed by the
                    # tail-correction pass below (which decrements)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("jpeg: bad AC refinement magnitude")
                s_val = p1 if br.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if br.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if br.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    payload: bytes,
    start: int,
    scan_comps: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    state: dict,
) -> int:
    """Decode one progressive scan's entropy data into the per-component
    coefficient planes (zigzag order); returns the next marker position.
    ``scan_comps`` is [(comp_index, td, ta), ...] in scan order."""
    comps = state["comps"]
    coefs = state["coefs"]
    dc_tabs, ac_tabs = state["dc_tabs"], state["ac_tabs"]
    ri = state["restart_interval"]
    br = _BitReader(payload, start)
    eobrun = 0
    preds = [0] * len(comps)
    unit = 0  # MCU (interleaved) / block (single-component) counter

    def maybe_restart():
        nonlocal eobrun, preds
        if ri and unit and unit % ri == 0:
            br.reset()
            preds = [0] * len(comps)
            eobrun = 0

    if len(scan_comps) > 1:
        if ss != 0:
            raise ValueError("jpeg: interleaved AC scan not allowed")
        for my in range(state["mcuy"]):
            for mx in range(state["mcux"]):
                maybe_restart()
                for ci, td, _ta in scan_comps:
                    comp = comps[ci]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coef = coefs[ci][my * comp["v"] + by][mx * comp["h"] + bx]
                            if ah == 0:
                                t = _huff_read(br, dc_tabs[td])
                                if t > 15:
                                    raise ValueError("jpeg: bad DC category")
                                preds[ci] += _extend(br.read_bits(t), t)
                                coef[0] = preds[ci] << al
                            elif br.read_bit():
                                coef[0] |= 1 << al
                unit += 1
    else:
        ci, td, ta = scan_comps[0]
        comp = comps[ci]
        # non-interleaved block grid: ceil(ceil(pixels/hmax-scale)/8), no
        # MCU padding (A.2.2)
        bw = _ceil_div(_ceil_div(state["width"] * comp["h"], state["hmax"]), 8)
        bh = _ceil_div(_ceil_div(state["height"] * comp["v"], state["vmax"]), 8)
        for row in range(bh):
            for col in range(bw):
                maybe_restart()
                coef = coefs[ci][row][col]
                if ss == 0:  # DC scan, non-interleaved
                    if ah == 0:
                        t = _huff_read(br, dc_tabs[td])
                        if t > 15:
                            raise ValueError("jpeg: bad DC category")
                        preds[ci] += _extend(br.read_bits(t), t)
                        coef[0] = preds[ci] << al
                    elif br.read_bit():
                        coef[0] |= 1 << al
                elif ah == 0:  # AC first scan
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            rs = _huff_read(br, ac_tabs[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                                k += 16
                                continue
                            k += r
                            if k > se:
                                raise ValueError("jpeg: AC index out of band")
                            coef[k] = _extend(br.read_bits(s), s) << al
                            k += 1
                else:  # AC refinement
                    eobrun = _ac_refine_block(br, ac_tabs[ta], coef, ss, se, al, eobrun)
                unit += 1
    return _next_marker(payload, br.pos)


def _decode_jpeg_inner(payload: bytes) -> Tuple[int, int, np.ndarray]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad magic")
    pos = 2
    n = len(payload)
    qtabs: Dict[int, np.ndarray] = {}
    dc_tabs: Dict[int, Dict] = {}
    ac_tabs: Dict[int, Dict] = {}
    comps: List[dict] = []
    width = height = 0
    restart_interval = 0
    scan_pos = -1
    progressive = False
    prog: dict | None = None  # coefficient planes, allocated at first SOS
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1  # tolerate fill bytes
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                if tab.size != 64:
                    raise ValueError("jpeg: short DQT")
                qtabs[tq] = tab
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("jpeg: short DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decode_table(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"jpeg: precision {prec} unsupported")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if not (1 <= nc <= 4):
                raise ValueError("jpeg: bad component count")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline/progressive DCT supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if not progressive:
                sel = {}
                for s in range(ns):
                    cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                    sel[cs] = (tt >> 4, tt & 0x0F)
                for comp in comps:
                    if comp["id"] not in sel:
                        raise ValueError("jpeg: non-interleaved multi-scan unsupported")
                    comp["td"], comp["ta"] = sel[comp["id"]]
                scan_pos = pos + 2 + seglen
                break
            # PROGRESSIVE: decode this scan now (tables/DRI may change
            # between scans, so state must be captured streaming)
            if prog is None:
                if not comps or width == 0 or height == 0:
                    raise ValueError("jpeg: SOS before SOF")
                if width * height > _MAX_PIXELS:
                    raise ValueError("jpeg: dimensions out of range")
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
                    raise ValueError("jpeg: bad sampling factors")
                mcux = -(-width // (8 * hmax))
                mcuy = -(-height // (8 * vmax))
                prog = {
                    "comps": comps,
                    "coefs": [
                        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                        for c in comps
                    ],
                    "dc_tabs": dc_tabs,
                    "ac_tabs": ac_tabs,
                    "mcux": mcux,
                    "mcuy": mcuy,
                    "width": width,
                    "height": height,
                    "hmax": hmax,
                    "vmax": vmax,
                }
            prog["n_scans"] = prog.get("n_scans", 0) + 1
            if prog["n_scans"] > _MAX_PROG_SCANS:
                raise ValueError("jpeg: progressive scan count exceeds budget")
            prog["restart_interval"] = restart_interval
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("jpeg: short SOS")
            scan_comps = []
            touches_luma = False
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                idx = next((i for i, c in enumerate(comps) if c["id"] == cs), None)
                if idx is None:
                    raise ValueError("jpeg: SOS names unknown component")
                if idx == 0:
                    touches_luma = True
                scan_comps.append((idx, tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if not (0 <= ss <= se <= 63 and al <= 13):
                raise ValueError("jpeg: bad spectral selection")
            data_start = pos + 2 + seglen
            if touches_luma:
                pos = _decode_prog_scan(
                    payload, data_start, scan_comps, ss, se, ah, al, prog
                )
            else:  # chroma-only scan: luminance never needs it
                pos = _next_marker(payload, data_start)
            continue
        pos += 2 + seglen
    if progressive:
        if prog is None:
            raise ValueError("jpeg: progressive file with no scans")
        y0 = comps[0]
        if y0["tq"] not in qtabs:
            raise ValueError("jpeg: missing quant table")
        qtab = qtabs[y0["tq"]]
        coefs0 = prog["coefs"][0]
        bh, bw = coefs0.shape[:2]
        luma = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for row in range(bh):
            for col in range(bw):
                dq = np.zeros(64, dtype=np.float64)
                dq[_ZIGZAG] = coefs0[row][col] * qtab
                luma[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = (
                    _DCT_M.T @ dq.reshape(8, 8) @ _DCT_M
                )
        gray = np.clip(np.round(luma + 128.0), 0, 255).astype(np.uint8)
        hmax, vmax = prog["hmax"], prog["vmax"]
        if y0["h"] != hmax or y0["v"] != vmax:
            gray = np.repeat(
                np.repeat(gray, vmax // y0["v"], axis=0), hmax // y0["h"], axis=1
            )
        return width, height, gray[:height, :width]

    if scan_pos < 0 or not comps or width == 0 or height == 0:
        raise ValueError("jpeg: missing SOF/SOS")
    if width * height > _MAX_PIXELS:
        raise ValueError("jpeg: dimensions out of range")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        raise ValueError("jpeg: bad sampling factors")
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # luminance plane at full MCU-grid resolution for component 0
    y0 = comps[0]
    yw, yh = mcux * y0["h"] * 8, mcuy * y0["v"] * 8
    luma = np.zeros((yh, yw), dtype=np.float64)
    for comp in comps:
        if comp["tq"] not in qtabs:
            raise ValueError("jpeg: missing quant table")
        if comp["td"] not in dc_tabs or comp["ta"] not in ac_tabs:
            raise ValueError("jpeg: missing huffman table")
    br = _BitReader(payload, scan_pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.reset()
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block, preds[ci] = _decode_block(
                            br,
                            dc_tabs[comp["td"]],
                            ac_tabs[comp["ta"]],
                            qtabs[comp["tq"]],
                            preds[ci],
                        )
                        if ci == 0:
                            oy = (my * comp["v"] + by) * 8
                            ox = (mx * comp["h"] + bx) * 8
                            luma[oy : oy + 8, ox : ox + 8] = block
            mcu_count += 1
    # component 0's plane covers width*h0/hmax pixels; scale to full size
    # by pixel replication if Y itself is subsampled (rare; h0=hmax norm)
    gray = np.clip(np.round(luma + 128.0), 0, 255).astype(np.uint8)
    if y0["h"] != hmax or y0["v"] != vmax:
        gray = np.repeat(np.repeat(gray, vmax // y0["v"], axis=0), hmax // y0["h"], axis=1)
    return width, height, gray[:height, :width]


# ---------------------------------------------------------------------------
# encoder (grayscale baseline — generator/test twin)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-fill) and emit RSTm — F.1.2.3."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes((0xFF, 0xD0 + (m & 7)))


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 -> table as-is, 1..50 -> 5000/q%,
    51..100 -> (200-2q)%; clamped to 1..255 (baseline 8-bit DQT)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bwriter: _BitWriter,
    spatial: np.ndarray,
    qnat: np.ndarray,
    dc_enc: Dict[int, Tuple[int, int]],
    ac_enc: Dict[int, Tuple[int, int]],
    pred: int,
) -> int:
    """Forward-DCT, quantize and huffman-encode one 8x8 level-shifted
    block; returns the new DC predictor."""
    block = _DCT_M @ spatial @ _DCT_M.T
    coef = np.round(block / qnat).astype(np.int64).reshape(-1)[_ZIGZAG]
    diff = int(coef[0]) - pred
    pred = int(coef[0])
    t = _category(diff)
    code, ln = dc_enc[t]
    bwriter.write(code, ln)
    if t:
        bwriter.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and coef[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bwriter.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_enc[(run << 4) | s]
        bwriter.write(code, ln)
        bwriter.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]  # EOB
        bwriter.write(code, ln)
    return pred


def _pad_blocks(gray: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate to a multiple of ``mult`` in both axes, -128 shift."""
    h, w = gray.shape
    bh, bw = -(-h // mult) * mult, -(-w // mult) * mult
    padded = np.empty((bh, bw), dtype=np.float64)
    padded[:h, :w] = gray
    padded[h:, :w] = gray[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    return padded - 128.0


def _jfif_headers(h: int, w: int, qz: np.ndarray, components: bytes) -> bytearray:
    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes((0x00,)) + bytes(int(x) for x in qz))  # DQT id 0
    nc = len(components) // 3
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, nc) + components)  # SOF0
    out += seg(0xC4, bytes((0x00,)) + bytes(_STD_DC_BITS) + bytes(_STD_DC_VALS))
    out += seg(0xC4, bytes((0x10,)) + bytes(_STD_AC_BITS) + bytes(_STD_AC_VALS))
    return out


def encode_jpeg(gray: np.ndarray, quality: int = 85) -> bytes:
    """2-D uint8 array -> single-component (grayscale) baseline JFIF
    bytes with the Annex K example tables. Deterministic."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    qtab = _quality_scale(_STD_LUMA_Q, quality)
    dc_enc = _huff_encode_table(_STD_DC_BITS, _STD_DC_VALS)
    ac_enc = _huff_encode_table(_STD_AC_BITS, _STD_AC_VALS)
    padded = _pad_blocks(gray, 8)
    qnat = qtab.astype(np.float64).reshape(8, 8)
    bwriter = _BitWriter()
    pred = 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            pred = _encode_block(
                bwriter, padded[by : by + 8, bx : bx + 8], qnat, dc_enc, ac_enc, pred
            )
    out = _jfif_headers(h, w, qtab[_ZIGZAG], bytes((1, 0x11, 0)))
    out += bytes((0xFF, 0xDA)) + struct.pack(">H", 8) + bytes((1, 1, 0x00, 0, 63, 0))
    out += bwriter.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_420(
    gray: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """2-D uint8 array -> THREE-component YCbCr 4:2:0 baseline JFIF with
    neutral chroma (Cb=Cr=128 — grayscale content in the container shape
    nearly all real web JPEGs use: interleaved 16x16 MCUs of 4 Y + 1 Cb +
    1 Cr blocks, all referencing quant table 0 / huffman tables 0).
    Optional DRI restart interval (RSTn every N MCUs, predictors reset).
    Exists so the decoder's MCU interleave / sampling-factor / chroma
    entropy / restart paths have an in-repo encoder twin."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    qtab = _quality_scale(_STD_LUMA_Q, quality)
    dc_enc = _huff_encode_table(_STD_DC_BITS, _STD_DC_VALS)
    ac_enc = _huff_encode_table(_STD_AC_BITS, _STD_AC_VALS)
    padded = _pad_blocks(gray, 16)
    qnat = qtab.astype(np.float64).reshape(8, 8)
    zero_block = np.zeros((8, 8), dtype=np.float64)  # chroma - 128 == 0
    bwriter = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(0, padded.shape[0], 16):
        for mx in range(0, padded.shape[1], 16):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwriter.restart(rst)
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            for by in (0, 8):
                for bx in (0, 8):
                    preds[0] = _encode_block(
                        bwriter, padded[my + by : my + by + 8, mx + bx : mx + bx + 8],
                        qnat, dc_enc, ac_enc, preds[0],
                    )
            preds[1] = _encode_block(bwriter, zero_block, qnat, dc_enc, ac_enc, preds[1])
            preds[2] = _encode_block(bwriter, zero_block, qnat, dc_enc, ac_enc, preds[2])
            mcu += 1
    out = _jfif_headers(
        h, w, qtab[_ZIGZAG], bytes((1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0))
    )
    if restart_interval:
        out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, restart_interval)  # DRI
    out += bytes((0xFF, 0xDA)) + struct.pack(">H", 12) + bytes(
        (3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)
    )
    out += bwriter.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (grayscale — generator/test twin of the SOF2 decoder)


def _enc_ac_first(bwriter: _BitWriter, ac_enc, coef, ss: int, se: int, al: int) -> bool:
    """AC first scan for one block: point-transformed (toward zero) band
    coefficients with runs. Returns True when the band ends early — the
    caller owes an EOB-run member for this block (runs accumulate across
    blocks, emitted lazily by _ac_first_scan_body)."""
    vals = []
    for k in range(ss, se + 1):
        c = int(coef[k])
        vals.append(c // (1 << al) if c >= 0 else -((-c) >> al))
    last = len(vals) - 1
    while last >= 0 and vals[last] == 0:
        last -= 1
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bwriter.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_enc[(run << 4) | s]
        bwriter.write(code, ln)
        bwriter.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return last < len(vals) - 1


def _ac_first_scan_body(blocks, ac_enc, ss: int, se: int, al: int) -> bytes:
    """One AC first scan over ``blocks`` with CROSS-BLOCK EOB runs: the
    EOB symbol (r<<4) covers 2^r + extra consecutive end-of-band blocks,
    emitted lazily when the next block carries band content (or at scan
    end) — exactly where the decoder reads it, since run-member blocks
    emit nothing."""
    bw_ = _BitWriter()
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        while eobrun > 0:
            chunk = min(eobrun, 32767)
            r = chunk.bit_length() - 1
            code, ln = ac_enc[r << 4]
            bw_.write(code, ln)
            if r:
                bw_.write(chunk - (1 << r), r)
            eobrun -= chunk

    for coef in blocks:
        has_content = any(int(coef[k]) >> al if int(coef[k]) >= 0 else (-int(coef[k])) >> al for k in range(ss, se + 1))
        if has_content:
            flush()
            if _enc_ac_first(bw_, ac_enc, coef, ss, se, al):
                eobrun += 1
        else:
            eobrun += 1
    flush()
    return bw_.flush()


def _enc_ac_refine(bwriter: _BitWriter, ac_enc, coef, ss: int, se: int, al: int) -> None:
    """AC refinement scan for one block (G.1.2.3 encoder side): newly
    significant coefficients as (run, 1)+sign, correction bits for
    already-significant ones buffered and flushed after the next emitted
    symbol, EOB (run of one) carrying the tail's correction bits."""
    temp = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
    ke = 0
    for i, t in enumerate(temp):
        if t == 1:
            ke = i + 1
    run = 0
    pending: List[int] = []
    for i in range(ke):
        t = temp[i]
        if t == 0:
            run += 1
            continue
        # ZRL must fire at ANY nonzero once the zero-run exceeds 15 —
        # including already-significant ones — flushing only the
        # correction bits buffered so far (the decoder's 16-zero skip
        # reads exactly those; libjpeg encode_mcu_AC_refine order)
        while run > 15:
            code, ln = ac_enc[0xF0]
            bwriter.write(code, ln)
            for b in pending:
                bwriter.write(b, 1)
            pending = []
            run -= 16
        if t > 1:
            pending.append(t & 1)
            continue
        code, ln = ac_enc[(run << 4) | 1]
        bwriter.write(code, ln)
        bwriter.write(1 if int(coef[ss + i]) > 0 else 0, 1)
        for b in pending:
            bwriter.write(b, 1)
        pending = []
        run = 0
    if ke < len(temp):
        tail = [temp[i] & 1 for i in range(ke, len(temp)) if temp[i] != 0]
        code, ln = ac_enc[0x00]  # EOB run of one: rest of band
        bwriter.write(code, ln)
        for b in pending + tail:
            bwriter.write(b, 1)


# progressive scans emit EOBn symbols (0x10..0xE0) that the baseline
# Annex K AC table does not contain: a FLAT canonical table (255 symbols,
# every rs value except 0xFF, all at code length 8 — the all-ones code
# stays unused as §C.2 requires) ships via DHT as AC table 1
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(255))


def _prog_ac_dht() -> bytes:
    body = bytes((0x11,)) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    return bytes((0xFF, 0xC4)) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_progressive(gray: np.ndarray, quality: int = 85) -> bytes:
    """2-D uint8 array -> single-component PROGRESSIVE (SOF2) JFIF with a
    six-scan script exercising every decoder path: DC first (Al=1), two
    AC spectral bands (1-5, 6-63; Al=1), DC refinement (raw bits), and
    the two AC refinement scans (Al 1->0). Coefficient-exact with the
    baseline encoder at the same quality — decode(progressive) must equal
    decode(baseline) pixel-for-pixel, which the tests pin."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    qtab = _quality_scale(_STD_LUMA_Q, quality)
    dc_enc = _huff_encode_table(_STD_DC_BITS, _STD_DC_VALS)
    ac_enc = _huff_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
    padded = _pad_blocks(gray, 8)
    qnat = qtab.astype(np.float64).reshape(8, 8)
    # quantized coefficients per block, zigzag order
    blocks: List[np.ndarray] = []
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            block = _DCT_M @ padded[by : by + 8, bx : bx + 8] @ _DCT_M.T
            blocks.append(np.round(block / qnat).astype(np.int64).reshape(-1)[_ZIGZAG])

    def sos(ss: int, se: int, ah: int, al: int, body: bytes) -> bytes:
        return (
            bytes((0xFF, 0xDA))
            + struct.pack(">H", 8)
            + bytes((1, 1, 0x01, ss, se, (ah << 4) | al))  # DC tab 0, AC tab 1
            + body
        )

    out = _jfif_headers(h, w, qtab[_ZIGZAG], bytes((1, 0x11, 0)))
    # switch SOF0 -> SOF2 (the header helper emits C0 at a fixed spot)
    sof_at = out.find(b"\xff\xc0")
    out[sof_at + 1] = 0xC2
    out += _prog_ac_dht()  # AC table 1: the EOBn-capable progressive table

    # scan 1: DC first, Al=1
    bw_ = _BitWriter()
    pred = 0
    for coef in blocks:
        v = int(coef[0]) >> 1
        diff = v - pred
        pred = v
        t = _category(diff)
        code, ln = dc_enc[t]
        bw_.write(code, ln)
        if t:
            bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    out += sos(0, 0, 0, 1, bw_.flush())
    # scans 2+3: AC first, two spectral bands, Al=1, cross-block EOB runs
    for ss, se in ((1, 5), (6, 63)):
        out += sos(ss, se, 0, 1, _ac_first_scan_body(blocks, ac_enc, ss, se, 1))
    # scan 4: DC refinement (one raw bit per block, no huffman)
    bw_ = _BitWriter()
    for coef in blocks:
        bw_.write(int(coef[0]) & 1, 1)
    out += sos(0, 0, 1, 0, bw_.flush())
    # scans 5+6: AC refinement, Al 1 -> 0
    for ss, se in ((1, 5), (6, 63)):
        bw_ = _BitWriter()
        for coef in blocks:
            _enc_ac_refine(bw_, ac_enc, coef, ss, se, 0)
        out += sos(ss, se, 1, 0, bw_.flush())
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_420(gray: np.ndarray, quality: int = 85) -> bytes:
    """2-D uint8 array -> THREE-component YCbCr 4:2:0 PROGRESSIVE (SOF2)
    JFIF with neutral chroma: an INTERLEAVED DC scan over 16x16 MCUs
    (4 Y + Cb + Cr, Al=0), a non-interleaved Y AC scan, and all-EOB-run
    chroma AC scans — the container shape that exercises the decoder's
    interleaved-progressive-DC and chroma-scan-SKIP paths. Pixel-exact
    twin of encode_jpeg_420 at the same quality."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    qtab = _quality_scale(_STD_LUMA_Q, quality)
    dc_enc = _huff_encode_table(_STD_DC_BITS, _STD_DC_VALS)
    ac_enc = _huff_encode_table(_PROG_AC_BITS, _PROG_AC_VALS)
    padded = _pad_blocks(gray, 16)
    qnat = qtab.astype(np.float64).reshape(8, 8)
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    grid = {}
    for row in range(bh):
        for col in range(bw):
            block = _DCT_M @ padded[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] @ _DCT_M.T
            grid[(row, col)] = np.round(block / qnat).astype(np.int64).reshape(-1)[_ZIGZAG]

    def sos(comps: bytes, ss: int, se: int, ah: int, al: int, body: bytes) -> bytes:
        ns = len(comps) // 2
        return (
            bytes((0xFF, 0xDA))
            + struct.pack(">H", 6 + 2 * ns)
            + bytes((ns,)) + comps + bytes((ss, se, (ah << 4) | al))
            + body
        )

    out = _jfif_headers(h, w, qtab[_ZIGZAG], bytes((1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)))
    sof_at = out.find(b"\xff\xc0")
    out[sof_at + 1] = 0xC2
    out += _prog_ac_dht()  # AC table 1: the EOBn-capable progressive table

    # scan 1: interleaved DC, all three components, Al=0 (chroma DC = 0)
    bw_ = _BitWriter()
    preds = [0, 0, 0]
    zero_code = dc_enc[0]
    for my in range(0, bh, 2):
        for mx in range(0, bw, 2):
            for by in (0, 1):
                for bx in (0, 1):
                    v = int(grid[(my + by, mx + bx)][0])
                    diff = v - preds[0]
                    preds[0] = v
                    t = _category(diff)
                    code, ln = dc_enc[t]
                    bw_.write(code, ln)
                    if t:
                        bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            bw_.write(*zero_code)  # Cb DC diff 0
            bw_.write(*zero_code)  # Cr DC diff 0
    out += sos(bytes((1, 0x00, 2, 0x00, 3, 0x00)), 0, 0, 0, 0, bw_.flush())
    # scan 2: Y AC 1-63, non-interleaved raster order over the Y grid
    # NON-INTERLEAVED scans cover the component's own block grid —
    # ceil(pixels/8), WITHOUT the interleaved MCU padding (§A.2.2)
    bh_y, bw_y = -(-h // 8), -(-w // 8)
    yblocks = [grid[(r, c)] for r in range(bh_y) for c in range(bw_y)]
    out += sos(bytes((1, 0x01)), 1, 63, 0, 0, _ac_first_scan_body(yblocks, ac_enc, 1, 63, 0))
    # scans 3+4: chroma AC — all-zero bands, one EOB run per scan; the
    # luminance decoder SKIPS these (the path under test)
    n_chroma = (bh // 2) * (bw // 2)
    zero_band = [np.zeros(64, dtype=np.int64)] * n_chroma
    for cid in (2, 3):
        out += sos(bytes((cid, 0x01)), 1, 63, 0, 0, _ac_first_scan_body(zero_band, ac_enc, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)
