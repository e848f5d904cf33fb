"""Pure-stdlib media codecs: real decode for PNG / JPEG / GIF / BMP / WAV.

The container has no PIL/ffmpeg, but these public formats need only
zlib + struct + numpy + the stdlib ``wave`` module, so the multimodal
operator's decode seam (operators/multimodal.py) runs a REAL decoder for
them — the external-codec seam now covers only lossy-frame decode
(MP4 video, lossy VP8) and the exotic tail (HEIC/AVIF/...).

Scope (documented):
  * PNG (RFC 2083 / ISO 15948): 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline
    filters (None/Sub/Up/Average/Paeth); both interlace methods (none
    and Adam7 seven-pass de-interlacing).
  * JPEG (ISO/IEC 10918-1, kernel/jpeg.py — re-exported here): baseline
    sequential AND progressive DCT (spectral selection + successive
    approximation), 1..4 components, 4:4:4 / 4:2:2 / 4:2:0 sampling,
    restart intervals; arithmetic/lossless modes raise ValueError.
  * GIF (87a/89a, kernel/gif.py — re-exported here): first frame,
    global/local color tables, interlace, GIF-convention LZW; animated
    GIFs yield their poster (first) frame.
  * BMP: BITMAPINFOHEADER, uncompressed 24-bit BGR, bottom-up or
    top-down.
  * WAV: whatever ``wave`` accepts (PCM), decoded to mono int16.
  * MP4 (ISO-BMFF): METADATA probe only — box-tree walk to true
    width/height (tkhd) and duration (mvhd); frame decode genuinely
    needs an external codec and stays behind the null-feature seam.
  * WebP (RFC 9649, kernel/webp.py — re-exported here): full LOSSLESS
    (VP8L) decode — prefix codes, LZ77 + distance map, color cache,
    meta prefix codes, all four transforms — plus header-probe true
    dimensions for lossy VP8 keyframes and VP8X extended containers
    (lossy frame decode = external codec, the MP4 treatment).

Every decoder is a total-with-ValueError pure function of the bytes —
no RNG, no wall clock — so features are byte-identical at any
parallelism (the same determinism contract as the HTML/PDF kernels).
Scanline unfiltering is per-byte Python on the sequential filters
(Sub/Average/Paeth); fine for feature extraction over sampled media, and
the seam to swap in a vectorized decoder is exactly one function.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import List, Tuple

import numpy as np

from document_ai_spark.kernel.gif import (  # noqa: F401  (re-export)
    decode_gif,
    encode_gif,
)
from document_ai_spark.kernel.jpeg import (  # noqa: F401  (re-export)
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_420,
    encode_jpeg_progressive,
    encode_jpeg_progressive_420,
)
from document_ai_spark.kernel.webp import (  # noqa: F401  (re-export)
    decode_webp,
    encode_webp_vp8_shell,
    encode_webp_vp8l,
    probe_webp,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# ITU-R BT.601 luma weights in integer form (deterministic; no float
# rounding differences across platforms for uint8 inputs)
_LUMA_R, _LUMA_G, _LUMA_B = 299, 587, 114


def sniff_media(payload: bytes) -> str:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[4:8] == b"ftyp":
        # ISO-BMFF holds more than video: HEIC/AVIF images share the
        # container — classify by MAJOR BRAND so they stay 'unknown'
        brand = payload[8:12]
        if brand[:3] in (b"iso", b"mp4", b"avc", b"3gp", b"3g2", b"das", b"M4V", b"M4A", b"mmp", b"qt ") or brand == b"mp41" or brand == b"mp42":
            return "mp4"
        return "unknown"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = p - a if p >= a else a - p
    pb = p - b if p >= b else b - p
    pc = p - c if p >= c else c - p
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering -> raw pixel bytes (row-major).
    Filters 0 (None), 1 (Sub — a per-lane prefix sum: recon[i] =
    line[i] + recon[i-bpp], i.e. cumsum mod 256 down each of the bpp
    byte lanes) and 2 (Up) are whole-row numpy ops, so every filter the
    corpus's forward writers emit (None/Sub/Up — including the
    predictor'd ObjStm/xref streams on the PDF hot path) decodes without
    a per-byte loop. Average/Paeth carry a two-neighbor sequential
    dependency and stay per-byte, bounded by the 16 Mpx envelope
    (reachable only through actual PNG media decode)."""
    stride = width * bpp
    if len(raw) < height * (stride + 1):
        raise ValueError("png: truncated pixel data")
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        o = y * stride
        prev_o = o - stride
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 2 and y > 0:  # Up: whole-row vector add
            out[o : o + stride] = (
                np.frombuffer(line, dtype=np.uint8)
                + np.frombuffer(out[prev_o:o], dtype=np.uint8)
            ).tobytes()
        elif ftype == 2:  # Up on the first row == None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub: per-lane prefix sum, whole row at once
            lanes = np.frombuffer(line, dtype=np.uint8).reshape(width, bpp)
            out[o : o + stride] = (
                (lanes.astype(np.int64).cumsum(axis=0) & 0xFF).astype(np.uint8).tobytes()
            )
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[prev_o + i] if y > 0 else 0
                out[o + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[prev_o + i] if y > 0 else 0
                ul = out[prev_o + i - bpp] if (y > 0 and i >= bpp) else 0
                out[o + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
    return out


# Adam7 pass layout: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]

# sampled-media envelope: 16M px (4096x4096). Above this the per-byte
# unfilter loop would pin a core for minutes (the CPU analog of a zlib
# bomb) — exactly the kind of payload the feature stage must isolate,
# not chew on.
_MAX_PIXELS = 16_000_000


def decode_png(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """PNG bytes -> (width, height, 2-D uint8 LUMINANCE array)."""
    try:
        return _decode_png_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # struct.error, zlib.error, slicing...
        # total-with-ValueError contract: malformed bytes surface as ONE
        # exception type, matching the HTML/PDF kernels' error pattern
        raise ValueError(f"png: malformed ({type(exc).__name__}: {exc})")


def _decode_png_inner(payload: bytes) -> Tuple[int, int, np.ndarray]:
    if payload[:8] != PNG_MAGIC:
        raise ValueError("png: bad magic")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat: List[bytes] = []
    palette = b""
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc unchecked)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    if bit_depth != 8:
        raise ValueError(f"png: unsupported bit depth {bit_depth}")
    if interlace not in (0, 1):
        raise ValueError(f"png: unknown interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"png: unsupported color type {color_type}")
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise ValueError("png: dimensions out of range")
    # inflate BOUNDED by what the declared dimensions can hold — a
    # zlib-bomb IDAT must not balloon memory past the header's claim
    if interlace == 0:
        need = height * (width * channels + 1)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), need)
        px = np.frombuffer(
            bytes(_unfilter(raw, width, height, channels)), dtype=np.uint8
        ).reshape(height, width, channels)
    else:  # Adam7: seven independently-filtered sub-images
        passes = [
            (x0, y0, dx, dy, -(-(width - x0) // dx), -(-(height - y0) // dy))
            for x0, y0, dx, dy in _ADAM7
        ]
        need = sum(ph * (pw * channels + 1) for *_xy, pw, ph in passes if pw and ph)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), need)
        px = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in passes:
            if pw == 0 or ph == 0:
                continue
            size = ph * (pw * channels + 1)
            sub = np.frombuffer(
                bytes(_unfilter(raw[pos : pos + size], pw, ph, channels)),
                dtype=np.uint8,
            ).reshape(ph, pw, channels)
            px[y0::dy, x0::dx, :] = sub
            pos += size
    if color_type == 0:
        gray = px[:, :, 0]
    elif color_type == 4:
        gray = px[:, :, 0]  # gray channel; alpha ignored for luminance
    elif color_type == 3:
        if len(palette) < 3:
            raise ValueError("png: palette missing")
        pal = np.frombuffer(palette, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3).astype(np.uint32)
        lut = (
            pal[:, 0] * _LUMA_R + pal[:, 1] * _LUMA_G + pal[:, 2] * _LUMA_B
        ) // 1000
        gray = lut.astype(np.uint8)[np.minimum(px[:, :, 0], len(lut) - 1)]
    else:  # 2 (RGB) or 6 (RGBA)
        rgb = px[:, :, :3].astype(np.uint32)
        gray = (
            (rgb[:, :, 0] * _LUMA_R + rgb[:, :, 1] * _LUMA_G + rgb[:, :, 2] * _LUMA_B)
            // 1000
        ).astype(np.uint8)
    return width, height, gray


def encode_png(gray: np.ndarray) -> bytes:
    """2-D uint8 array -> grayscale 8-bit PNG (filter 0). Deterministic —
    the generator-side twin of decode_png, used by tests/fixtures."""
    h, w = gray.shape
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_adam7(gray: np.ndarray) -> bytes:
    """2-D uint8 array -> grayscale ADAM7-INTERLACED PNG (filter 0 rows in
    each of the seven passes) — the encoder twin of the de-interlacing
    decode path."""
    h, w = gray.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = gray[y0::dy, x0::dx]
        for y in range(sub.shape[0]):
            if sub.shape[1]:
                raw += b"\x00" + sub[y].tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit)


def decode_bmp(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, 2-D uint8 luminance array)."""
    try:
        return _decode_bmp_inner(payload)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"bmp: malformed ({type(exc).__name__}: {exc})")


def _decode_bmp_inner(payload: bytes) -> Tuple[int, int, np.ndarray]:
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("bmp: bad header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("bmp: ancient header out of scope")
    width, height_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError("bmp: only uncompressed 24-bit supported")
    height = abs(height_raw)
    if width <= 0 or height == 0 or width * height > _MAX_PIXELS:
        raise ValueError("bmp: dimensions out of range")
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + stride * height
    if len(payload) < need:
        raise ValueError("bmp: truncated pixel data")
    rows = []
    for y in range(height):
        o = data_off + y * stride
        rows.append(np.frombuffer(payload[o : o + width * 3], dtype=np.uint8))
    px = np.stack(rows).reshape(height, width, 3).astype(np.uint32)  # BGR
    if height_raw > 0:
        px = px[::-1]  # bottom-up storage -> top-down
    gray = (
        (px[:, :, 2] * _LUMA_R + px[:, :, 1] * _LUMA_G + px[:, :, 0] * _LUMA_B) // 1000
    ).astype(np.uint8)
    return width, height, gray


def encode_bmp(gray: np.ndarray) -> bytes:
    """2-D uint8 -> 24-bit bottom-up BMP (generator/test twin)."""
    h, w = gray.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = b"".join(
        np.repeat(gray[y], 3).astype(np.uint8).tobytes() + pad
        for y in range(h - 1, -1, -1)
    )
    data_off = 54
    file_size = data_off + len(body)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, data_off)
        # BITMAPINFOHEADER: size,w,h,planes,bpp,comp,imgsize,xppm,yppm,clrs,important
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


# ---------------------------------------------------------------------------
# WAV


def decode_wav(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """WAV bytes -> (n_samples, sample_rate, mono int16 sample array)."""
    try:
        return _decode_wav_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # wave.Error, EOFError, struct.error...
        raise ValueError(f"wav: malformed ({type(exc).__name__}: {exc})")


def _decode_wav_inner(payload: bytes) -> Tuple[int, int, np.ndarray]:
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n = wf.getnframes()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        if width != 2:
            raise ValueError(f"wav: only 16-bit PCM supported, got {width * 8}-bit")
        if n * channels > 256_000_000:
            raise ValueError("wav: too large")
        frames = wf.readframes(n)
    samples = np.frombuffer(frames, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return len(samples), rate, samples


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono int16 -> 16-bit PCM WAV (generator/test twin)."""
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# features (shared shape with the stub path: 16 floats)

N_FEATURES = 16


def image_features(gray: np.ndarray) -> List[float]:
    """Normalized 16-bin LUMINANCE histogram — the real-decode analog of
    the stub's byte histogram; deterministic integer binning."""
    hist, _ = np.histogram(gray.reshape(-1), bins=N_FEATURES, range=(0, 256))
    total = max(1, gray.size)
    return [float(x) for x in (hist / total).astype(np.float32)]


def audio_features(samples: np.ndarray) -> List[float]:
    """16 floats: normalized 8-bin amplitude histogram + rms + zero-cross
    rate + 6 zero pads (fixed width shared with image features)."""
    if samples.size == 0:
        return [0.0] * N_FEATURES
    a = samples.astype(np.float64) / 32768.0
    hist, _ = np.histogram(np.abs(a), bins=8, range=(0.0, 1.0))
    hist = (hist / samples.size).astype(np.float32)
    rms = float(np.sqrt(np.mean(a * a)))
    # <2 samples have no transitions; np.mean of the empty diff is NaN,
    # which would poison the fixed-width feature contract
    zc = (
        float(np.mean(np.abs(np.diff(np.signbit(a).astype(np.int8)))))
        if samples.size >= 2
        else 0.0
    )
    out = [float(x) for x in hist] + [rms, zc] + [0.0] * 6
    return [float(np.float32(x)) for x in out]


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format) — METADATA probe, no frame decode


def probe_mp4(payload: bytes) -> Tuple[int, int, int]:
    """MP4/ISO-BMFF bytes -> (width, height, duration_ms) by walking the
    box tree: mvhd gives timescale+duration, the video trak's tkhd gives
    16.16-fixed width/height. This is a pure METADATA probe — frame
    decode (H.264/AV1/...) genuinely needs an external codec and stays
    behind the multimodal null-feature seam; dimensions and duration are
    what a corpus-stats / filtering pipeline needs from video payloads.
    Total with ValueError."""
    try:
        return _probe_mp4_inner(payload)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"mp4: malformed ({type(exc).__name__}: {exc})")


def _mp4_boxes(payload: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        head = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            head = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield btype, pos + head, pos + size
        pos += size


def _probe_mp4_inner(payload: bytes) -> Tuple[int, int, int]:
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: bad magic")
    duration_ms = 0
    width = height = 0
    best_area = 0
    for btype, s, e in _mp4_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in _mp4_boxes(payload, s, e):
            if ctype == b"mvhd":
                ver = payload[cs]
                if ver == 1:
                    timescale, duration = struct.unpack(">IQ", payload[cs + 20 : cs + 32])
                else:
                    timescale, duration = struct.unpack(">II", payload[cs + 12 : cs + 20])
                if timescale:
                    duration_ms = int(duration * 1000 // timescale)
            elif ctype == b"trak":
                for ttype, ts, te in _mp4_boxes(payload, cs, ce):
                    if ttype != b"tkhd":
                        continue
                    ver = payload[ts]
                    # v0 body: 4 ver/flags + 20 times/id/reserved/dur +
                    # 16 reserved/layer/volume + 36 matrix = 76; v1: +12
                    off = ts + (88 if ver == 1 else 76)
                    w_fx, h_fx = struct.unpack(">II", payload[off : off + 8])
                    w, h = w_fx >> 16, h_fx >> 16
                    # the video track (audio traks are 0x0); with several
                    # video traks keep the largest-AREA one's (w, h) PAIR
                    # (independent maxes would mix tracks' dimensions)
                    if w and h and w * h > best_area:
                        best_area = w * h
                        width, height = w, h
        break
    if width == 0 and height == 0 and duration_ms == 0:
        raise ValueError("mp4: no moov metadata")
    return width, height, duration_ms


def encode_mp4_shell(width: int, height: int, duration_ms: int) -> bytes:
    """Minimal VALID ISO-BMFF shell (ftyp + moov(mvhd, trak(tkhd)) + empty
    mdat) carrying the given dimensions/duration — the deterministic
    generator twin of probe_mp4 for fixtures and the q48 truth corpus.
    Contains no coded frames (probe-only, like the probe itself)."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    timescale = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # created, modified
        + struct.pack(">II", timescale, duration_ms)
        + b"\x00\x01\x00\x00" + b"\x01\x00" + b"\x00" * 10  # rate/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),  # predefined + next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"  # version 0 + enabled flags
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1) + b"\x00" * 4  # track id + reserved
        + struct.pack(">I", duration_ms)
        + b"\x00" * 8 + b"\x00" * 8  # reserved + layer/alt/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + box(b"mdat", b"")
