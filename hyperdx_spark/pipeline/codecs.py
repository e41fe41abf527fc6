"""Pure-stdlib media codecs (no PIL/libav in this environment).

Real decoders/encoders for public formats implementable with the standard
library + numpy:

* PNG  — full chunk parse, zlib inflate, all five scanline filters
         (none/sub/up/average/paeth), 8-bit gray/RGB/RGBA.
* BMP  — uncompressed 24-bit BI_RGB.
* JPEG — baseline sequential (SOF0) + progressive (SOF2, full Annex G:
         spectral selection, successive approximation, EOB runs) decoder:
         Huffman entropy decode, dequantize, vectorized 8x8 iDCT, any
         chroma sampling, restart markers; plus minimal baseline and
         progressive encoders for fixtures. Arithmetic / 12-bit /
         hierarchical raise a clear unsupported error.
* WAV  — PCM via the stdlib ``wave`` module.
* Y4M  — YUV4MPEG2 uncompressed video (plain-text header + raw 4:2:0
         frames), the standard interchange format of the *mjpegtools*
         toolchain — used here for frame sampling.

Compressed video is NOT implemented; :func:`sniff` reports unknown codecs
so callers raise a clear unsupported-codec error instead of mis-decoding.

These run inside Arrow-batched ``mapInPandas`` workers, no JVM involvement.
Decode throughput (1 MP RGB, this container): filters none/up are whole-row
numpy ops and sub is an exact uint8 cumsum (~15 ms); average/paeth have a
true left-to-right data dependence, decoded as a per-scanline bytearray walk
(~0.4-0.9 s) — exact, but budget accordingly for paeth-heavy corpora.
"""

from __future__ import annotations

import io
import re
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples per pixel


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit PNG from (h, w) gray or (h, w, 3|4) RGB(A) uint8."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * channels)], axis=1
    ).tobytes()
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """(h, w, channels) uint8 from an 8-bit gray/RGB(A) PNG."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, w = len(PNG_MAGIC), 0
    h = bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = _CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, scan = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    # Per-scanline defiltering. None/Up are whole-row numpy ops; Sub is an
    # exact per-channel modular prefix sum (np.cumsum in uint8 wraps mod 256,
    # which IS the PNG recurrence), so the three common filters run at numpy
    # speed. Average/Paeth have a true left-to-right data dependence (left
    # pixel feeds the predictor), so they walk pixel columns — but with all
    # channels vectorized per step, w iterations instead of w*channels.
    for y in range(h):
        line = scan[y]
        f = filters[y]
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: out[x] = line[x] + out[x-ch]  (mod 256)
            out[y] = np.cumsum(
                line.reshape(w, channels), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            ln = bytearray(line.tobytes())
            pr = prev.tobytes()
            ch = channels
            for x in range(stride):
                left = ln[x - ch] if x >= ch else 0
                ln[x] = (ln[x] + ((left + pr[x]) >> 1)) & 0xFF
            out[y] = np.frombuffer(bytes(ln), np.uint8)
        elif f == 4:  # Paeth
            ln = bytearray(line.tobytes())
            pr = prev.tobytes()
            ch = channels
            for x in range(stride):
                a = ln[x - ch] if x >= ch else 0
                b = pr[x]
                c = pr[x - ch] if x >= ch else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                ln[x] = (ln[x] + pred) & 0xFF
            out[y] = np.frombuffer(bytes(ln), np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, channels)


# --------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# --------------------------------------------------------------------------

def encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("BMP encoder expects (h, w, 3)")
    h, w = arr.shape[:2]
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.zeros((abs(h), w, 3), np.uint8)
    pos = offset
    flip = h > 0
    for y in range(abs(h)):
        line = np.frombuffer(data, np.uint8, row, pos).reshape(w, 3)
        out[abs(h) - 1 - y if flip else y] = line[:, ::-1]
        pos += row + pad
    return out


# --------------------------------------------------------------------------
# WAV (PCM)
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
        width = wf.getsampwidth()
        channels = wf.getnchannels()
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    arr = np.frombuffer(raw, "<i2")
    if channels > 1:
        arr = arr.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return arr, rate


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2, 4:2:0) — uncompressed video for frame sampling
# --------------------------------------------------------------------------

Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """frames: (n, h, w) uint8 — stored as the Y plane; U/V planes neutral."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("Y4M 4:2:0 needs even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    uv = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    out = bytearray(head)
    for i in range(n):
        out += b"FRAME\n" + frames[i].tobytes() + uv + uv
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """-> (frames (n, h, w) uint8 luma, fps)."""
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    w = h = 0
    fps = 25
    for tok in data[:nl].split()[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = max(int(num) // max(int(den), 1), 1)
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg", b"C420mpeg2"):
            raise ValueError(f"unsupported Y4M chroma {tok!r}")
    ysz, uvsz = w * h, (w // 2) * (h // 2)
    frame_bytes = ysz + 2 * uvsz
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame header")
        pos = fnl + 1
        frames.append(
            np.frombuffer(data, np.uint8, ysz, pos).reshape(h, w).copy()
        )
        pos += frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps


# --------------------------------------------------------------------------
# JPEG (baseline DCT, ITU-T T.81) — decoder + minimal encoder
# --------------------------------------------------------------------------
#
# Baseline sequential (SOF0) and progressive (SOF2) profiles: 8-bit
# samples, Huffman entropy coding, grayscale or YCbCr with any h/v sampling
# factors (4:4:4, 4:2:2, 4:2:0), DRI/RSTn restart markers. Progressive
# scans implement the full T.81 Annex G feature set — spectral selection,
# successive approximation (DC + AC first/refinement passes), EOB runs —
# accumulating into per-component coefficient stores so a k-scan file still
# costs exactly one vectorized iDCT at the end. Arithmetic coding,
# hierarchical (SOF3/5/6/7/...), and 12-bit precision raise a clear
# unsupported error. The iDCT is the exact orthonormal 8x8 DCT-III applied
# to ALL blocks of a component in one numpy einsum — the per-block Python
# work is Huffman decoding only.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# Annex K quantization tables (quality ~50)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.int64)

# Annex K typical Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: forward F = T f T^T, inverse
    f = T^T F T."""
    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    T[0, :] = 1.0
    T *= np.sqrt(np.where(x == 0, 1.0, 2.0) / 8.0)[:, None]
    return T


_DCT_T = _dct_matrix()


def _huff_decode_table(bits, values) -> dict:
    """(length, code) -> symbol, per T.81 C.2 canonical code assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n-bit magnitude to signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _jpeg_decode_block(reader, blk, comp, dc_t, ac_t, ss, se, ah, al,
                       progressive, eobrun) -> None:
    """Decode one 8x8 block's worth of entropy data into ``blk`` (a length-64
    zigzag-order int64 view). Baseline decodes the full block; progressive
    decodes only the (ss..se, ah/al) slice per T.81 Annex G."""
    if not progressive:
        t = reader.read_symbol(dc_t)
        comp["pred"] += _extend(reader.read_bits(t), t)
        blk[0] = comp["pred"]
        k = 1
        while k < 64:
            rs = reader.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                return
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG AC run overflow")
            blk[k] = _extend(reader.read_bits(s), s)
            k += 1
        return
    if ss == 0:  # DC scan (se == 0 per G.1.1.1.1)
        if ah == 0:  # first pass: Huffman diff at reduced precision
            t = reader.read_symbol(dc_t)
            comp["pred"] += _extend(reader.read_bits(t), t)
            blk[0] = comp["pred"] << al
        elif reader.read_bit():  # refinement: one raw bit per block
            blk[0] += 1 << al
        return
    if ah == 0:  # AC first pass for this band
        if eobrun[0]:
            eobrun[0] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:  # EOBn: run of (1<<r)+bits blocks incl. this one
                    eobrun[0] = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflow")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        return
    # AC refinement pass (G.2): correction bits ride runs and EOB spans
    bit = 1 << al

    def refine(k: int) -> None:
        if reader.read_bit() and not (int(blk[k]) & bit):
            blk[k] += bit if blk[k] > 0 else -bit

    if eobrun[0]:  # block fully inside an EOB run: corrections only
        eobrun[0] -= 1
        for k in range(ss, se + 1):
            if blk[k]:
                refine(k)
        return
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_t)
        r, s = rs >> 4, rs & 0xF
        val = 0
        if s == 0:
            if r != 15:
                eobrun[0] = (1 << r) - 1 + (reader.read_bits(r) if r else 0)
                r = 64  # no placement; refine the rest of the band
            # r == 15: ZRL skips 16 zero-history positions
        elif s == 1:
            val = bit if reader.read_bit() else -bit
        else:
            raise ValueError("bad JPEG AC-refinement code")
        while k <= se:
            if blk[k]:
                refine(k)
                k += 1
            else:
                if r == 0:
                    blk[k] = val  # newly-significant coef (or ZRL's 16th zero)
                    k += 1
                    break
                r -= 1
                k += 1


def _jpeg_decode_scan(ecs, scan, ss, se, ah, al, progressive, ri,
                      mcux, mcuy) -> None:
    """Decode one entropy-coded segment. Multi-component scans walk MCUs
    interleaved; single-component scans walk the component's own block grid
    (``nbw`` x ``nbh``, T.81 A.2.2) — the distinction matters for images
    whose dimensions are not MCU-aligned."""
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        c = scan[0][0]
        n_units = c["nbw"] * c["nbh"]
    intervals = re.split(b"\xff[\xd0-\xd7]", ecs) if ri else [ecs]
    unit = 0
    for chunk in intervals:
        reader = _BitReader(chunk.replace(b"\xff\x00", b"\xff"))
        for c, _, _ in scan:
            c["pred"] = 0  # RSTn resets DC predictors and the EOB run
        eobrun = [0]
        limit = min(unit + ri, n_units) if ri else n_units
        while unit < limit:
            if interleaved:
                my, mx = divmod(unit, mcux)
                for comp, dc_t, ac_t in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            idx = ((my * comp["v"] + by) * comp["bw"]
                                   + mx * comp["h"] + bx)
                            _jpeg_decode_block(
                                reader, comp["coef"][idx], comp, dc_t, ac_t,
                                ss, se, ah, al, progressive, eobrun)
            else:
                comp, dc_t, ac_t = scan[0]
                uy, ux = divmod(unit, comp["nbw"])
                _jpeg_decode_block(
                    reader, comp["coef"][uy * comp["bw"] + ux], comp,
                    dc_t, ac_t, ss, se, ah, al, progressive, eobrun)
            unit += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w[, 3]) uint8 from a baseline (SOF0) or progressive (SOF2) JPEG."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None  # (h, w, nc, progressive)
    restart_interval = 0
    comps: list[dict] = []
    geom_ready = False
    hmax = vmax = mcux = mcuy = 0
    any_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables not supported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int64)
                b += 65
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG are "
                f"supported, got SOF marker 0x{marker:02X} "
                "(extended/arithmetic/lossless/hierarchical)"
            )
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq,
                })
            frame = (h, w, nc, marker == 0xC2)
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, values)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not geom_ready:
                h, w = frame[0], frame[1]
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    c["bw"] = mcux * c["h"]  # MCU-padded block grid
                    c["bh"] = mcuy * c["v"]
                    cw = (w * c["h"] + hmax - 1) // hmax  # component dims
                    ch_ = (h * c["v"] + vmax - 1) // vmax
                    c["nbw"] = (cw + 7) // 8  # non-interleaved block grid
                    c["nbh"] = (ch_ + 7) // 8
                    c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
                    c["pred"] = 0
                geom_ready = True
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                # .get: DC-refinement scans need no DC table, AC scans no DC
                scan.append((comp, huff.get((0, tdta >> 4)),
                             huff.get((1, tdta & 0xF))))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            # entropy-coded segment runs to the next non-RST marker
            end = pos
            while end + 1 < len(data):
                if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            ecs = data[pos:end]
            pos = end
            progressive = frame[3]
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0  # baseline ignores the trailer
            _jpeg_decode_scan(ecs, scan, ss, se, ah, al, progressive,
                              restart_interval, mcux, mcuy)
            any_scan = True
    if frame is None or not any_scan:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, nc = frame[0], frame[1], frame[2]
    # dequantize + dezigzag + one vectorized iDCT per component
    planes = []
    for c in comps:
        deq = c["coef"] * qt[c["tq"]][None, :]
        blocks = np.zeros((len(deq), 64), np.float64)
        blocks[:, _ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT_T, blocks, _DCT_T) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution by sample-and-hold
        plane = np.repeat(np.repeat(plane, vmax // c["v"], 0), hmax // c["h"], 1)
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _huff_encode_table(bits, values) -> dict:
    """symbol -> (code, length), inverse of _huff_decode_table."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill
        return bytes(self.out)


def encode_jpeg(arr: np.ndarray) -> bytes:
    """Minimal baseline JPEG encoder (grayscale or RGB 4:4:4, Annex K
    tables) — exists so the decoder has a self-contained roundtrip path in
    an environment with no libjpeg to produce fixtures."""
    arr = np.ascontiguousarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    nb_y, nb_x = (h + 7) // 8, (w + 7) // 8
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA, _QT_CHROMA])
    dc_tabs = [_HT_DC_LUMA] + ([] if gray else [_HT_DC_CHROMA, _HT_DC_CHROMA])
    ac_tabs = [_HT_AC_LUMA] + ([] if gray else [_HT_AC_CHROMA, _HT_AC_CHROMA])
    # quantized zigzag coefficients per component (vectorized forward DCT)
    comps_coef = []
    for plane, q in zip(planes, qts):
        padded = np.zeros((nb_y * 8, nb_x * 8), np.float64)
        padded[:h, :w] = plane
        padded[h:, :w] = plane[h - 1 : h, :]  # edge-extend
        padded[:, w:] = padded[:, w - 1 : w]
        blocks = (
            padded.reshape(nb_y, 8, nb_x, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        ) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_T, blocks, _DCT_T).reshape(-1, 64)
        zz = coef[:, _ZIGZAG]
        comps_coef.append(np.round(zz / q[_ZIGZAG][None, :]).astype(np.int64))
    # headers
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(_QT_LUMA[_ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(_QT_CHROMA[_ZIGZAG].astype(np.uint8)))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    seg(0xC0, sof)
    for tc, th, (bits, values) in (
        [(0, 0, _HT_DC_LUMA), (1, 0, _HT_AC_LUMA)]
        + ([] if gray else [(0, 1, _HT_DC_CHROMA), (1, 1, _HT_AC_CHROMA)])
    ):
        seg(0xC4, bytes([(tc << 4) | th] + bits) + bytes(values))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    # entropy coding: interleaved 4:4:4 means one block per component per MCU
    enc_dc = [_huff_encode_table(*t) for t in dc_tabs]
    enc_ac = [_huff_encode_table(*t) for t in ac_tabs]
    wtr = _BitWriter()
    preds = [0] * nc
    for bidx in range(nb_y * nb_x):
        for ci in range(nc):
            blk = comps_coef[ci][bidx]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            mag = abs(diff)
            n = mag.bit_length()
            code, length = enc_dc[ci][n]
            wtr.write(code, length)
            if n:
                wtr.write(diff if diff > 0 else diff + (1 << n) - 1, n)
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = enc_ac[ci][0xF0]
                    wtr.write(code, length)
                    run -= 16
                n = abs(v).bit_length()
                code, length = enc_ac[ci][(run << 4) | n]
                wtr.write(code, length)
                wtr.write(v if v > 0 else v + (1 << n) - 1, n)
                run = 0
            if run:
                code, length = enc_ac[ci][0x00]
                wtr.write(code, length)
    out.extend(wtr.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)


# Flat 8-bit AC table for progressive scans: every (run<<4)|size symbol with
# size 0..14 — covers EOBn (n<<4|0), ZRL (0xF0), and all magnitude codes.
# Annex K's sequential AC tables lack the EOBn>0 symbols progressive needs.
_HT_AC_FLAT = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(15)],
)


def _box2(p: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample with edge extension to even dims."""
    if p.shape[0] % 2:
        p = np.vstack([p, p[-1:]])
    if p.shape[1] % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _jpeg_plan(arr: np.ndarray, subsample: bool):
    """Color-convert, (optionally 4:2:0) subsample, pad to the MCU grid, and
    produce quantized zigzag coefficients per component. Returns
    (h, w, gray, comps, mcux, mcuy) where each comp dict carries the padded
    block grid (bw, bh), the non-interleaved grid (nbw, nbh), sampling
    factors (fh, fv), quant-table id tq, and (nblocks, 64) int64 ``zz``."""
    arr = np.ascontiguousarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        factors = [(1, 1)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        factors = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        if subsample:
            planes[1] = _box2(planes[1])
            planes[2] = _box2(planes[2])
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for i, (plane, (fh, fv)) in enumerate(zip(planes, factors)):
        q = _QT_LUMA if i == 0 else _QT_CHROMA
        bw, bh = mcux * fh, mcuy * fv
        ph, pw = plane.shape
        padded = np.zeros((bh * 8, bw * 8), np.float64)
        padded[:ph, :pw] = plane
        padded[ph:, :pw] = plane[ph - 1 : ph, :]  # edge-extend
        padded[:, pw:] = padded[:, pw - 1 : pw]
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        ) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_T, blocks, _DCT_T).reshape(-1, 64)
        zz = np.round(coef[:, _ZIGZAG] / q[_ZIGZAG][None, :]).astype(np.int64)
        cw = (w * fh + hmax - 1) // hmax
        ch_ = (h * fv + vmax - 1) // vmax
        comps.append({
            "fh": fh, "fv": fv, "tq": 0 if i == 0 else 1, "zz": zz,
            "bw": bw, "bh": bh, "nbw": (cw + 7) // 8, "nbh": (ch_ + 7) // 8,
        })
    return h, w, gray, comps, mcux, mcuy


def _emit_eobrun(wtr, enc_ac, eobrun: int) -> None:
    n = eobrun.bit_length() - 1
    code, ln = enc_ac[n << 4]
    wtr.write(code, ln)
    if n:
        wtr.write(eobrun - (1 << n), n)


class _ScanWriter:
    """Bit-writer wrapper that inserts RSTn markers every ``ri`` units,
    calling ``on_restart`` so the scan emitter can flush cross-block state
    (EOB runs) and reset predictors before the marker."""

    def __init__(self, out: bytearray, ri: int):
        self.out = out
        self.ri = ri
        self.wtr = _BitWriter()
        self.rst = 0
        self.unit = 0

    def next_unit(self, on_restart=None) -> None:
        if self.ri and self.unit and self.unit % self.ri == 0:
            if on_restart is not None:
                on_restart()
            self.out.extend(self.wtr.flush())
            self.out.extend(bytes([0xFF, 0xD0 + self.rst]))
            self.rst = (self.rst + 1) % 8
            self.wtr = _BitWriter()
        self.unit += 1

    def write(self, code: int, length: int) -> None:
        self.wtr.write(code, length)

    def finish(self) -> None:
        self.out.extend(self.wtr.flush())


def _emit_dc_scan(out, comps, enc_dc, mcux, mcuy, ah, al, ri=0) -> None:
    """Interleaved DC scan: first pass (ah=0) Huffman-codes diffs of
    dc >> al; refinement passes emit one raw bit (dc >> al) & 1 per block."""
    sw = _ScanWriter(out, ri)
    preds = [0] * len(comps)

    def reset() -> None:
        preds[:] = [0] * len(comps)

    for m in range(mcux * mcuy):
        sw.next_unit(reset)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["fv"]):
                for bx in range(c["fh"]):
                    idx = (my * c["fv"] + by) * c["bw"] + mx * c["fh"] + bx
                    v = int(c["zz"][idx][0]) >> al
                    if ah:
                        sw.write(v & 1, 1)
                        continue
                    diff = v - preds[ci]
                    preds[ci] = v
                    n = abs(diff).bit_length()
                    code, ln = enc_dc[ci][n]
                    sw.write(code, ln)
                    if n:
                        sw.write(diff if diff > 0 else diff + (1 << n) - 1, n)
    sw.finish()


def _emit_ac_first(out, c, enc_ac, ss, se, al, ri=0) -> None:
    """Non-interleaved AC first pass for band [ss, se] at precision al,
    with cross-block EOB-run accumulation (T.81 G.1.2.2)."""
    sw = _ScanWriter(out, ri)
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            _emit_eobrun(sw, enc_ac, eobrun)
            eobrun = 0

    for u in range(c["nbh"] * c["nbw"]):
        sw.next_unit(flush)
        uy, ux = divmod(u, c["nbw"])
        blk = c["zz"][uy * c["bw"] + ux]
        run = 0
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                run += 1
                continue
            flush()
            while run > 15:
                code, ln = enc_ac[0xF0]
                sw.write(code, ln)
                run -= 16
            n = t.bit_length()
            code, ln = enc_ac[(run << 4) | n]
            sw.write(code, ln)
            tv = t if v > 0 else -t
            sw.write(tv if tv > 0 else tv + (1 << n) - 1, n)
            run = 0
        if run:  # band ended in zeros -> block joins the EOB run
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()
    sw.finish()


def _emit_ac_refine(out, c, enc_ac, ss, se, al, ri=0) -> None:
    """Non-interleaved AC refinement (T.81 G.1.2.3). Mirrors the decoder's
    walk exactly: correction bits for nonzero-history coefficients are
    emitted in position order right after the symbol whose run/EOB span
    covers them; EOB-run corrections are buffered until the EOBn flush."""
    sw = _ScanWriter(out, ri)
    eobrun = 0
    pending: list[int] = []  # correction bits riding the open EOB run

    def flush() -> None:
        nonlocal eobrun, pending
        if eobrun:
            _emit_eobrun(sw, enc_ac, eobrun)
            eobrun = 0
        for b in pending:
            sw.write(b, 1)
        pending = []

    for u in range(c["nbh"] * c["nbw"]):
        sw.next_unit(flush)
        uy, ux = divmod(u, c["nbw"])
        blk = c["zz"][uy * c["bw"] + ux]
        mag = [abs(int(blk[k])) >> al for k in range(64)]
        k = ss
        while k <= se:
            # mag == 1 <=> newly significant this pass (history values >= 2)
            target = next((j for j in range(k, se + 1) if mag[j] == 1), None)
            if target is None:
                # remainder is zeros/history -> block joins the EOB run
                pending_bits = [mag[j] & 1 for j in range(k, se + 1)
                                if mag[j] > 1]
                eobrun += 1
                pending.extend(pending_bits)
                if eobrun == 0x7FFF:
                    flush()
                break
            run = sum(1 for j in range(k, target) if mag[j] == 0)
            while run > 15:
                flush()
                code, ln = enc_ac[0xF0]
                sw.write(code, ln)
                cnt = 0
                while cnt < 16:  # ZRL covers 16 zero-history positions
                    if mag[k] == 0:
                        cnt += 1
                    elif mag[k] > 1:
                        sw.write(mag[k] & 1, 1)
                    k += 1
                run -= 16
            flush()
            run = sum(1 for j in range(k, target) if mag[j] == 0)
            code, ln = enc_ac[(run << 4) | 1]
            sw.write(code, ln)
            sw.write(1 if int(blk[target]) > 0 else 0, 1)  # sign bit
            for j in range(k, target):
                if mag[j] > 1:
                    sw.write(mag[j] & 1, 1)
            k = target + 1
    flush()
    sw.finish()


def encode_jpeg_progressive(arr: np.ndarray, subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """Progressive JPEG (SOF2) encoder: spectral selection + successive
    approximation, so the decoder's Annex G paths (DC/AC first+refinement,
    EOB runs, non-interleaved partial-MCU geometry with ``subsample=True``)
    have a self-contained fixture source. Quantized coefficients are
    identical to :func:`encode_jpeg`'s (same tables), so baseline and
    progressive round-trips of the same image decode pixel-identically.

    Scan script (Al=1 then refinement to Al=0):
      1. DC  all comps   Ss=0  Se=0  Ah=0 Al=1   (interleaved)
      2. AC  per comp    Ss=1  Se=20 Ah=0 Al=1
      3. AC  per comp    Ss=21 Se=63 Ah=0 Al=1
      4. DC  all comps   Ss=0  Se=0  Ah=1 Al=0   (raw refinement bits)
      5. AC  per comp    Ss=1  Se=20 Ah=1 Al=0
      6. AC  per comp    Ss=21 Se=63 Ah=1 Al=0
    """
    h, w, gray, comps, mcux, mcuy = _jpeg_plan(arr, subsample)
    nc = len(comps)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xDB, bytes([0]) + bytes(_QT_LUMA[_ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(_QT_CHROMA[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["fh"] << 4) | c["fv"], c["tq"]])
    seg(0xC2, sof)
    tabs = [(0, 0, _HT_DC_LUMA), (1, 0, _HT_AC_FLAT)]
    if not gray:
        tabs.append((0, 1, _HT_DC_CHROMA))
    for tc, th, (bits, values) in tabs:
        seg(0xC4, bytes([(tc << 4) | th] + bits) + bytes(values))
    enc_dc = [_huff_encode_table(*(_HT_DC_LUMA if i == 0 else _HT_DC_CHROMA))
              for i in range(nc)]
    enc_ac = _huff_encode_table(*_HT_AC_FLAT)

    def sos(comp_specs: list[tuple[int, int, int]], ss, se, ah, al) -> None:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, body)

    ri = restart_interval
    if ri:
        seg(0xDD, struct.pack(">H", ri))
    all_specs = [(i + 1, 0 if i == 0 else 1, 0) for i in range(nc)]
    # 1. DC first (interleaved)
    sos(all_specs, 0, 0, 0, 1)
    _emit_dc_scan(out, comps, enc_dc, mcux, mcuy, 0, 1, ri)
    # 2-3. AC first passes, two spectral bands, one scan per component
    for ss, se in ((1, 20), (21, 63)):
        for i, c in enumerate(comps):
            sos([all_specs[i]], ss, se, 0, 1)
            _emit_ac_first(out, c, enc_ac, ss, se, 1, ri)
    # 4. DC refinement (raw bits, interleaved)
    sos(all_specs, 0, 0, 1, 0)
    _emit_dc_scan(out, comps, enc_dc, mcux, mcuy, 1, 0, ri)
    # 5-6. AC refinement passes
    for ss, se in ((1, 20), (21, 63)):
        for i, c in enumerate(comps):
            sos([all_specs[i]], ss, se, 1, 0)
            _emit_ac_refine(out, c, enc_ac, ss, se, 0, ri)
    out.extend(b"\xff\xd9")
    return bytes(out)


# --------------------------------------------------------------------------
# sniffing + shared ops
# --------------------------------------------------------------------------

def sniff(data: bytes) -> str:
    if data.startswith(PNG_MAGIC):
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data.startswith(Y4M_MAGIC):
        return "y4m"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


def jpeg_profile(data: bytes) -> str:
    """Coding profile of a JPEG stream: walks the marker segments to the
    first SOFn and reports ``baseline`` (SOF0), ``progressive`` (SOF2), or
    ``sofN`` for the unsupported processes — so corpus audits can count
    progressive files separately from decode failures."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS without a frame header
            break
        (seg_len,) = struct.unpack_from(">H", data, pos)
        if marker == 0xC0:
            return "baseline"
        if marker == 0xC2:
            return "progressive"
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            return f"sof{marker - 0xC0}"
        pos += seg_len
    raise ValueError("JPEG missing SOF")


def decode_image(data: bytes) -> np.ndarray:
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind == "jpeg":
        return decode_jpeg(data)
    raise ValueError(f"unsupported image codec: {kind}")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w[, c]) via numpy index maps."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resize of (h, w[, c]) uint8 — vectorized numpy gather of
    the four neighbors with edge clamping (align_corners=False pixel-center
    convention, the default of the mainstream image libraries)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) + 0.5) * (h / height) - 0.5
    xs = (np.arange(width) + 0.5) * (w / width) - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    y0c = y0.clip(0, h - 1)
    y1c = (y0 + 1).clip(0, h - 1)
    x0c = x0.clip(0, w - 1)
    x1c = (x0 + 1).clip(0, w - 1)
    a = arr[y0c][:, x0c].astype(np.float64)
    b = arr[y0c][:, x1c].astype(np.float64)
    c = arr[y1c][:, x0c].astype(np.float64)
    d = arr[y1c][:, x1c].astype(np.float64)
    if arr.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    out = (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
           + c * fy * (1 - fx) + d * fy * fx)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def spectral_features(
    samples: np.ndarray, rate: int, *, n_fft: int = 512
) -> dict[str, float]:
    """Audio spectral summary via numpy rFFT over Hann-windowed frames:
    dominant frequency (peak of the mean magnitude spectrum), spectral
    centroid, 85% rolloff, and RMS level — the standard cheap audio
    quality/content signals."""
    x = samples.astype(np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if len(x) == 0:
        return {"dominant_hz": 0.0, "centroid_hz": 0.0,
                "rolloff_hz": 0.0, "rms": 0.0}
    n = min(n_fft, len(x))
    hop = max(n // 2, 1)
    win = np.hanning(n)
    frames = [x[i : i + n] * win for i in range(0, len(x) - n + 1, hop)] or [
        np.pad(x, (0, n - len(x))) * win
    ]
    mag = np.abs(np.fft.rfft(np.stack(frames), n=n, axis=1)).mean(axis=0)
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = mag.sum()
    if total <= 0:
        return {"dominant_hz": 0.0, "centroid_hz": 0.0,
                "rolloff_hz": 0.0, "rms": 0.0}
    cum = np.cumsum(mag)
    return {
        "dominant_hz": float(freqs[int(mag.argmax())]),
        "centroid_hz": float((freqs * mag).sum() / total),
        "rolloff_hz": float(freqs[int(np.searchsorted(cum, 0.85 * total))]),
        "rms": float(np.sqrt((x**2).mean())),
    }


def scene_changes(frames: np.ndarray, *, threshold: float = 20.0) -> list[int]:
    """Indices i where frame i differs from frame i-1 by more than
    ``threshold`` mean absolute luma — the cut-detection primitive for
    video frame sampling (sample one frame per detected shot)."""
    if len(frames) < 2:
        return []
    diffs = np.abs(np.diff(frames.astype(np.float64), axis=0)).mean(axis=(1, 2))
    return [int(i) + 1 for i in np.nonzero(diffs > threshold)[0]]
