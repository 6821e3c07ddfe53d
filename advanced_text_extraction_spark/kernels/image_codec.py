"""Raster image codecs in pure numpy (no cv2/PIL in this sandbox).

Reference analog: ``cv2.imread`` / ``cv2.imdecode`` at
/root/reference/text_extractor.py:887-903 (image OCR source S9) and the
page-render decode at :585-595 (PDF OCR source S5). The reference leans on
OpenCV for all raster I/O; this module implements the uncompressed
container formats from scratch so the OCR tier is *real* end-to-end in a
container without imaging libraries:

- PGM/PPM (P2/P5/P3/P6, the netpbm family) — text and binary variants
- BMP (BITMAPINFOHEADER; 8-bit paletted and 24-bit BGR, bottom-up or
  top-down rows, 4-byte row padding)
- PNG (baseline: stdlib zlib inflate + numpy scanline unfiltering; color
  types 0/2/3/4/6 at bit depth 8, filters 0-4)
- JPEG (baseline sequential DCT per ITU-T T.81: Huffman entropy decode,
  dequantize/dezigzag, vectorized 8x8 IDCT, chroma upsampling, YCbCr→RGB;
  encoder with Annex K tables for the fixture side; 4:4:4/4:2:2/4:2:0,
  restart markers)
- TIFF 6.0 (strips AND §15 tiles, both byte orders: Compression none/
  LZW/PackBits and the whole CCITT fax family — G4/T.6, G3/T.4 1D+2D,
  Modified Huffman (kernels/fax_codec.py) — Predictor 2, 1-bit bilevel
  + 8/16-bit gray/RGB, 4/8-bit ColorMap palettes, planar or
  chunky, WhiteIsZero; TIFF-JPEG routes to the real-codec hook)
- raw gray buffers (width*height bytes — the shape of a FlateDecoded
  /DeviceGray PDF image XObject)
- the repo's FIMG fake container (multimodal/media.py) for synth tables

Non-baseline JPEG variants (progressive/arithmetic/12-bit) route to an
import-guarded real-codec hook, same pattern as
multimodal/media.py:_decode_real_image.

All decoders return ``np.ndarray`` of dtype uint8 — ``(h, w)`` grayscale
or ``(h, w, 3)`` RGB — matching what the preprocessing kernel consumes.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np


class ImageError(ValueError):
    """Malformed raster payload; caller maps to status='error'."""


# ---------------------------------------------------------------------------
# netpbm (PGM/PPM)
# ---------------------------------------------------------------------------

# no ^ anchor: matched with pattern.match(buf, i), which anchors at i
# WITHOUT slicing — buf[i:] per token made ASCII decode O(n^2)
_PNM_WS = re.compile(rb"(?:\s+|#[^\n]*\n)+")


def _pnm_tokens(buf: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Read `count` whitespace/comment-separated ASCII ints from buf."""
    out: list[int] = []
    i = start
    while len(out) < count:
        m = _PNM_WS.match(buf, i)
        if m:
            i = m.end()
        j = i
        while j < len(buf) and buf[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ImageError("bad netpbm header")
        out.append(int(buf[i:j]))
        i = j
    return out, i


def decode_pnm(buf: bytes) -> np.ndarray:
    magic = buf[:2]
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise ImageError(f"not a PGM/PPM payload: {magic!r}")
    nchan = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), i = _pnm_tokens(buf, 2, 3)
    if maxval <= 0 or maxval > 255:
        raise ImageError(f"unsupported netpbm maxval {maxval}")
    if w <= 0 or h <= 0:
        raise ImageError(f"bad netpbm dimensions {w}x{h}")
    n = w * h * nchan
    if magic in (b"P5", b"P6"):
        i += 1  # single whitespace byte after maxval
        if len(buf) - i < n:
            # np.frombuffer would raise a bare ValueError — keep the
            # typed-error contract for truncated payloads
            raise ImageError("truncated netpbm pixel data")
        px = np.frombuffer(buf, dtype=np.uint8, count=n, offset=i)
    else:
        vals, _ = _pnm_tokens(buf, i, n)
        if vals and max(vals) > maxval:
            # np.asarray(uint8) silently wraps on numpy 1.x and raises a
            # bare OverflowError on 2.x — keep the typed-error contract
            raise ImageError(
                f"netpbm sample {max(vals)} exceeds maxval {maxval}")
        px = np.asarray(vals, dtype=np.uint8)
    if maxval != 255:
        px = (px.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    arr = px.reshape((h, w) if nchan == 1 else (h, w, 3))
    return arr


def encode_pgm(arr: np.ndarray) -> bytes:
    """Binary P5 grayscale encoder (fixture/synth side)."""
    if arr.ndim != 2:
        raise ImageError("encode_pgm wants a 2-D gray array")
    h, w = arr.shape
    return b"P5 %d %d 255\n" % (w, h) + arr.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER only — the variant every writer emits)
# ---------------------------------------------------------------------------

def _bounded_read(buf: bytes, count: int, offset: int,
                  what: str) -> np.ndarray:
    """np.frombuffer with the codec's typed-error contract: a count or
    offset that a corrupt header pushes past the buffer must raise
    ImageError, not numpy's bare ValueError."""
    if count < 0 or offset < 0 or len(buf) - offset < count:
        raise ImageError(f"truncated BMP {what}")
    return np.frombuffer(buf, dtype=np.uint8, count=count, offset=offset)


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ImageError("not a BMP payload")
    if len(buf) < 54:
        raise ImageError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ImageError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise ImageError(f"compressed BMP (type {compression}) unsupported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ImageError(f"bad BMP dimensions {w}x{h}")
    row_bytes = (w * bpp // 8 + 3) & ~3
    if bpp == 8:
        # palette: 4-byte BGRA entries right after the info header
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", buf, 46)[0] or 256
        pal = _bounded_read(buf, n_colors * 4, pal_off,
                            "palette").reshape(n_colors, 4)
        idx = _bounded_read(buf, row_bytes * h, data_off,
                            "pixel data").reshape(h, row_bytes)[:, :w]
        if n_colors < 256 and int(idx.max(initial=0)) >= n_colors:
            raise ImageError("BMP palette index out of range")
        bgr = pal[idx][:, :, :3]
    elif bpp == 24:
        raw = _bounded_read(buf, row_bytes * h, data_off,
                            "pixel data").reshape(h, row_bytes)
        bgr = raw[:, : w * 3].reshape(h, w, 3)
    else:
        raise ImageError(f"unsupported BMP bpp {bpp}")
    if not top_down:
        bgr = bgr[::-1]
    rgb = bgr[..., ::-1]
    if (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all():
        return np.ascontiguousarray(rgb[..., 0])
    return np.ascontiguousarray(rgb)


def encode_bmp_gray(arr: np.ndarray) -> bytes:
    """8-bit paletted grayscale BMP encoder (fixture side)."""
    if arr.ndim != 2:
        raise ImageError("encode_bmp_gray wants a 2-D gray array")
    h, w = arr.shape
    row_bytes = (w + 3) & ~3
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = arr[::-1]  # bottom-up
    data_off = 14 + 40 + len(pal)
    size = data_off + row_bytes * h
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                           row_bytes * h, 2835, 2835, 256, 0)
    return file_hdr + info_hdr + pal + rows.tobytes()


# ---------------------------------------------------------------------------
# raw gray (PDF /DeviceGray image XObject after FlateDecode)
# ---------------------------------------------------------------------------

def decode_raw_gray(buf: bytes, width: int, height: int) -> np.ndarray:
    if len(buf) < width * height:
        raise ImageError(
            f"raw gray buffer too short: {len(buf)} < {width}x{height}")
    return np.frombuffer(buf, dtype=np.uint8,
                         count=width * height).reshape(height, width)


# ---------------------------------------------------------------------------
# PNG (from scratch: stdlib zlib inflate + numpy scanline unfiltering)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(buf: bytes):
    i = 8
    while i + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, i)
        ctype = buf[i + 4 : i + 8]
        data = buf[i + 8 : i + 8 + length]
        yield ctype, data
        i += 12 + length
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> np.ndarray:
    """Baseline PNG: bit depth 8, color types 0/2/3/4/6, no interlace.
    Filters 0-2 (none/sub/up) decode vectorized; 3/4 (average/paeth) fall
    back to a per-pixel loop on those scanlines only."""
    if buf[:8] != _PNG_SIG:
        raise ImageError("not a PNG payload")
    w = h = None
    bitdepth = colortype = interlace = 0
    idat = bytearray()
    palette: np.ndarray | None = None
    for ctype, data in _png_chunks(buf):
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ImageError("truncated PNG IHDR")
            w, h, bitdepth, colortype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise ImageError("malformed PNG PLTE")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if w is None:
        raise ImageError("PNG missing IHDR")
    if w <= 0 or h <= 0 or w * h > (1 << 28):
        # the size cap turns a corrupt-header 4-billion-pixel allocation
        # into a typed error instead of an executor OOM
        raise ImageError(f"bad PNG dimensions {w}x{h}")
    if bitdepth != 8 or interlace != 0:
        raise ImageError(
            f"unsupported PNG (bitdepth {bitdepth}, interlace {interlace})")
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if nchan is None:
        raise ImageError(f"unsupported PNG color type {colortype}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ImageError(f"PNG inflate failed: {exc}") from exc
    stride = w * nchan
    if len(raw) < h * (stride + 1):
        raise ImageError("truncated PNG pixel data")
    lines = np.frombuffer(raw, dtype=np.uint8,
                          count=h * (stride + 1)).reshape(h, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = nchan
    for y in range(h):
        f = int(filters[y])
        cur = lines[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride,
                                                              dtype=np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # sub: prefix sum over same-channel strides
            g = cur.reshape(w, bpp)
            rec = np.cumsum(g, axis=0).reshape(stride)
        elif f == 2:  # up
            rec = cur + prev
        elif f in (3, 4):  # average / paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if f == 3:
                    rec[x] = cur[x] + ((a + b) >> 1)
                else:
                    c = int(out[y - 1, x - bpp]) if (y and x >= bpp) else 0
                    rec[x] = cur[x] + _paeth(a, b, c)
                rec[x] &= 0xFF
        else:
            raise ImageError(f"bad PNG filter {f}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    px = out.reshape(h, w, nchan)
    if colortype == 3:
        if palette is None:
            raise ImageError("paletted PNG missing PLTE")
        if int(px[:, :, 0].max(initial=0)) >= len(palette):
            raise ImageError("PNG palette index out of range")
        px = palette[px[:, :, 0]]
        nchan = 3
    elif colortype == 4:  # gray+alpha -> gray
        px = px[:, :, :1]
        nchan = 1
    elif colortype == 6:  # RGBA -> RGB
        px = px[:, :, :3]
        nchan = 3
    if nchan == 1:
        return np.ascontiguousarray(px[:, :, 0])
    if (px[..., 0] == px[..., 1]).all() and (px[..., 1] == px[..., 2]).all():
        return np.ascontiguousarray(px[..., 0])
    return np.ascontiguousarray(px)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png_gray(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Grayscale 8-bit PNG encoder (fixture side). ``filter_type`` 0/1/2
    lets tests exercise the unfilter paths."""
    if arr.ndim != 2:
        raise ImageError("encode_png_gray wants a 2-D gray array")
    h, w = arr.shape
    a = arr.astype(np.uint8)
    rows = []
    for y in range(h):
        if filter_type == 0:
            rows.append(bytes([0]) + a[y].tobytes())
        elif filter_type == 1:
            d = np.diff(a[y].astype(np.int16), prepend=0) & 0xFF
            rows.append(bytes([1]) + d.astype(np.uint8).tobytes())
        elif filter_type == 2:
            prev = a[y - 1].astype(np.int16) if y else np.zeros(w, np.int16)
            d = (a[y].astype(np.int16) - prev) & 0xFF
            rows.append(bytes([2]) + d.astype(np.uint8).tobytes())
        else:
            raise ImageError(f"encoder filter {filter_type} unsupported")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _png_chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, from scratch — ITU-T T.81)
# ---------------------------------------------------------------------------
# The one compressed format real multimodal corpora are dominated by
# (reference OCRs .jpg natively via cv2.imread,
# /root/reference/text_extractor.py:887-903; ext list :771). Decoder
# handles baseline sequential (SOF0) with 8-bit samples, 1 or 3
# components, any sampling factors 1-2 (4:4:4/4:2:2/4:2:0), restart
# markers, multiple DQT/DHT segments — and progressive (SOF2: spectral
# selection + successive approximation, DC/AC first and refinement
# scans, EOBn runs, per-scan DHT redefinition). Arithmetic / 12-bit /
# hierarchical route to the import-guarded real-codec hook.
# Encoder (fixture/synth side) writes baseline gray or YCbCr at 4:4:4
# or 4:2:0 with the Annex K tables, optional restart interval — or a
# progressive scan script (for exercising the progressive decoder).

class _UnsupportedJpeg(ImageError):
    """Valid JPEG, but beyond the baseline-sequential feature set —
    dispatch falls through to the real-codec hook."""


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (luminance / chrominance), row-major
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# Annex K Huffman specs: (bits[1..16] counts, values)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                   list(range(12)))
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _dct_mat() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: forward F = C @ f @ C.T,
    inverse f = C.T @ F @ C."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    return c


_DCT_C = _dct_mat()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """(length, code) → symbol for a canonical JPEG Huffman table."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ImageError("JPEG entropy data exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ImageError("JPEG entropy data exhausted")
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        return int(chunk @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64)))

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """DIFF/AC value decoding (T.81 F.2.2.1): t-bit magnitude v maps to
    [-2^t+1, -2^(t-1)] ∪ [2^(t-1), 2^t-1]."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_segments(buf: bytes):
    """Yield (marker, payload, extra): for an SOS marker ``extra`` is the
    scan's destuffed entropy segments (split at restart markers) and the
    walk continues at the next marker — multi-scan streams (progressive)
    yield every scan; for all other markers ``extra`` is the next
    offset."""
    if buf[:2] != b"\xff\xd8":
        raise ImageError("not a JPEG payload")
    i = 2
    while i + 2 <= len(buf):
        if buf[i] != 0xFF:
            raise ImageError("JPEG marker sync lost")
        if buf[i + 1] == 0xFF:  # fill byte (T.81 B.1.1.2)
            i += 1
            continue
        marker = buf[i + 1]
        if marker == 0xD9:  # EOI
            return
        if i + 4 > len(buf):
            break
        (length,) = struct.unpack_from(">H", buf, i + 2)
        payload = buf[i + 4:i + 2 + length]
        if marker == 0xDA:  # SOS — entropy data follows
            segs, end = _split_entropy(buf, i + 2 + length)
            yield marker, payload, segs
            i = end
        else:
            yield marker, payload, i + 2 + length
            i += 2 + length
    raise ImageError("truncated JPEG stream")


def _split_entropy(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded segments between restart markers, destuffed
    (FF00 → FF); scan ends at any non-RST marker (normally EOI).
    Returns (segments, end_offset) with end_offset at the 0xFF of the
    terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = buf[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next real marker
            break
    segs.append(bytes(cur))
    return segs, min(i, n)


def _decode_block_seq(reader: "_BitReader", zz: np.ndarray, preds: dict,
                      c: dict) -> None:
    """Baseline-sequential block decode: DC diff + AC runs (T.81 F.2)."""
    t = reader.huff(c["dc"])
    if t > 15:  # corrupt table: category beyond spec overflows int64
        raise ImageError("bad JPEG DC category")
    preds[c["id"]] += _extend(reader.take(t), t)
    zz[0] = preds[c["id"]]
    k = 1
    while k < 64:
        rs = reader.huff(c["ac"])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ImageError("JPEG AC run overflows block")
        zz[k] = _extend(reader.take(s), s)
        k += 1


def _ac_first(reader: "_BitReader", block: np.ndarray, ss: int, se: int,
              al: int, actab: dict, eobrun: int) -> int:
    """Progressive AC first scan, one block (T.81 G.2 / libjpeg
    decode_mcu_AC_first). ``block`` is the zigzag-ordered coefficient
    vector; returns the updated end-of-band run count."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.take(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ImageError("JPEG AC run overflows band")
        block[k] = _extend(reader.take(s), s) << al
        k += 1
    return eobrun


def _ac_refine(reader: "_BitReader", block: np.ndarray, ss: int, se: int,
               al: int, actab: dict, eobrun: int) -> int:
    """Progressive AC refinement scan, one block (T.81 G.2 / libjpeg
    decode_mcu_AC_refine): correction bits for already-nonzero
    coefficients, ±(1<<al) insertions for newly-nonzero ones."""
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if reader.bit() and (int(block[k]) & p1) == 0:
            block[k] += p1 if block[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(actab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ImageError("bad JPEG AC refinement magnitude")
                val = p1 if reader.bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.take(r)
                break
            # advance over r zero-history coefficients, applying
            # correction bits to nonzero-history ones along the way
            while k <= se:
                if block[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # end-of-band: corrections only
            if block[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_prog(segs: list[bytes], scan: list[tuple], geom: tuple,
                      ss: int, se: int, ah: int, al: int,
                      restart_interval: int, w: int, h: int) -> None:
    """One progressive scan over the persistent coefficient arrays.
    ``scan`` is [(comp, dctab, actab)]; interleaved (>1 component) scans
    walk MCU order, single-component scans walk that component's block
    raster at its own resolution (no MCU padding — T.81 A.2.2)."""
    hmax, vmax, mcus_x, mcus_y = geom
    if ss == 0:
        if se != 0:
            raise ImageError("progressive JPEG scan mixes DC and AC")
        if ah == 0 and any(t[1] is None for t in scan):
            raise ImageError("JPEG DC scan references missing DHT")
    else:
        if len(scan) > 1:
            raise ImageError("progressive JPEG AC scan with >1 component")
        if not (ss <= se <= 63):
            raise ImageError("bad JPEG spectral band")
        if scan[0][2] is None:
            raise ImageError("JPEG AC scan references missing DHT")

    interleaved = len(scan) > 1
    if interleaved:
        units = mcus_x * mcus_y
    else:
        c = scan[0][0]
        comp_w = -((-w * c["h"]) // hmax)  # ceil(w*h_i/hmax), T.81 A.1.1
        comp_h = -((-h * c["v"]) // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        units = bw * bh

    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = {t[0]["id"]: 0 for t in scan}
    eobrun = 0
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ImageError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = {t[0]["id"]: 0 for t in scan}
            eobrun = 0
        if interleaved:  # DC scan over MCUs
            my, mx = divmod(m, mcus_x)
            for c, dctab, _ in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:
                            t = reader.huff(dctab)
                            if t > 15:
                                raise ImageError("bad JPEG DC category")
                            preds[c["id"]] += _extend(reader.take(t), t)
                            block[0] = preds[c["id"]] << al
                        elif reader.bit():
                            block[0] = int(block[0]) | (1 << al)
        else:
            c, dctab, actab = scan[0]
            my, mx = divmod(m, bw)
            block = c["coef"][my, mx]
            if ss == 0:
                if ah == 0:
                    if dctab is None:
                        raise ImageError("JPEG DC scan references "
                                         "missing DHT")
                    t = reader.huff(dctab)
                    if t > 15:
                        raise ImageError("bad JPEG DC category")
                    preds[c["id"]] += _extend(reader.take(t), t)
                    block[0] = preds[c["id"]] << al
                elif reader.bit():
                    block[0] = int(block[0]) | (1 << al)
            elif ah == 0:
                eobrun = _ac_first(reader, block, ss, se, al, actab, eobrun)
            else:
                eobrun = _ac_refine(reader, block, ss, se, al, actab, eobrun)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline-sequential AND progressive (SOF2, successive
    approximation + spectral selection) JPEG → gray ``(h, w)`` or RGB
    ``(h, w, 3)``. Raises :class:`_UnsupportedJpeg` for
    arithmetic/12-bit/hierarchical streams (dispatch falls through to
    the real-codec hook)."""
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    comps: list[dict] = []
    w = h = 0
    progressive = False
    restart_interval = 0
    geom = None
    n_scans = 0

    for marker, payload, extra in _jpeg_segments(buf):
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise _UnsupportedJpeg(
                f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0x0F
                if pq != 0:
                    raise _UnsupportedJpeg("16-bit JPEG quant table")
                if j + 65 > len(payload):
                    raise ImageError("truncated JPEG DQT")
                tbl = np.frombuffer(payload, dtype=np.uint8,
                                    count=64, offset=j + 1).astype(np.int64)
                quant[tq] = tbl
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(payload):
                if j + 17 > len(payload):
                    raise ImageError("truncated JPEG DHT")
                tc, th = payload[j] >> 4, payload[j] & 0x0F
                bits = list(payload[j + 1:j + 17])
                nv = sum(bits)
                if j + 17 + nv > len(payload):
                    raise ImageError("truncated JPEG DHT values")
                vals = list(payload[j + 17:j + 17 + nv])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if comps:
                raise ImageError("duplicate JPEG SOF")
            progressive = marker == 0xC2
            if len(payload) < 6:
                raise ImageError("truncated JPEG SOF")
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if len(payload) < 6 + 3 * nc:
                raise ImageError("truncated JPEG SOF components")
            if prec != 8:
                raise _UnsupportedJpeg(f"{prec}-bit JPEG samples")
            if nc not in (1, 3):
                raise _UnsupportedJpeg(f"{nc}-component JPEG")
            for k in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", payload, 6 + 3 * k)
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            if w <= 0 or h <= 0 or w * h > (1 << 28):
                raise ImageError(f"bad JPEG dimensions {w}x{h}")
            for c in comps:
                if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                    raise _UnsupportedJpeg(
                        f"JPEG sampling {c['h']}x{c['v']} out of the "
                        "1-2 range")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["coef"] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
            geom = (hmax, vmax, mcus_x, mcus_y)
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise ImageError("truncated JPEG DRI")
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS (one per scan; several if progressive)
            if not payload or len(payload) < 1 + 2 * payload[0] + 3:
                raise ImageError("truncated JPEG SOS")
            if geom is None:
                raise ImageError("JPEG SOS before SOF")
            ns = payload[0]
            scan: list[tuple] = []
            for k in range(ns):
                cs, tt = payload[1 + 2 * k], payload[2 + 2 * k]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ImageError("JPEG scan references unknown component")
                scan.append((comp, huff.get((0, tt >> 4)),
                             huff.get((1, tt & 0x0F))))
            ss, se, ahal = payload[1 + 2 * ns:1 + 2 * ns + 3]
            ah, al = ahal >> 4, ahal & 0x0F
            n_scans += 1
            segs = extra  # destuffed entropy segments from _jpeg_segments
            if progressive:
                _decode_scan_prog(segs, scan, geom, ss, se, ah, al,
                                  restart_interval, w, h)
                continue
            # ---- baseline sequential: exactly one full-spectrum scan ----
            if n_scans > 1 or len(scan) != len(comps):
                raise _UnsupportedJpeg("multi-scan sequential JPEG")
            if (ss, se, ah, al) != (0, 63, 0, 0):
                raise ImageError("bad baseline JPEG scan header")
            for comp, dctab, actab in scan:
                if dctab is None or actab is None:
                    raise ImageError("JPEG scan references missing DHT")
                comp["dc"], comp["ac"] = dctab, actab
            hmax, vmax, mcus_x, mcus_y = geom
            reader = _BitReader(segs[0])
            seg_idx = 0
            preds = {c["id"]: 0 for c in comps}
            for m in range(mcus_x * mcus_y):
                if restart_interval and m and m % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segs):
                        raise ImageError("JPEG missing restart segment")
                    reader = _BitReader(segs[seg_idx])
                    preds = {c["id"]: 0 for c in comps}
                my, mx = divmod(m, mcus_x)
                for c, _, _ in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _decode_block_seq(
                                reader,
                                c["coef"][my * c["v"] + by, mx * c["h"] + bx],
                                preds, c)

    if n_scans == 0 or not comps:
        raise ImageError("JPEG missing SOF/SOS")
    for c in comps:
        if c["tq"] not in quant:
            raise ImageError("JPEG component references missing DQT")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    planes = []
    for c in comps:
        by, bx = c["coef"].shape[:2]
        blocks = np.zeros((by * bx, 8, 8), dtype=np.float64)
        flat = c["coef"].reshape(by * bx, 64) * quant[c["tq"]][None, :]
        blocks.reshape(by * bx, 64)[:, _ZIGZAG] = flat
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_C, blocks, _DCT_C)
        plane = (spatial.reshape(by, bx, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
        plane = np.clip(np.round(plane) + 128, 0, 255).astype(np.uint8)
        # upsample to full resolution by replication, then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    if (rgb[..., 0] == rgb[..., 1]).all() and (rgb[..., 1] == rgb[..., 2]).all():
        return np.ascontiguousarray(rgb[..., 0])
    return rgb


# -- encoder (fixture/synth side) -------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.put(1, 1)  # pad with 1s per T.81 F.1.2.3


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) for the encoder side."""
    return {sym: (code, length)
            for (length, code), sym in _canonical_codes(bits, vals).items()}


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1-100 → table multiplier."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(wr: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    wr.put(code, ln)
    if t:
        wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            wr.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        wr.put(code, ln)
        wr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        wr.put(code, ln)
    return int(zz[0])


def _build_dht(symbols) -> tuple[list[int], list[int]]:
    """Minimal valid canonical table: every used symbol at one fixed
    code length (progressive scans need EOBn symbols the Annex K tables
    lack — libjpeg likewise emits custom tables for progressive). Length
    is the smallest L with len(symbols) < 2^L - 1, keeping the all-ones
    code unused (T.81 C.2)."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0x00]  # degenerate scan: emit a 1-symbol table
    length = 8
    while len(syms) >= (1 << length) - 1:
        length += 1
    if length > 16:
        raise ImageError("JPEG Huffman table overflow")
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, syms


def _write_tokens(wr: _BitWriter, toks: list[tuple],
                  tab: dict[int, tuple]) -> None:
    for t in toks:
        if t[0] == "s":
            code, ln = tab[t[1]]
            wr.put(code, ln)
        else:
            wr.put(t[1], t[2])


def _ac_first_tokens(blocks2d: np.ndarray, bw: int, bh: int,
                     ss: int, se: int, al: int) -> list[tuple]:
    """Progressive AC first-scan entropy tokens for one component's
    block raster: run/size symbols over the point-transformed band with
    accumulated EOBn runs (T.81 G.1.2.2 / libjpeg encode_mcu_AC_first).
    Tokens: ("s", symbol) / ("b", value, nbits)."""
    toks: list[tuple] = []
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            toks.append(("s", n << 4))
            if n:
                toks.append(("b", eobrun - (1 << n), n))
            eobrun = 0

    for idx in range(bw * bh):
        my, mx = divmod(idx, bw)
        zz = blocks2d[my, mx]
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        mags = [abs(v) >> al for v in vals]
        last = max((i for i, m in enumerate(mags) if m), default=-1)
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(last + 1):
            m = mags[i]
            if m == 0:
                r += 1
                continue
            while r > 15:
                toks.append(("s", 0xF0))  # ZRL
                r -= 16
            s = m.bit_length()
            v = m if vals[i] >= 0 else -m
            toks.append(("s", (r << 4) | s))
            toks.append(("b", v if v >= 0 else v + (1 << s) - 1, s))
            r = 0
        if last < se - ss:
            eobrun += 1
    flush_eob()
    return toks


def _ac_refine_tokens(blocks2d: np.ndarray, bw: int, bh: int,
                      ss: int, se: int, al: int) -> list[tuple]:
    """Progressive AC refinement entropy tokens (T.81 G.1.2.3 / libjpeg
    encode_mcu_AC_refine): newly-nonzero coefficients as run/1 symbols
    with a sign bit, correction bits for already-nonzero ones buffered
    behind the next symbol or EOBn run."""
    toks: list[tuple] = []
    eobrun = 0
    pend: list[int] = []  # correction bits riding on the open EOB run

    def flush_eob() -> None:
        nonlocal eobrun, pend
        if eobrun:
            n = eobrun.bit_length() - 1
            toks.append(("s", n << 4))
            if n:
                toks.append(("b", eobrun - (1 << n), n))
            toks.extend(("b", b, 1) for b in pend)
            eobrun = 0
            pend = []

    for idx in range(bw * bh):
        my, mx = divmod(idx, bw)
        zz = blocks2d[my, mx]
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        mags = [abs(v) >> al for v in vals]
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, m in enumerate(mags):
            if m == 0:
                r += 1
                continue
            # ZRLs are emitted at EVERY nonzero coefficient (history or
            # new) BEFORE buffering its correction bit — the decoder
            # reads correction bits in position order during each
            # symbol's advance, so bits must ride the first symbol whose
            # span crosses their position (libjpeg encode_mcu_AC_refine)
            while r > 15:
                flush_eob()
                toks.append(("s", 0xF0))
                r -= 16
                toks.extend(("b", b, 1) for b in br)
                br = []
            if m > 1:  # nonzero history — correction bit, r unaffected
                br.append(m & 1)
                continue
            # newly nonzero (magnitude reaches 1 at this precision)
            flush_eob()
            toks.append(("s", (r << 4) | 1))
            toks.append(("b", 1 if vals[i] >= 0 else 0, 1))
            toks.extend(("b", b, 1) for b in br)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return toks


def _comp_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) → zigzagged quantized blocks
    (by, bx, 64)."""
    h8, w8 = plane.shape[0] // 8, plane.shape[1] // 8
    f = plane.astype(np.float64) - 128.0
    blocks = (f.reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3)
              .reshape(h8 * w8, 8, 8))
    coefs = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C)
    zz = coefs.reshape(h8 * w8, 64)[:, _ZIGZAG]
    qz = np.round(zz / q[None, :]).astype(np.int64)
    return qz.reshape(h8, w8, 64)


def _pad_edge(a: np.ndarray, mult: int) -> np.ndarray:
    ph = (-a.shape[0]) % mult
    pw = (-a.shape[1]) % mult
    return np.pad(a, ((0, ph), (0, pw)), mode="edge") if ph or pw else a


def _emit_progressive_scans(out: bytearray, seg, dht, blocks, planes,
                            gray: bool, w: int, h: int, hmax: int,
                            vmax: int, mcus_x: int, mcus_y: int) -> None:
    """The SOF2 scan script: DC first (interleaved, Al=1) → AC first per
    component (band 1..63, Al=1, custom DHT with EOBn symbols) → DC
    refinement (raw bits) → AC refinement per component. Successive
    approximation is fully refined, so decoding reproduces exactly the
    baseline coefficients."""
    nf = 1 if gray else 3
    samps = [(p[2], p[3]) for p in planes]
    dc_tabs = [_encode_codes(*_HUFF_DC_LUMA)] + \
        [_encode_codes(*_HUFF_DC_CHROMA)] * (nf - 1)

    def sos(ids_tabs, ss, se, ah, al):
        p = bytes([len(ids_tabs)])
        for cid, td, ta in ids_tabs:
            p += bytes([cid, (td << 4) | ta])
        seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    def mcu_blocks():
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci in range(nf):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, blocks[ci][my * vs + by, mx * hs + bx]

    def comp_bdims(ci):
        hs, vs = samps[ci]
        comp_w = -((-w * hs) // hmax)  # ceil, T.81 A.1.1
        comp_h = -((-h * vs) // vmax)
        return -(-comp_w // 8), -(-comp_h // 8)

    dht(0, 0, _HUFF_DC_LUMA)
    if not gray:
        dht(0, 1, _HUFF_DC_CHROMA)

    # scan 1: DC first, interleaved, point transform Al=1
    sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nf)], 0, 0, 0, 1)
    wr = _BitWriter()
    preds = [0] * nf
    for ci, zz in mcu_blocks():
        dc = int(zz[0]) >> 1  # arithmetic shift, as the decoder rebuilds
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _category(diff)
        code, ln = dc_tabs[ci][t]
        wr.put(code, ln)
        if t:
            wr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wr.flush()
    out.extend(wr.out)

    def ac_scan(ci: int, tokens_fn, ss: int, se: int,
                ah: int, al: int) -> None:
        bw, bh = comp_bdims(ci)
        toks = tokens_fn(blocks[ci], bw, bh, ss, se, al)
        spec = _build_dht([t[1] for t in toks if t[0] == "s"])
        dht(1, 0, spec)  # redefine AC table 0 for every scan
        sos([(ci + 1, 0, 0)], ss, se, ah, al)
        wr = _BitWriter()
        _write_tokens(wr, toks, _encode_codes(*spec))
        wr.flush()
        out.extend(wr.out)

    # luma AC is split into two spectral bands (libjpeg's default script
    # shape) so ss>1 scans and per-band EOB runs are exercised
    bands = [[(1, 5), (6, 63)]] + [[(1, 63)]] * (nf - 1)
    for ci in range(nf):  # scans 2..: AC first per component
        for ss, se in bands[ci]:
            ac_scan(ci, _ac_first_tokens, ss, se, 0, 1)

    # DC refinement: one raw bit per block, interleaved, no Huffman
    sos([(ci + 1, 0, 0) for ci in range(nf)], 0, 0, 1, 0)
    wr = _BitWriter()
    for _, zz in mcu_blocks():
        wr.put(int(zz[0]) & 1, 1)
    wr.flush()
    out.extend(wr.out)

    for ci in range(nf):  # final scans: AC refinement per component
        for ss, se in bands[ci]:
            ac_scan(ci, _ac_refine_tokens, ss, se, 1, 0)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """JPEG encoder: gray ``(h, w)`` or RGB ``(h, w, 3)``;
    ``subsample=True`` writes 4:2:0 chroma, else 4:4:4; optional DRI
    (baseline only). ``progressive=True`` writes SOF2 with a
    libjpeg-style scan script — DC first (Al=1), per-component AC first
    (1..63, Al=1), DC refinement, per-component AC refinement — so the
    coefficient stream is bit-identical to the baseline encoding after
    all scans (same blocks, successive approximation fully refined)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ImageError("encode_jpeg wants gray or RGB uint8")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ImageError("encode_jpeg got an empty image")
    gray = arr.shape[2] == 1
    ql = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)

    if gray:
        y = arr[:, :, 0].astype(np.float64)
        planes = [(_pad_edge(y, 8), ql, 1, 1)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 4:2:0 — box-average chroma
            ype = _pad_edge(y, 16)
            cbp = _pad_edge(cb, 16)
            crp = _pad_edge(cr, 16)
            cbs = cbp.reshape(cbp.shape[0] // 2, 2,
                              cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            crs = crp.reshape(crp.shape[0] // 2, 2,
                              crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [(ype, ql, 2, 2), (cbs, qc, 1, 1), (crs, qc, 1, 1)]
        else:
            planes = [(_pad_edge(y, 8), ql, 1, 1),
                      (_pad_edge(cb, 8), qc, 1, 1),
                      (_pad_edge(cr, 8), qc, 1, 1)]

    blocks = [_comp_blocks(np.clip(np.round(p), 0, 255), q)
              for p, q, _, _ in planes]
    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_l = _encode_codes(*_HUFF_DC_LUMA)
    ac_l = _encode_codes(*_HUFF_AC_LUMA)
    dc_c = _encode_codes(*_HUFF_DC_CHROMA)
    ac_c = _encode_codes(*_HUFF_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    seg(0xDB, bytes([0x00]) + bytes(int(v) for v in ql))
    if not gray:
        seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc))
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    sof += bytes([1, (planes[0][2] << 4) | planes[0][3], 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    seg(0xC2 if progressive else 0xC0, sof)

    def dht(tc: int, th: int, spec: tuple) -> None:
        bits, vals = spec
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    if progressive:
        if restart_interval:
            raise ImageError(
                "progressive encoder does not emit restart markers")
        _emit_progressive_scans(
            out, seg, dht, blocks, planes, gray, w, h,
            hmax, vmax, mcus_x, mcus_y)
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    dht(0, 0, _HUFF_DC_LUMA)
    dht(1, 0, _HUFF_AC_LUMA)
    if not gray:
        dht(0, 1, _HUFF_DC_CHROMA)
        dht(1, 1, _HUFF_AC_CHROMA)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nf, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    tabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (nf - 1)
    samps = [(p[2], p[3]) for p in planes]
    preds = [0] * nf
    wr = _BitWriter()
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            wr.flush()
            out.extend(wr.out)
            out.extend(bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]))
            wr = _BitWriter()
            preds = [0] * nf
        my, mx = divmod(m, mcus_x)
        for ci in range(nf):
            hs, vs = samps[ci]
            for by in range(vs):
                for bx in range(hs):
                    zz = blocks[ci][my * vs + by, mx * hs + bx]
                    preds[ci] = _encode_block(
                        wr, zz, preds[ci], tabs[ci][0], tabs[ci][1])
    wr.flush()
    out.extend(wr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF 6.0 (baseline bilevel/grayscale/RGB, strip-based)
# ---------------------------------------------------------------------------
# The remaining real-world scan container after PNG/JPEG (r3 VERDICT
# stretch #7). Scope: both byte orders, strip organization (any
# RowsPerStrip) AND §15 tile organization (r5: TileWidth/TileLength/
# TileOffsets/TileByteCounts, edge tiles padded then cropped),
# Compression 1 (none) / 2 (Modified Huffman, byte-aligned T.4 1D
# rows) / 3 (G3/T.4 with EOLs; T4Options bit 0 = 2D lines, fill bits
# tolerated) / 4 (CCITT G4 fax, T.6) — fax family in
# kernels/fax_codec.py — / 5 (LZW, spec §13, early-change code widths)
# / 32773 (PackBits, §9), Predictor 2 horizontal differencing (§14, 8-
# and 16-bit samples), PhotometricInterpretation 0/1/2 and 3 (palette:
# 4-bit nibble-packed or 8-bit indices through a 16-bit ColorMap,
# high-byte fold), 1-bit bilevel + 8-bit and 16-bit (r5, high-byte
# fold to the module's uint8 contract) gray/RGB, PlanarConfiguration 1
# (chunky) and 2 (planar: channel-major segment tables, r5).
# TIFF-JPEG and uncompressed-mode-G3 shapes route to the hook.

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RAT


def _tiff_ifd(buf: bytes, order: str, off: int) -> dict[int, list[int]]:
    """Parse one IFD into tag -> list of integer values (RATIONALs are
    returned as floor(num/den); none of the tags we read are RATIONAL)."""
    def u16(b, i):
        return struct.unpack(order + "H", b[i:i + 2])[0]

    def u32(b, i):
        return struct.unpack(order + "I", b[i:i + 4])[0]

    if off + 2 > len(buf):
        raise ImageError("TIFF IFD offset out of range")
    n = u16(buf, off)
    tags: dict[int, list[int]] = {}
    for e in range(n):
        p = off + 2 + 12 * e
        if p + 12 > len(buf):
            raise ImageError("truncated TIFF IFD entry")
        tag, typ = u16(buf, p), u16(buf, p + 2)
        count = u32(buf, p + 4)
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: spec says skip the entry
        total = size * count
        src = p + 8 if total <= 4 else u32(buf, p + 8)
        if src + total > len(buf):
            raise ImageError(f"TIFF tag {tag} data out of range")
        if typ == 3:
            vals = [u16(buf, src + 2 * i) for i in range(count)]
        elif typ == 4:
            vals = [u32(buf, src + 4 * i) for i in range(count)]
        elif typ == 5:
            vals = [u32(buf, src + 8 * i) //
                    max(u32(buf, src + 8 * i + 4), 1) for i in range(count)]
        else:  # BYTE/ASCII
            vals = list(buf[src:src + total])
        tags[tag] = vals
    return tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, ClearCode 256,
    EOI 257, 9→12-bit codes with the early-change width bump (the width
    grows when the table length reaches 2**n - 1 — one entry earlier
    than GIF's 2**n; the convention every TIFF/PDF LZW writer uses)."""
    CLEAR, EOI = 256, 257
    nbits, bitpos = 9, 0
    nbytes = len(data)
    table: list[bytes] = []
    prev = b""
    out = bytearray()
    while bitpos + nbits <= nbytes * 8:
        byte0, shift = divmod(bitpos, 8)
        chunk = int.from_bytes(data[byte0:byte0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - shift - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits, prev = 9, b""
            continue
        if not table:
            raise ImageError("LZW stream does not start with ClearCode")
        if not prev:
            if code >= len(table):
                raise ImageError("corrupt LZW stream (first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ImageError("corrupt LZW stream (code gap)")
        out += entry
        prev = entry
        if len(table) == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Encoder twin of ``_lzw_decode`` — same early-change convention;
    emits ClearCode when the table reaches 4094 so codes never need a
    13th bit. Fixture/round-trip side."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nib = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nib
        acc = (acc << width) | code
        nib += width
        while nib >= 8:
            nib -= 8
            out.append((acc >> nib) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, nbits = 258, 9
    put(CLEAR, nbits)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        put(table[w], nbits)
        if next_code >= 4094:  # table (nearly) full: reset mid-stream
            put(CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code, nbits = 258, 9
        else:
            table[wc] = next_code
            next_code += 1
            # width sync: the decoder's table lags this counter by
            # exactly one entry (it can't complete an entry until the
            # next code arrives), so its early-change bump at
            # len == 2**n - 1 corresponds to next_code == 2**n here
            if next_code == (1 << nbits) and nbits < 12:
                nbits += 1
        w = bytes([ch])
    if w:
        put(table[w], nbits)
    put(EOI, nbits)
    if nib:
        out.append((acc << (8 - nib)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits (TIFF spec §9): n in [0,127] copies n+1 literals;
    n in [-127,-1] (two's complement) repeats the next byte 1-n times;
    -128 is a noop."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if h == -128:
            continue
        if h >= 0:
            if i + h + 1 > n:
                raise ImageError("truncated PackBits literal run")
            out += data[i:i + h + 1]
            i += h + 1
        else:
            if i >= n:
                raise ImageError("truncated PackBits repeat run")
            out += data[i:i + 1] * (1 - h)
            i += 1
    return bytes(out)


def _packbits_encode_row(row: bytes) -> bytes:
    """Per-row PackBits (the spec's recommended strategy: never let a
    run cross a row boundary). Greedy: repeats of ≥2 become repeat runs,
    the rest literal runs of ≤128."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i), row[i]])
            i = j
            continue
        j = i + 1  # literal run: stop at the start of any ≥2-repeat
        while (j < n and j - i < 128
               and not (j + 1 < n and row[j + 1] == row[j])):
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _undo_predictor2(raw: np.ndarray, spp: int) -> np.ndarray:
    """Horizontal-differencing predictor (spec §14): cumulative sum per
    row per channel, mod 256. raw is (rows, width*spp) uint8."""
    a = raw.reshape(raw.shape[0], -1, spp)
    return np.cumsum(a.astype(np.uint32), axis=1).astype(np.uint8) \
        .reshape(raw.shape)


def _undo_predictor2_16(raw: np.ndarray, spp: int, order: str) -> np.ndarray:
    """§14 horizontal differencing over 16-BIT samples: the difference
    is per sample VALUE (mod 65536) — byte order only affects the wire
    encoding, so decode to native, cumsum, re-encode. raw is
    (rows, width*spp*2) uint8 in wire order."""
    vals = np.ascontiguousarray(raw).view(np.dtype(order + "u2"))
    a = vals.reshape(raw.shape[0], -1, spp)
    acc = np.cumsum(a.astype(np.uint64), axis=1).astype(
        np.dtype(order + "u2"))
    return np.ascontiguousarray(acc).view(np.uint8).reshape(raw.shape)


def _tiff_segment_pixels(raw: bytes, comp: int, seg_w: int, nrows: int,
                         spp: int, bits0: int, pred: int,
                         order: str, t4_2d: bool = False) -> np.ndarray:
    """One strip or tile → (nrows, seg_w, spp) uint8 pixels: decompress,
    undo the predictor (it resets at every segment's left edge, so this
    must happen per segment, not on the assembled image), unpack bits /
    fold 16-bit samples to their high byte (the display convention)."""
    row_bytes = (seg_w * spp * bits0 + 7) // 8
    if comp in (2, 3, 4):
        # fax family resets its reference/row state per segment; output
        # is the same MSB-packed bilevel shape as an uncompressed one
        from .fax_codec import g3_decode, g4_decode, mh_decode
        if comp == 4:
            raw = g4_decode(raw, seg_w, nrows)
        elif comp == 3:
            raw = g3_decode(raw, seg_w, nrows, two_d=t4_2d)
        else:
            raw = mh_decode(raw, seg_w, nrows)
    elif comp == 5:
        raw = _lzw_decode(raw)
    elif comp == 32773:
        raw = _packbits_decode(raw)
    if len(raw) < row_bytes * nrows:
        raise ImageError("TIFF segment shorter than its rows")
    seg = np.frombuffer(
        raw[:row_bytes * nrows], np.uint8).reshape(nrows, row_bytes)
    if pred == 2:
        seg = (_undo_predictor2(seg, spp) if bits0 == 8
               else _undo_predictor2_16(seg, spp, order))
    if bits0 == 1:
        px = np.unpackbits(seg, axis=1)[:, :seg_w]
        return np.where(px == 1, 255, 0).astype(np.uint8)[:, :, None]
    if bits0 == 4:
        # palette nibbles, high nibble first (§4 default fill order)
        inter = np.empty((nrows, seg.shape[1] * 2), np.uint8)
        inter[:, ::2], inter[:, 1::2] = seg >> 4, seg & 0xF
        return inter[:, :seg_w][:, :, None]
    if bits0 == 16:
        vals = np.ascontiguousarray(seg).view(np.dtype(order + "u2"))
        return (vals.reshape(nrows, seg_w, spp) >> 8).astype(np.uint8)
    return seg.reshape(nrows, seg_w, spp)


def decode_tiff(buf: bytes) -> np.ndarray:
    """TIFF 6.0 baseline decoder — first IFD only (the image a scanner
    or exporter puts first; later IFDs are thumbnails/pages).

    Reference analog: ``cv2.imread`` accepts .tif/.tiff uploads at
    /root/reference/text_extractor.py:887-903; this is the from-scratch
    twin for the sandbox (r3 VERDICT stretch #7)."""
    if buf[:4] == b"II*\x00":
        order = "<"
    elif buf[:4] == b"MM\x00*":
        order = ">"
    else:
        raise ImageError(f"not a TIFF payload: {buf[:4]!r}")
    if len(buf) < 8:
        raise ImageError("truncated TIFF header")
    tags = _tiff_ifd(buf, order, struct.unpack(order + "I", buf[4:8])[0])

    def one(tag: int, default=None) -> int:
        # a corrupt entry with count=0 parses to [] — same as absent
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ImageError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    if not width or not height:
        raise ImageError("TIFF zero-sized image")
    comp = one(259, 1)
    photo = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, [1])
    pred = one(317, 1)
    tiled = 322 in tags or 323 in tags
    planar = one(284, 1) == 2 and spp == 3
    t4opts = one(292, 0)
    if comp not in (1, 2, 3, 4, 5, 32773) or photo not in (0, 1, 2, 3) \
            or one(284, 1) not in (1, 2) \
            or set(bits) not in ({1}, {4}, {8}, {16}) \
            or spp not in (1, 3) or len(bits) != spp \
            or (spp == 3 and bits[0] not in (8, 16)) \
            or (comp in (2, 3, 4) and (bits != [1] or spp != 1
                                       or one(266, 1) != 1)) \
            or (comp == 3 and t4opts & 2) \
            or (photo == 3 and (spp != 1 or bits[0] not in (4, 8)
                                or comp in (2, 3, 4) or pred != 1
                                or len(tags.get(320, []))
                                != 3 << bits[0])) \
            or (photo != 3 and bits[0] == 4):
        # uncompressed-mode G3 / LSB-fill fax / >16-bit / malformed
        # ColorMap / non-palette 4-bit etc.
        return _decode_real(buf)
    if pred == 2 and bits[0] not in (8, 16):
        raise ImageError("TIFF predictor 2 requires 8/16-bit samples")
    t4_2d = comp == 3 and bool(t4opts & 1)
    # §14 PlanarConfiguration 2: each component's segments form an
    # independent single-channel plane (segment tables are
    # channel-major), so assemble per channel with spp=1 and stack
    spp_eff = 1 if planar else spp

    def assemble(offsets: list[int], counts: list[int]) -> np.ndarray:
        """All segments of one plane (or the whole chunky image) →
        (height, width, spp_eff) pixels."""
        if tiled:
            # §15 tile organization: tw×tl blocks padded to full size
            # at the right/bottom edges, left-to-right then top-down
            tw, tl = one(322), one(323)
            if not tw or not tl or tw % 16 or tl % 16:
                raise ImageError(
                    "TIFF tile dims must be positive ×16 (§15)")
            across = (width + tw - 1) // tw
            down = (height + tl - 1) // tl
            if len(offsets) < across * down or len(counts) < len(offsets):
                raise ImageError("TIFF tile table shorter than the grid")
            arr = np.zeros((height, width, spp_eff), np.uint8)
            for ty in range(down):
                for tx in range(across):
                    off = offsets[ty * across + tx]
                    cnt = counts[ty * across + tx]
                    if off + cnt > len(buf):
                        raise ImageError("TIFF tile out of range")
                    seg = _tiff_segment_pixels(
                        bytes(buf[off:off + cnt]), comp, tw, tl,
                        spp_eff, bits[0], pred, order, t4_2d)
                    hc = min(tl, height - ty * tl)
                    wc = min(tw, width - tx * tw)
                    arr[ty * tl:ty * tl + hc,
                        tx * tw:tx * tw + wc] = seg[:hc, :wc]
            return arr
        rps = min(max(one(278, height), 1), height)
        rows = []
        for s, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(buf):
                raise ImageError("TIFF strip out of range")
            nrows = min(rps, height - s * rps)
            if nrows <= 0:
                break
            rows.append(_tiff_segment_pixels(
                bytes(buf[off:off + cnt]), comp, width, nrows,
                spp_eff, bits[0], pred, order, t4_2d))
        if not rows:
            raise ImageError("TIFF has no decodable strips")
        arr = np.concatenate(rows, axis=0)
        if arr.shape[0] != height:
            raise ImageError("TIFF strips do not cover the image height")
        return arr

    offsets = tags.get(324 if tiled else 273)
    if not offsets:
        raise ImageError("TIFF missing segment offsets")
    counts = tags.get(325 if tiled else 279)
    if counts is None:
        if tiled or comp != 1 or len(offsets) != 1:
            raise ImageError("TIFF missing segment byte counts")
        counts = [(width * spp * bits[0] + 7) // 8 * height]
    if planar:
        n = len(offsets) // 3
        if n * 3 != len(offsets) or len(counts) < len(offsets):
            raise ImageError("TIFF planar segment table not ×3")
        arr = np.concatenate(
            [assemble(offsets[c * n:(c + 1) * n],
                      counts[c * n:(c + 1) * n]) for c in range(3)],
            axis=2)
    else:
        arr = assemble(offsets, counts)

    if spp == 1:
        arr = arr[:, :, 0]
    if photo == 3:
        # palette: indices through ColorMap (3×2^bits SHORTs stored
        # R..G..B, 16-bit intensities — fold to the high byte)
        cmap = (np.asarray(tags[320], np.uint16)
                .reshape(3, -1) >> 8).astype(np.uint8)
        if int(arr.max(initial=0)) >= cmap.shape[1]:
            raise ImageError("TIFF palette index out of ColorMap range")
        return np.stack([cmap[c][arr] for c in range(3)], axis=-1)
    if photo == 0:  # WhiteIsZero: min value is white
        arr = (255 - arr.astype(np.uint16)).astype(np.uint8)
    return arr


def _tiff_encode_segment(rows: np.ndarray, compression: str,
                         predictor: int, spp: int,
                         byteorder: str) -> bytes:
    """One strip or tile of pixel rows (n, seg_w*spp), uint8 or uint16,
    → compressed wire bytes (predictor applied per row, §14)."""
    if predictor == 2:
        wide = rows.dtype == np.uint16
        a = rows.reshape(rows.shape[0], -1, spp).astype(
            np.int32 if wide else np.int16)
        a[:, 1:] -= a[:, :-1].copy()
        rows = ((a & 0xFFFF).astype(np.dtype(byteorder + "u2")) if wide
                else (a & 0xFF).astype(np.uint8)).reshape(rows.shape)
    elif rows.dtype == np.uint16:
        rows = rows.astype(np.dtype(byteorder + "u2"))
    raw = rows.tobytes()
    if compression in ("g4", "mh", "g3", "g3-2d"):
        # fax convention: photometric 0 (WhiteIsZero) — light pixels
        # (>= 128) are the white runs, dark pixels the ink
        from .fax_codec import g3_encode, g4_encode, mh_encode
        ink = rows < 128
        if compression == "g4":
            return g4_encode(ink)
        if compression == "mh":
            return mh_encode(ink)
        return g3_encode(ink, two_d=compression == "g3-2d")
    if compression == "lzw":
        return _lzw_encode(raw)
    if compression == "packbits":
        wire = (np.ascontiguousarray(rows).view(np.uint8)
                if rows.dtype != np.uint8 else rows)
        return b"".join(_packbits_encode_row(bytes(r)) for r in wire)
    return raw


def encode_tiff(arr: np.ndarray, compression: str = "none",
                predictor: int = 1, byteorder: str = "<",
                rows_per_strip: int | None = None,
                tile: tuple[int, int] | None = None,
                palette: np.ndarray | None = None,
                palette_bits: int = 8,
                planar: bool = False) -> bytes:
    """TIFF 6.0 writer for the fixture/round-trip side: gray ``(h, w)``
    or RGB ``(h, w, 3)``, uint8 (BitsPerSample 8) or uint16 (16),
    chunky; strip-based, or §15 tiled when ``tile=(tw, tl)`` (×16 dims,
    edge tiles padded — light/zero padding, cropped on decode).
    ``compression``: none | lzw | packbits | g4 | mh | g3 | g3-2d
    (fax tiers are bilevel — light pixels become white runs,
    photometric 0; g3-2d writes T4Options bit 0); ``predictor=2`` (lzw
    only) exercises §14 horizontal differencing; both byte orders.
    ``palette`` ((n, 3) uint8) writes photometric 3 with ``arr`` as
    indices at ``palette_bits`` ∈ {4, 8} (strips only). ``planar``
    writes PlanarConfiguration 2: channel-major segment tables, each
    channel an independent single-sample plane."""
    if arr.dtype not in (np.uint8, np.uint16) or arr.ndim not in (2, 3):
        raise ImageError("encode_tiff wants uint8/uint16 (h,w) or (h,w,3)")
    fax = compression in ("g4", "mh", "g3", "g3-2d")
    if compression not in ("none", "lzw", "packbits") and not fax:
        raise ImageError(f"unsupported compression {compression!r}")
    if predictor not in (1, 2) or (predictor == 2 and compression != "lzw"):
        raise ImageError("predictor 2 is defined here for lzw only")
    if fax and (arr.ndim != 2 or arr.dtype != np.uint8):
        raise ImageError("fax tiers are bilevel: encode_tiff wants "
                         "uint8 (h, w)")
    if tile is not None and (tile[0] % 16 or tile[1] % 16
                             or tile[0] <= 0 or tile[1] <= 0):
        raise ImageError("TIFF tile dims must be positive ×16 (§15)")
    if palette is not None and (
            arr.ndim != 2 or arr.dtype != np.uint8 or fax
            or predictor != 1 or tile is not None
            or palette_bits not in (4, 8)
            or len(palette) > (1 << palette_bits)
            or int(arr.max(initial=0)) >= len(palette)):
        raise ImageError("palette wants uint8 (h, w) indices within the "
                         "map, strips, no predictor/fax, bits 4 or 8")
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    sample_bits = 16 if arr.dtype == np.uint16 else 8
    if planar and (spp != 3 or palette is not None or fax):
        raise ImageError("planar wants (h, w, 3) samples, no palette/fax")
    rps = h if rows_per_strip is None else max(1, rows_per_strip)

    def segments_of(img3: np.ndarray) -> list[bytes]:
        """One plane (c=1) or the chunky image (c=spp) → wire segments
        (strips, or tiles when ``tile`` is set)."""
        c = img3.shape[2]
        segs: list[bytes] = []
        if tile is not None:
            tw, tl = tile
            pad_h = (h + tl - 1) // tl * tl
            pad_w = (w + tw - 1) // tw * tw
            full = np.zeros((pad_h, pad_w, c), img3.dtype)
            full[:h, :w] = img3
            for ty in range(0, pad_h, tl):
                for tx in range(0, pad_w, tw):
                    seg = full[ty:ty + tl, tx:tx + tw].reshape(tl, tw * c)
                    segs.append(_tiff_encode_segment(
                        seg, compression, predictor, c, byteorder))
        else:
            f = img3.reshape(img3.shape[0], -1)
            for y0 in range(0, h, rps):
                segs.append(_tiff_encode_segment(
                    f[y0:y0 + rps], compression, predictor, c, byteorder))
        return segs

    if palette is not None and palette_bits == 4:
        idx = np.pad(arr, ((0, 0), (0, w % 2))) if w % 2 else arr
        packed = ((idx[:, ::2] << 4) | idx[:, 1::2]).astype(np.uint8)
        strips = segments_of(packed[:, :, None])
    elif planar:
        # §14 channel-major segment tables: all of R's, then G's, then B's
        strips = [s for c in range(3)
                  for s in segments_of(arr[:, :, c:c + 1])]
    else:
        strips = segments_of(arr.reshape(h, w, spp))

    comp_id = {"none": 1, "lzw": 5, "packbits": 32773, "g4": 4,
               "mh": 2, "g3": 3, "g3-2d": 3}[compression]
    out = bytearray(struct.pack(
        byteorder + "2sHI", b"II" if byteorder == "<" else b"MM", 42, 0))
    strip_offs = []
    for s in strips:
        strip_offs.append(len(out))
        out += s
        if len(out) & 1:  # spec §2: all offsets must be word-aligned
            out += b"\0"

    def entry(tag: int, typ: int, vals: list[int]) -> bytes:
        size = _TIFF_TYPE_SIZE[typ] * len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        packed = b"".join(struct.pack(byteorder + fmt, v) for v in vals)
        if size <= 4:
            return struct.pack(byteorder + "HHI", tag, typ, len(vals)) \
                + packed.ljust(4, b"\0")
        nonlocal extra
        ptr = extra_base + len(extra)
        extra += packed
        return struct.pack(byteorder + "HHII", tag, typ, len(vals), ptr)

    if fax:
        bits_f, photo_f = [1], 0
    elif palette is not None:
        bits_f, photo_f = [palette_bits], 3
    else:
        bits_f, photo_f = [sample_bits] * spp, 2 if spp == 3 else 1
    fields: list[tuple[int, int, list[int]]] = [
        (256, 4, [w]), (257, 4, [h]),
        (258, 3, bits_f), (259, 3, [comp_id]),
        (262, 3, [photo_f]),
        (277, 3, [spp]),
    ]
    if planar:
        fields.append((284, 3, [2]))
    if compression == "g3-2d":
        fields.append((292, 4, [1]))  # T4Options: 2D coding
    if palette is not None:
        ncol = 1 << palette_bits
        cmap = [(int(palette[i][c]) << 8 if i < len(palette) else 0)
                for c in range(3) for i in range(ncol)]
        fields.append((320, 3, cmap))
    if tile is not None:
        fields += [(322, 4, [tile[0]]), (323, 4, [tile[1]]),
                   (324, 4, strip_offs),
                   (325, 4, [len(s) for s in strips])]
    else:
        fields += [(273, 4, strip_offs), (278, 4, [rps]),
                   (279, 4, [len(s) for s in strips])]
    if predictor == 2:
        fields.append((317, 3, [2]))
    ifd_size = 2 + 12 * len(fields) + 4
    extra_base = len(out) + ifd_size
    extra = b""
    ifd = struct.pack(byteorder + "H", len(fields)) + b"".join(
        entry(t, ty, v) for t, ty, v in sorted(fields)) \
        + struct.pack(byteorder + "I", 0)
    out[4:8] = struct.pack(byteorder + "I", len(out))
    out += ifd + extra
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _decode_real(buf: bytes) -> np.ndarray:  # pragma: no cover - no libs here
    try:
        import cv2
    except ImportError as exc:
        raise NotImplementedError(
            "exotic raster variants (arithmetic/12-bit/hierarchical "
            "JPEG, TIFF-JPEG, lossy VP8) need cv2/PIL, "
            "not installed in this environment — PNG, baseline + "
            "progressive JPEG, strip/tile/planar TIFF (incl. the fax "
            "family, 16-bit, palettes), and VP8L WebP decode from "
            "scratch") from exc
    arr = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    if arr is None:
        raise ImageError("cv2.imdecode failed")
    # module contract: decoders return gray or RGB — cv2 hands back
    # BGR/BGRA, which would swap the red/blue luma weights in to_gray
    if arr.ndim == 3 and arr.shape[2] == 4:
        arr = arr[:, :, :3]
    if arr.ndim == 3 and arr.shape[2] == 3:
        arr = arr[:, :, ::-1]
    return arr


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-sniffing decoder over every supported container."""
    if buf[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return decode_pnm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:4] == b"FIMG":
        if len(buf) < 8:
            # struct.error is not a ValueError subclass — a truncated
            # header must keep the typed-error contract
            raise ImageError("truncated FIMG header")
        w, h = struct.unpack(">HH", buf[4:8])
        return decode_raw_gray(buf[8:], w, h)
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:3] == b"\xff\xd8\xff":
        try:
            return decode_jpeg(buf)  # baseline + progressive: from scratch
        except _UnsupportedJpeg:
            # progressive/arithmetic/12-bit — the real-codec hook
            return _decode_real(buf)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(buf)  # baseline strips; exotic → real hook
    if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        from .webp_codec import decode_webp
        return decode_webp(buf)  # VP8L from scratch; lossy → real hook
    raise ImageError(f"unrecognized image magic {buf[:4]!r}")
