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
- raw gray buffers (width*height bytes — the shape of a FlateDecoded
  /DeviceGray PDF image XObject)
- the repo's FIMG fake container (multimodal/media.py) for synth tables

JPEG (the one format needing a DCT codec) routes to an import-guarded
real-codec hook, same pattern as multimodal/media.py:_decode_real_image.

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
# dispatch
# ---------------------------------------------------------------------------

def _decode_real(buf: bytes) -> np.ndarray:  # pragma: no cover - no libs here
    try:
        import cv2
    except ImportError as exc:
        raise NotImplementedError(
            "compressed image codecs (PNG/JPEG) need cv2/PIL, not installed "
            "in this environment") from exc
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
    if buf[:3] == b"\xff\xd8\xff":  # JPEG needs a DCT codec
        return _decode_real(buf)
    raise ImageError(f"unrecognized image magic {buf[:4]!r}")
