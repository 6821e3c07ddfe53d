"""PDF text-layer extraction kernel (SPEC.md §4).

From-scratch pure-Python content-stream reader (the sandbox has none of the
reference's PDF libs). Reproduces the reference's PDF *contract* — pages
joined ``'\\n\\n'`` (/root/reference/text_extractor.py:573), text-layer
gate at >50 stripped chars (/root/reference/text_extractor.py:501-507),
confidence 0.95 (/root/reference/text_extractor.py:511) — while replacing
its pdfplumber→PyMuPDF→PyPDF2 cascade (/root/reference/text_extractor.py:
534-573) with pdfminer-style layout analysis: y-cluster line grouping,
descending-y reading order, x-sorted runs within a line (north-star
requirement).

Object model: scan for ``N G obj … endobj``; streams delimited by
``stream``/``endstream``; FlateDecode via stdlib zlib. Page order from the
root /Pages node's /Kids when present.
"""

from __future__ import annotations

import re
import unicodedata
import zlib

_OBJ_START_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
# ISO 32000 §7.7.3.1 also allows the array form /Contents [3 0 R 4 0 R]
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
# ISO 32000 §7.3.3: reals may end with the dot ('10.') or start with it
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")

# TJ kerning threshold (thousandths of text space) below which a space is
# inserted — SPEC.md §4 step 3.
KERN_SPACE = -180.0
# y values rounded to one decimal for line clustering — SPEC.md §4 step 5.
_Y_ROUND = 1


class PdfError(ValueError):
    """Raised on any malformed-PDF condition; caller maps to status='error'."""


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential object scan → {obj_num: (dict_head, raw_stream_or_None)}.

    Stream extents come from a direct /Length when present (binary stream
    bytes may legitimately contain ``endobj``/``endstream``); otherwise the
    first ``endstream`` delimits.
    """
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        end_obj = data.find(b"endobj", body_start)
        sm = _STREAM_START_RE.search(data, body_start)
        if sm is not None and (end_obj < 0 or sm.start() < end_obj):
            head = data[body_start : sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm is not None:
                s0 = sm.end()
                s1 = s0 + int(lm.group(1))
            else:
                s0 = sm.end()
                s1 = data.find(b"endstream", s0)
                if s1 < 0:
                    raise PdfError("unterminated stream")
                # trailing EOL before 'endstream' belongs to the delimiter
                if data[s1 - 2 : s1] == b"\r\n":
                    s1 -= 2
                elif data[s1 - 1 : s1] == b"\n":
                    s1 -= 1
            objs[num] = (head, data[s0:s1])
            end_obj = data.find(b"endobj", s1)
            pos = len(data) if end_obj < 0 else end_obj + 6
        else:
            if end_obj < 0:
                raise PdfError(f"object {num} not terminated")
            objs[num] = (data[body_start:end_obj], None)
            pos = end_obj + 6
    if not objs:
        raise PdfError("no PDF objects found")
    return objs


def _decode_stream(head: bytes, raw: bytes) -> bytes:
    if b"/FlateDecode" in head:
        try:
            raw = zlib.decompress(raw)
        except zlib.error as exc:
            raise PdfError(f"FlateDecode failed: {exc}") from exc
    return raw


def _ordered_pages(objs: dict[int, tuple[bytes, bytes | None]]
                   ) -> list[tuple[int, bytes]]:
    """Page objects in document order: depth-first walk of the page TREE
    from its root(s), else object-number order. Returns
    [(page_obj_num, page_dict_head)].

    The tree may be nested (ISO 32000 §7.7.3.2: intermediate /Pages
    nodes) — a flat 'last /Kids wins' read keeps only one subtree and
    silently drops the others' pages. Roots are /Pages nodes that no
    other /Pages lists as a kid; a visited set makes malformed cyclic
    trees terminate instead of recursing forever."""
    pages: dict[int, bytes] = {}
    kids_of: dict[int, list[int]] = {}
    for num, (head, _stream) in objs.items():
        if re.search(rb"/Type\s*/Page\b(?!s)", head):
            pages[num] = head
        elif re.search(rb"/Type\s*/Pages\b", head):
            km = _KIDS_RE.search(head)
            kids_of[num] = [int(r.group(1))
                            for r in _REF_RE.finditer(km.group(1))] \
                if km else []
    if not pages:
        raise PdfError("no /Type /Page objects")
    listed = {k for kids in kids_of.values() for k in kids}
    roots = sorted(n for n in kids_of if n not in listed)
    order: list[int] = []
    seen: set[int] = set()
    stack = list(reversed(roots))
    while stack:
        n = stack.pop()
        if n in seen:
            continue  # malformed cycle / duplicate ref
        seen.add(n)
        if n in pages:
            order.append(n)
        else:
            stack.extend(reversed(kids_of.get(n, [])))
    ordered = order or sorted(pages)
    return [(n, pages[n]) for n in ordered]


def _content_refs(head: bytes) -> list[int]:
    """Object numbers of a page's content stream(s): the single-ref form
    or the spec's array form /Contents [3 0 R 4 0 R] (whose streams
    concatenate in order, §7.8.2)."""
    am = _CONTENTS_ARR_RE.search(head)
    if am:
        return [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
    cm = _CONTENTS_RE.search(head)
    return [int(cm.group(1))] if cm else []


def _page_content_streams(objs: dict[int, tuple[bytes, bytes | None]]) -> list[bytes]:
    streams: list[bytes] = []
    for _num, head in _ordered_pages(objs):
        refs = _content_refs(head)
        if not refs:
            # /Contents is optional per the PDF spec (a blank page) — skip
            # it, matching the oracle (oracle/extractor.py:_pdf_pages keeps
            # only pages WITH a /Contents ref). Raising here would flip a
            # 9-good-pages document into a whole-doc error row.
            continue
        parts = []
        for ref in refs:
            entry = objs.get(ref)
            if entry is None or entry[1] is None:
                raise PdfError(f"missing /Contents stream object {ref}")
            parts.append(_decode_stream(entry[0], entry[1]))
        # §7.8.2: multiple streams form one content stream, separated by
        # at least one whitespace byte
        streams.append(b"\n".join(parts))
    if not streams:
        raise PdfError("no page has /Contents")  # oracle: 'no pages'
    return streams


_XOBJ_DICT_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.DOTALL)
_NAME_REF_RE = re.compile(rb"/[^\s/<>\[\]()]+\s+(\d+)\s+\d+\s+R")
_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")


def extract_page_images(data: bytes) -> list[list[tuple[int, int, bytes]]]:
    """Per-page decoded image XObjects — the raster source for the PDF OCR
    path (S5; reference page render at /root/reference/text_extractor.py:
    575-610 — a table pipeline carries scanned pages as embedded images
    rather than re-rendering, so extraction replaces rasterization).

    Returns one list per page of ``(width, height, raw_bytes)`` where
    raw_bytes is the FlateDecoded /DeviceGray 8-bit sample buffer
    (width*height bytes, row-major) — decode with
    ``image_codec.decode_raw_gray``.
    """
    objs = _parse_objects(data)
    out: list[list[tuple[int, int, bytes]]] = []
    for _num, head in _ordered_pages(objs):
        images: list[tuple[int, int, bytes]] = []
        xm = _XOBJ_DICT_RE.search(head)
        if xm:
            for m in _NAME_REF_RE.finditer(xm.group(1)):
                entry = objs.get(int(m.group(1)))
                if entry is None or entry[1] is None:
                    continue
                ihead, istream = entry
                if not re.search(rb"/Subtype\s*/Image\b", ihead):
                    continue
                wm = _WIDTH_RE.search(ihead)
                hm = _HEIGHT_RE.search(ihead)
                if not (wm and hm):
                    continue
                images.append((int(wm.group(1)), int(hm.group(1)),
                               _decode_stream(ihead, istream)))
        out.append(images)
    return out


# --------------------------------------------------------------------------
# content-stream tokenizer / interpreter
# --------------------------------------------------------------------------

_ESCAPES = {
    b"n"[0]: "\n", b"r"[0]: "\r", b"t"[0]: "\t", b"b"[0]: "\b",
    b"f"[0]: "\f", b"("[0]: "(", b")"[0]: ")", b"\\"[0]: "\\",
}


def _read_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal starting at the '(' — SPEC.md §4 step 4."""
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out: list[str] = []
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(chr(int(data[i:j], 8) & 0xFF))
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1
            out.append(")")
            i += 1
        else:
            out.append(chr(c))  # Latin-1 semantics
            i += 1
    raise PdfError("unterminated string literal")


def _read_hex_string(data: bytes, i: int) -> tuple[str, int]:
    assert data[i : i + 1] == b"<"
    j = data.find(b">", i + 1)
    if j < 0:
        raise PdfError("unterminated hex string")
    hexdigits = re.sub(rb"\s+", b"", data[i + 1 : j])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    try:
        raw = bytes.fromhex(hexdigits.decode("ascii"))
    except ValueError as exc:
        raise PdfError(f"bad hex string: {exc}") from exc
    return raw.decode("latin-1"), j + 1


_DELIMS = b"()<>[]{}/%"
_WS = b"\x00\t\n\x0c\r "


def _tokenize(data: bytes):
    """Yield ('str', s) | ('num', f) | ('op', name) | ('arr', ...) markers."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # (
            s, i = _read_literal_string(data, i)
            yield ("str", s)
        elif c == 0x3C:  # < — hex string or dict
            if data[i : i + 2] == b"<<":
                yield ("op", "<<")
                i += 2
            else:
                s, i = _read_hex_string(data, i)
                yield ("str", s)
        elif data[i : i + 2] == b">>":
            yield ("op", ">>")
            i += 2
        elif c == 0x5B:  # [
            yield ("op", "[")
            i += 1
        elif c == 0x5D:  # ]
            yield ("op", "]")
            i += 1
        elif c == 0x2F:  # /name
            j = i + 1
            while j < n and data[j] not in _WS and data[j] not in _DELIMS:
                j += 1
            yield ("name", data[i:j].decode("latin-1"))
            i = j
        else:
            j = i
            while j < n and data[j] not in _WS and data[j] not in _DELIMS:
                j += 1
            tok = data[i:j]
            if not tok:
                raise PdfError(f"stray delimiter {data[i:i+1]!r}")
            if _NUM_RE.fullmatch(tok):
                yield ("num", float(tok))
            else:
                yield ("op", tok.decode("latin-1"))
            i = j


def _interpret(stream: bytes) -> list[tuple[float, float, str]]:
    """Run the text operators; return emitted runs (tx, ty, text)."""
    runs: list[tuple[float, float, str]] = []
    tx = ty = 0.0
    leading = 0.0
    stack: list = []  # operand stack (nums, strs, arrays)
    arrays: list[list] = []  # nested [ ... ] capture

    def emit(s: str) -> None:
        if s:
            runs.append((tx, ty, s))

    for kind, val in _tokenize(stream):
        if kind in ("num", "str"):
            (arrays[-1] if arrays else stack).append((kind, val))
        elif kind == "name":
            (arrays[-1] if arrays else stack).append((kind, val))
        elif val == "[":
            arrays.append([])
        elif val == "]":
            arr = arrays.pop()
            (arrays[-1] if arrays else stack).append(("arr", arr))
        elif val in ("<<", ">>"):
            continue
        else:  # operator — consume operands from stack
            op = val
            if op == "BT":
                tx = ty = 0.0
            elif op == "Td" and len(stack) >= 2:
                b = stack[-1][1]
                a = stack[-2][1]
                tx, ty = tx + a, ty + b
            elif op == "TD" and len(stack) >= 2:
                b = stack[-1][1]
                a = stack[-2][1]
                leading = -b
                tx, ty = tx + a, ty + b
            elif op == "Tm" and len(stack) >= 6:
                tx, ty = stack[-2][1], stack[-1][1]
            elif op == "T*":
                ty -= leading
            elif op == "TL" and stack:
                leading = stack[-1][1]
            elif op == "Tj" and stack and stack[-1][0] == "str":
                emit(stack[-1][1])
            elif op == "TJ" and stack and stack[-1][0] == "arr":
                parts: list[str] = []
                for k, v in stack[-1][1]:
                    if k == "str":
                        parts.append(v)
                    elif k == "num" and v <= KERN_SPACE:
                        parts.append(" ")
                emit("".join(parts))
            elif op == "'" and stack and stack[-1][0] == "str":
                ty -= leading
                emit(stack[-1][1])
            elif op == '"' and len(stack) >= 3 and stack[-1][0] == "str":
                ty -= leading
                emit(stack[-1][1])
            stack.clear()
    return runs


def _layout(runs: list[tuple[float, float, str]]) -> str:
    """y-cluster line grouping, descending-y order, x-sorted runs."""
    lines: dict[float, list[tuple[float, str]]] = {}
    for tx, ty, s in runs:
        lines.setdefault(round(ty, _Y_ROUND), []).append((tx, s))
    out_lines: list[str] = []
    for y in sorted(lines, reverse=True):
        parts = [s.strip() for _, s in sorted(lines[y], key=lambda p: p[0])]
        line = " ".join(p for p in parts if p)
        if line:
            out_lines.append(line)
    return "\n".join(out_lines)


def extract_pdf(
    data: bytes,
) -> tuple[str, list[tuple[int, int, int, int, int]], str, int]:
    """Return ``(extracted_text, spans, text_layer_flag, n_pages)`` — SPEC.md §4.

    spans: (block_idx=page, start, end, -1, -1). Raises PdfError on
    malformed input (caller converts to a status='error' row — a row never
    kills the job, reference analog text_extractor.py:987-989).
    """
    objs = _parse_objects(data)
    page_texts = [
        unicodedata.normalize("NFC", _layout(_interpret(s)))
        for s in _page_content_streams(objs)
    ]
    out_parts: list[str] = []
    spans: list[tuple[int, int, int, int, int]] = []
    offset = 0
    for p, text in enumerate(page_texts):
        if p > 0:
            offset += 2  # '\n\n' page join (text_extractor.py:573)
        if text:
            spans.append((p, offset, offset + len(text), -1, -1))
        offset += len(text)
    joined = "\n\n".join(page_texts)
    gate = "ok" if len(joined.strip()) > 50 else "short"  # P3 gate
    return joined, spans, gate, len(page_texts)
