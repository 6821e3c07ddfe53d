"""From-scratch OCR engine: bitmap-font rendering + template matching.

Reference analog: ``MultiEngineOCR`` (/root/reference/text_extractor.py:
312-488). The reference wraps three external engines (tesseract :425-437,
easyocr :439-457, paddleocr :459-478) behind a registry with availability
probes (:327-355) and an image-size auto-selector (:403-423). None of
those engines is installable in this sandbox, so the registry's default
slot is filled by a REAL engine built here from first principles:

- a public-domain-style 5x7 fixed-pitch bitmap font (A-Z 0-9 + punctuation)
- ``render_page``: text -> uint8 grayscale page image (the synth/fixture
  side — also what a rasterized "scanned" PDF page embeds)
- ``recognize``: line segmentation by row projection, glyph segmentation
  by column-gap analysis, bbox-normalized template matching with a
  position prior, per-token confidences

Contracts kept from the reference:
- token confidences are 0-100 and only ``conf > 0`` tokens count
  (:431, P5); document confidence = mean positive token conf / 100 (A6)
- region/line confidences mirror the easyocr/paddle per-region means
  (:446-457, :466-478; A7)
- ``select_engine`` reproduces the size heuristics (:403-423)
- engine registry + availability probing (:320-355): pytesseract/easyocr
  remain import-guarded plug-ins; 'template' is always available

Determinism: recognition of a clean ``render_page`` output at any integer
scale is EXACT — glyph cells are area-resampled (measure-preserving box
filter) onto the same 5x7 grid the templates live on, so a clean render
matches its template bit-for-bit and every token scores 100. That property
is what lets the driver's DuckDB oracle check an OCR roundtrip by string
equality (``__spark_entry__.ocr_roundtrip``).
"""

from __future__ import annotations

import numpy as np

from .image_prep import preprocess as _preprocess_chain
from .image_prep import to_gray

# ---------------------------------------------------------------------------
# 5x7 fixed-pitch font ('#' = ink). Fixed metrics: advance 8 (5 glyph cols
# + 3 blank), line stride 10 (7 rows + 3 blank) — the 3-col inter-glyph gap
# keeps glyph segmentation unambiguous vs intra-glyph blank columns (at most
# 1 col wide, e.g. '"') even after adaptive binarization thickens strokes
# by ~1 px per side.
# ---------------------------------------------------------------------------

FONT: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".####"),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".####", "#....", "#....", ".###.", "....#", "....#", "####."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "...#.", "..#..", ".#...", "#####"),
    "3": ("#####", "...#.", "..#..", "...#.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": ("..##.", ".#...", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "...#.", ".##.."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
    ",": (".....", ".....", ".....", ".....", ".##..", "..#..", ".#..."),
    ":": (".....", ".##..", ".##..", ".....", ".##..", ".##..", "....."),
    ";": (".....", ".##..", ".##..", ".....", ".##..", "..#..", ".#..."),
    "!": ("..#..", "..#..", "..#..", "..#..", "..#..", ".....", "..#.."),
    "?": (".###.", "#...#", "....#", "...#.", "..#..", ".....", "..#.."),
    "'": ("..#..", "..#..", ".....", ".....", ".....", ".....", "....."),
    '"': (".#.#.", ".#.#.", ".....", ".....", ".....", ".....", "....."),
    "(": ("...#.", "..#..", ".#...", ".#...", ".#...", "..#..", "...#."),
    ")": (".#...", "..#..", "...#.", "...#.", "...#.", "..#..", ".#..."),
    "-": (".....", ".....", ".....", "#####", ".....", ".....", "....."),
    "_": (".....", ".....", ".....", ".....", ".....", ".....", "#####"),
    "+": (".....", "..#..", "..#..", "#####", "..#..", "..#..", "....."),
    "=": (".....", ".....", "#####", ".....", "#####", ".....", "....."),
    "/": ("....#", "...#.", "...#.", "..#..", ".#...", ".#...", "#...."),
    "%": ("##...", "##..#", "...#.", "..#..", ".#...", "#..##", "...##"),
    "#": (".#.#.", ".#.#.", "#####", ".#.#.", "#####", ".#.#.", ".#.#."),
    "&": (".##..", "#..#.", "#.#..", ".#...", "#.#.#", "#..#.", ".##.#"),
    "*": (".....", "..#..", "#.#.#", ".###.", "#.#.#", "..#..", "....."),
    "<": ("...#.", "..#..", ".#...", "#....", ".#...", "..#..", "...#."),
    ">": (".#...", "..#..", "...#.", "....#", "...#.", "..#..", ".#..."),
    "@": (".###.", "#...#", "#.###", "#.#.#", "#.###", "#....", ".####"),
    "$": ("..#..", ".####", "#.#..", ".###.", "..#.#", "####.", "..#.."),
    "[": (".###.", ".#...", ".#...", ".#...", ".#...", ".#...", ".###."),
    "]": (".###.", "...#.", "...#.", "...#.", "...#.", "...#.", ".###."),
}

CHARSET = set(FONT) | {" "}
GLYPH_W, GLYPH_H = 5, 7
ADVANCE, LINE_STRIDE = 8, 10  # cols per char cell, rows per line


def normalize_to_charset(text: str) -> str:
    """Upper-case, map unsupported chars to spaces, collapse runs — the
    canonical pre-render normalization (and the SQL-expressible one the
    DuckDB oracle mirrors)."""
    up = text.upper()
    mapped = "".join(c if c in FONT else " " for c in up)
    return " ".join(mapped.split())


# ---------------------------------------------------------------------------
# rendering (synth / fixture side)
# ---------------------------------------------------------------------------

def _glyph_array(ch: str) -> np.ndarray:
    rows = FONT[ch]
    return np.array([[1 if c == "#" else 0 for c in r] for r in rows],
                    dtype=np.uint8)


def render_page(text: str, scale: int = 3, margin: int = 2,
                ink: int = 0, paper: int = 255) -> np.ndarray:
    """Render normalized text into a uint8 grayscale page image.

    Lines are ``\\n``-separated; characters outside the font render as
    blank cells. Fixed-pitch metrics (ADVANCE x LINE_STRIDE cells, scaled).
    """
    lines = text.split("\n") or [""]
    n_cols = max((len(ln) for ln in lines), default=0)
    h = (len(lines) * LINE_STRIDE + 2 * margin) * scale
    w = (max(n_cols, 1) * ADVANCE + 2 * margin) * scale
    page = np.full((h, w), paper, dtype=np.uint8)
    for li, ln in enumerate(lines):
        y0 = (margin + li * LINE_STRIDE) * scale
        for ci, ch in enumerate(ln):
            if ch not in FONT:
                continue
            x0 = (margin + ci * ADVANCE) * scale
            g = _glyph_array(ch)
            big = np.kron(g, np.ones((scale, scale), dtype=np.uint8))
            cell = page[y0:y0 + GLYPH_H * scale, x0:x0 + GLYPH_W * scale]
            cell[big == 1] = ink
    return page


# ---------------------------------------------------------------------------
# recognition
# ---------------------------------------------------------------------------

def _box_resample(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-weighted (box filter) resample to (out_h, out_w) floats.

    Measure-preserving: resampling an integer-factor nearest upscale of a
    template gives bit-identical cell means to resampling the template
    itself — the property behind clean-render exactness."""
    def _axis(a: np.ndarray, out_n: int) -> np.ndarray:
        n = a.shape[0]
        # prefix integral, linearly interpolated at fractional cell edges
        edges = np.linspace(0.0, n, out_n + 1)
        cum = np.vstack([np.zeros((1,) + a.shape[1:]),
                         np.cumsum(a, axis=0, dtype=np.float64)])
        lo = np.floor(edges).astype(int)
        frac = edges - lo
        lo = np.minimum(lo, n)
        vals = cum[lo] + np.where(
            (frac > 0)[:, None] if cum.ndim > 1 else frac > 0,
            (cum[np.minimum(lo + 1, n)] - cum[lo])
            * (frac[:, None] if cum.ndim > 1 else frac), 0.0)
        seg = np.diff(vals, axis=0)
        width = np.diff(edges)
        return seg / (width[:, None] if seg.ndim > 1 else width)

    rows = _axis(arr.astype(np.float64), out_h)
    return _axis(rows.T, out_w).T


_TEMPLATE_CHARS = sorted(FONT)


def _bbox_features(ink: np.ndarray, band_h: float, band_top: float
                   ) -> tuple[np.ndarray, float, float] | None:
    """(7x5 area-resampled bbox bitmap, rel_top, rel_height) of an ink
    mask, positions relative to the line band."""
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return None
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    cell = _box_resample(ink[y0:y1, x0:x1].astype(np.float64),
                         GLYPH_H, GLYPH_W)
    denom = max(band_h, 1.0)
    return cell, (y0 - band_top) / denom, (y1 - y0) / denom


def _build_templates() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    feats = np.empty((len(_TEMPLATE_CHARS), GLYPH_H * GLYPH_W))
    tops = np.empty(len(_TEMPLATE_CHARS))
    heights = np.empty(len(_TEMPLATE_CHARS))
    for i, ch in enumerate(_TEMPLATE_CHARS):
        f = _bbox_features(_glyph_array(ch).astype(bool), GLYPH_H, 0.0)
        assert f is not None
        feats[i] = f[0].ravel()
        tops[i], heights[i] = f[1], f[2]
    return feats, tops, heights


_T_FEATS, _T_TOPS, _T_HEIGHTS = _build_templates()
_POS_WEIGHT = 0.35  # position prior weight (disambiguates '-'/'_'/.'/"'")


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) runs of True in a 1-D mask."""
    idx = np.flatnonzero(np.diff(np.concatenate(
        [[0], mask.astype(np.int8), [0]])))
    return list(zip(idx[0::2], idx[1::2]))


def recognize(img: np.ndarray, ink_threshold: int = 128) -> dict:
    """Recognize text in a grayscale/binary page image.

    Returns ``{'text', 'tokens', 'token_confs', 'line_confs', 'n_lines'}``
    — token confidences are 0-100 (tesseract dict contract,
    text_extractor.py:431); line confidences are the per-region analog
    (:446-457)."""
    gray = to_gray(img)
    ink = gray < ink_threshold
    tokens: list[str] = []
    token_confs: list[float] = []
    line_confs: list[float] = []
    out_lines: list[str] = []

    row_has_ink = ink.any(axis=1)
    line_bands = _runs(row_has_ink)
    # Merge bands whose gap is internal glyph blank space (e.g. the
    # '!'/'?' dot row) rather than a true line gap. Two conditions:
    # - gap <= 2.5/7 of the tallest band: internal blanks are <= 2 of
    #   the 7 glyph rows, true line gaps are >= 3 (LINE_STRIDE 10 -
    #   GLYPH_H 7), so the midpoint separates them at every scale —
    #   including a page whose tallest line is punctuation-only (a
    #   5-row '!' bar; tallest < 7 rows only SHRINKS the threshold).
    #   The old 0.2x-with-strict-'<' rule hit exact equality there
    #   (gap = 1 row = 0.2*5) and split the dot into its own line.
    # - merged span <= 1.5x the tallest band: a glyph-internal merge
    #   reassembles at most one glyph height (7/5 of a bar-only
    #   tallest), while bridging two LINES spans >= 17/7 of tallest —
    #   this keeps residual salt-and-pepper specks in the line gap
    #   (survivors of denoise) from chain-gluing adjacent lines: a
    #   speck may join the nearer line's band (harmless), but the
    #   line-plus-speck band can never absorb the next line.
    if line_bands:
        tallest = max(b - a for a, b in line_bands)
        gap_max = (2.5 / 7.0) * tallest
        span_max = 1.5 * tallest
        merged = [line_bands[0]]
        for a, b in line_bands[1:]:
            if (a - merged[-1][1] <= gap_max
                    and b - merged[-1][0] <= span_max):
                merged[-1] = (merged[-1][0], b)
            else:
                merged.append((a, b))
        line_bands = merged

    for (ly0, ly1) in line_bands:
        band = ink[ly0:ly1]
        band_h = float(ly1 - ly0)
        scale_est = band_h / GLYPH_H
        col_has_ink = band.any(axis=0)
        col_runs = _runs(col_has_ink)
        if not col_runs:
            continue
        # merge column runs whose gap is intra-glyph (< 1.7 * scale —
        # an intra-glyph blank column is 1 col, shrunk further by the
        # binarize halo, while the inter-glyph gap is >= 3 cols); gaps
        # >= 8 * scale separate words — the widest non-space gap is 6
        # cols (two adjacent narrow glyphs like ':1'), the narrowest
        # space gap is 14 cols
        glyphs: list[tuple[int, int]] = [col_runs[0]]
        for a, b in col_runs[1:]:
            if a - glyphs[-1][1] < 1.7 * scale_est:
                glyphs[-1] = (glyphs[-1][0], b)
            else:
                glyphs.append((a, b))

        feats = []
        for (gx0, gx1) in glyphs:
            f = _bbox_features(band[:, gx0:gx1], band_h, 0.0)
            feats.append(f)
        # batch template match: (n_glyphs, 35) vs (n_templates, 35)
        chars: list[str] = []
        confs: list[float] = []
        for f in feats:
            if f is None:
                chars.append(" ")
                confs.append(0.0)
                continue
            cell, rtop, rheight = f
            dist = np.abs(_T_FEATS - cell.ravel()[None, :]).mean(axis=1)
            pos_pen = _POS_WEIGHT * (np.abs(_T_TOPS - rtop)
                                     + np.abs(_T_HEIGHTS - rheight))
            score = 1.0 - dist - pos_pen
            k = int(np.argmax(score))
            chars.append(_TEMPLATE_CHARS[k])
            confs.append(float(np.clip((1.0 - dist[k]) * 100.0, 0.0, 100.0)))

        # word grouping by inter-glyph gap
        words: list[list[int]] = [[0]]
        for i in range(1, len(glyphs)):
            gap = glyphs[i][0] - glyphs[i - 1][1]
            if gap >= 8.0 * scale_est:
                words.append([i])
            else:
                words[-1].append(i)
        line_tokens = []
        line_token_confs = []
        for w in words:
            tok = "".join(chars[i] for i in w).strip()
            if not tok:
                continue
            conf = float(np.mean([confs[i] for i in w]))
            line_tokens.append(tok)
            line_token_confs.append(conf)
        if line_tokens:
            out_lines.append(" ".join(line_tokens))
            tokens.extend(line_tokens)
            token_confs.extend(line_token_confs)
            line_confs.append(float(np.mean(line_token_confs)))

    return {"text": "\n".join(out_lines), "tokens": tokens,
            "token_confs": token_confs, "line_confs": line_confs,
            "n_lines": len(out_lines)}


# ---------------------------------------------------------------------------
# engine registry (reference :315-355) + auto-selection (:403-423)
# ---------------------------------------------------------------------------

def _ocr_template(img: np.ndarray) -> tuple[str, float, list[float]]:
    """The always-available engine. Returns (text, confidence, token_confs)
    with the tesseract aggregation contract: mean of conf>0 tokens / 100
    (text_extractor.py:431-437)."""
    res = recognize(img)
    positive = [c for c in res["token_confs"] if c > 0]  # P5 token filter
    conf = (sum(positive) / len(positive) / 100.0) if positive else 0.0
    return res["text"].strip(), conf, res["token_confs"]


def _init_engines() -> dict:
    engines: dict = {}
    try:  # pragma: no cover - not installed in this sandbox
        import pytesseract  # noqa: F401
        pytesseract.get_tesseract_version()

        def _ocr_tesseract(img: np.ndarray) -> tuple[str, float, list[float]]:
            data = pytesseract.image_to_data(
                img, output_type=pytesseract.Output.DICT)
            confs = [float(c) for c in data["conf"] if float(c) > 0]
            text = pytesseract.image_to_string(img).strip()
            return text, (sum(confs) / len(confs) / 100.0) if confs else 0.0, \
                confs
        engines["tesseract"] = _ocr_tesseract
    except Exception:
        pass
    try:  # pragma: no cover - not installed in this sandbox
        import easyocr
        reader = easyocr.Reader(["en"])

        def _ocr_easyocr(img: np.ndarray) -> tuple[str, float, list[float]]:
            results = reader.readtext(img)
            texts = [t for _b, t, _c in results]
            confs = [float(c) * 100.0 for _b, _t, c in results]
            conf = (sum(confs) / len(confs) / 100.0) if confs else 0.0
            return " ".join(texts), conf, confs
        engines["easyocr"] = _ocr_easyocr
    except Exception:
        pass
    engines["template"] = _ocr_template
    return engines


ENGINES = _init_engines()


def select_engine(img: np.ndarray) -> str:
    """Size heuristics from the reference (:403-423): small -> easyocr,
    large+complex -> paddleocr, default tesseract — each falling back to
    the always-available template engine."""
    h, w = img.shape[:2]
    if (h < 100 or w < 100) and "easyocr" in ENGINES:
        return "easyocr"
    if h > 1000 and w > 1000 and "paddleocr" in ENGINES:
        return "paddleocr"
    if "tesseract" in ENGINES:
        return "tesseract"
    return "template"


def ocr_image(img: np.ndarray, engine: str = "auto",
              preprocess: bool = True,
              techniques: tuple[str, ...] | None = None
              ) -> dict:
    """Full OCR of one decoded image (reference extract_text :357-401).

    Returns {'text', 'confidence', 'token_confs', 'engine',
    'preprocessed'} — confidence already on the 0-1 scale."""
    work = _preprocess_chain(img, techniques) if preprocess else to_gray(img)
    name = select_engine(work) if engine == "auto" else engine
    if name not in ENGINES:
        raise ValueError(
            f"Engine '{name}' not available. Available: {sorted(ENGINES)}")
    text, conf, token_confs = ENGINES[name](work)
    return {"text": text, "confidence": conf, "token_confs": token_confs,
            "engine": name, "preprocessed": preprocess}
