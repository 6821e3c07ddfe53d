"""Image preprocessing for OCR, in pure vectorized numpy.

Reference analog: ``ImagePreprocessor`` (/root/reference/text_extractor.py:
152-309). The reference delegates every step to OpenCV; this module
re-implements the same technique registry from scratch so the chain runs in
a container without imaging libraries. Contract kept per technique:

- ``denoise``        :194-196  — noise removal (median 3x3 stands in for
                                 fastNlMeansDenoising; same role, cheaper)
- ``deskew``         :198-233  — dominant text-angle estimate + rotation
                                 with replicated borders (projection-profile
                                 sharpness search stands in for Hough lines)
- ``enhance_contrast``:235-249 — CLAHE, clipLimit 2.0, 8x8 tiles
- ``binarize``       :251-268  — Gaussian blur 5x5 then adaptive Gaussian
                                 threshold, block 11, C=2
- ``remove_shadows`` :270-284  — morphological open (~20 px) + divide
- ``sharpen``        :286-291  — 3x3 kernel [[-1,-1,-1],[-1,9,-1],[-1,-1,-1]]
- ``resize``         :293-309  — height band [800, 2000], bilinear

``preprocess`` applies the same default chain as the reference
(:168-170: denoise, deskew, enhance_contrast, binarize) and, like the
reference (:176-181), treats a failing technique as a warning, not an
error.

Everything is uint8-in / uint8-out, grayscale ``(h, w)`` (color inputs are
collapsed with BT.601 luma first — the reference converts per-technique).
No per-pixel Python loops: the per-image cost is a handful of fused numpy
passes, which is what bounds kernel throughput at corpus scale.
"""

from __future__ import annotations

import numpy as np

__all__ = ["preprocess", "TECHNIQUES", "to_gray", "denoise", "deskew",
           "enhance_contrast", "binarize", "remove_shadows", "sharpen",
           "resize_for_ocr", "estimate_skew", "rotate"]


def to_gray(img: np.ndarray) -> np.ndarray:
    """BT.601 luma, matching cv2.cvtColor(..., COLOR_BGR2GRAY) weights."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.float32)
    g = img[..., 1].astype(np.float32)
    b = img[..., 2].astype(np.float32)
    return np.clip(0.299 * r + 0.587 * g + 0.114 * b, 0, 255).astype(np.uint8)


def _window_view(img: np.ndarray, k: int) -> np.ndarray:
    """(h, w, k, k) sliding windows over a replicate-padded image."""
    pad = k // 2
    padded = np.pad(img, pad, mode="edge")
    return np.lib.stride_tricks.sliding_window_view(padded, (k, k))


def denoise(img: np.ndarray, k: int = 3) -> np.ndarray:
    """Median filter (salt-and-pepper suppressor; stands in for NLM)."""
    img = to_gray(img)
    return np.median(_window_view(img, k), axis=(2, 3)).astype(np.uint8)


def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel with sigma=0 convention:
    sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) / 2
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return k / k.sum()


def _sep_filter(img: np.ndarray, k1d: np.ndarray) -> np.ndarray:
    """Separable 2-D filter with replicated borders, float32 out."""
    pad = len(k1d) // 2
    out = img.astype(np.float32)
    padded = np.pad(out, ((0, 0), (pad, pad)), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(padded, len(k1d), axis=1)
    out = win @ k1d.astype(np.float32)
    padded = np.pad(out, ((pad, pad), (0, 0)), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(padded, len(k1d), axis=0)
    return np.einsum("ijk,k->ij", win, k1d.astype(np.float32))


def gaussian_blur(img: np.ndarray, ksize: int = 5) -> np.ndarray:
    img = to_gray(img)
    return np.clip(_sep_filter(img, _gaussian_kernel1d(ksize)) + 0.5,
                   0, 255).astype(np.uint8)


def binarize(img: np.ndarray, block: int = 11, c: float = 2.0) -> np.ndarray:
    """Gaussian blur 5x5 → adaptive Gaussian threshold (block 11, C=2).

    cv2.adaptiveThreshold THRESH_BINARY semantics: out = 255 where
    src > local_gaussian_mean - C else 0.
    """
    gray = gaussian_blur(img, 5)
    local_mean = _sep_filter(gray, _gaussian_kernel1d(block))
    return np.where(gray.astype(np.float32) > local_mean - c, 255, 0) \
        .astype(np.uint8)


def enhance_contrast(img: np.ndarray, clip_limit: float = 2.0,
                     tiles: int = 8) -> np.ndarray:
    """CLAHE: per-tile clipped histogram equalization with bilinear
    blending of the four neighbouring tile LUTs per pixel."""
    gray = to_gray(img)
    h, w = gray.shape
    ty = max(1, min(tiles, h))
    tx = max(1, min(tiles, w))
    y_edges = np.linspace(0, h, ty + 1).astype(int)
    x_edges = np.linspace(0, w, tx + 1).astype(int)
    luts = np.empty((ty, tx, 256), dtype=np.uint8)
    for i in range(ty):
        for j in range(tx):
            tile = gray[y_edges[i]:y_edges[i + 1], x_edges[j]:x_edges[j + 1]]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.float64)
            npix = max(tile.size, 1)
            limit = max(clip_limit * npix / 256.0, 1.0)
            excess = np.clip(hist - limit, 0, None).sum()
            hist = np.minimum(hist, limit) + excess / 256.0
            cdf = hist.cumsum()
            luts[i, j] = np.clip(cdf * (255.0 / max(cdf[-1], 1.0)) + 0.5,
                                 0, 255).astype(np.uint8)
    # tile centers; pixel position in tile-center coordinates
    cy = (y_edges[:-1] + y_edges[1:]) / 2.0
    cx = (x_edges[:-1] + x_edges[1:]) / 2.0
    fy = np.interp(np.arange(h), cy, np.arange(ty)) if ty > 1 \
        else np.zeros(h)
    fx = np.interp(np.arange(w), cx, np.arange(tx)) if tx > 1 \
        else np.zeros(w)
    y0 = np.floor(fy).astype(int)
    x0 = np.floor(fx).astype(int)
    y1 = np.minimum(y0 + 1, ty - 1)
    x1 = np.minimum(x0 + 1, tx - 1)
    wy = (fy - y0)[:, None].astype(np.float32)
    wx = (fx - x0)[None, :].astype(np.float32)
    g = gray  # (h, w) gray levels index the LUT's last axis
    v00 = luts[y0[:, None], x0[None, :], g].astype(np.float32)
    v01 = luts[y0[:, None], x1[None, :], g].astype(np.float32)
    v10 = luts[y1[:, None], x0[None, :], g].astype(np.float32)
    v11 = luts[y1[:, None], x1[None, :], g].astype(np.float32)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def remove_shadows(img: np.ndarray, k: int = 21) -> np.ndarray:
    """Grayscale morphological open (erode→dilate, k≈20 as in the
    reference's ellipse) then divide-normalize, scale 255."""
    gray = to_gray(img)
    eroded = _window_view(gray, k).min(axis=(2, 3))
    opened = _window_view(eroded, k).max(axis=(2, 3)).astype(np.float32)
    out = gray.astype(np.float32) / np.maximum(opened, 1.0) * 255.0
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def sharpen(img: np.ndarray) -> np.ndarray:
    """3x3 sharpen kernel [[-1,-1,-1],[-1,9,-1],[-1,-1,-1]], replicate
    borders (cv2.filter2D defaults)."""
    gray = to_gray(img).astype(np.float32)
    p = np.pad(gray, 1, mode="edge")
    out = (9.0 * p[1:-1, 1:-1]
           - p[:-2, :-2] - p[:-2, 1:-1] - p[:-2, 2:]
           - p[1:-1, :-2] - p[1:-1, 2:]
           - p[2:, :-2] - p[2:, 1:-1] - p[2:, 2:])
    return np.clip(out, 0, 255).astype(np.uint8)


def _bilinear_resize(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    h, w = img.shape
    ys = (np.arange(new_h) + 0.5) * h / new_h - 0.5
    xs = (np.arange(new_w) + 0.5) * w / new_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None].astype(np.float32)
    wx = np.clip(xs - x0, 0, 1)[None, :].astype(np.float32)
    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def resize_for_ocr(img: np.ndarray, min_h: int = 800,
                   max_h: int = 2000) -> np.ndarray:
    """Resize into the reference's [800, 2000] height band (:293-309)."""
    gray = to_gray(img)
    h, w = gray.shape
    if h < min_h:
        scale = min_h / h
    elif h > max_h:
        scale = max_h / h
    else:
        return gray
    return _bilinear_resize(gray, int(h * scale), int(w * scale))


# ---------------------------------------------------------------------------
# deskew — projection-profile sharpness search
# ---------------------------------------------------------------------------

def rotate(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate about the center, replicate borders, bilinear sampling
    (cv2.warpAffine(..., BORDER_REPLICATE) analog)."""
    gray = to_gray(img)
    h, w = gray.shape
    theta = np.deg2rad(angle_deg)
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # inverse map: destination -> source
    xs = cos_t * (xx - cx) + sin_t * (yy - cy) + cx
    ys = -sin_t * (xx - cx) + cos_t * (yy - cy) + cy
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx = np.clip(xs - x0, 0, 1).astype(np.float32)
    wy = np.clip(ys - y0, 0, 1).astype(np.float32)
    f = gray.astype(np.float32)
    top = f[y0, x0] * (1 - wx) + f[y0, x1] * wx
    bot = f[y1, x0] * (1 - wx) + f[y1, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def _profile_score(ink: np.ndarray, angle_deg: float) -> float:
    """Sharpness of the horizontal projection profile after shearing rows
    by `angle` — a text page scores highest when lines are horizontal."""
    h, w = ink.shape
    shift = np.tan(np.deg2rad(angle_deg)) * (np.arange(w) - w / 2.0)
    shift -= shift.min()  # keep all bins in range — clipping would pile
    # sheared mass into the edge bins and fake a sharp profile there
    rows = np.arange(h)[:, None] + shift[None, :]
    n_bins = h + int(np.ceil(shift.max())) + 2
    prof = np.zeros(n_bins)
    np.add.at(prof, np.round(rows).astype(int).ravel(), ink.ravel())
    d = np.diff(prof)
    return float((d * d).sum())


def estimate_skew(img: np.ndarray, max_angle: float = 5.0) -> float:
    """Corrective angle in degrees: rotate(img, estimate_skew(img))\n    straightens the page (sign convention fixed by the deskew test)."""
    gray = to_gray(img)
    h, w = gray.shape
    step = max(1, max(h, w) // 400)  # score on a ~400px downsample
    small = gray[::step, ::step]
    ink = (small < 128).astype(np.float64)
    if ink.sum() < 8:
        return 0.0
    coarse = np.arange(-max_angle, max_angle + 0.5, 1.0)
    best = max(coarse, key=lambda a: _profile_score(ink, a))
    fine = np.arange(best - 0.9, best + 0.95, 0.15)
    best = max(fine, key=lambda a: _profile_score(ink, a))
    finest = np.arange(best - 0.12, best + 0.13, 0.04)
    best = max(finest, key=lambda a: _profile_score(ink, a))
    return float(best)


def deskew(img: np.ndarray) -> np.ndarray:
    angle = estimate_skew(img)
    if abs(angle) < 0.05:
        return to_gray(img)
    return rotate(img, angle)


TECHNIQUES = {
    "denoise": denoise,
    "deskew": deskew,
    "enhance_contrast": enhance_contrast,
    "binarize": binarize,
    "remove_shadows": remove_shadows,
    "sharpen": sharpen,
    "resize": resize_for_ocr,
}

DEFAULT_CHAIN = ("denoise", "deskew", "enhance_contrast", "binarize")


def preprocess(img: np.ndarray,
               techniques: tuple[str, ...] | list[str] | None = None
               ) -> np.ndarray:
    """Apply the technique chain; a failing step is skipped (reference
    warning-not-error semantics, text_extractor.py:176-181)."""
    if techniques is None:
        techniques = DEFAULT_CHAIN
    out = to_gray(img)
    for name in techniques:
        fn = TECHNIQUES.get(name)
        if fn is None:
            continue
        try:
            out = fn(out)
        except Exception:
            continue
    return out
