"""Scan-image preprocessing for the OCR path — numpy implementations
of the reference's OpenCV preprocessing stages
(lib/image_processor/preprocessor/opencv.js:53-318: grayscale → blur →
threshold → contour/deskew; gm.js / imagemagick.js expose the same
lighten/threshold knobs).  The container has no OpenCV, so the stages
are implemented from their public definitions and validated against
synthetic ground truth + the in-repo OCR engine end-to-end.

API shape: every stage is (h, w) uint8 → (h, w) uint8, composable;
``preprocess_scan`` is the reference-ordered chain.  Plug into the
pipeline as ``ocr_arrays=lambda px: ocr_pixels(preprocess_scan(px))``
— the same config-only swap point as the OCR engine itself.
"""

from __future__ import annotations

import numpy as np


def gaussian_blur(px: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Separable Gaussian blur (reflect padding), the cv2.GaussianBlur
    analog.  Kernel radius 3*sigma (the OpenCV default support)."""
    if sigma <= 0:
        return px
    r = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    f = px.astype(np.float64)
    # rows then columns, reflect-padded so edges don't darken
    f = np.pad(f, ((0, 0), (r, r)), mode="reflect")
    f = np.apply_along_axis(np.convolve, 1, f, k, mode="valid")
    f = np.pad(f, ((r, r), (0, 0)), mode="reflect")
    f = np.apply_along_axis(np.convolve, 0, f, k, mode="valid")
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def otsu_threshold(px: np.ndarray) -> int:
    """Otsu's global threshold (maximizes between-class variance).
    Returns the threshold VALUE; callers binarize with px > t."""
    hist = np.bincount(px.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega))
    sigma_b[~np.isfinite(sigma_b)] = -1.0
    return int(np.argmax(sigma_b))


def _box_mean(px: np.ndarray, block: int) -> np.ndarray:
    """Local mean over a (block x block) window via an integral image
    (edge windows shrink) — O(1) per pixel at any block size."""
    h, w = px.shape
    r = block // 2
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(px.astype(np.float64), axis=0), axis=1)
    y = np.arange(h)
    x = np.arange(w)
    y0 = np.clip(y - r, 0, h)[:, None]
    y1 = np.clip(y + r + 1, 0, h)[:, None]
    x0 = np.clip(x - r, 0, w)[None, :]
    x1 = np.clip(x + r + 1, 0, w)[None, :]
    area = (y1 - y0) * (x1 - x0)
    s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    return s / area


def adaptive_threshold(
    px: np.ndarray, block: int = 21, c: float = 10.0
) -> np.ndarray:
    """cv2.adaptiveThreshold(ADAPTIVE_THRESH_MEAN_C, THRESH_BINARY)
    analog: pixel is WHITE (255) when above its local mean minus
    ``c`` — flattens uneven illumination a global threshold can't."""
    mean = _box_mean(px, block)
    return np.where(
        px.astype(np.float64) > mean - c, np.uint8(255), np.uint8(0)
    )


def estimate_skew(px: np.ndarray, max_deg: float = 5.0,
                  step_deg: float = 0.25) -> float:
    """Projection-profile skew estimate (degrees, counter-clockwise
    positive): shear ink columns by y*tan(θ) per candidate θ and pick
    the one maximizing row-profile variance — text lines align into
    sharp peaks exactly when the skew is undone.  The classic
    pdfsandwich/leptonica method."""
    ink = (px < 128).astype(np.float64)
    h, w = ink.shape
    if h < 4 or w < 4 or ink.sum() == 0:
        return 0.0
    xs = np.arange(w)
    best_theta = 0.0
    best_score = -1.0
    for theta in np.arange(-max_deg, max_deg + 1e-9, step_deg):
        # vertical shear: column x moves DOWN by x*tan(θ); the row
        # profile of the sheared image sharpens into line peaks
        # exactly when θ undoes the skew.  (A horizontal shear would
        # leave row sums invariant — useless.)
        shifts = np.rint(np.tan(np.radians(theta)) * xs).astype(int)
        smin = int(shifts.min())
        smax = int(shifts.max())
        prof = np.zeros(h + (smax - smin), dtype=np.float64)
        for s in np.unique(shifts):
            colsum = ink[:, shifts == s].sum(axis=1)
            prof[s - smin : s - smin + h] += colsum
        score = np.var(prof)
        if score > best_score:
            best_score = score
            best_theta = float(theta)
    return best_theta


def rotate_nn(px: np.ndarray, deg: float, fill: int = 255) -> np.ndarray:
    """Nearest-neighbor rotation about the center (same canvas),
    background-filled — the deskew back-rotation."""
    if abs(deg) < 1e-9:
        return px.copy()
    h, w = px.shape
    theta = np.radians(deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w]
    # inverse map: output pixel ← input coordinate
    ys = yy - cy
    xs = xx - cx
    src_y = np.rint(cy + np.cos(theta) * ys + np.sin(theta) * xs).astype(int)
    src_x = np.rint(cx - np.sin(theta) * ys + np.cos(theta) * xs).astype(int)
    ok = (src_y >= 0) & (src_y < h) & (src_x >= 0) & (src_x < w)
    out = np.full((h, w), np.uint8(fill))
    out[ok] = px[src_y[ok], src_x[ok]]
    return out


def deskew(px: np.ndarray, max_deg: float = 5.0) -> np.ndarray:
    """Estimate the skew and rotate it out (projection-profile +
    nearest-neighbor back-rotation)."""
    return rotate_nn(px, -estimate_skew(px, max_deg))


def despeckle(binary: np.ndarray, min_neighbors: int = 2) -> np.ndarray:
    """Remove isolated ink (salt-and-pepper survivors of the
    threshold): ink pixels keep only with >= ``min_neighbors`` 4-Neumann
    ink neighbors — the binary-domain denoiser.  (Blurring BEFORE the
    threshold instead thickens off-grid strokes of rotated text and
    measurably breaks glyph recognition — despeckle after is the
    shape-preserving order.)"""
    ink = binary == 0
    n = np.zeros(binary.shape, dtype=np.int8)
    n[1:, :] += ink[:-1, :]
    n[:-1, :] += ink[1:, :]
    n[:, 1:] += ink[:, :-1]
    n[:, :-1] += ink[:, 1:]
    keep = ink & (n >= min_neighbors)
    return np.where(keep, np.uint8(0), np.uint8(255))


def preprocess_scan(
    px: np.ndarray,
    blur_sigma: float = 0.0,
    block: int = 21,
    c: float = 10.0,
    max_skew_deg: float = 5.0,
) -> np.ndarray:
    """The reference-ordered chain (opencv.js:53-318): [blur] →
    adaptive threshold → despeckle → deskew.  Polarity-normalizes
    first (scans can arrive inverted) so downstream stages see
    dark-ink-on-white.  ``blur_sigma`` stays off by default: sensor
    noise is handled by the binary-domain despeckle, which preserves
    rotated stroke widths where a pre-threshold blur dilates them
    (measured to break glyph recognition — see despeckle).  Returns a
    clean 0/255 image for the OCR engine."""
    if px.ndim != 2:
        raise ValueError("preprocess_scan wants an (h, w) luma array")
    if px.size and np.mean(px) < 128:
        px = 255 - px  # inverted scan → dark-on-light
    if blur_sigma > 0:
        px = gaussian_blur(px, blur_sigma)
    binary = despeckle(adaptive_threshold(px, block=block, c=c))
    return deskew(binary, max_deg=max_skew_deg)
