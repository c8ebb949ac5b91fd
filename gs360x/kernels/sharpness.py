"""Sharpness / image-statistics kernels for frame selection.

Device (jnp) replacements for the FrameSelector's OpenCV and ffmpeg scoring
backends (``/root/reference/cli_tools/gs360_FrameSelector.py:720-786`` and
``:789-899``):

* :func:`laplacian_variance` — variance of the 3×3 Laplacian
  (cv2 ksize=3 kernel ``[[2,0,2],[0,-8,0],[2,0,2]]``, REFLECT_101 border).
* :func:`tenengrad` — mean squared 3×3 Sobel magnitude.
* :func:`fft_energy` — mean high-frequency FFT magnitude outside a radius
  ``min(h,w)//8`` donut, on an ≤512-long-side downscale.
* :func:`sobel_yavg` — the ffmpeg backend's ``sobel,signalstats`` YAVG
  equivalent: mean of the clamped Sobel-magnitude image.
* :func:`hybrid_score` — the 0.6/0.3/0.1 weighted blend with motion and
  darkness penalties (same constants as the reference).

All metrics accept an optional validity mask (the circle mask for fisheye
pairs, highlight exclusion) and are shape-static so they batch with vmap.

Gray convention: float32 in [0, 255] (the reference scores 8-bit-scaled
luma; 16-bit inputs are rescaled by 255/65535).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# hybrid blend constants (gs360_FrameSelector.py:311-330)
HYBRID_LAPVAR_WEIGHT = 0.6
HYBRID_TENENGRAD_WEIGHT = 0.3
HYBRID_FFT_WEIGHT = 0.1
HYBRID_MOTION_REFERENCE = 5000.0
HYBRID_MOTION_PENALTY_WEIGHT = 0.4
HYBRID_DARK_THRESHOLD = 0.35
HYBRID_DARK_PENALTY_WEIGHT = 0.5


# --------------------------------------------------------------------------
# padding + convolution helpers
# --------------------------------------------------------------------------


def _reflect101_pad(img: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """cv2 BORDER_REFLECT_101 (edge pixel not duplicated)."""
    return jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")


def _conv3x3(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Same-size 3×3 convolution with REFLECT_101 border, expressed as
    shifted adds (XLA fuses this; no conv op needed for a 3×3)."""
    p = _reflect101_pad(img)
    h, w = img.shape
    out = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            k = float(kernel[dy, dx])
            if k == 0.0:
                continue
            out = out + k * jax.lax.dynamic_slice(p, (dy, dx), (h, w))
    return out


_LAPLACIAN_K3 = np.array([[2.0, 0.0, 2.0],
                          [0.0, -8.0, 0.0],
                          [2.0, 0.0, 2.0]])
_SOBEL_X = np.array([[-1.0, 0.0, 1.0],
                     [-2.0, 0.0, 2.0],
                     [-1.0, 0.0, 1.0]])
_SOBEL_Y = _SOBEL_X.T


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(x * m) / denom


# --------------------------------------------------------------------------
# metrics
# --------------------------------------------------------------------------


def laplacian_variance(gray: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Population variance of the ksize=3 Laplacian (cv2 semantics)."""
    lap = _conv3x3(gray, _LAPLACIAN_K3)
    mean = _masked_mean(lap, mask)
    return _masked_mean((lap - mean) ** 2, mask)


def tenengrad(gray: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean of gx² + gy² with 3×3 Sobel."""
    gx = _conv3x3(gray, _SOBEL_X)
    gy = _conv3x3(gray, _SOBEL_Y)
    return _masked_mean(gx * gx + gy * gy, mask)


def sobel_magnitude(gray: jnp.ndarray) -> jnp.ndarray:
    gx = _conv3x3(gray, _SOBEL_X)
    gy = _conv3x3(gray, _SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy)


def sobel_yavg(gray: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ffmpeg-backend equivalent: mean luma of the |Sobel| image clamped to
    [0, 255] (ffmpeg's ``sobel`` filter saturates to 8-bit before
    ``signalstats`` averages it)."""
    mag = jnp.clip(sobel_magnitude(gray), 0.0, 255.0)
    return _masked_mean(mag, mask)


def fft_energy(gray: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean high-frequency FFT magnitude (donut r = min(h,w)//8).

    The caller is responsible for the ≤512 downscale (shape-static); see
    :func:`downscale_max_long`.
    """
    f = jnp.fft.fftshift(jnp.fft.fft2(gray))
    h, w = gray.shape
    cy, cx = h // 2, w // 2
    r = max(1, min(h, w) // 8)
    yy = jnp.arange(h)[:, None] - cy
    xx = jnp.arange(w)[None, :] - cx
    donut = (yy * yy + xx * xx) >= r * r
    hf = jnp.abs(f) * donut.astype(gray.dtype)
    return _masked_mean(hf, mask)


def brightness_mean(gray: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean luma normalized to [0, 1]."""
    return _masked_mean(gray, mask) / 255.0


def highlight_ratio(gray: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    threshold: float = 0.95 * 255.0) -> jnp.ndarray:
    return _masked_mean((gray >= threshold).astype(gray.dtype), mask)


# --------------------------------------------------------------------------
# geometry helpers (host-side shape work, device-side math)
# --------------------------------------------------------------------------


def circle_mask(h: int, w: int) -> jnp.ndarray:
    """Inscribed-circle validity mask (the fisheye pair mode's mask)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    r = min(h, w) / 2.0
    yy = jnp.arange(h)[:, None] - cy
    xx = jnp.arange(w)[None, :] - cx
    return (yy * yy + xx * xx) <= r * r


def crop_by_ratio(shape: Tuple[int, int], ratio: float) -> Tuple[slice, slice]:
    """Vertical+horizontal center-crop slices (reference crops both axes by
    the same ratio before scoring)."""
    h, w = shape
    ch = max(1, int(round(h * ratio)))
    cw = max(1, int(round(w * ratio)))
    y0 = (h - ch) // 2
    x0 = (w - cw) // 2
    return slice(y0, y0 + ch), slice(x0, x0 + cw)


def downscale_max_long(img: np.ndarray, max_long: int) -> np.ndarray:
    """Host-side area downscale so the long side is <= max_long (matches the
    reference's pre-score resize contract; numpy box filter)."""
    if max_long <= 0 or max(img.shape[:2]) <= max_long:
        return img
    h, w = img.shape[:2]
    scale = max_long / float(max(h, w))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ys = (np.arange(nh + 1) * h / nh).astype(int)
    xs = (np.arange(nw + 1) * w / nw).astype(int)
    out = np.add.reduceat(np.add.reduceat(img.astype(np.float64), ys[:-1], 0),
                          xs[:-1], 1)
    counts = np.outer(np.diff(ys), np.diff(xs))
    return (out / counts).astype(img.dtype if img.dtype.kind == "f" else np.float32)


# --------------------------------------------------------------------------
# fused scoring
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metric", "use_mask"))
def score_frame(gray: jnp.ndarray, mask: jnp.ndarray, *, metric: str,
                use_mask: bool):
    """Score one pre-cropped gray frame; returns the raw feature tuple
    (lap_energy, tenengrad, fft, brightness, highlight_ratio).

    The hybrid blend/normalization happens dataset-globally on the host
    (two-pass min-max like the reference, gs360_FrameSelector.py:2363-2392).
    """
    m = mask if use_mask else None
    bright = brightness_mean(gray, m)
    p255 = highlight_ratio(gray, m)
    lap = jnp.float32(0.0)
    ten = jnp.float32(0.0)
    fft = jnp.float32(0.0)
    if metric in ("hybrid", "lapvar"):
        lv = laplacian_variance(gray, m)
        lap = lv * lv  # the reference feeds lap_score^2 into the blend
    if metric in ("hybrid", "tenengrad"):
        ten = tenengrad(gray, m)
    if metric in ("hybrid", "fft"):
        fft = fft_energy(gray, m)
    if metric == "sobel-yavg":
        ten = sobel_yavg(gray, m)
    return lap, ten, fft, bright, p255


def hybrid_combine(lap_norm, ten_norm, fft_norm, motion_factor):
    """Normalized-feature blend (reference constants)."""
    return (HYBRID_LAPVAR_WEIGHT * lap_norm
            + HYBRID_TENENGRAD_WEIGHT * ten_norm
            + HYBRID_FFT_WEIGHT * fft_norm) * motion_factor


def motion_factor_from_tenengrad(ten_score: float) -> float:
    """Blur-from-motion penalty derived from tenengrad (host scalar)."""
    ratio = ten_score / (ten_score + HYBRID_MOTION_REFERENCE)
    ratio = max(0.0, min(1.0, ratio))
    return max(0.0, 1.0 - HYBRID_MOTION_PENALTY_WEIGHT * (1.0 - ratio))


def brightness_weight(bright_mean: float) -> float:
    """Darkness penalty weight (host scalar)."""
    if bright_mean < HYBRID_DARK_THRESHOLD:
        dark_ratio = bright_mean / HYBRID_DARK_THRESHOLD
    else:
        dark_ratio = 1.0
    dark_ratio = max(0.0, min(1.0, dark_ratio))
    return max(0.0, 1.0 - HYBRID_DARK_PENALTY_WEIGHT * (1.0 - dark_ratio))
