"""Morphology + inpainting kernels (device max/min pools and diffusion).

Replaces the mask tool's OpenCV post-processing
(``/root/reference/cli_tools/gs360_SegmentationMaskTool.py:384-558, 784-817``):
close/open via max/min pools, radius dilation for mask expansion, separable
Gaussian blur for the shadow heuristic, and a masked-diffusion inpaint that
stands in for Telea. Connected-component labeling stays host-side (a
sequential two-pass union-find over label equivalences — control logic, not
pixel math).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pool(img: jnp.ndarray, k: int, mode: str) -> jnp.ndarray:
    """k×k max/min pool with edge padding (square structuring element)."""
    pad = k // 2
    init = -jnp.inf if mode == "max" else jnp.inf
    p = jnp.pad(img, pad, mode="edge")
    h, w = img.shape
    out = jnp.full(img.shape, init, img.dtype) if img.dtype.kind == "f" \
        else None
    acc = None
    for dy in range(k):
        for dx in range(k):
            s = jax.lax.dynamic_slice(p, (dy, dx), (h, w))
            if acc is None:
                acc = s
            else:
                acc = jnp.maximum(acc, s) if mode == "max" \
                    else jnp.minimum(acc, s)
    return acc


@functools.partial(jax.jit, static_argnames=("k",))
def dilate(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    return _pool(mask.astype(jnp.float32), k, "max")


@functools.partial(jax.jit, static_argnames=("k",))
def erode(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    return _pool(mask.astype(jnp.float32), k, "min")


@functools.partial(jax.jit, static_argnames=("k",))
def close_mask(mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Morphological close (dilate then erode), cv2.MORPH_CLOSE semantics."""
    return _pool(_pool(mask.astype(jnp.float32), k, "max"), k, "min")


def dilate_radius(mask: np.ndarray, radius: int) -> np.ndarray:
    """Dilate a binary mask by ~radius pixels (square element, matching the
    reference's ellipse within a couple px)."""
    if radius <= 0:
        return mask
    out = dilate(jnp.asarray(mask > 0, jnp.float32), 2 * radius + 1)
    return (np.asarray(out) > 0).astype(np.uint8) * 255


@functools.partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Separable Gaussian blur with edge padding."""
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    kernel = kernel / jnp.sum(kernel)
    h, w = img.shape
    p = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    img = sum(kernel[i] * jax.lax.dynamic_slice(p, (i, 0), (h, w))
              for i in range(2 * radius + 1))
    p = jnp.pad(img, ((0, 0), (radius, radius)), mode="edge")
    return sum(kernel[i] * jax.lax.dynamic_slice(p, (0, i), (h, w))
               for i in range(2 * radius + 1))


@functools.partial(jax.jit, static_argnames=("iters",))
def diffusion_inpaint(img: jnp.ndarray, mask: jnp.ndarray,
                      iters: int = 256) -> jnp.ndarray:
    """Fill masked pixels by Jacobi diffusion from the boundary.

    The stand-in for cv2's Telea inpaint: iteratively replaces masked
    pixels with their 4-neighborhood mean while clamping unmasked pixels to
    the source. ``img``: (H, W, C) float; ``mask``: (H, W) bool (True =
    fill).
    """
    m = mask.astype(img.dtype)[..., None]
    # initialize holes with the image mean so diffusion converges faster
    fill0 = jnp.sum(img * (1 - m), axis=(0, 1)) / jnp.maximum(
        jnp.sum(1 - m), 1.0)
    state = img * (1 - m) + fill0 * m

    def body(_, x):
        up = jnp.roll(x, 1, 0)
        down = jnp.roll(x, -1, 0)
        left = jnp.roll(x, 1, 1)
        right = jnp.roll(x, -1, 1)
        avg = (up + down + left + right) * 0.25
        return img * (1 - m) + avg * m

    return jax.lax.fori_loop(0, iters, body, state)


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected labeling. Returns (labels, count); labels 1..count,
    0 = background. Uses scipy when available, else a two-pass
    union-find."""
    mask = np.asarray(mask) > 0
    try:
        from scipy import ndimage

        labels, count = ndimage.label(mask)
        return labels.astype(np.int32), int(count)
    except ImportError:
        pass
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    parent = [0]

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    next_label = 1
    for y in range(h):
        row = mask[y]
        up = labels[y - 1] if y else None
        for x in range(w):
            if not row[x]:
                continue
            left = labels[y, x - 1] if x else 0
            top = up[x] if up is not None else 0
            if left and top:
                ra, rb = find(left), find(top)
                labels[y, x] = ra
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            elif left or top:
                labels[y, x] = left or top
            else:
                parent.append(next_label)
                labels[y, x] = next_label
                next_label += 1
    # second pass: resolve + compact
    remap = {}
    out = np.zeros_like(labels)
    count = 0
    ys, xs = np.nonzero(labels)
    for y, x in zip(ys, xs):
        root = find(labels[y, x])
        if root not in remap:
            count += 1
            remap[root] = count
        out[y, x] = remap[root]
    return out, count
