"""Pallas TPU warp kernels — the fast path for equirect → view cuts.

Why this exists: XLA's general gather on TPU runs at ~44M indices/s,
capping the XLA warp backend at single-digit 8K→1080p views/sec, and
XLA's HWC→planar transpose of an 8K frame is similarly unusable.

Architecture (round 3):

0. **Planar source pass** (:func:`_planar_source`): one Mosaic sweep
   turns the interleaved (H, W·3) uint8/uint16/f32 frame into a
   seam-padded planar (3, H, W'') array (f32, or u8 kept raw for
   pure-yaw sets — the /255 rides the precomputed h-pass weights).
   Windows the warp kernels read overlap ~4× at production slopes, so
   de-interleaving per window (as round 1 did) paid the ~8-op
   lane-shuffle cost four times over; integer normalization fuses into
   the same pass.

1. **Yaw-ring kernels** (:func:`_warp_kernel_yaw`,
   :func:`_warp_kernel_yaw2`) — pitch=roll=0 views, the default
   preset's camera ring. ``u`` is row-independent (``atan2`` is
   scale-invariant in the ray normalisation), so the horizontal
   resample is ONE lane-varying linear map per tile-column: built as a
   4-tap one-hot matrix and run on the **MXU** (``IH = win @ Wx``).
   v2 PRECOMPUTES the one-hot matrices on host (f64 twin of the
   geometry) and streams them through a pipelined input fetched once
   per tile-column; window origins arrive via scalar-prefetch tables;
   the bf16 MXU pass is the default (~0.25 u8 LSB vs the f32 twin,
   the same order as v360's own fixed-point taps) with
   ``GS360X_WARP_PRECISION=float32`` switching to 6-pass f32 emulation.
   The vertical stage runs an exact-trip ``fori_loop`` over the ~2-3
   window chunks each 8-row band touches, gathering all 8 rows per
   sublane shuffle.

2. **General narrow kernel** (:func:`_warp_kernel`) — tilted/rolled
   views whose per-tile span fits a 384-col window: per-group hoisted
   tap indices + block-folded weights over (8,128) lane gathers.

3. **Wide kernels** — poles in view, extreme slopes, tilted
   full360coverage views, and fisheye output projections
   (equidistant/equisolid ray models with in-kernel ``sin``/``cos``
   minimax polys + image-circle masking).
   v1 (:func:`_warp_kernel_wide`): full-width short windows.
   v2 (:func:`_warp_kernel_wide2`): per-(tile, block) windows fetched
   ``WIDE2_BPR`` blocks per round from host-planned scalar-prefetch
   tables, round 0 double-buffered across tiles.
   v3 (:func:`_warp_kernel_wide3`): v2's windows plus host-planned
   DE-SHEARED residual tables — per (block, 8-row output group) the
   plan records 8-aligned chunk offsets that compact each group's
   vertical taps into a short residual window, so the resample is pure
   full-(8,128)-vreg SIMD (lane gather + sublane gather per tap) with
   a ``fori_loop`` tap sweep over the group's true local shear.

A cached EXACT host planner (stride-1 numpy twin of the ray math)
assigns each view a kernel class and window row budget; mixed view sets
dispatch per class and re-order after. Views beyond every budget raise
:class:`PallasFallback` and the caller transparently uses the XLA
backend.

Exactness: identical sampling math to :mod:`gs360x.kernels.warp` (v360
conventions, Lagrange bicubic): every tap reads ``src[y0+m, x0+k]`` at
the pixel's own fractional coordinates — no separable approximation;
agreement with the XLA backend is ~1e-5 (1e-4 near poles, where the
~1e-7-rad trig polynomial error is magnified). Headline: ~1,017
8K→1080p bicubic views/s on one v5e chip (XLA lowering: ~2).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STOP_AFTER = "full"     # dev triage knob: geom_dma|hpass|full

import os as _os

_MATMUL_PRECISION = (
    jax.lax.Precision.HIGHEST
    if _os.environ.get("GS360X_WARP_PRECISION", "").lower()
    in ("float32", "f32", "highest")
    else jax.lax.Precision.DEFAULT)
TILE_ROWS = 16          # output rows per tile (multiple of 8)
TILE_COLS = 128         # output cols per tile (one lane vreg)
WIN_COLS = 384          # window cols: three 128-lane blocks, origin 128-aligned
N_BLOCKS = WIN_COLS // TILE_COLS
ROW_CLASSES = (16, 48, 96)  # window-row budgets R (8 | R); worst view wins
H_MARGIN = 3            # bicubic taps need x0-1 .. x0+2 (+1 slack)
V_MARGIN = 3


# --------------------------------------------------------------------------
# Host-side planner: numpy twin of the coordinate math (budget validation)
# --------------------------------------------------------------------------


def _rot_matrix(yaw_deg: float, pitch_deg: float, roll_deg: float) -> np.ndarray:
    cy, sy = math.cos(math.radians(yaw_deg)), math.sin(math.radians(yaw_deg))
    cp, sp = math.cos(math.radians(pitch_deg)), math.sin(math.radians(pitch_deg))
    cr, sr = math.cos(math.radians(roll_deg)), math.sin(math.radians(roll_deg))
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return ry @ rx @ rz


def _np_view_coords(width, height, hfov_deg, vfov_deg, rot, src_w, src_h):
    xs = (2.0 * np.arange(width) + 1.0) / width - 1.0
    ys = (2.0 * np.arange(height) + 1.0) / height - 1.0
    nx, ny = np.meshgrid(xs * math.tan(math.radians(hfov_deg) / 2.0),
                         ys * math.tan(math.radians(vfov_deg) / 2.0))
    d = np.stack([nx, ny, np.ones_like(nx)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    world = d @ rot.T
    phi = np.arctan2(world[..., 0], world[..., 2])
    theta = np.arcsin(np.clip(world[..., 1], -1.0, 1.0))
    u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
    v = (theta / (math.pi / 2.0) + 1.0) * (src_h / 2.0) - 0.5
    return u, v


@dataclass
class ViewBudget:
    win_rows: int
    rot: np.ndarray
    win_cols: int = 384


@functools.lru_cache(maxsize=4096)
def plan_view(width: int, height: int, hfov_deg: float, vfov_deg: float,
              yaw_deg: float, pitch_deg: float, roll_deg: float,
              src_w: int, src_h: int, true_w: Optional[int] = None,
              true_h: Optional[int] = None, tile_rows: int = TILE_ROWS,
              row_classes: tuple = ROW_CLASSES,
              win_cols: int = WIN_COLS) -> Optional[ViewBudget]:
    """Validate a view against the kernel's static window budget.

    Cached: view geometry is static across frames. Sampling is EXACT
    (stride 1): strided estimates under-measure the u/v swing of
    pole-adjacent tiles — a stride-4 scan once admitted a pitch-88 view
    whose corner tile truly spanned ~500 source columns, and the kernel's
    384-col window silently clipped its taps. ~40ms per 1080p view,
    amortized by the lru cache (geometry is static across frames).
    """
    if width % TILE_COLS or height % tile_rows:
        return None
    rot = _rot_matrix(yaw_deg, pitch_deg, roll_deg)
    u, v = _np_view_coords_strided(width, height, hfov_deg, vfov_deg, rot,
                                   src_w, src_h, stride=1, true_w=true_w,
                                   true_h=true_h)
    n_ty, n_tx = height // tile_rows, width // TILE_COLS
    uc = u.reshape(n_ty, tile_rows, n_tx, TILE_COLS)
    vc = v.reshape(n_ty, tile_rows, n_tx, TILE_COLS)
    margin = 0.0  # exact sampling — no stride slack needed
    # tile-center-relative unwrap, mirroring the kernel's seam handling
    # (the kernel anchors at u[tile_rows//2, TILE_COLS//2])
    u_center = uc[:, tile_rows // 2, :, TILE_COLS // 2][:, None, :, None]
    urel = np.mod(uc - u_center + src_w / 2.0, src_w) - src_w / 2.0
    h_span = (urel.max(axis=(1, 3)) - urel.min(axis=(1, 3))
              + 2 * H_MARGIN + 2 * margin)
    v_span = (vc.max(axis=(1, 3)) - vc.min(axis=(1, 3))
              + 2 * V_MARGIN + 2 * margin)
    if (h_span > win_cols - 131).any():  # 127 col-alignment + 4 slack
        return None
    for r in row_classes:
        if float(v_span.max()) <= r - 9:  # 7 rows row-alignment slack
            return ViewBudget(win_rows=r, rot=rot.astype(np.float32),
                              win_cols=win_cols)
    return None


def _np_view_coords_strided(width, height, hfov_deg, vfov_deg, rot,
                            src_w, src_h, stride=4, true_w=None,
                            true_h=None, projection="perspective"):
    """Coordinate grid sampled every ``stride`` pixels (planner only).

    ``width``/``height`` span the (tile-padded) output grid; the NDC ray
    angles divide by the TRUE view size (``true_w``/``true_h``) to match
    the kernels — pad tiles extrapolate slightly past the view edge and
    must still fit the window budget."""
    xs = (2.0 * np.arange(0, width, stride) + 1.0) / (true_w or width) - 1.0
    ys = (2.0 * np.arange(0, height, stride) + 1.0) / (true_h or height) - 1.0
    if projection == "perspective":
        nx, ny = np.meshgrid(xs * math.tan(math.radians(hfov_deg) / 2.0),
                             ys * math.tan(math.radians(vfov_deg) / 2.0))
        d = np.stack([nx, ny, np.ones_like(nx)], axis=-1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    else:
        nx, ny = np.meshgrid(xs, ys)
        r = np.sqrt(nx * nx + ny * ny)
        half = math.radians(hfov_deg) / 2.0
        if projection == "fisheye_v360":
            theta_f = r * half
        else:
            theta_f = 2.0 * np.arcsin(
                np.clip(r * math.sin(half / 2.0), -1.0, 1.0))
        theta_f = np.clip(theta_f, 0.0, math.pi)
        safe_r = np.where(r > 1e-12, r, 1.0)
        d = np.stack([np.sin(theta_f) * nx / safe_r,
                      np.sin(theta_f) * ny / safe_r,
                      np.cos(theta_f)], axis=-1)
    world = d @ rot.T
    phi = np.arctan2(world[..., 0], world[..., 2])
    theta = np.arcsin(np.clip(world[..., 1], -1.0, 1.0))
    u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
    v = (theta / (math.pi / 2.0) + 1.0) * (src_h / 2.0) - 0.5
    return u, v


# --------------------------------------------------------------------------
# In-kernel math helpers (Mosaic-lowerable)
# --------------------------------------------------------------------------


def _atan_poly(x):
    """atanf on [0, inf): Cephes-style 2-step range reduction + odd minimax
    polynomial (~1e-7 rad). Mosaic has no atan primitive."""
    big = x > 2.414213562373095
    mid = x > 0.4142135623730950
    xr = jnp.where(big, -1.0 / jnp.maximum(x, 1e-30),
                   jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    base = jnp.where(big, math.pi / 2.0, jnp.where(mid, math.pi / 4.0, 0.0))
    z = xr * xr
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z
    return base + xr + xr * p


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    a = _atan_poly(ay / jnp.maximum(ax, 1e-30))
    r = jnp.where(x >= 0.0, a, math.pi - a)
    return jnp.where(y >= 0.0, r, -r)


def _asin(y):
    return _atan2(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))


def _sincos_0_pi(theta):
    """(sin, cos) for theta in [0, pi]: Cephes minimax on x = theta - pi/2
    (sin theta = cos x, cos theta = -sin x). Mosaic has no trig primitives."""
    x = theta - math.pi / 2.0
    z = x * x
    sin_x = x * (1.0 + z * (-1.6666654611e-1 + z * (8.3321608736e-3
                                                    + z * -1.9515295891e-4)))
    cos_x = 1.0 + z * (-0.5 + z * (4.166664568298827e-2
                                   + z * (-1.388731625493765e-3
                                          + z * 2.443315711809948e-5)))
    return cos_x, -sin_x


def _lagrange_weights(t):
    tt = t * t
    ttt = tt * t
    return (-t / 3.0 + tt / 2.0 - ttt / 6.0,
            1.0 - t / 2.0 - tt + ttt / 2.0,
            t + tt / 2.0 - ttt / 2.0,
            -t / 6.0 + ttt / 6.0)


def _linear_weights(t):
    return (1.0 - t, t)


def _catmull_rom_weights(t):
    tt = t * t
    ttt = tt * t
    return (-0.5 * ttt + tt - 0.5 * t,
            1.5 * ttt - 2.5 * tt + 1.0,
            -1.5 * ttt + 2.0 * tt + 0.5 * t,
            0.5 * ttt - 0.5 * tt)


def _blocked_lane_gather(blocks, xi_b):
    """Gather ``win[:, xi]`` where xi spans N_BLOCKS 128-lane blocks.

    ``blocks``: list of (N, 128) arrays; ``xi_b``: (N, 128) int32 global
    column indices in [0, WIN_COLS). Per-element block select.
    """
    g = None
    for b, blk in enumerate(blocks):
        gb = jnp.take_along_axis(
            blk, jnp.clip(xi_b - b * TILE_COLS, 0, TILE_COLS - 1), axis=1)
        gb = jnp.where((xi_b // TILE_COLS) == b, gb, 0.0)
        g = gb if g is None else g + gb
    return g


def _chunk_bounds(vrelw, R: int):
    """8-row window-chunk range [t_lo, t_hi) touched by these rows'
    vertical taps (koff-1 .. +2 covers bicubic; conservative for
    bilinear)."""
    lo = jnp.floor(jnp.min(vrelw)).astype(jnp.int32) - 1
    hi = jnp.floor(jnp.max(vrelw)).astype(jnp.int32) + 2
    t_lo = jnp.clip(lo // 8, 0, R // 8 - 1)
    t_hi = jnp.clip(hi // 8 + 1, 1, R // 8)
    return t_lo, t_hi


def _resample_tile_planar(win_raw, slot, urel, vrel, acc, *, R: int,
                          interp: str, win_cols: int = WIN_COLS):
    """General-geometry resample over a PLANAR window (3, R, WIN_COLS).

    vs the interleaved-window core (`_resample_tile`): the in-window
    de-interleave is gone (the frame is planarized once per frame by
    :func:`_planar_source` — window overlap makes per-window deint ~4×
    the work), and the horizontal tap indices + block-folded weights are
    hoisted per (group, tap, block) OUT of the chunk and channel loops
    instead of being recomputed per (group, chunk, channel, tap, block).
    """
    x0f = jnp.floor(urel)
    y0f = jnp.floor(vrel)
    fx = urel - x0f
    fy = vrel - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    if interp == "bicubic":
        hw = _lagrange_weights(fx)
        vw = _lagrange_weights(fy)
        koff = -1
    elif interp == "catmull-rom":
        hw = _catmull_rom_weights(fx)
        vw = _catmull_rom_weights(fy)
        koff = -1
    else:
        hw = _linear_weights(fx)
        vw = _linear_weights(fy)
        koff = 0
    n_taps = len(hw)

    GROUP = 8
    n_groups = TILE_ROWS // GROUP

    def stack_rows(per_row):
        return jnp.concatenate(
            [jnp.broadcast_to(r, (8, TILE_COLS)) for r in per_row], axis=0)

    for c in range(3):
        acc[c] = jnp.zeros((TILE_ROWS, TILE_COLS), jnp.float32)

    for gi in range(n_groups):
        rows = range(gi * GROUP, (gi + 1) * GROUP)
        # hoisted horizontal tap state (chunk- and channel-invariant)
        relb = []   # [k][b] (GROUP*8, 128) i32 in-block lane indices
        wfb = []    # [k][b] (GROUP*8, 128) f32 block-masked weights
        n_blocks = win_cols // TILE_COLS
        for k in range(n_taps):
            xi = stack_rows([jnp.clip(x0[i:i + 1, :] + (k + koff), 0,
                                      win_cols - 1) for i in rows])
            hws = stack_rows([hw[k][i:i + 1, :] for i in rows])
            blk_of = xi // TILE_COLS
            relb.append([jnp.clip(xi - b * TILE_COLS, 0, TILE_COLS - 1)
                         for b in range(n_blocks)])
            wfb.append([jnp.where(blk_of == b, hws, 0.0)
                        for b in range(n_blocks)])
        ym = [[jnp.clip(y0[i:i + 1, :] + (m + koff), 0, R - 1)
               for m in range(n_taps)] for i in rows]
        vwr = [[vw[m][i:i + 1, :] for m in range(n_taps)] for i in rows]

        tg_lo, tg_hi = _chunk_bounds(vrel[gi * GROUP:(gi + 1) * GROUP, :], R)
        for tchunk in range(R // 8):
            @pl.when((tchunk >= tg_lo) & (tchunk < tg_hi))
            def _(tchunk=tchunk, gi=gi, relb=relb, wfb=wfb, ym=ym, vwr=vwr):
                r0 = tchunk * 8
                # vertical tap state shared across channels
                ry = [[jnp.broadcast_to(jnp.clip(ym[r][m] - r0, 0, 7),
                                        (8, TILE_COLS))
                       for m in range(n_taps)] for r in range(GROUP)]
                wv = [[jnp.where((ym[r][m] // 8) == tchunk, vwr[r][m], 0.0)
                       for m in range(n_taps)] for r in range(GROUP)]
                for c in range(3):
                    rep = [jnp.concatenate(
                        [win_raw[slot, c, r0:r0 + 8,
                                 b * TILE_COLS:(b + 1) * TILE_COLS]] * GROUP,
                        axis=0) for b in range(n_blocks)]
                    ih = None
                    for k in range(n_taps):
                        for b in range(n_blocks):
                            term = jnp.take_along_axis(
                                rep[b], relb[k][b], axis=1) * wfb[k][b]
                            ih = term if ih is None else ih + term
                    if STOP_AFTER == "hpass":
                        band = slice(gi * GROUP, (gi + 1) * GROUP)
                        acc[c, band, :] = (acc[c, band, :]
                                           + ih[0:GROUP, :])
                        continue
                    adds = []
                    for r in range(GROUP):
                        ih_r = ih[r * 8:(r + 1) * 8, :]
                        add = None
                        for m in range(n_taps):
                            gv = jnp.take_along_axis(
                                ih_r, ry[r][m], axis=0)[0:1, :]
                            term = gv * wv[r][m]
                            add = term if add is None else add + term
                        adds.append(add)
                    band = slice(gi * GROUP, (gi + 1) * GROUP)
                    acc[c, band, :] = (acc[c, band, :]
                                       + jnp.concatenate(adds, axis=0))


def _resample_tile_yaw(win_raw, slot, urel, vrel, acc, ihbuf, *, R: int,
                       interp: str, tile_rows: int = TILE_ROWS):
    """Yaw-ring resample: ``urel`` is ROW-INDEPENDENT (all sublanes equal).

    For a pitch=0, roll=0 view the horizontal source coordinate depends
    only on the output column (the rotation is a pure y-axis spin, and
    ``atan2`` is scale-invariant in the ray normalisation), so the
    horizontal resample is the SAME linear map for every window row — and
    a lane-varying linear map over columns is exactly a matmul: build a
    4-tap one-hot weight matrix Wx (WIN_COLS, 128) once per tile and run
    the whole planar window through the MXU, ``IH = win @ Wx``. That
    replaces ~100 VPU lane-shuffles per (chunk, channel) — Mosaic lowers
    a 128-lane dynamic gather to ~8 ops — with systolic-array work that
    is effectively free at these shapes.

    The vertical stage gathers all 8 rows of an output band in ONE
    (8,128) sublane shuffle per tap (``vrel`` varies 2-D, so it cannot
    join the matmul — its weights would have to vary along lanes).
    """
    x0f = jnp.floor(urel)
    y0f = jnp.floor(vrel)
    fx = urel - x0f
    fy = vrel - y0f
    x0 = x0f.astype(jnp.int32)[0:1, :]
    y0 = y0f.astype(jnp.int32)

    if interp == "bicubic":
        hw = _lagrange_weights(fx)
        vw = _lagrange_weights(fy)
        koff = -1
    elif interp == "catmull-rom":
        hw = _catmull_rom_weights(fx)
        vw = _catmull_rom_weights(fy)
        koff = -1
    else:
        hw = _linear_weights(fx)
        vw = _linear_weights(fy)
        koff = 0
    n_taps = len(hw)

    # one-hot horizontal weight matrix: Wx[s, j] = sum_k hw_k[j] * [s == x_k[j]]
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_COLS, TILE_COLS), 0)
    wx = None
    for k in range(n_taps):
        xk = jnp.clip(x0 + (k + koff), 0, WIN_COLS - 1)
        term = jnp.where(s_iota == xk, hw[k][0:1, :], 0.0)
        wx = term if wx is None else wx + term

    # horizontal pass on the MXU: all R window rows, all channels; IH
    # parks in VMEM scratch so the vertical loop can slice it dynamically
    for c in range(3):
        ihbuf[c] = jnp.dot(win_raw[slot, c], wx,
                           preferred_element_type=jnp.float32)

    if STOP_AFTER == "hpass":
        for c in range(3):
            acc[c] = ihbuf[c, 0:tile_rows, :]
        return

    _yaw_vpass(ihbuf, vrel, y0, vw, acc, R=R, n_taps=n_taps, koff=koff,
               tile_rows=tile_rows)


def _yaw_vpass(ihbuf, vrel, y0, vw, acc, *, R: int, n_taps: int, koff: int,
               tile_rows: int):
    """Vertical resample of the MXU h-pass result (shared by yaw v1/v2).

    Per 8-row output band, an exact-trip-count loop over ONLY the window
    chunks the band's taps touch (~2-3 of R/8); the band accumulator is
    loop-carried, so acc gets a single aligned write."""
    n_bands = tile_rows // 8
    for band in range(n_bands):
        rows = slice(band * 8, (band + 1) * 8)
        ymb = [jnp.clip(y0[rows, :] + (m + koff), 0, R - 1)
               for m in range(n_taps)]
        vwb = [vw[m][rows, :] for m in range(n_taps)]
        tb_lo, tb_hi = _chunk_bounds(vrel[rows, :], R)

        def chunk_body(t, vals, ymb=ymb, vwb=vwb):
            r0 = pl.multiple_of(t * 8, 8)
            ry = [jnp.clip(ymb[m] - r0, 0, 7) for m in range(n_taps)]
            wv = [jnp.where((ymb[m] // 8) == t, vwb[m], 0.0)
                  for m in range(n_taps)]
            out = []
            for c in range(3):
                ihc = ihbuf[c, pl.ds(r0, 8), :]
                add = vals[c]
                for m in range(n_taps):
                    gv = jnp.take_along_axis(ihc, ry[m], axis=0)
                    add = add + gv * wv[m]
                out.append(add)
            return tuple(out)

        init = tuple(jnp.zeros((8, TILE_COLS), jnp.float32)
                     for _ in range(3))
        vals = jax.lax.fori_loop(tb_lo, tb_hi, chunk_body, init)
        for c in range(3):
            acc[c, rows, :] = vals[c]


def _resample_tile_wide(win_raw, slot, urel, vrel, acc, *, R: int,
                        interp: str, n_blocks: int):
    """Wide-window resample: the window spans the FULL (seam-padded)
    source width, so any horizontal span — pole tiles, fisheye rims,
    seam crossings — is in-window. The horizontal stage runs a
    ``fori_loop`` over only the 128-lane blocks the output group's taps
    actually touch (equatorial tiles of a polar view touch 2-3 of ~60;
    true pole tiles touch most)."""
    x0f = jnp.floor(urel)
    y0f = jnp.floor(vrel)
    fx = urel - x0f
    fy = vrel - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    if interp == "bicubic":
        hw = _lagrange_weights(fx)
        vw = _lagrange_weights(fy)
        koff = -1
    elif interp == "catmull-rom":
        hw = _catmull_rom_weights(fx)
        vw = _catmull_rom_weights(fy)
        koff = -1
    else:
        hw = _linear_weights(fx)
        vw = _linear_weights(fy)
        koff = 0
    n_taps = len(hw)

    GROUP = 8
    n_groups = TILE_ROWS // GROUP
    max_col = n_blocks * TILE_COLS - 1

    def stack_rows(per_row):
        return jnp.concatenate(
            [jnp.broadcast_to(r, (8, TILE_COLS)) for r in per_row], axis=0)

    x0_g = [stack_rows([x0[i:i + 1, :]
                        for i in range(g * GROUP, (g + 1) * GROUP)])
            for g in range(n_groups)]
    hw_g = [[stack_rows([hw[k][i:i + 1, :]
                         for i in range(g * GROUP, (g + 1) * GROUP)])
             for k in range(n_taps)] for g in range(n_groups)]
    ym_all = [jnp.clip(y0[i:i + 1, :] + (m + koff), 0, R - 1)
              for i in range(TILE_ROWS) for m in range(n_taps)]

    for c in range(3):
        acc[c] = jnp.zeros((TILE_ROWS, TILE_COLS), jnp.float32)

    for gi in range(n_groups):
        xg = x0_g[gi]
        b_lo = jnp.clip((jnp.min(xg) + koff) // TILE_COLS, 0, n_blocks - 1)
        b_hi = jnp.clip((jnp.max(xg) + koff + n_taps - 1) // TILE_COLS + 1,
                        1, n_blocks)
        tg_lo, tg_hi = _chunk_bounds(vrel[gi * GROUP:(gi + 1) * GROUP, :], R)
        for tchunk in range(R // 8):
            @pl.when((tchunk >= tg_lo) & (tchunk < tg_hi))
            def _(tchunk=tchunk, gi=gi, xg=xg, b_lo=b_lo, b_hi=b_hi):
                r0 = tchunk * 8
                for c in range(3):
                    def body(b, ih, c=c):
                        blk = win_raw[slot, c, r0:r0 + 8,
                                      pl.ds(b * TILE_COLS, TILE_COLS)]
                        chunk_rep = jnp.concatenate([blk] * GROUP, axis=0)
                        for k in range(n_taps):
                            xi = jnp.clip(xg + (k + koff), 0, max_col)
                            rel = jnp.clip(xi - b * TILE_COLS, 0,
                                           TILE_COLS - 1)
                            gb = jnp.take_along_axis(chunk_rep, rel, axis=1)
                            term = jnp.where((xi // TILE_COLS) == b,
                                             gb, 0.0) * hw_g[gi][k]
                            ih = ih + term
                        return ih

                    ih = jax.lax.fori_loop(
                        b_lo, b_hi, body,
                        jnp.zeros((GROUP * 8, TILE_COLS), jnp.float32))
                    adds = []
                    for r in range(GROUP):
                        i = gi * GROUP + r
                        ih_i = ih[r * 8:(r + 1) * 8, :]
                        add = None
                        for m in range(n_taps):
                            ym = ym_all[i * n_taps + m]
                            ym8 = jnp.broadcast_to(ym, (8, TILE_COLS))
                            gv = jnp.take_along_axis(
                                ih_i, jnp.clip(ym8 - r0, 0, 7),
                                axis=0)[0:1, :]
                            gv = jnp.where((ym // 8) == tchunk, gv, 0.0) \
                                * vw[m][i:i + 1, :]
                            add = gv if add is None else add + gv
                        adds.append(add)
                    band = slice(gi * GROUP, (gi + 1) * GROUP)
                    acc[c, band, :] = (acc[c, band, :]
                                       + jnp.concatenate(adds, axis=0))


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _warp_kernel(view_f32_ref,         # (V, 16) f32 SMEM: rot(9), tanh, tanv
                 src_hbm,              # (3, H8, W'') planar f32 in ANY/HBM
                 out_ref,              # (1, 3, TILE_ROWS, TILE_COLS) VMEM
                 win_raw,              # scratch (2, 3, R, WIN_COLS) f32
                 acc,                  # scratch (3, TILE_ROWS, TILE_COLS)
                 geom,                 # scratch (2, 2*TILE_ROWS, TILE_COLS)
                 rmcm,                 # scratch SMEM (2, 2) i32
                 sems,                 # DMA semaphores (2,)
                 *, interp: str, win_rows: int, src_w: int, src_h: int,
                 geo_w: int, geo_h: int, n_tiles_x: int,
                 tiles_per_view: int, win_cols: int = WIN_COLS,
                 v_pad: int = 0):
    # v_pad > 0: src_hbm carries v_pad reflected pole rows above/below
    # (see _planar_source) — src_h is the PADDED height (all clamps),
    # the latitude->row scale uses the true panorama height, and v
    # shifts down by the pad
    R = win_rows
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def tile_geometry(t):
        """Closed-form (u, v) coords + window origin (rm, cm) for tile t."""
        view_id = t // tiles_per_view
        within = t - view_id * tiles_per_view
        ty = within // n_tiles_x
        tx = within - ty * n_tiles_x
        r00 = view_f32_ref[view_id, 0]
        r01 = view_f32_ref[view_id, 1]
        r02 = view_f32_ref[view_id, 2]
        r10 = view_f32_ref[view_id, 3]
        r11 = view_f32_ref[view_id, 4]
        r12 = view_f32_ref[view_id, 5]
        r20 = view_f32_ref[view_id, 6]
        r21 = view_f32_ref[view_id, 7]
        r22 = view_f32_ref[view_id, 8]
        tanh = view_f32_ref[view_id, 9]
        tanv = view_f32_ref[view_id, 10]

        jj = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_ROWS, TILE_COLS), 1).astype(jnp.float32)
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_ROWS, TILE_COLS), 0).astype(jnp.float32)
        px = (tx * TILE_COLS).astype(jnp.float32) + jj
        py = (ty * TILE_ROWS).astype(jnp.float32) + ii
        nx = ((2.0 * px + 1.0) / geo_w - 1.0) * tanh
        ny = ((2.0 * py + 1.0) / geo_h - 1.0) * tanv
        inv_n = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
        dx = nx * inv_n
        dy = ny * inv_n
        dz = inv_n
        wx = r00 * dx + r01 * dy + r02 * dz
        wy = r10 * dx + r11 * dy + r12 * dz
        wz = r20 * dx + r21 * dy + r22 * dz
        phi = _atan2(wx, wz)
        theta = _asin(jnp.clip(wy, -1.0, 1.0))
        u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
        v = (theta / (math.pi / 2.0) + 1.0) \
            * ((src_h - 2 * v_pad) / 2.0) - 0.5 + v_pad

        # seam-safe window origin: unwrap u around the tile-center pixel
        u_ctr = u[TILE_ROWS // 2, TILE_COLS // 2]
        urel0 = jnp.mod(u - u_ctr + 0.5 * src_w, float(src_w)) - 0.5 * src_w
        u0 = u_ctr + jnp.min(urel0)
        cm = jnp.mod(jnp.floor(u0).astype(jnp.int32) - H_MARGIN, src_w)
        cm = (cm // 128) * 128          # DMA lane alignment
        vcl = jnp.clip(v, 0.0, src_h - 1.0)
        rm = jnp.clip(jnp.floor(jnp.min(vcl)).astype(jnp.int32) - V_MARGIN,
                      0, src_h - R)
        rm = (rm // 8) * 8              # DMA sublane alignment
        urelw = jnp.mod(u - cm.astype(jnp.float32), float(src_w))
        vrelw = jnp.clip(vcl - rm.astype(jnp.float32), 0.0, R - 1.0)
        return rm, cm, urelw, vrelw

    def dma(slot, rm, cm):
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(cm, win_cols)],
            win_raw.at[slot], sems.at[slot])

    # geometry carry — see _warp_kernel_yaw: each tile's geometry is
    # computed exactly once (by its predecessor, for the DMA prefetch)
    slot = tile % 2

    @pl.when(tile == 0)
    def _():
        rm0, cm0, urel0, vrel0 = tile_geometry(tile)
        geom[0, 0:TILE_ROWS, :] = urel0
        geom[0, TILE_ROWS:2 * TILE_ROWS, :] = vrel0
        rmcm[0, 0] = rm0
        rmcm[0, 1] = cm0
        dma(0, rm0, cm0).start()

    @pl.when(tile + 1 < n_tiles)
    def _():
        nslot = (tile + 1) % 2
        rm_n, cm_n, urel_n, vrel_n = tile_geometry(tile + 1)
        geom[nslot, 0:TILE_ROWS, :] = urel_n
        geom[nslot, TILE_ROWS:2 * TILE_ROWS, :] = vrel_n
        rmcm[nslot, 0] = rm_n
        rmcm[nslot, 1] = cm_n
        dma(nslot, rm_n, cm_n).start()

    urel = geom[slot, 0:TILE_ROWS, :]
    vrel = geom[slot, TILE_ROWS:2 * TILE_ROWS, :]
    rm_t = pl.multiple_of(rmcm[slot, 0], 8)
    cm_t = pl.multiple_of(rmcm[slot, 1], 128)
    dma(slot, rm_t, cm_t).wait()

    if STOP_AFTER == "geom_dma":
        for c in range(3):
            out_ref[0, c, :, :] = win_raw[slot, c, 0:TILE_ROWS, 0:128] + urel
        return

    _resample_tile_planar(win_raw, slot, urel, vrel, acc, R=R,
                          interp=interp, win_cols=win_cols)

    for c in range(3):
        out_ref[0, c, :, :] = acc[c]
    return



def _warp_kernel_yaw(view_f32_ref,     # (V, 16) f32 SMEM: rot(9), tanh, tanv
                     src_hbm,          # (3, H8, W'') planar f32 in ANY/HBM
                     out_ref,          # (1, 3, TILE_ROWS, TILE_COLS) VMEM
                     win_raw,          # scratch (2, 3, R, WIN_COLS) f32
                     acc,              # scratch (3, tile_rows, TILE_COLS)
                     ihbuf,            # scratch (3, R, TILE_COLS) h-pass
                     geom,             # scratch (2, 8+tile_rows, TILE_COLS)
                     rmcm,             # scratch SMEM (2, 2) i32
                     sems,             # DMA semaphores (2,)
                     *, interp: str, win_rows: int, src_w: int,
                     src_h: int, geo_w: int, geo_h: int, n_tiles_x: int,
                     tiles_per_view: int, tile_rows: int = TILE_ROWS,
                     v_pad: int = 0):
    """Yaw-ring warp kernel: pitch=0, roll=0 views (the default preset's
    camera ring, and the dominant production geometry). ``u`` is
    row-independent — ``atan2(cy·nx + sy, cy − sy·nx)`` drops out of the
    ray normalisation — which makes the horizontal resample shareable
    across output rows (see :func:`_resample_tile_yaw`)."""
    R = win_rows
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def tile_geometry(t):
        view_id = t // tiles_per_view
        within = t - view_id * tiles_per_view
        ty = within // n_tiles_x
        tx = within - ty * n_tiles_x
        cy = view_f32_ref[view_id, 0]      # r00 = cos(yaw)
        sy = view_f32_ref[view_id, 2]      # r02 = sin(yaw)
        tanh = view_f32_ref[view_id, 9]
        tanv = view_f32_ref[view_id, 10]

        jj8 = jax.lax.broadcasted_iota(
            jnp.int32, (8, TILE_COLS), 1).astype(jnp.float32)
        px8 = (tx * TILE_COLS).astype(jnp.float32) + jj8
        nx8 = ((2.0 * px8 + 1.0) / geo_w - 1.0) * tanh
        # yaw-only: atan2(wx, wz) is scale-invariant in the ray norm, so
        # u never touches ny — one 8x128 vreg, all sublanes equal
        phi = _atan2(cy * nx8 + sy, cy - sy * nx8)
        u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5

        jj = jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, TILE_COLS), 1).astype(jnp.float32)
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, TILE_COLS), 0).astype(jnp.float32)
        px = (tx * TILE_COLS).astype(jnp.float32) + jj
        py = (ty * tile_rows).astype(jnp.float32) + ii
        nx = ((2.0 * px + 1.0) / geo_w - 1.0) * tanh
        ny = ((2.0 * py + 1.0) / geo_h - 1.0) * tanv
        inv_n = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
        theta = _asin(jnp.clip(ny * inv_n, -1.0, 1.0))
        v = (theta / (math.pi / 2.0) + 1.0) \
            * ((src_h - 2 * v_pad) / 2.0) - 0.5 + v_pad

        u_ctr = u[0, TILE_COLS // 2]
        urel0 = jnp.mod(u - u_ctr + 0.5 * src_w, float(src_w)) - 0.5 * src_w
        u0 = u_ctr + jnp.min(urel0)
        cm = jnp.mod(jnp.floor(u0).astype(jnp.int32) - H_MARGIN, src_w)
        cm = (cm // 128) * 128
        vcl = jnp.clip(v, 0.0, src_h - 1.0)
        rm = jnp.clip(jnp.floor(jnp.min(vcl)).astype(jnp.int32) - V_MARGIN,
                      0, src_h - R)
        rm = (rm // 8) * 8
        urelw = jnp.mod(u - cm.astype(jnp.float32), float(src_w))
        vrelw = jnp.clip(vcl - rm.astype(jnp.float32), 0.0, R - 1.0)
        return rm, cm, urelw, vrelw

    def dma(slot, rm, cm):
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(cm, WIN_COLS)],
            win_raw.at[slot], sems.at[slot])

    # geometry carry: tile t computes tile t+1's geometry once (needed for
    # the DMA prefetch anyway) and parks it in scratch; tile t+1 reads it
    # back instead of recomputing — halves the per-tile trig work. Grid
    # iterations are sequential on a core, the same property the
    # double-buffered window DMA already relies on.
    slot = tile % 2

    @pl.when(tile == 0)
    def _():
        rm0, cm0, urel0, vrel0 = tile_geometry(tile)
        geom[0, 0:8, :] = urel0
        geom[0, 8:8 + tile_rows, :] = vrel0
        rmcm[0, 0] = rm0
        rmcm[0, 1] = cm0
        dma(0, rm0, cm0).start()

    @pl.when(tile + 1 < n_tiles)
    def _():
        nslot = (tile + 1) % 2
        rm_n, cm_n, urel_n, vrel_n = tile_geometry(tile + 1)
        geom[nslot, 0:8, :] = urel_n
        geom[nslot, 8:8 + tile_rows, :] = vrel_n
        rmcm[nslot, 0] = rm_n
        rmcm[nslot, 1] = cm_n
        dma(nslot, rm_n, cm_n).start()

    urel = geom[slot, 0:8, :]
    vrel = geom[slot, 8:8 + tile_rows, :]
    rm_t = pl.multiple_of(rmcm[slot, 0], 8)
    cm_t = pl.multiple_of(rmcm[slot, 1], 128)
    dma(slot, rm_t, cm_t).wait()

    if STOP_AFTER == "geom_dma":
        for c in range(3):
            out_ref[0, c, :, :] = (win_raw[slot, c, 0:tile_rows, 0:128]
                                   + vrel)
        return

    _resample_tile_yaw(win_raw, slot, urel, vrel, acc, ihbuf, R=R,
                       interp=interp, tile_rows=tile_rows)

    for c in range(3):
        out_ref[0, c, :, :] = acc[c]


# tilted (pitch/roll != 0) views stretch horizontally toward high
# latitudes (du/dj ~ 1/cos lat): a second narrow width class with taller
# row budgets serves them with static hoisted gathers instead of the
# wide kernel's dynamic block loop
TILT_WIN_COLS = 640
TILT_ROW_CLASSES = (16, 48, 96, 152)

# yaw-class tiles are 32 rows tall: the cheap MXU h-pass makes per-tile
# fixed costs (geometry trig, DMA descriptors, grid steps) the bottleneck,
# and taller tiles also shrink window overlap (1.8 -> 1.2 GB per 8-view
# 8K frame). Row classes grow accordingly; the 40/48 steps matter because
# both the window DMA and the MXU h-pass scale linearly with R (default
# preset tiles span ~35 rows — R=64 was paying 33% extra on both).
# 64-row tiles with u8 windows: per-tile fixed costs (geometry trig, DMA
# issue/wait, loop overhead ~1.6us/tile) dominate the yaw kernel once the
# window DMA rides u8, so halving the tile count beats the extra window
# rows (32-row: 899 views/s; 64: 1,046; 96: 911 — measured 8x 8K->1080p)
YAW_TILE_ROWS = 64
YAW_ROW_CLASSES = (48, 64, 96, 128, 160, 192)
# window-width classes: wide-fov yaw rings (full360coverage is 104 deg)
# stretch horizontally toward high latitudes and need wider one-hot
# matrices to stay on the MXU path instead of falling to the wide kernel
YAW_WIN_CLASSES = (WIN_COLS, 512, 640)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "true_w", "true_h", "src_w",
                     "src_h", "v_pad", "interp", "win_rows", "n_views", "interpret"))
def _warp_call_yaw(src_rows, view_f32, *, width, height, true_w, true_h,
                   src_w, src_h, interp, win_rows, n_views,
                   interpret=False, v_pad=0):
    tile_rows = YAW_TILE_ROWS
    n_tiles_x = width // TILE_COLS
    tiles_per_view = (height // tile_rows) * n_tiles_x
    n_tiles = tiles_per_view * n_views

    kernel = functools.partial(
        _warp_kernel_yaw, interp=interp, win_rows=win_rows, src_w=src_w,
        src_h=src_h, geo_w=true_w, geo_h=true_h, n_tiles_x=n_tiles_x,
        tiles_per_view=tiles_per_view, tile_rows=tile_rows, v_pad=v_pad)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, height, width),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # view_f32
            pl.BlockSpec(memory_space=pl.ANY),       # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 3, tile_rows, TILE_COLS),
            lambda t: (t // tiles_per_view,
                       0,
                       (t % tiles_per_view) // n_tiles_x,
                       (t % tiles_per_view) % n_tiles_x),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, win_rows, WIN_COLS), jnp.float32),
            pltpu.VMEM((3, tile_rows, TILE_COLS), jnp.float32),
            pltpu.VMEM((3, win_rows, TILE_COLS), jnp.float32),
            pltpu.VMEM((2, 8 + tile_rows, TILE_COLS), jnp.float32),
            pltpu.SMEM((2, 2), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(view_f32, src_rows)


# --------------------------------------------------------------------------
# Yaw v2: host-planned tables + precomputed MXU h-pass matrices
# --------------------------------------------------------------------------


def _yaw_host_tables(yaws: tuple, hfov_deg: float, vfov_deg: float, *,
                     out_w: int, out_h: int, true_w: int, true_h: int,
                     src_w: int, src_h: int, win_rows: int, tile_rows: int,
                     interp: str, win_cols: int = WIN_COLS,
                     weight_scale: float = 1.0, v_pad: int = 0):
    """Float64 host twin of the yaw-ring geometry.

    Returns ``(wx, rmcm)``: per-(view, tile-col) one-hot horizontal
    resample matrices (V·n_tx, WIN_COLS, 128) f32 — ``IH = win @ wx`` on
    the MXU — and per-tile window origins (n_tiles, 2) i32 [rm, cm].

    Geometry is static across frames, so the matrices that kernel v1
    rebuilt per tile (dominating its per-tile fixed cost: n_ty tiles share
    one matrix) are built once per view set here and streamed from HBM via
    the pipelined wx input.  u is computed with numpy's f64 atan2, i.e.
    CLOSER to the XLA twin than v1's in-kernel Cephes poly; cm/rm move
    with it as a single source of truth, so coverage is self-consistent.
    """
    n_tx = out_w // TILE_COLS
    n_ty = out_h // tile_rows
    nv = len(yaws)
    tanh = math.tan(math.radians(hfov_deg) / 2.0)
    tanv = math.tan(math.radians(vfov_deg) / 2.0)
    wx = np.zeros((nv * n_tx, win_cols, TILE_COLS), np.float32)
    # (2, n_tiles): scalar-prefetch SMEM pads each ROW to 512B, so the
    # table must be few-rows-many-cols (the (n_tiles, 2) layout exploded
    # an 8-view 1080p grid to 2MB against the 1MB SMEM budget)
    rmcm = np.zeros((2, nv * n_tx * n_ty), np.int32)
    px = np.arange(out_w, dtype=np.float64)
    nx = ((2.0 * px + 1.0) / true_w - 1.0) * tanh
    py = np.arange(out_h, dtype=np.float64)
    ny = ((2.0 * py + 1.0) / true_h - 1.0) * tanv
    inv_n = 1.0 / np.sqrt(nx[None, :] ** 2 + ny[:, None] ** 2 + 1.0)
    # v_pad: the planar source carries v_pad reflected pole rows above
    # and below (see _planar_source); src_h stays the TRUE panorama
    # height (the latitude scale), coordinates shift down by the pad,
    # and clamps/origin caps use the padded height
    src_h_p = src_h + 2 * v_pad
    v = (np.arcsin(np.clip(ny[:, None] * inv_n, -1.0, 1.0))
         / (math.pi / 2.0) + 1.0) * (src_h / 2.0) - 0.5 + v_pad
    vcl = np.clip(v, 0.0, src_h_p - 1.0)
    for vi, yaw in enumerate(yaws):
        cy = math.cos(math.radians(yaw))
        sy = math.sin(math.radians(yaw))
        phi = np.arctan2(cy * nx + sy, cy - sy * nx)
        u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
        for tx in range(n_tx):
            useg = u[tx * TILE_COLS:(tx + 1) * TILE_COLS]
            u_ctr = useg[TILE_COLS // 2]
            urel0 = np.mod(useg - u_ctr + src_w / 2.0, src_w) - src_w / 2.0
            u0 = u_ctr + urel0.min()
            cm = (int(np.mod(np.floor(u0) - H_MARGIN, src_w)) // 128) * 128
            urelw = np.mod(useg - cm, float(src_w))
            x0 = np.floor(urelw)
            fx = urelw - x0
            if interp == "bicubic":
                hw = _lagrange_weights(fx)
                koff = -1
            elif interp == "catmull-rom":
                hw = _catmull_rom_weights(fx)
                koff = -1
            else:
                hw = _linear_weights(fx)
                koff = 0
            mat = np.zeros((win_cols, TILE_COLS), np.float64)
            lanes = np.arange(TILE_COLS)
            for k, hwk in enumerate(hw):
                xi = np.clip(x0.astype(np.int64) + (k + koff), 0,
                             win_cols - 1)
                np.add.at(mat, (xi, lanes), hwk)
            if weight_scale != 1.0:
                # u8 windows: the /255 normalization rides the weights
                mat *= weight_scale
            wx[vi * n_tx + tx] = mat.astype(np.float32)
            for ty in range(n_ty):
                vt = vcl[ty * tile_rows:(ty + 1) * tile_rows,
                         tx * TILE_COLS:(tx + 1) * TILE_COLS]
                rm = int(np.floor(vt.min())) - V_MARGIN
                rm = (max(0, min(rm, src_h_p - win_rows)) // 8) * 8
                rmcm[:, (vi * n_tx + tx) * n_ty + ty] = (rm, cm)
    return wx, rmcm


_YAW_DEV_CACHE: dict = {}


def _yaw_tables_device(key, *args, **kwargs):
    """Device-resident (wx, rmcm) cache: geometry is static across frames
    and the 20-odd-MB wx upload must not recur per frame."""
    cache_key = (key, jax.default_backend())
    hit = _YAW_DEV_CACHE.get(cache_key)
    if hit is not None:
        return hit
    wx, rmcm = _yaw_host_tables(*args, **kwargs)
    # concrete even under an outer trace (bench device loops jit the
    # whole warp entry): a traced constant cached here would escape its
    # trace and poison the next call (UnexpectedTracerError)
    with jax.ensure_compile_time_eval():
        val = (jnp.asarray(wx), jnp.asarray(rmcm))
    if len(_YAW_DEV_CACHE) > 8:
        _YAW_DEV_CACHE.clear()
    _YAW_DEV_CACHE[cache_key] = val
    return val


def _warp_kernel_yaw2(rmcm_ref,          # scalar-prefetch (n_tiles, 2) i32
                      view_f32_ref,      # (V, 16) f32 SMEM
                      wx_ref,            # (1, WIN_COLS, 128) VMEM pipelined
                      src_hbm,           # (3, H8, W'') planar f32 HBM
                      out_ref,           # (1, 3, tile_rows, 128) VMEM
                      win_raw,           # scratch (2, 3, R, WIN_COLS)
                      acc,               # scratch (3, tile_rows, 128)
                      ihbuf,             # scratch (3, R, 128)
                      sems,              # DMA semaphores (2,)
                      *, interp: str, win_rows: int, src_w: int, src_h: int,
                      geo_w: int, geo_h: int, n_tx: int, n_ty: int,
                      tile_rows: int, win_cols: int = WIN_COLS,
                      v_pad: int = 0):
    """Yaw-ring warp v2.  All horizontal-resample state is PRECOMPUTED:
    the one-hot matrix arrives via the pipelined ``wx`` input (fetched
    once per (view, tile-col), reused across the n_ty tile rows — the
    grid iterates ty fastest) and window origins via scalar-prefetch, so
    the in-kernel work is one window DMA, the (tile_rows, 128) vertical
    trig, 3 MXU matmuls, and the chunked vertical gather."""
    R = win_rows
    vtx = pl.program_id(0)
    ty = pl.program_id(1)
    t = vtx * n_ty + ty
    n_t = pl.num_programs(0) * pl.num_programs(1)
    view_id = vtx // n_tx
    tx = vtx - view_id * n_tx

    def dma(slot, tt):
        rm = pl.multiple_of(rmcm_ref[0, tt], 8)
        cm = pl.multiple_of(rmcm_ref[1, tt], 128)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(cm, win_cols)],
            win_raw.at[slot], sems.at[slot])

    slot = t % 2

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        dma((t + 1) % 2, t + 1).start()

    # vertical geometry (yaw-invariant; row band ty, col band tx)
    tanh = view_f32_ref[view_id, 9]
    tanv = view_f32_ref[view_id, 10]
    jj = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, TILE_COLS), 1).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (tile_rows, TILE_COLS), 0).astype(jnp.float32)
    px = (tx * TILE_COLS).astype(jnp.float32) + jj
    py = (ty * tile_rows).astype(jnp.float32) + ii
    nx = ((2.0 * px + 1.0) / geo_w - 1.0) * tanh
    ny = ((2.0 * py + 1.0) / geo_h - 1.0) * tanv
    inv_n = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
    theta = _asin(jnp.clip(ny * inv_n, -1.0, 1.0))
    v = (theta / (math.pi / 2.0) + 1.0) \
        * ((src_h - 2 * v_pad) / 2.0) - 0.5 + v_pad
    vcl = jnp.clip(v, 0.0, src_h - 1.0)
    rm_t = rmcm_ref[0, t]
    vrel = jnp.clip(vcl - rm_t.astype(jnp.float32), 0.0, R - 1.0)

    y0 = jnp.floor(vrel).astype(jnp.int32)
    fy = vrel - jnp.floor(vrel)
    if interp in ("bicubic", "catmull-rom"):
        vw = (_lagrange_weights(fy) if interp == "bicubic"
              else _catmull_rom_weights(fy))
        koff = -1
    else:
        vw = _linear_weights(fy)
        koff = 0

    dma(slot, t).wait()

    # horizontal pass on the MXU with the precomputed one-hot matrix.
    # Default precision is the MXU's native bf16 pass: max error vs the
    # f32 XLA twin is ~1e-3 of full scale (~0.25 u8 LSB) — the same
    # order as ffmpeg v360's own fixed-point tap arithmetic, i.e.
    # invisible in quantized output.  GS360X_WARP_PRECISION=float32
    # switches to the 6-pass f32 emulation (HIGHEST, ~1e-7; Mosaic has
    # no 3-pass middle tier) at ~35%% headline cost for bit-level f32
    # parity work.  u8 windows (raw source bytes, /255 folded into wx)
    # cast on the VPU right before the matmul — the bytes are exact in
    # f32/bf16, so numerics match the f32-window path bit for bit.
    for c in range(3):
        wf = win_raw[slot, c]
        if wf.dtype == jnp.uint8:
            wf = wf.astype(jnp.int32).astype(jnp.float32)
        ihbuf[c] = jnp.dot(wf, wx_ref[0],
                           preferred_element_type=jnp.float32,
                           precision=_MATMUL_PRECISION)

    if STOP_AFTER == "hpass":
        for c in range(3):
            acc[c] = ihbuf[c, 0:tile_rows, :]
    else:
        _yaw_vpass(ihbuf, vrel, y0, vw, acc, R=R, n_taps=len(vw),
                   koff=koff, tile_rows=tile_rows)

    for c in range(3):
        out_ref[0, c, :, :] = acc[c]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "true_w", "true_h", "src_w",
                     "src_h", "v_pad", "interp", "win_rows", "n_views", "win_cols",
                     "interpret"))
def _warp_call_yaw2(src_rows, view_f32, wx, rmcm, *, width, height, true_w,
                    true_h, src_w, src_h, interp, win_rows, n_views,
                    win_cols=WIN_COLS, interpret=False, v_pad=0):
    tile_rows = YAW_TILE_ROWS
    n_tx = width // TILE_COLS
    n_ty = height // tile_rows

    kernel = functools.partial(
        _warp_kernel_yaw2, interp=interp, win_rows=win_rows, src_w=src_w,
        src_h=src_h, geo_w=true_w, geo_h=true_h, n_tx=n_tx, n_ty=n_ty,
        tile_rows=tile_rows, win_cols=win_cols, v_pad=v_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_views * n_tx, n_ty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # view_f32
            pl.BlockSpec((1, win_cols, TILE_COLS),     # wx: per (view, tx)
                         lambda vtx, ty, rmcm: (vtx, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),         # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 3, tile_rows, TILE_COLS),
            lambda vtx, ty, rmcm: (vtx // n_tx, 0, ty, vtx % n_tx)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, win_rows, win_cols), src_rows.dtype),
            pltpu.VMEM((3, tile_rows, TILE_COLS), jnp.float32),
            pltpu.VMEM((3, win_rows, TILE_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, height, width),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rmcm, view_f32, wx, src_rows)


def _warp_kernel_wide(view_f32_ref, src_hbm, out_ref, win_raw, acc,
                      rm_prev, sems,
                      *, interp: str, win_rows: int, src_w: int,
                      src_h: int, geo_w: int, geo_h: int, n_tiles_x: int,
                      tiles_per_view: int, projection: str = "perspective",
                      v_pad: int = 0):
    """Wide-window warp kernel: full-width short windows. Serves views the
    narrow kernel's budget rejects — poles in view (pitch ±90), extreme
    horizontal slopes — as long as each tile's VERTICAL span fits
    ``win_rows`` (latitude has no pole blowup, so this holds for any
    practical zoom). Seam wrap is free: the window covers every column."""
    R = win_rows
    n_blocks = _planar_width(src_w) // TILE_COLS
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def tile_geometry(t):
        view_id = t // tiles_per_view
        within = t - view_id * tiles_per_view
        ty = within // n_tiles_x
        tx = within - ty * n_tiles_x
        r00 = view_f32_ref[view_id, 0]
        r01 = view_f32_ref[view_id, 1]
        r02 = view_f32_ref[view_id, 2]
        r10 = view_f32_ref[view_id, 3]
        r11 = view_f32_ref[view_id, 4]
        r12 = view_f32_ref[view_id, 5]
        r20 = view_f32_ref[view_id, 6]
        r21 = view_f32_ref[view_id, 7]
        r22 = view_f32_ref[view_id, 8]
        tanh = view_f32_ref[view_id, 9]
        tanv = view_f32_ref[view_id, 10]

        jj = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_ROWS, TILE_COLS), 1).astype(jnp.float32)
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_ROWS, TILE_COLS), 0).astype(jnp.float32)
        px = (tx * TILE_COLS).astype(jnp.float32) + jj
        py = (ty * TILE_ROWS).astype(jnp.float32) + ii
        nx = (2.0 * px + 1.0) / geo_w - 1.0
        ny = (2.0 * py + 1.0) / geo_h - 1.0
        if projection == "perspective":
            nx = nx * tanh
            ny = ny * tanv
            inv_n = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
            dx = nx * inv_n
            dy = ny * inv_n
            dz = inv_n
            valid = None
        else:
            # circular fisheye output (v360 equidistant / lens equisolid):
            # slot 9 = half d_fov in radians, slot 10 = sin(half/2)
            r = jnp.sqrt(nx * nx + ny * ny)
            if projection == "fisheye_v360":
                theta_f = r * tanh
            else:  # equisolid
                theta_f = 2.0 * _asin(jnp.clip(r * tanv, -1.0, 1.0))
            valid = r <= 1.0
            theta_f = jnp.clip(theta_f, 0.0, math.pi)
            sin_t, cos_t = _sincos_0_pi(theta_f)
            safe_r = jnp.where(r > 1e-12, r, 1.0)
            dx = sin_t * (nx / safe_r)
            dy = sin_t * (ny / safe_r)
            dz = cos_t
        wx = r00 * dx + r01 * dy + r02 * dz
        wy = r10 * dx + r11 * dy + r12 * dz
        wz = r20 * dx + r21 * dy + r22 * dz
        phi = _atan2(wx, wz)
        theta = _asin(jnp.clip(wy, -1.0, 1.0))
        u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
        v = (theta / (math.pi / 2.0) + 1.0) \
            * ((src_h - 2 * v_pad) / 2.0) - 0.5 + v_pad

        # absolute u; taps near the left edge read the right-side wrap pad
        u = jnp.mod(u, float(src_w))
        u = jnp.where(u < 4.0, u + float(src_w), u)
        vcl = jnp.clip(v, 0.0, src_h - 1.0)
        rm = jnp.clip(jnp.floor(jnp.min(vcl)).astype(jnp.int32) - V_MARGIN,
                      0, src_h - R)
        rm = (rm // 8) * 8
        vrelw = jnp.clip(vcl - rm.astype(jnp.float32), 0.0, R - 1.0)
        return rm, u, vrelw, valid

    def dma(rm):
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), :], win_raw.at[0], sems.at[0])

    rm_t, urel, vrel, valid = tile_geometry(tile)

    # single-buffered window, re-DMA'd only when the origin moves: pole
    # views' central tiles all read the same polar cap, and grid
    # iterations are sequential, so rm_prev (SMEM) carries across tiles
    need = (tile == 0) | (rm_t != rm_prev[0])

    @pl.when(need)
    def _():
        io = dma(rm_t)
        io.start()
        io.wait()

    rm_prev[0] = rm_t

    _resample_tile_wide(win_raw, 0, urel, vrel, acc, R=R, interp=interp,
                        n_blocks=n_blocks)
    if valid is None:
        for c in range(3):
            out_ref[0, c, :, :] = acc[c]
    else:
        vf = valid.astype(jnp.float32)   # fill=0 outside the image circle
        for c in range(3):
            out_ref[0, c, :, :] = acc[c] * vf


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "true_w", "true_h", "src_w",
                     "src_h", "v_pad", "interp", "win_rows", "n_views",
                     "projection", "interpret"))
def _warp_call_wide(src_rows, view_f32, *, width, height, true_w, true_h,
                    src_w, src_h, interp, win_rows, n_views,
                    projection="perspective", interpret=False, v_pad=0):
    n_tiles_x = width // TILE_COLS
    tiles_per_view = (height // TILE_ROWS) * n_tiles_x
    n_tiles = tiles_per_view * n_views

    kernel = functools.partial(
        _warp_kernel_wide, interp=interp, win_rows=win_rows, src_w=src_w,
        src_h=src_h, geo_w=true_w, geo_h=true_h, n_tiles_x=n_tiles_x,
        tiles_per_view=tiles_per_view, projection=projection, v_pad=v_pad)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, height, width),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # view_f32
            pl.BlockSpec(memory_space=pl.ANY),       # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_ROWS, TILE_COLS),
            lambda t: (t // tiles_per_view,
                       0,
                       (t % tiles_per_view) // n_tiles_x,
                       (t % tiles_per_view) % n_tiles_x),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, 3, win_rows, _planar_width(src_w)), jnp.float32),
            pltpu.VMEM((3, TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(view_f32, src_rows)


# near a pole the radial v-gradient runs along the tile WIDTH, so a
# pole-containing tile's vertical span is ~129x the latitude slope —
# the taller classes exist for exactly those tiles
WIDE_ROW_CLASSES = (16, 48, 96, 152, 240, 384)
WIDE_VMEM_BUDGET = 44 * 1024 * 1024  # single-buffered window bytes


@functools.lru_cache(maxsize=4096)
def plan_view_wide(width: int, height: int, hfov_deg: float,
                   vfov_deg: float, yaw_deg: float, pitch_deg: float,
                   roll_deg: float, src_w: int, src_h: int,
                   true_w: Optional[int] = None,
                   true_h: Optional[int] = None,
                   projection: str = "perspective",
                   v_pad: int = 0) -> Optional[ViewBudget]:
    """Wide-class budget: only the per-tile VERTICAL span matters (the
    window spans every column), so poles in view are fine.

    ``v_pad``: plan against a pole-padded planar source (``src_h`` stays
    the TRUE panorama height; coords shift down by the pad and clamps
    use the padded height — see :func:`_planar_source`)."""
    if width % TILE_COLS or height % TILE_ROWS or src_w % TILE_COLS:
        return None
    src_h_p = src_h + 2 * v_pad
    rot = _rot_matrix(yaw_deg, pitch_deg, roll_deg)
    # stride-1 (exact) sampling: wide-class views contain poles, where v
    # swings arbitrarily fast between strided samples — a stride-4 span
    # estimate under-sizes the row class and the kernel's window clip then
    # silently corrupts the pole-adjacent tile corner. Exact costs ~0.1s
    # per view geometry, amortized by the lru cache.
    _u, v = _np_view_coords_strided(width, height, hfov_deg, vfov_deg, rot,
                                    src_w, src_h, stride=1, true_w=true_w,
                                    true_h=true_h, projection=projection)
    n_ty, n_tx = height // TILE_ROWS, width // TILE_COLS
    vc = np.clip(v + v_pad, 0.0, src_h_p - 1.0).reshape(
        n_ty, TILE_ROWS, n_tx, TILE_COLS)
    margin = 0.0
    v_span = (vc.max(axis=(1, 3)) - vc.min(axis=(1, 3))
              + 2 * V_MARGIN + 2 * margin)
    row_bytes = 3 * (src_w + WIN_COLS) * 4
    for r in WIDE_ROW_CLASSES:
        if r * row_bytes > WIDE_VMEM_BUDGET or r > src_h_p:
            continue
        if float(v_span.max()) <= r - 9:
            return ViewBudget(win_rows=r, rot=rot.astype(np.float32))
    return None


# --------------------------------------------------------------------------
# Wide v2: per-(tile, block) windows fetched in rounds, host-planned tables
# --------------------------------------------------------------------------

WIDE2_BPR = 4                       # column-blocks per DMA round
WIDE2_ROW_CLASSES = (48, 96, 152, 240)


@functools.lru_cache(maxsize=1024)
def _wide2_plan_view(width: int, height: int, hfov_deg: float,
                     vfov_deg: float, yaw_deg: float, pitch_deg: float,
                     roll_deg: float, src_w: int, src_h: int,
                     true_w: int, true_h: int, projection: str,
                     v_pad: int = 0):
    """Exact (stride-1, f64) per-tile window plan for the wide-v2 kernel.

    Returns ``(win_rows, max_rounds, tab)`` or ``None`` when some block's
    vertical span exceeds every row class.  ``tab`` is (n_tiles_view,
    3 + WIDE2_BPR) i32: [b0, nblk, anchor, rm of blocks 0..3].

    Per-tile ANCHORED seam unwrap: tile columns live in
    ``anchor + [-src_w/2, src_w/2)`` where ``anchor`` is the circular
    mean of the tile's valid-pixel u values (shifted +src_w when the
    range would go negative), so seam-straddling tiles get a tight
    contiguous block range instead of spanning the whole width.  Tiles
    whose true sweep is too wide for the right-side wrap pad (pole caps
    see every longitude) fall back to ``anchor = src_w/2 + 4`` — the
    plain [4, src_w+4) wrap.  Fisheye image-circle pixels outside r<=1
    are EXCLUDED from planning (they are masked at output); the kernel's
    in-kernel row-origin rule masks them identically.
    """
    if width % TILE_COLS or height % TILE_ROWS:
        return None
    src_h_p = src_h + 2 * v_pad
    rot = _rot_matrix(yaw_deg, pitch_deg, roll_deg)
    u, v = _np_view_coords_strided(width, height, hfov_deg, vfov_deg, rot,
                                   src_w, src_h, stride=1, true_w=true_w,
                                   true_h=true_h, projection=projection)
    w = float(src_w)
    u = np.mod(u, w)
    vcl = np.clip(v + v_pad, 0.0, src_h_p - 1.0)
    if projection == "perspective":
        valid = np.ones_like(u, dtype=bool)
    else:
        xs = (2.0 * np.arange(width) + 1.0) / true_w - 1.0
        ys = (2.0 * np.arange(height) + 1.0) / true_h - 1.0
        nxg, nyg = np.meshgrid(xs, ys)
        valid = np.hypot(nxg, nyg) <= 1.0
    pad_w = _planar_width(src_w)
    n_ty, n_tx = height // TILE_ROWS, width // TILE_COLS
    uc = u.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    vc = vcl.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    vm4 = valid.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    tab = np.zeros((n_ty * n_tx, 3 + WIDE2_BPR), np.int32)
    span_max = 0.0
    nblk_max = 1
    plain_anchor = src_w // 2 + 4

    for ty in range(n_ty):
        for tx in range(n_tx):
            ut = uc[ty, :, tx, :]
            vt = vc[ty, :, tx, :]
            mt = vm4[ty, :, tx, :]
            if not mt.any():
                tab[ty * n_tx + tx] = [0, 0, plain_anchor] + [0] * WIDE2_BPR
                continue
            ang = ut[mt] * (2.0 * math.pi / w)
            anchor = math.atan2(np.sin(ang).mean(),
                                np.cos(ang).mean()) * w / (2.0 * math.pi)
            anchor = float(np.mod(anchor, w))
            for try_anchor in (anchor, float(plain_anchor)):
                ua = try_anchor + np.mod(ut - try_anchor + w / 2.0, w) \
                    - w / 2.0
                uam = ua[mt]
                lo = int(np.floor(uam.min())) - 2   # taps -1 .. +2, +-1 f32
                hi = int(np.floor(uam.max())) + 3
                if lo < 0:
                    try_anchor += w
                    ua = ua + w
                    lo += src_w
                    hi += src_w
                if hi < pad_w - 1:
                    break
            else:
                return None
            b0 = lo // 128
            nblk = hi // 128 - b0 + 1
            nblk_max = max(nblk_max, nblk)
            x0 = np.floor(ua).astype(np.int64)
            rms = []
            for b in range(nblk):
                bcol = (b0 + b) * 128
                m = mt & (x0 + 3 >= bcol) & (x0 - 2 < bcol + 128)
                if not m.any():
                    rms.append(0)
                    continue
                vb = vt[m]
                span_max = max(span_max, float(vb.max() - vb.min()))
                rms.append(int(np.floor(vb.min())) - V_MARGIN)
            row = [b0, nblk, int(round(try_anchor))] \
                + [(max(0, r) // 8) * 8 for r in rms[:WIDE2_BPR]]
            row += [0] * (3 + WIDE2_BPR - len(row))
            tab[ty * n_tx + tx] = row
    need = span_max + 2 * V_MARGIN
    win_rows = None
    for r in WIDE2_ROW_CLASSES:
        if r > src_h_p:
            continue
        if need <= r - 9:
            win_rows = r
            break
    if win_rows is None:
        return None
    # rm upper clip depends on the class; applied here AND in-kernel
    tab[:, 3:] = np.minimum(tab[:, 3:], ((src_h_p - win_rows) // 8) * 8)
    max_rounds = -(-nblk_max // WIDE2_BPR)
    return win_rows, max_rounds, tab


_WIDE2_DEV_CACHE: dict = {}


def _wide2_tables_device(key, tabs: List[np.ndarray]):
    cache_key = (key, jax.default_backend())
    hit = _WIDE2_DEV_CACHE.get(cache_key)
    if hit is not None:
        return hit
    # transposed (2+BPR, n_tiles): scalar-prefetch SMEM pads per ROW
    # concrete even under an outer trace — see _yaw_tables_device
    with jax.ensure_compile_time_eval():
        val = jnp.asarray(np.concatenate(tabs, axis=0).T.copy())
    if len(_WIDE2_DEV_CACHE) > 16:
        _WIDE2_DEV_CACHE.clear()
    _WIDE2_DEV_CACHE[cache_key] = val
    return val


def _n_planes(packed: int) -> int:
    """Window plane count for a pack mode: 0 → RGB planar (3),
    2 → [256·R+G, B] (2), 3 → [65536·R+256·G+B] (1)."""
    return 3 if not packed else (2 if packed == 2 else 1)


def _unpack_planes(g, packed: int):
    """Split one gathered packed value into its u8 fields (exact: the
    fields are integers < 2^24, so every floor/mul/sub is exact f32)."""
    if packed == 3:
        rv = jnp.floor(g * (1.0 / 65536.0))
        rem = g - 65536.0 * rv
        gv = jnp.floor(rem * (1.0 / 256.0))
        return [rv, gv, rem - 256.0 * gv]
    rv = jnp.floor(g * (1.0 / 256.0))
    return [rv, g - 256.0 * rv]


def _resample_group_chunkloop(win_raw, slot, bi_lane0, bcol_local,
                              x0g_gi, hwg_gi, y0, vw, vcl, rm_b, acc,
                              gi, *, R: int, n_taps: int, koff: int,
                              packed: int = 0):
    """One (column-block, 8-row output group) of the wide2 chunk-loop
    resample.  ``x0g_gi``/``hwg_gi``: this group's hoisted (64,128) tap
    columns / weights (absolute padded columns); ``bi_lane0`` the
    block's lane offset inside win_raw; ``y0``/``vw``/``vcl``:
    (TILE_ROWS,128) vertical tap state in ABSOLUTE source rows;
    ``rm_b`` this block's window-row origin.  Shared by the wide2
    kernel (all groups) and wide3's chunk branch (fisheye pole/rim
    groups whose valid taps sweep too many columns for the de-sheared
    SIMD form)."""
    GROUP = 8
    rows = slice(gi * GROUP, (gi + 1) * GROUP)
    rm_f = rm_b.astype(jnp.float32)
    # cheap pre-gate: does ANY lane of this group tap this block?
    xi_lo = x0g_gi + koff
    inblk_any = (xi_lo + (n_taps - 1) >= bcol_local) \
        & (xi_lo < bcol_local + TILE_COLS)
    vg = jnp.concatenate(
        [jnp.broadcast_to(vcl[i:i + 1, :], (8, TILE_COLS))
         for i in range(gi * GROUP, (gi + 1) * GROUP)], axis=0)
    vmin = jnp.min(jnp.where(inblk_any, vg, jnp.inf)) - rm_f
    vmax = jnp.max(jnp.where(inblk_any, vg, -jnp.inf)) - rm_f
    any_hit = vmax >= vmin

    @pl.when(any_hit)
    def _(vmin=vmin, vmax=vmax):
        # hoisted per (group, tap): in-block lanes + masked weights
        relb = []
        wfb = []
        for k in range(n_taps):
            xi = x0g_gi + (k + koff)
            inb = (xi >= bcol_local) & (xi < bcol_local + TILE_COLS)
            relb.append(jnp.clip(xi - bcol_local, 0, TILE_COLS - 1))
            wfb.append(jnp.where(inb, hwg_gi[k], 0.0))
        lo = jnp.floor(vmin).astype(jnp.int32) - 1
        hi = jnp.floor(vmax).astype(jnp.int32) + 2
        tg_lo = jnp.clip(lo // 8, 0, R // 8 - 1)
        tg_hi = jnp.clip(hi // 8 + 1, 1, R // 8)
        ym = [[jnp.clip(y0[i:i + 1, :] + (m + koff) - rm_b, 0, R - 1)
               for m in range(n_taps)]
              for i in range(gi * GROUP, (gi + 1) * GROUP)]
        vwr = [[vw[m][i:i + 1, :] for m in range(n_taps)]
               for i in range(gi * GROUP, (gi + 1) * GROUP)]

        def chunk_body(tchunk, accs, relb=relb, wfb=wfb, ym=ym,
                       vwr=vwr):
            # the window read clamps so an overshot trip (the unrolled
            # loop's remainder) reads a valid chunk; its weights are
            # already zero (no tap's ym//8 equals the overshot tchunk)
            r0 = pl.multiple_of(
                jnp.minimum(tchunk, R // 8 - 1) * 8, 8)
            ry = [[jnp.broadcast_to(jnp.clip(ym[r][m] - r0, 0, 7),
                                    (8, TILE_COLS))
                   for m in range(n_taps)] for r in range(GROUP)]
            wv = [[jnp.where((ym[r][m] // 8) == tchunk, vwr[r][m],
                             0.0)
                   for m in range(n_taps)] for r in range(GROUP)]
            out = list(accs)
            for c in range(_n_planes(packed)):
                blk = win_raw[slot, c, pl.ds(r0, 8),
                              bi_lane0:bi_lane0 + TILE_COLS]
                rep = jnp.concatenate([blk] * GROUP, axis=0)
                if packed and c == 0:
                    # unpack each GATHERED packed value before the
                    # horizontal weighting (weighted packed sums are
                    # not separable)
                    ih_u = [None] * packed
                    for k in range(n_taps):
                        gk = jnp.take_along_axis(rep, relb[k], axis=1)
                        for oc, plane in enumerate(
                                _unpack_planes(gk, packed)):
                            term = plane * wfb[k]
                            ih_u[oc] = term if ih_u[oc] is None \
                                else ih_u[oc] + term
                    chans = list(enumerate(ih_u))
                else:
                    ih = None
                    for k in range(n_taps):
                        term = jnp.take_along_axis(rep, relb[k],
                                                   axis=1) * wfb[k]
                        ih = term if ih is None else ih + term
                    chans = [(2 if packed else c, ih)]
                for oc, ih in chans:
                    adds = []
                    for r in range(GROUP):
                        ih_r = ih[r * 8:(r + 1) * 8, :]
                        add = None
                        for m in range(n_taps):
                            gv = jnp.take_along_axis(
                                ih_r, ry[r][m], axis=0)[0:1, :]
                            term = gv * wv[r][m]
                            add = term if add is None else add + term
                        adds.append(add)
                    out[oc] = out[oc] + jnp.concatenate(adds, axis=0)
            return tuple(out)

        init = tuple(acc[c, rows, :] for c in range(3))
        # unroll pairs of chunk trips for gather-latency overlap (the
        # wide3 sweep's unroll lever); overshot trips are exact no-ops
        def chunk_pair(i2, accs):
            accs = chunk_body(tg_lo + i2 * 2, accs)
            return chunk_body(tg_lo + i2 * 2 + 1, accs)

        vals = jax.lax.fori_loop(0, (tg_hi - tg_lo + 1) // 2,
                                 chunk_pair, init)
        for c in range(3):
            acc[c, rows, :] = vals[c]


def _resample_tile_block(win_raw, slot, bi, bcol_local, x0g, hwg, y0, vw,
                         vcl, rm_b, acc, *, R: int, n_taps: int, koff: int):
    """Accumulate one column-block's contribution to the output tile.

    ``x0g``/``hwg``: per-group hoisted (64,128) tap columns / weights
    (absolute padded columns); ``bcol_local`` the block's absolute base
    column.  The inner loop mirrors ``_resample_tile_planar``'s proven
    (chunk, ch, tap) structure, restricted to one 128-col block with its
    own row origin — the per-(tile, block) window is what keeps the
    v-state and the chunk trip count local (see
    :func:`_resample_group_chunkloop` for the group body)."""
    for gi in range(TILE_ROWS // 8):
        _resample_group_chunkloop(
            win_raw, slot, bi * TILE_COLS, bcol_local, x0g[gi], hwg[gi],
            y0, vw, vcl, rm_b, acc, gi, R=R, n_taps=n_taps, koff=koff)


def _warp_kernel_wide2(tab_ref,          # scalar-prefetch (2+BPR, n_tiles)
                       view_f32_ref,     # (V, 16) f32 SMEM
                       src_hbm,          # (3, H8, W'') planar f32 HBM
                       out_ref,          # (1, 3, TILE_ROWS, 128)
                       win_raw,          # scratch (3, 3, R, BPR*128)
                       acc,              # scratch (3, TILE_ROWS, 128)
                       sems,             # DMA semaphores (3, BPR)
                       *, interp: str, win_rows: int, src_w: int,
                       src_h: int, geo_w: int, geo_h: int, n_tiles_x: int,
                       tiles_per_view: int, projection: str,
                       v_pad: int = 0):
    """Wide-window warp v2.  Replaces v1's single full-width window with
    per-(tile, block) windows fetched WIDE2_BPR blocks per round:
    p50 tiles touch 2-4 of the ~66 source blocks, so v1 paid ~20x the
    window DMA and iterated chunk ranges sized by the TILE's vertical
    span; here both the DMA and the chunk trips are per-block.  Round 0
    (the only round for most tiles) is double-buffered ACROSS tiles via
    the host-planned scalar-prefetch table; overflow rounds (fisheye
    rim tiles: u sweeps many blocks) run in a fori_loop with in-kernel
    row origins, single-buffered in a dedicated slot."""
    R = win_rows
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def tile_tab(tt):
        return tab_ref[0, tt], tab_ref[1, tt]     # b0, nblk

    b0_t, nblk_t = tile_tab(t)
    rounds_t = (nblk_t + WIDE2_BPR - 1) // WIDE2_BPR

    def dma_r0(slot, tt, bi):
        b0n, _ = tile_tab(tt)
        rm = pl.multiple_of(tab_ref[3 + bi, tt], 8)
        bcol = pl.multiple_of((b0n + bi) * 128, 128)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(bcol, 128)],
            win_raw.at[slot, :, :, pl.ds(bi * 128, 128)],
            sems.at[slot, bi])

    def start_r0(slot, tt):
        _, nblk_n = tile_tab(tt)
        for bi in range(WIDE2_BPR):
            @pl.when(bi < nblk_n)
            def _(bi=bi):
                dma_r0(slot, tt, bi).start()

    slot0 = t % 2

    @pl.when(t == 0)
    def _():
        start_r0(0, 0)

    # ---- geometry (same ray math as wide v1) ----
    view_id = t // tiles_per_view
    within = t - view_id * tiles_per_view
    ty = within // n_tiles_x
    tx = within - ty * n_tiles_x
    r00 = view_f32_ref[view_id, 0]
    r01 = view_f32_ref[view_id, 1]
    r02 = view_f32_ref[view_id, 2]
    r10 = view_f32_ref[view_id, 3]
    r11 = view_f32_ref[view_id, 4]
    r12 = view_f32_ref[view_id, 5]
    r20 = view_f32_ref[view_id, 6]
    r21 = view_f32_ref[view_id, 7]
    r22 = view_f32_ref[view_id, 8]
    tanh = view_f32_ref[view_id, 9]
    tanv = view_f32_ref[view_id, 10]

    jj = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, TILE_COLS), 1).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, TILE_COLS), 0).astype(jnp.float32)
    px = (tx * TILE_COLS).astype(jnp.float32) + jj
    py = (ty * TILE_ROWS).astype(jnp.float32) + ii
    nx = (2.0 * px + 1.0) / geo_w - 1.0
    ny = (2.0 * py + 1.0) / geo_h - 1.0
    if projection == "perspective":
        nx = nx * tanh
        ny = ny * tanv
        inv_n = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
        dx = nx * inv_n
        dy = ny * inv_n
        dz = inv_n
        valid = None
    else:
        r = jnp.sqrt(nx * nx + ny * ny)
        if projection == "fisheye_v360":
            theta_f = r * tanh
        else:
            theta_f = 2.0 * _asin(jnp.clip(r * tanv, -1.0, 1.0))
        valid = r <= 1.0
        theta_f = jnp.clip(theta_f, 0.0, math.pi)
        sin_t, cos_t = _sincos_0_pi(theta_f)
        safe_r = jnp.where(r > 1e-12, r, 1.0)
        dx = sin_t * (nx / safe_r)
        dy = sin_t * (ny / safe_r)
        dz = cos_t
    wx = r00 * dx + r01 * dy + r02 * dz
    wy = r10 * dx + r11 * dy + r12 * dz
    wz = r20 * dx + r21 * dy + r22 * dz
    phi = _atan2(wx, wz)
    theta = _asin(jnp.clip(wy, -1.0, 1.0))
    u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
    v = (theta / (math.pi / 2.0) + 1.0) \
        * ((src_h - 2 * v_pad) / 2.0) - 0.5 + v_pad
    # per-tile anchored seam unwrap (see _wide2_plan_view): columns land
    # in anchor + [-src_w/2, src_w/2), matching the host-planned blocks
    anc = tab_ref[2, t].astype(jnp.float32)
    u = anc + jnp.mod(u - anc + 0.5 * src_w, float(src_w)) - 0.5 * src_w
    vcl = jnp.clip(v, 0.0, src_h - 1.0)

    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - jnp.floor(u)
    y0 = jnp.floor(vcl).astype(jnp.int32)
    fy = vcl - jnp.floor(vcl)
    if interp in ("bicubic", "catmull-rom"):
        hw = (_lagrange_weights(fx) if interp == "bicubic"
              else _catmull_rom_weights(fx))
        vw = (_lagrange_weights(fy) if interp == "bicubic"
              else _catmull_rom_weights(fy))
        koff = -1
    else:
        hw = _linear_weights(fx)
        vw = _linear_weights(fy)
        koff = 0
    n_taps = len(hw)

    # per-group hoisted absolute tap columns / weights
    GROUP = 8
    n_groups = TILE_ROWS // GROUP

    def stack8(a, i0):
        return jnp.concatenate(
            [jnp.broadcast_to(a[i:i + 1, :], (8, TILE_COLS))
             for i in range(i0, i0 + GROUP)], axis=0)

    x0g = [stack8(x0, gi * GROUP) for gi in range(n_groups)]
    hwg = [[stack8(hw[k], gi * GROUP) for k in range(n_taps)]
           for gi in range(n_groups)]

    def rm_inkernel(b_global):
        """Masked-min row origin — the same valid-masked rule the planner
        validated (fisheye out-of-circle pixels must not drag the window
        away from in-circle rows)."""
        bcol = b_global * 128
        inb = (x0 + 3 >= bcol) & (x0 - 2 < bcol + TILE_COLS)
        if valid is not None:
            inb = inb & valid
        vmin = jnp.min(jnp.where(inb, vcl, jnp.inf))
        has = jnp.isfinite(vmin)
        rm = jnp.floor(jnp.where(has, vmin, 0.0)).astype(jnp.int32) \
            - V_MARGIN
        return (jnp.clip(rm, 0, src_h - R) // 8) * 8

    for c in range(3):
        acc[c] = jnp.zeros((TILE_ROWS, TILE_COLS), jnp.float32)

    # ---- round 0 (double-buffered across tiles) ----
    for bi in range(WIDE2_BPR):
        @pl.when(bi < nblk_t)
        def _(bi=bi):
            dma_r0(slot0, t, bi).wait()
            rm_b = pl.multiple_of(tab_ref[3 + bi, t], 8)
            _resample_tile_block(
                win_raw, slot0, bi, (b0_t + bi) * 128, x0g, hwg, y0, vw,
                vcl, rm_b, acc, R=R, n_taps=n_taps, koff=koff)

    # prefetch the next tile's round 0 while this tile is single-round
    # (rounds_t == 0 happens on fully-invalid tiles, e.g. fisheye
    # corners: they fetch nothing themselves but MUST still start the
    # successor's round 0 or the successor deadlocks on its semaphores)
    @pl.when((rounds_t <= 1) & (t + 1 < n_t))
    def _():
        start_r0((t + 1) % 2, t + 1)

    # ---- overflow rounds (rare: fisheye rim tiles) ----
    def round_body(rr, _):
        rms = []
        for bi in range(WIDE2_BPR):
            b = rr * WIDE2_BPR + bi
            rm_b = rm_inkernel(b0_t + b)
            rms.append(rm_b)

            @pl.when(b < nblk_t)
            def _(bi=bi, rm_b=rm_b, b=b):
                cp = pltpu.make_async_copy(
                    src_hbm.at[:, pl.ds(rm_b, R),
                               pl.ds(pl.multiple_of((b0_t + b) * 128, 128),
                                     128)],
                    win_raw.at[2, :, :, pl.ds(bi * 128, 128)],
                    sems.at[2, bi])
                cp.start()
                cp.wait()
        for bi in range(WIDE2_BPR):
            b = rr * WIDE2_BPR + bi

            @pl.when(b < nblk_t)
            def _(bi=bi, b=b, rm_b=rms[bi]):
                _resample_tile_block(
                    win_raw, 2, bi, (b0_t + b) * 128, x0g, hwg, y0, vw,
                    vcl, rm_b, acc, R=R, n_taps=n_taps, koff=koff)
        return 0

    jax.lax.fori_loop(1, rounds_t, round_body, 0)

    @pl.when((rounds_t > 1) & (t + 1 < n_t))
    def _():
        start_r0((t + 1) % 2, t + 1)

    if valid is None:
        for c in range(3):
            out_ref[0, c, :, :] = acc[c]
    else:
        vf = valid.astype(jnp.float32)
        for c in range(3):
            out_ref[0, c, :, :] = acc[c] * vf


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "true_w", "true_h", "src_w",
                     "src_h", "v_pad", "interp", "win_rows", "n_views",
                     "projection", "interpret"))
def _warp_call_wide2(src_rows, view_f32, tab, *, width, height, true_w,
                     true_h, src_w, src_h, interp, win_rows, n_views,
                     projection="perspective", interpret=False, v_pad=0):
    n_tiles_x = width // TILE_COLS
    tiles_per_view = (height // TILE_ROWS) * n_tiles_x
    n_tiles = tiles_per_view * n_views

    kernel = functools.partial(
        _warp_kernel_wide2, interp=interp, win_rows=win_rows, src_w=src_w,
        src_h=src_h, geo_w=true_w, geo_h=true_h, n_tiles_x=n_tiles_x,
        tiles_per_view=tiles_per_view, projection=projection, v_pad=v_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # view_f32
            pl.BlockSpec(memory_space=pl.ANY),       # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_ROWS, TILE_COLS),
            lambda t, tab: (t // tiles_per_view,
                            0,
                            (t % tiles_per_view) // n_tiles_x,
                            (t % tiles_per_view) % n_tiles_x)),
        scratch_shapes=[
            pltpu.VMEM((3, 3, win_rows, WIDE2_BPR * TILE_COLS),
                       jnp.float32),
            pltpu.VMEM((3, TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((3, WIDE2_BPR)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, height, width),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab, view_f32, src_rows)


# --------------------------------------------------------------------------
# Wide v3: de-sheared windows, fully-SIMD resample (no chunk loop)
# --------------------------------------------------------------------------
#
# wide2's inner loop iterates 8-row window chunks per (group, block) because
# a tilted view's vertical tap positions span ~50-150 source rows across a
# tile (the warp's local shear), and Mosaic sublane gathers cannot cross
# vreg boundaries.  That loop visits every chunk for every (row, tap) with
# per-lane masks — ~20% utilization.  v3 removes it: the planner computes,
# per (tile, block, source COLUMN), an 8-aligned row offset ``cs`` such
# that the rows any output pixel taps at that column fit a small RESIDUAL
# window of ``resid_rows`` (16..56) starting at ``rm + 8*cs``.  The kernel
# builds ``vsel[s, j] = win[8*cs_j + s, j]`` once per block (a static
# select chain over window chunks), after which EVERY step is a full
# (8, 128)-vreg SIMD op: tap columns move data to output lanes with one
# hardware lane-gather per residual vreg (tpu.dynamic_gather, per-sublane
# independent), the per-pixel residual vreg is picked with a short select
# chain, and the 4 vertical taps are per-lane hardware sublane-gathers.
# No per-row loops, no masked chunk sweeps.  Measured as the replacement
# for wide2 on the full360coverage pitched class (see STATUS.md).
#
# Exactness: vsel is a row permutation of the window; tap rows/cols and
# weights are identical to the XLA twin's.  Each tap row is clamped to
# [0, src_h-1] BEFORE conversion to residual space (the twin's border
# semantics); the planner validates per-column that every CLAMPED tap
# fits its residual window, so in-kernel residual indices stay in
# [0, RS-1] wherever the weight is nonzero.
#
# Fisheye outputs run here too (valid-MASKED planner stats + in-kernel
# x0 sanitization of out-of-circle lanes), with a per-(tile, group)
# third branch: pole/rim groups whose valid taps legitimately sweep too
# many columns (the pano pole sits inside a d>=180 image circle) run
# wide2's chunk-loop body, and cs storage is capped at WIDE3_CS_BLOCKS
# column blocks — see the _wide3_plan_view docstring.

WIDE3_RESID_CLASSES = (16, 24, 32, 40, 48, 56, 64)
WIDE3_SHEAR_CLASSES = (4, 8, 16, 24)
WIDE3_SPREAD_CLASSES = (1, 2, 4, 6, 8, 12, 16)
_WIDE3_SWEEP_COST = 24.0   # rough sweep ops per nvv unit (cost model)
# fisheye outputs: cs tables are stored for the first WIDE3_CS_BLOCKS
# column-blocks only (pano-pole tiles sweep ~src_w/128 blocks — an
# uncapped (n_tiles, MB, G, 128) cs would cost 100s of MB); groups whose
# valid taps reach beyond the cap run the chunk-loop branch instead
WIDE3_CS_BLOCKS = 8
# perspective views use a wider cap: every production tilt plan has
# MB <= 12, so 16 keeps those plans byte-identical to the uncapped form
# while still bounding cs for pole-grazing/up-down views whose pole
# tiles sweep the full source width
WIDE3_CS_BLOCKS_PERSP = 16
# per-(tile, group) branch flags in the wide3 table
WIDE3_FLAG_LO = 0
WIDE3_FLAG_HI = 1
WIDE3_FLAG_CHUNK = 2      # fisheye pole/rim groups: wide2's chunk loop
# a view falls back to wide2 entirely when more than this fraction of
# its valid groups would run the chunk branch (the wide3 instantiation
# would mostly execute wide2 bodies, at a bigger code size)
_WIDE3_CHUNK_FRAC_MAX = 0.5


@functools.lru_cache(maxsize=1024)
def _wide3_plan_view(width: int, height: int, hfov_deg: float,
                     vfov_deg: float, yaw_deg: float, pitch_deg: float,
                     roll_deg: float, src_w: int, src_h: int,
                     true_w: int, true_h: int, projection: str,
                     interp: str, force=None, v_pad: int = 0):
    """Exact f64 plan for the wide-v3 kernel.

    Returns ``(win_rows, resid_lo, resid_hi, spread_lo, max_rounds,
    shear_span, tab, cs)`` or ``None``.

    ``shear_span`` bounds the per-8-row-group horizontal shear span
    ``max(x0) - min(x0)`` (per column) over the whole view (padded +4
    and rounded into classes).  It is ROUTING policy only — the
    kernel's tap sweep is a fori_loop over each group's true local
    shear — and caps how much extended-sweep work wide3 will accept
    before the view falls back to wide2.

    **Two residual branches.** Vertical tap extents are wildly
    non-uniform across a tilted view (p50 output group needs a ~24-row
    residual window with a lane-to-lane chunk spread of 1-2; the
    steepest groups need 48/12), and the kernel's per-group cost scales
    with BOTH the residual vreg count ``nvv`` and the select-chain
    length, so one worst-case class taxes every tile.  The planner
    therefore assigns each (tile, output-group) a branch flag:

    - LO: residual class ``resid_lo``, served by a short RELATIVE
      select chain of length ``spread_lo`` anchored at the group's
      in-kernel ``min(cs)`` (dynamic-start row reads);
    - HI: residual class ``resid_hi`` with the full absolute chain
      (``(win_rows - resid_hi) // 8`` selects), exactly the v3c form.

    ``(resid_lo, spread_lo)`` minimise a per-view cost model over the
    class grids; ``spread_lo == 0`` signals single-branch (all HI).

    **Chunk branch.** Shear and residual stats are VALID-masked, and
    groups that still can't be served SIMD get flag
    ``WIDE3_FLAG_CHUNK`` and run wide2's proven chunk-loop body
    in-kernel instead of failing the whole view.  Two producers: the
    pano pole sits inside a d>=180 fisheye circle, so fisheye pole/rim
    groups legitimately sweep thousands of source columns; and
    perspective pole-grazing / extra-wide-fov tilted views (the
    evenPlus30 preset's 112.6-deg pitched cuts, ms360xml up/down cube
    faces) shear past the class cap near the poles.  Chunk groups' cs
    entries are unused, and cs storage is capped at ``WIDE3_CS_BLOCKS``
    (fisheye) / ``WIDE3_CS_BLOCKS_PERSP`` (perspective — chosen above
    every production tilt plan's MB so those plans are byte-identical
    to the uncapped form) blocks; groups whose valid taps reach beyond
    the cap are chunk by construction.  A view whose chunk fraction
    over valid groups exceeds ``_WIDE3_CHUNK_FRAC_MAX`` falls back to
    wide2 wholesale.

    ``tab`` is (n_tiles, 3 + G + MB) i32 with G = TILE_ROWS // 8:
    ``[b0, nblk, anchor, flag_g0..flag_g{G-1}, rm_0..rm_{MB-1}]``
    (flags: 0 LO, 1 HI, 2 chunk); ``cs`` is (n_tiles, CSB, G, 128) i32
    with CSB = MB for perspective, min(MB, WIDE3_CS_BLOCKS) for
    fisheye — per (tile, block, group, in-block source column) the
    8-aligned chunk offset of the de-sheared residual window relative
    to the block's ``rm``, with invalid lanes backfilled to the
    group's valid minimum (the LO branch derives its chain anchor from
    ``min(cs)`` in-kernel).

    ``force=(win_rows, resid_lo, resid_hi, spread_lo)`` re-plans with
    pinned call-level classes so a mixed-view dispatch can make every
    view's tables consistent with the kernel statics (flags and caps
    are validated against the forced classes, never clamped after the
    fact).  Planning mirrors :func:`_wide2_plan_view` (anchored seam
    unwrap, valid-masked stats).
    """
    if width % TILE_COLS or height % TILE_ROWS:
        return None
    n_taps = 4 if interp in ("bicubic", "catmull-rom") else 2
    koff = -1 if n_taps == 4 else 0
    rot = _rot_matrix(yaw_deg, pitch_deg, roll_deg)
    u, v = _np_view_coords_strided(width, height, hfov_deg, vfov_deg, rot,
                                   src_w, src_h, stride=1, true_w=true_w,
                                   true_h=true_h, projection=projection)
    u = np.mod(u, float(src_w))
    if projection == "perspective":
        valid = np.ones_like(u, dtype=bool)
    else:
        xs = (2.0 * np.arange(width) + 1.0) / true_w - 1.0
        ys = (2.0 * np.arange(height) + 1.0) / true_h - 1.0
        nxg, nyg = np.meshgrid(xs, ys)
        valid = np.hypot(nxg, nyg) <= 1.0
    # v_pad: plan against the pole-padded planar copy — shift coords
    # down by the pad and size clamps to the padded height (the padded
    # rows hold v360's reflected pole continuation, so tap rows within
    # [0, src_h + 2*v_pad) need no window special-casing)
    return _wide3_plan_from_uv(u, v + v_pad, valid, src_w,
                               src_h + 2 * v_pad,
                               is_fish=projection != "perspective",
                               wrap=True, n_taps=n_taps, koff=koff,
                               force=force)


def _wide3_plan_from_uv(u, v, valid, src_w, src_h, *, is_fish: bool,
                        wrap: bool, n_taps: int, koff: int, force=None):
    """Generic wide-v3 table builder over precomputed source coords.

    Shared by :func:`_wide3_plan_view` (ray-math geometry, ``wrap=True``
    — equirect sources are horizontally periodic, so per-tile anchors
    unwrap the seam) and :func:`_wide3_plan_maps` (static ``cv2.remap``
    -style maps, ``wrap=False`` — plain min/max column windows).  See
    :func:`_wide3_plan_view` for the table/branch semantics."""
    height, width = u.shape
    w = float(src_w)
    vcl = np.clip(v, 0.0, src_h - 1.0)
    pad_w = _planar_width(src_w)
    n_ty, n_tx = height // TILE_ROWS, width // TILE_COLS
    n_tiles = n_ty * n_tx
    uc = u.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    vc = vcl.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    vm4 = valid.reshape(n_ty, TILE_ROWS, n_tx, TILE_COLS)
    plain_anchor = src_w // 2 + 4

    n_groups_c = TILE_ROWS // 8

    # pass 1: per-tile blocks + per-(block, column) tap-row extrema
    tile_rows: list = []          # (b0, nblk, anchor, [rm_b], [stats_b])
    span_max = 0.0
    nblk_max = 1
    # per-(tile, group) VALID-MASKED per-column shear span: fisheye
    # out-of-circle lanes sweep wild columns but are masked at output
    # (the kernel neutralizes their x0 the same way), so they must not
    # drag a group onto the chunk branch
    shear_tg = np.zeros((n_tiles, n_groups_c), np.int64)
    for ty in range(n_ty):
        for tx in range(n_tx):
            ut = uc[ty, :, tx, :]
            vt = vc[ty, :, tx, :]
            mt = vm4[ty, :, tx, :]
            if not mt.any():
                tile_rows.append((0, 0, plain_anchor, [], []))
                continue
            if wrap:
                ang = ut[mt] * (2.0 * math.pi / w)
                anchor = math.atan2(
                    np.sin(ang).mean(),
                    np.cos(ang).mean()) * w / (2.0 * math.pi)
                anchor = float(np.mod(anchor, w))
                for try_anchor in (anchor, float(plain_anchor)):
                    ua = try_anchor + np.mod(ut - try_anchor + w / 2.0,
                                             w) - w / 2.0
                    uam = ua[mt]
                    lo = int(np.floor(uam.min())) - 2
                    hi = int(np.floor(uam.max())) + 3
                    if lo < 0:
                        try_anchor += w
                        ua = ua + w
                        lo += src_w
                        hi += src_w
                    if hi < pad_w - 1:
                        break
                else:
                    return None
            else:
                # non-periodic source (static remap maps): plain
                # min/max column window; taps must stay inside the
                # image (the caller falls back otherwise)
                try_anchor = 0.0
                ua = ut
                uam = ua[mt]
                lo = int(np.floor(uam.min())) - 2
                hi = int(np.floor(uam.max())) + 3
                if lo < 0 or hi >= pad_w - 1:
                    return None
            b0 = lo // 128
            nblk = hi // 128 - b0 + 1
            nblk_max = max(nblk_max, nblk)
            x0 = np.floor(ua).astype(np.int64)
            y0 = np.floor(vt).astype(np.int64)
            # per-8-row-group horizontal shear span (per column, over
            # VALID rows) — bounds the kernel's extended tap sweep
            for gi, g0 in enumerate(range(0, TILE_ROWS, 8)):
                xg = x0[g0:g0 + 8]
                mg8 = mt[g0:g0 + 8]
                if not mg8.any():
                    continue
                xmx = np.where(mg8, xg, np.iinfo(np.int64).min).max(0)
                xmn = np.where(mg8, xg, np.iinfo(np.int64).max).min(0)
                sp_cols = np.where(mg8.any(0), xmx - xmn, 0)
                shear_tg[ty * n_tx + tx, gi] = int(sp_cols.max())
            # per-(GROUP, x0-column) y0 extrema over valid pixels
            # (scatter once per group, then a width-n_taps sliding
            # min/max gives per-TAP-column extrema: column j is tapped
            # by pixels with x0 in [j - koff - (n_taps-1), j - koff]).
            # Group-level stats let the residual class track the 8-row
            # group's vertical extent instead of the whole tile's —
            # roughly halving nvv and with it the kernel's select/gather
            # chain length.
            c_lo, c_hi = b0 * 128, (b0 + nblk) * 128
            ncols = c_hi - c_lo
            g_stats = []
            for g0 in range(0, TILE_ROWS, 8):
                mg = mt[g0:g0 + 8]
                miny = np.full(ncols + n_taps, np.iinfo(np.int64).max)
                maxy = np.full(ncols + n_taps, np.iinfo(np.int64).min)
                # column j is tapped by px with x0 in
                # [j-koff-(n_taps-1), j-koff]; storing y0 stats at
                # q + (n_taps-1) + koff (q = x0 - c_lo) lets a forward
                # sliding min/max of width n_taps at offset j read
                # exactly that x0 range
                xr = x0[g0:g0 + 8][mg] - c_lo + (n_taps - 1) + koff
                # x0 + koff >= lo >= c_lo, so xr >= 0; guard anyway
                xr = np.clip(xr, 0, ncols + n_taps - 1)
                np.minimum.at(miny, xr, y0[g0:g0 + 8][mg])
                np.maximum.at(maxy, xr, y0[g0:g0 + 8][mg])
                mn = miny[:ncols]
                mx = maxy[:ncols]
                for s in range(1, n_taps):
                    mn = np.minimum(mn, miny[s:ncols + s])
                    mx = np.maximum(mx, maxy[s:ncols + s])
                has = mn <= mx
                mn_tap = np.where(has, np.maximum(mn + koff, 0), 0)
                mx_tap = np.where(
                    has, np.minimum(mx + koff + n_taps - 1, src_h - 1),
                    -1)
                g_stats.append((mn_tap, mx_tap, has))
            rms = []
            stats = []
            for b in range(nblk):
                bcol = (b0 + b) * 128
                m = mt & (x0 + (n_taps - 1) + koff >= bcol) \
                    & (x0 + koff < bcol + 128)
                if not m.any():
                    rms.append(0)
                else:
                    vb = vt[m]
                    span_max = max(span_max,
                                   float(vb.max() - vb.min()))
                    rms.append(
                        (max(0, int(np.floor(vb.min())) - V_MARGIN)
                         // 8) * 8)
                sl = (bcol - c_lo)
                stats.append([(gmn[sl:sl + 128].copy(),
                               gmx[sl:sl + 128].copy(),
                               ghas[sl:sl + 128].copy())
                              for gmn, gmx, ghas in g_stats])
            tile_rows.append((b0, nblk, int(round(try_anchor)), rms,
                              stats))

    need = span_max + 2 * V_MARGIN
    win_rows = None
    for r in WIDE2_ROW_CLASSES:
        if r > src_h:
            continue
        if need <= r - 9 and (force is None or r >= force[0]):
            win_rows = r
            break
    if win_rows is None:
        return None
    if force is not None:
        if force[0] < win_rows or force[0] not in WIDE2_ROW_CLASSES \
                or force[0] > src_h:
            return None
        win_rows = force[0]
    max_rounds = -(-nblk_max // WIDE2_BPR)
    mb = max_rounds * WIDE2_BPR
    cs_blocks = min(mb, WIDE3_CS_BLOCKS if is_fish
                    else WIDE3_CS_BLOCKS_PERSP)
    rm_cap = ((src_h - win_rows) // 8) * 8
    n_groups = TILE_ROWS // 8

    # per-(tile, block, group) residual geometry: raw chunk offsets,
    # residual need (rows), lane spread (chunks), max offset
    tile_geo = []                 # per tile: (rm_list, [b][g] dict)
    need_tg = np.zeros((n_tiles, n_groups), np.int64)
    spread_tg = np.zeros((n_tiles, n_groups), np.int64)
    maxcs_tg = np.zeros((n_tiles, n_groups), np.int64)
    has_tg = np.zeros((n_tiles, n_groups), bool)
    far_tg = np.zeros((n_tiles, n_groups), bool)   # taps beyond cs cap
    for t, (b0, nblk, anchor, rms, stats) in enumerate(tile_rows):
        rm_list = [min(rms[b], rm_cap) for b in range(nblk)]
        per_bg = []
        for b in range(nblk):
            rm = rm_list[b]
            row = []
            for g in range(n_groups):
                mn_tap, mx_tap, has = stats[b][g]
                if has.any():
                    csb = np.maximum((mn_tap - rm) // 8, 0)
                    nd = int((mx_tap - (rm + 8 * csb) + 1)[has].max())
                    cv = csb[has]
                    sp, mc = int(cv.max() - cv.min()), int(cv.max())
                    fill = int(cv.min())
                    csb = np.where(has, csb, fill)
                    has_tg[t, g] = True
                    if b >= cs_blocks:
                        far_tg[t, g] = True
                else:
                    csb = np.zeros(128, np.int64)
                    nd = sp = mc = 0
                row.append((csb, has, nd))
                need_tg[t, g] = max(need_tg[t, g], nd)
                spread_tg[t, g] = max(spread_tg[t, g], sp)
                maxcs_tg[t, g] = max(maxcs_tg[t, g], mc)
            per_bg.append(row)
        tile_geo.append((rm_list, per_bg))

    # groups whose valid-masked shear, residual need, or block range
    # can't be served SIMD run the wide2 chunk-loop branch instead of
    # failing the whole view (fisheye pole/rim groups; perspective
    # pole-grazing or extra-wide-fov tilted views like evenPlus30's
    # 112.6-deg pitched cuts); a view with too many chunk groups falls
    # back to wide2 wholesale
    if force is not None:
        resid_limit = force[2]
    else:
        resid_limit = max(c for c in WIDE3_RESID_CLASSES
                          if c <= win_rows)
    elig = ((shear_tg + 4 <= WIDE3_SHEAR_CLASSES[-1]) & ~far_tg
            & (need_tg <= resid_limit))
    if has_tg.any() \
            and (~elig)[has_tg].mean() > _WIDE3_CHUNK_FRAC_MAX:
        return None

    # shear routing class over ELIGIBLE groups only
    sp_need = int(shear_tg[elig].max()) if elig.any() else 0
    span_cls = None
    for cls in WIDE3_SHEAR_CLASSES:
        if sp_need + 4 <= cls:
            span_cls = cls
            break
    if span_cls is None:
        return None

    need_max = int(need_tg[elig].max()) if elig.any() else 0
    resid_hi = None
    for rs in WIDE3_RESID_CLASSES:
        if rs <= win_rows and need_max <= rs \
                and (force is None or rs >= force[2]):
            resid_hi = rs
            break
    if resid_hi is None:
        return None
    if force is not None:
        if force[2] < resid_hi or force[2] > win_rows \
                or force[2] not in WIDE3_RESID_CLASSES:
            return None
        resid_hi = force[2]
    ncs_hi = (win_rows - resid_hi) // 8

    # choose the LO branch classes by a per-view cost model: a group
    # costs nvv * (3*chain + C) vector ops (vsel select chain + the
    # sweep's nvv-proportional gather chains)
    def lo_mask(r, s):
        return ((need_tg <= r) & (spread_tg <= s)
                & (maxcs_tg <= (win_rows - r) // 8) & elig)

    def total_cost(r, s):
        m = lo_mask(r, s)
        c_lo = (r // 8) * (3 * s + _WIDE3_SWEEP_COST)
        c_hi = (resid_hi // 8) * (3 * ncs_hi + _WIDE3_SWEEP_COST)
        return float(m.sum() * c_lo + (elig & ~m).sum() * c_hi), m

    def make_flags(lo_m):
        f = np.full((n_tiles, n_groups), WIDE3_FLAG_HI, np.int8)
        if lo_m is not None:
            f[lo_m] = WIDE3_FLAG_LO
        f[~elig] = WIDE3_FLAG_CHUNK
        return f

    if force is not None:
        resid_lo, spread_lo = force[1], force[3]
        if spread_lo and (resid_lo not in WIDE3_RESID_CLASSES
                          or spread_lo not in WIDE3_SPREAD_CLASSES
                          or resid_lo > resid_hi):
            return None
        flags = make_flags(lo_mask(resid_lo, spread_lo) if spread_lo
                           else None)
    else:
        # tuning knob: GS360X_WIDE3_LO="resid,spread" pins the LO
        # class pair; "off" forces single-branch.  Read at PLAN time —
        # plans are lru_cached, so set it before the first call of a
        # fresh process (the A/B harness runs one process per setting)
        env_lo = _os.environ.get("GS360X_WIDE3_LO", "")
        if env_lo == "off":
            m = np.zeros_like(need_tg, bool)
            resid_lo, spread_lo = resid_hi, 1
        elif env_lo:
            resid_lo, spread_lo = (int(x) for x in env_lo.split(","))
            _, m = total_cost(resid_lo, spread_lo)
        else:
            best = None
            for r in WIDE3_RESID_CLASSES:
                if r > resid_hi:
                    break
                for s in WIDE3_SPREAD_CLASSES:
                    cost, m = total_cost(r, s)
                    if best is None or cost < best[0]:
                        best = (cost, r, s, m)
            _, resid_lo, spread_lo, m = best
        # single-branch when LO would serve <10% of eligible groups:
        # don't pay the second instantiation's compile for a dead branch
        frac_lo = m[elig].mean() if elig.any() else 0.0
        if frac_lo < 0.10:
            resid_lo, spread_lo = resid_hi, 0
            flags = make_flags(None)
        else:
            flags = make_flags(m)

    tab = np.zeros((n_tiles, 3 + n_groups + mb), np.int32)
    cs = np.zeros((n_tiles, cs_blocks, n_groups, 128), np.int32)
    cap_hi = (win_rows - resid_hi) // 8
    for t, (b0, nblk, anchor, _, _) in enumerate(tile_rows):
        tab[t, 0] = b0
        tab[t, 1] = nblk
        tab[t, 2] = anchor
        rm_list, per_bg = tile_geo[t]
        for g in range(n_groups):
            tab[t, 3 + g] = int(flags[t, g])
        for b in range(nblk):
            tab[t, 3 + n_groups + b] = rm_list[b]
            for g in range(n_groups):
                csb, has, nd = per_bg[b][g]
                if flags[t, g] == WIDE3_FLAG_HI:
                    # HI: absolute chain — clamp to the class cap and
                    # validate coverage (cs at the ceiling still covers
                    # rm + [8*cs, 8*cs + resid_hi) = window bottom)
                    csb = np.minimum(csb, cap_hi)
                    mn_tap, mx_tap, hs = \
                        tile_rows[t][4][b][g]
                    bad = hs & (mx_tap > rm_list[b] + 8 * csb
                                + resid_hi - 1)
                    if bad.any():
                        # residual window can't cover even clamped:
                        # serve this group on the chunk branch
                        flags[t, g] = WIDE3_FLAG_CHUNK
                        tab[t, 3 + g] = WIDE3_FLAG_CHUNK
                if b < cs_blocks:
                    cs[t, b, g] = csb
    return (win_rows, resid_lo, resid_hi, spread_lo, max_rounds,
            span_cls, tab, cs)


_WIDE3_DEV_CACHE: dict = {}


def _wide3_tables_device(key, tabs: List[np.ndarray],
                         css: List[np.ndarray], mb: int,
                         cs_blocks: int = None):
    """Concatenate per-view (tab, cs) across views, pad tab rows to a
    common MB and cs to a common CS_BLOCKS, and cache on device keyed
    by geometry."""
    if cs_blocks is None:
        cs_blocks = mb
    cache_key = (key, jax.default_backend())
    hit = _WIDE3_DEV_CACHE.get(cache_key)
    if hit is not None:
        return hit
    n_groups = TILE_ROWS // 8
    tab_rows = []
    cs_rows = []
    for tab, cs in zip(tabs, css):
        n_t, w_t = tab.shape
        if w_t - 3 - n_groups < mb:
            tab = np.concatenate(
                [tab, np.zeros((n_t, mb - (w_t - 3 - n_groups)),
                               np.int32)], axis=1)
        if cs.shape[1] < cs_blocks:
            cs = np.concatenate(
                [cs, np.zeros((n_t, cs_blocks - cs.shape[1])
                              + cs.shape[2:], np.int32)], axis=1)
        tab_rows.append(tab)
        cs_rows.append(cs)
    # concrete even under an outer trace — see _yaw_tables_device
    with jax.ensure_compile_time_eval():
        val = (jnp.asarray(np.concatenate(tab_rows, axis=0).T.copy()),
               jnp.asarray(np.concatenate(cs_rows, axis=0)))
    if len(_WIDE3_DEV_CACHE) > 16:
        _WIDE3_DEV_CACHE.clear()
    _WIDE3_DEV_CACHE[cache_key] = val
    return val


def _radix_masks(sel, n: int):
    """Per-bit masks for :func:`_radix_select` over ``n`` candidates.
    ``sel`` is an i32 vreg in [0, n)."""
    nbits = max(1, (n - 1).bit_length())
    return [jnp.bitwise_and(sel, 1 << b) != 0 for b in range(nbits)]


def _radix_select(cands, masks):
    """``cands[sel]`` per lane as a binary select tree.

    The linear ``where`` chains this replaces were LATENCY-bound on
    chip (~30 cycles/select measured via the STOP=read/vsel probes —
    each select depends on the previous), so depth matters more than
    op count: a chain of length n-1 becomes a tree of the same n-1
    selects at depth ceil(log2 n).  Odd tails pair an element with
    itself and are skipped (no op emitted), so the count never
    exceeds the chain's.  ``masks`` from :func:`_radix_masks` (bit b
    of the selector), shared across channels/vv towers."""
    cur = list(cands)
    for m in masks:
        if len(cur) == 1:
            break
        nxt = []
        for i in range(0, len(cur), 2):
            lo = cur[i]
            hi = cur[i + 1] if i + 1 < len(cur) else lo
            nxt.append(lo if hi is lo else jnp.where(m, hi, lo))
        cur = nxt
    return cur[0]


def _build_vsel(win_raw, slot, bi_lane0, csb, *, win_rows: int,
                resid_rows: int, nch: int = 3):
    """De-sheared residual window for one block: a [ch][vv] list of
    (8, 128) vregs with ``vsel[ch][vv][s, j] = win[8*(cs_j+vv)+s, j]``.

    One static select chain over the window's 8-row chunks; the compare
    masks depend only on ``cs_j + vv`` so they are shared across
    channels.  ``bi_lane0``: the block's lane offset inside win_raw.
    ``nch`` is 2 for packed-RG windows — the chain count scales with it."""
    ncs = (win_rows - resid_rows) // 8
    nvv = resid_rows // 8
    masks = _radix_masks(csb, ncs + 1)
    vsel = []
    for c in range(nch):
        # hoist chunk reads: (vv, cval) pairs share chunk = vv + cval,
        # so ncs + nvv distinct reads serve the nvv * (ncs + 1) chain
        # slots (the chains re-materialized each read before)
        reads = []
        for chunk in range(ncs + nvv):
            data = win_raw[slot, c, chunk * 8:(chunk + 1) * 8,
                           bi_lane0:bi_lane0 + TILE_COLS]
            if data.dtype != jnp.float32:
                data = data.astype(jnp.int32).astype(jnp.float32)
            reads.append(data)
        vsel.append([_radix_select(reads[vv:vv + ncs + 1], masks)
                     for vv in range(nvv)])
    return vsel


def _build_vsel_rel(win_raw, slot, bi_lane0, csb, *, win_rows: int,
                    resid_rows: int, spread: int, nch: int = 3):
    """LO-branch vsel: the select chain runs over the group's LOCAL
    chunk range [min(cs), min(cs) + spread] with dynamic-start row
    reads, instead of every chunk in the window.  The planner backfills
    invalid lanes with the group's valid minimum so ``jnp.min`` is the
    true anchor, guarantees ``max(cs) - min(cs) <= spread``, and
    guarantees selected chunks satisfy ``cs + vv < win_rows // 8``; the
    clamp below only sanitises never-selected reads at the window
    bottom."""
    nvv = resid_rows // 8
    top = win_rows // 8 - 1
    cs_min = jnp.min(csb)
    rel = csb - cs_min
    masks = _radix_masks(rel, spread + 1)

    def read(c, chunk):
        data = win_raw[slot, c,
                       pl.ds(pl.multiple_of(chunk * 8, 8), 8),
                       bi_lane0:bi_lane0 + TILE_COLS]
        if data.dtype != jnp.float32:
            data = data.astype(jnp.int32).astype(jnp.float32)
        return data

    vsel = []
    for c in range(nch):
        # hoist the dynamic-start reads: (vv, cval) pairs share the
        # chunk index cs_min + vv + cval, so spread + nvv distinct
        # reads serve every chain slot
        reads = [read(c, jnp.minimum(cs_min + i, top))
                 for i in range(spread + nvv)]
        vsel.append([_radix_select(reads[vv:vv + spread + 1], masks)
                     for vv in range(nvv)])
    return vsel


def _resample_group_wide3(g, win_raw, slot, bi_lane0, csb, bcol_local,
                          flag_g, x0, hw, y0, vw, rm_b, acc, valid, vcl,
                          *, win_rows: int, resid_lo: int, resid_hi: int,
                          spread_lo: int, n_taps: int, koff: int,
                          src_h: int, has_chunk: bool,
                          packed: bool = False):
    """Accumulate one (de-sheared block, 8-row output group) into the
    output tile — every op a full (8, 128) vreg.

    The lane gather that moves residual-window columns to output lanes
    MUST use a row-invariant column index: the vertical taps afterwards
    are per-lane SUBLANE gathers, and a sublane only holds the right
    column if every sublane of the gathered vreg was fetched from the
    same source column.  Tilted views shear horizontally (x0 varies down
    an 8-row group), so the tap columns are anchored at the group's row
    3 (``jb``) and the per-row shear ``dx = x0 - jb`` is folded into an
    extended tap-position sweep: a ``fori_loop`` over
    ``dx_hi - dx_lo + n_taps`` positions (the group's true local shear —
    no static worst-case unroll), where iteration ``k2`` serves source
    column ``jb + dx_lo + k2 + koff`` and each row picks the cubic
    weight ``hw[k2 - (dx - dx_lo)]`` via a short select chain (zero
    where no tap of that row lands on this column).

    Border semantics: each tap row is clamped to [0, src_h-1] like the
    twin BEFORE conversion to residual space — the planner's per-group
    validation (clamped mn/mx per tap column) then guarantees residual
    rows in [0, RS-1] wherever the weight is nonzero, with the residual
    origin at 0 wherever the top clamp binds.  The residual VREG id
    (q = r >> 3) varies per pixel, so the vreg select happens AFTER the
    per-lane sublane gather — never before (cross-sublane index
    mixing).

    The whole (block, group) body — including the vsel build — is gated
    on a cheap touch test (does ANY tap column of this group land in
    this block?): multi-block tiles (fisheye rims sweep up to ~12
    blocks) would otherwise pay the full sweep for every
    (block, group) pair whose weights are all zero.

    The per-(tile, group) branch flag then selects the LO body
    (``resid_lo``-row residual window built by the short RELATIVE
    select chain) or the HI body (``resid_hi`` with the full absolute
    chain); ``spread_lo == 0`` compiles single-branch (all HI).

    Fisheye outputs add two things.  (1) x0 SANITIZATION: out-of-circle
    pixels (``valid`` False) carry wild tap columns (the ray math is
    meaningless there) that would blow up the dx sweep bounds of an
    otherwise-shallow group, so each invalid pixel's x0 is replaced by
    its lane's max valid x0 (or the group's min valid x0 for fully
    invalid lanes) before the anchor/sweep math — their garbage
    contributions land only on their own output pixels, which the
    kernel multiplies by the valid mask at the end.  (2) a CHUNK branch
    (``flag_g == 2``, compiled only when ``has_chunk``): pole/rim
    groups whose VALID taps legitimately sweep too many columns run
    wide2's proven chunk-loop body (:func:`_resample_group_chunkloop`)
    with the raw x0/weights."""
    # dev triage knob (one process per setting — read at trace time):
    #   GS360X_WIDE3_STOP=dma    DMA + geometry + output write only
    #   GS360X_WIDE3_STOP=read   + the HI chain's window READS only
    #                            (isolates read cost vs the select chains)
    #   GS360X_WIDE3_STOP=vsel   + residual-window build (consumed cheaply)
    #   GS360X_WIDE3_STOP=trip1  + sweep body, but ONE trip instead of
    #                            dx_hi-dx_lo+n_taps (isolates per-trip cost)
    #   GS360X_WIDE3_STOP=nochunk  full LO/HI, chunk branch skipped
    #                            (isolates the fisheye chunk-branch cost)
    stop = _os.environ.get("GS360X_WIDE3_STOP", "full").strip() or "full"
    if stop not in ("full", "dma", "read", "vsel", "trip1", "nochunk"):
        # a typo'd/leftover value would silently produce truncated
        # (zeroed) wide3 output — fail loudly at trace time instead
        raise ValueError(
            f"GS360X_WIDE3_STOP={stop!r}: expected one of "
            "'full', 'dma', 'read', 'vsel', 'trip1', 'nochunk'")
    if stop == "dma":
        return
    rows = slice(g * 8, (g + 1) * 8)
    if stop == "read":
        # HI-chain window reads only, consumed cheaply: isolates the
        # read cost from the select chains in the vsel phase
        ncs_r = (win_rows - resid_hi) // 8
        nvv_r = resid_hi // 8
        probe = None
        for c in range(_n_planes(packed)):
            for chunk in range(ncs_r + nvv_r):
                data = win_raw[slot, c, chunk * 8:(chunk + 1) * 8,
                               bi_lane0:bi_lane0 + TILE_COLS]
                if data.dtype != jnp.float32:
                    data = data.astype(jnp.int32).astype(jnp.float32)
                probe = data if probe is None else probe + data
        acc[0, rows, :] = acc[0, rows, :] + probe * 1e-30
        return
    y0g = y0[rows]
    x0g = x0[rows]
    if valid is not None:
        big = 1 << 28
        vg = valid[rows]
        lane_max = jnp.max(jnp.where(vg, x0g, -big), axis=0,
                           keepdims=True)
        glob_min = jnp.min(jnp.where(vg, x0g, big))
        fill = jnp.where(lane_max > -big, lane_max, glob_min)
        x0g = jnp.where(vg, x0g,
                        jnp.broadcast_to(fill, (8, TILE_COLS)))
    touch = (jnp.max(x0g) + koff + (n_taps - 1) >= bcol_local) \
        & (jnp.min(x0g) + koff < bcol_local + TILE_COLS)

    def sweep(resid_rows, vsel):
        nvv = resid_rows // 8
        if stop == "vsel":
            probe = None
            for c in range(len(vsel)):
                for vv in range(nvv):
                    probe = vsel[c][vv] if probe is None \
                        else probe + vsel[c][vv]
            acc[0, rows, :] = acc[0, rows, :] + probe * 1e-30
            return
        jb = jnp.broadcast_to(x0g[3:4, :], (8, TILE_COLS))
        dx = x0g - jb
        dx_lo = jnp.min(dx)
        dx_hi = jnp.max(dx)
        dxr = dx - dx_lo                  # in [0, local span]
        hwg = [h[rows] for h in hw]
        vwg = [v[rows] for v in vw]
        # trip-invariant vertical tap rows relative to the block's
        # window origin (the per-trip part is only the de-shear chunk
        # offset 8*csk of the trip's column)
        ya = [jnp.clip(y0g + (koff + m), 0, src_h - 1) - rm_b
              for m in range(n_taps)]

        def body(k2, carry):
            xi = jb + dx_lo + (k2 + koff)     # row-invariant column
            j = xi - bcol_local
            inb = (j >= 0) & (j < TILE_COLS)
            jc = jnp.clip(j, 0, TILE_COLS - 1)
            csk = jnp.take_along_axis(csb, jc, axis=1)
            wsel = jnp.zeros((8, TILE_COLS), jnp.float32)
            for kk in range(n_taps):
                wsel = jnp.where(dxr == (k2 - kk), hwg[kk], wsel)
            whk = jnp.where(inb, wsel, 0.0)
            # the n_taps tap rows are CONSECUTIVE, so they straddle at
            # most two adjacent 8-row tower chunks — but the tower id
            # q varies PER PIXEL (per destination row), so any scheme
            # that selects the tower vreg before the sublane gather
            # reads the selector at the gathered SOURCE rows, not the
            # destination rows (tried: pair-of-towers radix select
            # before the gather — wrong wherever q varies down a
            # column, i.e. every sheared group).  nvv gathers + a
            # select chain per tap, select strictly post-gather, is
            # the floor for cross-vreg row indexing.
            rms = [yam - 8 * csk for yam in ya]
            qs = [jnp.clip(r_m, 0, resid_rows - 1) // 8 for r_m in rms]
            for c in range(_n_planes(packed)):
                gs = [jnp.take_along_axis(vsel[c][vv], jc, axis=1)
                      for vv in range(nvv)]
                gms = []
                for m in range(n_taps):
                    gm = None
                    for vv in range(nvv):
                        gv = jnp.take_along_axis(
                            gs[vv], jnp.clip(rms[m] - 8 * vv, 0, 7),
                            axis=0)
                        gm = gv if gm is None else \
                            jnp.where(qs[m] == vv, gv, gm)
                    gms.append(gm)
                if packed and c == 0:
                    # packed plane: gm is exactly 256·R+G (pack 2) or
                    # 65536·R+256·G+B (pack 3) — integers in f32;
                    # unpack BEFORE weighting — weighted sums of
                    # packed values are not separable
                    vals = [None] * packed
                    for m in range(n_taps):
                        for oc, plane in enumerate(
                                _unpack_planes(gms[m], packed)):
                            t = plane * vwg[m]
                            vals[oc] = t if vals[oc] is None \
                                else vals[oc] + t
                    for oc in range(packed):
                        acc[oc, rows, :] = (acc[oc, rows, :]
                                            + vals[oc] * whk)
                else:
                    val = None
                    for m in range(n_taps):
                        term = gms[m] * vwg[m]
                        val = term if val is None else val + term
                    oc = 2 if packed else c
                    acc[oc, rows, :] = acc[oc, rows, :] + val * whk
            return carry

        n_trips = (jnp.int32(1) if stop == "trip1"
                   else dx_hi - dx_lo + n_taps)
        # GS360X_WIDE3_UNROLL=u runs the sweep u trips per fori
        # iteration (default 8 — v5e-measured: tilt 71->103,
        # full360 101->142, fisheye 38->50 views/s vs the single-trip
        # loop; ~flat beyond 8).  Overshot trips are EXACT no-ops: for
        # k2 >= n_trips, dxr <= dx_hi-dx_lo < k2-kk for every tap kk,
        # so wsel selects zero weight everywhere (gathers stay clamped
        # in-range) — no masking needed, and the straight-line trip
        # block gives Mosaic the gather-latency overlap a dynamic
        # single-trip loop can't.
        unroll_env = _os.environ.get("GS360X_WIDE3_UNROLL", "8").strip()
        if not unroll_env.isdigit() or not 1 <= int(unroll_env) <= 16:
            raise ValueError(
                f"GS360X_WIDE3_UNROLL={unroll_env!r}: expected an int "
                "in [1, 16]")
        unroll = int(unroll_env)
        if unroll == 1:
            jax.lax.fori_loop(0, n_trips, body, 0)
        else:
            def body_u(i, carry):
                for uu in range(unroll):
                    body(i * unroll + uu, carry)
                return carry
            jax.lax.fori_loop(0, (n_trips + unroll - 1) // unroll,
                              body_u, 0)

    nch = _n_planes(packed)
    hi_cond = touch if spread_lo == 0 else touch & (flag_g != 0)
    if has_chunk:
        hi_cond = hi_cond & (flag_g != WIDE3_FLAG_CHUNK)
    if spread_lo != 0:
        @pl.when(touch & (flag_g == 0))
        def _():
            sweep(resid_lo, _build_vsel_rel(win_raw, slot, bi_lane0,
                                            csb, win_rows=win_rows,
                                            resid_rows=resid_lo,
                                            spread=spread_lo, nch=nch))

    @pl.when(hi_cond)
    def _():
        sweep(resid_hi, _build_vsel(win_raw, slot, bi_lane0, csb,
                                    win_rows=win_rows,
                                    resid_rows=resid_hi, nch=nch))

    if has_chunk and stop != "nochunk":
        @pl.when(flag_g == WIDE3_FLAG_CHUNK)
        def _():
            x0g64 = jnp.concatenate(
                [jnp.broadcast_to(x0[i:i + 1, :], (8, TILE_COLS))
                 for i in range(g * 8, g * 8 + 8)], axis=0)
            hwg64 = [jnp.concatenate(
                [jnp.broadcast_to(hw[k][i:i + 1, :], (8, TILE_COLS))
                 for i in range(g * 8, g * 8 + 8)], axis=0)
                for k in range(n_taps)]
            _resample_group_chunkloop(
                win_raw, slot, bi_lane0, bcol_local, x0g64, hwg64,
                y0, vw, vcl, rm_b, acc, g, R=win_rows, n_taps=n_taps,
                koff=koff, packed=packed)


def _warp_kernel_wide3(tab_ref,          # scalar-prefetch (3+MB, n_tiles)
                       view_f32_ref,     # (V, 16) f32 SMEM
                       src_hbm,          # (3, H8, W'') planar HBM
                       cs_hbm,           # (n_tiles, MB, 128) i32 VMEM blk
                       out_ref,          # (1, 3, TILE_ROWS, 128)
                       win_raw,          # scratch (3, 3, R, BPR*128)
                       acc,              # scratch (3, TILE_ROWS, 128)
                       sems,             # DMA semaphores (3, BPR)
                       *, interp: str, win_rows: int, resid_lo: int,
                       resid_hi: int, spread_lo: int,
                       src_w: int, src_h: int, geo_w: int, geo_h: int,
                       n_tiles_x: int, tiles_per_view: int,
                       projection: str, mb: int, cs_blocks: int,
                       has_chunk: bool, packed: bool, v_pad: int = 0):
    """Wide-window warp v3 (see the section comment above).  DMA plan
    (per-(tile, block) windows, round-0 double-buffered across tiles,
    rare overflow rounds single-buffered) is wide2's; the resample is the
    de-sheared fully-SIMD form with per-(tile, group) LO/HI residual
    branches, plus (fisheye outputs, ``has_chunk``) a per-group chunk
    branch for pole/rim groups — see :func:`_resample_group_wide3`."""
    R = win_rows
    NG = TILE_ROWS // 8
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    def tile_tab(tt):
        return tab_ref[0, tt], tab_ref[1, tt]     # b0, nblk

    b0_t, nblk_t = tile_tab(t)
    rounds_t = (nblk_t + WIDE2_BPR - 1) // WIDE2_BPR

    def dma_blk(slot, tt, bi, b):
        """Fetch block ``b`` (table row origin) into win_raw lane slot
        ``bi``; ``b`` may be traced (overflow rounds)."""
        b0n, _ = tile_tab(tt)
        rm = pl.multiple_of((tab_ref[3 + NG + b, tt] // 8) * 8, 8)
        bcol = pl.multiple_of((b0n + b) * 128, 128)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(rm, R), pl.ds(bcol, 128)],
            win_raw.at[slot, :, :, pl.ds(bi * 128, 128)],
            sems.at[slot, bi])

    def start_r0(slot, tt):
        _, nblk_n = tile_tab(tt)
        for bi in range(WIDE2_BPR):
            @pl.when(bi < nblk_n)
            def _(bi=bi):
                dma_blk(slot, tt, bi, bi).start()

    slot0 = t % 2

    @pl.when(t == 0)
    def _():
        start_r0(0, 0)

    # ---- geometry (identical ray math to wide v1/v2) ----
    view_id = t // tiles_per_view
    within = t - view_id * tiles_per_view
    ty = within // n_tiles_x
    tx = within - ty * n_tiles_x
    r00 = view_f32_ref[view_id, 0]
    r01 = view_f32_ref[view_id, 1]
    r02 = view_f32_ref[view_id, 2]
    r10 = view_f32_ref[view_id, 3]
    r11 = view_f32_ref[view_id, 4]
    r12 = view_f32_ref[view_id, 5]
    r20 = view_f32_ref[view_id, 6]
    r21 = view_f32_ref[view_id, 7]
    r22 = view_f32_ref[view_id, 8]
    tanh = view_f32_ref[view_id, 9]
    tanv = view_f32_ref[view_id, 10]

    jj = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, TILE_COLS), 1).astype(jnp.float32)
    ii = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, TILE_COLS), 0).astype(jnp.float32)
    px = (tx * TILE_COLS).astype(jnp.float32) + jj
    py = (ty * TILE_ROWS).astype(jnp.float32) + ii
    nx = (2.0 * px + 1.0) / geo_w - 1.0
    ny = (2.0 * py + 1.0) / geo_h - 1.0
    if projection == "perspective":
        nx = nx * tanh
        ny = ny * tanv
        inv_n = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
        dx = nx * inv_n
        dy = ny * inv_n
        dz = inv_n
        valid = None
    else:
        r = jnp.sqrt(nx * nx + ny * ny)
        if projection == "fisheye_v360":
            theta_f = r * tanh
        else:
            theta_f = 2.0 * _asin(jnp.clip(r * tanv, -1.0, 1.0))
        valid = r <= 1.0
        theta_f = jnp.clip(theta_f, 0.0, math.pi)
        sin_t, cos_t = _sincos_0_pi(theta_f)
        safe_r = jnp.where(r > 1e-12, r, 1.0)
        dx = sin_t * (nx / safe_r)
        dy = sin_t * (ny / safe_r)
        dz = cos_t
    wx = r00 * dx + r01 * dy + r02 * dz
    wy = r10 * dx + r11 * dy + r12 * dz
    wz = r20 * dx + r21 * dy + r22 * dz
    phi = _atan2(wx, wz)
    theta = _asin(jnp.clip(wy, -1.0, 1.0))
    u = (phi / math.pi + 1.0) * (src_w / 2.0) - 0.5
    v = (theta / (math.pi / 2.0) + 1.0) \
        * ((src_h - 2 * v_pad) / 2.0) - 0.5 + v_pad
    anc = tab_ref[2, t].astype(jnp.float32)
    u = anc + jnp.mod(u - anc + 0.5 * src_w, float(src_w)) - 0.5 * src_w
    vcl = jnp.clip(v, 0.0, src_h - 1.0)

    x0 = jnp.floor(u).astype(jnp.int32)
    fx = u - jnp.floor(u)
    y0 = jnp.floor(vcl).astype(jnp.int32)
    fy = vcl - jnp.floor(vcl)
    if interp in ("bicubic", "catmull-rom"):
        hw = (_lagrange_weights(fx) if interp == "bicubic"
              else _catmull_rom_weights(fx))
        vw = (_lagrange_weights(fy) if interp == "bicubic"
              else _catmull_rom_weights(fy))
        koff = -1
    else:
        hw = _linear_weights(fx)
        vw = _linear_weights(fy)
        koff = 0
    n_taps = len(hw)

    for c in range(3):
        acc[c] = jnp.zeros((TILE_ROWS, TILE_COLS), jnp.float32)

    def block_cs(b, g):
        """(8, 128) i32 chunk offsets for block ``b``, output group
        ``g`` (b may be traced; g is static).  Blocks beyond the cs
        storage cap only ever serve chunk-branch groups (the planner
        guarantees SIMD groups' valid taps fit the first ``cs_blocks``
        blocks), so the clamped read is never consumed."""
        row = cs_hbm[0, pl.ds(jnp.minimum(b, cs_blocks - 1), 1), g, :]
        return jnp.broadcast_to(row.reshape(1, TILE_COLS),
                                (8, TILE_COLS))

    # ---- round 0 (double-buffered across tiles) ----
    for bi in range(WIDE2_BPR):
        @pl.when(bi < nblk_t)
        def _(bi=bi):
            dma_blk(slot0, t, bi, bi).wait()
            rm_b = tab_ref[3 + NG + bi, t]
            for g in range(NG):
                _resample_group_wide3(
                    g, win_raw, slot0, bi * 128, block_cs(bi, g),
                    (b0_t + bi) * 128, tab_ref[3 + g, t], x0, hw, y0,
                    vw, rm_b, acc, valid, vcl, win_rows=R,
                    resid_lo=resid_lo, resid_hi=resid_hi,
                    spread_lo=spread_lo, n_taps=n_taps, koff=koff,
                    src_h=src_h, has_chunk=has_chunk, packed=packed)

    @pl.when((rounds_t <= 1) & (t + 1 < n_t))
    def _():
        start_r0((t + 1) % 2, t + 1)

    # ---- overflow rounds (rare: pole-adjacent / fisheye rim tiles) ----
    if mb > WIDE2_BPR:
        def round_body(rr, _):
            for bi in range(WIDE2_BPR):
                b = rr * WIDE2_BPR + bi

                @pl.when(b < nblk_t)
                def _(bi=bi, b=b):
                    cp = dma_blk(2, t, bi, b)
                    cp.start()
                    cp.wait()
            for bi in range(WIDE2_BPR):
                b = rr * WIDE2_BPR + bi

                @pl.when(b < nblk_t)
                def _(bi=bi, b=b):
                    rm_b = tab_ref[3 + NG + b, t]
                    for g in range(NG):
                        _resample_group_wide3(
                            g, win_raw, 2, bi * 128, block_cs(b, g),
                            (b0_t + b) * 128, tab_ref[3 + g, t], x0,
                            hw, y0, vw, rm_b, acc, valid, vcl,
                            win_rows=R, resid_lo=resid_lo,
                            resid_hi=resid_hi, spread_lo=spread_lo,
                            n_taps=n_taps, koff=koff, src_h=src_h,
                            has_chunk=has_chunk, packed=packed)
            return 0

        jax.lax.fori_loop(1, rounds_t, round_body, 0)

        @pl.when((rounds_t > 1) & (t + 1 < n_t))
        def _():
            start_r0((t + 1) % 2, t + 1)

    # packed windows carry integer u8 values; the /255 normalization
    # every other source layout bakes into the planarize folds in here
    if valid is None:
        for c in range(3):
            out_ref[0, c, :, :] = acc[c] * (1.0 / 255.0) if packed \
                else acc[c]
    else:
        vf = valid.astype(jnp.float32)
        if packed:
            vf = vf * (1.0 / 255.0)
        for c in range(3):
            out_ref[0, c, :, :] = acc[c] * vf


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "true_w", "true_h", "src_w",
                     "src_h", "v_pad", "interp", "win_rows", "resid_lo",
                     "resid_hi", "spread_lo",
                     "n_views", "projection", "mb", "cs_blocks",
                     "has_chunk", "packed", "interpret"))
def _warp_call_wide3(src_rows, view_f32, tab, cs, *, width, height,
                     true_w, true_h, src_w, src_h, interp, win_rows,
                     resid_lo, resid_hi, spread_lo, n_views, mb,
                     cs_blocks=None, has_chunk=False, packed=False,
                     projection="perspective", interpret=False, v_pad=0):
    n_tiles_x = width // TILE_COLS
    tiles_per_view = (height // TILE_ROWS) * n_tiles_x
    n_tiles = tiles_per_view * n_views
    if cs_blocks is None:
        cs_blocks = mb

    kernel = functools.partial(
        _warp_kernel_wide3, interp=interp, win_rows=win_rows,
        resid_lo=resid_lo, resid_hi=resid_hi, spread_lo=spread_lo,
        src_w=src_w, src_h=src_h, geo_w=true_w,
        geo_h=true_h, n_tiles_x=n_tiles_x, tiles_per_view=tiles_per_view,
        projection=projection, mb=mb, cs_blocks=cs_blocks,
        has_chunk=has_chunk, packed=packed, v_pad=v_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # view_f32
            pl.BlockSpec(memory_space=pl.ANY),       # src stays in HBM
            pl.BlockSpec((1, cs_blocks, TILE_ROWS // 8, TILE_COLS),
                         lambda t, tab: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_ROWS, TILE_COLS),
            lambda t, tab: (t // tiles_per_view,
                            0,
                            (t % tiles_per_view) // n_tiles_x,
                            (t % tiles_per_view) % n_tiles_x)),
        scratch_shapes=[
            pltpu.VMEM((3, _n_planes(packed), win_rows,
                        WIDE2_BPR * TILE_COLS), src_rows.dtype),
            pltpu.VMEM((3, TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((3, WIDE2_BPR)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, height, width),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tab, view_f32, src_rows, cs)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


class PallasFallback(Exception):
    """Raised when a view's geometry exceeds the kernel's static budget."""


def check_view_budgets(yaws, pitches, rolls, *, width: int, height: int,
                       hfov_deg: float, vfov_deg: float, src_w: int,
                       src_h: int, projection: str = "perspective") -> None:
    """Raise :class:`PallasFallback` unless EVERY view fits a kernel class
    (narrow/yaw or wide). Lets multi-device dispatchers validate a plan
    before building sharded programs."""
    pad_w = (-width) % TILE_COLS
    out_w = width + pad_w
    out_h = height + (-height) % TILE_ROWS        # narrow/wide tile grid
    out_h_yaw = height + (-height) % YAW_TILE_ROWS  # yaw tile grid
    out_h_yaw = height + (-height) % YAW_TILE_ROWS
    persp = projection == "perspective"
    for yv, pv, rv in zip(np.asarray(yaws, np.float64).reshape(-1),
                          np.asarray(pitches, np.float64).reshape(-1),
                          np.asarray(rolls, np.float64).reshape(-1)):
        if persp and float(pv) % 360.0 == 0.0 and float(rv) % 360.0 == 0.0 \
                and any(plan_view(out_w, out_h_yaw, hfov_deg, vfov_deg,
                                  float(yv), float(pv), float(rv), src_w,
                                  src_h, true_w=width, true_h=height,
                                  tile_rows=YAW_TILE_ROWS,
                                  row_classes=YAW_ROW_CLASSES,
                                  win_cols=wc) is not None
                        for wc in YAW_WIN_CLASSES):
            continue
        if (not persp or plan_view(
                out_w, out_h, hfov_deg, vfov_deg, float(yv),
                float(pv), float(rv), src_w, src_h, true_w=width,
                true_h=height) is None) \
                and _wide2_plan_view(out_w, out_h, float(hfov_deg),
                                     float(vfov_deg), float(yv),
                                     float(pv), float(rv), src_w, src_h,
                                     width, height,
                                     projection) is None \
                and (not persp or plan_view(
                    out_w, out_h, hfov_deg, vfov_deg,
                    float(yv), float(pv), float(rv), src_w,
                    src_h, true_w=width, true_h=height,
                    row_classes=TILT_ROW_CLASSES,
                    win_cols=TILT_WIN_COLS) is None) \
                and plan_view_wide(out_w, out_h, hfov_deg, vfov_deg,
                                   float(yv), float(pv), float(rv),
                                   src_w, src_h, true_w=width,
                                   true_h=height,
                                   projection=projection) is None:
            raise PallasFallback(
                f"view yaw={yv} pitch={pv} exceeds window budgets")


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "true_w", "true_h", "src_w",
                     "src_h", "v_pad", "interp", "win_rows", "n_views", "win_cols",
                     "interpret"))
def _warp_call(src_rows, view_f32, *, width, height, true_w, true_h,
               src_w, src_h, interp, win_rows, n_views,
               win_cols=WIN_COLS, interpret=False, v_pad=0):
    n_tiles_x = width // TILE_COLS
    tiles_per_view = (height // TILE_ROWS) * n_tiles_x
    n_tiles = tiles_per_view * n_views

    kernel = functools.partial(
        _warp_kernel, interp=interp, win_rows=win_rows, src_w=src_w,
        src_h=src_h, geo_w=true_w, geo_h=true_h, n_tiles_x=n_tiles_x,
        tiles_per_view=tiles_per_view, win_cols=win_cols, v_pad=v_pad)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_views, 3, height, width),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # view_f32
            pl.BlockSpec(memory_space=pl.ANY),       # src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 3, TILE_ROWS, TILE_COLS),
            lambda t: (t // tiles_per_view,
                       0,
                       (t % tiles_per_view) // n_tiles_x,
                       (t % tiles_per_view) % n_tiles_x),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, win_rows, win_cols), jnp.float32),
            pltpu.VMEM((3, TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.VMEM((2, 2 * TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.SMEM((2, 2), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(view_f32, src_rows)


def _planar_width(src_w: int, max_win_cols: int = TILT_WIN_COLS) -> int:
    """Padded planar source width: seam wrap + 384-lane alignment.

    The wrap pad must cover the WIDEST window class present (a window
    whose 128-aligned origin sits at src_w-128 reads cm+win_cols); pure
    yaw/narrow view sets pass 384 and skip ~3% of planarize work."""
    w = src_w + max_win_cols + 128
    return w + (-w) % 384


def _planarize_kernel(rows_ref, out_ref, *, scale: float):
    """(BR, 3·BC) interleaved-RGB rows → (3, BR, BC) planar block.

    ``scale`` fuses the uint8/uint16 normalization into the layout move,
    so integer video frames never materialize an interleaved f32 copy.
    A uint8 ``out_ref`` keeps the source bytes verbatim (the de-interleave
    runs in i32) — the warp kernels that opt into u8 windows fold the /255
    into their precomputed weights and quarter their window DMA traffic."""
    u8_out = out_ref.dtype == jnp.uint8
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_COLS), 1)
    br = rows_ref.shape[0]
    bc = out_ref.shape[2]
    for r0 in range(0, br, 8):
        for c in range(3):
            for ob in range(bc // TILE_COLS):
                src_lane = (ob * TILE_COLS + lane8) * 3 + c
                g = None
                for b in range(3 * ob, 3 * ob + 3):
                    raw_blk = rows_ref[r0:r0 + 8,
                                       b * TILE_COLS:(b + 1) * TILE_COLS]
                    if u8_out:
                        raw_blk = raw_blk.astype(jnp.int32)
                    elif raw_blk.dtype != jnp.float32:
                        # Mosaic has no direct u8->f32 cast; go via i32
                        raw_blk = raw_blk.astype(jnp.int32) \
                            .astype(jnp.float32)
                    gb = jnp.take_along_axis(
                        raw_blk,
                        jnp.clip(src_lane - b * TILE_COLS, 0,
                                 TILE_COLS - 1), axis=1)
                    gb = jnp.where((src_lane // TILE_COLS) == b, gb,
                                   0 if u8_out else 0.0)
                    g = gb if g is None else g + gb
                if u8_out:
                    g = g.astype(jnp.uint8)
                elif scale != 1.0:
                    g = g * scale
                out_ref[c, r0:r0 + 8,
                        ob * TILE_COLS:(ob + 1) * TILE_COLS] = g


def _planarize_mxu_kernel(rows_ref, p_ref, out_ref, *, scale: float):
    """(BR, 3·BC) u8 rows → (3, BR, BC) planar block via the MXU.

    The RGB de-interleave is a fixed permutation, so it runs as a one-hot
    matmul: ``raw @ P`` where P[i, c·BC+j] = (i == 3j+c). u8 values are
    exact in bf16 and each output is exactly one input (one-hot rows), so
    the result is exact. 384 MACs/element on the MXU replace ~9 VPU
    shuffle/select ops/element — measured 2.5× faster at 8K width."""
    raw = rows_ref[...].astype(jnp.int32).astype(jnp.float32) \
        .astype(jnp.bfloat16)
    prod = jnp.dot(raw, p_ref[...], preferred_element_type=jnp.float32)
    bc = out_ref.shape[2]
    for c in range(out_ref.shape[0]):
        blk = prod[:, c * bc:(c + 1) * bc]
        if out_ref.dtype == jnp.uint8:
            out_ref[c] = blk.astype(jnp.int32).astype(jnp.uint8)
        else:
            out_ref[c] = blk * scale


@functools.lru_cache(maxsize=2)
def _planarize_perm(bc: int):
    p = np.zeros((3 * bc, 3 * bc), np.float32)
    for c in range(3):
        p[np.arange(bc) * 3 + c, c * bc + np.arange(bc)] = 1.0
    return p.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=2)
def _planarize_perm_packed(bc: int):
    """Packed-RG de-interleave matrix: plane0 = 256·R + G, plane1 = B.

    256 and u8 values are exact in bf16 and the f32 accumulate of the
    two nonzero terms (< 2^16) is exact, so packing costs nothing over
    the plain one-hot permutation — same single MXU pass, 2/3 the
    output bytes."""
    p = np.zeros((3 * bc, 2 * bc), np.float32)
    p[np.arange(bc) * 3 + 0, np.arange(bc)] = 256.0
    p[np.arange(bc) * 3 + 1, np.arange(bc)] = 1.0
    p[np.arange(bc) * 3 + 2, bc + np.arange(bc)] = 1.0
    return p.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=2)
def _planarize_perm_packed3(bc: int):
    """Packed-RGB de-interleave matrix: ONE plane = 65536·R + 256·G + B.

    Every coefficient and u8 value is exact in bf16 (pure exponent
    shifts of ≤8-bit integers), each bf16×bf16 product is exact in the
    MXU's f32 accumulate, and the 3-term sum is < 2^24 — so the packed
    plane is the exact integer 65536·R+256·G+B.  1/3 the window DMA
    and ONE gather chain per sweep where unpacked pays three."""
    p = np.zeros((3 * bc, bc), np.float32)
    p[np.arange(bc) * 3 + 0, np.arange(bc)] = 65536.0
    p[np.arange(bc) * 3 + 1, np.arange(bc)] = 256.0
    p[np.arange(bc) * 3 + 2, np.arange(bc)] = 1.0
    return p.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "out_dtype", "pack_rg"))
def _planarize_rows(padded, scale=1.0, interpret=False, out_dtype=None,
                    pack_rg=False):
    """Seam-padded rows (H, W'·3) → planar (3, H, W') on device.

    One pass over the source frame. Windows the warp kernels read overlap
    ~4× at production slopes, so de-interleaving at the frame (not inside
    each window) does a quarter of the shuffle work — and the kernels'
    inner loops lose the 3-block masked de-interleave entirely. XLA can't
    express this affordably (a minor-dim-3 transpose tiles catastrophically
    on TPU), hence a dedicated Mosaic pass.

    ``pack_rg`` (uint8 sources only): 2 → emit (2, H, W') f32 with
    plane0 = 256·R + G (exact — u8 fits the f32 mantissa beside a 256
    shift) and plane1 = B; 3 → emit (1, H, W') f32 with the single
    plane 65536·R + 256·G + B (still exact: < 2^24).  Both at INTEGER
    scale; consumers unpack per tap and fold the /255 into their output
    write.  On the MXU path this is just a different permutation
    matrix; elsewhere an XLA epilogue.
    """
    h, w3 = padded.shape
    wp = w3 // 3
    BC = 384
    n_bc = wp // BC
    pack_rg = int(pack_rg)
    if pack_rg:
        assert padded.dtype == jnp.uint8 and scale == 1.0
        if pack_rg == 1:
            pack_rg = 2                       # legacy bool spelling
    if padded.dtype == jnp.uint8 and h % 128 == 0:
        # u8 sources on full-height frames: MXU one-hot permutation
        BR = 128
        n_pl = _n_planes(pack_rg)
        perm = (_planarize_perm_packed3(BC) if pack_rg == 3
                else _planarize_perm_packed(BC) if pack_rg
                else _planarize_perm(BC))
        return pl.pallas_call(
            functools.partial(_planarize_mxu_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((n_pl, h, wp),
                                           out_dtype or jnp.float32),
            grid=(h // BR, n_bc),
            in_specs=[
                pl.BlockSpec((BR, 3 * BC), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * BC, n_pl * BC), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_pl, BR, BC), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(padded, jnp.asarray(perm))
    BR = 64 if h % 64 == 0 else 8
    planes = pl.pallas_call(
        functools.partial(_planarize_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((3, h, wp),
                                       out_dtype or jnp.float32),
        grid=(h // BR, n_bc),
        in_specs=[pl.BlockSpec((BR, 3 * BC), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, BR, BC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
    if pack_rg == 3:
        planes = (planes[0] * 65536.0 + planes[1] * 256.0
                  + planes[2])[None]
    elif pack_rg:
        planes = jnp.stack([planes[0] * 256.0 + planes[1], planes[2]])
    return planes


@functools.partial(jax.jit, static_argnames=("interpret", "max_win_cols",
                                             "keep_u8", "pack_rg",
                                             "pole_pad"))
def _planar_source(src_rows, interpret=False,
                   max_win_cols: int = TILT_WIN_COLS, keep_u8=False,
                   pack_rg=False, pole_pad: int = 0):
    """(H, W·3) interleaved rows → seam-padded planar (3, H8, W'').

    W'' = W + WIN_COLS rounded up to a 384-lane multiple (wrap-padded —
    windows never read past W + WIN_COLS); H8 = H rounded up to a sublane
    multiple (replicated rows — the window row clamp keeps them unread).
    uint8/uint16 inputs normalize to [0,1] here — unless ``keep_u8`` and
    the source is uint8, in which case the planar copy stays u8 (4× less
    window DMA for kernels that fold /255 into their resample weights),
    or ``pack_rg`` (uint8 only): (2, H8, W'') f32 with plane0 = 256·R+G
    at INTEGER scale — 2/3 the window DMA and gather work for the wide3
    kernel, which unpacks per tap and folds the /255 into its output.
    One Mosaic pass; see :func:`_planarize_rows` for why the layout move
    lives in a kernel.

    ``pole_pad`` = P > 0 prepends/appends P rows of REFLECTED pole
    content: pad row ``P-1-k`` above the frame holds source row ``k``
    rolled half a panorama, and pad row ``k`` below holds source row
    ``H-1-k`` rolled — exactly v360's ``reflecty`` + half-width column
    shift tap semantics (see :func:`gs360x.kernels.v360_oracle.
    reflect_taps`).  Kernels index the padded copy with ``v + P`` and
    clamp to ``H + 2P``; a bicubic tap overshoots a pole by at most 2
    rows, so P >= 4 makes every kernel's pole sampling bit-compatible
    with v360's reflection without any window/column special-casing
    (the rolled pad row IS the reflected continuation at unchanged
    column index).  The wrap-pad below replicates each row's own
    prefix, so rolled pad rows wrap correctly too.
    """
    h, w3 = src_rows.shape
    w = w3 // 3
    if pole_pad:
        p = pole_pad
        half3 = 3 * (w // 2)
        top = src_rows[:p][::-1]
        bot = src_rows[h - p:][::-1]
        top = jnp.concatenate([top[:, half3:], top[:, :half3]], axis=1)
        bot = jnp.concatenate([bot[:, half3:], bot[:, :half3]], axis=1)
        src_rows = jnp.concatenate([top, src_rows, bot], axis=0)
        h = h + 2 * p
    # seam-pad in the SOURCE dtype: for uint8 video the padded copy is 4x
    # smaller than f32, and the normalization fuses into the planarize
    # kernel's layout move
    out_dtype = None
    if src_rows.dtype == jnp.uint8:
        if keep_u8 or pack_rg:
            scale = 1.0
            out_dtype = jnp.uint8 if keep_u8 else None
        else:
            scale = 1.0 / 255.0
    elif src_rows.dtype == jnp.uint16:
        scale = 1.0 / 65535.0
    else:
        scale = 1.0
        src_rows = src_rows.astype(jnp.float32)
    if pack_rg and src_rows.dtype != jnp.uint8:
        raise PallasFallback("pack_rg requires a uint8 source")
    target_w = _planar_width(w, max_win_cols)
    pad = target_w - w
    reps = -(-pad // w)
    padded = jnp.concatenate([src_rows] * (1 + reps),
                             axis=1)[:, :target_w * 3]
    # pole-padded u8 frames keep the fast MXU planarize (h % 128 == 0)
    # by filling to a 128-row multiple; fill rows sit past the padded
    # clamp bound H + 2P and are never read
    align = 128 if (pole_pad and src_rows.dtype == jnp.uint8) else 8
    if h % align:
        fill = jnp.broadcast_to(padded[h - 1:h, :],
                                ((-h) % align, target_w * 3))
        padded = jnp.concatenate([padded, fill], axis=0)
    return _planarize_rows(padded, scale=scale, interpret=interpret,
                           out_dtype=out_dtype, pack_rg=pack_rg)


POLE_PAD = 8    # reflected pole rows per edge (bicubic overshoots <= 2)


@functools.lru_cache(maxsize=4096)
def _view_needs_pole_pad(out_w: int, out_h: int, hfov_deg: float,
                         vfov_deg: float, yaw_deg: float, pitch_deg: float,
                         roll_deg: float, src_w: int, src_h: int,
                         true_w: int, true_h: int,
                         projection: str) -> bool:
    """Could this view's 4x4 tap rows reach past a pole row?

    Decides whether the planar source carries reflected pole rows
    (v360's ``reflecty`` + half-width shift semantics — see
    :func:`_planar_source`).  Strided v extrema with a 16-row guard
    band: the v extremum over a view sits where the latitude gradient
    vanishes, so a stride-4 scan's error is second-order and genuine
    tap overshoot is <= 2 rows; a false positive only costs the pad's
    extra planarize rows.  Fisheye outputs always pad (a d>=180 image
    circle contains a pole; smaller circles are cheap to pad anyway).
    """
    if projection != "perspective":
        return True
    rot = _rot_matrix(yaw_deg, pitch_deg, roll_deg)
    _u, v = _np_view_coords_strided(out_w, out_h, hfov_deg, vfov_deg,
                                    rot, src_w, src_h, stride=4,
                                    true_w=true_w, true_h=true_h)
    return bool(v.min() < 16.0 or v.max() > src_h - 17.0)


def _as_source_rows(src):
    """Accept (H, W, 3) host/device arrays or pre-flattened (H, W*3)."""
    if hasattr(src, "ndim") and src.ndim == 2:
        return jnp.asarray(src)
    if isinstance(src, np.ndarray):
        h, w, c = src.shape
        return jnp.asarray(np.ascontiguousarray(src).reshape(h, w * c))
    arr = jnp.asarray(src)
    h, w, c = arr.shape
    return arr.reshape(h, w * c)


def warp_equirect_to_views_pallas(src, yaws, pitches, rolls, *,
                                  width: int, height: int,
                                  hfov_deg: float, vfov_deg: float,
                                  projection: str = "perspective",
                                  interp: str = "bicubic",
                                  interpret: bool = False,
                                  planar: bool = False) -> jnp.ndarray:
    """Pallas fast path. Raises :class:`PallasFallback` when unsupported.

    Args mirror :func:`gs360x.kernels.warp.warp_equirect_to_views`; angles
    must be concrete (host) values — they feed the budget planner.
    With ``planar=True`` returns (V, 3, H, W) and skips the device-side
    planar→HWC transpose (XLA transposes with minor-dim 3 are slow on TPU;
    encoders can interleave on host for the cost of a memcpy).
    """
    if projection not in ("perspective", "fisheye_v360", "equisolid"):
        raise PallasFallback(f"projection {projection!r} not in pallas path")
    if interp not in ("bicubic", "bilinear"):
        raise PallasFallback(f"interp {interp!r} not in pallas path")
    yaws = np.asarray(yaws, np.float64).reshape(-1)
    pitches = np.asarray(pitches, np.float64).reshape(-1)
    rolls = np.asarray(rolls, np.float64).reshape(-1)
    src_rows = _as_source_rows(src)
    src_h = int(src_rows.shape[0])
    src_w = int(src_rows.shape[1]) // 3

    pad_w = (-width) % TILE_COLS
    out_w = width + pad_w
    out_h = height + (-height) % TILE_ROWS        # narrow/wide tile grid
    out_h_yaw = height + (-height) % YAW_TILE_ROWS  # yaw tile grid

    # partition views: yaw-ring class (pitch=roll=0 — row-independent u,
    # ~8x cheaper horizontal stage), general narrow-window class, and the
    # wide-window class for geometry the narrow budget rejects (poles in
    # view / extreme slope)
    yaw_idx: List[int] = []
    yaw_budgets: List[ViewBudget] = []
    narrow_idx: List[int] = []
    narrow_budgets: List[ViewBudget] = []
    tilt_idx: List[int] = []
    tilt_budgets: List[ViewBudget] = []
    wide_idx: List[int] = []
    wide_budgets: List[ViewBudget] = []
    fisheye_out = projection in ("fisheye_v360", "equisolid")
    # pole-crossing view sets sample from a planar copy with reflected
    # pole rows (exact v360 reflecty semantics); everything else keeps
    # the unpadded copy byte-identical to round 4
    v_pad = 0
    if _os.environ.get("GS360X_POLE_PAD", "1") != "0":
        if any(_view_needs_pole_pad(
                out_w, out_h_yaw if (not fisheye_out and
                                     float(pv) % 360.0 == 0.0 and
                                     float(rv) % 360.0 == 0.0)
                else out_h, float(hfov_deg), float(vfov_deg),
                float(yv), float(pv), float(rv), src_w, src_h,
                width, height, projection)
               for yv, pv, rv in zip(yaws, pitches, rolls)):
            v_pad = POLE_PAD
    src_h_pad = src_h + 2 * v_pad
    for i, (yv, pv, rv) in enumerate(zip(yaws, pitches, rolls)):
        if not fisheye_out:
            if float(pv) % 360.0 == 0.0 and float(rv) % 360.0 == 0.0:
                b = None
                for wc in YAW_WIN_CLASSES:
                    b = plan_view(out_w, out_h_yaw, hfov_deg, vfov_deg,
                                  float(yv), float(pv), float(rv), src_w,
                                  src_h, true_w=width, true_h=height,
                                  tile_rows=YAW_TILE_ROWS,
                                  row_classes=YAW_ROW_CLASSES,
                                  win_cols=wc)
                    if b is not None:
                        break
                if b is not None:
                    yaw_idx.append(i)
                    yaw_budgets.append(b)
                    continue
            b = plan_view(out_w, out_h, hfov_deg, vfov_deg, float(yv),
                          float(pv), float(rv), src_w, src_h,
                          true_w=width, true_h=height)
            if b is not None:
                narrow_idx.append(i)
                narrow_budgets.append(b)
                continue
        # tilted views and fisheye outputs: the per-block wide-v2 kernel
        # (measured 6.6x the v1 full-width wide path on full360coverage
        # pitched views; also beats the 640-col tilt class)
        p2 = _wide2_plan_view(out_w, out_h, float(hfov_deg),
                              float(vfov_deg), float(yv), float(pv),
                              float(rv), src_w, src_h, width, height,
                              projection, v_pad=v_pad)
        if p2 is not None:
            wide_idx.append(i)
            wide_budgets.append(ViewBudget(
                win_rows=p2[0],
                rot=_rot_matrix(float(yv), float(pv),
                                float(rv)).astype(np.float32)))
            continue
        if not fisheye_out:
            # tilted class: wider window + taller row budgets for the
            # 1/cos(lat) horizontal stretch of pitched/rolled views
            b = plan_view(out_w, out_h, hfov_deg, vfov_deg, float(yv),
                          float(pv), float(rv), src_w, src_h,
                          true_w=width, true_h=height,
                          row_classes=TILT_ROW_CLASSES,
                          win_cols=TILT_WIN_COLS)
            if b is not None:
                tilt_idx.append(i)
                tilt_budgets.append(b)
                continue
        bw = plan_view_wide(out_w, out_h, hfov_deg, vfov_deg, float(yv),
                            float(pv), float(rv), src_w, src_h,
                            true_w=width, true_h=height,
                            projection=projection, v_pad=v_pad)
        if bw is None:
            raise PallasFallback(
                f"view yaw={yv} pitch={pv} exceeds window budgets")
        wide_idx.append(i)
        wide_budgets.append(bw)

    def view_table(budgets):
        table = np.zeros((max(len(budgets), 1), 16), np.float32)
        for vi, b in enumerate(budgets):
            table[vi, 0:9] = b.rot.reshape(-1)
            if fisheye_out:
                half = math.radians(hfov_deg) / 2.0
                table[vi, 9] = half                 # theta at the rim
                table[vi, 10] = math.sin(half / 2.0)  # equisolid scale
            else:
                table[vi, 9] = math.tan(math.radians(hfov_deg) / 2.0)
                table[vi, 10] = math.tan(math.radians(vfov_deg) / 2.0)
        return jnp.asarray(table)

    # each class runs on its own tile grid (yaw tiles are 32 rows), so
    # every part is cropped to the true view size before concatenation
    parts = []
    if wide_budgets:
        pad_cols = TILT_WIN_COLS          # wide kernels span _planar_width
    elif tilt_budgets:
        pad_cols = TILT_WIN_COLS
    else:
        pad_cols = max([WIN_COLS] + [b.win_cols for b in yaw_budgets])
    # pure-yaw uint8 sets keep the planar copy in u8: window DMA (the
    # yaw kernel's dominant HBM term) drops 4x, and the /255 rides the
    # precomputed wx weights so numerics are unchanged
    u8_windows = (src_rows.dtype == jnp.uint8 and bool(yaw_budgets)
                  and not (narrow_budgets or tilt_budgets or wide_budgets))
    # wide3 packed windows (u8 sources, default ON): packing channels
    # into one f32 plane cuts window DMA and the per-sweep gather
    # chains — measured fastest on every wide scenario (tilt_ab.py,
    # v5e).  "3" (default) packs all of RGB into 65536·R+256·G+B
    # (exact: < 2^24); "2"/"rg" is the two-plane 256·R+G / B split;
    # "0" disables.  Built lazily so an all-wide packed set never
    # materializes the unused 3-plane copy.
    _pack_env = (_os.environ.get("GS360X_WIDE3_PACK", "3").strip().lower()
                 or "3")
    # legacy "1" was the bool opt-in for the (then-only) RG pack; keep
    # it selecting the 2-plane mode, matching _planarize_rows' handling
    # of a legacy pack_rg=1 argument
    _pack_modes = {"0": 0, "1": 2, "2": 2, "rg": 2, "3": 3, "rgb": 3}
    if _pack_env not in _pack_modes:
        raise ValueError(
            f"GS360X_WIDE3_PACK={_pack_env!r}: expected one of "
            "'0' (off), '2'/'rg' (two-plane 256R+G / B), "
            "'3'/'rgb' (one-plane 65536R+256G+B, default)")
    pack_w3 = _pack_modes[_pack_env] if src_rows.dtype == jnp.uint8 else 0
    _planar_cache: dict = {}

    def get_planar(pack: bool = False):
        if pack not in _planar_cache:
            _planar_cache[pack] = _planar_source(
                src_rows, interpret=interpret, max_win_cols=pad_cols,
                keep_u8=u8_windows and not pack, pack_rg=pack,
                pole_pad=v_pad)
        return _planar_cache[pack]

    def crop(arr):
        return arr[:, :, :height, :width] \
            if arr.shape[2:] != (height, width) else arr

    if yaw_budgets:
        win_rows_yaw = max(b.win_rows for b in yaw_budgets)
        win_cols_yaw = max(b.win_cols for b in yaw_budgets)
        yaw_yaws = tuple(float(yaws[i]) for i in yaw_idx)
        wscale = (1.0 / 255.0) if u8_windows else 1.0
        tkey = ("yawv2", yaw_yaws, float(hfov_deg), float(vfov_deg),
                out_w, out_h_yaw, width, height, src_w, src_h,
                win_rows_yaw, win_cols_yaw, interp, wscale, v_pad)
        wx_tab, rmcm_tab = _yaw_tables_device(
            tkey, yaw_yaws, hfov_deg, vfov_deg, out_w=out_w,
            out_h=out_h_yaw, true_w=width, true_h=height, src_w=src_w,
            src_h=src_h, win_rows=win_rows_yaw, tile_rows=YAW_TILE_ROWS,
            interp=interp, win_cols=win_cols_yaw, weight_scale=wscale,
            v_pad=v_pad)
        parts.append(crop(_warp_call_yaw2(
            get_planar(), view_table(yaw_budgets), wx_tab, rmcm_tab,
            width=out_w, height=out_h_yaw, true_w=width, true_h=height,
            src_w=src_w, src_h=src_h_pad,
            interp=interp, win_rows=win_rows_yaw,
            win_cols=win_cols_yaw,
            n_views=len(yaw_budgets), interpret=interpret,
            v_pad=v_pad)))
    if narrow_budgets:
        parts.append(crop(_warp_call(
            get_planar(), view_table(narrow_budgets),
            width=out_w, height=out_h, true_w=width, true_h=height,
            src_w=src_w, src_h=src_h_pad,
            interp=interp,
            win_rows=max(b.win_rows for b in narrow_budgets),
            n_views=len(narrow_budgets), interpret=interpret,
            v_pad=v_pad)))
    if tilt_budgets:
        parts.append(crop(_warp_call(
            get_planar(), view_table(tilt_budgets),
            width=out_w, height=out_h, true_w=width, true_h=height,
            src_w=src_w, src_h=src_h_pad,
            interp=interp,
            win_rows=max(b.win_rows for b in tilt_budgets),
            n_views=len(tilt_budgets), win_cols=TILT_WIN_COLS,
            interpret=interpret, v_pad=v_pad)))
    if wide_budgets:
        # wide v3 (de-sheared windows, SIMD resample) when every view's
        # plan fits; v2 per-tile-block windows next; v1 full-width
        # windows as the conservative fallback
        w3_plans = None
        if _os.environ.get("GS360X_WIDE3", "1") != "0":
            w3_plans = []
            for i in wide_idx:
                w3_plans.append(_wide3_plan_view(
                    out_w, out_h, float(hfov_deg), float(vfov_deg),
                    float(yaws[i]), float(pitches[i]), float(rolls[i]),
                    src_w, src_h, width, height, projection, interp,
                    v_pad=v_pad))
            if not all(p is not None for p in w3_plans):
                w3_plans = None
        if w3_plans is not None:
            win_w3 = max(p[0] for p in w3_plans)
            rlo_w3 = max(p[1] for p in w3_plans)
            rhi_w3 = max(p[2] for p in w3_plans)
            slo_w3 = max(p[3] for p in w3_plans)
            mb_w3 = max(p[4] for p in w3_plans) * WIDE2_BPR
            if slo_w3 == 0:
                rlo_w3 = rhi_w3
            fkey = (win_w3, rlo_w3, rhi_w3, slo_w3)
            # views whose per-view classes differ from the call-level
            # maxima are RE-PLANNED with the classes pinned, so flags
            # and caps in their tables are exactly consistent with the
            # kernel statics (no after-the-fact clamping)
            for k, i in enumerate(wide_idx):
                p = w3_plans[k]
                if (p[0], p[1], p[2], p[3]) != fkey:
                    w3_plans[k] = _wide3_plan_view(
                        out_w, out_h, float(hfov_deg), float(vfov_deg),
                        float(yaws[i]), float(pitches[i]),
                        float(rolls[i]), src_w, src_h, width, height,
                        projection, interp, force=fkey, v_pad=v_pad)
            if not all(p is not None for p in w3_plans):
                w3_plans = None
        if w3_plans is not None:
            ng_c = TILE_ROWS // 8
            cs_blocks_w3 = min(mb_w3, WIDE3_CS_BLOCKS_PERSP
                               if projection == "perspective"
                               else WIDE3_CS_BLOCKS)
            has_chunk_w3 = any(
                (p[6][:, 3:3 + ng_c] == WIDE3_FLAG_CHUNK).any()
                for p in w3_plans)
            tkey = ("widev3e",
                    tuple((float(yaws[i]), float(pitches[i]),
                           float(rolls[i])) for i in wide_idx),
                    float(hfov_deg), float(vfov_deg), out_w, out_h,
                    width, height, src_w, src_h, projection, interp,
                    fkey, mb_w3, cs_blocks_w3, v_pad)
            tab3, cs3 = _wide3_tables_device(
                tkey, [p[6] for p in w3_plans],
                [p[7] for p in w3_plans], mb_w3, cs_blocks_w3)
            parts.append(crop(_warp_call_wide3(
                get_planar(pack_w3), view_table(wide_budgets), tab3, cs3,
                width=out_w, height=out_h, true_w=width, true_h=height,
                src_w=src_w, src_h=src_h_pad, v_pad=v_pad,
                interp=interp,
                win_rows=win_w3, resid_lo=rlo_w3, resid_hi=rhi_w3,
                spread_lo=slo_w3,
                n_views=len(wide_budgets), mb=mb_w3,
                cs_blocks=cs_blocks_w3, has_chunk=has_chunk_w3,
                packed=pack_w3,
                projection=projection, interpret=interpret)))
            w2_plans = None
        else:
            w2_plans = []
            for i in wide_idx:
                w2_plans.append(_wide2_plan_view(
                    out_w, out_h, float(hfov_deg), float(vfov_deg),
                    float(yaws[i]), float(pitches[i]), float(rolls[i]),
                    src_w, src_h, width, height, projection,
                    v_pad=v_pad))
        if w2_plans is not None and all(p is not None for p in w2_plans):
            win_rows_w2 = max(p[0] for p in w2_plans)
            tkey = ("widev2",
                    tuple((float(yaws[i]), float(pitches[i]),
                           float(rolls[i])) for i in wide_idx),
                    float(hfov_deg), float(vfov_deg), out_w, out_h,
                    width, height, src_w, src_h, projection, v_pad)
            tab = _wide2_tables_device(tkey, [p[2] for p in w2_plans])
            parts.append(crop(_warp_call_wide2(
                get_planar(), view_table(wide_budgets), tab,
                width=out_w, height=out_h, true_w=width, true_h=height,
                src_w=src_w, src_h=src_h_pad, v_pad=v_pad, interp=interp,
                win_rows=win_rows_w2, n_views=len(wide_budgets),
                projection=projection, interpret=interpret)))
        elif w2_plans is not None:
            # v1 needs TILE-level row budgets — recompute them here (a
            # v2-classified view's per-block budget would undersize the
            # full-width window)
            v1_rows = []
            for i in wide_idx:
                bw = plan_view_wide(out_w, out_h, hfov_deg, vfov_deg,
                                    float(yaws[i]), float(pitches[i]),
                                    float(rolls[i]), src_w, src_h,
                                    true_w=width, true_h=height,
                                    projection=projection, v_pad=v_pad)
                if bw is None:
                    raise PallasFallback(
                        f"view yaw={yaws[i]} pitch={pitches[i]} exceeds "
                        f"window budgets")
                v1_rows.append(bw.win_rows)
            parts.append(crop(_warp_call_wide(
                get_planar(), view_table(wide_budgets),
                width=out_w, height=out_h, true_w=width, true_h=height,
                src_w=src_w, src_h=src_h_pad, v_pad=v_pad,
                interp=interp,
                win_rows=max(v1_rows),
                n_views=len(wide_budgets), projection=projection,
                interpret=interpret)))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    order = yaw_idx + narrow_idx + tilt_idx + wide_idx
    if order != sorted(order):
        inv = np.argsort(np.asarray(order))
        out = out[jnp.asarray(inv)]
    if planar:
        return out
    return jnp.transpose(out, (0, 2, 3, 1))
